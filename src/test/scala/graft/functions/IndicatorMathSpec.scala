package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class IndicatorMathSpec extends AnyFunSuite {
  import IndicatorMath._

  private def some(xs: Double*): Seq[Option[Double]] = xs.map(Some(_))

  test("sma window 3 over 1..10 (reference sma.rs test fixture)") {
    val got = smaSeries(some((1 to 10).map(_.toDouble): _*), 3)
    assert(got === Seq(None, None) ++ (2 to 9).map(i => Some(i.toDouble)))
  }

  test("sma skips nulls without consuming window slots") {
    val xs = Seq(Some(1.0), None, Some(2.0), Some(3.0), None, Some(4.0))
    assert(smaSeries(xs, 3) ===
      Seq(None, None, None, Some(2.0), None, Some(3.0)))
  }

  test("ema window 3 (alpha=0.5) matches hand computation, first value seeds") {
    val xs = some(10.0, 12.0, 13.0, 12.0, 15.0, 11.0, 16.0, 14.0, 18.0, 20.0)
    val got = emaSeries(xs, 3).map(_.get)
    val exp = Seq(10.0, 11.0, 12.0, 12.0, 13.5, 12.25, 14.125, 14.0625,
      16.03125, 18.015625)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("ema nulls are transparent: emit null, state frozen") {
    val xs = Seq(Some(10.0), None, Some(12.0))
    assert(emaSeries(xs, 3) === Seq(Some(10.0), None, Some(11.0)))
  }

  test("rsi window 14 on Wilder's classic 21-point series") {
    // reference rsi.rs:194-198 fixture; first RSI on this exact series = 68.1638
    val wilder = some(44.34, 44.09, 44.15, 43.61, 44.33, 44.83, 45.85, 46.08,
      45.89, 46.03, 46.83, 47.69, 46.49, 46.26, 47.09, 46.66, 46.80, 46.23,
      46.38, 46.33, 46.51)
    val got = rsiSeries(wilder, 14)
    assert(got.take(14).forall(_.isEmpty)) // first value + 13 diffs -> null
    assert(math.abs(got(14).get - 68.1638044914135) < 1e-9)
    got.flatten.foreach(v => assert(v >= 0.0 && v <= 100.0))
  }

  test("rsi all-gains series returns 100") {
    val got = rsiSeries(some((1 to 20).map(_.toDouble): _*), 5)
    assert(got(6) === Some(100.0))
  }

  test("macd emits 0.0 on first row; equals ema12-ema26") {
    val xs = some((0 until 30).map(i => 100.0 + 2.0 * i): _*)
    val got = macdSeries(xs)
    assert(got.head === Some(0.0))
    val e12 = emaSeries(xs, 12).map(_.get)
    val e26 = emaSeries(xs, 26).map(_.get)
    got.map(_.get).zip(e12.zip(e26)).foreach { case (m, (a, b)) =>
      assert(math.abs(m - (a - b)) < 1e-12)
    }
  }

  test("property: sma bounded by window min/max; rsi in [0,100]; ema between prefix min/max") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val len = 1 + rnd.nextInt(200)
      val n = 1 + rnd.nextInt(10)
      val xs = List.fill(len)(0.01 + rnd.nextDouble() * 1000.0)
      val s = xs.map(Option(_))
      smaSeries(s, n).zipWithIndex.foreach { case (v, i) =>
        v.foreach { sm =>
          val win = xs.slice(i - n + 1, i + 1)
          assert(sm >= win.min - 1e-9 && sm <= win.max + 1e-9)
        }
      }
      rsiSeries(s, n).flatten.foreach(v => assert(v >= -1e-9 && v <= 100.0 + 1e-9))
      emaSeries(s, n).zipWithIndex.foreach { case (v, i) =>
        v.foreach { e =>
          val prefix = xs.take(i + 1)
          assert(e >= prefix.min - 1e-9 && e <= prefix.max + 1e-9)
        }
      }
    }
  }
}
