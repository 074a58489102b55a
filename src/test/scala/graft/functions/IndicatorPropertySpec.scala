package graft.functions

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the indicator recurrences (pure
  * IndicatorMath — no Spark session, so hundreds of cases run in
  * milliseconds). The single most load-bearing property is the family's
  * frozen-state NULL contract: a series with NULLs anywhere must produce,
  * at the non-null positions, EXACTLY the outputs of the null-free
  * subsequence — the invariant every oracle replay and the batch/streaming
  * parity rest on. */
class IndicatorPropertySpec extends AnyFunSuite {

  private val finite = Gen.choose(-1e6, 1e6)
  private val series: Gen[List[Double]] =
    Gen.nonEmptyListOf(finite).map(_.take(60))
  private val holeySeries: Gen[List[Option[Double]]] =
    Gen.nonEmptyListOf(Gen.frequency(
      4 -> finite.map(Option(_)), 1 -> Gen.const(None))).map(_.take(60))

  private def check(name: String, p: Prop): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("frozen-NULL contract: values at non-null positions equal the null-free run") {
    check("nullContract", Prop.forAll(holeySeries) { xs =>
      val dense = xs.flatten.map(Option(_))
      def holes[A](withHoles: Seq[Option[A]]): Seq[Option[A]] =
        xs.zip({
          val it = withHoles.iterator
          xs.map(x => if (x.isDefined) it.next() else None)
        }).map(_._2)
      // each family member: run on dense, re-insert holes, compare to holey run
      IndicatorMath.smaSeries(xs, 4) == holes(IndicatorMath.smaSeries(dense, 4)) &&
      IndicatorMath.emaSeries(xs, 5) == holes(IndicatorMath.emaSeries(dense, 5)) &&
      IndicatorMath.rsiSeries(xs, 3) == holes(IndicatorMath.rsiSeries(dense, 3)) &&
      IndicatorMath.macdSeries(xs) == holes(IndicatorMath.macdSeries(dense)) && {
        val shD = IndicatorMath.macdSignalHistSeries(dense)
        val shH = IndicatorMath.macdSignalHistSeries(xs)
        shH.map(_._1) == holes(shD.map(_._1)) &&
          shH.map(_._2) == holes(shD.map(_._2))
      } &&
      IndicatorMath.ewmCovSeries(xs, xs, 940) ==
        holes(IndicatorMath.ewmCovSeries(dense, dense, 940))
    })
  }

  test("rsi stays in [0, 100]") {
    check("rsiRange", Prop.forAll(series) { xs =>
      IndicatorMath.rsiSeries(xs.map(Option(_)), 3)
        .flatten.forall(v => v >= 0.0 && v <= 100.0)
    })
  }

  test("sma and ema stay inside the running min/max envelope") {
    check("envelope", Prop.forAll(series) { xs =>
      val opt = xs.map(Option(_))
      val sma = IndicatorMath.smaSeries(opt, 4)
      val ema = IndicatorMath.emaSeries(opt, 5)
      xs.indices.forall { i =>
        val prefix = xs.take(i + 1)
        val (lo, hi) = (prefix.min, prefix.max)
        // tiny FP slack: the mean/convex-combination identities are exact
        // in real arithmetic; accumulated rounding can escape by ulps
        val eps = 1e-9 * math.max(1.0, math.max(lo.abs, hi.abs))
        sma(i).forall(v => v >= lo - eps && v <= hi + eps) &&
          ema(i).forall(v => v >= lo - eps && v <= hi + eps)
      }
    })
  }

  test("macd histogram is line minus signal, pointwise") {
    check("macdIdentity", Prop.forAll(holeySeries) { xs =>
      val line = IndicatorMath.macdSeries(xs)
      val sigHist = IndicatorMath.macdSignalHistSeries(xs)
      line.zip(sigHist).forall {
        case (Some(l), (Some(s), Some(h))) => h == l - s
        case (None, (None, None))          => true
        case _                             => false
      }
    })
  }

  test("ewm variance is never negative") {
    check("ewmVarNonneg", Prop.forAll(holeySeries) { xs =>
      IndicatorMath.ewmCovSeries(xs, xs, 940).flatten.forall(_ >= 0.0)
    })
  }
}
