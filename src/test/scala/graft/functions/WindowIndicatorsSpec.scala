package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowIndicatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def runSql(values: Seq[Option[Double]], call: String): Seq[Option[Double]] = {
    values.zipWithIndex.toDF("v", "i").createOrReplaceTempView("t")
    spark.sql(s"SELECT $call OVER (ORDER BY i) AS r FROM t ORDER BY i")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  private def assertSeq(got: Seq[Option[Double]], exp: Seq[Option[Double]]): Unit = {
    assert(got.length === exp.length)
    got.zip(exp).zipWithIndex.foreach {
      case ((Some(g), Some(e)), i) => assert(math.abs(g - e) < 1e-12, s"at row $i: $g vs $e")
      case ((g, e), i)             => assert(g === e, s"at row $i")
    }
  }

  private val series: Seq[Option[Double]] =
    Seq(10.0, 12.0, 13.0, 12.0, 15.0, 11.0, 16.0, 14.0, 18.0, 20.0).map(Some(_))

  private val withNulls: Seq[Option[Double]] =
    Seq(Some(10.0), None, Some(12.0), Some(13.0), None, Some(11.0), Some(16.0))

  test("sma SQL matches IndicatorMath incl. nulls") {
    assertSeq(runSql(series, "sma(v, 3)"), IndicatorMath.smaSeries(series, 3))
    assertSeq(runSql(withNulls, "sma(v, 3)"), IndicatorMath.smaSeries(withNulls, 3))
  }

  test("ema SQL matches IndicatorMath incl. nulls; first value seeds") {
    assertSeq(runSql(series, "ema(v, 3)"), IndicatorMath.emaSeries(series, 3))
    assertSeq(runSql(withNulls, "ema(v, 3)"), IndicatorMath.emaSeries(withNulls, 3))
    assert(runSql(series, "ema(v, 3)").head === Some(10.0))
  }

  test("rsi SQL matches IndicatorMath on Wilder's series incl. nulls") {
    val wilder = Seq(44.34, 44.09, 44.15, 43.61, 44.33, 44.83, 45.85, 46.08,
      45.89, 46.03, 46.83, 47.69, 46.49, 46.26, 47.09, 46.66, 46.80, 46.23,
      46.38, 46.33, 46.51).map(Option(_))
    val got = runSql(wilder, "rsi(v, 14)")
    assertSeq(got, IndicatorMath.rsiSeries(wilder, 14))
    assert(math.abs(got(14).get - 68.1638044914135) < 1e-9)
    assertSeq(runSql(withNulls, "rsi(v, 2)"), IndicatorMath.rsiSeries(withNulls, 2))
  }

  test("macd SQL matches IndicatorMath; row0 emits 0.0") {
    val xs = (0 until 30).map(i => Option(100.0 + math.sin(i) * 5 + i))
    val got = runSql(xs, "macd(v)")
    assertSeq(got, IndicatorMath.macdSeries(xs))
    assert(got.head === Some(0.0))
    assertSeq(runSql(withNulls, "macd(v)"), IndicatorMath.macdSeries(withNulls))
  }

  test("macd_signal / macd_hist SQL match IndicatorMath; seed row emits 0.0") {
    val xs = (0 until 30).map(i => Option(100.0 + math.sin(i) * 5 + i))
    val exp = IndicatorMath.macdSignalHistSeries(xs)
    assertSeq(runSql(xs, "macd_signal(v)"), exp.map(_._1))
    assertSeq(runSql(xs, "macd_hist(v)"), exp.map(_._2))
    assert(runSql(xs, "macd_signal(v)").head === Some(0.0))
    // hist == line − signal row-wise
    val line = runSql(xs, "macd(v)")
    val sig = runSql(xs, "macd_signal(v)")
    val hist = runSql(xs, "macd_hist(v)")
    line.zip(sig).zip(hist).foreach { case ((Some(l), Some(s)), Some(h)) =>
      assert(math.abs(h - (l - s)) < 1e-12)
    }
    val expN = IndicatorMath.macdSignalHistSeries(withNulls)
    assertSeq(runSql(withNulls, "macd_signal(v)"), expN.map(_._1))
    assertSeq(runSql(withNulls, "macd_hist(v)"), expN.map(_._2))
  }

  test("ewmcov SQL matches IndicatorMath; freezes on either-side NULL") {
    def runSql2(xs: Seq[Option[Double]], ys: Seq[Option[Double]],
                call: String): Seq[Option[Double]] = {
      xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (x, y, i) }
        .toDF("x", "y", "i").createOrReplaceTempView("t2")
      spark.sql(s"SELECT $call OVER (ORDER BY i) AS r FROM t2 ORDER BY i")
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    }
    val xs = Seq(1.0, 2.0, -1.0, 3.0, 0.5).map(Option(_))
    val ys = Seq(2.0, -1.0, 4.0, 1.0, 2.5).map(Option(_))
    assertSeq(runSql2(xs, ys, "ewmcov(x, y, 940)"),
      IndicatorMath.ewmCovSeries(xs, ys, 940))
    // ewmcov(x, x, λ) is the EWMA variance — always ≥ 0 here
    val vx = runSql2(xs, xs, "ewmcov(x, x, 940)")
    assertSeq(vx, IndicatorMath.ewmCovSeries(xs, xs, 940))
    assert(vx.flatten.forall(_ >= 0.0))
    // NULL on either side → NULL out, state frozen
    val xn = Seq(Some(1.0), None, Some(2.0), Some(3.0))
    val yn = Seq(Some(2.0), Some(9.0), None, Some(1.0))
    assertSeq(runSql2(xn, yn, "ewmcov(x, y, 940)"),
      IndicatorMath.ewmCovSeries(xn, yn, 940))
    // analysis-time rails: λ ≥ 1 and non-literal λ rejected
    val e1 = intercept[Exception](runSql2(xs, ys, "ewmcov(x, y, 1000)"))
    assert(e1.getMessage.contains("lambda_pm < 1000"))
    val e2 = intercept[Exception](runSql2(xs, ys, "ewmcov(x, y, i)"))
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("var_ema with a constant alpha is bit-equal to the fixed ema") {
    // Subtract(1.0, a) at runtime and Literal(1 − α) at plan time are the
    // same IEEE subtract of the same double — the whole chain must agree
    // to the last bit, not within tolerance
    val fixed = runSql(series ++ withNulls, "ema(v, 12)")
    // 2.0D/13.0D: plain 2.0/13.0 would be Spark-SQL DECIMAL division —
    // the same truncation trap the DuckDB oracles dodge with ::DOUBLE
    val varying = runSql(series ++ withNulls, "var_ema(v, 2.0D / 13.0D)")
    assert(varying === fixed)
  }

  test("var_ema freezes when ALPHA is null, not just value") {
    val out = spark.sql(
      """SELECT var_ema(v, CASE WHEN i = 2 THEN CAST(NULL AS DOUBLE)
        |                       ELSE 0.5 END) OVER (ORDER BY i) AS r
        |FROM (VALUES (0, 10.0), (1, 20.0), (2, 99.0), (3, 20.0)) t(i, v)
        |ORDER BY i""".stripMargin)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0) === Some(10.0))           // seed
    assert(out(1) === Some(0.5 * 20.0 + 0.5 * 10.0))
    assert(out(2) === None)                 // null alpha: emit NULL, freeze
    // row 3 resumes from the FROZEN state (15.0), untouched by row 2's 99
    assert(out(3) === Some(0.5 * 20.0 + 0.5 * 15.0))
  }

  test("runprod matches a strictfp sequential fold bit-for-bit; null freezes") {
    val factors = Seq(Some(1.01), Some(0.97), None, Some(1.10), Some(1.0),
      Some(0.5), None, Some(2.0))
    val got = runSql(factors, "runprod(v)")
    var state: Option[Double] = None
    val exp = factors.map {
      case None => None
      case Some(f) =>
        state = Some(state.fold(f)(_ * f))
        state
    }
    assert(got === exp) // exact equality — multiplication is one IEEE op
  }

  test("renko freezes on null and resumes from the frozen level") {
    val got = runSql(Seq(Some(10.0), None, Some(17.0), Some(10.0)),
      "renko(v, 500)")
    // null emits NULL, state stays 10; 17 is one brick up → 15; back → 10
    assert(got === Seq(Some(10.0), None, Some(15.0), Some(10.0)))
  }

  test("partitioned windows keep per-key state isolated (Column API)") {
    val df = Seq(
      ("A", 1, 10.0), ("A", 2, 12.0), ("A", 3, 13.0), ("A", 4, 12.0),
      ("B", 1, 100.0), ("B", 2, 104.0), ("B", 3, 96.0), ("B", 4, 100.0)
    ).toDF("k", "i", "v")
    val w = Window.partitionBy($"k").orderBy($"i")
    val got = df
      .withColumn("sma3", FinancialFunctions.sma($"v", 3).over(w))
      .withColumn("ema3", FinancialFunctions.ema($"v", 3).over(w))
      .orderBy($"k", $"i")
      .collect()
    val byKey = got.groupBy(_.getString(0))
    Seq("A", "B").foreach { k =>
      val vs = byKey(k).map(r => Option(r.getDouble(2))).toSeq
      val smaExp = IndicatorMath.smaSeries(vs, 3)
      val emaExp = IndicatorMath.emaSeries(vs, 3)
      byKey(k).zipWithIndex.foreach { case (r, i) =>
        val smaGot = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        val emaGot = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        assert(smaGot === smaExp(i), s"sma $k row $i")
        assert(emaGot.map(v => math.abs(v - emaExp(i).get) < 1e-12) !== Some(false), s"ema $k row $i")
      }
    }
  }

  test("integer input columns are accepted (implicit cast)") {
    val got = runSql(Seq(1.0, 2.0, 3.0, 4.0).map(Some(_)), "sma(CAST(v AS INT), 2)")
    assertSeq(got, Seq(None, Some(1.5), Some(2.5), Some(3.5)))
  }

  test("non-literal window size is rejected") {
    intercept[Exception] {
      runSql(series, "sma(v, CAST(v AS INT))")
    }
  }

  test("local_demo-style end-to-end query over the 5-row crypto sample") {
    // mirrors reference examples/local_demo.rs:50-61 + sample CSV fixture
    val rows = Seq(
      ("BTC", "2023-01-15", 21350.00), ("ETH", "2023-01-15", 1575.75),
      ("LTC", "2023-01-15", 86.50), ("ADA", "2023-01-15", 0.36),
      ("DOT", "2023-01-15", 6.35))
    rows.toDF("ticker", "date", "close").createOrReplaceTempView("crypto_data")
    val out = spark.sql(
      """SELECT ticker, close,
        |  sma(close, 3) OVER (PARTITION BY ticker ORDER BY date) AS sma_3,
        |  rsi(close, 5) OVER (PARTITION BY ticker ORDER BY date) AS rsi_5
        |FROM crypto_data ORDER BY ticker, date""".stripMargin).collect()
    assert(out.length === 5)
    // single row per ticker -> both indicators still warming up => null
    out.foreach { r => assert(r.isNullAt(2) && r.isNullAt(3)) }
  }

  /** Scala replica of the HoltWinters update trees, op-for-op (JEP 306
    * always-strictfp makes it a bit-exact mirror of the Catalyst fold). */
  private def hwSeries(values: Seq[Option[Double]], p: Int, a: Double,
                       b: Double, g: Double): Seq[Option[Double]] = {
    var lvl: Option[Double] = None
    var trd: Option[Double] = None
    val s = Array.fill(p)(0.0)
    var cnt = 0L
    values.map {
      case None => None
      case Some(x) =>
        val phi = (cnt % p).toInt
        val sPrev = s(phi)
        (lvl, trd) match {
          case (None, _) =>
            lvl = Some(x - sPrev)
          case (Some(l), None) =>
            lvl = Some(x - sPrev); trd = Some((x - sPrev) - l)
          case (Some(l), Some(t)) =>
            val newLvl = a * (x - sPrev) + (1.0 - a) * (l + t)
            trd = Some(b * (newLvl - l) + (1.0 - b) * t)
            lvl = Some(newLvl)
            s(phi) = g * (x - (l + t)) + (1.0 - g) * sPrev
        }
        cnt += 1
        trd.map(t => (lvl.get + t) + s(phi))
    }
  }

  test("holt_winters SQL matches the Scala replica fold bit-for-bit") {
    var seed = 42L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    val walk: Seq[Option[Double]] = (0 until 200).map { i =>
      if (i == 77) None // frozen-state row
      else Some(100.0 + 3.0 * math.sin(2.0 * math.Pi * (i % 7) / 7.0) +
        (next() >>> 50).toDouble / 1e3)
    }
    val got = runSql(walk, "holt_winters(v, 7, 300, 200, 300)")
    val exp = hwSeries(walk, 7, 0.3, 0.2, 0.3)
    assert(got.length === exp.length)
    got.zip(exp).zipWithIndex.foreach { case ((gv, ev), i) =>
      assert(gv === ev, s"divergence at row $i")
    }
  }

  test("holt_winters seeding: rows 1-2 emit exactly what holt would") {
    val xs = Seq(Some(10.0), Some(12.0), None, Some(13.0))
    val hw = runSql(xs, "holt_winters(v, 7, 300, 200, 300)")
    assert(hw(0) === None)                     // trend unseeded
    assert(hw(1) === Some(12.0 + (12.0 - 10.0))) // 2*x2 - x1, seasonal 0
    assert(hw(2) === None)                     // frozen NULL row
  }

  test("holt_winters learns a planted additive seasonal pattern") {
    val s = Seq(2.0, -1.0, -1.0)
    val xs: Seq[Option[Double]] =
      (0 until 120).map(t => Some(50.0 + s(t % 3)))
    val out = runSql(xs, "holt_winters(v, 3, 200, 100, 500)")
    // after convergence the fitted value tracks the planted curve closely
    val tail = out.drop(100).map(_.get)
    val target = (100 until 120).map(t => 50.0 + s(t % 3))
    tail.zip(target).foreach { case (f, x) =>
      assert(math.abs(f - x) < 0.15, s"fit $f vs $x")
    }
  }

  test("holt_winters argument rails") {
    val e1 = intercept[Exception] {
      runSql(series, "holt_winters(v, 1, 300, 200, 300)")
    }
    assert(e1.getMessage.contains("period"))
    val e2 = intercept[Exception] {
      runSql(series, "holt_winters(v, 7, 1500, 200, 300)")
    }
    assert(e2.getMessage.contains("permille"))
  }
}
