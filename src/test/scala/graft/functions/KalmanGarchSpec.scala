package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the state-space window functions: the local-level Kalman
  * filter and GARCH(1,1) conditional volatility. Both are verified
  * against direct Scala replays of their published recurrences, plus the
  * frozen-state NULL contract (frozen ≡ filtered equivalence) and the
  * analysis-time argument validation shared by every indicator. */
class KalmanGarchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val w = Window.partitionBy("sym").orderBy("i")

  private def series(vs: Option[Double]*) =
    vs.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("sym", "i", "v")

  private def collectD(df: org.apache.spark.sql.DataFrame, c: String): Map[Int, Option[Double]] =
    df.collect().map(r => r.getAs[Int]("i") ->
      Option(r.getAs[java.lang.Double](c)).map(_.doubleValue())).toMap

  test("kalman: matches the direct predict/update recurrence") {
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 13.0)
    val df = series(xs.map(Some(_)): _*)
    val out = collectD(df.select(col("i"),
      FinancialFunctions.kalman(col("v"), 10, 1000).over(w).as("m")), "m")
    // direct replay: q/r from the same permille division
    val q = 10 / 1000.0; val r = 1000 / 1000.0
    var m = Double.NaN; var p = 0.0
    val exp = xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) { m = x; p = r }
      else {
        val pp = p + q
        val k = pp / (pp + r)
        m = m + k * (x - m)
        p = (1 - k) * pp
      }
      m
    }
    for (i <- xs.indices)
      assert(out(i) === Some(exp(i)), s"row $i")
    // the gain shrinks toward steady state: later estimates damp noise,
    // so the filtered level stays strictly inside the raw swing
    assert(out(6).get > 13.0 && out(6).get < 18.0)
  }

  test("kalman: NULL rows emit NULL and freeze the state (frozen ≡ filtered)") {
    val withNulls = series(Some(10.0), None, Some(12.0), None, Some(11.0))
    val dense = series(Some(10.0), Some(12.0), Some(11.0))
    val a = collectD(withNulls.select(col("i"),
      FinancialFunctions.kalman(col("v"), 10, 1000).over(w).as("m")), "m")
    val b = collectD(dense.select(col("i"),
      FinancialFunctions.kalman(col("v"), 10, 1000).over(w).as("m")), "m")
    assert(a(1) === None && a(3) === None)
    assert(a(0) === b(0) && a(2) === b(1) && a(4) === b(2))
  }

  test("kalman: window args must be positive literals (analysis-time)") {
    val df = series(Some(1.0), Some(2.0))
    // Spark 4 analyzes eagerly — the select itself raises
    val e = intercept[AnalysisException](df.select(
      FinancialFunctions.kalman(col("v"), 0, 1000).over(w).as("m")))
    assert(e.getMessage.contains("kalman"))
  }

  test("garch: matches the direct Bollerslev recurrence incl. NULL lead-in") {
    // returns with a NULL first element, the lag(close) shape
    val rets = Seq(None, Some(0.01), Some(-0.02), Some(0.005), Some(0.03))
    val df = series(rets: _*)
    val out = collectD(df.select(col("i"),
      FinancialFunctions.garch(col("v"), 2, 100, 850).over(w).as("s")), "s")
    val omega = 2 / 1e6; val alpha = 100 / 1000.0; val beta = 850 / 1000.0
    var sig2 = Double.NaN; var prevR = Double.NaN
    val exp = rets.map {
      case None => None
      case Some(x) =>
        sig2 = if (sig2.isNaN) omega / (1.0 - alpha - beta)
               else omega + (alpha * (prevR * prevR) + beta * sig2)
        prevR = x
        Some(math.sqrt(sig2))
    }
    for (i <- rets.indices)
      assert(out(i) === exp(i), s"row $i")
    // first emitted value IS the stationary vol
    assert(out(1) === Some(math.sqrt((2 / 1e6) / (1.0 - 0.1 - 0.85))))
  }

  test("garch: emitted vol never depends on the current row's return") {
    // two series differing ONLY in the final return must agree on every
    // emitted σ (σ_t is conditional on info through t−1)
    val a = series(Some(0.01), Some(-0.02), Some(0.005))
    val b = series(Some(0.01), Some(-0.02), Some(0.5))
    val oa = collectD(a.select(col("i"),
      FinancialFunctions.garch(col("v"), 2, 100, 850).over(w).as("s")), "s")
    val ob = collectD(b.select(col("i"),
      FinancialFunctions.garch(col("v"), 2, 100, 850).over(w).as("s")), "s")
    assert(oa === ob)
  }

  test("garch: rejects non-stationary alpha+beta >= 1 at analysis time") {
    val df = series(Some(0.01), Some(0.02))
    val e = intercept[AnalysisException](df.select(
      FinancialFunctions.garch(col("v"), 2, 200, 800).over(w).as("s")))
    assert(e.getMessage.contains("stationarity"))
  }

  test("kalman/garch resolve through SQL registration like every indicator") {
    FinancialFunctions.registerAll(spark)
    series(Some(1.0), Some(2.0), Some(3.0)).createOrReplaceTempView("kg_probe")
    val n = spark.sql(
      """SELECT kalman(v, 10, 1000) OVER (PARTITION BY sym ORDER BY i) AS m,
        |       garch(v, 2, 100, 850) OVER (PARTITION BY sym ORDER BY i) AS s
        |FROM kg_probe""".stripMargin).where(col("m").isNotNull).count()
    assert(n === 3)
  }
}
