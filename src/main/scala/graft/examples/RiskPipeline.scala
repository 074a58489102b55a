package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Rolling, Skew, Stats}

/** Risk-surface example: the volatility/dependence path over the
  * synthetic tick data — log returns, GARCH(1,1) conditional volatility,
  * EWMA covariance/correlation (RiskMetrics λ), rolling historical
  * VaR + expected shortfall, lag-k autocorrelation (mean reversion), an
  * exact weighted median, and the key-skew report that decides whether
  * the risk aggregations need salting.
  *
  * Run: `sbt "runMain graft.examples.RiskPipeline [sfDir]"` */
object RiskPipeline {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-risk-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)
    val ticks = spark.read.parquet(s"$dir/lineitem.parquet")

    println("== 1. Log returns per supplier series ==")
    val rets = Rolling.logReturns(ticks, "l_extendedprice",
      Seq("l_suppkey"), Seq("l_shipdate", "l_orderkey", "l_linenumber"))
    rets.filter(col("ret_log").isNotNull).select("l_suppkey", "ret_log")
      .show(3, truncate = false)

    println("== 2. GARCH(1,1) conditional volatility (native window fn) ==")
    rets.createOrReplaceTempView("rets")
    spark.sql(
      """SELECT l_suppkey, garch(ret_log, 50, 100, 850)
        |  OVER (PARTITION BY l_suppkey
        |        ORDER BY l_shipdate, l_orderkey, l_linenumber) AS sigma
        |FROM rets""".stripMargin)
      .filter(col("sigma").isNotNull)
      .agg(avg("sigma").as("mean_cond_vol")).show(false)

    println("== 3. EWMA correlation of quantity vs price (RiskMetrics 0.94) ==")
    spark.sql(
      """WITH e AS (
        |  SELECT l_suppkey,
        |    ewmcov(l_quantity, l_extendedprice, 940) OVER w AS cxy,
        |    ewmcov(l_quantity, l_quantity, 940) OVER w AS vx,
        |    ewmcov(l_extendedprice, l_extendedprice, 940) OVER w AS vy
        |  FROM rets
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |)
        |SELECT avg(cxy / (sqrt(vx) * sqrt(vy))) AS mean_ewm_corr
        |FROM e WHERE vx > 0 AND vy > 0""".stripMargin)
      .show(false)

    println("== 4. Rolling historical VaR(95) + expected shortfall ==")
    val varEs = Rolling.historicalVar(rets, "ret_log",
      Seq("l_suppkey"), Seq("l_shipdate", "l_orderkey", "l_linenumber"),
      n = 50, alpha = 0.05)
    varEs.filter(col("var_alpha").isNotNull)
      .agg(avg("var_alpha").as("mean_var"), avg("es_alpha").as("mean_es"))
      .show(false)

    println("== 5. Lag-4 autocorrelation (mean reversion screen) ==")
    Rolling.autocorr(ticks, "l_quantity", Seq("l_suppkey"),
        Seq("l_shipdate", "l_orderkey", "l_linenumber"), n = 20, lagK = 4)
      .filter(col("roll_autocorr").isNotNull)
      .agg(avg("roll_autocorr").as("mean_lag4_acf")).show(false)

    println("== 6. Quantity-weighted median price per supplier ==")
    Stats.weightedMedian(ticks, Seq("l_suppkey"),
        "l_extendedprice", "l_quantity")
      .orderBy("l_suppkey").show(3, truncate = false)

    println("== 7. Key-skew report: does this corpus need salting? ==")
    Skew.keyReport(ticks, Seq("l_suppkey"), topK = 5).show(false)

    spark.stop()
  }
}
