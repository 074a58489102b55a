package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Bars, Rolling, Stats}

/** Technical-screener example: the round-8 indicator surface as one
  * watchlist pipeline — resample ticks to daily bars, stack SuperTrend,
  * Parabolic SAR, Connors RSI, Hull MA, and the risk-ratio battery per
  * symbol, then screen for the classic long setup (price above both
  * trailing stops, short-term washout, acceptable downside profile) and
  * rank the survivors by market beta.
  *
  * Every operator here is a keyed Window pass or a combinable aggregate
  * over ONE symbol-partitioned exchange — the whole screen is a handful
  * of stages regardless of symbol count.
  *
  * Run: `sbt "runMain graft.examples.TechnicalScreener [sfDir]"` */
object TechnicalScreener {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-technical-screener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)

    val ticks = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("l_tick", expr("l_orderkey * 8 + l_linenumber"))
    val bars = Bars.ohlc(ticks, "l_quantity", "l_extendedprice",
      Seq("l_suppkey"), "l_shipdate", Seq("l_tick"), volScale = 2)
    val (part, ord) = (Seq("l_suppkey"), Seq("l_shipdate"))

    println("== 1. Trend stops: SuperTrend (ATR10 x3) + Parabolic SAR ==")
    val trended = Rolling.parabolicSar(
      Rolling.superTrend(bars, "high", "low", "close", part, ord,
        n = 10, mult = 3),
      "high", "low", part, ord)
    trended.select("l_suppkey", "l_shipdate", "close", "supertrend", "psar")
      .orderBy(desc("l_shipdate")).show(5)

    println("== 2. Mean-reversion timing: Connors RSI + Hull MA ==")
    val timed = Rolling.hullMa(
      Rolling.connorsRsi(trended, "close", part, ord, rankN = 20),
      "close", part, ord, n = 16)
    timed.select("l_suppkey", "l_shipdate", "crsi", "hma")
      .orderBy(desc("l_shipdate")).show(5)

    println("== 3. Downside profile per symbol ==")
    val ratios = Rolling.riskRatios(
      Rolling.logReturns(bars, "close", part, ord),
      "ret_log", part, ord, annualize = math.sqrt(252.0))
    ratios.orderBy(desc("sortino")).show(5)

    println("== 4. The screen: above both stops, washed-out CRSI ==")
    val latest = timed.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(part.map(col): _*)
          .orderBy(col("l_shipdate").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val setups = latest.filter(
        col("close") >= col("supertrend") && col("close") >= col("psar") &&
        col("crsi") < 40.0)
      .join(ratios.filter(col("omega").isNull || col("omega") >= 1.0),
        "l_suppkey")
    println(s"setups: ${setups.count()}")

    println("== 5. Rank survivors by market coupling ==")
    val beta = Rolling.marketBeta(bars, "close", part, ord, n = 20)
      .groupBy(col("l_suppkey")).agg(last(col("mkt_beta"), ignoreNulls = true)
        .as("mkt_beta"))
    setups.join(beta, "l_suppkey")
      .select("l_suppkey", "close", "supertrend", "psar", "crsi", "mkt_beta")
      .orderBy(asc("mkt_beta")).show(10)

    println("== 6. Cross-sectional context: pairwise correlation matrix ==")
    Stats.pairwiseCorr(bars, "l_suppkey", "l_shipdate", "close",
        minOverlap = 10)
      .orderBy(desc("corr")).show(5)

    spark.stop()
  }
}
