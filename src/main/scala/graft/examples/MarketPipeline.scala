package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Bars, Rolling, Signals}

/** Financial-surface example: the full market-analytics path over the
  * synthetic tick data — OHLC resampling, the indicator stack (native
  * window functions + rolling family), candlestick patterns, an event
  * study grading a signal, and per-key performance summaries.
  *
  * Run: `sbt "runMain graft.examples.MarketPipeline [sfDir]"` */
object MarketPipeline {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-market-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)

    println("== 1. Ticks -> daily OHLC bars ==")
    val ticks = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("tick", expr("l_orderkey * 8 + l_linenumber"))
    val bars = Bars.ohlc(ticks, "l_quantity", "l_extendedprice",
      Seq("l_suppkey"), "l_shipdate", Seq("tick"), volScale = 2)
    println(s"${bars.count()} bars")

    println("== 2. Indicator stack: ADX trend strength + Ichimoku ==")
    val withAdx = Rolling.adx(bars, "high", "low", "close",
      Seq("l_suppkey"), Seq("l_shipdate"), n = 14)
    withAdx.filter(col("adx").isNotNull)
      .select("l_suppkey", "l_shipdate", "di_plus", "di_minus", "adx")
      .orderBy(col("adx").desc).limit(5).show(false)

    println("== 3. Candlestick patterns on the bar stream ==")
    val pats = Signals.candlePatterns(bars, "open", "high", "low", "close",
      Seq("l_suppkey"), Seq("l_shipdate"))
    pats.agg(
      sum(col("doji").cast("long")).as("doji"),
      sum(col("hammer").cast("long")).as("hammer"),
      sum(col("bullish_engulfing").cast("long")).as("bull_engulf"),
      sum(col("bearish_engulfing").cast("long")).as("bear_engulf")).show()

    println("== 4. Event study: do bullish engulfings predict up-moves? ==")
    val rets = Rolling.logReturns(pats, "close",
      Seq("l_suppkey"), Seq("l_shipdate"))
    Signals.eventStudy(rets, "ret_log", "bullish_engulfing",
        Seq("l_suppkey"), Seq("l_shipdate"), maxHorizon = 3)
      .orderBy("horizon").show(false)

    println("== 5. Per-supplier performance screen (top Sharpe) ==")
    Rolling.perfSummary(rets, "ret_log", Seq("l_suppkey"),
        Seq("l_shipdate"), annualize = math.sqrt(252.0))
      .orderBy(col("sharpe").desc_nulls_last).limit(5).show(false)

    spark.stop()
  }
}
