package graft.examples

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.operators.{Signals, Validation}
import graft.sources.{Polygon, PolygonClient}

/** End-to-end local demo — the analog of the reference's
  * `examples/local_demo.rs` (`/root/reference/examples/local_demo.rs:87-116`):
  * writes a small Polygon-layout day-aggs CSV tree, loads it through
  * [[PolygonClient]], runs indicator SQL, validation, and signal scans.
  *
  * Run: `sbt "runMain graft.examples.LocalDemo"`
  */
object LocalDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-local-demo")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // sample data: two crypto tickers, 28 days (shape of the reference's
    // sample_data/global_crypto/day_aggs_v1/2023/2023-01-15.csv)
    val root = Files.createTempDirectory("graft_demo").toString
    val dir = Paths.get(root, "global_crypto", "day_aggs_v1", "2023")
    Files.createDirectories(dir)
    val rows = new StringBuilder("ticker,date,open,high,low,close,volume,vwap,transactions\n")
    for (t <- Seq("X:BTCUSD", "X:ETHUSD"); d <- 1 to 28) {
      val base = if (t.contains("BTC")) 21000.0 else 1500.0
      val close = base + d * (if (d % 7 == 0) -15.0 else 10.0)
      rows.append(f"$t,2023-01-$d%02d,${close - 5}%.2f,${close + 10}%.2f,${close - 12}%.2f,$close%.2f,${1000 + d},${close - 1}%.2f,${100 + d}\n")
    }
    Files.write(dir.resolve("2023-01-15.csv"), rows.toString.getBytes)

    val client = new PolygonClient(spark, Polygon.Local(root))
    val day = client.loadData(Polygon.AssetClass.Crypto, Polygon.DataType.DayAggs,
      LocalDate.of(2023, 1, 15))
    client.registerTableWithIndicators("crypto_data", day)

    println("== Indicators (local_demo.rs:50-61 query) ==")
    spark.sql("""
      SELECT ticker, date, close,
        sma(close, 3)  OVER w AS sma_3,
        ema(close, 5)  OVER w AS ema_5,
        rsi(close, 5)  OVER w AS rsi_5,
        macd(close)    OVER w AS macd
      FROM crypto_data WINDOW w AS (PARTITION BY ticker ORDER BY date)
      ORDER BY ticker, date""").show(10, false)

    println("== Validation ==")
    println(Validation.validateDayAggs(day).summary)

    println("== RSI signals ==")
    Signals.detectRsiSignals(day, "ticker", Seq("date"), "close", window = 5)
      .show(5, false)

    println("== MA crossovers ==")
    Signals.detectMaCrossoverSignals(day, "ticker", Seq("date"), "close",
      shortWindow = 3, longWindow = 8).show(5, false)

    spark.stop()
  }
}
