package graft.examples

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.sources.{Polygon, PolygonClient}

/** Analog of the reference's `examples/multi_asset_class_demo.rs`
  * (`/root/reference/examples/multi_asset_class_demo.rs:1-120`): load several
  * asset classes through one client and run per-class technical analysis.
  * The reference walks Polygon's S3 flat files; offline this demo writes the
  * identical directory layout locally — swap `Polygon.Local(root)` for
  * `Polygon.S3(config)` to run against the real bucket.
  *
  * Run: `sbt "runMain graft.examples.MultiAssetDemo"` */
object MultiAssetDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-multi-asset-demo")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val assets = Seq(
      (Polygon.AssetClass.Stocks, "AAPL", 185.0),
      (Polygon.AssetClass.Crypto, "X:BTCUSD", 21000.0),
      (Polygon.AssetClass.Forex, "C:EURUSD", 1.07))

    val root = Files.createTempDirectory("graft_multi_asset").toString
    assets.foreach { case (asset, ticker, base) =>
      val dir = Paths.get(root, asset.prefix, Polygon.DataType.DayAggs.dir, "2023")
      Files.createDirectories(dir)
      val rows = new StringBuilder("ticker,date,open,high,low,close,volume,vwap,transactions\n")
      for (d <- 1 to 28) {
        val close = base * (1.0 + 0.002 * d * (if (d % 5 == 0) -1 else 1))
        rows.append(f"$ticker,2023-01-$d%02d,${close * 0.999}%.4f,${close * 1.004}%.4f,${close * 0.995}%.4f,$close%.4f,${5000 + d * 10},${close * 1.001}%.4f,${400 + d}\n")
      }
      Files.write(dir.resolve("2023-01-03.csv"), rows.toString.getBytes)
    }

    val client = new PolygonClient(spark, Polygon.Local(root))

    println("Discovered asset classes: " +
      client.discoverAssetClasses().mkString(", "))

    assets.foreach { case (asset, ticker, _) =>
      println(s"\n== ${asset.prefix} / $ticker ==")
      val df = client.loadData(asset, Polygon.DataType.DayAggs,
        LocalDate.of(2023, 1, 3), Some(ticker))
      client.registerTableWithIndicators("asset_data", df)
      spark.sql(
        """SELECT ticker, date, close,
          |  sma(close, 20) OVER (PARTITION BY ticker ORDER BY date) AS sma_20,
          |  rsi(close, 14) OVER (PARTITION BY ticker ORDER BY date) AS rsi_14
          |FROM asset_data ORDER BY date DESC""".stripMargin).show(3, false)
    }

    spark.stop()
  }
}
