package graft.examples

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.operators.Validation
import graft.sources.{Polygon, PolygonClient}

/** Analog of the reference's `examples/validate.rs`
  * (`/root/reference/examples/validate.rs:1-75`): load local day-aggs through
  * the Polygon client, run the day-aggs validation report, then the data
  * overview aggregate.
  *
  * Run: `sbt "runMain graft.examples.ValidateDemo"` */
object ValidateDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-validate-demo")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // sample local tree, incl. one weekend row and one zero-volume row so
    // the report has something to say
    val root = Files.createTempDirectory("graft_validate").toString
    val dir = Paths.get(root, "global_crypto", "day_aggs_v1", "2023")
    Files.createDirectories(dir)
    val rows = new StringBuilder("ticker,date,open,high,low,close,volume,vwap,transactions\n")
    for (d <- 9 to 15) { // 2023-01-14/15 are a weekend
      val close = 21000.0 + d * 10
      val vol = if (d == 12) 0 else 1000 + d
      rows.append(f"X:BTCUSD,2023-01-$d%02d,${close - 5}%.2f,${close + 10}%.2f,${close - 12}%.2f,$close%.2f,$vol,${close - 1}%.2f,${100 + d}\n")
    }
    Files.write(dir.resolve("2023-01-15.csv"), rows.toString.getBytes)

    val client = new PolygonClient(spark, Polygon.Local(root))
    val day = client.loadData(Polygon.AssetClass.Crypto, Polygon.DataType.DayAggs,
      LocalDate.of(2023, 1, 15))
    client.registerTableWithIndicators("validation_data", day)

    println("== Validation report (validate.rs:28-45) ==")
    val report = Validation.validateDayAggs(day)
    println(report.summary)
    println(if (report.passed) "All validation checks passed."
            else "Some validation checks failed — review the issues above.")

    println("== Data overview (validate.rs:49-60) ==")
    spark.sql(
      """SELECT count(*) AS total_rows,
        |  count(DISTINCT ticker) AS unique_symbols,
        |  min(date) AS earliest_date,
        |  max(date) AS latest_date,
        |  avg(close) AS avg_close_price,
        |  sum(volume) AS total_volume
        |FROM validation_data""".stripMargin).show(false)

    spark.stop()
  }
}
