package graft.examples

import org.apache.spark.sql.SparkSession

/** Analog of the reference's `examples/basic_usage.rs`
  * (`/root/reference/examples/basic_usage.rs:1-55`): register the financial
  * functions, build a 10-row inline stock table, and compute SMA/EMA in SQL.
  *
  * One deliberate divergence: the reference writes `OVER ()`; this library
  * requires an ordered window (SURVEY §7.1.6 — an unordered running frame is
  * nondeterministic under Spark's distributed scan), so the example orders
  * by date.
  *
  * Run: `sbt "runMain graft.examples.BasicUsage"` */
object BasicUsage {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-basic-usage")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)

    val stock =
      """(VALUES
        |  ('2024-01-01', 100.0), ('2024-01-02', 102.0), ('2024-01-03', 98.0),
        |  ('2024-01-04', 105.0), ('2024-01-05', 107.0), ('2024-01-06', 103.0),
        |  ('2024-01-07', 110.0), ('2024-01-08', 108.0), ('2024-01-09', 112.0),
        |  ('2024-01-10', 115.0)
        |) AS stock_data(date, close_price)""".stripMargin

    println("Original stock data:")
    spark.sql(s"SELECT * FROM $stock").show()

    println("Stock data with 3-day SMA and EMA:")
    spark.sql(
      s"""SELECT date, close_price,
         |  sma(close_price, 3) OVER (ORDER BY date) AS sma_3,
         |  ema(close_price, 3) OVER (ORDER BY date) AS ema_3
         |FROM $stock""".stripMargin).show()

    spark.stop()
  }
}
