package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality validation (reference `src/polygon/validator.rs`).
  *
  * Each validator runs ONE aggregation job over the table (all value checks
  * are conditional counts in a single pass — the reference issues one SQL
  * query per check, `validator.rs:70-157`; fusing them scans the data once).
  * The gap check needs an ordered window; it is partitioned by ticker so the
  * sort distributes (the reference's global `ORDER BY window_start`
  * single-partition sort would not survive 100 TB).
  */
final case class ValidationReport(totalRows: Long, checks: Map[String, Long]) {
  /** A report passes when no check counted a violating row
    * (reference `validator.rs:25-37`). */
  def passed: Boolean = checks.values.forall(_ == 0L)

  /** Text rendering (reference `validator.rs:39-48`). */
  def summary: String = {
    val b = new StringBuilder
    b.append("=== Validation Report ===\n")
    b.append(s"Total rows: $totalRows\n")
    b.append(s"Status: ${if (passed) "PASSED" else "FAILED"}\n")
    checks.toSeq.sortBy(_._1).foreach { case (name, failed) =>
      b.append(s"  $name: ${if (failed == 0) "OK" else s"$failed failed rows"}\n")
    }
    b.toString
  }
}

object Validation {

  /** Minute-aggregates validation (reference `validator.rs:63-163`):
    * row count, >maxGapSeconds timestamp gaps per ticker, negative/zero
    * values, OHLC consistency. */
  def validateMinuteAggs(df: DataFrame, maxGapSeconds: Long = 60): ValidationReport = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ticker")).orderBy(col("window_start"))
    val withGap = df.withColumn("prev_ts", lag(col("window_start"), 1).over(w))
    val row = withGap.agg(
      count(lit(1)).as("total"),
      count(when(col("prev_ts").isNotNull &&
        (unix_timestamp(col("window_start")) - unix_timestamp(col("prev_ts"))) > maxGapSeconds,
        1)).as("timestamp_gaps"),
      count(when(col("volume") < 0, 1)).as("negative_volume"),
      count(when(col("open") <= 0 || col("close") <= 0 ||
        col("high") <= 0 || col("low") <= 0, 1)).as("nonpositive_prices"),
      count(when(col("high") < col("low") || col("high") < col("open") ||
        col("high") < col("close") || col("low") > col("open") ||
        col("low") > col("close"), 1)).as("ohlc_violations")
    ).head()
    ValidationReport(
      row.getAs[Long]("total"),
      Map(
        "timestamp_gaps" -> row.getAs[Long]("timestamp_gaps"),
        "negative_volume" -> row.getAs[Long]("negative_volume"),
        "nonpositive_prices" -> row.getAs[Long]("nonpositive_prices"),
        "ohlc_violations" -> row.getAs[Long]("ohlc_violations")))
  }

  /** Day-aggregates validation (reference `validator.rs:165-208`): row
    * count + weekend-date check. Spark dayofweek is 1=Sunday..7=Saturday —
    * the reference's DOW 0/6 constants translate to 1/7 (SURVEY A12). */
  def validateDayAggs(df: DataFrame): ValidationReport = {
    val row = df.agg(
      count(lit(1)).as("total"),
      count(when(dayofweek(col("date")).isin(1, 7), 1)).as("weekend_rows")
    ).head()
    ValidationReport(
      row.getAs[Long]("total"),
      Map("weekend_rows" -> row.getAs[Long]("weekend_rows")))
  }
}
