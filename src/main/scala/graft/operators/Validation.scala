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

  /** Referential-integrity check: fact rows whose key has NO match in the
    * dimension — the orphan count every star-schema load gate needs.
    * Emits one row per orphaned KEY VALUE with its fact-row count
    * (`n_rows`), so a single bad vendor key surfaces once with its blast
    * radius, not as a million sample rows.
    *
    * Plan: the fact side aggregates to distinct keys FIRST (map-side
    * combinable — only distinct keys shuffle), then one left-anti join
    * against the dimension's key projection (broadcast when the dim is
    * small, AQE otherwise). Null fact keys count as orphans under their
    * NULL key (they match nothing by SQL semantics — surfacing them is
    * the point of a load gate). */
  def fkOrphans(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String): DataFrame = {
    Guards.requireNoReserved(fact.columns, Seq("n_rows"), "fkOrphans")
    val keyed = fact.groupBy(col(factKey))
      .agg(count(lit(1)).as("n_rows"))
    keyed.join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_anti")
  }

  /** Pareto contribution analysis — "which keys make X% of the total":
    * per-key measure totals ranked descending (ties to the lower key),
    * each key's `share` and running `cum_share`, and the `in_head` flag
    * for keys inside the `headShare` prefix (the 80 in 80/20, including
    * the key that crosses the line). The concentration readout behind
    * skew planning, vendor triage, and corpus-source audits.
    *
    * The ranking window runs over the REDUCED per-key frame (key
    * cardinality, never rows — the [[Eval.binaryAuc]] shape); exact
    * integer sums on integer-valued measures make every share a fixed
    * IEEE division. Emits (keyCol, `total`, `share`, `cum_share`,
    * `in_head`). */
  def paretoContribution(df: DataFrame, keyCol: String, measureCol: String,
                         headShare: Double = 0.8): DataFrame = {
    require(headShare > 0.0 && headShare < 1.0,
      s"headShare must be in (0,1), got $headShare")
    Guards.requireNoReserved(df.columns,
      Seq("total", "share", "cum_share", "in_head", "__g", "__cum"),
      "paretoContribution")
    val sums = df.groupBy(col(keyCol))
      .agg(sum(col(measureCol).cast("double")).as("total"))
    val grand = sums.agg(sum(col("total")).as("__g"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total").desc, col(keyCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    sums.crossJoin(broadcast(grand))
      .withColumn("share", col("total") / col("__g"))
      .withColumn("__cum", sum(col("total")).over(w))
      .withColumn("cum_share", col("__cum") / col("__g"))
      .withColumn("in_head",
        (col("__cum") - col("total")) / col("__g") < lit(headShare))
      .drop("__g", "__cum")
  }
}
