package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key summary table fresh
  * by aggregating only the NEW batch and merging it with the stored
  * summary — the pattern that turns a daily 100 TB re-aggregation into a
  * batch-sized one. Works because the carried measures (count, sum, min,
  * max) are commutative monoids: merging partials in any grouping order
  * equals aggregating the full corpus. Derived measures (avg) are
  * computed at read time from the carried ones, never stored — storing a
  * ratio would make the summary unmergeable.
  *
  * Scale shape: [[partials]] is one map-side-combinable groupBy of the
  * BATCH; [[merge]] re-aggregates summary frames whose size is the KEY
  * cardinality, not the corpus. Exactness: counts are longs; sums are
  * exact when the metric is integer-valued or scaled to integers (the
  * [[Rolling.vwap]] discipline) — on general doubles the usual
  * association caveat applies to the last ulp.
  */
object IncrementalAgg {

  /** Per-key mergeable summary of a batch: `n`, `sum_v`, `min_v`,
    * `max_v`. NULL metric values are not counted (SQL aggregate
    * semantics — `n` counts non-null values, so `avg` derives
    * correctly). */
  def partials(df: DataFrame, keyCols: Seq[String],
               valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val x = col(valueCol).cast("double")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(x).as("n"), sum(x).as("sum_v"),
        min(x).as("min_v"), max(x).as("max_v"))
  }

  /** Merge summary frames (all produced by [[partials]] with the same
    * keys): one re-aggregation of the CONCATENATED summaries. */
  def merge(summaries: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(summaries.nonEmpty, "need at least one summary frame")
    summaries.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Read-time derived measures: adds `avg_v` = `sum_v / n` (NULL on an
    * empty key — no values to average). */
  def withDerived(summary: DataFrame): DataFrame =
    summary.withColumn("avg_v",
      when(col("n") > 0, col("sum_v") / col("n")))
}
