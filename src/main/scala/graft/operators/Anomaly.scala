package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped z-score outlier detection — the distribution-shift / bad-shard
  * screen a training pipeline runs over metric columns (values, lengths,
  * scores) before ingestion.
  *
  * Plan: one pass computing per-group (n, Σx, Σx²) — all map-side
  * combinable — then the tiny stats frame broadcasts back onto the corpus
  * and each row gets `z = (x − μ)/σ` with
  * `σ = sqrt(Σx²/n − (Σx/n)²)` (population form). No window, no sort: at
  * 100 TB this is two corpus scans (stats, then flag) of which the second
  * fuses into whatever consumes the flags.
  *
  * Determinism note: when the values are integer-valued and small enough
  * that Σx and Σx² stay under 2^53 (counts, token lengths, quantities —
  * the usual screen targets), both sums are EXACT doubles regardless of
  * aggregation order, and everything downstream is a fixed IEEE expression
  * tree — bit-identical in any engine (the oracle gate runs this way).
  * For general doubles the sums are order-dependent in the last ulp, same
  * as any parallel sum.
  */
object Anomaly {

  /** Flag rows whose `|z| > threshold` within their group. Emits the input
    * columns plus `z_score` and `is_outlier`; groups with σ = 0 (constant
    * value) emit z = 0 and never flag. */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "zscoreOutliers needs at least one group column")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    Guards.requireNoReserved(df.columns,
      Seq("z_score", "is_outlier", "__n", "__sum", "__sumsq"), "zscoreOutliers")
    val x = col(valueCol).cast("double")
    val stats = df.groupBy(groupCols.map(col): _*).agg(
      count(x).as("__n"),
      sum(x).as("__sum"),
      sum(x * x).as("__sumsq"))
    val mu = col("__sum") / col("__n")
    val sigma = sqrt(col("__sumsq") / col("__n") - mu * mu)
    val z = when(sigma > 0.0, (x - mu) / sigma).otherwise(lit(0.0))
    df.join(broadcast(stats), groupCols)
      .withColumn("z_score", z)
      .withColumn("is_outlier", abs(col("z_score")) > threshold)
      .drop("__n", "__sum", "__sumsq")
  }
}
