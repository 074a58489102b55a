package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the first pass a pipeline runs over an unfamiliar
  * 100 TB corpus: per-column completeness and range, and value-distribution
  * histograms. Everything is one scan with map-side-combinable aggregates;
  * histogram binning is pure per-row arithmetic (floor of one IEEE
  * division — deterministic in any engine, so the DuckDB oracle replays it
  * bit-for-bit).
  */
object Profile {

  /** Fixed-width histogram of `valueCol` over [lo, hi): bin i covers
    * `[lo + i·w, lo + (i+1)·w)` with `w = (hi−lo)/nBins`. Values outside
    * [lo, hi) clamp into the edge bins (bin 0 / bin nBins−1) so the
    * histogram always accounts for every non-null row — the standard
    * profiling convention for "and the tails". One aggregation of at most
    * `nBins` groups; empty bins are absent (join a bin spine if a dense
    * axis is needed). */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / nBins
    val raw = floor((col(valueCol).cast("double") - lit(lo)) / lit(w)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit((nBins - 1).toLong))
    df.filter(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-column completeness/range profile: row count, null count, min,
    * max, exact distinct count — one row per requested column, values
    * rendered as strings (a profile is a report, not a join input).
    *
    * Plan shape: one union branch per column, each a SINGLE-COLUMN pruned
    * scan with map-side-combinable aggregates (the branches run
    * concurrently; on columnar storage N pruned scans together read the
    * same bytes one multi-column pass would). Keeping the exact distincts
    * in separate branches also avoids the multi-distinct Expand rewrite —
    * one Expand per scan × N columns would multiply the scan, the classic
    * mixed-distinct trap. Swap `count_distinct` for `kmv_distinct` at the
    * 100 TB profile-everything scale — same shape, bounded state. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val profiles = cols.map { c =>
      df.select(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, lit(1))).as("n_nulls"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"),
        count_distinct(col(c)).as("n_distinct"))
    }
    profiles.reduce(_ unionByName _)
  }
}
