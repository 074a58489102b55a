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

  /** Equal-frequency (quantile) binning — the complement of the
    * fixed-width [[histogram]]: bin edges are the per-group `i/nBins`
    * quantiles, so each bin holds ~the same share of rows regardless of
    * the distribution's shape (the standard discretizer for skewed
    * metrics). Adds `bin ∈ [0, nBins)` — row goes to bin i iff it exceeds
    * the i-th edge and not the (i+1)-th.
    *
    * Plan: one exact-quantile aggregation per group by default, the tiny
    * edges frame broadcasts back, and the bin id is a codegen'd comparison
    * chain. On integer-valued metrics the interpolated edges are exact
    * binary fractions and every comparison is engine-exact.
    *
    * `approx = true` is the 100 TB path: `percentile_approx`'s bounded
    * sketch computes the edges with O(accuracy) per-group state instead of
    * holding every value — same query shape; edges land on actual data
    * values at most 1/accuracy of the rank off, so a row within that rank
    * distance of an edge may land one bin over (tolerance spec bounds
    * this). Null metric values fail loudly (same policy as
    * [[Batching.bucketAssignments]]). */
  def equalFrequencyBins(df: DataFrame, valueCol: String,
                         groupCols: Seq[String], nBins: Int,
                         approx: Boolean = false,
                         accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(groupCols.nonEmpty, "equalFrequencyBins needs a group column")
    Guards.requireNoReserved(df.columns, Seq("bin", "__qs"), "equalFrequencyBins")
    // null metric values fail loudly (same policy as Batching's guards): a
    // null would otherwise fall through every when-branch into bin 0,
    // silently mislabeling missing data as the lowest bin
    val x = when(col(valueCol).isNull, raise_error(lit(
        s"equalFrequencyBins: $valueCol must be non-null (null rows would " +
          "silently land in bin 0); filter or impute first")))
      .otherwise(col(valueCol).cast("double"))
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    val ps = (1 until nBins).map(i => lit(i.toDouble / nBins))
    val qs =
      if (approx) percentile_approx(x, array(ps: _*), lit(accuracy))
      else percentile(x, array(ps: _*))
    val edges = df.groupBy(groupCols.map(col): _*)
      .agg(qs.as("__qs"))
    // descending when-chain: highest exceeded edge wins; ties (x == edge)
    // fall to the lower bin, matching quantile-inclusive convention
    val bin = (nBins - 1 to 1 by -1).foldLeft(null: org.apache.spark.sql.Column) {
      (acc, i) =>
        val cond = x > element_at(col("__qs"), i)
        if (acc == null) when(cond, lit(i)) else acc.when(cond, lit(i))
    }.otherwise(lit(0))
    df.join(broadcast(edges), groupCols)
      .withColumn("bin", bin)
      .drop("__qs")
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
    * mixed-distinct trap.
    *
    * `approxDistinct = true` is the 100 TB profile-everything path: the
    * deterministic [[graft.functions.KmvDistinct]] sketch (≤ sketchK longs
    * of state, map-side combinable, no Expand) replaces the exact distinct
    * — emitted as `n_distinct_est` (DOUBLE) so the two report shapes are
    * not confused. The sketch has no RNG, so even the estimate is
    * engine-replayable. */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    approxDistinct: Boolean = false,
                    sketchK: Int = 256): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val profiles = cols.map { c =>
      val nd =
        if (approxDistinct) graft.functions.Kmv.kmvDistinct(col(c), sketchK).as("n_distinct_est")
        else count_distinct(col(c)).as("n_distinct")
      df.select(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, lit(1))).as("n_nulls"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"),
        nd)
    }
    profiles.reduce(_ unionByName _)
  }

  /** [[columnProfile]] with [[graft.functions.HllSketch]] distincts — the
    * smallest-state profile-everything path: 2^p BYTES of register state
    * per column (vs the KMV path's sketchK longs — 8× less shuffle per
    * column×partition at equal accuracy, the difference when profiling
    * every column of every table nightly at 100 TB). The estimate is the
    * shared [[graft.functions.Hll.estimateSql]] fragment evaluated by
    * Spark's OWN SQL layer over the exact-integer register statistics, so
    * the DuckDB twin replays it bit-for-bit like the KMV report. */
  def columnProfileHll(df: DataFrame, cols: Seq[String],
                       p: Int = 8): DataFrame = {
    require(cols.nonEmpty, "columnProfileHll needs at least one column")
    val profiles = cols.map { c =>
      df.select(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, lit(1))).as("n_nulls"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"),
        graft.functions.Hll.hllSketch(col(c), p).as("__hsk"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_value"), col("max_value"),
        expr(graft.functions.Hll.estimateSql(
          "__hsk.sum_scaled", "__hsk.zeros", p)).as("n_distinct_est"))
    }
    profiles.reduce(_ unionByName _)
  }

  /** Schema-drift report between two frames (old vs new version of a
    * feed): one row per column that was ADDED, REMOVED, or changed TYPE
    * or NULLABILITY — the contract check that catches a vendor silently
    * widening an int or dropping a field before the pipeline does.
    * Pure metadata (no data scan, no job); unchanged columns are
    * absent. Emits (`column`, `change`, `old_type`, `new_type`). */
  def schemaDrift(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name ->
      (f.dataType.catalogString, f.nullable)).toMap
    val n = newDf.schema.map(f => f.name ->
      (f.dataType.catalogString, f.nullable)).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.sorted.map { c =>
        (c, "added", null: String, n(c)._1)
      } ++
      (o.keySet -- n.keySet).toSeq.sorted.map { c =>
        (c, "removed", o(c)._1, null: String)
      } ++
      (o.keySet & n.keySet).toSeq.sorted.flatMap { c =>
        if (o(c)._1 != n(c)._1)
          Some((c, "type_changed", o(c)._1, n(c)._1))
        else if (o(c)._2 != n(c)._2)
          Some((c, "nullability_changed", o(c)._1, n(c)._1))
        else None
      }
    rows.toDF("column", "change", "old_type", "new_type")
  }
}
