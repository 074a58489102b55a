package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed point-in-interval range join — `p.time ∈ [i.start, i.end]` with
  * equal keys. Spark plans a naive non-equi join as a broadcast
  * nested-loop (quadratic per key); this operator makes it an EQUI-join by
  * interval bucketing: every interval replicates to each `bucketWidth`-wide
  * bucket it touches, points land in exactly one bucket, and the join key
  * becomes (key, bucket) with the precise BETWEEN as a post-filter.
  *
  * Exact and duplicate-free by construction: a point joins an interval only
  * in the point's own bucket. Replication factor = interval length /
  * bucketWidth + 1, so pick bucketWidth near the typical interval length.
  * Time columns must be numeric (e.g. epoch days/seconds); left/right
  * column names must be disjoint.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pKey: String, iKey: String,
                pTime: String, iStart: String, iEnd: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    Guards.requireDisjoint(points.columns, intervals.columns, "point/interval")
    // "__b" is the internal bucket column — a caller column with that name
    // would silently join on the wrong key
    Guards.requireNoReserved(points.columns ++ intervals.columns, Seq("__b"), "rangeJoin")

    val pb = points.withColumn("__b",
      floor(col(pTime) / bucketWidth).cast("long"))
    // inverted intervals (start > end) match nothing under BETWEEN; dropping
    // them up front skips their bucket replication (sequence() would emit a
    // DESCENDING bucket range for them, every row of which the post-filter
    // rejects anyway)
    val ib = intervals.filter(col(iStart) <= col(iEnd)).withColumn("__b",
      explode(sequence(floor(col(iStart) / bucketWidth).cast("long"),
        floor(col(iEnd) / bucketWidth).cast("long"))))
    pb.join(ib,
        pb("__b") === ib("__b") && pb(pKey) === ib(iKey) &&
          col(pTime) >= col(iStart) && col(pTime) <= col(iEnd))
      .drop("__b")
  }

  /** How many intervals cover each point (same key) — WITHOUT materializing
    * the pairs. `#covering(p) = #(starts ≤ p) − #(ends < p)`, so a union of
    * start/point/end markers and ONE keyed window pass with two running
    * sums answers every point: no join, no replication, output = |points|.
    * Orders of magnitude cheaper than `rangeJoin(...).groupBy(point)` when
    * intervals are long or dense (the sweep is O(n log n) vs O(matches)).
    *
    * Within a day, markers sort starts(0) < points(1) < ends(2): a point on
    * an interval's start day IS covered (start already summed), a point on
    * its end day IS covered (end not yet summed) — exactly the closed
    * interval `[start, end]` the BETWEEN join expresses.
    *
    * Returns the point rows (all their columns) plus `n_overlapping`.
    * Time columns must be numeric and non-null; names must be disjoint. */
  def overlapCounts(points: DataFrame, intervals: DataFrame,
                    pKey: String, iKey: String,
                    pTime: String, iStart: String, iEnd: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Guards.requireDisjoint(points.columns, intervals.columns, "point/interval")
    Guards.requireNoReserved(points.columns ++ intervals.columns,
      Seq("__day", "__ord", "__s", "__e", "n_overlapping"), "overlapCounts")

    val payload = points.columns.filter(_ != pKey).toSeq
    def marker(day: org.apache.spark.sql.Column, ord: Int, s: Int, e: Int,
               from: DataFrame, key: String): DataFrame =
      from.select(
        (col(key).as(pKey) +:
          payload.map(c => lit(null).cast(points.schema(c).dataType).as(c))) ++
          Seq(day.cast("long").as("__day"), lit(ord).as("__ord"),
            lit(s.toLong).as("__s"), lit(e.toLong).as("__e")): _*)

    // an inverted interval (start > end) puts its end marker BEFORE its start
    // marker in the sweep, subtracting coverage the BETWEEN join never adds
    // (it matches nothing for such intervals) — n_overlapping could even go
    // negative. Dropping them reproduces BETWEEN's empty-match semantics.
    val valid = intervals.filter(col(iStart) <= col(iEnd))
    val starts = marker(col(iStart), 0, 1, 0, valid, iKey)
    val ends = marker(col(iEnd), 2, 0, 1, valid, iKey)
    val pts = points.select(
      (col(pKey) +: payload.map(col)) ++
        Seq(col(pTime).cast("long").as("__day"), lit(1).as("__ord"),
          lit(0L).as("__s"), lit(0L).as("__e")): _*)

    val w = Window.partitionBy(col(pKey)).orderBy(col("__day"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(pts).unionByName(ends)
      .withColumn("n_overlapping", (sum(col("__s")).over(w) - sum(col("__e")).over(w)))
      .filter(col("__ord") === 1)
      .drop("__day", "__ord", "__s", "__e")
  }
}
