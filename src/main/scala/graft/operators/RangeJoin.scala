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
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"point/interval column names must be disjoint, shared: $overlap")
    // "__b" is the internal bucket column — a caller column with that name
    // would silently join on the wrong key
    require(!(points.columns ++ intervals.columns).contains("__b"),
      "column name __b is reserved by rangeJoin — rename it first")

    val pb = points.withColumn("__b",
      floor(col(pTime) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__b",
      explode(sequence(floor(col(iStart) / bucketWidth).cast("long"),
        floor(col(iEnd) / bucketWidth).cast("long"))))
    pb.join(ib,
        pb("__b") === ib("__b") && pb(pKey) === ib(iKey) &&
          col(pTime) >= col(iStart) && col(pTime) <= col(iEnd))
      .drop("__b")
  }
}
