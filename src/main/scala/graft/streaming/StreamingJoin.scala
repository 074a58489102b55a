package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join — the attribution primitive
  * (impression ↔ click within a time window) and the last piece of the
  * Structured Streaming join surface next to the stream-static
  * enrichment in [[StreamingIndicators]].
  *
  * Both sides carry watermarks and the join predicate bounds the right
  * event time to `[left − lowerBound, left + upperBound]`; together they
  * let Spark age buffered rows out of state — without the time bound a
  * stream-stream join's state grows forever, the failure mode this
  * wrapper exists to make unexpressible.
  *
  * Scale shape: state per key is bounded by (watermark + interval) ×
  * arrival rate; both sides hash-partition on the key, so the join is
  * co-partitioned with no broadcast and survives arbitrary stream
  * volume. Inner joins emit as soon as both sides arrive; results become
  * final once the watermark passes the interval.
  */
object StreamingJoin {

  /** Inner interval join. Column names across the two sides must be
    * disjoint except `keyCol` (the equi-key); the right side's key is
    * dropped from the output. `lowerBound`/`upperBound` are SQL interval
    * strings (e.g. "10 seconds"). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   watermark: String, lowerBound: String,
                   upperBound: String): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key column names must be disjoint, shared: $overlap")
    val l = left.withWatermark(leftTimeCol, watermark).as("l")
    val r = right.withWatermark(rightTimeCol, watermark).as("r")
    l.join(r,
        expr(s"""l.$keyCol = r.$keyCol AND
                 |r.$rightTimeCol >= l.$leftTimeCol - interval $lowerBound AND
                 |r.$rightTimeCol <= l.$leftTimeCol + interval $upperBound""".stripMargin))
      .drop(r(keyCol))
  }
}
