package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the single most recent right row with
  * the same key and `rightTime <= leftTime` (the kdb/QuestDB/merge_asof
  * time-series primitive; Spark has no built-in).
  *
  * Spark-first plan: tag and union both sides, then ONE window pass per key
  * ordered by (time, side) carrying the last-seen right payload forward
  * (`last(..., ignoreNulls)` over a running frame is O(1) per row), then
  * keep the left rows. One shuffle on the key, sort within partitions —
  * the same cost shape as any keyed window; no join fan-out at all. Ties
  * (right.time == left.time) match inclusively, like DuckDB's ASOF JOIN.
  *
  * Requirements: left/right column names must be disjoint, and the right
  * side must be unique per (key, time) — pre-aggregate it otherwise (ties
  * among right rows would make "the" most recent row ill-defined).
  *
  * NULL-time divergence: a right row whose time column is NULL sorts first
  * in the union pass, so it can match a left row until a timed right row
  * overtakes it (and the tolerance gate deliberately keeps such matches —
  * both modes agree). pandas `merge_asof` and DuckDB `ASOF JOIN` instead
  * NEVER match a NULL-time right row (`rightTime <= leftTime` is unknown).
  * Pre-filter NULL-time right rows (`right.filter(col(t).isNotNull)`)
  * before calling if oracle parity with those engines matters.
  */
object AsofJoin {

  /** Internal working columns — inputs must not use these names (a silent
    * collision would corrupt the window ordering or the final select). */
  private[operators] val Reserved = Set("__k", "__t", "__side", "__l", "__r", "__m")

  /** @param tolerance pandas-`merge_asof`-style match-age bound: a matched
    *   right row older than `leftTime − tolerance` is dropped (right columns
    *   come back NULL), in MICROSECONDS for timestamp time columns and raw
    *   units for numeric ones. `None` = unbounded (classic as-of). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tolerance: Option[Long] = None): DataFrame = {
    Guards.requireDisjoint(left.columns, right.columns, "left/right")
    Guards.requireNoReserved(left.columns ++ right.columns, Reserved, "asofJoin")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))

    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(right.columns.map(right(_)): _*)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)

    val l2 = left.select(
      left(leftKey).as("__k"), left(leftTime).as("__t"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val r2 = right.select(
      right(rightKey).as("__k"), right(rightTime).as("__t"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    // right (side 0) sorts before left (side 1) at equal time -> inclusive
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__m.$c").as(c))
    val base = l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case None => base
      case Some(tol) =>
        // micro-precision for timestamps (a seconds cast would round the
        // boundary differently than the oracle's epoch_us compare)
        def ticks(c: org.apache.spark.sql.Column,
                  dt: org.apache.spark.sql.types.DataType) = dt match {
          case org.apache.spark.sql.types.TimestampType => unix_micros(c)
          case _ => c.cast("long")
        }
        val age = ticks(col("__t"), left.schema(leftTime).dataType) -
          ticks(col(s"__m.$rightTime"), right.schema(rightTime).dataType)
        // A matched right row with a NULL time column makes `age` NULL; the
        // coalesce keeps that match, so tolerance only BOUNDS match age and
        // both modes agree on null-time right rows (classic as-of keeps
        // them too — `last(..., ignoreNulls)` orders them by the union
        // sort, where a null __t sorts first and is overtaken by any
        // timed right row).
        base.withColumn("__m",
          when(col("__m").isNotNull && coalesce(age <= tol, lit(true)),
            col("__m")))
    }
    gated
      .filter(col("__side") === 1)
      .select(leftCols ++ rightCols: _*)
  }
}
