package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch OHLC resampling: collapse tick-level rows into
  * open/high/low/close/volume bars per (key, bucket) — the batch twin of
  * the streaming bar builder ([[graft.streaming.StreamingIndicators]]'s
  * event-time OHLC aggregation) and the standard prep step in front of the
  * bar-level indicators ([[Rolling.atr]], [[Rolling.donchian]]).
  *
  * Scale shape: ONE `groupBy(key, bucket)` — a single hash exchange — and
  * every measure is map-side combinable (`min_by`/`max_by`/`min`/`max`/
  * `sum`/`count` all carry partial states), so the shuffle moves one
  * partial bar per (key, bucket, task), never the ticks. At 100 TB the
  * shuffled volume is the bar count, not the tick count. One trade-off:
  * with MULTIPLE tie-break columns the `min_by` ordering is a struct,
  * whose non-atomic agg buffer makes Spark pick SortAggregate (a
  * frame-local per-task sort — partial agg and the single exchange are
  * unchanged); a single tie-break column keeps the buffer atomic and the
  * whole aggregation in HashAggregate.
  *
  * Determinism: open/close are `min_by`/`max_by` against the caller's
  * tie-break columns packed into a struct (lexicographic comparison) —
  * exact selections, no "first row seen" nondeterminism; volume sums are
  * scaled-BIGINT (exact under any accumulation order, see [[Rolling.vwap]])
  * with one final IEEE descale.
  */
object Bars {

  /** OHLC bars from ticks. `orderCols` must uniquely order ticks within a
    * (key, bucket) — open/close are the value at its min/max. Output
    * columns: the key + bucket columns, then `open`, `high`, `low`,
    * `close`, `volume` (NULL-safe: rows with a NULL value are counted in
    * `n_ticks` but never win open/close or move high/low), `n_ticks`. */
  def ohlc(df: DataFrame, valueCol: String, volCol: String,
           keyCols: Seq[String], bucketCol: String, orderCols: Seq[String],
           volScale: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must define the tick order")
    require(volScale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("open", "high", "low", "close", "volume", "n_ticks"), "Bars.ohlc")
    val x = col(valueCol).cast("double")
    // single tie-break column → atomic ordering buffer → HashAggregate
    val ord = if (orderCols.sizeIs == 1) col(orderCols.head)
      else struct(orderCols.map(col): _*)
    val vInt = round(col(volCol).cast("double") * lit(math.pow(10, volScale)))
      .cast("long")
    val groupCols: Seq[Column] = (keyCols :+ bucketCol).map(col)
    df.groupBy(groupCols: _*)
      .agg(
        min_by(x, when(x.isNotNull, ord)).as("open"),
        max(x).as("high"),
        min(x).as("low"),
        max_by(x, when(x.isNotNull, ord)).as("close"),
        (sum(vInt).cast("double") / lit(math.pow(10, volScale))).as("volume"),
        count(lit(1)).as("n_ticks"))
  }
}
