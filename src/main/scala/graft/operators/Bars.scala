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

  /** Per-(key, bucket) TWAP — time-weighted average price, the execution
    * benchmark that weights each tick's price by how long it REMAINED the
    * last price: `Σ pᵢ·Δtᵢ / ΣΔtᵢ` with `Δtᵢ = tsᵢ₊₁ − tsᵢ` (the final
    * tick holds until the bucket's end boundary). The clock before a
    * bucket's FIRST tick carries no price and is excluded — so a bucket's
    * weights sum to `bucket_end − first_ts`, never a full bucket of
    * phantom weight.
    *
    * Exactness: prices quantize to `priceScale` decimals, Δt is an exact
    * nanosecond long, and every `p·Δt` accumulates as DECIMAL(38,0) —
    * order-independent — with one final double division. Plan: one keyed
    * sort for the `lead` (ts must be a total order per key under
    * `orderCols` — include a unique id for tie-safety) and one hash
    * aggregate on (key, bucket); the lead window and the aggregate share
    * the key exchange. `tsCol` must be integral nanos
    * ([[graft.sources.Events.readNanos]] longs).
    * Emits (keyCols…, `bucket`, `n_ticks`, `twap`). */
  def twap(df: DataFrame, valueCol: String, tsCol: String,
           keyCols: Seq[String], orderCols: Seq[String],
           bucketNanos: Long, priceScale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "twap needs at least one key column")
    require(orderCols.nonEmpty, "orderCols must define the tick order")
    require(bucketNanos >= 1L, s"bucketNanos must be >= 1, got $bucketNanos")
    require(priceScale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("bucket", "n_ticks", "twap", "__ts", "__dt", "__pi"), "Bars.twap")
    val ts = col(tsCol).cast("long")
    val pInt = round(col(valueCol).cast("double") * lit(math.pow(10, priceScale)))
      .cast("long")
    val withDt = df
      .withColumn("__ts", ts)
      // integer DIV on the internal name only (no caller identifiers in expr)
      .withColumn("bucket", expr(s"__ts DIV $bucketNanos"))
      .withColumn("__dt",
        coalesce(lead(col("__ts"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy((keyCols.map(col) :+ col("bucket")): _*)
              .orderBy(orderCols.map(col): _*)),
          (col("bucket") + lit(1L)) * lit(bucketNanos)) - col("__ts"))
      .withColumn("__pi", pInt)
    withDt.groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n_ticks"),
        sum((col("__pi") * col("__dt")).cast("decimal(38,0)")).as("__num"),
        sum(col("__dt").cast("decimal(38,0)")).as("__den"))
      .withColumn("twap", when(col("__den") > lit(0),
        col("__num").cast("double") /
          (lit(math.pow(10, priceScale)) * col("__den").cast("double"))))
      .drop("__num", "__den")
  }
}
