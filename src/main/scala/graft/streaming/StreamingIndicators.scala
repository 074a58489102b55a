package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders => SparkEncoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One market tick (reference `src/streaming.rs:14-22`). */
final case class MarketTick(
    symbol: String,
    timestamp: Timestamp,
    price: Double,
    volume: Long,
    bid: Option[Double],
    ask: Option[Double])

/** Indicator snapshot emitted per tick (reference `streaming.rs:164-175`). */
final case class StreamingIndicatorValues(
    symbol: String,
    timestamp: Timestamp,
    price: Double,
    volume: Long,
    sma: Option[Double],
    ema: Option[Double],
    rsi: Option[Double],
    volumeSma: Option[Double],
    volumeRatio: Option[Double])

/** Streaming trading signal (reference `streaming.rs:259-278`). The unused
  * `PriceBreakout` variant of the reference enum is intentionally omitted. */
final case class StreamingSignal(
    signalType: String, // Oversold | Overbought | VolumeSpike | BullishCrossover | BearishCrossover
    symbol: String,
    timestamp: Timestamp,
    strength: Double,
    price: Double,
    description: String)

/** Per-symbol indicator state: bounded buffers, O(window) memory per key —
  * mirrors the reference's capped `VecDeque`s (`streaming.rs:56-65`).
  *
  * Divergence (SURVEY §7.1.7): the reference re-seeds Wilder's averages
  * whenever `avg_gain == 0.0` (`streaming.rs:134`), which re-triggers the
  * simple-average seed after any flat/falling window. We keep an explicit
  * `rsiSeeded` flag — the batch (A3) semantics — and document the change. */
final case class IndicatorState(
    prices: Vector[Double],
    volumes: Vector[Long],
    ema: Option[Double],
    gains: Vector[Double],
    losses: Vector[Double],
    avgGain: Double,
    avgLoss: Double,
    rsiSeeded: Boolean)

object IndicatorState {
  val empty: IndicatorState =
    IndicatorState(Vector.empty, Vector.empty, None, Vector.empty, Vector.empty, 0.0, 0.0, rsiSeeded = false)
}

/** Tick-at-a-time indicator engine — pure Scala, shared by the Structured
  * Streaming operator and unit tests (reference `streaming.rs:38-161`). */
class StreamingIndicators(windowSize: Int) extends Serializable {
  require(windowSize > 0)

  def update(state: IndicatorState, tick: MarketTick): (IndicatorState, StreamingIndicatorValues) = {
    val prices = (state.prices :+ tick.price).takeRight(windowSize)
    val volumes = (state.volumes :+ tick.volume).takeRight(windowSize)

    // SMA over the price buffer (streaming.rs:86-93)
    val sma = if (prices.length < windowSize) None
      else Some(prices.foldLeft(0.0)(_ + _) / prices.length)

    // EMA, first tick seeds (streaming.rs:95-109)
    val alpha = 2.0 / (windowSize + 1.0)
    val ema = state.ema match {
      case None       => Some(tick.price)
      case Some(prev) => Some(alpha * tick.price + (1.0 - alpha) * prev)
    }

    // RSI over the last windowSize diffs (streaming.rs:111-151)
    val (gains, losses, avgGain, avgLoss, seeded, rsi) =
      if (state.prices.isEmpty) {
        (state.gains, state.losses, state.avgGain, state.avgLoss, state.rsiSeeded, None)
      } else {
        val change = tick.price - state.prices.last
        val g = if (change > 0.0) change else 0.0
        val l = if (change < 0.0) -change else 0.0
        val gs = (state.gains :+ g).takeRight(windowSize)
        val ls = (state.losses :+ l).takeRight(windowSize)
        if (gs.length < windowSize) (gs, ls, state.avgGain, state.avgLoss, state.rsiSeeded, None)
        else {
          val (ag, al) =
            if (!state.rsiSeeded)
              (gs.foldLeft(0.0)(_ + _) / windowSize, ls.foldLeft(0.0)(_ + _) / windowSize)
            else {
              val a = 1.0 / windowSize
              (state.avgGain * (1.0 - a) + g * a, state.avgLoss * (1.0 - a) + l * a)
            }
          val r = if (al == 0.0) 100.0 else 100.0 - (100.0 / (1.0 + ag / al))
          (gs, ls, ag, al, true, Some(r))
        }
      }

    val volumeSma = if (volumes.length < windowSize) None
      else Some(volumes.foldLeft(0L)(_ + _).toDouble / volumes.length)

    val out = StreamingIndicatorValues(
      tick.symbol, tick.timestamp, tick.price, tick.volume,
      sma, ema, rsi, volumeSma, volumeSma.map(vs => tick.volume.toDouble / vs))

    (IndicatorState(prices, volumes, ema, gains, losses, avgGain, avgLoss, seeded), out)
  }
}

/** Structured Streaming pipeline (reference `StreamingProcessor`,
  * `streaming.rs:280-321`): per-symbol keyed state via
  * flatMapGroupsWithState; signal detection as column expressions; sinks
  * via foreachBatch replace the reference's callback registry.
  *
  * Scale: persisted state is per-symbol and bounded (O(window)); symbols
  * hash across executors; no global coordination. Ticks within a micro-batch
  * are processed in event-time order per symbol (the reference relies on
  * arrival order — a single-process luxury), which requires buffering one
  * (symbol, micro-batch) group in memory for the sort — bounded by trigger
  * interval in streaming mode; in batch mode a symbol's whole history is one
  * group, so batch replays of unbounded histories should be windowed by the
  * caller. */
object StreamingPipeline {

  /** Stream-static enrichment: left-join the tick stream against a
    * slowly-changing dimension keyed by symbol (listing venue, sector,
    * tick size…). The static side broadcasts into every micro-batch and
    * is re-read per batch, so a dimension refresh on disk is picked up
    * without restarting the query; the stream side never shuffles —
    * the standard reference-data pattern at scale. Unknown symbols pass
    * through with null attributes (left join) rather than being dropped. */
  def enrich(ticks: Dataset[MarketTick], dim: org.apache.spark.sql.DataFrame,
             dimKey: String = "symbol"): org.apache.spark.sql.DataFrame =
    ticks.toDF().join(org.apache.spark.sql.functions.broadcast(dim),
      Seq(dimKey), "left")

  def indicators(ticks: Dataset[MarketTick], windowSize: Int): Dataset[StreamingIndicatorValues] = {
    import ticks.sparkSession.implicits._
    val engine = new StreamingIndicators(windowSize)
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[IndicatorState, StreamingIndicatorValues](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[IndicatorState]) =>
          var st = state.getOption.getOrElse(IndicatorState.empty)
          // full-precision order: getTime alone truncates to millis, which
          // would make sub-ms tick order (and thus all state) nondeterministic.
          // (price, volume) break exact-timestamp ties: remaining ties are
          // full-duplicate ticks, whose mutual order cannot affect the fold.
          val out = rows.toSeq
            .sortBy(t => (t.timestamp.getTime, t.timestamp.getNanos, t.price, t.volume)).map { tick =>
            val (next, values) = engine.update(st, tick)
            st = next
            values
          }
          state.update(st)
          out.iterator
      }
  }

  /** Default idle-state TTL for [[indicatorsTws]]: 7 days of event-time
    * silence. Must exceed the longest legitimate market gap (a weekend plus
    * a holiday cluster is ~4 days; 7 is the smallest round horizon that
    * cannot evict a live listed symbol), while still bounding the store:
    * at 100× symbol cardinality the dead keys (delisted tickers, churned
    * ids) dominate, and an unbounded default grows RocksDB with every key
    * ever seen — the same "dangerous default" shape the SemDeDup guard
    * fixed in round 11. */
  val DefaultIdleMs: Long = 7L * 24 * 60 * 60 * 1000

  /** Explicit opt-out for [[indicatorsTws]]: keep per-key state forever
    * (the unbounded pre-TTL behavior — correct for bounded key universes,
    * e.g. a fixed exchange symbol list). */
  val KeepForever: Long = 0L

  /** The same per-symbol engine on the Spark 4.x `transformWithState` API
    * (state-v2): `ValueState` in the RocksDB state store instead of the
    * GroupState blob. Identical semantics to [[indicators]] — both call
    * [[StreamingIndicators.update]] in full-precision timestamp order.
    * Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` when run as a stream.
    *
    * State is BOUNDED by default: per-symbol state evicts after
    * [[DefaultIdleMs]] of event-time silence (see [[indicatorsTwsTtl]] for
    * the timer semantics — deterministic, replay-safe, revived keys
    * re-warm from empty). Pass `idleMs = KeepForever` to opt into the
    * unbounded store.
    *
    * CHECKPOINT MIGRATION (the default changed in r12): the TTL path is a
    * DIFFERENT operator/state shape (TtlIndicatorProcessor +
    * TimeMode.EventTime + watermark) than the pre-r12 unbounded default
    * (IndicatorProcessor + TimeMode.None) — a query restarting from a
    * checkpoint written under the old default must pin
    * `idleMs = KeepForever` (or start a fresh checkpoint). Call
    * [[StateContract.validate]] with
    * [[StateContract.indicatorsTwsContract]] before `start()` to turn a
    * mismatched restart into a clear fail-fast error instead of Spark's
    * opaque state-incompatibility failure (wiring: [[StreamingLive]]). */
  def indicatorsTws(ticks: Dataset[MarketTick], windowSize: Int,
                    idleMs: Long = DefaultIdleMs,
                    watermark: String = "10 minutes"): Dataset[StreamingIndicatorValues] = {
    import ticks.sparkSession.implicits._
    require(idleMs >= 0, s"idleMs must be >= 0 (0 = keep forever), got $idleMs")
    if (idleMs == KeepForever)
      ticks
        .groupByKey(_.symbol)
        .transformWithState(new IndicatorProcessor(windowSize),
          TimeMode.None(), OutputMode.Append())
    else indicatorsTwsTtl(ticks, windowSize, idleMs, watermark)
  }

  /** [[indicatorsTws]] with BOUNDED state: per-symbol state is evicted
    * after `idleMs` of event-time silence, via an event-time timer
    * re-armed on every batch. Without eviction the state store grows
    * with every symbol ever seen — at 100× symbol cardinality (delisted
    * tickers, churning keys) the RocksDB store grows without bound even
    * though most keys are dead. A revived key re-warms from empty state
    * (indicator warm-up restarts), which is the honest semantics for a
    * key silent longer than any indicator window.
    *
    * Event-time timers (not wall-clock TTL) make eviction deterministic
    * and replay-safe: the timer fires when the WATERMARK passes
    * `last event time + idleMs`, so a backfilled replay evicts at the
    * same points as the live run. Requires `watermark` on the tick
    * timestamps (applied here) and the RocksDB state store provider,
    * like [[indicatorsTws]]. */
  def indicatorsTwsTtl(ticks: Dataset[MarketTick], windowSize: Int,
                       idleMs: Long,
                       watermark: String = "10 minutes"): Dataset[StreamingIndicatorValues] = {
    import ticks.sparkSession.implicits._
    require(idleMs > 0, s"idleMs must be positive, got $idleMs")
    val base =
      if (ticks.isStreaming)
        ticks.withWatermark("timestamp", watermark)
      else ticks
    base
      .groupByKey(_.symbol)
      .transformWithState(new TtlIndicatorProcessor(windowSize, idleMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Event-time OHLCV bars from a tick stream: per-symbol tumbling windows
    * with a watermark bounding state (ticks later than `watermark` behind
    * the max seen event time are dropped; windows finalize and their state
    * is evicted — without it, windowed state grows forever). `min_by` /
    * `max_by` pin open/close to event time, so results are independent of
    * arrival order. Works identically on a batch Dataset (no watermark
    * applied there). The output shape matches the Polygon minute-aggs
    * schema (A13), so bars feed straight into the batch indicator layer. */
  def ohlcBars(ticks: Dataset[MarketTick], barWidth: String = "1 minute",
               watermark: String = "2 minutes"): DataFrame = {
    val base = if (ticks.isStreaming) ticks.toDF().withWatermark("timestamp", watermark)
               else ticks.toDF()
    base
      .groupBy(col("symbol"), window(col("timestamp"), barWidth).as("bar"))
      .agg(
        min_by(col("price"), col("timestamp")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("timestamp")).as("close"),
        sum(col("volume")).as("volume"),
        // NULL vwap for zero-volume bars (ANSI divide-by-zero otherwise)
        when(sum(col("volume")) =!= 0,
          sum(col("price") * col("volume")) / sum(col("volume"))).as("vwap"),
        count(lit(1)).as("transactions"))
      .select(col("symbol").as("ticker"), col("bar.start").as("window_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("vwap"), col("transactions"))
  }

  /** Approximate distinct cardinality per event-time window — the
    * streaming face of [[graft.functions.HllSketch]]. Watermarked tumbling
    * windows hold m = 2^p BYTES of register state per open (group, window)
    * cell; partials max-merge across micro-batches, and the watermark
    * finalizes windows and evicts their registers — the streaming
    * `COUNT(DISTINCT)` that is impossible with bounded state becomes a
    * bounded sketch whose accuracy (~1.04/√m) is set by p, not by traffic.
    * At 100 TB-scale streams (distinct users/devices per hour across
    * thousands of event types) the state per cell stays 256 B at p=8
    * where exact distinct state grows with cardinality.
    *
    * Emits the exact-integer register statistics (`sum_scaled`, `zeros`);
    * the estimate is SQL on top ([[graft.functions.Hll.estimateSql]]),
    * keeping the whole chain engine-portable exactly like the batch gate.
    * Works identically on a batch frame (no watermark applied there) —
    * the q_stream_distinct gate replays THIS operator in batch mode
    * against the DuckDB register oracle. */
  def windowedDistinct(events: DataFrame, tsCol: String, groupCol: String,
                       keyCol: String, windowWidth: String = "1 hour",
                       watermark: String = "2 hours", p: Int = 8): DataFrame = {
    val base = if (events.isStreaming) events.withWatermark(tsCol, watermark)
               else events
    base
      .groupBy(col(groupCol), window(col(tsCol), windowWidth).as("win"))
      .agg(graft.functions.Hll.hllSketch(col(keyCol), p).as("hsk"))
      .select(col(groupCol), col("win.start").as("window_start"),
        col("hsk.sum_scaled").as("sum_scaled"), col("hsk.zeros").as("zeros"))
  }

  /** Replay suppression for at-least-once feeds: drop ticks whose dedup
    * key was already seen, keeping bounded state via the watermark
    * horizon (`dropDuplicatesWithinWatermark` — state for a key is
    * evictable once the watermark passes it, so the dedup map cannot grow
    * without bound the way a plain streaming `dropDuplicates` would).
    * The key must DETERMINE the row (true replays) — which duplicate
    * survives is then immaterial. On a static frame it degrades to plain
    * `dropDuplicates` over the same key. */
  def dedupTicks(ticks: Dataset[MarketTick],
                 keyCols: Seq[String] = Seq("symbol", "timestamp"),
                 watermark: String = "10 minutes"): Dataset[MarketTick] = {
    import ticks.sparkSession.implicits._
    if (ticks.isStreaming)
      StreamingDedup.dedupByKey(ticks.toDF(), keyCols, "timestamp", watermark)
        .as[MarketTick]
    else ticks.toDF().dropDuplicates(keyCols).as[MarketTick]
  }

  /** Threshold detection (reference `streaming.rs:177-256`) as one column
    * expression pass: each rule builds a struct-or-null, then explodes the
    * non-null ones. Works identically on a static or streaming frame. */
  def detectSignals(values: DataFrame): DataFrame = {
    def signal(cond: org.apache.spark.sql.Column, sigType: String,
               strength: org.apache.spark.sql.Column,
               description: org.apache.spark.sql.Column) =
      when(cond, struct(
        lit(sigType).as("signalType"),
        strength.as("strength"),
        description.as("description")))

    val rsi = col("rsi"); val vr = col("volumeRatio")
    val sma = col("sma"); val ema = col("ema")
    val lo = graft.operators.Signals.RsiOversold
    val hi = graft.operators.Signals.RsiOverbought
    val rules = array(
      signal(rsi.isNotNull && rsi < lo, "Oversold",
        (lit(lo) - rsi) / lo,
        concat(lit("RSI oversold at "), round(rsi, 2).cast("string"))),
      signal(rsi.isNotNull && rsi > hi, "Overbought",
        // scale = width of the overbought band (100 − hi = 30); the reference
        // divides by the numerically identical oversold constant
        (rsi - lit(hi)) / (lit(100.0) - hi),
        concat(lit("RSI overbought at "), round(rsi, 2).cast("string"))),
      signal(vr.isNotNull && vr > 2.0, "VolumeSpike",
        (vr - lit(2.0)) / 3.0,
        concat(lit("Volume spike: "), round(vr, 2).cast("string"), lit("x average"))),
      signal(sma.isNotNull && ema.isNotNull && ema > sma * 1.002, "BullishCrossover",
        least(abs(ema - sma) / sma, lit(1.0)),
        concat(lit("EMA above SMA: "), round(ema, 2).cast("string"),
          lit(" vs "), round(sma, 2).cast("string"))),
      signal(sma.isNotNull && ema.isNotNull && ema < sma * 0.998, "BearishCrossover",
        least(abs(ema - sma) / sma, lit(1.0)),
        concat(lit("EMA below SMA: "), round(ema, 2).cast("string"),
          lit(" vs "), round(sma, 2).cast("string")))
    )
    values
      .withColumn("sig", explode(filter(rules, s => s.isNotNull)))
      .select(
        col("sig.signalType").as("signalType"),
        col("symbol"), col("timestamp"),
        col("sig.strength").as("strength"),
        col("price"),
        col("sig.description").as("description"))
  }

  /** state-v2 processor backing [[indicatorsTws]]: one `ValueState` per
    * symbol holding the bounded [[IndicatorState]]. */
  private[streaming] class IndicatorProcessor(windowSize: Int)
      extends StatefulProcessor[String, MarketTick, StreamingIndicatorValues] {
    @transient protected var state: ValueState[IndicatorState] = _
    @transient private var engine: StreamingIndicators = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[IndicatorState](
        "indicators", SparkEncoders.product[IndicatorState], TTLConfig.NONE)
      engine = new StreamingIndicators(windowSize)
    }

    /** The one shared per-key fold (full-precision event-time order with
      * (price, volume) tie-breaks) — [[TtlIndicatorProcessor]] reuses it
      * verbatim so the two processors can never diverge on ordering. */
    protected final def fold(rows: Iterator[MarketTick]): Seq[StreamingIndicatorValues] = {
      var st = if (state.exists()) state.get() else IndicatorState.empty
      val out = rows.toSeq
        .sortBy(t => (t.timestamp.getTime, t.timestamp.getNanos, t.price, t.volume)).map { tick =>
          val (next, values) = engine.update(st, tick)
          st = next
          values
        }
      state.update(st)
      out
    }

    override def handleInputRows(key: String, rows: Iterator[MarketTick],
                                 timerValues: TimerValues): Iterator[StreamingIndicatorValues] =
      fold(rows).iterator
  }

  /** [[IndicatorProcessor]] plus idle-key eviction: one event-time timer
    * per key at `last event time + idleMs`, re-armed (delete + register)
    * whenever the key sees data, state cleared when it fires. The last
    * armed expiry rides its own `ValueState` so the stale timer can be
    * deleted exactly — `transformWithState` timers don't auto-cancel on
    * new data. */
  private[streaming] class TtlIndicatorProcessor(windowSize: Int, idleMs: Long)
      extends IndicatorProcessor(windowSize) {
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      super.init(outputMode, timeMode)
      timerAt = getHandle.getValueState[Long](
        "idleTimer", SparkEncoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[MarketTick],
                                 timerValues: TimerValues): Iterator[StreamingIndicatorValues] = {
      val out = fold(rows)
      if (out.nonEmpty) {
        // idle = no new stream progress for this key, so the timer tracks
        // the RUNNING max event time: a late-but-in-watermark row must
        // never move the timer BACKWARDS (that would delete a live key's
        // future timer and re-arm one already at/behind the watermark,
        // evicting the key on the next batch)
        val batchExpiry = out.map(_.timestamp.getTime).max + idleMs
        val expiry =
          if (timerAt.exists()) math.max(timerAt.get(), batchExpiry)
          else batchExpiry
        if (timerAt.exists() && timerAt.get() != expiry)
          getHandle.deleteTimer(timerAt.get())
        if (!timerAt.exists() || timerAt.get() != expiry)
          getHandle.registerTimer(expiry)
        timerAt.update(expiry)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[StreamingIndicatorValues] = {
      state.clear()
      timerAt.clear()
      Iterator.empty
    }
  }

  /** End-to-end stream: ticks → indicators → signals, delivered to a
    * callback per micro-batch (replaces the reference's handler registry,
    * `streaming.rs:286-320`). Returns the started query. */
  def process(spark: SparkSession, ticks: Dataset[MarketTick], windowSize: Int)(
      onSignals: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val sigs = detectSignals(indicators(ticks, windowSize).toDF())
    sigs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => onSignals(batch) }
      .start()
  }
}
