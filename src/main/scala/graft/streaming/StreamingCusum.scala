package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders => SparkEncoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-key event with a monitored metric value. `seq` is the caller's
  * unique per-key tie-break (ingest offset, event id…): events inside one
  * micro-batch order by `(ts, seq)`, so two events with identical
  * timestamp AND value still replay in a caller-defined total order —
  * the streaming mirror of the batch operator's `orderCols` contract. */
final case class CusumEvent(key: String, ts: java.sql.Timestamp,
                            value: Double, seq: Long = 0L)

/** Bounded CUSUM path state — two scaled-BIGINT accumulators per key. */
final case class CusumState(hi: Long, lo: Long)

/** One scored point: the two CUSUM sides (descaled) and the alarm flag. */
final case class CusumPoint(key: String, ts: java.sql.Timestamp, value: Double,
                            cusumHi: Double, cusumLo: Double, isShift: Boolean)

/** Streaming twin of [[graft.operators.Anomaly.cusum]]: the two-sided
  * CUSUM drift detector as a `transformWithState` processor — the
  * ingestion-path monitor that raises a per-key alarm the moment a
  * persistent small shift accumulates past the threshold, instead of at
  * the next batch drift report.
  *
  * State is TWO LONGS per key (the high/low accumulators in scaled
  * units) — millions of keys are trivial, and unlike the batch identity
  * (cumsum − running min) the recurrence form needs no history at all.
  * Arithmetic matches the batch operator exactly (same scaled-BIGINT
  * deviations), so replaying a key's events through both yields identical
  * paths — asserted in the spec. Rows inside one micro-batch sort by
  * `(ts, seq)` — a caller-supplied total order, the streaming mirror of
  * the batch `orderCols` contract (value remains a last-resort fallback
  * for legacy `seq = 0` callers); CROSS-batch arrival order is the
  * stream's order, as with every keyed streaming recurrence
  * ([[StreamingIndicators]] contract).
  *
  * No reference analog (the reference's streaming layer is indicator-only;
  * beyond-reference op for the LLM-pipeline layer).
  */
object StreamingCusum {

  /** Score every event with its key's running CUSUM path. `target`,
    * `slack`, `threshold`, `scale` as in [[graft.operators.Anomaly.cusum]].
    * The path does NOT reset after an alarm (the batch identity's
    * semantics) — filter `isShift` and reset by restarting the query with
    * a fresh checkpoint if one-shot alarms are wanted. */
  def cusum(events: Dataset[CusumEvent], target: Double, slack: Double,
            threshold: Double, scale: Int = 0): Dataset[CusumPoint] = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new CusumProcessor(target, slack, threshold, scale),
        TimeMode.None(), OutputMode.Append())
  }

  private[streaming] class CusumProcessor(target: Double, slack: Double,
                                          threshold: Double, scale: Int)
      extends StatefulProcessor[String, CusumEvent, CusumPoint] {
    @transient private var state: ValueState[CusumState] = _
    private val pow = math.pow(10, scale)
    private val tPlusK = math.round(target * pow) + math.round(slack * pow)
    private val tMinusK = math.round(target * pow) - math.round(slack * pow)
    private val hInt = math.round(threshold * pow)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState](
        "cusum", SparkEncoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
                                 timerValues: TimerValues): Iterator[CusumPoint] = {
      var st = if (state.exists()) state.get() else CusumState(0L, 0L)
      val out = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.seq, e.value)).map { e =>
          val xInt = math.round(e.value * pow)
          val hi = math.max(0L, st.hi + (xInt - tPlusK))
          val lo = math.max(0L, st.lo + (tMinusK - xInt))
          st = CusumState(hi, lo)
          CusumPoint(key, e.ts, e.value, hi.toDouble / pow, lo.toDouble / pow,
            hi >= hInt || lo >= hInt)
        }
      state.update(st)
      out.iterator
    }
  }
}
