package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{Encoders => SparkEncoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StreamingQueryException, TimeMode, TimerValues, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** v2 of [[IndicatorState]]: the same eight fields plus one ADDED
  * `Option[Long]` — the canonical upgrade shape (state-schema evolution
  * only supports ADDING nullable fields; a new non-nullable primitive has
  * no decodable value for rows written by v1). */
final case class IndicatorStateV2(
    prices: Vector[Double],
    volumes: Vector[Long],
    ema: Option[Double],
    gains: Vector[Double],
    losses: Vector[Double],
    avgGain: Double,
    avgLoss: Double,
    rsiSeeded: Boolean,
    nTicks: Option[Long]) // the upgrade: ticks folded per symbol

final case class EvolvedOut(symbol: String, sma: Option[Double], nTicks: Long)

/** The upgraded processor for the restart-from-old-checkpoint scenario:
  * SAME state handle name ("indicators"), richer state encoder. v1 rows
  * surface with `nTicks = None`, which the fold treats as 0. */
private[streaming] class IndicatorProcessorV2(windowSize: Int)
    extends StatefulProcessor[String, MarketTick, EvolvedOut] {
  @transient private var state: ValueState[IndicatorStateV2] = _
  @transient private var engine: StreamingIndicators = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[IndicatorStateV2](
      "indicators", SparkEncoders.product[IndicatorStateV2], TTLConfig.NONE)
    engine = new StreamingIndicators(windowSize)
  }

  override def handleInputRows(key: String, rows: Iterator[MarketTick],
                               timerValues: TimerValues): Iterator[EvolvedOut] = {
    val prev =
      if (state.exists()) state.get()
      else IndicatorStateV2(Vector.empty, Vector.empty, None, Vector.empty,
        Vector.empty, 0.0, 0.0, rsiSeeded = false, nTicks = Some(0L))
    var st = IndicatorState(prev.prices, prev.volumes, prev.ema, prev.gains,
      prev.losses, prev.avgGain, prev.avgLoss, prev.rsiSeeded)
    var n = prev.nTicks.getOrElse(0L) // None ⇒ this key's state predates v2
    val out = rows.toSeq
      .sortBy(t => (t.timestamp.getTime, t.timestamp.getNanos, t.price, t.volume))
      .map { tick =>
        val (next, values) = engine.update(st, tick)
        st = next; n += 1
        EvolvedOut(values.symbol, values.sma, n)
      }
    state.update(IndicatorStateV2(st.prices, st.volumes, st.ema, st.gains,
      st.losses, st.avgGain, st.avgLoss, st.rsiSeeded, Some(n)))
    out.iterator
  }
}

/** SURVEY hard part 4 / round-9 verdict item 6: what actually happens when
  * a deployed [[StreamingPipeline.indicatorsTws]] query is upgraded — a
  * field added to its state class — and restarted from the OLD RocksDB
  * checkpoint. Two documented outcomes, both pinned here:
  *
  *  - Avro state encoding (`spark.sql.streaming.stateStore.encodingFormat
  *    = avro`, set from the FIRST deployment): graceful — v1 rows decode
  *    with the added field `null`, indicator state (price buffer, EMA seed)
  *    carries across the upgrade.
  *  - Default UnsafeRow encoding: a LOUD, immediate failure (schema
  *    incompatibility at state-store load), NOT silent state loss — the
  *    operational contract is "plan the encoding before the first deploy".
  */
class StateEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tick(sym: String, sec: Int, price: Double, volume: Long = 1000L) =
    MarketTick(sym, new Timestamp(1673776800000L + sec * 1000L), price, volume,
      Some(price - 0.5), Some(price + 0.5))

  private def withRocksDb[A](encoding: Option[String])(body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    encoding.foreach(e =>
      spark.conf.set("spark.sql.streaming.stateStore.encodingFormat", e))
    try body
    finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.stateStore.encodingFormat")
    }
  }

  /** Phase 1 of both tests: run the PRODUCTION (v1) query over two AAPL
    * ticks against `ckpt`, committing v1-encoded state. */
  private def seedV1(ckpt: String, input: MemoryStream[MarketTick]): Unit = {
    // KeepForever pins the UNBOUNDED v1 IndicatorProcessor: this spec's
    // checkpoints encode that processor's state shape, and the bounded
    // default (round 12) would swap in TtlIndicatorProcessor and test the
    // wrong upgrade path
    val q = StreamingPipeline.indicatorsTws(input.toDS(), windowSize = 3,
      idleMs = StreamingPipeline.KeepForever)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingIndicatorValues],
                       _: Long) =>
        // must materialize every partition or the state stores never commit
        batch.collect(); ()
      }
      .start()
    try {
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0))
      q.processAllAvailable()
    } finally q.stop()
  }

  private def startV2(ckpt: String, input: MemoryStream[MarketTick],
                      sunk: java.util.List[EvolvedOut]) =
    input.toDS()
      .groupByKey(_.symbol)
      .transformWithState(new IndicatorProcessorV2(3),
        TimeMode.None(), OutputMode.Append())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EvolvedOut], _: Long) =>
        sunk.addAll(java.util.Arrays.asList(batch.collect(): _*)); ()
      }
      .start()

  test("tws upgrade with avro encoding: added Option field evolves gracefully") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb(encoding = Some("avro")) {
      val ckpt = java.nio.file.Files.createTempDirectory("tws_evo_avro").toString
      val input = MemoryStream[MarketTick]
      seedV1(ckpt, input)

      val sunk = java.util.Collections.synchronizedList(
        new java.util.ArrayList[EvolvedOut]())
      val q2 = startV2(ckpt, input, sunk)
      try {
        input.addData(tick("AAPL", 2, 152.0))
        q2.processAllAvailable()
        val out = sunk.toArray(Array.empty[EvolvedOut])
        assert(out.length === 1)
        // sma full ⇒ the v1 price buffer (150, 151) was DECODED by the v2
        // encoder, not reset — the actual evolution claim
        assert(out.head.sma === Some((150.0 + 151.0 + 152.0) / 3))
        // v1 state carried no count ⇒ None ⇒ fold starts at 0, +1 new tick
        assert(out.head.nTicks === 1L)
      } finally q2.stop()
    }
  }

  test("tws upgrade with default unsaferow encoding: loud schema failure, not silent loss") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb(encoding = None) {
      val ckpt = java.nio.file.Files.createTempDirectory("tws_evo_usr").toString
      val input = MemoryStream[MarketTick]
      seedV1(ckpt, input)

      val sunk = java.util.Collections.synchronizedList(
        new java.util.ArrayList[EvolvedOut]())
      val q2 = startV2(ckpt, input, sunk)
      try {
        input.addData(tick("AAPL", 2, 152.0))
        val e = intercept[StreamingQueryException] { q2.processAllAvailable() }
        // the failure names the state schema check — an operator would find
        // the cause in the log, nothing is silently dropped or reset
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(_.toString.toLowerCase).mkString("\n")
        assert(msgs.contains("schema") || msgs.contains("compatib"),
          s"expected a schema-compatibility failure, got: $msgs")
        assert(sunk.isEmpty, "no batch may commit on an incompatible upgrade")
      } finally q2.stop()
    }
  }
}
