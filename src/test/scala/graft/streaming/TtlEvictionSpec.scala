package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Bounded streaming state: `indicatorsTwsTtl` must evict a symbol's
  * state once the watermark passes `last event + idleMs` (dead/delisted
  * keys cannot grow the RocksDB store forever), and a revived key must
  * re-warm from EMPTY state — not continue the pre-eviction fold. */
class TtlEvictionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val T0 = 1673776800000L
  private def tickAtMin(sym: String, min: Int, price: Double,
                        volume: Long = 1000L) =
    MarketTick(sym, new Timestamp(T0 + min * 60000L), price, volume,
      Some(price - 0.5), Some(price + 0.5))

  test("idle symbol state is evicted by the event-time timer; a revived key re-warms cold; a live key keeps its state") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[MarketTick]
    // idle = 1 minute of EVENT time, zero watermark delay: B's timer sits
    // at (last B event + 1 min) and fires as soon as the watermark passes
    val query = StreamingPipeline
      .indicatorsTwsTtl(input.toDS(), windowSize = 3, idleMs = 60000L,
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_ttl_ckpt").toString)
      .format("memory").queryName("indicators_ttl_out")
      .start()
    try {
      // batch 1: both symbols alive
      input.addData(tickAtMin("AAPL", 0, 150.0), tickAtMin("AAPL", 1, 151.0),
        tickAtMin("MSFT", 0, 300.0), tickAtMin("MSFT", 1, 301.0))
      query.processAllAvailable() // watermark -> 1 min
      // batch 2: only AAPL; advances watermark to 2 min, which is MSFT's
      // expiry (1 min last event + 1 min idle) — MSFT evicts from batch 3
      input.addData(tickAtMin("AAPL", 2, 152.0))
      query.processAllAvailable()
      // batch 3: push the watermark far past every pending expiry. AAPL's
      // timer re-arms (its state must survive — it keeps receiving data)
      input.addData(tickAtMin("AAPL", 10, 153.0))
      query.processAllAvailable()
      // batch 3b: one more watermark advance so MSFT's timer sweep has
      // strictly fired before any revival data, regardless of whether the
      // implementation fires timers at expiry == watermark or only past
      // it, and of whether a batch runs timers before or after its rows
      input.addData(tickAtMin("AAPL", 20, 154.0))
      query.processAllAvailable()
      // batch 4: MSFT revives after the eviction
      input.addData(tickAtMin("MSFT", 21, 310.0), tickAtMin("MSFT", 22, 311.0),
        tickAtMin("MSFT", 23, 312.0))
      query.processAllAvailable()

      val out = spark.table("indicators_ttl_out")
        .as[StreamingIndicatorValues].collect()
        .sortBy(v => (v.symbol, v.timestamp.getTime))

      // revived MSFT == a FRESH fold of only the post-revival ticks: state
      // was dropped (a surviving fold would carry prices 300/301 into the
      // window and the third revived tick's SMA would differ)
      val engine = new StreamingIndicators(3)
      var st = IndicatorState.empty
      val freshExpected = Seq(tickAtMin("MSFT", 21, 310.0),
        tickAtMin("MSFT", 22, 311.0), tickAtMin("MSFT", 23, 312.0)).map { t =>
        val (n, v) = engine.update(st, t); st = n; v
      }
      val revived = out.filter(v => v.symbol == "MSFT" &&
        v.timestamp.getTime >= T0 + 21 * 60000L).toSeq
      assert(revived === freshExpected,
        "revived key must re-warm from empty state")
      assert(revived.head.sma.isEmpty && revived.head.rsi.isEmpty,
        "first revived tick must be in warm-up (no inherited window)")
      assert(revived.last.sma === Some((310.0 + 311.0 + 312.0) / 3.0))

      // AAPL (continuously alive) kept its state across the same batches:
      // its tick at minute 10 must continue the prior fold, not restart
      var ast = IndicatorState.empty
      val aaplExpected = Seq(tickAtMin("AAPL", 0, 150.0),
        tickAtMin("AAPL", 1, 151.0), tickAtMin("AAPL", 2, 152.0),
        tickAtMin("AAPL", 10, 153.0), tickAtMin("AAPL", 20, 154.0)).map { t =>
        val (n, v) = engine.update(ast, t); ast = n; v
      }
      assert(out.filter(_.symbol == "AAPL").toSeq === aaplExpected,
        "live key must keep its state while idle keys evict")
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.sql("DROP TABLE IF EXISTS indicators_ttl_out")
    }
  }

  test("DEFAULT indicatorsTws path is bounded: a key idle past DefaultIdleMs (7d) evicts, a live key survives week-scale gaps") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val day = 1440 // minutes
    val input = MemoryStream[MarketTick]
    // NO idleMs argument: this is the path a user gets without reading the
    // scaladoc — it must not grow the store with every key ever seen
    val query = StreamingPipeline
      .indicatorsTws(input.toDS(), windowSize = 3)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_default_ckpt").toString)
      .format("memory").queryName("indicators_default_out")
      .start()
    try {
      input.addData(tickAtMin("AAPL", 0, 150.0), tickAtMin("MSFT", 0, 300.0))
      query.processAllAvailable()
      // day 6: under MSFT's expiry (0 + 7d) — both alive
      input.addData(tickAtMin("AAPL", 6 * day, 151.0))
      query.processAllAvailable()
      // day 8: watermark (8d - 10min) passes MSFT's 7d expiry; AAPL's own
      // expiry re-armed to 6d + 7d = 13d, so the live key is safe
      input.addData(tickAtMin("AAPL", 8 * day, 152.0))
      query.processAllAvailable()
      // one more advance so the timer sweep has strictly fired
      input.addData(tickAtMin("AAPL", 9 * day, 153.0))
      query.processAllAvailable()
      // day 10: MSFT revives — must re-warm from EMPTY state
      input.addData(tickAtMin("MSFT", 10 * day, 310.0),
        tickAtMin("MSFT", 10 * day + 1, 311.0),
        tickAtMin("MSFT", 10 * day + 2, 312.0))
      query.processAllAvailable()

      val out = spark.table("indicators_default_out")
        .as[StreamingIndicatorValues].collect()
        .sortBy(v => (v.symbol, v.timestamp.getTime))

      val engine = new StreamingIndicators(3)
      var st = IndicatorState.empty
      val freshExpected = Seq(tickAtMin("MSFT", 10 * day, 310.0),
        tickAtMin("MSFT", 10 * day + 1, 311.0),
        tickAtMin("MSFT", 10 * day + 2, 312.0)).map { t =>
        val (n, v) = engine.update(st, t); st = n; v
      }
      val revived = out.filter(v => v.symbol == "MSFT" &&
        v.timestamp.getTime >= T0 + 10L * day * 60000L).toSeq
      assert(revived === freshExpected,
        "default path must evict a 7d-idle key (revival re-warms cold)")
      assert(revived.head.sma.isEmpty,
        "first revived tick must be in warm-up (no inherited window)")

      var ast = IndicatorState.empty
      val aaplExpected = Seq(tickAtMin("AAPL", 0, 150.0),
        tickAtMin("AAPL", 6 * day, 151.0), tickAtMin("AAPL", 8 * day, 152.0),
        tickAtMin("AAPL", 9 * day, 153.0)).map { t =>
        val (n, v) = engine.update(ast, t); ast = n; v
      }
      assert(out.filter(_.symbol == "AAPL").toSeq === aaplExpected,
        "a key with sub-7d gaps must keep its state on the default path")
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.sql("DROP TABLE IF EXISTS indicators_default_out")
    }
  }

  test("q_stream_live_ttl gate shape is DISCRIMINATING: the same chunked replay without TTL keeps state across the gap") {
    // mirrors the gate's construction at toy scale: symbol G goes silent
    // for 10 "days" (minutes here), an interim chunk of K-only data
    // advances the watermark past G's expiry, then G revives. With TTL
    // the revived fold restarts (sma NULL during re-warm-up); with
    // KeepForever it continues — so a broken eviction CANNOT pass the
    // gate's oracle, which folds per (symbol, epoch).
    // HOUR-scale steps so the 10-minute default watermark delay is noise:
    // G ticks hours 0-5, silent through hour 15, revives hours 16-20;
    // K ticks every hour. TTL 3 h => G's timer sits at hour 8, and the
    // K-only [15,16) batch runs with the watermark from the [7,15) batch
    // (hour 13.8) — past the expiry, so eviction fires before G revives.
    def run(idleMs: Long) = {
      implicit val sqlCtx = spark.sqlContext
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val pre = (0 to 5).map(h => tickAtMin("G", h * 60, 100.0 + h))
      val keep = (0 to 20).map(h => tickAtMin("K", h * 60, 50.0 + h))
      val post = (16 to 20).map(h => tickAtMin("G", h * 60, 200.0 + h))
      val ticks = (pre ++ keep ++ post).toDS()
      val bounds = Seq(7, 15, 16).map(h => new Timestamp(T0 + h * 3600000L))
      StreamingLive.indicatorsMicroBatch(ticks, windowSize = 3,
          chunkBoundaries = bounds, idleMs = idleMs)
        .collect()
        .filter(r => r.getString(r.fieldIndex("symbol")) == "G")
        .map { r =>
          val i = r.fieldIndex("sma")
          val ts = r.getTimestamp(r.fieldIndex("timestamp"))
          (ts.getTime - T0) / 3600000L ->
            (if (r.isNullAt(i)) None else Some(r.getDouble(i)))
        }
    }
    val ttl = run(idleMs = 3 * 3600000L).toMap
    val forever = run(idleMs = StreamingPipeline.KeepForever).toMap
    // with TTL the revived key re-warms: first two post-gap rows have no
    // 3-tick sma; unbounded state continues the pre-gap window
    assert(ttl(16L).isEmpty && ttl(17L).isEmpty && ttl(18L).nonEmpty,
      s"TTL path must re-warm from empty, got $ttl")
    assert(forever(16L).nonEmpty,
      s"KeepForever must continue the pre-gap fold, got $forever")
    assert(ttl(18L).get === (216.0 + 217 + 218) / 3.0)
  }

  test("late-but-in-watermark data never moves the idle timer BACKWARDS (live key must not evict early)") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[MarketTick]
    // idle 30 min, watermark delay 10 min: a late row (older than the
    // key's max event but inside the watermark) re-folds fine — but if it
    // re-armed the timer from the BATCH max instead of the RUNNING max,
    // the timer would land behind the advancing watermark and evict a
    // key whose true idle horizon is still ahead
    val query = StreamingPipeline
      .indicatorsTwsTtl(input.toDS(), windowSize = 3,
        idleMs = 30 * 60000L, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_ttl_late_ckpt").toString)
      .format("memory").queryName("indicators_ttl_late_out")
      .start()
    try {
      input.addData(tickAtMin("AAPL", 0, 150.0), tickAtMin("AAPL", 5, 151.0))
      query.processAllAvailable() // AAPL timer -> 5 + 30 = 35 min
      // LATE row (min 3 < max-seen 5, within watermark): buggy re-arm
      // would move the timer to 3 + 30 = 33 min
      input.addData(tickAtMin("AAPL", 3, 152.0))
      query.processAllAvailable()
      // watermark -> 44 − 10 = 34 min: past the buggy 33, short of the
      // correct 35. A following batch runs the timer sweep.
      input.addData(tickAtMin("MSFT", 44, 300.0))
      query.processAllAvailable()
      input.addData(tickAtMin("MSFT", 44, 301.0)) // wm unchanged (34 min)
      query.processAllAvailable()
      // AAPL's next tick: with the timer intact its state CONTINUES
      input.addData(tickAtMin("AAPL", 36, 153.0))
      query.processAllAvailable()

      val out = spark.table("indicators_ttl_late_out")
        .as[StreamingIndicatorValues].collect()
        .filter(_.symbol == "AAPL")
        .sortBy(_.timestamp.getTime)
      // expected: ONE continuous fold in arrival-batch order (0,5 | 3 | 36)
      val engine = new StreamingIndicators(3)
      var st = IndicatorState.empty
      val expected = Seq(tickAtMin("AAPL", 0, 150.0),
        tickAtMin("AAPL", 5, 151.0), tickAtMin("AAPL", 3, 152.0),
        tickAtMin("AAPL", 36, 153.0)).map { t =>
        val (n, v) = engine.update(st, t); st = n; v
      }.sortBy(_.timestamp.getTime)
      assert(out.toSeq === expected,
        "late in-watermark data must not reset the idle timer to the past")
      // the minute-36 tick must carry a FULL warm window (state survived)
      val last = out.maxBy(_.timestamp.getTime)
      assert(last.sma === Some((151.0 + 152.0 + 153.0) / 3.0),
        "key evicted early: its window restarted instead of continuing")
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.sql("DROP TABLE IF EXISTS indicators_ttl_late_out")
    }
  }
}
