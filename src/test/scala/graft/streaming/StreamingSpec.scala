package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tick(sym: String, sec: Int, price: Double, volume: Long = 1000L) =
    MarketTick(sym, new Timestamp(1673776800000L + sec * 1000L), price, volume,
      Some(price - 0.5), Some(price + 0.5))

  test("pure engine: update echoes tick, warms up like the reference test (streaming.rs:328-344)") {
    val engine = new StreamingIndicators(10)
    val (st, v) = engine.update(IndicatorState.empty, tick("AAPL", 0, 150.0))
    assert(v.symbol === "AAPL" && v.price === 150.0 && v.volume === 1000L)
    assert(v.sma.isEmpty && v.rsi.isEmpty) // warm-up
    assert(v.ema === Some(150.0))          // first tick seeds EMA
    assert(st.prices === Vector(150.0))
  }

  test("pure engine: buffers stay bounded at window size") {
    val engine = new StreamingIndicators(3)
    var st = IndicatorState.empty
    (1 to 10).foreach { i => st = engine.update(st, tick("X", i, 100.0 + i))._1 }
    assert(st.prices.length === 3 && st.volumes.length === 3 &&
      st.gains.length === 3 && st.losses.length === 3)
  }

  test("signal rules fire on the reference fixture (streaming.rs:346-366)") {
    // sma=149, ema=150.5, rsi=25, volume_sma=500, volume_ratio=2.5
    val values = Seq(
      ("AAPL", new Timestamp(0L), 150.0, 1250L, Some(149.0), Some(150.5),
        Some(25.0), Some(500.0), Some(2.5))
    ).toDF("symbol", "timestamp", "price", "volume", "sma", "ema", "rsi",
      "volumeSma", "volumeRatio")
    val sigs = StreamingPipeline.detectSignals(values).collect()
    val types = sigs.map(_.getAs[String]("signalType")).toSet
    assert(types === Set("Oversold", "VolumeSpike", "BullishCrossover"))
    val oversold = sigs.find(_.getAs[String]("signalType") == "Oversold").get
    assert(math.abs(oversold.getAs[Double]("strength") - (30.0 - 25.0) / 30.0) < 1e-12)
    sigs.foreach(s => assert(s.getAs[Double]("strength") >= 0.0 &&
      s.getAs[Double]("strength") <= 1.0))
  }

  test("dedupTicks suppresses replays across micro-batches within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val query = StreamingPipeline.dedupTicks(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0))
      query.processAllAvailable()
      // the same (symbol, timestamp) replayed in a LATER micro-batch, plus
      // one genuinely new tick
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 2, 152.0))
      query.processAllAvailable()
      val out = spark.table("dedup_out").as[MarketTick].collect()
      assert(out.length === 3, "replay must be dropped, new ticks kept")
      assert(out.map(_.timestamp.getTime).distinct.length === 3)
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS dedup_out")
    }
    // static frame degrades to plain dropDuplicates on the same key
    val st = StreamingPipeline.dedupTicks(
      Seq(tick("A", 0, 1.0), tick("A", 0, 1.0), tick("A", 1, 2.0)).toDS())
    assert(st.count() === 2)
  }

  test("idempotent sink: a replayed batch replaces its output, never duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idem_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idem_ckpt").toString
    val input = MemoryStream[MarketTick]
    val query = IdempotentSink.start(input.toDS().toDF(), dir, ckpt)
    try {
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0))
      query.processAllAvailable()
      input.addData(tick("MSFT", 0, 300.0))
      query.processAllAvailable()
      val once = spark.read.parquet(dir)
      assert(once.count() === 3)
      assert(once.columns.contains("batch_id")) // partition column surfaces
      // simulate the at-least-once replay: batch 1 runs AGAIN with the
      // same id (crash between sink write and offset commit)
      IdempotentSink.writeBatch(dir)(
        Seq(tick("MSFT", 0, 300.0)).toDF(), batchId = 1L)
      val replayed = spark.read.parquet(dir)
      assert(replayed.count() === 3, "replay must replace, not append")
      assert(replayed.filter($"symbol" === "MSFT").count() === 1)
    } finally query.stop()
  }

  test("structured streaming end-to-end: per-symbol state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val query = StreamingPipeline.indicators(input.toDS(), windowSize = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("indicators_out")
      .start()
    try {
      // batch 1: warm-up for two symbols
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0),
        tick("MSFT", 0, 300.0))
      query.processAllAvailable()
      // batch 2: state must carry over (3rd AAPL tick completes the window)
      input.addData(tick("AAPL", 2, 152.0), tick("MSFT", 1, 301.0))
      query.processAllAvailable()

      val out = spark.table("indicators_out").as[StreamingIndicatorValues]
        .collect().sortBy(v => (v.symbol, v.timestamp.getTime))
      val aapl = out.filter(_.symbol == "AAPL")
      assert(aapl.length === 3)
      assert(aapl(0).sma.isEmpty && aapl(1).sma.isEmpty)
      assert(aapl(2).sma === Some((150.0 + 151.0 + 152.0) / 3))
      // cross-check against the pure engine run tick-by-tick
      val engine = new StreamingIndicators(3)
      var st = IndicatorState.empty
      val expected = Seq(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0),
        tick("AAPL", 2, 152.0)).map { t =>
        val (n, v) = engine.update(st, t); st = n; v
      }
      assert(aapl.toSeq.map(_.ema) === expected.map(_.ema))
      val msft = out.filter(_.symbol == "MSFT")
      assert(msft.length === 2 && msft(1).ema === Some(2.0 / 4.0 * 301.0 + 0.5 * 300.0))
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS indicators_out")
    }
  }

  test("stream-static enrichment: dimension broadcasts, unknown symbols survive") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val dim = Seq(("AAPL", "tech", "XNAS"), ("XOM", "energy", "XNYS"))
      .toDF("symbol", "sector", "venue")
    val query = StreamingPipeline.enrich(input.toDS(), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched_out")
      .start()
    try {
      input.addData(tick("AAPL", 0, 150.0), tick("ZZZ", 0, 1.0))
      query.processAllAvailable()
      val out = spark.table("enriched_out")
        .select("symbol", "sector", "venue").collect()
        .map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
      assert(out("AAPL") === ((Some("tech"), Some("XNAS"))))
      assert(out("ZZZ") === ((None, None))) // left join keeps unmatched ticks
      // the micro-batch plan must broadcast the dimension side
      val lastPlan = query.lastProgress.sources.length // progress sanity
      assert(lastPlan === 1)
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS enriched_out")
    }
  }

  test("transformWithState variant matches flatMapGroupsWithState output") {
    implicit val sqlCtx = spark.sqlContext
    // state-v2 requires the RocksDB provider (multiple column families)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[MarketTick]
    val query = StreamingPipeline.indicatorsTws(input.toDS(), windowSize = 3)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_ckpt").toString)
      .format("memory").queryName("indicators_tws_out")
      .start()
    try {
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0),
        tick("MSFT", 0, 300.0))
      query.processAllAvailable()
      input.addData(tick("AAPL", 2, 152.0), tick("MSFT", 1, 301.0))
      query.processAllAvailable()

      val out = spark.table("indicators_tws_out").as[StreamingIndicatorValues]
        .collect().sortBy(v => (v.symbol, v.timestamp.getTime))
      // identical expectations to the flatMapGroupsWithState test: same
      // engine, same state carry-over across micro-batches
      val engine = new StreamingIndicators(3)
      var st = IndicatorState.empty
      val expected = Seq(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0),
        tick("AAPL", 2, 152.0)).map { t =>
        val (n, v) = engine.update(st, t); st = n; v
      }
      assert(out.filter(_.symbol == "AAPL").toSeq === expected)
      assert(out.count(_.symbol == "MSFT") === 2)
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.sql("DROP TABLE IF EXISTS indicators_tws_out")
    }
  }

  test("transformWithState state survives a stop/restart from the RocksDB checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws_restart_ckpt").toString
    val input = MemoryStream[MarketTick]
    val sunk = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamingIndicatorValues]())
    // foreachBatch sink: unlike the memory sink it supports restarting from a
    // checkpoint (the recovery this test is about)
    def start() = StreamingPipeline.indicatorsTws(input.toDS(), windowSize = 3)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingIndicatorValues], _: Long) =>
        sunk.addAll(java.util.Arrays.asList(batch.collect(): _*)); ()
      }
      .start()
    try {
      val q1 = start()
      try {
        input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0))
        q1.processAllAvailable()
      } finally q1.stop()
      sunk.clear() // everything recorded after this line was computed post-restart

      // second incarnation: same checkpoint, new query. The assertions below
      // can only pass if the per-symbol state (price buffer, EMA seed, RSI
      // ledger) was recovered from the RocksDB store.
      val q2 = start()
      try {
        input.addData(tick("AAPL", 2, 152.0))
        q2.processAllAvailable()
        val out = sunk.toArray(Array.empty[StreamingIndicatorValues])
        assert(out.length === 1, "restart must resume from committed offsets, not replay batch 1")
        val engine = new StreamingIndicators(3)
        var st = IndicatorState.empty
        val expected = Seq(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0),
          tick("AAPL", 2, 152.0)).map { t =>
          val (n, v) = engine.update(st, t); st = n; v
        }.last
        // sma exists only because two pre-restart prices were recovered
        assert(out.head === expected)
        assert(out.head.sma === Some((150.0 + 151.0 + 152.0) / 3))
      } finally q2.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("ohlcBars: event-time bars with watermark, arrival-order independent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val query = StreamingPipeline.ohlcBars(input.toDS(), "1 minute", "1 minute")
      .writeStream.outputMode("update")
      .format("memory").queryName("bars_out").start()
    try {
      val t0 = 1700000040000L // minute-aligned so all three ticks share one bar
      def at(ms: Long, price: Double, vol: Long) =
        MarketTick("BTC", new Timestamp(ms), price, vol, None, None)
      // one bar's ticks delivered OUT of order: close (59s) before open (1s)
      input.addData(at(t0 + 59000, 105.0, 10L), at(t0 + 1000, 100.0, 30L),
        at(t0 + 30000, 95.0, 60L))
      query.processAllAvailable()
      val bars = spark.table("bars_out").collect()
      assert(bars.length === 1)
      val b = bars.head
      assert(b.getAs[Double]("open") === 100.0)   // earliest event time
      assert(b.getAs[Double]("close") === 105.0)  // latest event time
      assert(b.getAs[Double]("high") === 105.0 && b.getAs[Double]("low") === 95.0)
      assert(b.getAs[Long]("volume") === 100L)
      assert(b.getAs[Double]("vwap") === (105.0 * 10 + 100.0 * 30 + 95.0 * 60) / 100.0)
      assert(b.getAs[Long]("transactions") === 3L)
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS bars_out")
    }
  }

  test("windowedDistinct: streaming HLL registers match the batch run exactly") {
    import org.apache.spark.sql.functions.{col, min_by, struct}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val stream = input.toDF().toDF("ts", "etype", "uid")
    val query = StreamingPipeline.windowedDistinct(
        stream, "ts", "etype", "uid", "1 minute", "1 minute")
      .writeStream.outputMode("update")
      .format("memory").queryName("wd_out").start()
    try {
      val t0 = 1700000040000L // minute-aligned
      // 2 types x 2 windows; uid repeats within and across batches,
      // delivered out of order and split across micro-batches
      def ev(ms: Long, t: String, u: Long) = (new Timestamp(ms), t, u)
      input.addData(ev(t0 + 59000, "a", 7), ev(t0 + 1000, "a", 3),
        ev(t0 + 30000, "b", 7))
      query.processAllAvailable()
      input.addData(ev(t0 + 5000, "a", 7), ev(t0 + 61000, "a", 3),
        ev(t0 + 62000, "b", 99))
      query.processAllAvailable()
      val streamed = spark.table("wd_out")
        .groupBy("etype", "window_start")
        .agg(min_by(
          struct(col("sum_scaled"), col("zeros")), col("sum_scaled")).as("s"))
        .select(col("etype"), col("window_start"),
          col("s.sum_scaled"), col("s.zeros"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getInt(3))).toSet
      // update-mode re-emissions: registers only grow, so sum_scaled only
      // shrinks — the final row per cell is the MIN sum
      val batchDf = Seq(
        ev(t0 + 59000, "a", 7), ev(t0 + 1000, "a", 3), ev(t0 + 30000, "b", 7),
        ev(t0 + 5000, "a", 7), ev(t0 + 61000, "a", 3), ev(t0 + 62000, "b", 99))
        .toDF("ts", "etype", "uid")
      val batch = StreamingPipeline.windowedDistinct(
          batchDf, "ts", "etype", "uid", "1 minute", "1 minute")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getInt(3))).toSet
      assert(streamed === batch,
        s"streaming registers diverge from batch:\n$streamed\nvs\n$batch")
      assert(batch.size === 4, "2 types x 2 windows expected")
    } finally {
      query.stop()
      spark.sql("DROP TABLE IF EXISTS wd_out")
    }
  }

  test("windowedDistinct state is register-bounded: zeros >= 256 - n_keys") {
    val df = Seq.tabulate(500)(i =>
      (new Timestamp(1700000040000L + (i % 50) * 100), "t", (i % 5).toLong))
      .toDF("ts", "etype", "uid")
    val out = StreamingPipeline.windowedDistinct(
      df, "ts", "etype", "uid", "1 minute").collect()
    assert(out.length === 1)
    // 5 distinct uids touch at most 5 registers
    assert(out.head.getAs[Int]("zeros") >= 251)
  }

  test("ohlcBars on a batch Dataset matches the streaming result shape") {
    val ticks = Seq(
      tick("AAPL", 0, 10.0, 5L), tick("AAPL", 30, 12.0, 5L), tick("AAPL", 61, 11.0, 5L))
      .toDS()
    val bars = StreamingPipeline.ohlcBars(ticks).orderBy("window_start").collect()
    assert(bars.length === 2)
    assert(bars(0).getAs[Double]("open") === 10.0 && bars(0).getAs[Double]("close") === 12.0)
    assert(bars(1).getAs[Double]("open") === 11.0 && bars(1).getAs[Long]("transactions") === 1L)
  }

  test("process(): signals reach the foreachBatch callback") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MarketTick]
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val query = StreamingPipeline.process(spark, input.toDS(), windowSize = 3) { batch =>
      seen ++= batch.collect().map(_.getAs[String]("signalType"))
    }
    try {
      // falling prices with a volume spike at the end
      input.addData((0 until 8).map(i => tick("AAPL", i, 150.0 - i * 5.0,
        if (i == 7) 10000L else 1000L)): _*)
      query.processAllAvailable()
      assert(seen.nonEmpty)
      assert(seen.contains("Oversold") || seen.contains("BearishCrossover"))
    } finally query.stop()
  }
}
