package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingPsarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, h: Double, l: Double) =
    PsarEvent(key, new Timestamp(t0 + sec * 1000L), h, l, sec.toLong)

  /** Deterministic jagged walk with plenty of reversals (LCG — no
    * Math.random, reproducible). */
  private def walk(n: Int, seed: Long): Seq[(Double, Double)] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (0 until n).map { _ =>
      val mid = 100.0 + (next() >>> 40).toDouble / 1e4
      val range = 1.0 + (next() >>> 56).toDouble / 64.0
      (mid + range, mid - range)
    }
  }

  test("batch fold is bit-identical to the native psar window expression") {
    val bars = walk(400, seed = 42L)
    val df = bars.zipWithIndex.map { case ((h, l), i) => ("s", i, h, l) }
      .toDF("sym", "i", "h", "l")
    val native = graft.operators.Rolling
      .parabolicSar(df, "h", "l", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("psar"))) None
                else Some(r.getAs[Double]("psar")))
    val events = bars.zipWithIndex.map { case ((h, l), i) => ev("s", i, h, l) }
    val fold = StreamingPsar.psarBatch(events.toDS())
      .collect().sortBy(_.ts.getTime).map(_.psar)
    assert(native.length === fold.length)
    native.zip(fold).zipWithIndex.foreach { case ((n, f), i) =>
      assert(n === f, s"divergence at bar $i")
    }
    // sanity: the walk actually exercised both trends
    assert(fold.flatten.distinct.length > 100)
  }

  test("fold ≡ native across five independent walks") {
    for (seed <- Seq(7L, 19L, 101L, 555L, 9001L)) {
      val bars = walk(150, seed)
      val df = bars.zipWithIndex.map { case ((h, l), i) => ("s", i, h, l) }
        .toDF("sym", "i", "h", "l")
      val native = graft.operators.Rolling
        .parabolicSar(df, "h", "l", Seq("sym"), Seq("i"))
        .orderBy("i").collect()
        .map(r => if (r.isNullAt(r.fieldIndex("psar"))) None
                  else Some(r.getAs[Double]("psar")))
      val fold = StreamingPsar
        .psarBatch(bars.zipWithIndex.map { case ((h, l), i) => ev("s", i, h, l) }
          .toDS())
        .collect().sortBy(_.ts.getTime).map(_.psar)
      assert(native.toSeq === fold.toSeq, s"walk seed $seed diverged")
    }
  }

  test("supertrend line ratchets monotonically within each trend") {
    val bars = walk(300, seed = 77L)
    val df = bars.zipWithIndex.map { case ((h, l), i) =>
        ("s", i, h, l, (h + l) / 2.0) }
      .toDF("sym", "i", "h", "l", "c")
    val rows = graft.operators.Rolling
      .superTrend(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 5, mult = 2)
      .orderBy("i").collect()
      .flatMap { r =>
        if (r.isNullAt(r.fieldIndex("supertrend"))) None
        else Some((r.getAs[Double]("c"), r.getAs[Double]("supertrend")))
      }
    var flips = 0
    rows.sliding(2).foreach { case Array((c1, l1), (c2, l2)) =>
      val (up1, up2) = (c1 >= l1, c2 >= l2)
      if (up1 == up2) {
        // inside a trend the stop only tightens: up-lines never fall,
        // down-lines never rise
        if (up2) assert(l2 >= l1, s"up-trend line loosened: $l1 -> $l2")
        else assert(l2 <= l1, s"down-trend line loosened: $l1 -> $l2")
      } else flips += 1
    }
    assert(flips > 0, "the walk should flip trend at least once")
  }

  test("streaming psar equals the batch fold across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[PsarEvent]
      val query = StreamingPsar.psar(input.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("psar_ckpt").toString)
        .format("memory").queryName("psar_out").start()
      try {
        val bars = Seq(ev("a", 0, 10.0, 8.0), ev("a", 1, 12.0, 10.0),
          ev("a", 2, 14.0, 12.0), ev("a", 3, 9.0, 7.0), ev("b", 0, 5.0, 4.0))
        // split over two micro-batches: state must carry over
        input.addData(bars.take(2): _*)
        query.processAllAvailable()
        input.addData(bars.drop(2): _*)
        query.processAllAvailable()
        val out = spark.table("psar_out").as[PsarPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))
        val batch = StreamingPsar.psarBatch(bars.toDS()).collect()
          .sortBy(p => (p.key, p.ts.getTime))
        assert(out.toSeq === batch.toSeq)
        // textbook trace (the RollingSpec psar fixture at default factors)
        assert(out.head.psar === None)
        assert(out(1).psar === Some(8.0))
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("factor rails") {
    intercept[IllegalArgumentException] {
      StreamingPsar.psarBatch(Seq.empty[PsarEvent].toDS(), af0Pm = 0)
    }
  }
}
