package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingCusumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // seq mirrors the batch twin's order column — the per-key total order
  private def ev(key: String, sec: Int, v: Double, seq: Long = -1L) =
    CusumEvent(key, new Timestamp(1700000000000L + sec * 1000L), v,
      if (seq >= 0) seq else sec.toLong)

  private def withRocks[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming path equals the batch operator's path across micro-batches") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[CusumEvent]
      val query = StreamingCusum.cusum(input.toDS(),
          target = 5.0, slack = 0.5, threshold = 4.0, scale = 1)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("cusum_ckpt").toString)
        .format("memory").queryName("cusum_out").start()
      try {
        // state must carry over the micro-batch boundary
        input.addData(ev("a", 0, 3.0), ev("a", 1, 8.0), ev("b", 0, 9.0))
        query.processAllAvailable()
        input.addData(ev("a", 2, 9.0), ev("a", 3, 9.0), ev("b", 1, 9.0))
        query.processAllAvailable()
        val out = spark.table("cusum_out").as[CusumPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))

        // batch twin over the same rows in the same order
        val all = Seq(("a", 0L, 3.0), ("a", 1L, 8.0), ("a", 2L, 9.0),
          ("a", 3L, 9.0), ("b", 0L, 9.0), ("b", 1L, 9.0))
          .toDF("key", "seq", "v")
        val batch = graft.operators.Anomaly.cusum(all, "v", Seq("key"),
            Seq("seq"), 5.0, 0.5, 4.0, scale = 1)
          .collect().map(r => (r.getString(0), r.getAs[Long]("seq")) ->
            ((r.getAs[Double]("cusum_hi"), r.getAs[Double]("cusum_lo"),
              r.getAs[Boolean]("is_shift")))).toMap
        for (p <- out) {
          val sec = (p.ts.getTime - 1700000000000L) / 1000L
          assert((p.cusumHi, p.cusumLo, p.isShift) === batch((p.key, sec)),
            s"streaming path must equal batch at (${p.key}, $sec)")
        }
        assert(out.count(_.isShift) === batch.values.count(_._3))
        assert(out.exists(_.isShift), "the sustained 9s must alarm")
      } finally query.stop()
    }
  }

  test("same-timestamp events replay in seq order, matching the batch path") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[CusumEvent]
      val query = StreamingCusum.cusum(input.toDS(),
          target = 5.0, slack = 0.0, threshold = 100.0, scale = 1)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("cusum_ckpt3").toString)
        .format("memory").queryName("cusum_out3").start()
      try {
        // Two events share ts AND the seq order (0: v=9, 1: v=3) disagrees
        // with the value order — only the seq tie-break reproduces the
        // batch operator's orderCols path.
        input.addData(ev("t", 0, 9.0, seq = 0), ev("t", 0, 3.0, seq = 1),
          ev("t", 1, 7.0, seq = 2))
        query.processAllAvailable()
        val out = spark.table("cusum_out3").as[CusumPoint].collect()
          .sortBy(p => (p.ts.getTime, -p.cusumHi))

        val batch = graft.operators.Anomaly.cusum(
            Seq(("t", 0L, 9.0), ("t", 1L, 3.0), ("t", 2L, 7.0))
              .toDF("key", "seq", "v"),
            "v", Seq("key"), Seq("seq"), 5.0, 0.0, 100.0, scale = 1)
          .orderBy("seq").collect()
          .map(r => (r.getAs[Double]("cusum_hi"), r.getAs[Double]("cusum_lo")))
        // v=9 first (hi=4), then v=3 (hi=2), then v=7 (hi=4) — value-order
        // replay would instead emit hi=0 for the v=3 event.
        val streamed = Seq(
          out.find(p => p.value == 9.0).get,
          out.find(p => p.value == 3.0).get,
          out.find(p => p.value == 7.0).get
        ).map(p => (p.cusumHi, p.cusumLo))
        assert(streamed === batch.toSeq)
      } finally query.stop()
    }
  }

  test("keys evolve independently; state is two accumulators per key") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[CusumEvent]
      val query = StreamingCusum.cusum(input.toDS(),
          target = 10.0, slack = 0.0, threshold = 5.0)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("cusum_ckpt2").toString)
        .format("memory").queryName("cusum_out2").start()
      try {
        input.addData(ev("up", 0, 13.0), ev("up", 1, 13.0),
          ev("down", 0, 7.0), ev("down", 1, 7.0), ev("flat", 0, 10.0))
        query.processAllAvailable()
        val out = spark.table("cusum_out2").as[CusumPoint].collect()
        val up = out.filter(_.key == "up").maxBy(_.ts.getTime)
        val down = out.filter(_.key == "down").maxBy(_.ts.getTime)
        val flat = out.filter(_.key == "flat").head
        assert(up.cusumHi === 6.0 && up.isShift)
        assert(down.cusumLo === 6.0 && down.isShift)
        assert(flat.cusumHi === 0.0 && flat.cusumLo === 0.0 && !flat.isShift)
      } finally query.stop()
    }
  }
}
