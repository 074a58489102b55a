package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingVolSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(key: String, sec: Int, v: Double) =
    VolEvent(key, new Timestamp(1700000000000L + sec * 1000L), v, sec.toLong)

  private def withRocks[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming EWMA variance equals the batch ewmcov window bit-for-bit") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[VolEvent]
      val query = StreamingVol.ewmVol(input.toDS(), lambdaPm = 940)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("vol_ckpt").toString)
        .format("memory").queryName("vol_out").start()
      try {
        // state must carry over the micro-batch boundary
        input.addData(ev("a", 0, 2.0), ev("a", 1, -3.0), ev("b", 0, 1.0))
        query.processAllAvailable()
        input.addData(ev("a", 2, 0.5), ev("b", 1, 4.0))
        query.processAllAvailable()
        val out = spark.table("vol_out").as[VolPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))

        // batch twin: the registered ewmcov(x, x, 940) window recurrence
        graft.functions.FinancialFunctions.registerAll(spark)
        Seq(("a", 0L, 2.0), ("a", 1L, -3.0), ("a", 2L, 0.5),
          ("b", 0L, 1.0), ("b", 1L, 4.0))
          .toDF("key", "seq", "v").createOrReplaceTempView("vol_batch")
        val batch = spark.sql(
          """SELECT key, seq, ewmcov(v, v, 940)
            |  OVER (PARTITION BY key ORDER BY seq) AS ewm_var
            |FROM vol_batch""".stripMargin)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
          .toMap
        assert(out.length === 5)
        for (p <- out) {
          val sec = (p.ts.getTime - 1700000000000L) / 1000L
          assert(p.ewmVar === batch((p.key, sec)),
            s"streaming must equal the batch window at (${p.key}, $sec)")
          assert(p.ewmVol === math.sqrt(p.ewmVar))
        }
        // hand seed check: first 'a' point is 2.0² exactly
        assert(out.head.ewmVar === 4.0)
      } finally query.stop()
    }
  }

  test("lambda rails") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[VolEvent]
    intercept[IllegalArgumentException] {
      StreamingVol.ewmVol(input.toDS(), lambdaPm = 1000)
    }
  }
}
