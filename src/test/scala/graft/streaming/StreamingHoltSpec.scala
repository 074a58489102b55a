package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingHoltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, v: Double) =
    HoltEvent(key, new Timestamp(t0 + sec * 1000L), v, sec.toLong)

  private def walk(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (0 until n).map(_ => 100.0 + (next() >>> 40).toDouble / 1e4)
  }

  test("batch fold is bit-identical to the native holt window expression") {
    graft.functions.FinancialFunctions.registerAll(spark)
    for (seed <- Seq(42L, 7L, 9001L)) {
      val xs = walk(300, seed)
      val df = xs.zipWithIndex.map { case (v, i) => ("s", i, v) }
        .toDF("sym", "i", "v")
      df.createOrReplaceTempView("hwalk")
      val native = spark.sql(
        """SELECT holt(v, 300, 200)
          |  OVER (PARTITION BY sym ORDER BY i) AS f FROM hwalk ORDER BY i"""
          .stripMargin)
        .collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val fold = StreamingHolt
        .holtBatch(xs.zipWithIndex.map { case (v, i) => ev("s", i, v) }.toDS())
        .collect().sortBy(_.ts.getTime).map(_.holt)
      assert(native.toSeq === fold.toSeq, s"walk seed $seed diverged")
    }
  }

  test("seeding: first point None, second is 2*x2 - x1") {
    val out = StreamingHolt
      .holtBatch(Seq(ev("k", 0, 10.0), ev("k", 1, 12.0)).toDS())
      .collect().sortBy(_.ts.getTime)
    assert(out(0).holt === None)
    assert(out(1).holt === Some(12.0 + (12.0 - 10.0)))
  }

  test("streaming holt equals the batch fold across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[HoltEvent]
      val query = StreamingHolt.holt(input.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("holt_ckpt").toString)
        .format("memory").queryName("holt_out").start()
      try {
        val events = Seq(ev("a", 0, 10.0), ev("a", 1, 12.0), ev("a", 2, 9.0),
          ev("a", 3, 11.0), ev("b", 0, 5.0))
        input.addData(events.take(2): _*)
        query.processAllAvailable()
        input.addData(events.drop(2): _*)
        query.processAllAvailable()
        val out = spark.table("holt_out").as[HoltPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))
        val batch = StreamingHolt.holtBatch(events.toDS()).collect()
          .sortBy(p => (p.key, p.ts.getTime))
        assert(out.toSeq === batch.toSeq)
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
