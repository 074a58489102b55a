package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingHoltWintersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, v: Double) =
    HwEvent(key, new Timestamp(t0 + sec * 1000L), v, sec.toLong)

  private def walk(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (0 until n).map(i => 100.0 +
      3.0 * math.sin(2.0 * math.Pi * (i % 7) / 7.0) +
      (next() >>> 50).toDouble / 1e3)
  }

  test("batch fold is bit-identical to the native holt_winters window") {
    graft.functions.FinancialFunctions.registerAll(spark)
    for (seed <- Seq(42L, 7L, 9001L)) {
      val xs = walk(250, seed)
      val df = xs.zipWithIndex.map { case (v, i) => ("s", i, v) }
        .toDF("sym", "i", "v")
      df.createOrReplaceTempView("hwwalk")
      val native = spark.sql(
        """SELECT holt_winters(v, 7, 300, 200, 300)
          |  OVER (PARTITION BY sym ORDER BY i) AS f
          |FROM hwwalk ORDER BY i""".stripMargin)
        .collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val fold = StreamingHoltWinters
        .holtWintersBatch(
          xs.zipWithIndex.map { case (v, i) => ev("s", i, v) }.toDS(),
          period = 7)
        .collect().sortBy(_.ts.getTime).map(_.hw)
      assert(native.toSeq === fold.toSeq, s"walk seed $seed diverged")
    }
  }

  test("streaming holt-winters equals the batch fold across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[HwEvent]
      val query = StreamingHoltWinters.holtWinters(input.toDS(), period = 3)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("hw_ckpt").toString)
        .format("memory").queryName("hw_out").start()
      try {
        val events = (0 until 9).map(i => ev("a", i, 50.0 + (i % 3))) :+
          ev("b", 0, 5.0)
        input.addData(events.take(4): _*)
        query.processAllAvailable()
        input.addData(events.drop(4): _*)
        query.processAllAvailable()
        val out = spark.table("hw_out").as[HwPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))
        val batch = StreamingHoltWinters
          .holtWintersBatch(events.toDS(), period = 3).collect()
          .sortBy(p => (p.key, p.ts.getTime))
        assert(out.toSeq === batch.toSeq)
        assert(out.head.hw === None)  // trend unseeded on row 1
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
