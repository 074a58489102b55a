package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingKalmanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, v: Double) =
    KalmanEvent(key, new Timestamp(t0 + sec * 1000L), v, sec.toLong)

  /** Deterministic jagged walk (LCG — reproducible, no Math.random). */
  private def walk(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (0 until n).map(_ => 100.0 + (next() >>> 40).toDouble / 1e4)
  }

  test("batch fold is bit-identical to the native kalman window expression") {
    graft.functions.FinancialFunctions.registerAll(spark)
    for (seed <- Seq(42L, 7L, 9001L)) {
      val xs = walk(300, seed)
      val df = xs.zipWithIndex.map { case (v, i) => ("s", i, v) }
        .toDF("sym", "i", "v")
      df.createOrReplaceTempView("kwalk")
      val native = spark.sql(
        """SELECT kalman(v, 10, 1000)
          |  OVER (PARTITION BY sym ORDER BY i) AS m FROM kwalk ORDER BY i"""
          .stripMargin)
        .collect().map(_.getDouble(0))
      val fold = StreamingKalman
        .kalmanBatch(xs.zipWithIndex.map { case (v, i) => ev("s", i, v) }.toDS())
        .collect().sortBy(_.ts.getTime).map(_.kalman)
      assert(native.toSeq === fold.toSeq, s"walk seed $seed diverged")
    }
  }

  test("seed and convergence: first level is the observation, gain settles") {
    val out = StreamingKalman
      .kalmanBatch(Seq(ev("k", 0, 10.0), ev("k", 1, 10.0), ev("k", 2, 10.0))
        .toDS())
      .collect().sortBy(_.ts.getTime)
    assert(out.head.kalman === 10.0)            // seed = first observation
    assert(out.forall(_.kalman === 10.0))       // constant input is fixed
  }

  test("streaming kalman equals the batch fold across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[KalmanEvent]
      val query = StreamingKalman.kalman(input.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("kal_ckpt").toString)
        .format("memory").queryName("kalman_out").start()
      try {
        val events = Seq(ev("a", 0, 10.0), ev("a", 1, 12.0), ev("a", 2, 9.0),
          ev("a", 3, 11.0), ev("b", 0, 5.0))
        input.addData(events.take(2): _*)
        query.processAllAvailable()
        input.addData(events.drop(2): _*)
        query.processAllAvailable()
        val out = spark.table("kalman_out").as[KalmanPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))
        val batch = StreamingKalman.kalmanBatch(events.toDS()).collect()
          .sortBy(p => (p.key, p.ts.getTime))
        assert(out.toSeq === batch.toSeq)
        assert(out.head.kalman === 10.0)
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
