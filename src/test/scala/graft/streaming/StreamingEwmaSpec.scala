package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingEwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, v: Double) =
    EwmaEvent(key, new Timestamp(t0 + sec * 1000L), v, sec.toLong)

  /** Deterministic integer-valued walk (exact under scale-0 quantization). */
  private def walk(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (0 until n).map(_ => 100.0 + ((next() >>> 40) % 1000L).toDouble)
  }

  test("batch fold is bit-identical to Rolling.ewmaChart at the same targets") {
    val xs = walk(200, 42L)
    // the batch chart's own stats: mu = S/n, sigma = sqrt(n*Sxx - S^2)/n
    val n = xs.length.toDouble
    val sx = xs.map(_.toLong).sum
    val sxx = xs.map(v => BigInt(v.toLong) * v.toLong).sum
    val mu = sx.toDouble / n
    val sigma = math.sqrt((BigInt(xs.length) * sxx - BigInt(sx) * sx)
      .toDouble) / n
    val batch = graft.operators.Rolling.ewmaChart(
        xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
          .toDF("key", "t", "v"),
        "v", Seq("key"), Seq("t"), lambdaPm = 200, l = 3.0)
      .orderBy("t")
      .select("ewma", "ewma_ucl", "ewma_lcl", "ewma_ooc").collect()
    val stream = StreamingEwma.ewmaChartBatch(
        xs.zipWithIndex.map { case (v, i) => ev("k", i, v) }.toDS(),
        lambdaPm = 200, l = 3.0, mu0 = mu, sigma = sigma)
      .collect().sortBy(_.ts.getTime)
    assert(batch.length === stream.length)
    batch.zip(stream).foreach { case (b, s) =>
      assert(b.getAs[Double]("ewma") === s.ewma)
      assert(b.getAs[Double]("ewma_ucl") === s.ucl)
      assert(b.getAs[Double]("ewma_lcl") === s.lcl)
      assert(b.getAs[Boolean]("ewma_ooc") === s.ooc)
    }
  }

  test("streaming chart equals the batch fold across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EwmaEvent]
      val query = StreamingEwma
        .ewmaChart(input.toDS(), lambdaPm = 500, l = 3.0, mu0 = 10.0,
          sigma = 2.0)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ewma_ckpt").toString)
        .format("memory").queryName("ewma_out").start()
      try {
        val events = Seq(ev("a", 0, 10.0), ev("a", 1, 14.0), ev("a", 2, 8.0),
          ev("a", 3, 12.0), ev("b", 0, 20.0))
        input.addData(events.take(2): _*)
        query.processAllAvailable()
        input.addData(events.drop(2): _*)
        query.processAllAvailable()
        val out = spark.table("ewma_out").as[EwmaChartPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))
        val batch = StreamingEwma
          .ewmaChartBatch(events.toDS(), lambdaPm = 500, l = 3.0,
            mu0 = 10.0, sigma = 2.0)
          .collect().sortBy(p => (p.key, p.ts.getTime))
        assert(out.toSeq === batch.toSeq)
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("seed walk: first point sits at z1 = x1 + (1-lambda)(mu0 - x1)") {
    val out = StreamingEwma.ewmaChartBatch(
        Seq(ev("k", 0, 10.0), ev("k", 1, 20.0)).toDS(),
        lambdaPm = 500, l = 3.0, mu0 = 16.0, sigma = 4.0)
      .collect().sortBy(_.ts.getTime)
    assert(out(0).ewma === 10.0 + 0.5 * (16.0 - 10.0)) // = 13
    assert(out(1).ewma === 15.0 + 0.25 * 6.0)          // y2=15, p2=.25
  }
}
