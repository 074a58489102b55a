package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingGarchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, r: Option[Double]) =
    GarchEvent(key, new Timestamp(t0 + sec * 1000L), r, sec.toLong)

  private def walkRets(n: Int, seed: Long): Seq[Option[Double]] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    // leading None (a first bar has no return) plus two mid-series Nones
    // to exercise the frozen-state branch
    (0 until n).map { i =>
      if (i == 0 || i == 57 || i == 123) None
      else Some(((next() >>> 40).toDouble / 1e7) - 0.0008)
    }
  }

  test("batch fold is bit-identical to the native garch window expression") {
    graft.functions.FinancialFunctions.registerAll(spark)
    for (seed <- Seq(42L, 7L, 9001L)) {
      val rs = walkRets(300, seed)
      val df = rs.zipWithIndex.map { case (r, i) => ("s", i, r) }
        .toDF("sym", "i", "r")
      df.createOrReplaceTempView("gwalk")
      val native = spark.sql(
        """SELECT garch(r, 2, 100, 850)
          |  OVER (PARTITION BY sym ORDER BY i) AS v FROM gwalk ORDER BY i"""
          .stripMargin)
        .collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val fold = StreamingGarch
        .garchBatch(rs.zipWithIndex.map { case (r, i) => ev("s", i, r) }.toDS())
        .collect().sortBy(_.ts.getTime).map(_.vol)
      assert(native.toSeq === fold.toSeq, s"walk seed $seed diverged")
    }
  }

  test("seeding and stationarity: first vol is the unconditional sigma") {
    val out = StreamingGarch
      .garchBatch(Seq(ev("k", 0, None), ev("k", 1, Some(0.01)),
        ev("k", 2, Some(-0.02))).toDS())
      .collect().sortBy(_.ts.getTime)
    assert(out(0).vol === None)                    // frozen on NULL input
    val uncond = 2.0 / 1e6 / (1.0 - 0.1 - 0.85)
    assert(out(1).vol === Some(math.sqrt(uncond)))
    val step = 2.0 / 1e6 + ((0.1 * (0.01 * 0.01)) + (0.85 * uncond))
    assert(out(2).vol === Some(math.sqrt(step)))
  }

  test("streaming garch equals the batch fold across micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[GarchEvent]
      val query = StreamingGarch.garch(input.toDS())
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("garch_ckpt").toString)
        .format("memory").queryName("garch_out").start()
      try {
        val events = Seq(ev("a", 0, None), ev("a", 1, Some(0.01)),
          ev("a", 2, Some(-0.02)), ev("a", 3, Some(0.005)),
          ev("b", 0, Some(0.03)))
        input.addData(events.take(2): _*)
        query.processAllAvailable()
        input.addData(events.drop(2): _*)
        query.processAllAvailable()
        val out = spark.table("garch_out").as[GarchPoint].collect()
          .sortBy(p => (p.key, p.ts.getTime))
        val batch = StreamingGarch.garchBatch(events.toDS()).collect()
          .sortBy(p => (p.key, p.ts.getTime))
        assert(out.toSeq === batch.toSeq)
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
