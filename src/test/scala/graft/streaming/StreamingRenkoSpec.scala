package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingRenkoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(key: String, sec: Int, v: Double) =
    RenkoEvent(key, new Timestamp(t0 + sec * 1000L), v, sec.toLong)

  /** Deterministic jagged walk (LCG — reproducible, no Math.random). */
  private def walk(n: Int, seed: Long): Seq[Double] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    var level = 100.0
    (0 until n).map { _ =>
      level += ((next() >>> 40).toDouble / 1e4) - 0.83
      level
    }
  }

  test("batch fold is bit-identical to the native renko window expression") {
    for (seed <- Seq(42L, 7L, 999L)) {
      val vals = walk(300, seed)
      val df = vals.zipWithIndex.map { case (v, i) => ("s", i, v) }
        .toDF("sym", "i", "v")
      val native = graft.operators.Rolling
        .renkoLevel(df, "v", Seq("sym"), Seq("i"), brickCenti = 150)
        .orderBy("i").collect().map(_.getAs[Double]("renko"))
      val fold = StreamingRenko
        .renkoBatch(vals.zipWithIndex.map { case (v, i) => ev("s", i, v) }.toDS(),
          brickCenti = 150)
        .collect().sortBy(_.ts.getTime).map(_.renko)
      assert(native.toSeq === fold.toSeq, s"walk seed $seed diverged")
    }
  }

  private def withRocks[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming run carries brick state across micro-batches") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[RenkoEvent]
      val query = StreamingRenko.renko(input.toDS(), brickCenti = 1000)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("renko_ckpt").toString)
        .format("memory").queryName("renko_out").start()
      try {
        // batch 1 seeds at 100; batch 2's 123 arrives in a NEW micro-batch
        // and must advance from the PERSISTED level, not re-seed
        input.addData(ev("k", 0, 100.0), ev("k", 1, 104.0))
        query.processAllAvailable()
        input.addData(ev("k", 2, 123.0), ev("k", 3, 122.0))
        query.processAllAvailable()
        val out = spark.table("renko_out").as[RenkoPoint]
          .collect().sortBy(_.ts.getTime).map(_.renko).toSeq
        assert(out === Seq(100.0, 100.0, 120.0, 120.0))
      } finally query.stop()
    }
  }
}
