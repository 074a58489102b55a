package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The r12-ADVICE checkpoint-migration guard: changing indicatorsTws's
  * default from unbounded state to the 7-day TTL swapped the stateful
  * operator shape, so a restart from an old-default checkpoint must fail
  * FAST with a migration message — not with Spark's opaque
  * state-incompatibility error mid-restart. */
class StateContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tick(sym: String, min: Int, price: Double) =
    MarketTick(sym, new Timestamp(1673776800000L + min * 60000L), price,
      1000L, None, None)

  test("fresh checkpoint: contract recorded, identical revalidation passes") {
    val dir = Files.createTempDirectory("sc_fresh").toString
    val c = StateContract.indicatorsTwsContract(5, StreamingPipeline.DefaultIdleMs)
    StateContract.validate(spark, dir, c)
    assert(Files.exists(java.nio.file.Paths.get(dir, StateContract.MarkerFile)))
    StateContract.validate(spark, dir, c) // idempotent
  }

  test("pre-contract checkpoint (offsets, no marker) fails fast with the migration message") {
    val dir = Files.createTempDirectory("sc_old")
    Files.createDirectories(dir.resolve("offsets")) // a real checkpoint shape
    val e = intercept[IllegalStateException] {
      StateContract.validate(spark, dir.toString,
        StateContract.indicatorsTwsContract(5, StreamingPipeline.DefaultIdleMs))
    }
    assert(e.getMessage.contains("predates the state contract"))
    assert(e.getMessage.contains("KeepForever"))
  }

  test("shape mismatch (old KeepForever marker vs new TTL default) fails fast naming both shapes") {
    val dir = Files.createTempDirectory("sc_mismatch").toString
    StateContract.validate(spark, dir,
      StateContract.indicatorsTwsContract(5, StreamingPipeline.KeepForever))
    val e = intercept[IllegalStateException] {
      StateContract.validate(spark, dir,
        StateContract.indicatorsTwsContract(5, StreamingPipeline.DefaultIdleMs))
    }
    assert(e.getMessage.contains("keepForever") &&
      e.getMessage.contains("eventTimeTtl"))
    assert(e.getMessage.contains("KeepForever"),
      "message must name the pin-the-old-default migration")
    // a windowSize change is a shape change too
    val e2 = intercept[IllegalStateException] {
      StateContract.validate(spark, dir,
        StateContract.indicatorsTwsContract(14, StreamingPipeline.KeepForever))
    }
    assert(e2.getMessage.contains("windowSize"))
  }

  test("end-to-end: a KeepForever checkpoint written by a real query is refused under the TTL default") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dir = Files.createTempDirectory("sc_e2e").toString
    val oldContract = StateContract.indicatorsTwsContract(3, StreamingPipeline.KeepForever)
    StateContract.validate(spark, dir, oldContract)
    val input = MemoryStream[MarketTick]
    val query = StreamingPipeline
      .indicatorsTws(input.toDS(), windowSize = 3,
        idleMs = StreamingPipeline.KeepForever)
      .writeStream.outputMode("append")
      .option("checkpointLocation", dir)
      .format("memory").queryName("sc_e2e_out")
      .start()
    try {
      input.addData(tick("AAPL", 0, 150.0), tick("AAPL", 1, 151.0))
      query.processAllAvailable()
    } finally {
      query.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.sql("DROP TABLE IF EXISTS sc_e2e_out")
    }
    // the checkpoint now has real offsets + the old-shape marker: a restart
    // under the NEW default must be refused before any stream starts
    val e = intercept[IllegalStateException] {
      StateContract.validate(spark, dir,
        StateContract.indicatorsTwsContract(3, StreamingPipeline.DefaultIdleMs))
    }
    assert(e.getMessage.contains("DIFFERENT"))
    // pinning the old shape still validates — the documented migration
    StateContract.validate(spark, dir, oldContract)
  }
}
