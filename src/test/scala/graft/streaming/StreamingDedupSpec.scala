package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, sec: Int, text: String) =
    (id, new Timestamp(1700000000000L + sec * 1000L), text)

  test("content dedup: replayed text collapses within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.dedupByContent(
      input.toDF().toDF("doc_id", "event_time", "text"),
      "text", "event_time", "10 minutes")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_content_out").outputMode("append").start()
    try {
      // same content under three different ids, plus two distinct docs
      input.addData(doc(1, 0, "alpha body"), doc(2, 1, "alpha body"),
        doc(3, 2, "beta body"))
      query.processAllAvailable()
      input.addData(doc(4, 3, "alpha body"), doc(5, 4, "gamma body"))
      query.processAllAvailable()
      val out = spark.table("dedup_content_out")
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      // first arrival of each content survives; ids 2/4 (replays) dropped
      assert(out.map(_._2) === Set("alpha body", "beta body", "gamma body"))
      assert(out.map(_._1) === Set(1L, 3L, 5L))
    } finally query.stop()
  }

  test("key dedup: re-sent event ids are delivered once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.dedupByKey(
      input.toDF().toDF("event_id", "event_time", "payload"),
      Seq("event_id"), "event_time", "5 minutes")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_key_out").outputMode("append").start()
    try {
      input.addData(doc(10, 0, "a"), doc(10, 1, "a-retry"), doc(11, 2, "b"))
      query.processAllAvailable()
      input.addData(doc(11, 3, "b-retry"), doc(12, 4, "c"))
      query.processAllAvailable()
      val ids = spark.table("dedup_key_out")
        .select("event_id").as[Long].collect().sorted
      assert(ids === Array(10L, 11L, 12L))
    } finally query.stop()
  }

  test("reserved column name is rejected") {
    val df = Seq((1L, new Timestamp(0L), "t")).toDF("id", "ts", "__content_hash")
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.dedupByContent(df, "__content_hash", "ts", "1 minute")
    }
    assert(e.getMessage.contains("__content_hash"))
  }
}
