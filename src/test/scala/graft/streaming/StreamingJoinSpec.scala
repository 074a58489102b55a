package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ts(sec: Int) = new Timestamp(t0 + sec * 1000L)

  test("interval join attributes clicks to impressions within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp, String)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamingJoin.intervalJoin(
      impressions.toDF().toDF("user_id", "imp_time", "ad"),
      clicks.toDF().toDF("user_id", "click_time", "page"),
      keyCol = "user_id", leftTimeCol = "imp_time",
      rightTimeCol = "click_time", watermark = "30 seconds",
      lowerBound = "0 seconds", upperBound = "10 seconds")
    val query = joined.writeStream.format("memory")
      .queryName("attribution_out").outputMode("append").start()
    try {
      impressions.addData((1L, ts(0), "adA"), (2L, ts(0), "adB"), (3L, ts(5), "adC"))
      // user 1 clicks in-window (+4s), user 2 too late (+20s),
      // user 3 clicks BEFORE its impression, user 4 never saw an ad
      clicks.addData((1L, ts(4), "p1"), (2L, ts(20), "p2"),
        (3L, ts(2), "p3"), (4L, ts(4), "p4"))
      query.processAllAvailable()
      val out = spark.table("attribution_out")
        .select("user_id", "ad", "page").as[(Long, String, String)]
        .collect().toSet
      assert(out === Set((1L, "adA", "p1")))
    } finally query.stop()
  }

  test("non-key column collisions are rejected up front") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp, String)]
    val b = MemoryStream[(Long, Timestamp, String)]
    intercept[IllegalArgumentException] {
      StreamingJoin.intervalJoin(
        a.toDF().toDF("user_id", "t", "v"), b.toDF().toDF("user_id", "t", "v"),
        "user_id", "t", "t", "1 minute", "0 seconds", "5 seconds")
    }
  }
}
