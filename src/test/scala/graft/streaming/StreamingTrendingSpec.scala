package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingTrendingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = 1700000000000L // window-aligned epoch base
  private def doc(id: Long, min: Int, text: String) =
    (id, new Timestamp(base + min * 60000L), text)

  test("window token counts: document frequency per tumbling window, " +
      "append on watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val counts = StreamingTrending.windowTokenCounts(
      input.toDF().toDF("doc_id", "event_time", "text"),
      "text", "event_time", "10 minutes", "5 minutes")
    val query = counts.writeStream.format("memory")
      .queryName("trend_counts_out").outputMode("append").start()
    try {
      // window [0,10): 'spam' in 2 docs (and twice in one doc — document
      // frequency must still read 2), 'alpha' in 1
      input.addData(
        doc(1, 1, "spam spam alpha"), doc(2, 2, "spam body"),
        doc(3, 3, "beta body"))
      query.processAllAvailable()
      // advance watermark past the first window (event time 31' − 5' delay)
      input.addData(doc(4, 31, "later doc"))
      query.processAllAvailable()
      val out = spark.table("trend_counts_out")
        .select("token", "n_docs").as[(String, Long)].collect().toMap
      assert(out("spam") === 2L, "document frequency, not term frequency")
      assert(out("alpha") === 1L)
      assert(out("body") === 2L)
      assert(out("beta") === 1L)
      // the open [30,40) window has not closed — 'later' not emitted yet
      assert(!out.contains("later"))
    } finally query.stop()
  }

  test("late data within the delay still counts; beyond it is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val counts = StreamingTrending.windowTokenCounts(
      input.toDF().toDF("doc_id", "event_time", "text"),
      "text", "event_time", "10 minutes", "5 minutes")
    val query = counts.writeStream.format("memory")
      .queryName("trend_late_out").outputMode("append").start()
    try {
      input.addData(doc(1, 1, "early"))
      query.processAllAvailable()
      // watermark now 1' − 5' < 0: a 3' doc is within the open window
      input.addData(doc(2, 3, "early"))
      query.processAllAvailable()
      // close the window
      input.addData(doc(3, 40, "closer"))
      query.processAllAvailable()
      // now a doc for the closed [0,10) window is beyond the watermark
      input.addData(doc(4, 4, "early"))
      query.processAllAvailable()
      val out = spark.table("trend_late_out")
        .select("token", "n_docs").as[(String, Long)].collect().toMap
      assert(out("early") === 2L, "in-delay late row counts, post-close drops")
    } finally query.stop()
  }

  test("topTokens: deterministic per-window top-k with lexicographic ties") {
    val counts = Seq(
      (new Timestamp(base), "zeta", 5L), (new Timestamp(base), "alpha", 5L),
      (new Timestamp(base), "mid", 3L), (new Timestamp(base), "tail", 1L),
      (new Timestamp(base + 600000L), "solo", 2L))
      .toDF("window_start", "token", "n_docs")
    val out = StreamingTrending.topTokens(counts, k = 3)
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getInt(3).toLong))
      .toSet
    assert(out === Set(
      (base, "alpha", 1L), (base, "zeta", 2L), (base, "mid", 3L),
      (base + 600000L, "solo", 1L)))
    val plan = StreamingTrending.topTokens(counts, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown expected:\n$plan")
  }
}
