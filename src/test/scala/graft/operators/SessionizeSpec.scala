package graft.operators

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gap splits sessions; ids are 1-based per user in time order") {
    val ev = Seq(
      ("u1", 0L, 1L), ("u1", 100L, 2L), ("u1", 5000L, 3L), ("u1", 5100L, 4L),
      ("u2", 50L, 5L)
    ).toDF("user", "ts", "eid")
    val out = Sessionize.assignSessions(ev, "user", "ts", gapSeconds = 1000,
        tieCols = Seq("eid"))
      .select("user", "eid", "session_id").as[(String, Long, Long)]
      .collect().toSet
    assert(out === Set(("u1", 1L, 1L), ("u1", 2L, 1L), ("u1", 3L, 2L),
      ("u1", 4L, 2L), ("u2", 5L, 1L)))
  }

  test("tied timestamps order by the tie-break column deterministically") {
    val ev = Seq(("u", 10L, 2L), ("u", 10L, 1L), ("u", 5000L, 3L))
      .toDF("user", "ts", "eid")
    val a = Sessionize.assignSessions(ev, "user", "ts", 1000, Seq("eid"))
      .orderBy("eid").select("session_id").as[Long].collect()
    val b = Sessionize.assignSessions(ev.repartition(7), "user", "ts", 1000, Seq("eid"))
      .orderBy("eid").select("session_id").as[Long].collect()
    assert(a.sameElements(b))
    assert(a === Array(1L, 1L, 2L))
  }

  test("sessionStats aggregates count/span/bounds per session") {
    val ev = Seq(("u", 0L, 1L), ("u", 60L, 2L), ("u", 10000L, 3L))
      .toDF("user", "ts", "eid")
    val sess = Sessionize.assignSessions(ev, "user", "ts", 1000, Seq("eid"))
    val stats = Sessionize.sessionStats(sess, "user", "ts")
      .orderBy("session_id")
      .select("session_id", "n_events", "span_seconds", "session_start", "session_end")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(stats === Array((1L, 2L, 60L, 0L, 60L), (2L, 1L, 0L, 10000L, 10000L)))
  }

  test("sessionize plan: one exchange on the user key, single window chain") {
    // ts is TIMESTAMP_NTZ in the parquet; epoch seconds via a UTC-session
    // cast keeps the column numeric without any legacy reader conf.
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("ts_sec"))
    val p = Sessionize.assignSessions(ev, "user_id", "ts_sec", 43200, Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one hash exchange (lag and running sum share the user partitioning):\n$p")
  }

  test("streaming session_window matches the batch session bounds") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = Sessionize.streamingSessionStats(
      input.toDF().toDF("user", "ts"), "user", "ts",
      gap = "10 seconds", watermarkDelay = "1 minute")
    val query = sessions.writeStream.format("memory")
      .queryName("sessionize_stream_out").outputMode("append").start()
    try {
      def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
      // two bursts 100s apart → two sessions for u1 once the watermark passes
      input.addData(("u1", t(0)), ("u1", t(5)), ("u1", t(100)))
      query.processAllAvailable()
      input.addData(("u1", t(300))) // advances watermark past both sessions
      query.processAllAvailable()
      val out = spark.table("sessionize_stream_out")
        .select(col("user"), col("n_events")).as[(String, Long)].collect()
      assert(out.count(_._1 == "u1") >= 2,
        s"expected the two closed u1 sessions emitted, got ${out.mkString(",")}")
      assert(out.filter(_._1 == "u1").map(_._2).sorted.take(2) === Array(1L, 2L))
    } finally query.stop()
  }

  test("session_window boundary: a gap EXACTLY equal to the window still merges") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq((1L, ts(0)), (1L, ts(10)), (2L, ts(0)), (2L, ts(11)))
      .toDF("user_id", "ts")
    // batch execution of the streaming operator — watermark is a no-op
    val out = Sessionize.streamingSessionStats(ev, "user_id", "ts",
        gap = "10 seconds", watermarkDelay = "0 seconds")
      .select(col("user_id"),
        unix_timestamp(col("session_start")).as("s"),
        unix_timestamp(col("session_end")).as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // user 1: gap 10 == window 10 → MERGES (boundary-inclusive), end = 10+10
    assert(out((1L, 0L)) === ((20L, 2L)))
    // user 2: gap 11 > 10 → splits
    assert(out.keySet === Set((1L, 0L), (2L, 0L), (2L, 11L)))
    assert(out((2L, 0L)) === ((10L, 1L)))
    assert(out((2L, 11L)) === ((21L, 1L)))
  }

  test("assignSessions rejects inputs that use its reserved columns") {
    val withSid = Seq(("u1", new Timestamp(0L), 9L)).toDF("user", "ts", "session_id")
    val e = intercept[IllegalArgumentException] {
      Sessionize.assignSessions(withSid, "user", "ts", 60L, Seq.empty)
    }
    assert(e.getMessage.contains("reserved"))
    val withFlag = Seq(("u1", new Timestamp(0L), 1L)).toDF("user", "ts", "__new_session")
    val e2 = intercept[IllegalArgumentException] {
      Sessionize.assignSessions(withFlag, "user", "ts", 60L, Seq.empty)
    }
    assert(e2.getMessage.contains("reserved"))
  }
}
