package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeCaptureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed; drops unchanged") {
    val oldDf = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, None.orNull.asInstanceOf[String], 40.0)).toDF("id", "s", "v")
    val newDf = Seq((1L, "a", 10.0),              // unchanged
      (2L, "B", 20.0),                            // changed payload
      (4L, "now-set", 40.0),                      // null -> value = changed
      (5L, "e", 50.0)).toDF("id", "s", "v")       // added; 3 removed
    val out = ChangeCapture.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("snapshotDiff: null-safe compare — null==null is unchanged") {
    val oldDf = Seq((1L, None.orNull.asInstanceOf[String])).toDF("id", "s")
    val newDf = Seq((1L, None.orNull.asInstanceOf[String])).toDF("id", "s")
    assert(ChangeCapture.snapshotDiff(oldDf, newDf, Seq("id")).count() === 0L)
  }

  test("applyUpserts: update, passthrough, insert") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
    val upd = Seq((2L, "b2", 22.0), (9L, "new", 90.0)).toDF("id", "s", "v")
    val out = ChangeCapture.applyUpserts(base, upd, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out === Map(1L -> ("a", 10.0), 2L -> ("b2", 22.0),
      9L -> ("new", 90.0)))
  }

  test("applyUpserts: duplicate update keys fail loudly") {
    val base = Seq((1L, "a")).toDF("id", "s")
    val upd = Seq((1L, "x"), (1L, "y")).toDF("id", "s")
    val e = intercept[Exception] {
      ChangeCapture.applyUpserts(base, upd, Seq("id")).collect()
    }
    assert(e.getMessage.contains("duplicate update key"))
  }

  test("schema mismatches are rejected up front") {
    val a = Seq((1L, "a")).toDF("id", "s")
    val b = Seq((1L, 2.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      ChangeCapture.snapshotDiff(a, b, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      ChangeCapture.applyUpserts(a, b, Seq("id"))
    }
  }

  test("diff is one full-outer join — no extra exchanges, no window") {
    val oldDf = (1L to 500L).map(i => (i, i * 2)).toDF("id", "v")
    val newDf = (1L to 500L).map(i => (i, i * 2 + i % 7)).toDF("id", "v")
    val p = ChangeCapture.snapshotDiff(oldDf, newDf, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"plan:\n$p")
    assert(!p.contains("Window"), s"no window expected:\n$p")
  }
}
