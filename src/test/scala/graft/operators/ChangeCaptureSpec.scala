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

  private def hist(rows: Seq[(Long, String, Double, Long, Any)]) =
    rows.map { case (id, s, v, vf, vt) =>
      (id, s, v, vf, vt.asInstanceOf[java.lang.Long]) }
      .toDF("id", "s", "v", "valid_from", "valid_to")

  test("scd2Apply: bootstrap from an empty history opens every snapshot row") {
    val h0 = hist(Seq.empty)
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
    val out = ChangeCapture.scd2Apply(h0, snap, Seq("id"), lit(100L))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.get(4))).toSet
    assert(out === Set((1L, 100L, null), (2L, 100L, null)))
  }

  test("scd2Apply: change closes and reopens; delete closes; insert opens; " +
      "unchanged passes; closed rows pass through untouched") {
    val h = hist(Seq(
      (1L, "a", 10.0, 100L, null),            // will stay unchanged
      (2L, "b", 20.0, 100L, null),            // payload will change
      (3L, "c", 30.0, 100L, null),            // will be deleted
      (9L, "old", 90.0, 50L, 100L)))          // already closed: passthrough
    val snap = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("id", "s", "v")
    val out = ChangeCapture.scd2Apply(h, snap, Seq("id"), lit(200L))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.get(4))).toSet
    assert(out === Set(
      (1L, "a", 100L, null),          // unchanged, still open
      (2L, "b", 100L, 200L),          // old version closed at 200
      (2L, "B", 200L, null),          // new version open from 200
      (3L, "c", 100L, 200L),          // deletion closes
      (4L, "d", 200L, null),          // insert opens
      (9L, "old", 50L, 100L)))        // closed history untouched
  }

  test("scd2Apply: a re-inserted key after deletion gets a fresh version") {
    val h = hist(Seq((1L, "a", 10.0, 100L, 200L))) // closed (deleted at 200)
    val snap = Seq((1L, "a2", 11.0)).toDF("id", "s", "v")
    val out = ChangeCapture.scd2Apply(h, snap, Seq("id"), lit(300L))
      .collect().map(r => (r.getString(1), r.getLong(3), r.get(4))).toSet
    assert(out === Set(("a", 100L, 200L), ("a2", 300L, null)))
  }

  test("scd2Apply: duplicate open or snapshot keys and stale asOf fail loudly") {
    val snap = Seq((1L, "a", 10.0)).toDF("id", "s", "v")
    val dupOpen = hist(Seq((1L, "a", 10.0, 100L, null),
      (1L, "x", 11.0, 150L, null)))
    val e1 = intercept[Exception] {
      ChangeCapture.scd2Apply(dupOpen, snap, Seq("id"), lit(200L)).collect()
    }
    assert(e1.getMessage.contains("duplicate open-history") ||
      Option(e1.getCause).exists(_.getMessage.contains("duplicate open-history")))
    val h = hist(Seq((1L, "a", 10.0, 100L, null)))
    val dupSnap = Seq((1L, "a", 10.0), (1L, "b", 11.0)).toDF("id", "s", "v")
    val e2 = intercept[Exception] {
      ChangeCapture.scd2Apply(h, dupSnap, Seq("id"), lit(200L)).collect()
    }
    assert(e2.getMessage.contains("duplicate snapshot") ||
      Option(e2.getCause).exists(_.getMessage.contains("duplicate snapshot")))
    // closing at a stamp <= the open row's valid_from is corrupt input
    val e3 = intercept[Exception] {
      ChangeCapture.scd2Apply(h, Seq((1L, "CHANGED", 10.0)).toDF("id", "s", "v"),
        Seq("id"), lit(100L)).collect()
    }
    assert(e3.getMessage.contains("asOf must be after") ||
      Option(e3.getCause).exists(_.getMessage.contains("asOf must be after")))
  }

  test("scd2Apply: closed rows never enter the join (passthrough branch)") {
    val h = hist(Seq((1L, "a", 10.0, 100L, null), (2L, "b", 20.0, 50L, 100L)))
    val snap = Seq((1L, "a", 10.0)).toDF("id", "s", "v")
    val plan = ChangeCapture.scd2Apply(h, snap, Seq("id"), lit(200L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"plan:\n$plan")
    assert(plan.contains("Union"), s"closed rows must bypass the join:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }
}
