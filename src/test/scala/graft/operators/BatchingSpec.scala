package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BatchingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketAssignments: smallest bucket that fits, clamp above the top") {
    val df = Seq(1L, 16L, 17L, 64L, 999L).toDF("n")
    val out = Batching.bucketAssignments(df, "n", Seq(16L, 32L, 64L, 128L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((16L, 1L, 15L)))    // pad to 16
    assert(out(16L) === ((16L, 16L, 0L)))   // boundary: fits exactly
    assert(out(17L) === ((32L, 17L, 15L)))  // next rung
    assert(out(64L) === ((64L, 64L, 0L)))
    assert(out(999L) === ((128L, 128L, 0L))) // clamped: truncates, no padding
  }

  test("bucketStats: totals reconcile (stored + padding = bucket * n_docs)") {
    val df = (1L to 200L).toDF("n")
    val rows = Batching.bucketStats(df, "n", Seq(16L, 32L, 64L, 128L))
      .collect()
    assert(rows.map(_.getLong(1)).sum === 200L)
    rows.foreach { r =>
      val (bucket, nDocs, raw, stored, pad) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(stored + pad === bucket * nDocs,
        s"bucket $bucket: stored $stored + pad $pad != capacity ${bucket * nDocs}")
      assert(stored <= raw)
    }
    // docs 129..200 truncate to the 128 rung: stored < raw there
    val top = rows.find(_.getLong(0) == 128L).get
    assert(top.getLong(3) < top.getLong(2))
  }

  test("tokenBudgetSelect: best-score prefix per group, crossing doc kept") {
    // group g: scores 9,8,7 with 60/50/40 tokens; budget 100 keeps the
    // first two (110 total — the crossing doc fills partially) but not the
    // third (tokens_before 110 >= 100)
    val df = Seq(("g", 1L, 60L, 9.0), ("g", 2L, 50L, 8.0), ("g", 3L, 40L, 7.0),
      ("h", 4L, 500L, 1.0), ("h", 5L, 1L, 0.5)).toDF("grp", "id", "n", "score")
    val kept = Batching.tokenBudgetSelect(df, Seq("grp"), "n", "score", "id",
        budget = 100L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum_tokens")).toMap
    assert(kept.keySet === Set(1L, 2L, 4L))
    assert(kept(2L) === 110L)   // crossing doc kept with its overshoot visible
    assert(kept(4L) === 500L)   // first doc always kept even over budget
    intercept[IllegalArgumentException] {
      Batching.tokenBudgetSelect(df, Seq.empty, "n", "score", "id", 10L)
    }
  }

  test("invalid ladders and negative/null counts fail loudly") {
    val df = Seq(1L).toDF("n")
    intercept[IllegalArgumentException] {
      Batching.bucketAssignments(df, "n", Seq(32L, 16L))
    }
    intercept[IllegalArgumentException] {
      Batching.bucketAssignments(df, "n", Seq.empty)
    }
    val bad = Seq(-1L).toDF("n")
    val e = intercept[Exception] {
      Batching.bucketAssignments(bad, "n", Seq(16L)).collect()
    }
    assert(e.getMessage.contains("non-null count"))
    val withNull = Seq(Some(1L), Option.empty[Long]).toDF("n")
    val e2 = intercept[Exception] {
      Batching.bucketAssignments(withNull, "n", Seq(16L)).collect()
    }
    assert(e2.getMessage.contains("non-null count"))
  }

  test("bucket id is a pure per-row expression — no exchange before the agg") {
    val df = (1L to 50L).toDF("n")
    val p = Batching.bucketAssignments(df, "n", Seq(16L, 32L, 64L))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
  }
}
