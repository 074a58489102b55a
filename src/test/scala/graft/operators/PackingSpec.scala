package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("concat-and-chunk assignments: offsets, boundary spans, per-shard reset") {
    // shard 0: docs 2,4,6 with 300+300+300 tokens over 512-token packs:
    //   doc 2 starts at 0 (pack 0), doc 4 at 300 (pack 0, spans into pack 1),
    //   doc 6 at 600 (pack 1, offset 88)
    // shard 1: doc 1 alone restarts at 0
    val docs = Seq(
      (1L, 1, 300), (2L, 0, 300), (4L, 0, 300), (6L, 0, 300))
      .toDF("doc_id", "shard", "n_tokens")
    val got = Packing.packAssignments(docs, "doc_id", "n_tokens", "shard", 512L)
      .select("doc_id", "token_start", "pack_id", "offset_in_pack")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 0L),
      (2L, 0L, 0L, 0L),
      (4L, 300L, 0L, 300L),
      (6L, 600L, 1L, 88L)))
  }

  test("plans one shard exchange, no global sort") {
    val docs = Seq((1L, 0, 10)).toDF("doc_id", "shard", "n_tokens")
    val plan = Packing.packAssignments(docs, "doc_id", "n_tokens", "shard", 512L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1,
      s"expected exactly one keyed exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"a global sort must not appear:\n$plan")
  }

  test("fails loudly on a negative token count") {
    val bad = Seq((1L, 0, 10), (2L, 0, -3)).toDF("doc_id", "shard", "n_tokens")
    val e = intercept[Exception] {
      Packing.packAssignments(bad, "doc_id", "n_tokens", "shard", 512L)
        .collect()
    }
    assert(e.getMessage.contains("non-null count >= 0") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null count >= 0")))
  }

  test("fails loudly on a NULL token count") {
    // sum() would silently skip the NULL, leaving token_start/pack_id NULL
    val bad = Seq((1L, 0, Some(10)), (2L, 0, Option.empty[Int]))
      .toDF("doc_id", "shard", "n_tokens")
    val e = intercept[Exception] {
      Packing.packAssignments(bad, "doc_id", "n_tokens", "shard", 512L)
        .collect()
    }
    assert(e.getMessage.contains("got NULL") ||
      Option(e.getCause).exists(_.getMessage.contains("got NULL")))
  }

  test("rejects inputs that use reserved output columns") {
    val bad = Seq((1L, 0, 10, 5L)).toDF("doc_id", "shard", "n_tokens", "pack_id")
    val e = intercept[IllegalArgumentException] {
      Packing.packAssignments(bad, "doc_id", "n_tokens", "shard", 512L)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
