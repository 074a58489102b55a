package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact duplicated-substring tier (Lee et al. 2022 style): gram sampling
  * arithmetic, canonical-first-occurrence semantics, within-doc duplicates,
  * short-document zero rows, and hashShuffle parity. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("substringSpans: sampling positions, corpus-wide dup marks, canonical first kept") {
    val df = Seq(
      (1L, "abcdefgh"), // grams @1 "abcde", @3 "cdefg"
      (2L, "abcdexyz"), // grams @1 "abcde" (dup of doc1@1), @3 "cdexy"
      (3L, "zzcdefg"),  // grams @1 "zzcde", @3 "cdefg" (dup of doc1@3)
      (4L, "abcd")      // shorter than minLen -> no grams
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(df, "doc_id", "text", minLen = 5, stride = 2)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 1, 5, false), (1L, 3, 5, false), // canonical firsts survive
      (2L, 1, 5, true), (2L, 3, 5, false),
      (3L, 1, 5, false), (3L, 3, 5, true)))
  }

  test("substringDedup: per-doc rollup includes zero rows for short docs") {
    val df = Seq(
      (1L, "abcdefgh"), (2L, "abcdexyz"), (3L, "zzcdefg"), (4L, "abcd")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", minLen = 5, stride = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 1L),
      (4L, 0L, 0L)))
  }

  test("within-document repeats count as duplicates (all but the first occurrence)") {
    val df = Seq((7L, "ababab")).toDF("doc_id", "text")
    // minLen=2, stride=2 -> grams @1 "ab", @3 "ab", @5 "ab": one canonical
    val out = Dedup.substringDedup(df, "doc_id", "text", minLen = 2, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((7L, 3L, 2L)))
  }

  test("hashShuffle mode (8-byte shuffle keys) reproduces the exact-mode result") {
    val df = Seq(
      (1L, "abcdefgh"), (2L, "abcdexyz"), (3L, "zzcdefg"), (4L, "abcd"),
      (7L, "ababababab")
    ).toDF("doc_id", "text")
    def run(hashed: Boolean) =
      Dedup.substringDedup(df, "doc_id", "text", minLen = 5, stride = 2,
        hashShuffle = hashed).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(hashed = true) === run(hashed = false))
  }
}
