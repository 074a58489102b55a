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

  test("substringCut: dup spans removed, canonical copy kept, overlapping spans union-merged") {
    val df = Seq(
      (1L, "abcdefgh"),  // all grams canonical — passes through verbatim
      (2L, "abcdexyz"),  // gram @1 "abcde" dup of doc1@1 → cut [1,6) → "xyz"
      (3L, "zzcdefg"),   // gram @3 "cdefg" dup of doc1@3 → cut [3,8) → "zz"
      (4L, "abcd")       // shorter than minLen → verbatim
    ).toDF("doc_id", "text")
    val out = Dedup.substringCut(df, "doc_id", "text", minLen = 5, stride = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "abcdefgh", 0L), (2L, "xyz", 5L), (3L, "zz", 5L), (4L, "abcd", 0L)))
  }

  test("substringCut: within-doc repeats cut down to the canonical first; full-dup doc empties") {
    // doc 7: grams @1/@3/@5 all "ab"+... wait minLen=2 stride=2: "ababab"
    // grams @1 @3 @5 = "ab" — canonical @1 kept, [3,5) and [5,7) merge to
    // [3,7) → "ab" survives
    val df = Seq((7L, "ababab"), (8L, "ababab")).toDF("doc_id", "text")
    val out = Dedup.substringCut(df, "doc_id", "text", minLen = 2, stride = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 7 owns every canonical "ab" (min (id,pos)); doc 8 is pure dup →
    // every gram cut, intervals merge to [1,7) covering all 6 chars
    assert(out.toSeq === Seq((7L, "ab", 4L), (8L, "", 6L)))
  }

  test("substringCut: interior dup leaves head and tail stitched around the cut") {
    // canonical source doc 1; doc 2 embeds doc 1's "abcde" mid-string
    val df = Seq((1L, "abcdefgh"), (2L, "XXabcdeYY"))
      .toDF("doc_id", "text")
    // stride 1 samples every position; doc2 grams "abcde"@3 dup → cut [3,8)
    val out = Dedup.substringCut(df, "doc_id", "text", minLen = 5, stride = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(1) === ((2L, "XXYY", 5L)))
  }

  test("decontaminationCut: probe-matched spans cut, phase-independent detection, clean docs verbatim") {
    val train = Seq(
      (1L, "XXhello worldYY"),  // "hello world" (11 chars) appears in probe
      (2L, "no overlap here!!"),
      (3L, "hello world")       // the whole doc is contaminated
    ).toDF("doc_id", "text")
    val probe = Seq((100L, "zz hello world zz")).toDF("pid", "ptext")
    // minLen=5, stride=2: probe grams exhaustive → any shared substring of
    // length >= 5+2-1=6 is caught whatever the sampling phase
    val out = Dedup.decontaminationCut(train, "doc_id", "text",
        probe, "ptext", minLen = 5, stride = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc1: sampled grams at 1,3,5,7,9,11 — "hello" region grams @3..@9
    // match probe grams; merged cut spans cover [3, 14) → "XX" + "YY"?
    // grams: @3 "hello"? text "XXhello worldYY": @3 = "hell" + ... let the
    // assertions below pin the semantics instead of prose:
    assert(out(1) === ((2L, "no overlap here!!", 0L)),
      "clean doc must pass through verbatim")
    // contaminated docs lose at least the shared substring's chars
    assert(out(0)._1 === 1L && out(0)._3 >= 11L &&
      !out(0)._2.contains("hello world"),
      s"doc1 must not retain the contaminated span: ${out(0)}")
    assert(out(2)._1 === 3L && !out(2)._2.contains("hello"),
      s"doc3 must not retain the contaminated span: ${out(2)}")
  }

  test("decontaminationCut: broadcastProbe=false (shuffle join) is value-identical") {
    val train = Seq(
      (1L, "XXhello worldYY"), (2L, "no overlap here!!"), (3L, "hello world")
    ).toDF("doc_id", "text")
    val probe = Seq((100L, "zz hello world zz")).toDF("pid", "ptext")
    def run(b: Boolean) =
      Dedup.decontaminationCut(train, "doc_id", "text", probe, "ptext",
        minLen = 5, stride = 2, broadcastProbe = b).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(run(true) === run(false))
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
