package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential testing for the substring tier: an independent, obviously-
  * correct O(n²) in-memory reference implementation of the span semantics
  * (gram sampling → corpus-wide canonical-first marking → per-char cut)
  * compared against the distributed operators on randomized small-alphabet
  * corpora — tiny alphabets make collisions dense, so every interval-merge
  * / canonical-tie / full-doc-cut edge actually occurs. Fixed seed:
  * failures reproduce exactly. */
class SubstringPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- reference implementation (character indexing 1-based like SQL) ----

  private def grams(text: String, minLen: Int, stride: Int): Seq[(Int, String)] =
    if (text.length < minLen) Seq.empty
    else (1 to (text.length - minLen + 1) by stride)
      .map(p => p -> text.substring(p - 1, p - 1 + minLen))

  /** (id, pos, dup) for every sampled occurrence. */
  private def refSpans(docs: Seq[(Long, String)], minLen: Int,
                       stride: Int): Seq[(Long, Int, Boolean)] = {
    val occ = for ((id, t) <- docs; (p, g) <- grams(t, minLen, stride))
      yield (id, p, g)
    val byGram = occ.groupBy(_._3)
    occ.map { case (id, p, g) =>
      val os = byGram(g)
      val canon = os.map(o => (o._1, o._2)).min
      (id, p, os.size >= 2 && (id, p) != canon)
    }
  }

  private def cutChars(text: String, spans: Seq[(Int, Int)]): String = {
    val remove = Array.fill(text.length)(false)
    spans.foreach { case (s, e) => // [s, e) 1-based; clamped to the doc
      (math.max(s - 1, 0) until math.min(e - 1, text.length))
        .foreach(remove(_) = true)
    }
    text.zipWithIndex.collect { case (c, i) if !remove(i) => c }.mkString
  }

  private def refCut(docs: Seq[(Long, String)], minLen: Int,
                     stride: Int): Seq[(Long, String, Long)] = {
    val dup = refSpans(docs, minLen, stride).filter(_._3)
    docs.map { case (id, t) =>
      val cleaned = cutChars(t,
        dup.filter(_._1 == id).map(d => (d._2, d._2 + minLen)))
      (id, cleaned, (t.length - cleaned.length).toLong)
    }
  }

  private def refDecontaminate(docs: Seq[(Long, String)],
                               probe: Seq[String], minLen: Int,
                               stride: Int): Seq[(Long, String, Long)] = {
    val probeGrams = probe.flatMap(t => grams(t, minLen, 1).map(_._2)).toSet
    docs.map { case (id, t) =>
      val hits = grams(t, minLen, stride)
        .filter(pg => probeGrams(pg._2)).map(pg => (pg._1, pg._1 + minLen))
      val cleaned = cutChars(t, hits)
      (id, cleaned, (t.length - cleaned.length).toLong)
    }
  }

  // ---- winnowing reference (Schleimer et al. 2003, leftmost tie-break) ----

  /** The operator's portable gram hash, re-derived independently (first
    * 10 hex chars of md5 over UTF-8 bytes — not a call into Dedup). */
  private def refHash(g: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 10), 16)
  }

  /** Selected fingerprints `(pos, gram)` of one document: min-by-HASH
    * within each window (standard winnowing fingerprints hashed grams),
    * absolute-position leftmost tie-break — the r14 selection key. */
  private def refWinnow(text: String, minLen: Int, noise: Int): Seq[(Int, String)] =
    if (text.length < minLen) Seq.empty
    else {
      val w = minLen - noise + 1
      val gs = (1 to text.length - noise + 1)
        .map(p => p -> text.substring(p - 1, p - 1 + noise))
      (0 to gs.length - w)
        .map(i => gs.slice(i, i + w).minBy { case (p, g) => (refHash(g), p) })
        .distinct
    }

  /** (id, pos, dup) for every selected fingerprint, corpus-wide
    * canonical-first marking — the winnowed twin of [[refSpans]]. */
  private def refWinnowSpans(docs: Seq[(Long, String)], minLen: Int,
                             noise: Int): Seq[(Long, Int, Boolean)] = {
    val occ = for ((id, t) <- docs; (p, g) <- refWinnow(t, minLen, noise))
      yield (id, p, g)
    val byGram = occ.groupBy(_._3)
    occ.map { case (id, p, g) =>
      val os = byGram(g)
      val canon = os.map(o => (o._1, o._2)).min
      (id, p, os.size >= 2 && (id, p) != canon)
    }
  }

  private def refWinnowCut(docs: Seq[(Long, String)], minLen: Int,
                           noise: Int, pad: Int = 0): Seq[(Long, String, Long)] = {
    val dup = refWinnowSpans(docs, minLen, noise).filter(_._3)
    docs.map { case (id, t) =>
      val cleaned = cutChars(t,
        dup.filter(_._1 == id).map(d => (d._2 - pad, d._2 + noise + pad)))
      (id, cleaned, (t.length - cleaned.length).toLong)
    }
  }

  // ---- randomized corpora ----

  private def corpus(rnd: Random, nDocs: Int, alphabet: String): Seq[(Long, String)] =
    (1 to nDocs).map { i =>
      val len = rnd.nextInt(25) // includes 0 and below-minLen lengths
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }

  test("substringDedup and substringCut match the in-memory reference on 12 random corpora") {
    val rnd = new Random(20260815L)
    for (case_ <- 1 to 12) {
      val alphabet = if (case_ % 2 == 0) "ab" else "abc"
      val minLen = 2 + rnd.nextInt(4) // 2..5
      val stride = 1 + rnd.nextInt(3) // 1..3
      val docs = corpus(rnd, nDocs = 6, alphabet)
      val df = docs.toDF("doc_id", "text")

      val expSpans = refSpans(docs, minLen, stride)
      val expDedup = docs.map { case (id, _) =>
        val mine = expSpans.filter(_._1 == id)
        (id, mine.size.toLong, mine.count(_._3).toLong)
      }.sortBy(_._1)
      val gotDedup = Dedup.substringDedup(df, "doc_id", "text", minLen, stride)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotDedup === expDedup,
        s"case $case_ (minLen=$minLen stride=$stride) dedup mismatch on $docs")

      val expCut = refCut(docs, minLen, stride).sortBy(_._1)
      val gotCut = Dedup.substringCut(df, "doc_id", "text", minLen, stride)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(gotCut === expCut,
        s"case $case_ (minLen=$minLen stride=$stride) cut mismatch on $docs")
    }
  }

  test("winnowedDedup and winnowedCut match the in-memory reference on 12 random corpora") {
    val rnd = new Random(20260816L)
    for (case_ <- 1 to 12) {
      val alphabet = if (case_ % 2 == 0) "ab" else "abc"
      val minLen = 3 + rnd.nextInt(3) // 3..5
      val noise = 2 + rnd.nextInt(minLen - 1) // 2..minLen
      val docs = corpus(rnd, nDocs = 6, alphabet)
      val df = docs.toDF("doc_id", "text")

      val expSpans = refWinnowSpans(docs, minLen, noise)
      val expDedup = docs.map { case (id, _) =>
        val mine = expSpans.filter(_._1 == id)
        (id, mine.size.toLong, mine.count(_._3).toLong)
      }.sortBy(_._1)
      val gotDedup = Dedup.winnowedDedup(df, "doc_id", "text", minLen, noise)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotDedup === expDedup,
        s"case $case_ (minLen=$minLen noise=$noise) dedup mismatch on $docs")

      // every 3rd case exercises the edgePad dial (w−1): span stretch +
      // boundary clamps (pads past doc start/end must splice cleanly)
      val pad = if (case_ % 3 == 0) minLen - noise else 0
      val expCut = refWinnowCut(docs, minLen, noise, pad).sortBy(_._1)
      val gotCut = Dedup.winnowedCut(df, "doc_id", "text", minLen, noise,
          edgePad = pad)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(gotCut === expCut,
        s"case $case_ (minLen=$minLen noise=$noise pad=$pad) cut mismatch " +
          s"on $docs")
    }
  }

  test("winnow chunked long-document path: fingerprints, dedup and cut " +
      "match the reference with duplicates spanning chunk boundaries") {
    // documents LONGER than Dedup.WinnowChunkChars (2^12) take the r16
    // chunked gram-extraction branch, which the oracle corpora (≤577-char
    // docs) never exercise. Duplicated regions are planted to STRADDLE
    // the 4096 and 8192 chunk boundaries, so any off-by-one in the
    // chunk/local-position arithmetic or a torn gram at a chunk edge
    // breaks gram equality and fails the cut comparison.
    val rnd = new Random(20260819L)
    val alphabet = "abcdefgh"
    def randText(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val base1 = randText(9500) // chunks [1,4096],[4097,8192],[8193,...]
    val base2 = randText(9000)
    val shared = base1.substring(4070, 4150) // spans the 4096 boundary
    // doc2: planted at 8160 (spans ITS 8192 boundary); doc3 is SHORT, so
    // the match also crosses the short/long BRANCH boundary
    val doc2 = base2.substring(0, 8160) + shared +
      base2.substring(8160 + shared.length)
    val doc3 = "x" * 40 + shared + "y" * 40
    val docs = Seq((1L, base1), (2L, doc2), (3L, doc3))
    val df = docs.toDF("doc_id", "text")
    val (minLen, noise) = (30, 21)

    // fingerprint-level equality: positions AND gram text
    val expFp = docs.flatMap { case (id, t) =>
      refWinnow(t, minLen, noise).map { case (p, g) => (id, p, g) }
    }.sorted
    val gotFp = Dedup.winnowFingerprints(df, "doc_id", "text", minLen, noise)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(gotFp === expFp, "chunked fingerprint mismatch")

    val expSpans = refWinnowSpans(docs, minLen, noise)
    val expDedup = docs.map { case (id, _) =>
      val mine = expSpans.filter(_._1 == id)
      (id, mine.size.toLong, mine.count(_._3).toLong)
    }.sortBy(_._1)
    val gotDedup = Dedup.winnowedDedup(df, "doc_id", "text", minLen, noise)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotDedup === expDedup, "chunked dedup rollup mismatch")
    // the planted region must actually be detected in the copies
    assert(gotDedup.count(_._3 > 0) >= 2, "planted cross-boundary dup missed")

    val expCut = refWinnowCut(docs, minLen, noise).sortBy(_._1)
    val gotCut = Dedup.winnowedCut(df, "doc_id", "text", minLen, noise)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(gotCut === expCut, "chunked cut mismatch")
  }

  test("winnowOverlapPairs matches the in-memory fingerprint-set intersection on 12 random corpora") {
    val rnd = new Random(816L)
    for (case_ <- 1 to 12) {
      val alphabet = if (case_ % 2 == 0) "ab" else "abc"
      val minLen = 3 + rnd.nextInt(3) // 3..5
      val noise = 2 + rnd.nextInt(minLen - 1) // 2..minLen
      val minShared = 1 + rnd.nextInt(2) // 1..2
      val docs = corpus(rnd, nDocs = 8, alphabet)
      val df = docs.toDF("doc_id", "text")

      val sets = docs.map { case (id, t) =>
        id -> refWinnow(t, minLen, noise).map(_._2).toSet
      }.filter(_._2.nonEmpty)
      val exp = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        shared = (sa intersect sb).size if shared >= minShared
      } yield (ia, ib, shared.toLong,
        shared.toDouble / math.min(sa.size, sb.size))).sortBy(p => (p._1, p._2))

      val got = Dedup.winnowOverlapPairs(df, "doc_id", "text", minLen, noise,
          minShared)
        .orderBy("id_a", "id_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      graft.CacheScope.release()
      assert(got === exp,
        s"case $case_ (minLen=$minLen noise=$noise minShared=$minShared) " +
          s"mismatch on $docs")
    }
  }

  test("winnowIncrementalDedup/Cut match the in-memory index probe on 10 random corpora") {
    val rnd = new Random(20260816L + 7)
    for (case_ <- 1 to 10) {
      val alphabet = if (case_ % 2 == 0) "ab" else "abc"
      val minLen = 3 + rnd.nextInt(3)
      val noise = 2 + rnd.nextInt(minLen - 1)
      val refDocs = corpus(rnd, nDocs = 5, alphabet)
      val newDocs = corpus(rnd, nDocs = 5, alphabet)
        .map { case (id, t) => (id + 100L, t) }
      val refIdx = refDocs.flatMap(d => refWinnow(d._2, minLen, noise))
        .map(_._2).toSet

      val expDedup = newDocs.map { case (id, t) =>
        val fp = refWinnow(t, minLen, noise)
        (id, fp.size.toLong, fp.count(p => refIdx(p._2)).toLong)
      }.sortBy(_._1)
      val expCut = newDocs.map { case (id, t) =>
        val hits = refWinnow(t, minLen, noise)
          .filter(p => refIdx(p._2)).map(p => (p._1, p._1 + noise))
        val cleaned = cutChars(t, hits)
        (id, cleaned, (t.length - cleaned.length).toLong)
      }.sortBy(_._1)

      val rdf = refDocs.toDF("doc_id", "text")
      val ndf = newDocs.toDF("doc_id", "text")
      val index = Dedup.buildWinnowIndex(rdf, "doc_id", "text", minLen, noise)
      val gotDedup = Dedup.winnowIncrementalDedup(ndf, index, "doc_id",
          "text", minLen, noise)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotDedup === expDedup,
        s"case $case_ (minLen=$minLen noise=$noise) ingest-dedup mismatch " +
          s"on ref=$refDocs new=$newDocs")
      val gotCut = Dedup.winnowIncrementalCut(ndf, index, "doc_id", "text",
          minLen, noise, broadcastIndex = case_ % 3 == 0)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(gotCut === expCut,
        s"case $case_ (minLen=$minLen noise=$noise) ingest-cut mismatch")
    }
  }

  test("winnowing detection guarantee: a shared >=minLen substring is caught at EVERY alignment phase") {
    val minLen = 30
    val noise = 21 // w = 10
    def soup(seed: Long, len: Int): String = {
      val r = new Random(seed)
      (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    // one pair per phase shift 0..9: doc B's secret offset differs from
    // A's by exactly `shift` — the construction stride sampling fails on
    // (substringfloor.json: 17.4% caught at stride 10)
    val docs = (0 until 10).flatMap { shift =>
      val secret = soup(7000L + shift, minLen) // exactly at the guarantee
      Seq((shift * 2L, soup(7100L + shift, 8) + secret + soup(7200L + shift, 40)),
        (shift * 2L + 1,
          soup(7300L + shift, 8 + shift) + secret + soup(7400L + shift, 40)))
    }
    val got = Dedup.winnowedDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, noise)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (shift <- 0 until 10) {
      val caught = got(shift * 2L) + got(shift * 2L + 1)
      assert(caught >= 1L, s"phase shift $shift: shared $minLen-char " +
        s"substring produced no duplicate fingerprint")
    }
    // and the same corpus through stride sampling for contrast: the
    // misaligned pairs are invisible to it (documented, measured caveat)
    val strided = Dedup.substringDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen, stride = 10)
      .agg(sum(col("n_dup"))).head.getLong(0)
    assert(strided < 10L,
      "stride sampling unexpectedly caught every phase — fixture broken?")
  }

  test("winnowFingerprints: hand-checked selection on a tiny document") {
    // "abcde", noise=2, minLen=3 -> w=2; grams ab bc cd de. Selection is
    // min-by-md5-prefix per window; the expected winners are derived from
    // the independent refHash and ALSO asserted against the hand-computed
    // hash order (md5: ab < bc, bc < cd, de < cd), so a refHash drift
    // cannot silently rewrite the expectation.
    assert(refHash("ab") < refHash("bc") && refHash("bc") < refHash("cd") &&
      refHash("de") < refHash("cd"),
      "md5 prefix order of the fixture grams changed — recheck by hand")
    // windows: {ab,bc}->ab@1, {bc,cd}->bc@2, {cd,de}->de@4
    val got = Dedup.winnowFingerprints(Seq((1L, "abcde")).toDF("doc_id", "text"),
        "doc_id", "text", minLen = 3, noise = 2)
      .orderBy("pos")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got === Seq((1, "ab"), (2, "bc"), (4, "de")))
  }

  test("decontaminationCut matches the in-memory reference on 8 random corpora (incl. empty probe = identity)") {
    val rnd = new Random(4101202L)
    for (case_ <- 1 to 8) {
      val minLen = 2 + rnd.nextInt(3) // 2..4
      val stride = 1 + rnd.nextInt(3)
      val docs = corpus(rnd, nDocs = 5, "ab")
      // case 1 uses an EMPTY probe: the operator must be the identity
      val probe = if (case_ == 1) Seq.empty[String]
        else corpus(rnd, nDocs = 2, "ab").map(_._2)
      val df = docs.toDF("doc_id", "text")
      val pdf = probe.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("pid", "ptext")

      val exp = refDecontaminate(docs, probe, minLen, stride).sortBy(_._1)
      val got = Dedup.decontaminationCut(df, "doc_id", "text", pdf, "ptext",
          minLen, stride)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got === exp,
        s"case $case_ (minLen=$minLen stride=$stride) mismatch: docs=$docs probe=$probe")
      if (case_ == 1)
        assert(got.map(g => (g._1, g._2)) === docs,
          "empty probe must be the identity")
    }
  }
}
