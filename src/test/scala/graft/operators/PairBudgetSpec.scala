package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r13 candidate-pair budget ([[Guards.pairBudget]]): every
  * pair-emitting candidate generator must (a) return IDENTICAL results
  * with the budget engaged vs unbounded when under budget, and (b) fail
  * LOUDLY — naming the escape hatches — instead of materializing an
  * output-quadratic pair set when a flood pushes the predicted bucket
  * mass over `maxPairs`. The flood fixture mirrors the q_*_flood gates:
  * replica clusters whose true pair mass is C(m,2) per cluster. */
class PairBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 8 base docs × 6 tagged replicas = 48 docs, clusters of 6. */
  private def flood = {
    val base = (0 until 8).map { i =>
      (i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel " +
        s"india juliet kilo lima mike november oscar papa base$i tail$i")
    }.toDF("doc_id", "text")
    base.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(5))).as("r"))
      .select((col("doc_id") + col("r") * lit(1000L)).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" flood f"),
            col("r").cast("string"))).as("text"))
  }

  private def assertBudgetError(body: => Unit, op: String): Unit = {
    val e = intercept[Exception](body)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    val msgs = chain(e).filter(_ != null).mkString(" | ")
    assert(msgs.contains("maxPairs"),
      s"$op: expected the loud pair-budget message, got: $msgs")
    assert(msgs.contains(op), s"$op: error must name the operator: $msgs")
  }

  private def force(df: org.apache.spark.sql.DataFrame): Long =
    try df.count() finally graft.CacheScope.release()

  test("minhashNearDups: under-budget results identical to unbounded; over-budget fails loudly") {
    val d = flood
    val budgeted = Dedup.minhashNearDups(d, "doc_id", "text").collect().toSet
    graft.CacheScope.release()
    val unbounded = Dedup.minhashNearDups(d, "doc_id", "text",
      maxPairs = Guards.UnboundedPairs).collect().toSet
    graft.CacheScope.release()
    assert(budgeted === unbounded)
    assert(budgeted.nonEmpty, "flood must produce near-dup pairs")
    assertBudgetError(
      force(Dedup.minhashNearDups(d, "doc_id", "text", maxPairs = 10L)),
      "Dedup.minhashNearDups")
  }

  test("ngramJaccardPairs (direct and prefix plans): budget parity + loud failure") {
    val d = flood
    for (prefix <- Seq(false, true)) {
      val budgeted = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        prefixFilter = prefix).collect().toSet
      graft.CacheScope.release()
      val unbounded = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        prefixFilter = prefix, maxPairs = Guards.UnboundedPairs).collect().toSet
      graft.CacheScope.release()
      assert(budgeted === unbounded, s"prefixFilter=$prefix")
      assertBudgetError(
        force(Dedup.ngramJaccardPairs(d, "doc_id", "text",
          prefixFilter = prefix, maxPairs = 5L)),
        "Dedup.ngramJaccardPairs")
    }
  }

  test("containmentPairs: budget parity + loud failure") {
    val d = flood
    val budgeted = Dedup.containmentPairs(d, "doc_id", "text").collect().toSet
    graft.CacheScope.release()
    val unbounded = Dedup.containmentPairs(d, "doc_id", "text",
      maxPairs = Guards.UnboundedPairs).collect().toSet
    graft.CacheScope.release()
    assert(budgeted === unbounded)
    assertBudgetError(
      force(Dedup.containmentPairs(d, "doc_id", "text", maxPairs = 5L)),
      "Dedup.containmentPairs")
  }

  test("simhashPairs: budget parity + loud failure") {
    val fps = Dedup.simhash(flood, "doc_id", "text").cache()
    try {
      val budgeted = Dedup.simhashPairs(fps, "doc_id").collect().toSet
      val unbounded = Dedup.simhashPairs(fps, "doc_id",
        maxPairs = Guards.UnboundedPairs).collect().toSet
      assert(budgeted === unbounded)
      assert(budgeted.nonEmpty, "replica flood must collide simhash chunks")
      assertBudgetError(
        Dedup.simhashPairs(fps, "doc_id", maxPairs = 10L).count(),
        "Dedup.simhashPairs")
    } finally fps.unpersist()
  }

  test("editDistancePairs: bipartite budget parity + loud failure on a one-band flood") {
    // identical-length strings: every row lands in ONE length band
    val names = (0 until 40).map(i =>
      (i.toLong, f"name$i%02d")).toDF("id", "s")
    val budgeted = FuzzyJoin.editDistancePairs(names, "id", "s", maxDist = 2)
      .collect().toSet
    val unbounded = FuzzyJoin.editDistancePairs(names, "id", "s", maxDist = 2,
      maxPairs = Guards.UnboundedPairs).collect().toSet
    assert(budgeted === unbounded)
    assertBudgetError(
      FuzzyJoin.editDistancePairs(names, "id", "s", maxDist = 2,
        maxPairs = 10L).count(),
      "FuzzyJoin.editDistancePairs")
  }

  test("embeddingNearDupPairs (incl. multi-probe): budget parity + loud failure on a sign-bucket flood") {
    val vecs = (0 until 40).map { i =>
      // identical direction: every vector shares the sign bucket
      (i.toLong, Array.fill(8)(0.5f + (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val budgeted = Similarity.embeddingNearDupPairs(vecs, 0.9, signBits = 8)
      .collect().toSet
    val unbounded = Similarity.embeddingNearDupPairs(vecs, 0.9, signBits = 8,
      maxPairs = Guards.UnboundedPairs).collect().toSet
    assert(budgeted === unbounded && budgeted.nonEmpty)
    assertBudgetError(
      Similarity.embeddingNearDupPairs(vecs, 0.9, signBits = 8,
        maxPairs = 10L).count(),
      "Similarity.embeddingNearDupPairs")
    val mp = Similarity.embeddingNearDupPairsMultiProbe(vecs, 0.9, signBits = 8)
      .collect().toSet
    val mpU = Similarity.embeddingNearDupPairsMultiProbe(vecs, 0.9,
      signBits = 8, maxPairs = Guards.UnboundedPairs).collect().toSet
    assert(mp === mpU)
    assertBudgetError(
      Similarity.embeddingNearDupPairsMultiProbe(vecs, 0.9, signBits = 8,
        maxPairs = 10L).count(),
      "Similarity.embeddingNearDupPairsMultiProbe")
  }

  test("dhashPairs: budget parity + loud failure on an identical-hash flood") {
    val hashes = (0 until 40).map(i => (i.toLong, 0x1234567890abcL))
      .toDF("doc_id", "dhash")
    val budgeted = Multimodal.dhashPairs(hashes, "doc_id").collect().toSet
    val unbounded = Multimodal.dhashPairs(hashes, "doc_id",
      maxPairs = Guards.UnboundedPairs).collect().toSet
    assert(budgeted === unbounded && budgeted.size === 40 * 39 / 2)
    assertBudgetError(
      Multimodal.dhashPairs(hashes, "doc_id", maxPairs = 10L).count(),
      "Multimodal.dhashPairs")
  }

  test("tfidfCosinePairs: budget parity + loud failure on a shared-term flood") {
    val d = flood
    val budgeted = TextOps.tfidfCosinePairs(d, "doc_id", "text", 0.5)
      .collect().toSet
    graft.CacheScope.release()
    val unbounded = TextOps.tfidfCosinePairs(d, "doc_id", "text", 0.5,
      maxPairs = Guards.UnboundedPairs).collect().toSet
    graft.CacheScope.release()
    assert(budgeted === unbounded && budgeted.nonEmpty)
    assertBudgetError(
      force(TextOps.tfidfCosinePairs(d, "doc_id", "text", 0.5, maxPairs = 10L)),
      "TextOps.tfidfCosinePairs")
  }

  test("winnowOverlapPairs: budget parity + loud failure on a fingerprint flood") {
    val d = flood
    val budgeted = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      minLen = 12, noise = 8, minShared = 1).collect().toSet
    graft.CacheScope.release()
    val unbounded = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      minLen = 12, noise = 8, minShared = 1,
      maxPairs = Guards.UnboundedPairs).collect().toSet
    graft.CacheScope.release()
    assert(budgeted === unbounded && budgeted.nonEmpty,
      "flood replicas share fingerprints and must pair up")
    assertBudgetError(
      force(Dedup.winnowOverlapPairs(d, "doc_id", "text",
        minLen = 12, noise = 8, minShared = 1, maxPairs = 10L)),
      "Dedup.winnowOverlapPairs")
  }

  test("budget message names the cluster-path escape hatch") {
    val e = intercept[Exception](
      force(Dedup.minhashNearDups(flood, "doc_id", "text", maxPairs = 1L)))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    val msgs = chain(e).filter(_ != null).mkString(" | ")
    assert(msgs.contains("nearDupKeep") || msgs.contains("starNearDupClusters"))
    assert(msgs.contains("UnboundedPairs"))
  }
}
