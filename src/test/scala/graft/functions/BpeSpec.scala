package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- the algorithm itself (driver-side golden checks) --------------------

  test("merge table applies in order, left-to-right, non-overlapping") {
    // "lower": l o w e r → (l,o): [lo w e r] → (lo,w): [low e r] → (e,r): [low er]
    val merges = Vector(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(Bpe.countSegment("lower", merges) === 2)
    // non-overlapping: (a,a) on "aaaa" merges to [aa, aa], not [aa, a, a]
    assert(Bpe.countSegment("aaaa", Vector(("a", "a"))) === 2)
    // "aaa": first pair merges, scan resumes AFTER the merged symbol
    assert(Bpe.countSegment("aaa", Vector(("a", "a"))) === 2)
    // later merge consumes an earlier merge's output symbol
    assert(Bpe.countSegment("aaaa", Vector(("a", "a"), ("aa", "aa"))) === 1)
  }

  test("count over a document sums per-segment counts; empty text is 0") {
    val merges = Vector(("l", "o"), ("lo", "w"))
    // "low low" → segments ["low", " low"]: [low]=1, [" ",l,o,w]→[" ",low]=2
    assert(Bpe.countTokens("low low", merges) === 3)
    assert(Bpe.countTokens("", merges) === 0)
    // merges never cross segment boundaries: "42low" → ["42","low"] → 2 + 1
    assert(Bpe.countTokens("42low", Vector(("l", "o"), ("lo", "w"), ("2", "l"))) === 3)
  }

  test("learnMerges reproduces the classic Sennrich example ordering") {
    // corpus: low×5 lower×2 newest×6 widest×3 — (e,s) count 9 wins first,
    // then (es,t) 9, then the tie-break decides among count-7/8 pairs
    val hist = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.learnMerges(hist, 3)
    assert(m.take(2) === Vector(("e", "s"), ("es", "t")))
    // deterministic: same input, same table
    assert(Bpe.learnMerges(hist, 3) === m)
  }

  test("learnMerges stops when no pair repeats") {
    assert(Bpe.learnMerges(Map("ab" -> 1L, "cd" -> 1L), 10) === Vector.empty)
  }

  // ---- default table sanity ------------------------------------------------

  test("default merge table is non-trivial and bounds hold on real-ish text") {
    assert(Bpe.DefaultMerges.length === 100)
    val text = "the customer joins a small table for a big window query"
    val n = Bpe.countTokensDefault(text)
    val segments = Bpe.preTokenize(text)
    // merged count lies between segment count and code-point count
    assert(n >= segments.length)
    assert(n < text.length)
    // merging strictly compressed this sentence (table was trained on
    // corpus vocabulary like these words)
    assert(n < segments.map(_.length).sum)
  }

  // ---- Spark expression = driver-side algorithm ----------------------------

  test("bpe_count expression matches the driver-side count and handles null") {
    FinancialFunctions.registerAll(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "group by key, then join the stream to the table"),
      (3L, ""),
      (4L, "mixed 42 numbers & punctuation!!")
    ).toDF("doc_id", "text")
    val got = docs.selectExpr("doc_id", "bpe_count(text) AS n")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Map(
      1L -> Bpe.countTokensDefault("the quick brown fox jumps over the lazy dog"),
      2L -> Bpe.countTokensDefault("group by key, then join the stream to the table"),
      3L -> 0,
      4L -> Bpe.countTokensDefault("mixed 42 numbers & punctuation!!"))
    assert(got === want)

    val withNull = Seq((1L, Option("abc")), (2L, Option.empty[String])).toDF("id", "text")
    val rows = withNull.select(col("id"), BpeFunctions.bpeCount(col("text")).as("n"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && rows(1).isNullAt(1))
  }

  test("bpe_count rejects non-string input at analysis time") {
    FinancialFunctions.registerAll(spark)
    val e = intercept[Exception] {
      Seq(1).toDF("x").selectExpr("bpe_count(x)").collect()
    }
    assert(e.getMessage.contains("string"))
  }

  test("corpus precondition for the SQL oracle: no chr(31) in documents") {
    // the DuckDB replica frames symbols with chr(31); the gate is only
    // hash-exact while the corpus never contains that byte
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(docs.filter(col("text").contains("\u001f")).count() === 0)
  }
}
