package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "kitten"), (1L, "sitting"), (2L, "kitchen"),
    (3L, "mitten"), (4L, "flask"), (5L, "flasks"),
    (6L, "a"), (7L, "ab"), (8L, "abcdefghij")
  ).toDF("id", "text")

  test("editDistancePairs: matches brute force exactly (blocking completeness)") {
    for (d <- 1 to 3) {
      val got = FuzzyJoin.editDistancePairs(corpus, "id", "text", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val a = corpus.select(col("id").as("ia"), col("text").as("ta"))
      val b = corpus.select(col("id").as("ib"), col("text").as("tb"))
      val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
        .withColumn("d", levenshtein(col("ta"), col("tb")))
        .filter(col("d") <= d)
        .collect().map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"),
          r.getAs[Int]("d"))).toSet
      assert(got === brute, s"maxDist=$d")
      // no duplicate pair rows (one-directional emit, not distinct)
      val n = FuzzyJoin.editDistancePairs(corpus, "id", "text", d).count()
      assert(n === got.size.toLong)
    }
  }

  test("editDistancePairs: known distances survive") {
    val got = FuzzyJoin.editDistancePairs(corpus, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((0L, 3L)) === 1) // kitten→mitten
    assert(got((0L, 1L)) === 3) // kitten→sitting
    assert(got((4L, 5L)) === 1) // flask→flasks
    assert(got((6L, 7L)) === 1) // a→ab
    assert(!got.contains((0L, 8L)))
  }

  test("bestMatch: smallest distance wins, ties to the smallest right id") {
    val left = Seq((100L, "kitten")).toDF("id", "text")
    val right = Seq((0L, "mitten"), (1L, "bitten"), (2L, "kitchen"))
      .toDF("id", "text")
    // mitten and bitten both distance 1 → tie to id 0
    val out = FuzzyJoin.bestMatch(left, right, "id", "text", maxDist = 2)
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 100L)
    assert(out.head.getLong(1) === 0L)
    assert(out.head.getInt(2) === 1)
  }

  test("bestMatch: excludeSelf and no-match-absent semantics") {
    val out = FuzzyJoin.bestMatch(corpus, corpus, "id", "text",
        maxDist = 1, excludeSelf = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(0L) === ((3L, 1)))   // kitten→mitten
    assert(out(3L) === ((0L, 1)))   // mitten→kitten
    assert(out(4L) === ((5L, 1)))
    assert(!out.contains(8L))       // abcdefghij has no match within 1
  }

  test("bestMatch aggregation stays hash-based (no SortAggregate)") {
    val plan = FuzzyJoin.bestMatch(corpus, corpus, "id", "text",
        maxDist = 1, excludeSelf = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"),
      s"packed-long argmin must hash-aggregate:\n$plan")
  }

  test("fellegiSunter: folded log2 weights, NULL = 0, class thresholds") {
    val ln2 = math.log(2.0)
    // mirror the operator's trees exactly: 1.0 - 0.8 is NOT the double
    // 0.2 (it is 0.19999999999999996) — the complement must be computed,
    // not written as a literal
    val wa1 = math.log(0.9 / 0.3) / ln2
    val wd1 = math.log((1.0 - 0.9) / (1.0 - 0.3)) / ln2
    val wa2 = math.log(0.8 / 0.2) / ln2
    val wd2 = math.log((1.0 - 0.8) / (1.0 - 0.2)) / ln2
    val rows = Seq(
      (1L, Some(true), Some(true)), (2L, Some(true), Some(false)),
      (3L, None, Some(true)), (4L, Some(false), Some(false)))
    val out = FuzzyJoin.fellegiSunter(rows.toDF("pid", "f1", "f2"),
        Seq("f1", "f2"), Seq((0.9, 0.3), (0.8, 0.2)),
        upper = 3.0, lower = -1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("fs_weight"), r.getAs[String]("fs_class"))).toMap
    assert(out(1L) === ((wa1 + wa2, "match")))
    assert(out(2L) === ((wa1 + wd2, "possible")))
    assert(out(3L) === ((0.0 + wa2, "possible")))
    assert(out(4L) === ((wd1 + wd2, "nonmatch")))
  }

  test("fellegiSunter: m <= u and size-mismatch fail loudly") {
    val df = Seq((1L, true)).toDF("pid", "f1")
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(df, Seq("f1"), Seq((0.2, 0.8)), 1.0, 0.0)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(df, Seq("f1"), Seq((0.9, 0.3), (0.8, 0.2)),
        1.0, 0.0)
    }
  }
}
