package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FreqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog")
  ).toDF("doc_id", "text")

  test("vocabulary: exact counts, cnt-desc then token-asc order") {
    val v = Freq.vocabulary(docs, "text", 4).as[(String, Long)].collect()
    assert(v.take(2) === Array(("the", 3L), ("a", 2L)))
    // cat/dog/sat all tie at 2 — token order decides
    assert(v(2) === ("cat", 2L) && v(3) === ("dog", 2L))
  }

  test("cms estimates are >= exact counts (overestimate-only)") {
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val sketch = Freq.countMinSketch(toks, "token", depth = 4, width = 64)
    val items = exact.keys.toSeq.toDF("token")
    val est = Freq.cmsEstimate(sketch, items, "token", depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"cms must never underestimate: $t est=${est(t)} exact=$c")
    }
  }

  test("with a wide grid the estimates are exact (no collisions)") {
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    val sketch = Freq.countMinSketch(toks, "token", depth = 4, width = 4096)
    val items = Seq("the", "cat", "mat").toDF("token")
    val est = Freq.cmsEstimate(sketch, items, "token", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(est === Map("the" -> 3L, "cat" -> 2L, "mat" -> 1L))
  }

  test("unknown items estimate to zero (or collision noise), never null") {
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    val sketch = Freq.countMinSketch(toks, "token", depth = 4, width = 4096)
    val est = Freq.cmsEstimate(sketch, Seq("zzz_unseen").toDF("token"),
      "token", depth = 4, width = 4096).as[(String, Long)].collect()
    assert(est === Array(("zzz_unseen", 0L)))
  }

  test("sketch grid is bounded by depth*width regardless of input size") {
    val big = (1 to 20000).map(i => s"tok$i").toDF("v")
    val sketch = Freq.countMinSketch(big, "v", depth = 4, width = 128)
    assert(sketch.count() <= 4 * 128)
  }

  test("invertedIndex: df counts and doc-sorted doc:tf postings") {
    val idx = Freq.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(idx("the") === (2L, "1:2 2:1"))
    assert(idx("cat") === (2L, "1:1 3:1"))
    assert(idx("a") === (1L, "3:2"))
  }

  test("invertedIndex: minDf prunes the hapax tail") {
    val idx = Freq.invertedIndex(docs, "doc_id", "text", minDf = 2L)
      .select("term").as[String].collect().toSet
    assert(idx === Set("the", "cat", "dog", "sat"))
    intercept[IllegalArgumentException] {
      Freq.invertedIndex(docs, "doc_id", "text", minDf = 0L)
    }
  }

  test("associationRules: textbook support/confidence/lift") {
    // baskets: {m,b}, {m,b,e}, {b,e}, {m} → N=4
    // sup(m)=3, sup(b)=3, sup(e)=2, sup(m,b)=2, sup(b,e)=2, sup(m,e)=1
    val rows = Seq((1L, "m"), (1L, "b"), (2L, "m"), (2L, "b"), (2L, "e"),
      (3L, "b"), (3L, "e"), (4L, "m"))
    val df = rows.toDF("basket", "item")
    val out = Freq.associationRules(df, "basket", "item", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("sup_pair"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift")))).toMap
    // (m,e) has support 1 < 2 → no rule in either direction
    assert(out.keySet === Set(("m", "b"), ("b", "m"), ("b", "e"), ("e", "b")))
    assert(out(("m", "b")) === ((2L, 2.0 / 3.0, 2.0 * 4.0 / (3.0 * 3.0))))
    assert(out(("b", "m")) === ((2L, 2.0 / 3.0, 8.0 / 9.0)))
    assert(out(("e", "b")) === ((2L, 1.0, 2.0 * 4.0 / (2.0 * 3.0))))
  }

  test("associationRules: duplicate (basket,item) rows count once") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("basket", "item")
    val out = Freq.associationRules(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("sup_ante"))).toMap
    assert(out("x") === 2L, "dup rows must not inflate supports")
  }

  test("associationRules: infrequent items prune before the pair join") {
    val df = Seq((1L, "hot"), (1L, "cold"), (2L, "hot"), (2L, "cold"),
      (3L, "hot"), (3L, "rare")).toDF("basket", "item")
    val out = Freq.associationRules(df, "basket", "item", minSupport = 2L)
    assert(out.collect().map(_.getString(0)).toSet === Set("hot", "cold"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"equi-joins only:\n$plan")
  }
}
