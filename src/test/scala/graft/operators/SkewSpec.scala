package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // heavily skewed: 90% of rows share one key
  private lazy val skewed = (1 to 2000).map { i =>
    val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
    (i.toLong, k, (i % 100).toDouble)
  }.toDF("row_id", "key", "value")

  test("twoStageAgg equals the direct aggregation on skewed keys") {
    val direct = skewed.groupBy("key")
      .agg(sum("value").as("sum_value"), count("value").as("count_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.twoStageAgg(skewed, Seq("key"), "row_id",
      Seq("value" -> "sum", "value" -> "count", "value" -> "min", "value" -> "max"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted === direct)
  }

  test("saltedJoin equals the plain join, including duplicate build keys") {
    val build = Seq(("hot", "H1"), ("hot", "H2"), ("k1", "A"), ("k3", "B"))
      .toDF("key", "tag")
    val plain = skewed.join(build, Seq("key"))
      .select("row_id", "key", "tag").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, build, Seq("key"), "row_id")
      .select("row_id", "key", "tag").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(Skew.saltedJoin(skewed, build, Seq("key"), "row_id").count() ===
      skewed.join(build, Seq("key")).count()) // multiplicities too
  }

  test("twoStageAgg rejects non-algebraic aggregates") {
    intercept[IllegalArgumentException] {
      Skew.twoStageAgg(skewed, Seq("key"), "row_id", Seq("value" -> "avg"))
    }
  }

  test("keyReport: hand-computed shares, skew ratios, heavy flag, topK cut") {
    // a×6, b×2, c×1, d×1 → total 10, 4 keys, uniform mean 2.5
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.toDF("key", "i")
    val out = Skew.keyReport(df, Seq("key"), topK = 3, heavyFactor = 2.0)
      .orderBy("rank").collect()
    assert(out.length === 3) // d cut by topK
    val a = out(0)
    assert(a.getAs[String]("key") === "a" && a.getAs[Long]("cnt") === 6L)
    assert(a.getAs[Double]("share") === 0.6)
    assert(a.getAs[Double]("skew") === 2.4) // 6·4/10
    assert(a.getAs[Boolean]("heavy"))
    val b = out(1)
    assert(b.getAs[String]("key") === "b" && b.getAs[Double]("skew") === 0.8)
    assert(!b.getAs[Boolean]("heavy"))
    // count ties rank deterministically by key
    assert(out(2).getAs[String]("key") === "c")
  }
}
