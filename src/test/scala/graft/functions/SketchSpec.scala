package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kmv is exact below k and close above k") {
    // 40 distinct values, k = 64 → sketch holds them all, estimate is exact
    val small = (1 to 200).map(i => i % 40).toDF("v")
    val exact = small.select(Kmv.kmvDistinct(col("v"), 64).as("e"))
      .head().getDouble(0)
    assert(exact === 40.0)

    // 20_000 distinct values, k = 256 → KMV standard error ~ 1/sqrt(k-2) ≈ 6%
    val big = (1 to 20000).toDF("v")
    val est = big.select(Kmv.kmvDistinct(col("v"), 256).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20,
      s"estimate $est too far from 20000")
  }

  test("kmv estimate is invariant under repartitioning (map-side merge)") {
    val df = (1 to 5000).map(i => (i % 97, s"key_$i")).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame): Array[(Int, Double)] =
      d.groupBy("g").agg(Kmv.kmvDistinct(col("v"), 128).as("e"))
        .orderBy("g").as[(Int, Double)].collect()
    val one = run(df.coalesce(1))
    val many = run(df.repartition(13))
    assert(one.sameElements(many),
      "partial/merge path must give bit-identical estimates to the single-partition path")
  }

  test("duplicates do not inflate the sketch") {
    val df = (1 to 10000).map(i => i % 50).toDF("v")
    val est = df.select(Kmv.kmvDistinct(col("v"), 256).as("e")).head().getDouble(0)
    assert(est === 50.0)
  }

  test("null hashes are ignored") {
    val df = Seq(Some(1), None, Some(2), None, Some(3)).toDF("v")
    val est = df.select(Kmv.kmvDistinct(col("v"), 16).as("e")).head().getDouble(0)
    assert(est === 3.0)
  }

  test("k must be a positive integer literal") {
    val df = (1 to 10).toDF("v")
    val e = intercept[Exception] {
      df.select(call_function("kmv_distinct", Kmv.kmvHash(col("v")), col("v")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
    val e2 = intercept[Exception] {
      df.select(call_function("kmv_distinct", Kmv.kmvHash(col("v")), lit(1)))
        .collect()
    }
    assert(e2.getMessage.contains("k must be > 1"))
  }

  test("sql surface: kmv_distinct resolves through the registry") {
    (1 to 1000).map(i => s"u$i").toDF("v").createOrReplaceTempView("kmv_t")
    val est = spark.sql(
      """SELECT kmv_distinct(
        |  cast(conv(substring(md5(cast(v AS string)), 1, 15), 16, 10) AS bigint), 64) AS e
        |FROM kmv_t""".stripMargin).head().getDouble(0)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.35)
  }
}
