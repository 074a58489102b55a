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

  test("hll: raw-branch accuracy within ~1.04/sqrt(m) error at 20k distinct") {
    val df = (1 to 20000).toDF("v")
    df.select(Hll.hllSketch(col("v"), 8).as("hsk"))
      .createOrReplaceTempView("hll_t")
    val est = spark.sql(
      s"SELECT ${Hll.estimateSql("hsk.sum_scaled", "hsk.zeros", 8)} AS e FROM hll_t")
      .head().getDouble(0)
    // sigma = 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.20, s"estimate $est")
  }

  test("hll: linear-counting branch is near-exact at low cardinality") {
    val df = (1 to 30).toDF("v")
    df.select(Hll.hllSketch(col("v"), 8).as("hsk"))
      .createOrReplaceTempView("hll_lc")
    val est = spark.sql(
      s"SELECT ${Hll.estimateSql("hsk.sum_scaled", "hsk.zeros", 8)} AS e FROM hll_lc")
      .head().getDouble(0)
    assert(math.abs(est - 30.0) < 3.0, s"linear-counting estimate $est")
  }

  test("hll registers are invariant under repartitioning (max-merge)") {
    val df = (1 to 5000).map(i => (i % 97, s"key_$i")).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame): Array[(Int, Long, Int)] =
      d.groupBy("g").agg(Hll.hllSketch(col("v"), 8).as("hsk"))
        .select(col("g"), col("hsk.sum_scaled"), col("hsk.zeros"))
        .orderBy("g").as[(Int, Long, Int)].collect()
    assert(run(df.coalesce(1)).sameElements(run(df.repartition(13))),
      "partial/merge path must give bit-identical registers")
  }

  test("hll: duplicates do not move the registers") {
    val once = (1 to 50).toDF("v")
      .select(Hll.hllSketch(col("v"), 8).as("h"))
      .select(col("h.sum_scaled"), col("h.zeros")).head()
    val dup = (1 to 10000).map(_ % 50 + 1).toDF("v")
      .select(Hll.hllSketch(col("v"), 8).as("h"))
      .select(col("h.sum_scaled"), col("h.zeros")).head()
    assert(once === dup)
  }

  test("hll: null inputs are ignored") {
    val df = Seq(Some(1), None, Some(2), None, Some(3)).toDF("v")
    val zeros = df.select(Hll.hllSketch(col("v"), 8).as("h"))
      .select(col("h.zeros")).head().getInt(0)
    assert(zeros === 253, "exactly 3 registers touched")
  }

  test("hll: p must be a literal in [4, 16]") {
    val df = (1 to 10).toDF("v")
    val e = intercept[Exception] {
      df.select(call_function("hll_sketch", Kmv.kmvHash(col("v")), col("v")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
    val e2 = intercept[Exception] {
      df.select(call_function("hll_sketch", Kmv.kmvHash(col("v")), lit(3)))
        .collect()
    }
    assert(e2.getMessage.contains("[4, 16]"))
  }

  test("hll rollup identity: merged per-group register blobs == direct sketch") {
    val df = (1 to 5000).map(i => (i % 7, s"key_${i % 1200}")).toDF("src", "v")
    def stats(d: org.apache.spark.sql.DataFrame) =
      d.select(col("h.sum_scaled"), col("h.zeros")).head()
    val direct = stats(df.select(Hll.hllSketch(col("v"), 8).as("h")))
    val rolled = stats(df.groupBy("src")
      .agg(Hll.hllRegisters(col("v"), 8).as("regs"))
      .select(Hll.hllMerge(col("regs"), 8).as("h")))
    assert(direct === rolled, "blob rollup must be bit-identical to direct")
    val rolled13 = stats(df.repartition(13).groupBy("src")
      .agg(Hll.hllRegisters(col("v"), 8).as("regs"))
      .select(Hll.hllMerge(col("regs"), 8).as("h")))
    assert(rolled === rolled13, "rollup must be layout-independent")
  }

  test("hll_registers blob is exactly m bytes; hll_merge rejects a p mismatch") {
    val blob = (1 to 100).toDF("v")
      .select(Hll.hllRegisters(col("v"), 8).as("r"))
      .head().getAs[Array[Byte]](0)
    assert(blob.length === 256)
    val regs = (1 to 10).toDF("v")
      .agg(Hll.hllRegisters(col("v"), 6).as("regs"))
    val e = intercept[Exception] {
      regs.select(Hll.hllMerge(col("regs"), 8)).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(e).contains("expected m="),
      s"wrong error: ${messages(e).take(300)}")
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
