package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"g${i % 7}")).toDF("id", "grp")

  test("assign: exhaustive and disjoint — every key lands in exactly one split") {
    val out = Split.assign(docs(2000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.filter(col("split").isNull).count() === 0)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    // rates are approximate but must be in the right ballpark
    assert(counts("train") > 1400 && counts("train") < 1900)
    assert(counts("val") > 20 && counts("test") > 20)
  }

  test("assign: membership is a pure function of the key — layout-independent") {
    val splits = Seq("a" -> 0.5, "b" -> 0.5)
    val once = Split.assign(docs(500), "id", splits)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = Split.assign(docs(500).repartition(13), "id", splits)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once === again)
  }

  test("assign on a group key: whole groups move together (leakage-safe)") {
    val out = Split.assign(docs(2000), "grp",
      Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2))
    val violations = out.groupBy("grp")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(violations === 0)
  }

  test("assign: fractions must be positive and sum to 1") {
    intercept[IllegalArgumentException] {
      Split.assign(docs(10), "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Split.assign(docs(10), "id", Seq("a" -> 1.5, "b" -> -0.5))
    }
  }

  test("kfold: folds cover [0, k), deterministic, every row assigned") {
    val out = Split.kfold(docs(1000), "id", k = 5)
    assert(out.filter(col("fold").isNull || col("fold") < 0 || col("fold") >= 5)
      .count() === 0)
    val sizes = out.groupBy("fold").count().collect().map(_.getLong(1))
    assert(sizes.length === 5 && sizes.sum === 1000L)
    assert(sizes.min > 100) // roughly uniform
  }

  test("assign plans no shuffle — a scan-side projection") {
    val p = Split.assign(docs(100), "id", Seq("a" -> 1.0))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"split must not shuffle:\n$p")
  }
}
