package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows() = Seq(
    ("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 2.0), ("b", 4.0), ("c", 7.0)
  ).zipWithIndex.map { case ((g, v), i) => (g, v, i) }.toDF("grp", "v", "i")

  test("merge of arbitrary batch partials equals the full recompute") {
    val df = rows()
    val full = IncrementalAgg.partials(df, Seq("grp"), "v")
    // three uneven batches, one empty
    val merged = IncrementalAgg.merge(Seq(
      IncrementalAgg.partials(df.filter(col("i") < 2), Seq("grp"), "v"),
      IncrementalAgg.partials(df.filter(col("i") === 2), Seq("grp"), "v"),
      IncrementalAgg.partials(df.filter(col("i") > 2), Seq("grp"), "v"),
      IncrementalAgg.partials(df.filter(lit(false)), Seq("grp"), "v")
    ), Seq("grp"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("derived avg reads from carried sums; nulls don't distort it") {
    val df = Seq(("a", Some(2.0)), ("a", None), ("a", Some(4.0)))
      .toDF("grp", "v").withColumn("i", lit(0))
    val out = IncrementalAgg.withDerived(
      IncrementalAgg.partials(df, Seq("grp"), "v")).collect()(0)
    assert(out.getAs[Long]("n") === 2L) // the NULL is not a value
    assert(out.getAs[Double]("avg_v") === 3.0)
  }

  test("partials aggregate map-side (partial functions below the exchange)") {
    val p = IncrementalAgg.partials(rows(), Seq("grp"), "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"expected map-side partial aggregation:\n$p")
  }
}
