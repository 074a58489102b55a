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

  test("streaming micro-batches fold into the summary a full recompute would give") {
    // the production wiring: each foreachBatch merges its batch's partials
    // into the stored summary — the summary after the last batch must
    // equal aggregating the whole stream at once
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val summarySchema = IncrementalAgg.partials(rows().select(
      col("grp"), col("v")), Seq("grp"), "v").schema
    var stored = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], summarySchema)
    val query = input.toDF().toDF("grp", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val p = IncrementalAgg.partials(batch, Seq("grp"), "v")
        // materialize THIS batch's rows — the batch frame dies with the batch
        stored = spark.createDataFrame(
          spark.sparkContext.parallelize(
            IncrementalAgg.merge(Seq(stored, p), Seq("grp")).collect().toSeq),
          summarySchema)
        ()
      }.start()
    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 2.0))
      query.processAllAvailable()
      input.addData(("a", 5.0), ("c", 7.0))
      query.processAllAvailable()
      input.addData(("b", 4.0))
      query.processAllAvailable()
      val full = IncrementalAgg.partials(
        Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("a", 5.0), ("c", 7.0),
          ("b", 4.0)).toDF("grp", "v"), Seq("grp"), "v")
      assert(stored.exceptAll(full).isEmpty && full.exceptAll(stored).isEmpty)
    } finally query.stop()
  }

  test("partials aggregate map-side (partial functions below the exchange)") {
    val p = IncrementalAgg.partials(rows(), Seq("grp"), "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"expected map-side partial aggregation:\n$p")
  }
}
