package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val base = "/tmp/graft_bucketed_spec"

  private def writeBoth(buckets: Int): Unit = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    Bucketed.writeBucketed(orders, "bs_orders", "custkey", buckets, s"$base/bs_orders")
    Bucketed.writeBucketed(customer, "bs_customer", "custkey", buckets, s"$base/bs_customer")
  }

  test("co-bucketed join plans NO shuffle on either side") {
    writeBoth(buckets = 4)
    // forbid broadcast so the bucketed SortMergeJoin path is what's planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.cobucketedJoin(spark, "bs_orders", "bs_customer", "custkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      // sortBy at write time: bucket files are pre-sorted, so the SMJ's Sort
      // nodes read already-ordered buckets (Spark still inserts the Sort
      // operator; the win asserted here is the absent Exchange)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain parquet join") {
    writeBoth(buckets = 4)
    val bucketed = Bucketed.cobucketedJoin(spark, "bs_orders", "bs_customer", "custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .orderBy("c_mktsegment").collect()
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .orderBy("c_mktsegment").collect()
    assert(bucketed.sameElements(plain))
  }

  test("partitioned layout: a partition-column filter prunes directories") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Bucketed.writePartitioned(docs, s"$base/docs_by_lang", Seq("lang"))
    val read = spark.read.parquet(s"$base/docs_by_lang").filter(col("lang") === "en")
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"expected the lang filter as a PartitionFilter on the scan:\n$p")
    // pruned scan must still return exactly the en documents
    assert(read.count() === docs.filter(col("lang") === "en").count())
    // and the data filter list must NOT contain lang (it never reaches rows)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
    assert(!pushed.contains("lang"), s"lang must be partition-pruned, not row-filtered: $pushed")
  }

  test("mismatched bucket counts still join correctly (with a shuffle)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    Bucketed.writeBucketed(orders, "bs_orders8", "custkey", 8, s"$base/bs_orders8")
    Bucketed.writeBucketed(customer, "bs_customer4", "custkey", 4, s"$base/bs_customer4")
    val n = Bucketed.cobucketedJoin(spark, "bs_orders8", "bs_customer4", "custkey").count()
    val expected = orders.join(customer, Seq("custkey")).count()
    assert(n === expected)
  }
}
