package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // big side: 5000 facts over 500 keys, some with a null key
  private lazy val big = (1 to 5000).map { i =>
    (i.toLong, if (i % 100 == 0) None else Some((i % 500).toLong), i * 1.5)
  }.toDF("fact_id", "key", "amount")

  // small side: 40 keys, one duplicated (semi/anti must not multiply rows)
  private lazy val small = ((1 to 40).map(i => (i * 7).toLong) :+ 7L)
    .toDF("k")

  test("semiJoin is bit-identical to the plain left-semi join") {
    val plain = big.join(small, big("key") === small("k"), "leftsemi")
      .collect().map(_.toSeq).toSet
    val bloom = BloomJoin.semiJoin(big, "key", small, "k",
      expectedItems = 64, fpp = 0.05)
      .collect().map(_.toSeq).toSet
    assert(bloom === plain)
    assert(bloom.nonEmpty)
  }

  test("antiJoin is bit-identical to the plain left-anti join, nulls kept") {
    val plain = big.join(small, big("key") === small("k"), "leftanti")
      .collect().map(_.toSeq).toSet
    val bloom = BloomJoin.antiJoin(big, "key", small, "k",
      expectedItems = 64, fpp = 0.05)
      .collect().map(_.toSeq).toSet
    assert(bloom === plain)
    // null big-side keys never match => left-anti keeps them
    assert(bloom.exists(_(1) == null))
  }

  test("undersized filter (high fpp) stays exact") {
    // expectedItems far below the true distinct count: the filter saturates,
    // passes nearly everything, and the exact join still corrects it
    val plain = big.join(small, big("key") === small("k"), "leftsemi")
      .collect().map(_.toSeq).toSet
    val bloom = BloomJoin.semiJoin(big, "key", small, "k",
      expectedItems = 2, fpp = 0.5)
      .collect().map(_.toSeq).toSet
    assert(bloom === plain)
  }

  test("the filter predicate lands in the big-side scan stage") {
    // a file-backed big side: over a LocalRelation the optimizer folds the
    // filter at plan time (ConvertToLocalRelation), which hides it from the
    // executed plan without changing semantics
    val dir = java.nio.file.Files.createTempDirectory("bloomjoin").toString
    big.write.mode("overwrite").parquet(dir)
    val bigFs = spark.read.parquet(dir)
    val df = BloomJoin.semiJoin(bigFs, "key", small, "k", expectedItems = 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain filter in the plan:\n$plan")
  }

  test("anti join splits: definite-no rows bypass the join") {
    // the union branch shape: every input row appears exactly once
    val out = BloomJoin.antiJoin(big, "key", small, "k", expectedItems = 64)
    assert(out.groupBy("fact_id").count().filter(col("count") > 1).count() === 0L)
  }

  test("empty small side matches the plain joins: semi empty, anti keeps all") {
    val none = small.filter(lit(false))
    assert(BloomJoin.semiJoin(big, "key", none, "k").count() === 0L)
    val anti = BloomJoin.antiJoin(big, "key", none, "k")
      .collect().map(_.toSeq).toSet
    val plain = big.join(none, big("key") === none("k"), "leftanti")
      .collect().map(_.toSeq).toSet
    assert(anti === plain)
    assert(anti.size === 5000)
  }

  test("a misspelled key column fails analysis even when the small side is empty") {
    // the empty-small-side short-circuits never reference the keys; the
    // up-front resolution must still surface the error
    val none = small.filter(lit(false))
    intercept[org.apache.spark.sql.AnalysisException] {
      BloomJoin.semiJoin(big, "no_such_col", none, "k")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      BloomJoin.antiJoin(big, "key", none, "no_such_col")
    }
  }

  test("optimalNumBits matches the standard Bloom sizing formula") {
    // n=1000, p=0.03 -> ~ -1000 ln(0.03)/ln(2)^2 ~= 7298 bits
    val bits = BloomJoin.optimalNumBits(1000, 0.03)
    assert(bits > 7200 && bits < 7400)
    intercept[IllegalArgumentException] { BloomJoin.optimalNumBits(0, 0.03) }
    intercept[IllegalArgumentException] { BloomJoin.optimalNumBits(10, 1.5) }
  }
}
