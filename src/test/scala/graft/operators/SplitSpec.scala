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

  test("shuffleShards: a reproducible permutation — dense ranks, layout-independent") {
    val out = Split.shuffleShards(docs(200), "id", numShards = 4)
    // every row assigned; ranks are dense 1..n within each shard
    assert(out.filter(col("shard").isNull || col("shard") < 0 || col("shard") >= 4)
      .count() === 0)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("shuffle_rank").as("mx"))
      .collect()
    perShard.foreach(r => assert(r.getAs[Long]("n") === r.getAs[Long]("mx")))
    // identical permutation under a different input layout
    val again = Split.shuffleShards(docs(200).repartition(17), "id", 4)
      .select("id", "shard", "shuffle_rank").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val once = out.select("id", "shard", "shuffle_rank").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(once === again)
    // and it is not the identity order (it actually shuffles)
    val shard0 = out.filter(col("shard") === 0).orderBy("shuffle_rank")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(shard0 !== shard0.sorted)
  }

  test("purgedTimeFolds: hand-checked windows, embargo, and exhaustiveness") {
    // ts 0..9, k=2, embargo=2: span=10, fold-0 window [0,5) (end=5),
    // fold-1 window [5,10) (end=10)
    val df = (0L until 10L).map(t => (t, t)).toDF("id", "ts")
    val out = Split.purgedTimeFolds(df, "ts", k = 2, embargo = 2L)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getString(3)).toMap
    assert(out.size === 20) // every row appears once per fold
    (0L to 4L).foreach(t => assert(out((t, 0)) === "test"))
    assert(out((5L, 0)) === "embargo")
    assert(out((6L, 0)) === "embargo")
    (7L to 9L).foreach(t => assert(out((t, 0)) === "train"))
    (5L to 9L).foreach(t => assert(out((t, 1)) === "test"))
    (0L to 4L).foreach(t => assert(out((t, 1)) === "train")) // no pre-window embargo
  }

  test("purgedTimeFolds: embargo=0 emits no embargo rows; layout-independent") {
    val df = (0L until 100L).map(t => (t, t * 3 % 97)).toDF("id", "ts")
    val none = Split.purgedTimeFolds(df, "ts", k = 4, embargo = 0L)
    assert(none.filter(col("role") === "embargo").count() === 0)
    val once = Split.purgedTimeFolds(df, "ts", k = 4, embargo = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getString(3)).toMap
    val again = Split.purgedTimeFolds(df.repartition(13), "ts", k = 4, embargo = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getString(3)).toMap
    assert(once === again)
    // each fold has exactly one contiguous test window covering all rows once
    val testCounts = Split.purgedTimeFolds(df, "ts", k = 4, embargo = 5L)
      .filter(col("role") === "test").groupBy("id").count()
      .filter(col("count") =!= 1).count()
    assert(testCounts === 0, "every row must be test in exactly one fold")
  }

  test("clusterSafeAssign: near-dup clusters never straddle the held-out set") {
    // 40 distinct 12-word docs; every 4th gets two near-copies (one word
    // appended -> word-3-gram jaccard ~0.9, well above the 0.5 threshold)
    val base = (0 until 40).map { i =>
      (i.toLong * 10, (0 until 12).map(j => s"w${i}_$j").mkString(" "))
    }
    val dups = (0 until 40 by 4).flatMap { i =>
      Seq((i.toLong * 10 + 1, base(i)._2 + " extra"),
          (i.toLong * 10 + 2, base(i)._2 + " tail"))
    }
    val df = (base ++ dups).toDF("doc_id", "text")
    val out = Split.clusterSafeAssign(df, "doc_id", "text",
      Seq("train" -> 0.7, "test" -> 0.3))
    assert(out.columns.toSeq === Seq("doc_id", "text", "split"),
      "no internal columns may leak")
    // one action materializes the assignment (the cluster pipeline's
    // localCheckpoint blocks do not survive CacheScope.release, so no
    // further actions run on `out` after it)
    val assigned = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.CacheScope.release()
    assert(assigned.size === (base ++ dups).length)
    assert(assigned.values.forall(s => s == "train" || s == "test"))
    val compRows = Dedup.nearDupClusters(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    graft.CacheScope.release()
    val straddle = compRows.groupBy(_._2)
      .count { case (_, members) => members.map(m => assigned(m._1)).distinct.size > 1 }
    assert(straddle === 0, "a near-dup cluster straddles train/test")
    // fixture sanity: the planted near-dups actually clustered
    assert(compRows.map(_._2).distinct.length >= 5)
  }

  test("assign plans no shuffle — a scan-side projection") {
    val p = Split.assign(docs(100), "id", Seq("a" -> 1.0))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"split must not shuffle:\n$p")
  }
}
