package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("rate bounds: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(ids, "id", 0.0).count() === 0)
    assert(Sampling.hashSample(ids, "id", 1.0).count() === 2000)
  }

  test("sample size tracks the rate and is partitioning-independent") {
    val n = Sampling.hashSample(ids, "id", 0.3).count()
    assert(math.abs(n - 600.0) / 600.0 < 0.15, s"got $n for rate 0.3")
    val n2 = Sampling.hashSample(ids.repartition(17), "id", 0.3).count()
    assert(n === n2)
  }

  test("nested: a lower-rate sample is a subset of a higher-rate sample") {
    val lo = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    val hi = Sampling.hashSample(ids, "id", 0.4).as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("consistent: the same key set survives in two different tables") {
    val a = Sampling.hashSample(ids, "id", 0.25).as[Long].collect().toSet
    val other = ids.withColumn("payload", col("id") * 2)
    val b = Sampling.hashSample(other, "id", 0.25)
      .select("id").as[Long].collect().toSet
    assert(a === b, "samples keyed identically must be joinable")
  }

  test("stratified: per-stratum rates apply; default covers the rest") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val out = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 0.5)
    val bySt = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(bySt("a") === 1000)
    assert(!bySt.contains("b"))
    assert(math.abs(bySt("c") - 500.0) / 500.0 < 0.2, s"got ${bySt.get("c")}")
  }

  test("mixCorpora: weights act per source; union preserves schema") {
    val src1 = (1L to 1000L).map((_, "s1")).toDF("id", "src")
    val src2 = (1001L to 2000L).map((_, "s2")).toDF("id", "src")
    val mixed = Sampling.mixCorpora(Seq((src1, 1.0), (src2, 0.2)), "id")
    val counts = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("s1") === 1000)
    assert(math.abs(counts("s2") - 200.0) / 200.0 < 0.35, s"got ${counts.get("s2")}")
  }

  test("the sampling filter reaches the scan as a data filter, not a shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Sampling.hashSample(docs, "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must be exchange-free:\n$p")
  }

  test("weightedSample: k rows, deterministic, partitioning-independent") {
    val df = (1L to 2000L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 50).select("id")
      .as[Long].collect().toSet
    assert(a.size === 50)
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(a === b, "the draw must not depend on partitioning")
  }

  test("weightedSample: heavier rows win more slots") {
    // two strata, weight 100 vs 1: the sample should be dominated by heavy ids
    val df = (1L to 1000L).map(i => (i, if (i <= 500) 100.0 else 1.0))
      .toDF("id", "w")
    val heavy = Sampling.weightedSample(df, "id", "w", 100)
      .filter(col("id") <= 500).count()
    assert(heavy > 80, s"expected heavy stratum to dominate, got $heavy/100")
  }

  test("weightedSample: fails loudly on non-positive or NULL weights") {
    val bad = Seq((1L, 2.0), (2L, 0.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(bad, "id", "w", 1).collect()
    }
    assert(e.getMessage.contains("positive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("positive weight")))
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(bad, "id", "w", 0)
    }
  }

  test("weightedSample plans a TakeOrdered, not a global sort") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    val p = Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("samplePerGroup: exactly min(n, |group|) per group, partitioning-invariant") {
    val df = ((1L to 100L).map(i => (i, "big")) ++ (101L to 105L).map(i => (i, "small")))
      .toDF("id", "grp")
    val out = Sampling.samplePerGroup(df, "id", "grp", n = 10)
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 10L, "small" -> 5L))
    // ranks are 1..n contiguous within each group
    assert(out.filter(col("grp") === "big").select("rank").as[Long]
      .collect().sorted.toSeq === (1L to 10L))
    // same sample regardless of layout — the determinism contract
    val re = Sampling.samplePerGroup(df.repartition(7), "id", "grp", n = 10)
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty)
  }

  test("temperatureRates: τ=1 keeps natural proportions, τ=0 mixes uniformly") {
    val df = ((1 to 800).map(i => (i.toLong, "big")) ++
      (1001 to 1200).map(i => (i.toLong, "small"))).toDF("id", "src")
    // τ=1 → every stratum samples at the same rate T/N
    val t1 = Sampling.temperatureRates(df, "src", tau = 1.0, targetRows = 500L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rate")).toMap
    assert(t1("big") === t1("small"))
    assert(math.abs(t1("big") - 0.5) < 1e-9)
    // τ=0 → uniform mixture: the small stratum gets the higher rate
    val t0 = Sampling.temperatureRates(df, "src", tau = 0.0, targetRows = 500L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rate")).toMap
    assert(t0("small") > t0("big"))
    assert(math.abs(t0("small") - 1.0) < 1e-9) // min(1, 250/200) clips
    // expected sample size tracks the target when nothing clips
    val t5 = Sampling.temperatureRates(df, "src", tau = 0.5, targetRows = 500L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Double]("rate")))
    val expected = t5.map { case (_, n, rate) => n * rate }.sum
    assert(math.abs(expected - 500.0) < 1.0)
  }

  test("temperatureSample: deterministic membership on any layout") {
    val df = ((1 to 300).map(i => (i.toLong, "a")) ++
      (2001 to 2100).map(i => (i.toLong, "b"))).toDF("id", "src")
    val once = Sampling.temperatureSample(df, "id", "src", 0.5, 150L)
      .select("id").as[Long].collect().sorted.toSeq
    val again = Sampling.temperatureSample(df.repartition(13), "id", "src", 0.5, 150L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(once === again)
    assert(once.nonEmpty && once.size < 400)
  }

  test("samplePerGroup aggregates with the bounded heap — no ranking window") {
    val df = (1L to 50L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val p = Sampling.samplePerGroup(df, "id", "grp", n = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_by"), s"expected map-side partial topk:\n$p")
    assert(!p.contains("Window"), s"expected no ranking window:\n$p")
  }

  test("negativePairs: k per anchor, no self-pairs, layout-reproducible") {
    val df = (1L to 500L).map(Tuple1(_)).toDF("doc_id")
    val out = Sampling.negativePairs(df, "doc_id", k = 3, nBuckets = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every anchor with a big-enough bucket gets exactly k negatives
    val perAnchor = rows.groupBy(_._1).view.mapValues(_.length)
    assert(perAnchor.values.forall(_ <= 3))
    assert(perAnchor.values.count(_ == 3) === 500,
      "8 buckets over 500 rows are all > 3 deep")
    assert(rows.forall { case (a, n, _) => a != n }, "no self-pairs")
    // deterministic: identical output on a different layout
    val again = Sampling.negativePairs(df.repartition(13), "doc_id", k = 3, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again === rows.toSet)
  }

  test("negativePairs: negatives look uniform, not id-adjacent") {
    val df = (1L to 1000L).map(Tuple1(_)).toDF("doc_id")
    val rows = Sampling.negativePairs(df, "doc_id", k = 2, nBuckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // hash adjacency ≠ id adjacency: mean |id gap| of pairs should be
    // large (uniform expectation ~N/3); id-adjacent pairing would be ~1
    val meanGap = rows.map { case (a, b) => math.abs(a - b) }.sum.toDouble / rows.length
    assert(meanGap > 150.0, s"negatives must be id-uniform, meanGap=$meanGap")
  }

  test("negativePairs: tiny buckets never emit wrap-around self-pairs") {
    val df = (1L to 3L).map(Tuple1(_)).toDF("doc_id")
    val rows = Sampling.negativePairs(df, "doc_id", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, n) => a != n })
  }
}
