package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Every operator must degrade to an empty result — not crash — on an empty
  * corpus (the first thing that happens in production when a filter
  * upstream matches nothing). */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private lazy val emptyEmb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", LongType))))

  test("text operators on an empty corpus") {
    assert(TextOps.textStats(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.fingerprints(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextOps.shingleSets(emptyDocs, "doc_id", "text").count() === 0)
  }

  test("dedup operators on an empty corpus") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashNearDups(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").count() === 0)
    val noPairs = Dedup.connectedComponents(
      Dedup.minhashNearDups(emptyDocs, "doc_id", "text"))
    assert(noPairs.count() === 0)
    assert(Dedup.winnowFingerprints(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.winnowedDedup(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.winnowedCut(emptyDocs, "doc_id", "text").count() === 0)
    val emptyIdx = Dedup.buildWinnowIndex(emptyDocs, "doc_id", "text")
    assert(emptyIdx.count() === 0)
    assert(Dedup.winnowIncrementalDedup(emptyDocs, emptyIdx,
      "doc_id", "text").count() === 0)
    assert(Dedup.winnowIncrementalCut(emptyDocs, emptyIdx,
      "doc_id", "text").count() === 0)
  }

  test("similarity operators on an empty corpus") {
    assert(Similarity.bruteForceKnn(emptyEmb, emptyEmb, k = 5).count() === 0)
    assert(Similarity.embeddingNearDupPairs(emptyEmb, 0.5, signBits = 8).count() === 0)
  }

  test("sampling, dedup-index, and media operators on an empty corpus") {
    assert(Sampling.samplePerGroup(emptyDocs, "doc_id", "text", n = 3).count() === 0)
    val idx = Dedup.buildRefIndex(emptyDocs, "doc_id", "text")
    assert(Dedup.incrementalDedupWithIndex(emptyDocs, idx, "doc_id", "text").count() === 0)
    val media = Multimodal.withMediaPng(spark, emptyDocs, "doc_id", "text")
    assert(Multimodal.decodeImageFeatures(spark, media, "doc_id").count() === 0)
    graft.CacheScope.release()
  }

  test("rolling, bars, split, feature, and resample operators on an empty frame") {
    val emptyTicks = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("sym", StringType), StructField("i", LongType),
        StructField("day", DateType), StructField("v", DoubleType),
        StructField("p", DoubleType))))
    assert(Rolling.median(emptyTicks, "v", Seq("sym"), Seq("i"), 3).count() === 0)
    assert(Rolling.atr(emptyTicks, "v", "v", "v", Seq("sym"), Seq("i"), 3).count() === 0)
    assert(Rolling.roc(emptyTicks, "v", Seq("sym"), Seq("i"), 2).count() === 0)
    assert(Rolling.corrBeta(emptyTicks, "v", "p", Seq("sym"), Seq("i"), 3).count() === 0)
    assert(Rolling.ffill(emptyTicks, "v", Seq("sym"), Seq("i")).count() === 0)
    assert(Bars.ohlc(emptyTicks, "v", "p", Seq("sym"), "day", Seq("i")).count() === 0)
    assert(Split.assign(emptyTicks, "sym", Seq("a" -> 0.5, "b" -> 0.5)).count() === 0)
    assert(Split.kfold(emptyTicks, "sym", 3).count() === 0)
    assert(Feature.winsorize(emptyTicks, "v", Seq("sym"), 0.05, 0.95).count() === 0)
    assert(Feature.minMaxScale(emptyTicks, "v", Seq("sym")).count() === 0)
    assert(Feature.classWeights(emptyTicks, "sym").count() === 0)
    assert(Resample.densify(emptyTicks, Seq("sym"), "day").count() === 0)
    assert(IncrementalAgg.withDerived(IncrementalAgg.merge(Seq(
      IncrementalAgg.partials(emptyTicks, Seq("sym"), "v")), Seq("sym")))
      .count() === 0)
  }

  test("eval, fuzzy-join, graph, and purged-fold operators on an empty frame") {
    val emptyScored = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("grp", StringType),
        StructField("score", DoubleType), StructField("label", IntegerType),
        StructField("ts", LongType))))
    assert(Eval.binaryAuc(emptyScored, "score", "label", Seq("grp")).count() === 0)
    assert(Eval.calibrationBins(emptyScored, "score", "label", 4, 0.0, 1.0)
      .count() === 0)
    val emptyNamed = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    assert(FuzzyJoin.editDistancePairs(emptyNamed, "id", "text", 2).count() === 0)
    assert(FuzzyJoin.bestMatch(emptyNamed, emptyNamed, "id", "text", 2).count() === 0)
    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
    assert(Graph.pageRank(emptyEdges, "src", "dst", iters = 2).count() === 0)
    graft.CacheScope.release()
    assert(Split.purgedTimeFolds(emptyScored, "ts", k = 3, embargo = 10L)
      .count() === 0)
  }

  test("round-8 operators on an empty corpus") {
    val emptySeries = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", StringType), StructField("i", LongType),
        StructField("v", DoubleType), StructField("w", LongType))))
    assert(Rolling.autocorr(emptySeries, "v", Seq("k"), Seq("i"),
      n = 3, lagK = 1).count() === 0)
    assert(Stats.weightedMedian(emptySeries, Seq("k"), "v", "w").count() === 0)
    assert(Skew.keyReport(emptySeries, Seq("k")).count() === 0)
    assert(Dedup.sortedNeighborhoodPairs(emptyDocs, "doc_id", "text",
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("text"), 1, 8),
      org.apache.spark.sql.functions.col("text")).count() === 0)
    graft.CacheScope.release()
    val emptyMedia = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    assert(Multimodal.resizeImages(spark, emptyMedia, "doc_id", 8, 8)
      .count() === 0)
  }

  test("round-8 session-2 indicators on an empty frame") {
    val emptyBars = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("sym", StringType), StructField("i", LongType),
        StructField("o", DoubleType), StructField("h", DoubleType),
        StructField("l", DoubleType), StructField("c", DoubleType))))
    val (p, ord) = (Seq("sym"), Seq("i"))
    assert(Rolling.vortex(emptyBars, "h", "l", "c", p, ord, 14).count() === 0)
    assert(Rolling.cmo(emptyBars, "c", p, ord, 14).count() === 0)
    assert(Rolling.ultimateOscillator(emptyBars, "h", "l", "c", p, ord)
      .count() === 0)
    assert(Rolling.dpo(emptyBars, "c", p, ord, 20).count() === 0)
    assert(Rolling.pivotPoints(emptyBars, "h", "l", "c", p, ord).count() === 0)
    assert(Rolling.heikinAshi(emptyBars, "o", "h", "l", "c", p, ord)
      .count() === 0)
    assert(Rolling.ppo(emptyBars, "c", p, ord).count() === 0)
    assert(Rolling.trix(emptyBars, "c", p, ord).count() === 0)
    assert(Rolling.wma(emptyBars, "c", p, ord, 10).count() === 0)
    assert(Rolling.hullMa(emptyBars, "c", p, ord, 16).count() === 0)
    assert(Rolling.superTrend(emptyBars, "h", "l", "c", p, ord, 10, 3)
      .count() === 0)
    assert(Rolling.parabolicSar(emptyBars, "h", "l", p, ord).count() === 0)
    assert(Rolling.marketBeta(emptyBars, "c", p, ord, 20).count() === 0)
    assert(Rolling.awesomeOscillator(emptyBars, "h", "l", p, ord).count() === 0)
    assert(Rolling.chandelierExit(emptyBars, "h", "l", "c", p, ord)
      .count() === 0)
    assert(Rolling.massIndex(emptyBars, "h", "l", p, ord).count() === 0)
    assert(Rolling.kst(emptyBars, "c", p, ord).count() === 0)
    assert(Rolling.coppock(emptyBars, "c", p, ord).count() === 0)
    val emptyVol = emptyBars.withColumn("v", org.apache.spark.sql.functions.lit(1.0))
    assert(Rolling.adl(emptyVol, "h", "l", "c", "v", p, ord).count() === 0)
    assert(Rolling.chaikinOsc(emptyVol, "h", "l", "c", "v", p, ord).count() === 0)
    assert(Rolling.ulcerIndex(emptyBars, "c", p, ord).count() === 0)
    assert(Rolling.easeOfMovement(emptyVol, "h", "l", "v", p, ord).count() === 0)
    assert(Rolling.balanceOfPower(emptyBars, "o", "h", "l", "c", p, ord).count() === 0)
    assert(Rolling.kama(emptyBars, "c", p, ord).count() === 0)
    assert(Rolling.volumeIndexes(emptyVol, "c", "v", p, ord).count() === 0)
    assert(Rolling.fractals(emptyBars, "h", "l", p, ord).count() === 0)
    assert(Rolling.renkoLevel(emptyBars, "c", p, ord, 500).count() === 0)
    assert(Rolling.drawdownEpisodes(emptyBars, "c", p, "i").count() === 0)
  }

  test("round-8 session-5 operators on an empty corpus") {
    val emptyBars = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("sym", StringType), StructField("i", LongType),
        StructField("c", DoubleType), StructField("v", DoubleType))))
    val (p, ord) = (Seq("sym"), Seq("i"))
    assert(Stats.ljungBox(emptyBars, "c", p, ord, m = 3).count() === 0)
    assert(Stats.pacf(emptyBars, "c", p, ord).count() === 0)
    assert(Stats.dickeyFuller(emptyBars, "c", p, ord).count() === 0)
    assert(Stats.grangerLag1(emptyBars, "c", "v", p, ord).count() === 0)
    assert(Stats.kendallTau(emptyBars, p, "c", "v").count() === 0)
    assert(Stats.theilSen(emptyBars, p, "c", "v").count() === 0)
    assert(Stats.bhAdjust(emptyBars, p, "c", "i").count() === 0)
    assert(Stats.effectSizes(emptyBars, "c", "sym", "a", "b", Seq("i"))
      .count() === 0)
    assert(Stats.cramersV(emptyBars, "sym", "i", Seq("c")).count() === 0)
    assert(Rolling.crossCorr(emptyBars, "c", "v", p, ord, Seq(-1, 0, 1))
      .count() === 0)
    assert(Rolling.harmonicPower(emptyBars, "c", p, ord, Seq(5, 7))
      .count() === 0)
    assert(Rolling.amihud(emptyBars, "c", "v", p, ord).count() === 0)
    assert(Rolling.hurst(emptyBars, "c", p, ord, Seq(4, 8)).count() === 0)
    assert(Resample.seasonalDecompose(emptyBars, "c", p, ord, period = 3)
      .count() === 0)
    assert(Eval.forecastErrors(emptyBars, "c", "v", p, ord).count() === 0)
    assert(Eval.kaplanMeier(emptyBars, "i", "v", p).count() === 0)
    assert(Eval.agreement(emptyBars, "c", "i", 0.5, p).count() === 0)
    assert(Eval.logLoss(emptyBars, "c", "i", p).count() === 0)
    assert(Eval.rocCurve(emptyBars, "c", "i", p).count() === 0)
    val emptyHashes = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("dhash", LongType))))
    assert(Multimodal.dhashPairs(emptyHashes, "doc_id").count() === 0)
    val dh = Multimodal.imageDHash(spark,
      Multimodal.withMediaPng(spark, emptyDocs, "doc_id", "text"), "doc_id")
    assert(dh.count() === 0)
  }

  test("round-9 operators on an empty frame") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("key", StringType),
        StructField("t", LongType), StructField("d", DateType),
        StructField("v", DoubleType), StructField("w", DoubleType),
        StructField("arm", StringType), StructField("blk", StringType))))
    val (p, ord) = (Seq("key"), Seq("t"))
    assert(Stats.archLm(empty, "v", p, ord).count() === 0)
    assert(Stats.chowTest(empty, "v", "d", p, "1995-06-17").count() === 0)
    assert(Stats.wilcoxonSignedRank(empty, "v", "w", p).count() === 0)
    assert(Stats.brownForsythe(empty, "v", "arm", p).count() === 0)
    assert(Stats.friedman(empty, "v", "blk", "arm", k = 3, p).count() === 0)
    assert(Stats.pageTrend(empty, "v", "blk", "arm", k = 3, p).count() === 0)
    assert(Stats.cramerVonMises(empty, "v", "arm", "a", "b", p).count() === 0)
    assert(Stats.trimmedMean(empty, "v", p).count() === 0)
    assert(Stats.hillTail(empty, "v", p, k = 5).count() === 0)
    assert(Stats.rollSpread(empty, "v", p, ord).count() === 0)
    assert(Anomaly.grubbs(empty, "v", p).count() === 0)
    assert(Rolling.croston(empty, "v", "d", p, Seq("d")).count() === 0)
    assert(Rolling.ewmaChart(empty, "v", p, ord).count() === 0)
    assert(Eval.pinballLoss(empty, "v", "w", p, tauPm = 900).count() === 0)
    assert(Eval.theilU2(empty, "v", "w", p, ord).count() === 0)
    assert(Eval.kupiecPof(empty, "v", "w", p, pPm = 50).count() === 0)
    assert(Eval.christoffersenInd(empty, "v", "w", p, ord).count() === 0)
    assert(TextOps.blocklistScreen(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType)))),
      "doc_id", "text", Seq("slow")).count() === 0)
    assert(Pricing.blackScholes(empty, "v", "w", "v", "w", "v").count() === 0)
    assert(Pricing.blackScholesGreeks(empty, "v", "w", "v", "w", "v")
      .count() === 0)
  }

  test("round-15 sketch/split operators on an empty corpus") {
    // cluster-safe split: empty docs -> empty assignment, no failure in
    // the cluster pipeline underneath
    assert(Split.clusterSafeAssign(emptyDocs, "doc_id", "text",
      Seq("train" -> 0.8, "test" -> 0.2)).count() === 0)
    graft.CacheScope.release()
    // HLL profiler: empty frame still emits one report row per column,
    // with 0 rows and estimate 0 (the all-empty register vector)
    val prof = Profile.columnProfileHll(emptyDocs, Seq("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.size === 2)
    assert(prof("doc_id").getLong(1) === 0L)
    assert(prof("doc_id").getDouble(5) === 0.0)
    // streaming distinct monitor in batch mode: empty events -> no windows
    import org.apache.spark.sql.types._
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("ts", TimestampType),
        StructField("etype", StringType), StructField("uid", LongType))))
    assert(graft.streaming.StreamingPipeline.windowedDistinct(
      emptyEvents, "ts", "etype", "uid").count() === 0)
  }

  test("validators on an empty table report zero rows and pass") {
    val emptyMinute = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.sources.Polygon.minuteAggsSchema)
    val rep = Validation.validateMinuteAggs(emptyMinute)
    assert(rep.totalRows === 0 && rep.passed)
  }
}
