package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Kmv
import graft.operators.{Freq, Sampling, Sessionize}

/** Beyond-reference example: dataset-engineering operators over the
  * synthetic tables — deterministic sampling & corpus mixing, cardinality
  * and frequency sketches, vocabulary building, and sessionization of an
  * event log.
  *
  * Run: `sbt "runMain graft.examples.DatasetOps [sfDir]"` */
object DatasetOps {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-dataset-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    println("== Deterministic stratified sampling (rebalance languages) ==")
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.3, "de" -> 1.0), defaultRate = 0.5)
    sampled.groupBy("lang").count().orderBy("lang").show()

    println("== Weighted corpus mixing (same hash primitive) ==")
    val mixed = Sampling.mixCorpora(Seq(
      (docs.filter(col("source") === "src0"), 1.0),
      (docs.filter(col("source") === "src1"), 0.4)), "doc_id")
    mixed.groupBy("source").count().orderBy("source").show()

    println("== KMV distinct-count sketch vs exact ==")
    docs.agg(
      Kmv.kmvDistinct(col("text"), 256).as("kmv_estimate"),
      countDistinct(col("text")).as("exact")).show()

    println("== Top-10 vocabulary (exact) ==")
    Freq.vocabulary(docs, "text", 10).show()

    println("== Count-min sketch point estimates for three tokens ==")
    import spark.implicits._
    val toks = docs.select(explode(
      graft.operators.TextOps.tokens(col("text"))).as("token"))
    val sketch = Freq.countMinSketch(toks, "token", depth = 4, width = 1024)
    Freq.cmsEstimate(sketch, Seq("the", "data", "zzz_unseen").toDF("token"),
      "token", depth = 4, width = 1024).orderBy("token").show()

    println("== Sessionized event log (12h inactivity gap) ==")
    // raw INT64 ts normalized to nanos whatever unit the file declares
    val evFull = graft.sources.Events.readNanos(spark, dir)
    val ev = evFull
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000000000").as("ts_sec"))
    val sess = Sessionize.assignSessions(ev, "user_id", "ts_sec",
      gapSeconds = 43200, tieCols = Seq("event_id"))
    Sessionize.sessionStats(sess, "user_id", "ts_sec")
      .orderBy(desc("n_events")).show(5)

    println("== Ordered funnel + first-day cohorts over the same log ==")
    graft.operators.EventAnalytics.funnel(evFull, "user_id", "event_type",
      "ts", Seq("view", "click", "purchase")).show()
    val days = evFull.select(col("user_id"),
      expr("ts DIV 86400000000000").as("day"))
    graft.operators.EventAnalytics.cohortRetention(days, "user_id", "day")
      .orderBy("cohort_day", "day_offset").show(5)

    println("== Token-budget selection: best 500 tokens per language ==")
    val withTok = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      graft.operators.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Batching.tokenBudgetSelect(withTok, Seq("lang"),
        "n_tokens", "n_chars", "doc_id", budget = 500L)
      .groupBy("lang").agg(count(lit(1)).as("docs_kept"),
        max("cum_tokens").as("tokens_used")).orderBy("lang").show()

    println("== Padding-efficiency ladder (length-bucketed batching) ==")
    graft.operators.Batching.bucketStats(withTok, "n_tokens",
      Seq(16L, 32L, 64L, 128L)).orderBy("seq_bucket").show()

    println("== Deterministic per-source cap: at most 5 docs per source ==")
    graft.operators.Sampling.samplePerGroup(docs, "doc_id", "source", n = 5)
      .groupBy("source").count().orderBy("source").show(5)

    println("== Approx IQR screen (bounded sketch state — the 100 TB path) ==")
    graft.operators.Anomaly.iqrOutliers(
        docs.select(col("doc_id"), col("lang"), col("n_chars")),
        "n_chars", Seq("lang"), approx = true)
      .filter(col("is_outlier")).groupBy("lang").count().orderBy("lang").show(5)

    println("== Incremental ingest against a persisted dedup index ==")
    val refIdx = graft.operators.Dedup.buildRefIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val survivors = graft.operators.Dedup.incrementalDedupWithIndex(
      docs.filter(col("doc_id") % 2 === 1), refIdx, "doc_id", "text")
    println(s"odd-batch survivors vs even-doc reference: ${survivors.count()}")
    graft.CacheScope.release()

    println("== Deterministic 80/10/10 split (leakage-safe by source) ==")
    graft.operators.Split.assign(docs, "source",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").agg(count(lit(1)).as("docs"),
        countDistinct(col("source")).as("sources")).orderBy("split").show()

    println("== Feature conditioning: robust-scaled doc lengths per language ==")
    graft.operators.Feature.robustScale(
        docs.select(col("doc_id"), col("lang"), col("n_chars")),
        "n_chars", Seq("lang"))
      .groupBy("lang").agg(min("n_chars_robust"), max("n_chars_robust"))
      .orderBy("lang").show(5)

    println("== Mixture drift: per-source token entropy + KL vs the corpus ==")
    graft.operators.Divergence.tokenEntropy(docs, "source", "text", topK = 30)
      .orderBy(col("kl").desc).show(5)

    println("== Unigram surprisal: flag the most surprising docs per source ==")
    graft.operators.TextOps.unigramSurprisal(docs, "doc_id", "text", vocabK = 500)
      .orderBy(col("surprisal").desc_nulls_last).show(5)

    println("== Bigram PMI: strongest collocations in the corpus ==")
    graft.operators.TextOps.bigramPmi(docs, "text", topK = 20)
      .orderBy(col("pmi").desc).show(5)

    println("== PSI feature drift: doc lengths, first half vs second half ==")
    val psi = graft.operators.Divergence.psi(
      docs.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
      docs.filter(col("doc_id") % 2 === 1).select(col("n_chars")),
      "n_chars", nBins = 8, lo = 0.0, hi = 4000.0)
    psi.show(8)
    println(f"PSI total: ${psi.agg(sum(col("psi_term"))).first().getDouble(0)}%.6f (<0.1 = stable)")

    println("== Eval: AUC + calibration of n_chars as a 'quality' scorer ==")
    val scored = docs.select(col("n_chars").cast("double").as("score"),
      (col("doc_id") % 3 === 0).cast("int").as("label"),
      col("lang"))
    graft.operators.Eval.binaryAuc(scored, "score", "label", Seq("lang"))
      .orderBy(col("lang")).show(5)
    graft.operators.Eval.calibrationBins(scored, "score", "label",
      nBins = 5, lo = 0.0, hi = 4000.0).orderBy(col("bin")).show()

    println("== Purged 4-fold time-series CV over the event log ==")
    val evTs = evFull
      .select(col("event_id"), expr("ts DIV 1000000000").as("ts_sec"))
    graft.operators.Split.purgedTimeFolds(evTs, "ts_sec", k = 4, embargo = 43200L)
      .groupBy("fold", "role").count().orderBy("fold", "role").show(12)

    println("== Fuzzy best-match linkage over distinct part names ==")
    val names = spark.read.parquet(s"$dir/part.parquet")
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("name_id"))
    graft.operators.FuzzyJoin.bestMatch(names, names, "name_id", "p_name",
      maxDist = 3, excludeSelf = true).orderBy(col("match_dist"), col("id")).show(5)

    println("== PageRank source centrality over the customer-supplier graph ==")
    val ordersE = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val liE = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val cs = ordersE.join(liE, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + lit(1000000L)).as("supp")).distinct()
    val trade = cs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(cs.select(col("supp").as("src"), col("cust").as("dst")))
    graft.operators.Graph.pageRank(trade, "src", "dst", iters = 3)
      .orderBy(col("pr").desc).show(5)
    graft.CacheScope.release()

    spark.stop()
  }
}
