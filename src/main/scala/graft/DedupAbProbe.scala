package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudicates the r13 dedup-family slowdown (r13 verdict #1): the four
  * gates q_dedup_minhash / q_dedup_components / q_dedup_keep /
  * q_dedup_keep_best moved ×1.5–1.9 vs r12 in two independent sessions
  * with flat shuffle — exactly the same-plan compute-regression blind
  * spot the calibrated diff cannot corroborate. Round 13 changed two
  * things on these paths, both deliberate safety defaults:
  *
  *  - [[operators.Guards.pairBudget]] became DEFAULT-ON in
  *    [[operators.Dedup.minhashNearDups]] — one extra bucket-size
  *    aggregate + single-row broadcast per pair query
  *    (q_dedup_minhash / q_dedup_components run this);
  *  - the keep/keep-best composites switched their cluster construction
  *    from the all-pairs graph to [[operators.Dedup.StarEdges]] — a reps
  *    aggregate + join + distinct that only WINS on flooded corpora
  *    (flood exponent 0.36 vs 0.68) and is pure overhead at sf0.1
  *    (q_dedup_keep / q_dedup_keep_best run this; the star path carries
  *    no pair budget).
  *
  * This probe isolates each component in ONE session, min-of-5 per
  * variant with full cache sweeps, mirroring the gate plans exactly
  * (same .select/.orderBy shape):
  *
  *  - minhash / components: budget-on (the gate) vs
  *    [[operators.Guards.UnboundedPairs]] (the r12 plan) — the delta IS
  *    the budget aggregate's cost;
  *  - keep / keep_best: [[operators.Dedup.StarEdges]] (the gate) vs the
  *    hand-wired all-pairs UNBOUNDED construction (the exact r12 plan)
  *    vs all-pairs WITH budget — separating star-construction cost from
  *    budget cost on the same composite.
  *
  * Output: abprobe.json (per-variant seconds + derived premium ratios)
  * and PROBE lines; SCALE.md records the "safety premium" rows. */
object DedupAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m") // see Bench — small-data page fix
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{Dedup, Guards}

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // the exact r12 keep composites: all-pairs edges with a configurable
    // budget (UnboundedPairs reproduces the pre-r13 plan bit for bit)
    def keepAllPairs(maxPairs: Long): DataFrame =
      Dedup.keepRepresentatives(docs, "doc_id",
        Dedup.connectedComponents(
          Dedup.minhashNearDups(docs, "doc_id", "text",
            k = 16, rowsPerBand = 4, threshold = 0.5, maxPairs = maxPairs)))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    def keepBestAllPairs(maxPairs: Long): DataFrame =
      Dedup.keepBestRepresentatives(docs, "doc_id", "n_chars",
        Dedup.connectedComponents(
          Dedup.minhashNearDups(docs, "doc_id", "text",
            k = 16, rowsPerBand = 4, threshold = 0.5, maxPairs = maxPairs)))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "minhash_budget" -> (() =>
        Dedup.minhashNearDups(docs, "doc_id", "text",
            k = 16, rowsPerBand = 4, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b"))),
      "minhash_unbounded" -> (() =>
        Dedup.minhashNearDups(docs, "doc_id", "text",
            k = 16, rowsPerBand = 4, threshold = 0.5,
            maxPairs = Guards.UnboundedPairs)
          .orderBy(col("id_a"), col("id_b"))),
      "components_budget" -> (() =>
        Dedup.connectedComponents(
            Dedup.minhashNearDups(docs, "doc_id", "text"))
          .orderBy(col("id"))),
      "components_unbounded" -> (() =>
        Dedup.connectedComponents(
            Dedup.minhashNearDups(docs, "doc_id", "text",
              maxPairs = Guards.UnboundedPairs))
          .orderBy(col("id"))),
      "keep_star" -> (() =>
        Dedup.nearDupKeep(docs, "doc_id", "text")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))),
      "keep_allpairs_unbounded" -> (() => keepAllPairs(Guards.UnboundedPairs)),
      "keep_allpairs_budget" -> (() =>
        keepAllPairs(Guards.DefaultMaxCandidatePairs)),
      "keep_best_star" -> (() =>
        Dedup.nearDupKeepBest(docs, "doc_id", "text", "n_chars")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))),
      "keep_best_allpairs_unbounded" -> (() =>
        keepBestAllPairs(Guards.UnboundedPairs)),
      "keep_best_allpairs_budget" -> (() =>
        keepBestAllPairs(Guards.DefaultMaxCandidatePairs)))

    force(Dedup.minhashNearDups(docs, "doc_id", "text")) // warm-up
    sweep()

    val secs = variants.map { case (name, mk) =>
      val t = (1 to 5).map { i =>
        val t0 = System.nanoTime()
        force(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        sweep(); dt
      }.min
      println(f"""PROBE {"variant":"$name","sec":$t%.3f,"runs":5}""")
      name -> t
    }.toMap

    def ratio(a: String, b: String): Double = secs(a) / secs(b)
    val derived = Seq(
      // the budget aggregate's cost on the pure pair query
      "budget_premium_minhash" -> ratio("minhash_budget", "minhash_unbounded"),
      "budget_premium_components" ->
        ratio("components_budget", "components_unbounded"),
      // star construction vs the exact r12 plan (no budget either side)
      "star_premium_keep" -> ratio("keep_star", "keep_allpairs_unbounded"),
      "star_premium_keep_best" ->
        ratio("keep_best_star", "keep_best_allpairs_unbounded"),
      // had r13 kept all-pairs and only added the budget
      "budget_premium_keep" ->
        ratio("keep_allpairs_budget", "keep_allpairs_unbounded"))

    val json = (secs.toSeq.sortBy(_._1).map { case (n, t) =>
        f""""$n":$t%.3f""" } ++
      derived.map { case (n, r) => f""""$n":$r%.3f""" } ++
      Seq(s""""sf":"$sfDir"""", """"runs":5"""))
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("abprobe.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
