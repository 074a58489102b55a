package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** Beyond-reference example: the LLM training-data curation surface on the
  * synthetic documents/embeddings tables — text stats → quality/language
  * filter → exact + MinHash near-dup dedup → connected components → kept
  * representatives, then BPE token budgeting and an ANN probe.
  *
  * Run: `sbt "runMain graft.examples.CurationPipeline [sfDir]"` */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-curation-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    println("== Per-document stats (language ID, quality, token counts) ==")
    val stats = TextOps.textStats(docs, "doc_id", "text")
    stats.show(5, truncate = false)

    println("== Quality + language filter ==")
    val kept = docs.join(stats, "doc_id")
      .filter(col("lang_pred") === "en" && col("quality_score") >= 0.2 &&
        col("n_tokens") >= 10)
    println(s"kept ${kept.count()} of ${docs.count()} documents")

    println("== Near-dup pairs (MinHash+LSH, verified Jaccard) ==")
    val pairs = Dedup.minhashNearDups(kept, "doc_id", "text", threshold = 0.5)
    pairs.show(5, truncate = false)

    println("== Dedup groups (connected components) and representatives ==")
    val comps = Dedup.connectedComponents(pairs)
    val reps = Dedup.keepRepresentatives(kept, "doc_id", comps)
    println(s"${reps.count()} documents after near-dup removal")

    println("== Token budget (merge-table BPE) ==")
    reps.select(sum(graft.functions.BpeFunctions.bpeCount(col("text")))
      .as("total_bpe_tokens")).show()

    println("== ANN probe: 3 nearest neighbours of vector 0 (learned IVF) ==")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.ivfKnnLearned(emb, emb.filter(col("vec_id") === 0), k = 3)
      .show(truncate = false)

    graft.CacheScope.release()
    spark.stop()
  }
}
