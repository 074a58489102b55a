package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Eval, Similarity}

/** Embedding/retrieval evaluation example: the quality loop a training
  * pipeline runs before trusting an embedding table — label-consistency
  * of the raw vectors, ANN recall graded against the brute-force ground
  * truth with [[Eval.rankingMetrics]], and hard negatives mined for the
  * next contrastive round.
  *
  * Run: `sbt "runMain graft.examples.EmbeddingEval [sfDir]"` */
object EmbeddingEval {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-embedding-eval")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val panel = emb.filter(col("vec_id") < 100)

    println("== 1. Is the embedding separated at all? kNN label consistency ==")
    // per label: fraction of each panel vector's 5 nearest neighbors
    // sharing its label — compare against the label prior before trusting
    // any downstream similarity product
    Similarity.knnLabelConsistency(emb, panel, k = 5)
      .orderBy(col("label")).show(20, truncate = false)

    println("== 2. ANN recall: IVF graded against brute-force ground truth ==")
    // ground truth = exact cosine top-10; system = IVF probing 1 cluster.
    // rankingMetrics reads the IVF ranks directly — recall@10 IS the
    // fraction of true neighbors the probe found, NDCG weights the order
    val truth = Similarity.bruteForceKnn(emb, panel, k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfKnn(emb, panel, k = 10)
    Eval.rankingMetrics(ivf, truth, "query_id", "neighbor_id", "rank", k = 10)
      .agg(count(lit(1)).as("n_queries"),
        avg(col("recall_at_k")).as("mean_recall"),
        avg(col("mrr_at_k")).as("mean_mrr"),
        avg(col("ndcg_at_k")).as("mean_ndcg"))
      .show(truncate = false)

    println("== 3. Hard negatives for the next contrastive round ==")
    Similarity.hardNegatives(emb, panel.limit(5), k = 3)
      .orderBy(col("query_id"), col("rank")).show(15, truncate = false)

    spark.stop()
  }
}
