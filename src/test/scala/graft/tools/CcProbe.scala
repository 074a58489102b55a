package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Breakdown probe for q_dedup_components: minhash pair time, CC round
  * count, per-round cost at the bench scale factor. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    var t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minhashNearDups(docs, "doc_id", "text")
    val nPairs = pairs.count()
    println(f"minhash pairs: $nPairs rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    t0 = System.nanoTime()
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().persist()
    println(f"edges: ${edges.count()} rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < 25) {
      val r0 = System.nanoTime()
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("next"),
          col("component"))
        .localCheckpoint()
      val tChk = (System.nanoTime() - r0) / 1e9
      val c0 = System.nanoTime()
      converged = updated.filter(col("next") < col("component")).isEmpty
      val tConv = (System.nanoTime() - c0) / 1e9
      labels = updated.select(col("id"), col("next").as("component"))
      i += 1
      println(f"round $i: checkpoint $tChk%.2f s, convergence check $tConv%.2f s")
    }
    println(s"rounds: $i")
    spark.stop()
  }
}
