package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Breakdown probe for q_contamination at the bench scale factor: corpus
  * shingle-explode time vs probe-set time vs the full operator. Diagnosed
  * the InferFiltersFromGenerate serial re-evaluation (47s -> 2s, see
  * NOTES.md round-3 lessons). */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docSh = graft.operators.TextOps.shingles(docs, "doc_id", "text", 8)
    t("docSh count")(println("[probe] rows=" + docSh.count()))
    val probes = docs.filter(col("doc_id") % 20 === 0)
    val full = graft.operators.TextOps.contamination(docs, "doc_id", "text", probes, "text", 8)
    t("full contamination")(full.write.format("noop").mode("overwrite").save())
    graft.CacheScope.release(blocking = true)
    spark.stop()
  }
}
