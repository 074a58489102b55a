package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val fps = graft.operators.Dedup.simhash(docs, "doc_id", "text").cache()
    var t = System.nanoTime()
    println("fps: " + fps.count() + f" in ${(System.nanoTime()-t)/1e9}%.2f s")
    println("distinct fps: " + fps.select("simhash").distinct().count())
    t = System.nanoTime()
    val pairs = graft.operators.Dedup.simhashPairs(fps, "doc_id", 3)
    println(f"pairs: ${pairs.count()} in ${(System.nanoTime()-t)/1e9}%.2f s")
    spark.stop()
  }
}
