package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump one or more gate queries to parquet for before/after diffing:
  * Test/runMain graft.tools.DumpQ out_dir q_a,q_b [sfDir] */
object DumpQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpQ outDir q_name[,q] [sfDir]")
    val out = args(0); val names = args(1).split(",").toSeq
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark)
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sf)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
      graft.CacheScope.release()
      println(s"DUMPED $n")
    }
    spark.stop()
  }
}
