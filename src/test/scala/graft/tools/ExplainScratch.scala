package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for plan audits: prints the formatted physical plan of the
  * named gate queries over a given sf dir (default sf0.1). Not a test —
  * run with `sbt "Test/runMain graft.tools.ExplainScratch q_x q_y"`. */
object ExplainScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      graft.CacheScope.release()
    }
    spark.stop()
  }
}
