package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf investigation harness: time + explain selected SparkEntry queries. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_indicators_combined")
    val explain = sys.env.get("PROBE_EXPLAIN").contains("1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up
    force(graft.SparkEntry.queries(names.head)(spark, sfDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (explain) { println(s"==== $name ===="); df.explain("formatted") }
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        force(df)
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
