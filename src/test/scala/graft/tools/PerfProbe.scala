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
      .config("spark.buffer.pageSize", "4m") // match Bench (see Bench.scala)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // PROBE_SWEEP=1 replicates Bench's isolation protocol exactly (cache
    // release + GC between the two runs) so probe times match bench times
    val sweeping = sys.env.get("PROBE_SWEEP").contains("1")
    def sweep(): Unit = if (sweeping) {
      graft.CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // warm-up
    force(graft.SparkEntry.queries(names.head)(spark, sfDir))
    sweep()
    for (name <- names) {
      if (explain) {
        println(s"==== $name ====")
        graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        sweep()
      }
      for (i <- 1 to 2) {
        // build INSIDE the timer, like Bench — operators with eager internal
        // actions (connectedComponents' label loop) do their work at
        // construction, not at the final force
        val t0 = System.nanoTime()
        force(graft.SparkEntry.queries(name)(spark, sfDir))
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        sweep()
      }
    }
    spark.stop()
  }
}
