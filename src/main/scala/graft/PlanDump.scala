package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to files — the
  * committed plan evidence for optimization rounds (plans/r{N}/...).
  * GRAFT_PLAN_DUMP=q_a,q_b  GRAFT_PLAN_DIR=plans/r16  GRAFT_PLAN_SUFFIX=_before
  * Never run by the driver.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("GRAFT_PLAN_DUMP", "").split(",").filter(_.nonEmpty)
    val dir = sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r16")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/$name$suffix.txt"), txt)
      println(s"[plandump] wrote $dir/$name$suffix.txt (${txt.length} chars)")
      CacheScope.release()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
