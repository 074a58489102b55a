package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 scale-evidence probe (r15 verdict "Next round" #7): proves the
  * q_densify left-alone rationale from r15 — "the 20 MB broadcast of the
  * bar frame is AQE-replanned at scale" — by actually running the densify
  * gate shape at ~30x the sf0.1 supplier count and dumping the AQE FINAL
  * plan. The input is sf0.1 lineitem replicated with shifted supplier ids
  * (30x the suppliers => 30x the bars => the join's build side outgrows
  * the broadcast threshold), which preserves the per-supplier calendar
  * shape. Writes plans/r16/q_densify_scale30_aqe_final.txt. Never run by
  * the driver.
  */
object DensifyScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("GRAFT_DENSIFY_SCALE", "30").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_shipdate", "l_quantity", "l_extendedprice",
        "l_orderkey", "l_linenumber")
    val nSupp = li.agg(max(col("l_suppkey"))).head.getLong(0)
    val scaled = (0 until mult).map { i =>
      li.withColumn("l_suppkey", col("l_suppkey") + lit(i * (nSupp + 1)))
    }.reduce(_ unionByName _)

    // the q_densify gate shape over the scaled frame: daily bars -> densify
    // -> per-supplier gap-day rollup (mirrors SparkEntry's dailyBars +
    // q_densify without the catalog)
    val bars = scaled
      .groupBy(col("l_suppkey"), col("l_shipdate"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("l_quantity")).as("volume"))
    val out = operators.Resample.densify(bars, Seq("l_suppkey"), "l_shipdate")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("n_ticks").isNull, 1L).otherwise(0L)).as("n_gap_days"))
    val t0 = System.nanoTime()
    out.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    // the adaptive plan for the gate frame (the noop write above ran its
    // own QueryExecution, so this one is pre-execution — its STATIC join
    // selection is the evidence: SMJ at this scale vs broadcast at 1x)
    val finalPlan = out.queryExecution.executedPlan.toString
    val dir = java.nio.file.Paths.get("plans/r16")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(
      dir.resolve(s"q_densify_scale${mult}_aqe_final.txt"),
      f"// densify gate shape at ${mult}x suppliers (sf0.1 replicated), " +
        f"noop-forced in $dt%.1f s; AQE final plan below\n" + finalPlan)
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(finalPlan).toSeq.groupBy(identity).view.mapValues(_.size)
    println(s"DENSIFYSCALE {" +
      s""""mult":$mult,"sec":$dt,"joins":"${joins.toMap}"}""")
    spark.stop()
  }
}
