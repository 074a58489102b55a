package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 scale-evidence probe (r15 verdict "Next round" #5, guide §2.5):
  * measures the two plan shapes round 15 introduced under the skew each
  * one is exposed to, so SCALE.md can carry a measured bound instead of a
  * first-principles claim.
  *
  *  (a) dailyBarsW's range exchange under SUPPLIER skew — a synthetic
  *      lineitem where one hot supplier owns ~30% of all ticks. Both the
  *      old 3-exchange hash shape and the new 2-exchange range shape
  *      need per-supplier clustering for the window, and the bars agg
  *      collapses ticks to (supplier, date) bars BEFORE either exchange,
  *      so the per-partition ceiling is the calendar (|dates| bars per
  *      supplier), not the tick count. The probe verifies the two shapes
  *      degrade together (the r15 claim "skew bound unchanged").
  *
  *  (b) the winnow doc-repartition under an OUTLIER-LENGTH document —
  *      one planted doc of ~1M chars (half the 2^21-char hard limit the
  *      operator enforces) in the sf0.1 corpus. The r15 exchange moved
  *      below the explode hash-partitions WHOLE docs by id, so the
  *      outlier's ~20x fan-out (packed keys + one md5 per position) runs
  *      inside a single task — the probe measures that straggler tail
  *      directly (wall time vs the same corpus without the outlier).
  *
  * Never run by the driver; timing mirrors Bench (noop sink, min-of-N
  * with full sweeps). One JSON line per row on stdout, prefix SKEWPROBE.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m") // see Bench — small-data page fix
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FinancialFunctions.registerAll(spark) // adx needs `wilder`
    import spark.implicits._

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def timed(runs: Int)(build: => DataFrame): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        force(build)
        val dt = (System.nanoTime() - t0) / 1e9
        sweep(); dt
      }.min

    // ---------- (a) bar-family window shapes under supplier skew ----------
    // ~30% of ticks remapped to supplier 1 (hot key), the rest untouched.
    val skewLi = "target/skewdata/lineitem_skew.parquet"
    if (!new java.io.File(s"$skewLi/_SUCCESS").exists()) {
      spark.read.parquet(s"$baseDir/lineitem.parquet")
        .withColumn("l_suppkey",
          when(col("l_orderkey") % 10 < 3, lit(1L)).otherwise(col("l_suppkey")))
        .write.mode("overwrite").parquet(skewLi)
    }
    def bars(src: String): DataFrame = operators.Bars.ohlc(
      spark.read.parquet(src).withColumn("l_tick",
        expr("l_orderkey * 8 + l_linenumber")),
      "l_quantity", "l_extendedprice", Seq("l_suppkey"), "l_shipdate",
      Seq("l_tick"), volScale = 2)
    def adxOn(b: DataFrame): DataFrame =
      operators.Rolling.adx(b, "high", "low", "close",
          Seq("l_suppkey"), Seq("l_shipdate"), n = 14)
        .select(col("l_suppkey"), col("l_shipdate"),
          col("di_plus"), col("di_minus"), col("adx"))
        .orderBy(col("l_suppkey"), col("l_shipdate"))
    val uniformSrc = s"$baseDir/lineitem.parquet"
    // warm-up
    force(adxOn(bars(uniformSrc).repartitionByRange(col("l_suppkey")))); sweep()
    for ((corpus, src) <- Seq("uniform" -> uniformSrc, "skew30" -> skewLi);
         (shape, b) <- Seq(
           "hash3" -> (() => bars(src)),
           "range2" -> (() => bars(src).repartitionByRange(col("l_suppkey"))))) {
      val t = timed(5)(adxOn(b()))
      println(f"""SKEWPROBE {"probe":"bars_adx","corpus":"$corpus","shape":"$shape","runs":5,"sec":$t%.3f}""")
    }

    // ---------- (b) winnow doc-repartition under an outlier doc ----------
    val docsBase = spark.read.parquet(s"$baseDir/documents.parquet")
    val maxId = docsBase.agg(max(col("doc_id"))).head.getLong(0)
    // ~1M chars of non-repeating-ish text (varied grams, like real text —
    // content does not change the per-position md5 cost, but a constant
    // string would make every gram identical and distort the dup marking)
    val outlierText = {
      val sb = new StringBuilder(1100000)
      var x = 1234567L
      while (sb.length < 1000000) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(java.lang.Long.toUnsignedString(x, 36)).append(' ')
      }
      sb.toString
    }
    val outDocs = "target/skewdata/documents_outlier.parquet"
    if (!new java.io.File(s"$outDocs/_SUCCESS").exists()) {
      docsBase.select(col("doc_id"), col("text"))
        .unionByName(Seq((maxId + 1, outlierText)).toDF("doc_id", "text"))
        .write.mode("overwrite").parquet(outDocs)
    }
    val plainDocs = "target/skewdata/documents_plain.parquet"
    if (!new java.io.File(s"$plainDocs/_SUCCESS").exists()) {
      // same two-column layout/file structure so the only delta is the row
      docsBase.select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(plainDocs)
    }
    for ((corpus, src) <- Seq("plain" -> plainDocs, "outlier1m" -> outDocs)) {
      val t = timed(5)(
        operators.Dedup.winnowedCut(spark.read.parquet(src), "doc_id", "text",
            minLen = 30, noise = 21)
          .orderBy(col("doc_id")))
      println(f"""SKEWPROBE {"probe":"winnow_cut","corpus":"$corpus","runs":5,"sec":$t%.3f}""")
    }
    spark.stop()
  }
}
