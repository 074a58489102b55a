package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the r14 packed winnow selection key actually buys
  * (r13 verdict #2): the r13 selection sorted every gram position on a
  * 31-char `gram ∥ zero-padded pos` TEXT key — ~150 MB of sort data per
  * task at 30× (SCALE.md), enough to drive q_winnow_dedup's 3-pt fit
  * concave. The r14 key packs a portable 41-bit gram hash, 21 position
  * bits and a valid-start flag into ONE BIGINT (row through the sort:
  * 72 → 24 bytes for a bigint id), recovering gram text by joining the
  * selected ~2n/(w+1) winners back to the documents.
  *
  * This probe A/Bs the SELECTION STEP alone on the 30× corpus in one
  * session: the current [[operators.Dedup.winnowFingerprints]] vs a
  * frozen inline copy of the r13 text-key construction, min-of-3 each,
  * with per-task peak execution memory and spill totals from the task
  * listener. Output: winnowsort.json + PROBE lines; SCALE.md carries the
  * row. */
object WinnowSortProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.get("GRAFT_PROBE_SCALE").map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m") // see Bench — small-data page fix
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"target/scaledata/x$scale"
    ScaleProbe.buildScaled(spark, baseDir, dir, scale)
    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

    // task-metric capture: max per-task peak execution memory (the sort /
    // window buffers live there) and total spill bytes
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    def drain(): Unit = org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
    def reset(): Unit = { drain(); peak.set(0L); spillMem.set(0L); spillDisk.set(0L) }

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }

    /** Frozen copy of the r13 text-key selection (Dedup.scala @ r13
      * `winnowFingerprints`, minLen=30, noise=21) — kept inline so the A/B
      * never drifts from what round 13 actually shipped. */
    def legacy: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val occ = docs
        .where(length(col("text")) >= 30)
        .select(col("doc_id"),
          (length(col("text")) - 29).as("__last"),
          explode(sequence(lit(1), length(col("text")) - 20, lit(1))).as("pos"),
          col("text"))
        .select(col("doc_id"), col("__last"), col("pos"),
          concat(col("text").substr(col("pos"), lit(21)),
            lpad(col("pos").cast("string"), 10, "0")).as("__key"))
      val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, 9)
      occ.withColumn("__win", min(col("__key")).over(frame))
        .where(col("pos") <= col("__last"))
        .select(col("doc_id"),
          substring(col("__win"), 22, 10).cast("int").as("pos"),
          substring(col("__win"), 1, 21).as("gram"))
        .dropDuplicates("doc_id", "pos")
    }
    def packed: DataFrame =
      operators.Dedup.winnowFingerprints(docs, "doc_id", "text",
        minLen = 30, noise = 21)

    force(packed) // warm-up
    sweep()

    def measure(name: String, mk: () => DataFrame): (Double, Long, Long) = {
      var bestSec = Double.MaxValue
      var bestPeak = 0L
      var bestSpill = 0L
      (1 to 3).foreach { _ =>
        reset()
        val t0 = System.nanoTime()
        force(mk())
        val sec = (System.nanoTime() - t0) / 1e9
        drain()
        if (sec < bestSec) {
          bestSec = sec; bestPeak = peak.get
          bestSpill = spillMem.get + spillDisk.get
        }
        sweep()
      }
      println(f"""PROBE {"variant":"$name","sec":$bestSec%.2f,"peak_task_mb":${bestPeak / 1e6}%.1f,"spill_mb":${bestSpill / 1e6}%.1f,"runs":3}""")
      (bestSec, bestPeak, bestSpill)
    }

    val (lSec, lPeak, lSpill) = measure("legacy_textkey", () => legacy)
    val (pSec, pPeak, pSpill) = measure("packed_hashkey", () => packed)
    val json =
      f"""{"scale":$scale,"legacy_sec":$lSec%.2f,"packed_sec":$pSec%.2f,"legacy_peak_task_mb":${lPeak / 1e6}%.1f,"packed_peak_task_mb":${pPeak / 1e6}%.1f,"legacy_spill_mb":${lSpill / 1e6}%.1f,"packed_spill_mb":${pSpill / 1e6}%.1f,"peak_ratio":${lPeak.toDouble / math.max(pPeak, 1L)}%.2f,"runs":3}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("winnowsort.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
