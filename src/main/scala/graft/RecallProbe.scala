package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measures the guarded-SemDeDup recall loss the round-11 verdict flagged
  * as "asserted, not measured": the stage-2 id-hash salt drops near-dup
  * pairs exactly where the sign-split fails (identical vectors), so on the
  * adversarial skew corpus — every vector replicated 10× IDENTICALLY
  * (ScaleProbe's x10 embeddings) — the guard's survivor surplus over the
  * unguarded run, as a fraction of the true dup mass, is the measured
  * recall loss.
  *
  *   recall_loss(cap) = (survivors(cap) − survivors(unbounded))
  *                      / (n − survivors(unbounded))
  *
  * Caps probed: the DEFAULT (10000 — expected to no-op here because the
  * skew clusters are ~2.5 K rows; the row documents that the default guard
  * is inactive until a cluster actually exceeds it) plus engaged caps
  * (1000 / 200 / 50) that put the cluster-to-cap ratio in the regime a
  * 100 TB corpus would see, tracing the cap-vs-recall curve. Threshold /
  * nlist / iters match the q_semantic_dedup gates (0.3 / 8 / 2).
  * Output: recallprobe.json + PROBE lines. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val skewDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scaledata/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m") // see Bench — small-data page fix
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ScaleProbe.buildScaled(spark, baseDir, skewDir, scale = 10)
    val corpus = spark.read.parquet(s"$skewDir/embeddings.parquet")
    val n = corpus.count()

    def survivors(cap: Long): Long = {
      val s = operators.Similarity.semanticDedup(corpus,
        threshold = 0.3, nlist = 8, iters = 2, maxClusterSize = cap).count()
      CacheScope.release(blocking = true)
      s
    }

    val unbounded = survivors(operators.Similarity.Unbounded)
    val trueDupMass = n - unbounded
    val caps = Seq(operators.Similarity.DefaultMaxClusterSize, 1000L, 200L, 50L)
    val rows = caps.map { cap =>
      val s = survivors(cap)
      val loss = if (trueDupMass == 0) 0.0
        else (s - unbounded).toDouble / trueDupMass
      println(f"""PROBE {"cap":$cap,"survivors":$s,"recall_loss":$loss%.4f}""")
      f""""cap_$cap":{"survivors":$s,"recall_loss":$loss%.4f}"""
    }
    val json =
      (Seq(s""""n":$n""", s""""survivors_unbounded":$unbounded""",
        s""""true_dup_mass":$trueDupMass""",
        s""""base":"$baseDir"""", s""""skew":"x10 identical replicas"""") ++ rows)
        .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("recallprobe.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
