package graft

import org.apache.spark.sql.SparkSession

/** Explains the ≥0.5 30× exponents of the PAIR-OUTPUT dedup operators
  * (q_dedup_minhash 0.68, q_dedup_components 0.64) by measuring what the
  * exponent metric cannot see: the operators' OUTPUT (near-dup pair mass)
  * on the scaled corpus. ScaleProbe's x-S corpus replicates every document
  * S times with shifted ids, so every original document becomes an
  * identical-replica cluster of size S and the TRUE near-dup pair count
  * grows as C(S,2) per document — quadratically in S by construction. An
  * operator whose contract is "return the near-dup pairs" cannot beat its
  * own output size; the honest scale question is whether time tracks
  * pairs (output-proportional — fine) or outgrows them (a plan defect).
  *
  * The probe reports, per scale: the pair count, wall time, and
  * time-per-million-pairs; plus the PIPELINE-ORDER guard number — pair
  * mass after [[operators.Dedup.exact]] collapses identical replicas
  * first (the order CurationPipeline ships: exact → minhash), which a
  * real 100 TB pipeline uses precisely so MinHash never sees an
  * identical-replica flood. Output: pairmass.json + PROBE lines. */
object PairMassProbe {
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
    import org.apache.spark.sql.functions._

    val scales = Seq(1, 10, 30)
    val dirs: Map[Int, String] = Map(1 -> baseDir) ++ scales.filter(_ > 1).map { s =>
      val d = s"target/scaledata/x$s"
      ScaleProbe.buildScaled(spark, baseDir, d, scale = s)
      s -> d
    }

    def sweep(): Unit = {
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      System.gc()
    }

    val rows = scales.map { s =>
      val docs = spark.read.parquet(s"${dirs(s)}/documents.parquet")
      val t0 = System.nanoTime()
      val pairs = operators.Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 16, rowsPerBand = 4, threshold = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      sweep()
      // the pipeline-order guard: exact dedup first (one hash-groupBy)
      // collapses every identical-replica cluster to one survivor, so the
      // pair op's input — and output — stays at base-corpus scale
      val survivors = operators.Dedup.exact(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
        .join(docs, "doc_id")
      val t1 = System.nanoTime()
      val pairsAfterExact = operators.Dedup.minhashNearDups(survivors,
        "doc_id", "text", k = 16, rowsPerBand = 4, threshold = 0.5).count()
      val secAfter = (System.nanoTime() - t1) / 1e9
      sweep()
      // zero-pair runs emit the JSON literal null, never a bare NaN (which
      // would make the whole artifact unparseable)
      val perM = if (pairs > 0) f"${sec / (pairs / 1e6)}%.2f" else "null"
      // star-vs-all-pairs CLUSTER AGREEMENT (r12 ADVICE): the star gate's
      // oracle replays the same star construction, so only a direct
      // comparison against the all-pairs components can quantify the
      // documented under-merge trade on real + flooded corpora. Compared
      // as (id -> min-reachable-id) maps: both paths label clusters by
      // the same canonical representative.
      val allPairsComp = operators.Dedup.connectedComponents(
        operators.Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 16, rowsPerBand = 4, threshold = 0.5))
        .select(col("id"), col("component").as("c_pairs"))
      val starComp = operators.Dedup.starNearDupClusters(docs, "doc_id",
          "text", k = 16, rowsPerBand = 4, threshold = 0.5)
        .select(col("id"), col("component").as("c_star"))
      val joined = allPairsComp.join(starComp, Seq("id"), "full_outer")
        .agg(
          count(lit(1)).as("n_ids"),
          count(col("c_pairs")).as("n_allpairs"),
          count(col("c_star")).as("n_star"),
          count(when(col("c_pairs") === col("c_star"), 1)).as("n_match"))
        .head()
      val (nIds, nAp, nStar, nMatch) = (joined.getLong(0), joined.getLong(1),
        joined.getLong(2), joined.getLong(3))
      sweep()
      // winnow overlap pairs (r13): same output-quadratic construction on
      // the replica flood — the question is again whether time tracks the
      // pair mass, and whether exact-first keeps the output at base scale
      val t2 = System.nanoTime()
      val wPairs = operators.Dedup.winnowOverlapPairs(docs, "doc_id", "text",
        minLen = 30, noise = 21, minShared = 2).count()
      val wSec = (System.nanoTime() - t2) / 1e9
      sweep()
      val t3 = System.nanoTime()
      val wPairsAfter = operators.Dedup.winnowOverlapPairs(survivors,
        "doc_id", "text", minLen = 30, noise = 21, minShared = 2).count()
      val wSecAfter = (System.nanoTime() - t3) / 1e9
      sweep()
      val wPerM = if (wPairs > 0) f"${wSec / (wPairs / 1e6)}%.2f" else "null"
      println(f"""PROBE {"scale":$s,"pairs":$pairs,"sec":$sec%.2f,"sec_per_mpair":$perM,"pairs_after_exact_first":$pairsAfterExact,"sec_after_exact_first":$secAfter%.2f,"cluster_ids":$nIds,"label_match":$nMatch,"only_allpairs":${nAp - nMatch},"only_star":${nStar - nMatch},"winnow_pairs":$wPairs,"winnow_sec":$wSec%.2f,"winnow_sec_per_mpair":$wPerM,"winnow_pairs_after_exact_first":$wPairsAfter,"winnow_sec_after_exact_first":$wSecAfter%.2f}""")
      f""""x$s":{"pairs":$pairs,"sec":$sec%.2f,"sec_per_mpair":$perM,"pairs_after_exact_first":$pairsAfterExact,"sec_after_exact_first":$secAfter%.2f,"cluster_ids":$nIds,"label_match":$nMatch,"only_allpairs":${nAp - nMatch},"only_star":${nStar - nMatch},"winnow_pairs":$wPairs,"winnow_sec":$wSec%.2f,"winnow_sec_per_mpair":$wPerM,"winnow_pairs_after_exact_first":$wPairsAfter,"winnow_sec_after_exact_first":$wSecAfter%.2f}"""
    }
    val json = rows.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("pairmass.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
