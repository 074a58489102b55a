package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the substring tier's DETECTION FLOOR (round-12 verdict #3):
  * [[operators.Dedup.substringSpans]] at stride s only GUARANTEES catching
  * shared substrings ≥ `minLen + s − 1` chars (some sampled gram must land
  * fully inside the shared region regardless of alignment phase); shorter
  * shared substrings (minLen .. minLen+s−2) are caught only when the
  * sampling phase happens to align. This probe turns that documented
  * caveat into a measured number: the fraction of duplicated CHARACTER
  * MASS the strided pass removes relative to the exhaustive stride-1 pass
  * (`substringCut`'s `removed_chars` is exactly the union-merged dup-span
  * mass per document).
  *
  * Two corpora:
  *  - the sf documents table (realistic duplication: whole-document
  *    near-replicas and long shared boilerplate, far above the floor);
  *  - an ADVERSARIAL phase-shifted fixture: doc pairs sharing a secret of
  *    exactly minLen..minLen+s−2 chars behind pads of varying length, so
  *    every hit depends on alignment phase — the floor's worst case.
  *
  * Output: substringfloor.json + PROBE lines; SCALE.md carries the row. */
object SubstringFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", "4m") // see Bench — small-data page fix
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val minLen = 30
    val strides = Seq(1, 5, 10, 15)

    def removedMass(docs: DataFrame, stride: Int,
                    len: Int = minLen): (Long, Double) = {
      val t0 = System.nanoTime()
      val m = operators.Dedup.substringCut(docs, "doc_id", "text",
          minLen = len, stride = stride)
        .agg(sum(col("removed_chars"))).head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      (m, sec)
    }

    // the phase-robust path: winnowing at density dial w = minLen−noise+1
    // (comparable shuffle volume to stride ≈ (w+1)/2); detection is
    // guaranteed for every shared substring ≥ minLen at ANY phase, so the
    // adversarial corpus should hold its caught fraction where stride
    // sampling collapses to ~1/stride
    def winnowedMass(docs: DataFrame, noise: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val m = operators.Dedup.winnowedCut(docs, "doc_id", "text",
          minLen = minLen, noise = noise)
        .agg(sum(col("removed_chars"))).head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.release(blocking = true)
      spark.catalog.clearCache()
      (m, sec)
    }

    // Adversarial phase fixture: 200 doc pairs; pair i shares a secret of
    // exactly minLen + (i % 10) chars (30..39). Even pairs are
    // PHASE-ALIGNED (offset difference ≡ 0 mod 10): the floor guarantee
    // applies — caught at stride 10 iff a sampled offset lands inside,
    // certain at |secret| = 39. Odd pairs are MISALIGNED by 1..9: both
    // sides sample different windows of the secret, so the sampled gram
    // STRINGS differ and stride 10 misses them at ANY length — the
    // honest worst case of two-sided sampling. Pads/tails/secrets are
    // java.util.Random soup (seeded per doc) so nothing else repeats.
    def soup(seed: Long, len: Int): String = {
      val r = new java.util.Random(seed)
      (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val adv = (0 until 200).flatMap { i =>
      val secretLen = minLen + (i % 10)
      val secret = soup(900000L + i, secretLen)
      val alignShift = if (i % 2 == 0) 0 else 1 + (i / 2) % 9
      val padALen = i % 10
      val padBLen = (padALen + alignShift) % 10
      Seq(
        (i * 2L, f"U$i%03dA" + soup(910000L + i, padALen) + secret +
          soup(930000L + i, 40)),
        (i * 2L + 1, f"V$i%03dB" + soup(920000L + i, padBLen) + secret +
          soup(940000L + i, 40)))
    }.toDF("doc_id", "text")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    val rows = Seq("documents" -> docs, "adversarial" -> adv).map {
      case (cname, corpus) =>
        val base = removedMass(corpus, 1)._1
        val entries = strides.map { s =>
          val (m, sec) = removedMass(corpus, s)
          val frac = if (base > 0) m.toDouble / base else Double.NaN
          println(f"""PROBE {"corpus":"$cname","stride":$s,"removed_chars":$m,"caught_fraction":$frac%.4f,"sec":$sec%.2f}""")
          f""""s$s":{"removed_chars":$m,"caught_fraction":$frac%.4f,"sec":$sec%.2f}"""
        }
        // winnow rows: noise 21 → w=10 (the stride-10 cost twin), noise 26
        // → w=5 (the stride-5 cost twin). Winnow's effective cut floor is
        // the NOISE length (a selected shared 21-char gram is cut even
        // when the shared region is < minLen), so its honest denominator
        // is the exhaustive stride-1 cut AT minLen = noise — the upper
        // bound of what its own detection floor can remove. Fractions vs
        // the minLen-30 base would read > 1 on boilerplate-heavy corpora
        // (measured 3.31× on sf0.01 documents) — real extra removal, not
        // an artifact, but the wrong yardstick for recall.
        val winnowed = Seq(21, 26).map { noise =>
          val w = minLen - noise + 1
          val noiseBase = removedMass(corpus, 1, len = noise)._1
          val (m, sec) = winnowedMass(corpus, noise)
          val frac = if (noiseBase > 0) m.toDouble / noiseBase else Double.NaN
          println(f"""PROBE {"corpus":"$cname","winnow_w":$w,"noise":$noise,"removed_chars":$m,"noise_base":$noiseBase,"caught_fraction":$frac%.4f,"sec":$sec%.2f}""")
          f""""w$w":{"noise":$noise,"removed_chars":$m,"noise_base":$noiseBase,"caught_fraction":$frac%.4f,"sec":$sec%.2f}"""
        }
        // r14 (r13 verdict #5): EDGE-PAD evaluation, char-exact. The
        // uncovered mass at w10 is region EDGES — the selection guarantee
        // bounds a true region's extent to < w−1 chars beyond the extreme
        // dup fingerprint on each side, so padding every dup span by w−1
        // guarantees full region coverage at a bounded over-cut. Ground
        // truth per char = the exhaustive stride-1 dup mass at len=noise
        // (the same yardstick as the caught_fraction rows); reported per
        // pad: caught = |win ∩ base| / |base| and overcut = |win \ base|
        // / |win| — the recall bought and the precision paid.
        val noise = 21
        val w = minLen - noise + 1
        val chars = corpus.select(col("doc_id"),
          explode(sequence(lit(1), length(col("text")))).as("c"))
        def coverSet(spans: DataFrame): DataFrame =
          chars.alias("ch").join(spans.alias("sp"),
            col("ch.doc_id") === col("sp.doc_id") &&
              col("ch.c") >= col("sp.s") && col("ch.c") < col("sp.e"),
            "left_semi")
        val baseSet = coverSet(
          operators.Dedup.substringSpans(corpus, "doc_id", "text",
              minLen = noise, stride = 1)
            .filter(col("dup"))
            .select(col("doc_id"), col("pos").as("s"),
              (col("pos") + lit(noise)).as("e"))).persist()
        val nBase = baseSet.count()
        val padRows = Seq(0, w - 1).map { pad =>
          val winSet = coverSet(
            operators.Dedup.winnowedSpans(corpus, "doc_id", "text",
                minLen = minLen, noise = noise)
              .filter(col("dup"))
              .select(col("doc_id"), (col("pos") - lit(pad)).as("s"),
                (col("pos") + lit(noise + pad)).as("e"))).persist()
          val nWin = winSet.count()
          val nBoth = winSet.join(baseSet, Seq("doc_id", "c"), "left_semi").count()
          winSet.unpersist()
          CacheScope.release(blocking = true)
          val caught = if (nBase > 0) nBoth.toDouble / nBase else Double.NaN
          val overcut = if (nWin > 0) (nWin - nBoth).toDouble / nWin else 0.0
          println(f"""PROBE {"corpus":"$cname","winnow_pad":$pad,"caught_char_fraction":$caught%.4f,"overcut_fraction":$overcut%.4f,"base_chars":$nBase,"cut_chars":$nWin}""")
          f""""pad$pad":{"caught_char_fraction":$caught%.4f,"overcut_fraction":$overcut%.4f,"base_chars":$nBase,"cut_chars":$nWin}"""
        }
        baseSet.unpersist()
        spark.catalog.clearCache()
        s""""$cname":{${(entries ++ winnowed ++ padRows).mkString(",")}}"""
    }
    val json = s"""{"minLen":$minLen,${rows.mkString(",")}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("substringfloor.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
