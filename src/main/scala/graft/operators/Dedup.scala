package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB regime:
  *
  *  - exact: hash-groupBy — one shuffle on the content hash, no full-text
  *    comparison (hash first, texts never co-located).
  *  - MinHash + LSH: candidate generation is a self-join on (band,
  *    signature) buckets — candidate count scales with true near-duplicates,
  *    not O(n²); verification joins only candidate pairs.
  *  - SimHash: 32-bit fingerprint per doc; hamming-≤k pairs found by
  *    chunk-banding (pigeonhole), again avoiding O(n²).
  *  - n-gram Jaccard: exact pairwise similarity with shingle-blocking; the
  *    LSH variant is the scale path, this is the precision reference.
  *
  * All hashes derive from md5 (identical across engines), so every operator
  * is bit-reproducible and DuckDB-oracle-checkable.
  */
object Dedup {

  /** Exact dedup: one row per distinct text with the surviving (minimum) id
    * and the multiplicity. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: k independent hash functions simulated as
    * md5(i || ":" || shingle); the per-(doc, i) minimum of the 15-hex-char
    * prefix (string order == numeric order on fixed-width lowercase hex). */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.select(col(idCol), explode(sequence(lit(0), lit(k - 1))).as("i"), col("shingle"))
      .withColumn("h", substring(md5(concat(col("i").cast("string"), lit(":"), col("shingle"))), 1, 15))
      .groupBy(col(idCol), col("i"))
      .agg(min(col("h")).as("mh"))

  /** LSH band signatures: group the k minhashes into `bands` bands and
    * concatenate each band's minhashes into one bucket key. */
  def lshBands(sigs: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sigs.withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("mh")))),
        s => s.getField("mh")), "|").as("sig"))

  /** Candidate pairs: docs sharing at least one (band, sig) bucket. */
  def lshCandidates(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard for a set of candidate pairs over the shingle sets. */
  def jaccard(sh: DataFrame, idCol: String, candidates: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val sa = sh.select(col(idCol).as("id_a"), col("shingle"))
    val sb = sh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = candidates.join(sa, "id_a").join(sb, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket-join
    * → exact-Jaccard verify → threshold. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, rowsPerBand: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val sh = TextOps.shingles(df, idCol, textCol, 3)
    val cands = lshCandidates(lshBands(minhashSignatures(sh, idCol, k), idCol, rowsPerBand), idCol)
    jaccard(sh, idCol, cands).filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard pairs with shingle blocking (pairs must share at
    * least one shingle — exact, since jaccard > 0 implies a shared shingle). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = TextOps.shingles(df, idCol, textCol, n)
    val cands = sh.select(col(idCol).as("id_a"), col("shingle"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), "shingle")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    jaccard(sh, idCol, cands).filter(col("jaccard") >= threshold)
  }

  /** 32 (j, 2^j) pairs as a literal array — Spark's shiftleft only takes a
    * literal shift, so the powers are precomputed. */
  private val bitPowers = {
    val pairs = (0 until 32).map(j => (j, 1L << j))
    typedlit(pairs)
  }

  /** SimHash: 32-bit fingerprint = majority vote per bit over the md5-derived
    * 32-bit hashes of the document's distinct tokens. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w")).distinct()
    val hashed = toks.withColumn("h",
      conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"))
    hashed
      .select(col(idCol), col("h"), explode(bitPowers).as("jp"))
      .select(col(idCol), col("h"), col("jp._1").as("j"), col("jp._2").as("p"))
      .withColumn("contrib", when(col("h").bitwiseAND(col("p")) > 0, 1).otherwise(-1))
      .groupBy(col(idCol), col("j"), col("p"))
      .agg(sum(col("contrib")).as("vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") > 0, col("p")).otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, found via
    * chunk banding: with 4 8-bit chunks, hamming ≤ 3 implies at least one
    * identical chunk (pigeonhole), so candidates come from equi-joins on
    * chunk values, never a cross join. */
  def simhashPairs(fps: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 32 / nChunks
    val chunked = fps.select(col(idCol), col("simhash"),
      explode(sequence(lit(0), lit(nChunks - 1))).as("c"))
      .withColumn("chunk_val",
        (col("simhash") / pow(lit(2.0), col("c") * chunkBits)).cast("long") % (1L << chunkBits))
    val a = chunked.select(col(idCol).as("id_a"), col("simhash").as("fp_a"), col("c"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("simhash").as("fp_b"), col("c"), col("chunk_val"))
    a.join(b, Seq("c", "chunk_val")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
