package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the simpler, lossier sibling of product
  * quantization ([[Pq]]): each embedding DIMENSION quantizes
  * independently into an 8-bit code against per-dimension corpus bounds,
  * shrinking a float vector 4× (one byte per dim) with no codebook
  * training at all — the compression FAISS ships as `SQ8` and the usual
  * first step before PQ is worth its training cost.
  *
  * `code_i = round((x_i − lo_i) / (hi_i − lo_i) · 255)`; search scores
  * queries (uncompressed, asymmetric — like ADC) against the
  * reconstruction `lo_i + code_i · (hi_i − lo_i) / 255`.
  *
  * Determinism: bounds are exact min/max selections; quantize and
  * reconstruct are one fixed IEEE tree per dimension, so any engine
  * replays codes and distances bit-for-bit. A degenerate dimension
  * (hi = lo) codes to 0 and reconstructs to lo.
  *
  * Scale shape: bounds are ONE corpus pass (posexplode + map-side
  * min/max into `dim` rows — the one justified tiny `.collect()`, same
  * contract as the BPE vocab); encode is one pass emitting 1 B/dim
  * codes; search broadcasts the query set and scans codes once, ranking
  * through the bounded-heap `topk_by` (no per-query sort). No corpus
  * self-join anywhere.
  */
object Sq {

  /** Per-dimension corpus bounds, positionally indexed. */
  final case class SqBounds(los: Array[Double], his: Array[Double])

  /** One corpus pass → `dim` (lo, hi) rows → driver arrays. Fails loudly
    * if the corpus is empty or a vector is not `dim` wide. */
  def trainBounds(corpus: DataFrame, dim: Int,
                  embCol: String = "embedding"): SqBounds = {
    val rows = corpus
      .select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .orderBy(col("pos"))
      .collect()
    require(rows.length == dim,
      s"expected $dim dimensions, corpus has ${rows.length}")
    SqBounds(rows.map(_.getAs[Double]("lo")), rows.map(_.getAs[Double]("hi")))
  }

  private def loAt(b: SqBounds, i: Column) = element_at(lit(b.los), i + 1)
  private def hiAt(b: SqBounds, i: Column) = element_at(lit(b.his), i + 1)

  /** (id, codes): `codes` is an INT array in [0, 255], 1 byte/dim of
    * information — the persistable search state. */
  def encode(df: DataFrame, bounds: SqBounds, idCol: String = "vec_id",
             embCol: String = "embedding"): DataFrame =
    df.select(col(idCol), transform(col(embCol), (x, i) => {
      val (lo, hi) = (loAt(bounds, i), hiAt(bounds, i))
      when(hi === lo, lit(0)).otherwise(
        round((x.cast("double") - lo) / (hi - lo) * lit(255.0)).cast("int"))
    }).as("codes"))

  /** (id, recon): dequantize codes back to the representable grid point —
    * `lo + code · (hi − lo) / 255`, bit-identical to quantizing and
    * reconstructing in one tree (codes are exact integers ≤ 255). */
  def reconstruct(codes: DataFrame, bounds: SqBounds,
                  idCol: String = "vec_id"): DataFrame =
    codes.select(col(idCol), transform(col("codes"), (c, i) => {
      val (lo, hi) = (loAt(bounds, i), hiAt(bounds, i))
      when(hi === lo, lo).otherwise(
        lo + c.cast("double") * (hi - lo) / lit(255.0))
    }).as("recon"))

  /** Asymmetric top-k against the SQ8 reconstruction: bounds → encode →
    * reconstruct → squared-L2 rank (ties to the lower neighbor id).
    * Emits (query_id, neighbor_id, sq_dist, rank). */
  def sq8Knn(corpus: DataFrame, queries: DataFrame, topK: Int, dim: Int,
             idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    val bounds = trainBounds(corpus, dim, embCol)
    val recon = reconstruct(encode(corpus, bounds, idCol, embCol), bounds, idCol)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val scored = recon.select(col(idCol).as("neighbor_id"), col("recon"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sq_dist", Pq.sqDist(col("q_emb"), col("recon")))
    graft.functions.TopKBy.rankAscending(scored, "query_id",
        ordCol = "sq_dist", idCol = "neighbor_id", k = topK)
      .select(col("query_id"), col("neighbor_id"), col("sq_dist"), col("rank"))
  }
}
