package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the embedding-compression path for ANN over
  * corpora too large to hold raw vectors: split each d-dim vector into `m`
  * subspaces, learn a tiny k-centroid codebook per subspace (classic
  * Jegou/Douze/Schmid PQ), and store each vector as `m` small centroid
  * ids. A 64-float vector at m=4/k=256 shrinks 64× (256 B → 4 B); at
  * 100 TB of embeddings that is the difference between scanning raw
  * vectors and scanning codes.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * uncompressed and scores against each vector's RECONSTRUCTION (the
  * concatenation of its centroids). Squared-L2 to the reconstruction
  * decomposes per subspace, so scoring one fold over the reconstructed
  * array is mathematically the table-lookup ADC sum — and evaluating it as
  * one `vec_dot`-based expression keeps a single left-to-right fold order
  * that the DuckDB oracle replays bit-for-bit.
  *
  * Determinism protocol (same as [[Similarity.kmeansClusters]]): init
  * centroids are the `k` lowest-id vectors' slices, per-dimension means
  * round to 6 decimals each iteration, and argmin ties break to the
  * lowest centroid id.
  *
  * Scale notes: codebooks are m·k tiny vectors — they always broadcast;
  * encoding is one corpus pass per training step (train on a SAMPLE at
  * real scale — standard PQ practice); ADC search broadcasts the query
  * set and scans codes once. No corpus self-join anywhere.
  */
object Pq {

  /** Squared L2 distance `‖a−b‖² = a·a − 2·a·b + b·b` as one fixed IEEE
    * expression tree over the codegen'd [[graft.functions.VecDot]]. */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, a) -
      lit(2.0) * graft.functions.VectorFunctions.vecDot(a, b) +
      graft.functions.VectorFunctions.vecDot(b, b)

  private def subSlice(embCol: String, sub: Int, width: Int): Column =
    slice(col(embCol), sub * width + 1, width)

  /** Per-subspace L2 k-means codebooks: one row per (sub, cid) with the
    * learned `centroid` (double array, 6-dp means). `dim` must divide into
    * `m` equal slices. */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
                     idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m slices")
    require(k >= 1 && iters >= 0)
    val width = dim / m
    val books = (0 until m).map { j =>
      val sliced = corpus.select(col(idCol), subSlice(embCol, j, width).as("sl"))
      var cents = sliced.orderBy(col(idCol)).limit(k)
        .withColumn("cid", row_number().over(Window.orderBy(col(idCol))) - 1)
        .select(col("cid"), transform(col("sl"), v => v.cast("double")).as("centroid"))
      for (_ <- 1 to iters) {
        cents = assign(sliced, cents)
          .select(col("cid"), posexplode(col("sl")).as(Seq("pos", "v")))
          .groupBy(col("cid"), col("pos"))
          .agg(round(avg(col("v")), 6).as("cv"))
          .groupBy(col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
            s => s.getField("cv")).as("centroid"))
      }
      cents.select(lit(j).as("sub"), col("cid"), col("centroid"))
    }
    books.reduce(_ unionByName _)
  }

  /** Nearest-centroid assignment within one subspace (argmin squared L2,
    * ties to the lowest centroid id). */
  private def assign(sliced: DataFrame, cents: DataFrame): DataFrame = {
    val scored = sliced.crossJoin(broadcast(cents))
      .withColumn("d", sqDist(col("sl"), col("centroid")))
    val w = Window.partitionBy(sliced.columns.head).orderBy(col("d"), col("cid"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .drop("d", "r", "centroid")
  }

  /** PQ codes in long format: one row per (vec, sub) with the centroid id
    * — the layout an ADC table join consumes directly. */
  def encode(corpus: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
             idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    require(m >= 1 && dim % m == 0)
    val width = dim / m
    (0 until m).map { j =>
      val sliced = corpus.select(col(idCol), subSlice(embCol, j, width).as("sl"))
      assign(sliced, codebooks.filter(col("sub") === j).drop("sub"))
        .select(col(idCol), lit(j).as("sub"), col("cid"))
    }.reduce(_ unionByName _)
  }

  /** Reconstructed vectors: concatenation of each vector's m centroids —
    * the decompressed form ADC scores against. */
  def reconstruct(codes: DataFrame, codebooks: DataFrame,
                  idCol: String = "vec_id"): DataFrame =
    codes.join(broadcast(codebooks), Seq("sub", "cid"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("centroid")))),
        s => s.getField("centroid"))).as("recon"))

  /** End-to-end PQ ANN: train → encode → reconstruct → ADC top-k per
    * query (ascending squared L2 to the reconstruction, ties to the lower
    * neighbor id, self-matches excluded). */
  def adcKnn(corpus: DataFrame, queries: DataFrame, topK: Int, dim: Int,
             m: Int, k: Int, iters: Int,
             idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    val books = trainCodebooks(corpus, dim, m, k, iters, idCol, embCol)
    val recon = reconstruct(encode(corpus, books, dim, m, idCol, embCol), books, idCol)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val scored = recon.select(col(idCol).as("neighbor_id"), col("recon"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", sqDist(col("q_emb"), col("recon")))
    val w = Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("long").as("rank"))
  }
}
