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
  * ALL m subspaces train together in ONE corpus pass per iteration (the
  * (sub, slice) explode below), so the scan count is iters+1 regardless
  * of m; nearest-centroid assignment is the map-side-combinable
  * `argmin_by` aggregate — the k candidate rows per vector
  * collapse to one BEFORE the exchange and nothing is ever sorted (the
  * row_number-window alternative shuffles corpus×k rows and sorts every
  * vector's candidate list — the shape that does not survive k=256);
  * encoding is one corpus pass; ADC search broadcasts the query set and
  * scans codes once. Train on a SAMPLE at real scale — standard PQ
  * practice. No corpus self-join anywhere.
  */
object Pq {

  /** Squared L2 distance `‖a−b‖² = a·a − 2·a·b + b·b` as one fixed IEEE
    * expression tree over the codegen'd [[graft.functions.VecDot]]. */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, a) -
      lit(2.0) * graft.functions.VectorFunctions.vecDot(a, b) +
      graft.functions.VectorFunctions.vecDot(b, b)

  /** One row per (vec, sub): `sub ∈ [0, m)`, `sl` = that subspace's slice.
    * A single scan materializes every subspace — the layout that lets all
    * m codebooks train/encode together. */
  private def explodeSubspaces(df: DataFrame, idCol: String, embCol: String,
                               m: Int, width: Int): DataFrame =
    df.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col(embCol), j * lit(width) + lit(1), lit(width))))
        .as(Seq("sub", "sl")))

  /** Per-subspace L2 k-means codebooks: one row per (sub, cid) with the
    * learned `centroid` (double array, 6-dp means). `dim` must divide into
    * `m` equal slices. Every training iteration is ONE pass over the
    * exploded (sub, slice) corpus — all m subspaces assign and update
    * together. */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
                     idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m slices")
    require(k >= 1 && iters >= 0)
    val width = dim / m
    val subs = explodeSubspaces(corpus, idCol, embCol, m, width)
    // init: the k lowest-id vectors' slices per subspace; cid = id-rank.
    // The global row_number window runs over k rows, not the corpus.
    var cents = explodeSubspaces(
        corpus.orderBy(col(idCol)).limit(k)
          .withColumn("cid", row_number().over(Window.orderBy(col(idCol))) - 1),
        "cid", embCol, m, width)
      .select(col("sub"), col("cid"),
        transform(col("sl"), v => v.cast("double")).as("centroid"))
    for (_ <- 1 to iters) {
      cents = assign(subs, cents, idCol)
        .select(col("sub"), col("cid"), posexplode(col("sl")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(round(avg(col("v")), 6).as("cv"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("centroid"))
    }
    cents
  }

  /** Nearest-centroid assignment across all subspaces at once (argmin
    * squared L2 within each (vec, sub), ties to the lowest centroid id).
    *
    * The argmin is the [[graft.functions.ArgMinBy]] aggregate — one entry
    * of state per (vec, sub), ObjectHashAggregate (no sort anywhere), and
    * map-side combinable: the k candidate rows per (vec, sub) collapse to
    * one BEFORE the exchange. The slice rides through as the payload, so
    * no join-back is needed to update centroids. */
  private def assign(subs: DataFrame, cents: DataFrame, idCol: String): DataFrame = {
    val scored = subs.join(broadcast(cents), Seq("sub"))
      .withColumn("d", sqDist(col("sl"), col("centroid")))
    scored.groupBy(col(idCol), col("sub"))
      .agg(graft.functions.ArgMinBy.argminBy(
        col("d"), col("cid").cast("long"), col("sl")).as("__best"))
      .select(col(idCol), col("sub"),
        col("__best").getField("payload").as("sl"),
        col("__best").getField("id").cast("int").as("cid"))
  }

  /** PQ codes in long format: one row per (vec, sub) with the centroid id
    * — the layout an ADC table join consumes directly. One corpus pass
    * encodes every subspace. */
  def encode(corpus: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
             idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    require(m >= 1 && dim % m == 0)
    val width = dim / m
    assign(explodeSubspaces(corpus, idCol, embCol, m, width), codebooks, idCol)
      .select(col(idCol), col("sub"), col("cid"))
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
    * neighbor id, self-matches excluded). The per-query top-k is a
    * bounded-heap aggregate ([[graft.functions.TopKBy]]) — state is k
    * entries per query, combined map-side; no per-query sort of the
    * scored corpus. */
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
    graft.functions.TopKBy.rankAscending(scored, "query_id",
        ordCol = "adc_dist", idCol = "neighbor_id", k = topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
  }

  /** Persistable PQ index: the trained codebooks (m·k tiny rows) and the
    * per-vector codes (m small ids each) — everything ADC search touches.
    * Build once with [[buildIndex]], persist both frames (parquet), and
    * every subsequent query batch runs [[adcSearch]] without re-training
    * or re-reading raw embeddings: the production "build once, search
    * many" shape, where the searchable state is 4-8 bytes per vector. */
  final case class PqIndex(codebooks: DataFrame, codes: DataFrame)

  /** Train + encode in one pass over the corpus (see [[trainCodebooks]] /
    * [[encode]] for the plan shapes). */
  def buildIndex(corpus: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
                 idCol: String = "vec_id", embCol: String = "embedding"): PqIndex = {
    val books = trainCodebooks(corpus, dim, m, k, iters, idCol, embCol)
    PqIndex(books, encode(corpus, books, dim, m, idCol, embCol))
  }

  /** ADC top-k against a prebuilt [[PqIndex]] — identical results to
    * [[adcKnn]], but the corpus embeddings are never touched: the search
    * reads codes + codebooks only (reconstruct → score → bounded-heap
    * rank). */
  def adcSearch(index: PqIndex, queries: DataFrame, topK: Int,
                idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    val recon = reconstruct(index.codes, index.codebooks, idCol)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val scored = recon.select(col(idCol).as("neighbor_id"), col("recon"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", sqDist(col("q_emb"), col("recon")))
    graft.functions.TopKBy.rankAscending(scored, "query_id",
        ordCol = "adc_dist", idCol = "neighbor_id", k = topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
  }

  /** IVF-ADC — the FAISS IVFPQ composition (coarse quantizer + product
    * codes, no residual encoding), the canonical 100 TB ANN shape: a
    * deterministic coarse k-means ([[Similarity.kmeansClusters]]) routes
    * each query to its `nprobe` best clusters, and ADC scores the PQ
    * reconstructions of ONLY those clusters' members.
    *
    * At scale the corpus-sized state is codes + a cluster id (4-8 bytes
    * per vector); a query touches ~nprobe/nlist of it, and both the
    * codebooks and the routed query set broadcast. Recall < 1 by
    * construction (coarse routing AND quantization) — measured against
    * brute force in PqSpec. Every training step reuses the argmin
    * aggregate; both rankings are bounded-heap `topk_by`. */
  def ivfAdcKnn(corpus: DataFrame, queries: DataFrame, topK: Int, dim: Int,
                m: Int, k: Int, iters: Int,
                nlist: Int = 8, nprobe: Int = 1, coarseIters: Int = 2,
                idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    require(nprobe >= 1)
    val (members, centroids) =
      Similarity.kmeansClusters(corpus, nlist, coarseIters, idCol, embCol)
    val books = trainCodebooks(corpus, dim, m, k, iters, idCol, embCol)
    val recon = reconstruct(encode(corpus, books, dim, m, idCol, embCol), books, idCol)
    // query routing: nprobe best coarse centroids by cosine (ties to the
    // lower cluster id) — queries × nlist rows, window is fine here
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val qc = q.crossJoin(broadcast(centroids))
      .withColumn("ccos", Similarity.cosine(col("q_emb"), col("centroid")))
    val wq = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cl"))
    val assigned = qc.withColumn("r", row_number().over(wq))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cl"))
    // ADC over the probed clusters' reconstructions only
    val scored = recon.join(members.select(col(idCol), col("cl")), idCol)
      .select(col(idCol).as("neighbor_id"), col("recon"), col("cl"))
      .join(broadcast(assigned), Seq("cl"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", sqDist(col("q_emb"), col("recon")))
    graft.functions.TopKBy.rankAscending(scored, "query_id",
        ordCol = "adc_dist", idCol = "neighbor_id", k = topK, tagCol = Some("cl"))
      .select(col("query_id"), col("cl").cast("int").as("probed_cluster"),
        col("neighbor_id"), col("adc_dist"), col("rank"))
  }
}
