package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design:
  *  - [[cosine]] is a pure column expression (cast-to-double, zip-multiply,
  *    sequential fold — deterministic, bit-reproducible, codegen-friendly);
  *  - [[bruteForceKnn]] broadcasts the (small) query set and computes the
  *    top-k with a bounded-heap aggregate — one pass over the corpus, no
  *    sort, and only k entries per query cross the exchange;
  *  - [[ivfKnn]] is the scale path: corpus pre-clustered (here by the
  *    `label` column standing in for IVF coarse centroids), queries probe
  *    only their nearest cluster → touches 1/nlist of the corpus;
  *  - [[embeddingNearDupPairs]] finds near-duplicate vectors above a cosine
  *    threshold, candidate-limited by sign-bit LSH buckets.
  */
object Similarity {

  /** Opt-OUT sentinel for [[semanticDedup]]'s pair-space guard: pass as
    * `maxClusterSize` to get the exact unguarded same-cluster pair space
    * (full recall; quadratic under cluster skew — measured exponent 0.33
    * and rising on the replica-skew probe). */
  val Unbounded: Long = 0L

  /** Default [[semanticDedup]] block cap: bounds the candidate pair space
    * to O(n·cap) no matter how skewed the clusters get (measured probe
    * exponent 0.03 vs 0.33 unguarded). 10 000 keeps per-block compare
    * cost bounded (~5·10⁷ cosines worst case per block) while staying a
    * no-op for any cluster a √n-sized nlist keeps under ten thousand
    * vectors — callers who need exact recall pass [[Unbounded]]. */
  val DefaultMaxClusterSize: Long = 10000L

  /** Sequential-fold cosine (vectors assumed unit-norm; otherwise this is
    * the raw dot product). Backed by the native codegen'd [[graft.functions.VecDot]]
    * expression — same left-to-right fold order as the DuckDB oracle's
    * `list_reduce`, but ~10× faster than the CodegenFallback HOF chain
    * (`aggregate(zip_with(...))`) it replaces. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** Brute-force top-k cosine neighbours for each query vector.
    * `queries` must be small (it is broadcast). Excludes self-matches.
    * The per-query top-k is a bounded-heap aggregate
    * ([[graft.functions.TopKBy]]): state is k entries per query, combined
    * map-side — the corpus is scanned once and never sorted (the ranking
    * window it replaces put each query's entire scored corpus slice into
    * one partition and sorted it). */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    graft.functions.TopKBy.rankDescending(scored, "query_id",
        ordCol = "cos", idCol = "neighbor_id", k = k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").as("cosine"), col("rank"))
  }

  /** Hard-negative mining for contrastive/metric training: for each
    * query, the `k` MOST SIMILAR corpus vectors with a DIFFERENT label —
    * the negatives that actually teach a margin (random negatives are
    * trivially far; these sit right at the decision boundary). The
    * complement of [[Sampling.negativePairs]]' uniform ring: use both —
    * uniform negatives early, hard negatives as training sharpens.
    *
    * Same plan as [[bruteForceKnn]] (broadcast queries, one corpus
    * pass, bounded-heap top-k, codegen'd `vec_dot`) with the label
    * inequality fused into the join condition — mismatched rows never
    * reach the scorer. Labels must be integral (they ride the heap's
    * tag channel so the output can surface them). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
      col(labelCol).cast("long").as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
      col(labelCol).cast("long").as("n_label"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("q_label") =!= col("n_label"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    graft.functions.TopKBy.rankDescending(scored, "query_id",
        ordCol = "cos", idCol = "neighbor_id", k = k, tagCol = Some("n_label"))
      .select(col("query_id"), col("neighbor_id"),
        col("n_label").cast("int").as("neg_label"),
        col("cos").as("cosine"), col("rank"))
  }

  /** kNN label-consistency — the standard no-training embedding-quality
    * probe: for each query vector, what fraction of its k nearest corpus
    * neighbors (cosine, self excluded) carry the query's own label, then
    * one row per label: (`label`, `n_queries`, `hits`, `n_scored`,
    * `consistency` = hits/n_scored). A healthy embedding scores far above
    * the label-prior baseline; a label whose score sits AT the prior is
    * not separated in embedding space at all.
    *
    * Plan: the [[bruteForceKnn]] shape (broadcast queries, one corpus
    * pass, bounded-heap top-k with the neighbor label on the heap's tag
    * channel) + a broadcast re-join of the tiny (query, label) frame and
    * two exact-integer aggregations; the one IEEE division is the final
    * ratio. `n_scored` (actual ranked rows, ≤ n_queries·k) is the
    * denominator, so a corpus smaller than k stays honest. */
  def knnLabelConsistency(corpus: DataFrame, queries: DataFrame, k: Int,
                          idCol: String = "vec_id",
                          embCol: String = "embedding",
                          labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).as("q_emb"), col(labelCol).cast("long").as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(embCol).as("c_emb"), col(labelCol).cast("long").as("n_label"))
    val scored = c.join(broadcast(q.select(col("query_id"), col("q_emb"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    val ranked = graft.functions.TopKBy.rankDescending(scored, "query_id",
      ordCol = "cos", idCol = "neighbor_id", k = k, tagCol = Some("n_label"))
    ranked
      .join(broadcast(q.select(col("query_id"), col("q_label"))), "query_id")
      .groupBy(col("query_id"), col("q_label"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("n_label") === col("q_label"), lit(1L))
          .otherwise(lit(0L))).as("__h"))
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"), sum(col("__h")).as("hits"),
        sum(col("__n")).as("n_scored"))
      .withColumn("consistency",
        col("hits").cast("double") / col("n_scored").cast("double"))
  }

  /** IVF-style clustered ANN: centroids are the per-cluster mean vectors
    * (rounded to 6 decimals for cross-engine determinism of the group-sum);
    * each query probes only its `nprobe` nearest centroids' clusters —
    * the standard IVF recall/cost dial (corpus fraction touched ≈
    * nprobe/nlist). Recall < 1 by construction — this is the 1000-executor
    * path where brute force is no longer an option. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             idCol: String = "vec_id", embCol: String = "embedding",
             clusterCol: String = "label", nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1)
    val dims = corpus.select(col(idCol), col(clusterCol).as("cl"),
        posexplode(col(embCol)).as(Seq("pos", "v")))
    val centroids = dims.groupBy(col("cl"), col("pos"))
      .agg(round(avg(col("v")), 6).as("cv"))
      .groupBy(col("cl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))
    val members = corpus.select(col(idCol), col(embCol), col(clusterCol).as("cl"))
    probe(members, centroids, queries, k, nprobe, idCol, embCol)
  }

  /** IVF with LEARNED coarse centroids: `iters` rounds of deterministic
    * k-means (init = the `nlist` lowest-id vectors; assignment = max-cosine
    * with ties to the lowest cluster; update = per-dimension mean rounded to
    * 6 decimals so the group-sum is cross-engine reproducible), then the
    * same nprobe probing as [[ivfKnn]].
    *
    * Scale: each round is one broadcast of nlist×dims doubles to a corpus
    * scan plus one groupBy(nlist×dims) agg — no corpus shuffle; rounds are
    * a fixed small constant (coarse quantizers converge in a few passes).
    * Recall vs brute force is measured in SimilaritySpec. */
  def ivfKnnLearned(corpus: DataFrame, queries: DataFrame, k: Int,
                    nlist: Int = 8, iters: Int = 2, nprobe: Int = 1,
                    idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val (members, centroids) = kmeansClusters(corpus, nlist, iters, idCol, embCol)
    probe(members, centroids, queries, k, nprobe, idCol, embCol)
  }

  /** Deterministic k-means for IVF coarse quantization. Returns
    * (corpus + `cl` assignment, centroids (cl, centroid)). All arithmetic
    * mirrors the DuckDB oracle bit-for-bit: double casts before multiply,
    * per-dimension mean rounded to 6 decimals, ties to the lowest cluster. */
  def kmeansClusters(corpus: DataFrame, nlist: Int, iters: Int,
                     idCol: String = "vec_id", embCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    require(nlist >= 1 && iters >= 0)
    // init: the nlist lowest-id vectors; cl = their id-rank. The global
    // row_number window runs over nlist rows, not the corpus.
    var centroids = corpus.orderBy(col(idCol)).limit(nlist)
      .withColumn("cl", row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("cl"),
        transform(col(embCol), v => v.cast("double")).as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assignClusters(corpus, centroids, idCol, embCol)
      centroids = assigned
        .select(col("cl"), posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy(col("cl"), col("pos"))
        .agg(round(avg(col("v")), 6).as("cv"))
        .groupBy(col("cl"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
          s => s.getField("cv")).as("centroid"))
    }
    (assignClusters(corpus, centroids, idCol, embCol), centroids)
  }

  /** Nearest-centroid assignment: one broadcast of the (tiny) centroid set
    * against a single corpus pass. The argmax is the map-side-combinable
    * [[graft.functions.ArgMinBy]] aggregate over the NEGATED cosine (IEEE
    * negation is exact, so min(−ccos) IS max(ccos) with the identical
    * −0.0/NaN sort semantics), ties to the lowest `cl` — exactly the
    * `ORDER BY ccos DESC, cl` tie-break. One entry of state per vector,
    * ObjectHashAggregate (no sort anywhere): the nlist candidate rows per
    * vector collapse to one BEFORE the exchange (the row_number-window
    * alternative shuffles corpus×nlist rows and sorts every vector's
    * candidate list). The embedding rides through as the payload. */
  private def assignClusters(corpus: DataFrame, centroids: DataFrame,
                             idCol: String, embCol: String): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("__negcos", negate(cosine(col(embCol), col("centroid"))))
    scored.groupBy(col(idCol))
      .agg(graft.functions.ArgMinBy.argminBy(
        col("__negcos"), col("cl").cast("long"), col(embCol)).as("__best"))
      .select(col(idCol),
        col("__best").getField("payload").as(embCol),
        col("__best").getField("id").cast("int").as("cl"))
  }

  /** Shared IVF probe: queries pick their `nprobe` best centroids, then rank
    * only those clusters' members. The query→centroid ranking keeps its
    * window (queries × nlist rows — tiny by contract); the member ranking
    * is the bounded-heap [[graft.functions.TopKBy]] aggregate (k entries of
    * state per query, map-side combinable, no per-query sort of the probed
    * clusters' members). The cluster id rides through the heap as the tag
    * channel, so it must be an integral type. */
  private def probe(members: DataFrame, centroids: DataFrame, queries: DataFrame,
                    k: Int, nprobe: Int, idCol: String, embCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val qc = q.crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("q_emb"), col("centroid")))
    val wq = Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cl"))
    val assigned = qc.withColumn("r", row_number().over(wq)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cl"))
    val c = members.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"), col("cl"))
    val scored = c.join(broadcast(assigned), Seq("cl"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    graft.functions.TopKBy.rankDescending(scored, "query_id",
        ordCol = "cos", idCol = "neighbor_id", k = k, tagCol = Some("cl"))
      .select(col("query_id"), col("cl").cast("int").as("probed_cluster"),
        col("neighbor_id"), col("cos").as("cosine"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    * method): cluster the corpus with the deterministic [[kmeansClusters]],
    * compare only SAME-CLUSTER pairs, and drop the higher-id vector of
    * every pair with cosine ≥ threshold (keep-lowest policy — a pure
    * function of the corpus). Returns the surviving rows.
    *
    * Scale design: the pair space is Σ|cluster|² instead of corpus² — the
    * published SemDeDup trick; nlist is the dial (more clusters → smaller
    * pair blocks, slightly lower recall at cluster borders). Clustering
    * cost is the [[kmeansClusters]] argmin-aggregate pass per iteration;
    * the pair join is an equi-join on the cluster id, never a cross join.
    *
    * CAVEAT — nlist must scale with the corpus: with a FIXED nlist a
    * single dense region at 100× the data becomes one mega-cluster and
    * Σ|cluster|² goes quadratic. Size nlist ≈ √n (the standard IVF rule);
    * `maxClusterSize` bounds the pair space REGARDLESS (measured on the
    * 10×/30× probes: unguarded exponent 0.33 and rising under replica
    * skew, guarded flat 0.03). The guard is therefore ON BY DEFAULT
    * ([[DefaultMaxClusterSize]]); pass [[Unbounded]] to opt into the
    * exact unguarded pair space (full recall, quadratic worst case).
    * The cap works in two stages:
    *
    *  1. Sign-bit LSH sub-split: a cluster over the cap is split by the
    *     sign pattern of its leading dimensions (just enough bits to
    *     bring the EXPECTED block under the cap). This is a heuristic,
    *     not a bound — it preserves recall (same-direction vectors share
    *     a sub-bucket) but identical vectors, sign-correlated dense
    *     regions, and embeddings with fewer than 16 informative leading
    *     dims all share sign bits and defeat it.
    *  2. Replayable id-hash salt: any (cluster, sub-bucket) STILL over
    *     the cap is salted `hash(id) mod ceil(size/cap)` with a Lehmer
    *     LCG (no engine hash — the DuckDB oracle replays it verbatim).
    *     A pure cost dial: near-dup pairs split across salts are missed
    *     (known recall loss, worst exactly where stage 1 failed), but
    *     block sizes are now ~cap w.h.p. REGARDLESS of the data, so the
    *     pair space has a hard O(n·cap) ceiling instead of Σ|block|²
    *     in expectation only.
    *
    * Both stages only REMOVE candidate pairs, so the guarded survivor
    * set is always a superset of the unguarded one. */
  def semanticDedup(corpus: DataFrame, threshold: Double,
                    nlist: Int = 8, iters: Int = 2,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    maxClusterSize: Long = DefaultMaxClusterSize): DataFrame = {
    Guards.requireNoReserved(corpus.columns,
      Seq("__sub", "__sub2", "__csz", "__ssz", "cl"), "Similarity.semanticDedup")
    val (members, _) = kmeansClusters(corpus, nlist, iters, idCol, embCol)
    val keyed =
      if (maxClusterSize <= 0L)
        members.withColumn("__sub", lit(0L)).withColumn("__sub2", lit(0L))
      else {
        // per-cluster sizes are nlist rows — broadcast back, never a window
        val sizes = members.groupBy("cl")
          .agg(count(lit(1)).as("__csz"))
        // mask = 2^ceil(log2(size/cap)) − 1: halve the expected block per
        // bit until it fits the cap; capped at 16 sign bits (65536-way
        // split). PURE-INTEGER ladder (size vs cap·2^b thresholds, the
        // 2^b saturated driver-side) — a float log2 here can straddle an
        // integer between engines at exact power-of-two ratios and flip
        // the bit count, so both this and the oracle compare longs only.
        def capAt(b: Int): Long =
          if (maxClusterSize > (Long.MaxValue >> b)) Long.MaxValue
          else maxClusterSize << b
        val mask = (0 to 15).foldRight(lit(65535L): Column)((b, acc) =>
          when(col("__csz") <= lit(capAt(b)), lit((1L << b) - 1L))
            .otherwise(acc))
        val powers = typedlit((0 until 16).map(j => 1L << j))
        val full = aggregate(
          zip_with(slice(col(embCol), 1, 16), powers,
            (v, p) => when(v > lit(0.0f), p).otherwise(lit(0L))),
          lit(0L), (acc, x) => acc + x)
        val signSplit = members.join(broadcast(sizes), "cl")
          .withColumn("__sub", when(col("__csz") <= maxClusterSize, lit(0L))
            .otherwise(full.bitwiseAND(mask)))
          .drop("__csz")
        // stage-2 hard bound: sub-buckets the sign split failed to shrink
        // (identical / sign-correlated vectors) get a replayable id-hash
        // salt. Two Lehmer rounds (h = 48271·k mod 2³¹−1, a bijection on
        // the residues) — pure integer arithmetic the oracle replays;
        // 48271·k stays far inside BIGINT for k < 2³¹−1.
        val subSizes = signSplit.groupBy("cl", "__sub")
          .agg(count(lit(1)).as("__ssz"))
        val fanout = ceil(col("__ssz").cast("double") /
          lit(maxClusterSize.toDouble)).cast("long")
        val p = lit(2147483647L)
        val k = pmod(col(idCol).cast("long"), p)
        val h = pmod(pmod(k * lit(48271L), p) * lit(48271L), p)
        signSplit.join(broadcast(subSizes), Seq("cl", "__sub"))
          .withColumn("__sub2",
            when(col("__ssz") <= maxClusterSize, lit(0L))
              .otherwise(pmod(h, greatest(fanout, lit(1L)))))
          .drop("__ssz")
      }
    val a = keyed.select(col("cl"), col("__sub"), col("__sub2"),
      col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = keyed.select(col("cl"), col("__sub"), col("__sub2"),
      col(idCol).as("id_b"), col(embCol).as("emb_b"))
    val dropIds = a.join(b, Seq("cl", "__sub", "__sub2"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Candidates are
    * blocked by the sign pattern of the first `signBits` dimensions
    * (random-hyperplane LSH with axis-aligned planes): identical-direction
    * vectors share the bucket; at threshold ≪ 1 this is a recall/cost knob.
    * Set `signBits = 0` for the exact (all-pairs) variant. */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double,
                            signBits: Int = 0,
                            idCol: String = "vec_id",
                            embCol: String = "embedding",
                            maxPairs: Long = Guards.DefaultMaxCandidatePairs): DataFrame = {
    val withBucket0 =
      if (signBits <= 0) corpus.withColumn("bucket", lit(0L))
      else {
        val powers = typedlit((0 until signBits).map(j => 1L << j))
        corpus.withColumn("bucket",
          aggregate(
            zip_with(slice(col(embCol), 1, signBits), powers,
              (v, p) => when(v > lit(0.0f), p).otherwise(lit(0L))),
            lit(0L), (acc, x) => acc + x))
      }
    // r13 pair budget: sign buckets flood on identical/sign-correlated
    // vectors (and signBits = 0 is all-pairs BY DESIGN) — predict the
    // bucket-join mass, fail loudly over budget, Unbounded to opt out
    val withBucket = Guards.pairBudget(withBucket0, Seq("bucket"), maxPairs,
      "Similarity.embeddingNearDupPairs")
    val a = withBucket.select(col(idCol).as("id_a"), col(embCol).as("emb_a"), col("bucket"))
    val b = withBucket.select(col(idCol).as("id_b"), col(embCol).as("emb_b"), col("bucket"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Multi-probe variant of [[embeddingNearDupPairs]]: one side ALSO
    * probes every bucket at hamming distance 1 from its own (flip each of
    * the `signBits` sign bits once — the standard multi-probe LSH recall
    * booster), so pairs that straddle a single hyperplane are found too.
    * Exactly the pairs whose sign patterns differ in ≤ 1 bit are
    * candidates, each generated once (the XOR flip to a partner's bucket
    * is unique). Cost: the probing side replicates (signBits+1)× INTO THE
    * JOIN — the classic multi-probe trade of candidate volume for recall
    * without touching the stored corpus side. */
  def embeddingNearDupPairsMultiProbe(corpus: DataFrame, threshold: Double,
                                      signBits: Int,
                                      idCol: String = "vec_id",
                                      embCol: String = "embedding",
                                      maxPairs: Long = Guards.DefaultMaxCandidatePairs): DataFrame = {
    require(signBits > 0, s"multi-probe needs signBits > 0, got $signBits")
    val powers = typedlit((0 until signBits).map(j => 1L << j))
    val withBucket = corpus.withColumn("bucket",
      aggregate(
        zip_with(slice(col(embCol), 1, signBits), powers,
          (v, p) => when(v > lit(0.0f), p).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x))
    val probes = array(
      col("bucket") +: (0 until signBits).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j))): _*)
    // bipartite budget: the probe side replicates (signBits+1)× into the
    // join, so the predicted mass is Σ_bucket probes_m · build_m
    val a = Guards.pairBudgetJoin(
      withBucket.select(col(idCol).as("id_a"), col(embCol).as("emb_a"),
        explode(probes).as("bucket")),
      withBucket.select(col("bucket")),
      Seq("bucket"), maxPairs, "Similarity.embeddingNearDupPairsMultiProbe")
    val b = withBucket.select(col(idCol).as("id_b"), col(embCol).as("emb_b"),
      col("bucket"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic ±1 sign matrix for [[randomProjection]] — parity of a
    * quadratic (Carter–Wegman-style) hash of the flat index `k = j·inDim
    * + i`, all in BIGINT range so any engine replays it with plain
    * integer arithmetic (no platform hash involved). Exposed so the
    * DuckDB oracle builder bakes the IDENTICAL matrix into its SQL. */
  def signMatrix(inDim: Int, outDim: Int, seed: Long = 7919L): Array[Array[Double]] =
    Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        val k = j.toLong * inDim + i
        val h = (k * k * 1103515245L + k * 12345L + seed) % 2147483647L
        if (h % 2 == 0) 1.0 else -1.0
      }
    }

  /** Johnson–Lindenstrauss random projection `inDim → outDim`: appends a
    * `proj` column where `proj[j] = (1/√outDim) · Σᵢ s(i,j)·x[i]` with the
    * ±1 signs of [[signMatrix]] (Achlioptas 2003 shows ±1 entries satisfy
    * the JL distance-preservation bound — no Gaussians needed, which keeps
    * the operator exactly replayable). Each output dimension is one
    * codegen'd [[graft.functions.VecDot]] against a BROADCAST-FREE literal
    * sign vector, so the whole operator is a pure per-row map: no shuffle,
    * no exchange, scans once — the plan shape survives any corpus size.
    * Use it to cut ANN/clustering cost 4–8× upstream of [[bruteForceKnn]]
    * / [[kmeansClusters]] at a small recall cost. */
  def randomProjection(df: DataFrame, embCol: String,
                       inDim: Int, outDim: Int,
                       seed: Long = 7919L): DataFrame = {
    val signs = signMatrix(inDim, outDim, seed)
    val inv = lit(1.0 / math.sqrt(outDim.toDouble))
    val comps = signs.toIndexedSeq.map { row =>
      cosine(col(embCol), typedlit(row.toSeq)) * inv
    }
    df.withColumn("proj", array(comps: _*))
  }
}
