package graft.operators

import graft.functions.Kmv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: named
  * train/val/test partitions and k-fold assignment as pure functions of a
  * key — the membership primitive `randomSplit()` cannot provide
  * (per-partition RNG: results change with layout, retries, engine).
  *
  * Same md5-derived 60-bit hash as [[Sampling]], so splits compose with
  * the samplers: hashing the SAME key always lands in the same bucket, on
  * any cluster, in any engine (the DuckDB oracle replays membership
  * bit-for-bit). Leakage control falls out of key choice: hash the row key
  * for an i.i.d. split, hash a GROUP key (source, author, near-dup
  * cluster id) and every row of the group moves together — the standard
  * defense against train/test contamination through correlated rows.
  *
  * Scale shape: one per-row codegen'd projection — no shuffle, no state,
  * composes under the scan filter. No reference analog (beyond-reference
  * op for the LLM-pipeline layer).
  */
object Split {

  /** Add `split` naming each row's partition. `splits` are (name,
    * fraction) in priority order; fractions must sum to 1 (±1e-9). The
    * hash space divides at the cumulative boundaries, the last bucket
    * absorbing the top of the range exactly — every key is assigned to
    * exactly one split. */
  /** The exact upper hash-space boundary of each split — public so an
    * external replay (the DuckDB oracle) can interpolate the identical
    * longs instead of re-deriving them through its own FP rounding. The
    * last boundary is forced to the full hash space so no key can fall
    * through a rounding gap. */
  def boundaries(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0.0), s"fractions must be positive: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"fractions must sum to 1, got $total")
    splits.scanLeft(0.0) { case (c, (_, f)) => c + f }.tail
      .map(c => (c * Kmv.HashSpace).toLong)
      .dropRight(1) :+ Kmv.HashSpace.toLong
  }

  def assign(df: DataFrame, keyCol: String,
             splits: Seq[(String, Double)]): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("split"), "Split.assign")
    val bounds = boundaries(splits)
    val h = Kmv.kmvHash(col(keyCol))
    val first = when(h < lit(bounds.head), lit(splits.head._1))
    val chain = splits.tail.zip(bounds.tail).foldLeft(first) {
      case (acc, ((name, _), b)) => acc.when(h < lit(b), lit(name))
    }
    df.withColumn("split", chain)
  }

  /** Near-dup-cluster-safe split — the composite that closes the leakage
    * story [[assign]]'s scaladoc names: hashing a near-dup CLUSTER key
    * moves every near-duplicate together, so no test document has a
    * near-copy in train (the contamination that inflates held-out
    * metrics most at web scale, where boilerplate templates replicate
    * across sources). This derives the key itself: each document's
    * group key is its near-dup cluster representative (the component id
    * from [[Dedup.nearDupClusters]] — star-verified edges, the r13
    * scale-safe default) and its OWN id when unclustered, then [[assign]]
    * hashes that key. Output = input columns + `split`.
    *
    * Scale shape: the cluster frame is one extra left-broadcast-or-shuffle
    * join keyed on `idCol` over the cluster pipeline the dedup pass
    * already runs — a pipeline doing near-dup dedup gets the safe split
    * for one join more, and the split stays a pure function of (corpus,
    * splits): identical on any cluster layout, any retry, any engine. */
  def clusterSafeAssign(docs: DataFrame, idCol: String, textCol: String,
                        splits: Seq[(String, Double)],
                        k: Int = 16, rowsPerBand: Int = 4,
                        threshold: Double = 0.5): DataFrame = {
    Guards.requireNoReserved(docs.columns, Seq("split", "__rep"),
      "Split.clusterSafeAssign")
    val comps = Dedup.nearDupClusters(docs, idCol, textCol, k, rowsPerBand,
        threshold)
      .select(col("id").as(idCol), col("component").as("__rep"))
    val keyed = docs.join(comps, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("__rep"), col(idCol)))
    assign(keyed, "__rep", splits).drop("__rep")
  }

  /** Add `fold` ∈ [0, k) — deterministic k-fold assignment (`hash mod k`).
    * Hash a group key for leakage-safe folds, as with [[assign]]. */
  def kfold(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    Guards.requireNoReserved(df.columns, Seq("fold"), "Split.kfold")
    df.withColumn("fold", (Kmv.kmvHash(col(keyCol)) % lit(k.toLong)).cast("int"))
  }

  /** Deterministic training-order shuffle: `shard` = hash mod S (S
    * co-sized output files, NO global sort), `shuffle_rank` = the row's
    * position within its shard by (hash, key) — together a reproducible
    * random permutation of the corpus that is identical on any cluster
    * layout, any retry, any engine (`df.orderBy(rand())` is none of
    * those). Epochs: vary the permutation by salting the key upstream.
    *
    * Scale shape: one exchange on `shard` and a per-shard sort —
    * corpus/S rows each, the inherent cost of materializing an order
    * (the production writer is `repartition(shard)` +
    * `sortWithinPartitions(hash)`, which is exactly this plan minus the
    * rank projection). */
  /** Purged time-series k-fold with embargo (the financial-ML CV scheme:
    * López de Prado, *Advances in Financial Machine Learning* ch. 7):
    * the time range `[min, max]` of `tsCol` divides into k equal-width
    * test windows; for each fold, rows inside the window are `test`,
    * rows within `embargo` time units AFTER the window are `embargo`
    * (dropped — they leak test-period information into training through
    * label horizons and serial correlation), and everything else is
    * `train`.
    *
    * Scope note: this is EMBARGO-AFTER-ONLY. Prado's full scheme also
    * *purges* training rows BEFORE the window whose label horizon
    * overlaps the test window; this operator does not know the label
    * horizon, so callers with forward-looking labels must either widen
    * `embargo` or pre-shift `tsCol` by the horizon so the after-window
    * embargo covers the pre-window overlap.
    *
    * `tsCol` must be an integral epoch column (cast timestamps first —
    * the event gates read nanos longs); all boundary arithmetic is then
    * exact integer division, bit-replayable in any engine. A row's own
    * fold is `k·(ts−min) DIV span`; fold f's window ends just before
    * `min + ceil((f+1)·span/k)`.
    *
    * Output: one row per input row PER FOLD (`fold`, `role`) — the k×
    * expansion is inherent to materializing every fold's assignment at
    * once; training on fold f filters `fold = f`, and the expansion is a
    * broadcast-joined projection (no shuffle), so nothing but the
    * consumer's own scan grows. Bounds come from one tiny min/max agg
    * broadcast back (the [[Feature]] stats-frame shape). */
  def purgedTimeFolds(df: DataFrame, tsCol: String, k: Int,
                      embargo: Long): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    require(embargo >= 0L, s"embargo must be >= 0, got $embargo")
    Guards.requireNoReserved(df.columns,
      Seq("fold", "role", "__ts", "__min_ts", "__span", "__end"),
      "purgedTimeFolds")
    val ts = col(tsCol).cast("long")
    val stats = df.agg(min(ts).as("__min_ts"),
      (max(ts) - min(ts) + lit(1L)).as("__span"))
    // k rows: each fold's exclusive window-end boundary
    // min + ceil((f+1)·span/k). Integer DIV throughout — double division
    // would lose exactness past 2^53 at nano-epoch magnitudes.
    val bounds = stats.select(
        explode(sequence(lit(0), lit(k - 1))).as("fold"),
        col("__min_ts"), col("__span"))
      .withColumn("__end", col("__min_ts") + expr(
        s"((CAST(fold AS BIGINT) + 1) * __span + ${k - 1}) DIV $k"))
    // The caller's column is bound ONCE via the Column API (`__ts`); the
    // integer-DIV expr below then references only internal names — no raw
    // identifier splicing (backtick-needing names, injection shapes).
    df.withColumn("__ts", ts).join(broadcast(bounds))
      .withColumn("role",
        when(expr(s"($k * (__ts - __min_ts)) DIV __span")
            === col("fold").cast("long"), lit("test"))
          .when(col("__ts") >= col("__end") &&
              col("__ts") < col("__end") + lit(embargo),
            lit("embargo"))
          .otherwise(lit("train")))
      .drop("__ts", "__min_ts", "__span", "__end")
  }

  def shuffleShards(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"need at least 1 shard, got $numShards")
    Guards.requireNoReserved(df.columns,
      Seq("shard", "shuffle_rank", "__h"), "Split.shuffleShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", Kmv.kmvHash(col(keyCol)))
      .withColumn("shard", (col("__h") % lit(numShards.toLong)).cast("int"))
      .withColumn("shuffle_rank", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
