package graft.operators

import graft.functions.Kmv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: results change with
  * partitioning, retries, and engine version — useless for reproducible
  * corpus construction. These samplers instead include a row iff a 60-bit
  * md5-derived hash of its KEY falls under a threshold:
  *
  *  - reproducible: same corpus → same sample, on any cluster layout, in
  *    any engine (the DuckDB oracle replays it bit-for-bit);
  *  - consistent: the same key is either in or out EVERYWHERE — sampling
  *    two tables by the same join key yields joinable samples;
  *  - one-pass: a pushed-down filter, no shuffle, no state.
  *
  * At 100 TB the filter sits directly on the scan: the sample never
  * materializes the unsampled data. No reference analog (beyond-reference
  * op for the LLM-pipeline layer).
  */
object Sampling {

  /** Threshold in the 2^60 hash space for an inclusion probability. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    (rate * Kmv.HashSpace).toLong
  }

  /** Keep rows whose key hashes under `rate`'s threshold. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(Kmv.kmvHash(col(keyCol)) < lit(threshold(rate)))

  /** Per-stratum rates (e.g. language rebalancing: keep 100% of low-resource
    * languages, 5% of English). Strata missing from `rates` default to
    * `defaultRate`. The rate map is tiny and becomes a literal CASE chain —
    * no join, still one scan-side filter. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val cases = rates.toSeq.sortBy(_._1).foldLeft(
      when(lit(false), lit(0L))) { case (acc, (stratum, rate)) =>
      acc.when(col(strataCol) === lit(stratum), lit(threshold(rate)))
    }
    df.filter(Kmv.kmvHash(col(keyCol)) < cases.otherwise(lit(threshold(defaultRate))))
  }

  /** Temperature-scaled mixture rates: `p_s = n_s^τ / Σ_t n_t^τ` over the
    * strata of `strataCol`, and the per-stratum inclusion rate
    * `r_s = min(1, targetRows·p_s / n_s)` that realizes the mixture —
    * the standard multilingual/multi-source mixing knob (τ = 1 keeps the
    * natural proportions, τ = 0 mixes sources uniformly, τ ∈ (0,1)
    * upweights small sources, as in T5/multilingual-LM training mixes).
    *
    * Determinism: the denominator folds the per-stratum `pow` terms in
    * ascending stratum order (one fixed left fold, the [[Divergence]]
    * discipline — `pow` is not correctly rounded in every engine), and
    * `mix_p`/`rate` round to 10 decimals, so the rates — and therefore
    * sample MEMBERSHIP via [[stratifiedSample]]'s thresholds — replay
    * bit-for-bit in the DuckDB oracle.
    *
    * Scale shape: one map-side-combinable count per stratum; the fold and
    * every downstream op run on the |strata|-row frame. Emits
    * (strataCol, `n_rows`, `mix_p`, `rate`). */
  def temperatureRates(df: DataFrame, strataCol: String, tau: Double,
                       targetRows: Long): DataFrame = {
    require(tau >= 0.0, s"tau must be >= 0, got $tau")
    require(targetRows > 0L, s"targetRows must be positive, got $targetRows")
    Guards.requireNoReserved(df.columns,
      Seq("n_rows", "mix_p", "rate", "__pw", "__denom"), "temperatureRates")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("__pw", pow(col("n_rows").cast("double"), lit(tau)))
    val denom = counts
      .agg(sort_array(collect_list(struct(col(strataCol), col("__pw"))))
        .as("__l"))
      .select(aggregate(
        transform(col("__l"), e => e.getField("__pw")),
        lit(0.0), (acc, x) => acc + x).as("__denom"))
    val p = col("__pw") / col("__denom")
    counts.crossJoin(broadcast(denom))
      .select(col(strataCol), col("n_rows"),
        (round(p, 10) + lit(0.0)).as("mix_p"),
        (round(least(lit(1.0),
          lit(targetRows.toDouble) * p / col("n_rows").cast("double")), 10)
          + lit(0.0)).as("rate"))
  }

  /** [[temperatureRates]] applied: computes the rates, collects the
    * |strata|-row frame (the tiny-driver-collect contract, as with the
    * SQ8 bounds), and hash-samples each stratum at its rate — one
    * scan-side filter, reproducible on any layout. */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        tau: Double, targetRows: Long): DataFrame = {
    val rates = temperatureRates(df, strataCol, tau, targetRows)
      .select(col(strataCol).cast("string"), col("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    stratifiedSample(df, keyCol, strataCol, rates)
  }

  /** Mix corpora with per-source weights into one training set: each source
    * is hash-sampled at its weight and union'd. Weights are inclusion
    * rates, not relative proportions — the output size is
    * Σ |sourceᵢ| · weightᵢ. All frames must share a schema. */
  def mixCorpora(sources: Seq[(DataFrame, Double)], keyCol: String): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (df, w) => hashSample(df, keyCol, w) }
      .reduce(_.unionByName(_))
  }

  /** Deterministic weighted sample of `k` rows without replacement
    * (Efraimidis–Spirakis A-ES, Inf. Process. Lett. 97(5), public
    * algorithm): each row draws `u = (kmvHash(key)+1)/2^60 ∈ (0,1]` and
    * ranks by `ln(u)/w` — monotone in the classic `u^(1/w)` priority, so
    * the top-k ranks are an exact A-ES sample, with the RNG replaced by the
    * same md5-derived hash the other samplers use (reproducible on any
    * cluster layout; the DuckDB oracle replays it). Ties (identical ranks)
    * break on the key, making the sample a pure function of the corpus.
    *
    * Plan shape: one scan + TakeOrdered — per-partition top-k, driver
    * merges `partitions · k` rows; no shuffle of the corpus. Weights must
    * be positive (A-ES is undefined otherwise) — enforced per row. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    graft.operators.Guards.requireNoReserved(df.columns, Seq("__aes_rank"),
      "weightedSample")
    val w = col(weightCol).cast("double")
    val wChecked = when(w.isNull || w <= 0.0, raise_error(concat(
      lit(s"weightedSample: $weightCol must be a positive weight, got "),
      coalesce(w.cast("string"), lit("NULL"))))).otherwise(w)
    val u = (Kmv.kmvHash(col(keyCol)).cast("double") + lit(1.0)) /
      lit(Kmv.HashSpace)
    df.withColumn("__aes_rank", log(u) / wChecked)
      .orderBy(col("__aes_rank").desc, col(keyCol).asc)
      .limit(k)
      .drop("__aes_rank")
  }

  /** Deterministic fixed-size uniform sample PER GROUP ("≤ n docs per
    * source"): rows rank by an md5-derived key hash and each group keeps
    * its `n` smallest (hash ties to the lower key — the sample is a pure
    * function of the corpus). Unlike the rate samplers the output size is
    * exactly `min(n, |group|)` per group — the balanced-subset primitive
    * for per-source caps. Emits (groupCol, keyCol, rank).
    *
    * Plan: the bounded-heap `topk_by` aggregate — ≤ n entries of state per
    * group, map-side combinable, no per-group sort (a ranking window would
    * put each group's full scan slice into one partition — the shape that
    * dies on a 100 TB mega-source). The hash is 48-bit (vs the rate
    * samplers' 60) so the heap's double-typed ordering key stays exact
    * (< 2^53) and any engine replays the ranking bit-for-bit. */
  def samplePerGroup(df: DataFrame, keyCol: String, groupCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    graft.operators.Guards.requireNoReserved(df.columns, Seq("__h48", "rank"),
      "samplePerGroup")
    val hashed = df.withColumn("__h48",
      conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10).cast("long"))
    graft.functions.TopKBy.rankAscending(hashed, groupCol, "__h48", keyCol, n)
      .select(col(groupCol), col(keyCol), col("rank"))
  }

  /** Deterministic negative sampling for contrastive training: give every
    * row `k` pseudo-random partners by walking a HASH RING — rows order by
    * `md5(key)` inside 256 hash-prefix buckets, and row `r` pairs with
    * rows `(r+j) mod bucketSize` for `j = 1..k`. The hash order is
    * content-random but a pure function of the keys, so the SAME corpus
    * yields the SAME negatives on any layout/engine/retry — the
    * reproducibility `orderBy(rand())` sampling can never give — and
    * ring neighbors are uniform over the corpus (unrelated keys land
    * adjacent), exactly what "random negative" wants.
    *
    * Scale shape: the ring never materializes globally — ranks come from
    * `nBuckets` hash-partitioned windows (size the bucket count so a
    * bucket's rows sort comfortably in one task: ~rows/10⁶ at corpus
    * scale; it must exceed nothing — buckets of ANY size pair
    * correctly), and pairing is ONE equi-join on (bucket, rank) after a
    * k-row explode of the anchor side. Self-pairs (a walk that wraps the
    * whole bucket, only when bucketSize ≤ k) filter out. Emits
    * (`anchor`, `negative`, `j`). */
  def negativePairs(df: DataFrame, keyCol: String, k: Int,
                    nBuckets: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    Guards.requireNoReserved(df.columns,
      Seq("anchor", "negative", "j", "__h", "__bk", "__r", "__m"),
      "negativePairs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bk")).orderBy(col("__h"), col(keyCol))
    val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("__bk"))
    val ring = df
      .select(col(keyCol), md5(col(keyCol).cast("string")).as("__h"))
      .withColumn("__bk",
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long") % nBuckets)
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__m", count(lit(1)).over(wb))
    val anchors = ring
      .select(col(keyCol).as("anchor"), col("__bk"), col("__r"), col("__m"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__r2", ((col("__r") - 1L + col("j")) % col("__m")) + 1L)
      .filter(col("__r2") =!= col("__r"))
    anchors.join(
        ring.select(col(keyCol).as("negative"), col("__bk"),
          col("__r").as("__r2")),
        Seq("__bk", "__r2"))
      .select(col("anchor"), col("negative"), col("j"))
  }
}
