package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixture drift monitoring: per-group Shannon entropy and KL
  * divergence of the token distribution against the whole corpus — the
  * smell test that catches a source drifting (template spam collapses
  * entropy; a topical source shows high KL) before it skews a training
  * mix.
  *
  * Distributions are over the GLOBAL top-K vocabulary so every group is
  * measured on the same support (tokens a group lacks contribute 0 to
  * its KL by the usual 0·ln 0 = 0 convention, and the global side is
  * never zero on its own top-K).
  *
  * Determinism: counts are exact; the per-group entropy/KL sums fold
  * over the group's support tokens in ASCENDING TOKEN ORDER (tokens are
  * `[a-z0-9]+`, so lexicographic order is engine-independent), making
  * the double accumulation one fixed left fold any engine replays — and
  * the outputs round to 10 decimals because `ln` itself is not
  * correctly rounded in every engine (JVM `Math.log` vs libm differ in
  * the last ulp; same rationale as the k-means centroids' 6-decimal
  * rounding). `+0.0` folds the IEEE −0.0 a tiny-negative round can
  * produce into +0.0.
  *
  * Scale shape: one tokenize+count pass (map-side combinable), a
  * `topK`-row vocabulary frame that broadcasts, and a per-group fold
  * whose list is ≤ topK elements — the collected state per group is
  * bounded by the vocabulary, never the corpus.
  */
object Divergence {

  /** Emits (groupCol, `n_tokens`, `entropy`, `kl`): entropy in nats of
    * the group's top-K-restricted token distribution, and
    * KL(group ‖ corpus) over the same support. */
  def tokenEntropy(df: DataFrame, groupCol: String, textCol: String,
                   topK: Int): DataFrame = {
    require(topK >= 2, s"need a vocabulary of >= 2 tokens, got $topK")
    Guards.requireNoReserved(df.columns,
      Seq("n_tokens", "entropy", "kl", "__ts", "__G"), "Divergence.tokenEntropy")
    val counts = df
      .select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("n"))
    val vocab = counts.groupBy(col("token")).agg(sum(col("n")).as("gn"))
      .orderBy(col("gn").desc, col("token").asc).limit(topK)
    val gTotal = vocab.agg(sum(col("gn")).as("__G"))
    val sup = counts.join(broadcast(vocab), "token")
    val grouped = sup.groupBy(col(groupCol))
      .agg(sum(col("n")).as("n_tokens"),
        sort_array(collect_list(struct(col("token"), col("n"), col("gn"))))
          .as("__ts"))
      .crossJoin(broadcast(gTotal))
    val nG = col("n_tokens").cast("double")
    val gT = col("__G").cast("double")
    def fold(term: Column => Column): Column =
      aggregate(transform(col("__ts"), term), lit(0.0), (acc, x) => acc + x)
    val entropy =
      log(nG) - fold(t => {
        val n = t.getField("n").cast("double")
        n * log(n)
      }) / nG
    val kl = fold(t => {
      val p = t.getField("n").cast("double") / nG
      val q = t.getField("gn").cast("double") / gT
      p * log(p / q)
    })
    grouped.select(col(groupCol), col("n_tokens"),
      (round(entropy, 10) + lit(0.0)).as("entropy"),
      (round(kl, 10) + lit(0.0)).as("kl"))
  }

  /** Jensen–Shannon divergence between two corpora's token
    * distributions over their COMBINED top-`topK` vocabulary:
    * `JSD = ½·KL(p ‖ m) + ½·KL(q ‖ m)` with `m = (p+q)/2` — the
    * symmetric, bounded (`[0, ln 2]` nats) sibling of [[tokenEntropy]]'s
    * KL, the right metric when neither corpus is the reference (two
    * snapshots, two candidate sources). Tokens absent from one side
    * contribute `0·ln 0 = 0` for that side; `m` is never zero on the
    * combined vocabulary.
    *
    * Same determinism contract as [[tokenEntropy]]: one token-ordered
    * left fold over the K-row support, single `round(_, 10)`. Scale
    * shape: one tokenize+count pass per corpus (map-side combinable),
    * then everything runs on the K-row vocabulary frame. Emits one row:
    * (`n_tokens_a`, `n_tokens_b`, `jsd`). */
  def jsDivergence(dfA: DataFrame, dfB: DataFrame, textCol: String,
                   topK: Int): DataFrame = {
    require(topK >= 2, s"need a vocabulary of >= 2 tokens, got $topK")
    def sideCounts(df: DataFrame, out: String): DataFrame = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(out))
    val combined = sideCounts(dfA, "na")
      .join(sideCounts(dfB, "nb"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val vocab = combined
      .orderBy((col("na") + col("nb")).desc, col("token").asc).limit(topK)
    val folded = vocab.agg(
      sum(col("na")).as("n_tokens_a"),
      sum(col("nb")).as("n_tokens_b"),
      sort_array(collect_list(struct(col("token"), col("na"), col("nb"))))
        .as("__ts"))
    val nA = col("n_tokens_a").cast("double")
    val nB = col("n_tokens_b").cast("double")
    val jsd = aggregate(
      transform(col("__ts"), t => {
        val p = t.getField("na").cast("double") / nA
        val q = t.getField("nb").cast("double") / nB
        val m = (p + q) / lit(2.0)
        when(t.getField("na") > 0L, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
          when(t.getField("nb") > 0L, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))
      }),
      lit(0.0), (acc, x) => acc + x)
    folded.select(col("n_tokens_a"), col("n_tokens_b"),
      (round(jsd, 10) + lit(0.0)).as("jsd"))
  }

  /** Population stability index between a reference and a current
    * snapshot of a numeric feature — the standard drift gate before a
    * retrain: `PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i)` over fixed-width
    * bins of `[lo, hi)` (edge-clamped like the calibration bins;
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted, by the usual rule
    * of thumb).
    *
    * Emits ONE ROW PER BIN (`bin`, `bin_lo`, `n_ref`, `n_cur`, `p_ref`,
    * `p_cur`, `psi_term`) — callers sum `psi_term` for the scalar; the
    * per-bin frame is what a drift dashboard actually plots, and
    * emitting terms sidesteps any cross-engine summation-order concern.
    * Bin probabilities use add-one smoothing `(n_i + 1)/(N + nBins)` so
    * empty bins stay defined (and every bin emits, even n=0 on both
    * sides). Two map-side-combinable counting aggs over an exploded
    * nBins-row spine joined broadcast; the single `ln` rounds to 10
    * decimals ([[tokenEntropy]] rationale); counts and ratios exact. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / nBins
    def binned(df: DataFrame, outCol: String): DataFrame = {
      val x = when(col(valueCol).isNull, raise_error(lit(
          s"psi: $valueCol must be non-null (a null would silently land " +
            "in bin 0); filter or impute first")))
        .otherwise(col(valueCol).cast("double"))
      df.groupBy(least(lit(nBins - 1),
          greatest(lit(0), floor((x - lit(lo)) / lit(width)).cast("int")))
          .as("bin"))
        .agg(count(lit(1)).as(outCol))
    }
    // nBins-row spine so EVERY bin emits, including empty ones
    val spine = ref.sparkSession.range(nBins)
      .select(col("id").cast("int").as("bin"))
    val counts = spine
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val p = (col("n_ref").cast("double") + lit(1.0)) /
      (col("__tr").cast("double") + lit(nBins.toDouble))
    val q = (col("n_cur").cast("double") + lit(1.0)) /
      (col("__tc").cast("double") + lit(nBins.toDouble))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        col("n_ref"), col("n_cur"),
        p.as("p_ref"), q.as("p_cur"),
        ((p - q) * (round(log(p / q), 10) + lit(0.0))).as("psi_term"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the distributions
    * of a numeric column in two frames: `D = max_x |F_a(x) − F_b(x)|`
    * over the empirical CDFs — the nonparametric drift test that, unlike
    * [[psi]], needs no binning choice and detects ANY distributional
    * difference (location, scale, shape). Emits one row
    * (`n_a`, `n_b`, `ks_d`); the classic significance cut at α=0.05 is
    * `D > 1.36·sqrt(1/n_a + 1/n_b)` — left to the caller, since the
    * threshold is a policy.
    *
    * Exactness: the ECDF steps are integer cumulative counts divided by
    * integer totals — each per-value `|F_a − F_b|` is ONE fixed IEEE
    * expression (two exact-rounded divisions, a subtract, an abs), and
    * `max` is order-independent, so the result is bit-exact on any
    * engine/layout with NO rounding step.
    *
    * Scale shape: everything past the per-side value-count aggs (both
    * map-side combinable) runs on the DISTINCT-value frame. The
    * cumulative count is a TWO-LEVEL prefix sum (the [[Packing]]
    * no-global-sort discipline): `nBuckets` monotone value ranges
    * partition the sort, per-bucket totals (an `nBuckets`-row frame)
    * carry the cross-bucket offsets through a tiny broadcast — a global
    * `ORDER BY value` window would be a 1-partition sort of the whole
    * support. Nulls fail loudly ([[psi]] contract); an empty side fails
    * loudly (its ECDF does not exist). */
  def ksTest(dfA: DataFrame, dfB: DataFrame, valueCol: String,
             nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    def sideCounts(df: DataFrame, out: String): DataFrame = {
      val x = when(col(valueCol).isNull, raise_error(lit(
          s"ksTest: $valueCol must be non-null (a null has no place in an " +
            "ECDF); filter or impute first")))
        .otherwise(col(valueCol).cast("double"))
      df.groupBy(x.as("__v")).agg(count(lit(1)).as(out))
    }
    val counts = sideCounts(dfA, "__na")
      .join(sideCounts(dfB, "__nb"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val totals = counts.agg(sum(col("__na")).as("n_a"),
      sum(col("__nb")).as("n_b"))
    val guarded = totals.select(
      when(col("n_a").isNull || col("n_a") === 0L || col("n_b") === 0L,
        raise_error(lit("ksTest: both sides must be non-empty — an empty " +
          "side has no ECDF"))).otherwise(col("n_a")).as("n_a"),
      col("n_b"))
    // the ECDF cumsums run as the shared bucketed two-level prefix sum —
    // never a global 1-partition sort ([[Prefix]])
    val cummed = Prefix.bucketedCumsum(counts, "__v", Seq("__na", "__nb"),
      nBuckets)
    val d = abs(
      col("cum___na").cast("double") / col("n_a").cast("double") -
      col("cum___nb").cast("double") / col("n_b").cast("double"))
    cummed.crossJoin(broadcast(guarded))
      .withColumn("__d", d)
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__d")).as("ks_d"))
  }

  /** Two-sample 1-Wasserstein (earth-mover) distance — the drift metric
    * that weighs HOW FAR mass moved, where [[ksTest]] only sees the
    * largest ECDF gap and [[psi]] needs a binning policy: W₁ = ∫ |F_a −
    * F_b| dx over the merged support. A distribution that shifts by δ
    * scores ≈ δ here regardless of shape — the natural "how much did
    * values drift" readout for monitoring feed medians/prices.
    *
    * Exactness: values quantize to `scale` decimals (integer support),
    * so each step term is `|cumA·n_b − cumB·n_a| · Δv` — a product of
    * exact integers — and the total accumulates as DECIMAL(38,0),
    * order-independent at any size. ONE division chain at the end
    * (`Σ / (n_a·n_b) / 10^scale`) makes the result a fixed IEEE tree.
    * Bit-exactness bound: `n_a·n_b·range·10^scale < 2^53` (the cast of
    * the exact decimal total to double is then exact); beyond that the
    * value is still correct to double precision.
    *
    * Scale shape: the [[ksTest]] plan — per-side value-count aggregates
    * (map-side combinable), a distinct-value merged frame, the shared
    * bucketed two-level prefix sum for the cumulatives (never a global
    * 1-partition sort), and the step gap `Δv` from a per-bucket `lead`
    * over the SAME bucketed sort. Nulls and empty sides fail loudly
    * ([[psi]]/[[ksTest]] contract). Emits one row (`n_a`, `n_b`, `w1`). */
  def wasserstein1(dfA: DataFrame, dfB: DataFrame, valueCol: String,
                   scale: Int = 0, nBuckets: Int = 64): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    def sideCounts(df: DataFrame, out: String): DataFrame = {
      val x = when(col(valueCol).isNull, raise_error(lit(
          s"wasserstein1: $valueCol must be non-null (a null has no place " +
            "in an ECDF); filter or impute first")))
        .otherwise(round(col(valueCol).cast("double") *
          lit(math.pow(10, scale))).cast("long"))
      df.groupBy(x.as("__v")).agg(count(lit(1)).as(out))
    }
    val counts = sideCounts(dfA, "__na")
      .join(sideCounts(dfB, "__nb"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val totals = counts.agg(sum(col("__na")).as("n_a"),
      sum(col("__nb")).as("n_b"))
    val guarded = totals.select(
      when(col("n_a").isNull || col("n_a") === 0L || col("n_b") === 0L,
        raise_error(lit("wasserstein1: both sides must be non-empty — an " +
          "empty side has no ECDF"))).otherwise(col("n_a")).as("n_a"),
      col("n_b"))
    // cumulative counts AND the next distinct value ride the SAME
    // bucketed sort: Δv to the bucket's last row comes from the tiny
    // bucket-bounds frame (the next bucket's min value), so no global
    // ordering window exists anywhere in the plan
    val cummed = Prefix.bucketedCumsumWithLead(counts, "__v",
      Seq("__na", "__nb"), nBuckets)
    val term = abs(col("cum___na").cast("decimal(38,0)") * col("n_b") -
        col("cum___nb").cast("decimal(38,0)") * col("n_a")) *
      (col("lead___v") - col("__v")).cast("decimal(38,0)")
    cummed.crossJoin(broadcast(guarded))
      .filter(col("lead___v").isNotNull) // last value: F_a = F_b = 1 anyway
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(term).as("__t"))
      .select(col("n_a"), col("n_b"),
        (col("__t").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")) /
          lit(math.pow(10, scale))).as("w1"))
  }

  /** Exact per-group Gini concentration of a non-negative measure — the
    * corpus-diversity screen (is one source/shard/length band hogging the
    * token mass?): 0 = perfectly even, →1 = one row holds everything.
    *
    * Closed form on the ascending-rank sum `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) /
    * (n·Σx)`: values quantize to `scale` decimals and BOTH sums are exact
    * BIGINTs (the [[graft.operators.Rolling.vwap]] money discipline), so
    * the single final double tree is engine-identical. Rank ties are
    * harmless by construction — equal values make `Σ i·xᵢ` invariant
    * under any tie order, so no tiebreak column is needed.
    *
    * One rank window per group + one hash aggregate; NULL measures are
    * excluded, negative ones raise (a silent negative would corrupt the
    * concentration silently). NULL gini for all-zero groups. Emits
    * (groupCols…, `n`, `gini`). */
  def gini(df: DataFrame, groupCols: Seq[String], valueCol: String,
           scale: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "gini needs at least one group column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    val x0 = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val x = when(x0 < 0L, raise_error(
      lit(s"gini: negative value in $valueCol"))).otherwise(x0)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__x"))
    val ranked = df.select((groupCols.map(col) :+ x.as("__x")): _*)
      .filter(col("__x").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
    val sums = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sv"),
        sum(col("__i") * col("__x")).as("__siv"))
    val (n, sv, siv) = (col("n").cast("double"),
      col("__sv").cast("double"), col("__siv").cast("double"))
    sums.withColumn("gini",
        when(col("__sv") > 0L,
          (lit(2.0) * siv - (n + lit(1.0)) * sv) / (n * sv)))
      .drop("__sv", "__siv")
  }

  /** One-sample Kolmogorov–Smirnov against Uniform[0,1] per group
    * (public formula) — the split/hash FAIRNESS gate: feed it the
    * normalized hash (or any claimed-uniform score) and
    * `D = maxᵢ max(i/n − u₍ᵢ₎, u₍ᵢ₎ − (i−1)/n)` says how far the
    * empirical distribution strays from uniform — the quantitative
    * answer to "is this splitter biased" that a histogram eyeball
    * isn't. (√n·D ≳ 1.36 rejects at 5%.)
    *
    * Determinism: values outside [0,1] raise; each rank term is a
    * fixed IEEE tree on the exact rank ladder, the max is
    * order-independent, and tied values reach the same maximum from
    * whichever tie ordering (the extreme ranks of a tie block are
    * fixed). One keyed sort + one combinable max. Emits (groupCols…,
    * `n`, `ks_d`, `ks_stat` = √n·D). */
  def ksUniform(df: DataFrame, valueCol: String,
                groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "ksUniform needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "ks_d", "ks_stat", "__u", "__i"), "Divergence.ksUniform")
    val u0 = col(valueCol).cast("double")
    val u = when(u0.isNull || u0 < 0.0 || u0 > 1.0,
        raise_error(concat(lit(s"ksUniform: $valueCol must be in [0,1], " +
          "got "), coalesce(u0.cast("string"), lit("NULL")))))
      .otherwise(u0)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__u"))
    val ranked = df
      .select((groupCols.map(col) :+ u.as("__u")): _*)
      .withColumn("__i", row_number().over(w).cast("long"))
    val cnt = Window.partitionBy(groupCols.map(col): _*)
    val withN = ranked.withColumn("n", count(lit(1)).over(cnt))
    val nD = col("n").cast("double")
    val term = greatest(
      col("__i").cast("double") / nD - col("__u"),
      col("__u") - (col("__i") - lit(1L)).cast("double") / nD)
    val sums = withN.groupBy((groupCols.map(col) :+ col("n")): _*)
      .agg(max(term).as("ks_d"))
    sums.select((groupCols.map(col) :+ col("n") :+ col("ks_d") :+
      (sqrt(col("n").cast("double")) * col("ks_d")).as("ks_stat")): _*)
  }
}
