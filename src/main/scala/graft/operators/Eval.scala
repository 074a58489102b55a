package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model-evaluation metrics — grouped binary AUC and
  * calibration (reliability) bins — for scoring the quality classifiers a
  * training-data pipeline runs over the corpus (fastText-style quality
  * filters, heuristic spam scores, dedup confidence). At 100 TB the eval
  * set itself is big; these run as aggregations, never a collect.
  *
  * Scale shape: AUC first aggregates to one row per DISTINCT (group,
  * score) — map-side combinable, so only the distinct-score frame
  * shuffles — then ranks with one window over that reduced frame (the
  * same reduced-frame-window shape as the exact quantile operator). The
  * rank sums are integer/half-integer doubles (exact under 2^52 in any
  * order), so results are bit-identical across engines and layouts.
  *
  * Determinism contract: counts and tie-averaged ranks are exact; the
  * single final division is one correctly-rounded IEEE op. No rounding
  * needed anywhere.
  */
object Eval {

  /** Fail loudly on null/non-binary labels (the [[Profile]] /
    * [[Batching]] null policy): a null or stray label would silently
    * bias the metric rather than error. */
  private def checkedLabel(labelCol: String, op: String): Column = {
    val y = col(labelCol).cast("long")
    when(col(labelCol).isNull || (y =!= 0L && y =!= 1L), raise_error(lit(
        s"$op: $labelCol must be a non-null 0/1 label; filter or recode " +
          "first")))
      .otherwise(y)
  }

  private def checkedScore(scoreCol: String, op: String): Column =
    when(col(scoreCol).isNull, raise_error(lit(
        s"$op: $scoreCol must be non-null (a null score cannot be " +
          "ranked); filter or impute first")))
      .otherwise(col(scoreCol).cast("double"))

  /** Per-group ROC AUC of `scoreCol` predicting binary `labelCol`, by the
    * Mann–Whitney rank identity `AUC = (Σ ranks⁺ − P(P+1)/2) / (P·N)`
    * with midrank tie handling (a tied pos/neg pair counts ½ — the
    * trapezoidal-ROC convention).
    *
    * Emits one row per group: `n`, `n_pos`, `auc` (NULL when a group has
    * no positives or no negatives — AUC is undefined there, and NULL
    * beats a misleading 0.5). Groups may be empty (`groupCols = Nil` →
    * one global row, but then the distinct-score window runs in a single
    * partition — prefer a grouping at scale). */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String,
                groupCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("n", "n_pos", "auc", "__n_s", "__pos_s", "__avg_rank"),
      "binaryAuc")
    val perScore = df
      .groupBy((groupCols :+ scoreCol).map(col): _*)
      .agg(count(lit(1)).as("__n_s"),
        sum(checkedLabel(labelCol, "binaryAuc")).as("__pos_s"))
    // midrank of the n_s rows tied at this score = cum − (n_s−1)/2 where
    // cum counts rows at-or-below the score; (n_s−1)/2 is a half-integer,
    // exact in a double
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perScore.withColumn("__avg_rank",
      sum(col("__n_s")).over(w).cast("double") -
        (col("__n_s") - lit(1L)).cast("double") / 2.0)
    val p = col("n_pos").cast("double")
    ranked
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__n_s")).as("n"),
        sum(col("__pos_s")).as("n_pos"),
        sum(col("__pos_s").cast("double") * col("__avg_rank")).as("__r"))
      .withColumn("auc",
        when(col("n_pos") > 0L && col("n_pos") < col("n"),
          (col("__r") - p * (p + 1.0) / 2.0) /
            (p * (col("n") - col("n_pos")).cast("double"))))
      .drop("__r")
  }

  /** Per-group average precision (the PR-AUC summary `AP = Σ_i ΔR_i·P_i`
    * over descending distinct score thresholds — the step-wise
    * `average_precision_score` convention, ties merged at one
    * threshold). The right metric when positives are rare (a quality
    * classifier hunting the 1% best documents): ROC AUC saturates under
    * class imbalance, AP does not.
    *
    * Emits one row per group: `n`, `n_pos`, `ap` (NULL when the group
    * has no positives — AP is undefined there). Factoring `1/P` out,
    * `AP = (1/P)·Σ pos_s·(TP/cum)`: every summand is a fixed IEEE tree
    * on exact integer cumulatives, and the sum folds over thresholds in
    * DESCENDING SCORE ORDER (one `sort_array` fold — the [[Divergence]]
    * determinism discipline), so the result is bit-replayable with no
    * rounding.
    *
    * Scale shape: aggregates to the distinct-(group, score) frame first
    * (map-side combinable) like [[binaryAuc]]; the fold list is that
    * group's distinct scores — for continuous scores over huge groups,
    * quantize the score first (the [[calibrationBins]] grid) to bound
    * per-group state. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
                       groupCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("n", "n_pos", "ap", "__n_s", "__pos_s", "__tp", "__cum", "__e"),
      "averagePrecision")
    val perScore = df
      .groupBy((groupCols :+ scoreCol).map(col): _*)
      .agg(count(lit(1)).as("__n_s"),
        sum(checkedLabel(labelCol, "averagePrecision")).as("__pos_s"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perScore
      .withColumn("__tp", sum(col("__pos_s")).over(w))
      .withColumn("__cum", sum(col("__n_s")).over(w))
    // per-threshold summand pos_s·TP/cum — two IEEE ops on exact ints
    val elem = col("__pos_s").cast("double") * col("__tp").cast("double") /
      col("__cum").cast("double")
    val folded = ranked
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__n_s")).as("n"),
        sum(col("__pos_s")).as("n_pos"),
        reverse(sort_array(collect_list(struct(col(scoreCol).as("s"),
          elem.as("__e"))))).as("__ts"))
    val apSum = aggregate(transform(col("__ts"), t => t.getField("__e")),
      lit(0.0), (acc, x) => acc + x)
    folded.select((groupCols.map(col) :+ col("n") :+ col("n_pos") :+
      when(col("n_pos") > 0L, apSum / col("n_pos").cast("double"))
        .as("ap")): _*)
  }

  /** Fixed-width calibration (reliability) bins: bucket `scoreCol` into
    * `nBins` equal-width bins over `[lo, hi)` (scores outside clamp to
    * the edge bins) and emit per bin the row count, positive count, and
    * empirical positive rate. A well-calibrated scorer has `pos_rate`
    * tracking the bin midpoint. Empty bins are absent from the output
    * (this is a groupBy, not a spine — densify with [[Resample]] if a
    * plot needs the gaps).
    *
    * One map-side-combinable aggregation; `bin_lo` and `pos_rate` are
    * single IEEE ops on exact integers, so output is bit-replayable. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    Guards.requireNoReserved(df.columns,
      Seq("bin", "bin_lo", "n", "n_pos", "pos_rate"), "calibrationBins")
    val width = (hi - lo) / nBins
    val s = checkedScore(scoreCol, "calibrationBins")
    val bin = least(lit(nBins - 1),
      greatest(lit(0), floor((s - lit(lo)) / lit(width)).cast("int")))
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(checkedLabel(labelCol, "calibrationBins")).as("n_pos"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(width))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** Per-group Brier score — mean squared error of a probabilistic
    * forecast against the binary outcome, the strictly proper scoring
    * rule that complements ROC-AUC (ranking) and calibration bins
    * (visual): `brier = Σ(s − y)² / n`, 0 = perfect, 0.25 = the
    * uninformed 0.5 forecast.
    *
    * Exactness: scores quantize to `scale` decimals (validated in
    * [0, 1] — a stray logit would silently corrupt the mean) and every
    * squared error `(s_int − y·10^scale)²` accumulates as an exact
    * DECIMAL(38,0) — order-independent under any partitioning — with ONE
    * final double division. Map-side combinable; one hash aggregate. */
  def brierScore(df: DataFrame, scoreCol: String, labelCol: String,
                 groupCols: Seq[String], scale: Int = 6): DataFrame = {
    require(scale >= 1 && scale <= 9, s"scale must be in [1, 9], got $scale")
    Guards.requireNoReserved(df.columns, Seq("n", "brier", "__sq"),
      "brierScore")
    val pow = math.pow(10, scale).toLong
    val s0 = round(checkedScore(scoreCol, "brierScore") * lit(pow.toDouble))
      .cast("long")
    val sInt = when(s0 < 0L || s0 > pow, raise_error(lit(
        s"brierScore: $scoreCol must be a probability in [0, 1]")))
      .otherwise(s0)
    val d = sInt - checkedLabel(labelCol, "brierScore") * lit(pow)
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).as("n"),
        sum((d * d).cast("decimal(38,0)")).as("__sq"))
      .withColumn("brier", col("__sq").cast("double") /
        (lit(math.pow(10, 2.0 * scale)) * col("n").cast("double")))
      .drop("__sq")
  }

  /** Lift / gains table over equal-frequency score bins: bucket 1 holds
    * the HIGHEST scores; per bucket the positive rate, lift vs the
    * overall rate, and the cumulative ("target the top k buckets")
    * gains — the model-triage readout between ROC-AUC (threshold-free)
    * and calibration bins (fixed-width).
    *
    * Equal-FREQUENCY bins are deliberate: boundaries are exact score
    * percentiles (interpolation parity with the oracle proven by the
    * quantile gate) and a tied score lands WHOLLY in one bucket by
    * comparison, so the table is deterministic in any engine — an
    * `ntile` over (score, id) would split ties by row order instead
    * (and cost a single-partition global sort; this shape is one tiny
    * percentile aggregate broadcast back, one hash agg, and a window
    * over the ≤nBuckets frame). Heavy ties make buckets uneven — that
    * is the standard equal-frequency caveat, surfaced in `n`. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    Guards.requireNoReserved(df.columns,
      Seq("bucket", "n", "n_pos", "pos_rate", "lift",
        "cum_n", "cum_pos", "cum_lift", "__bounds", "__tot_n", "__tot_pos"),
      "liftTable")
    val s = checkedScore(scoreCol, "liftTable")
    val y = checkedLabel(labelCol, "liftTable")
    val qs = (1 until nBuckets).map(k => lit(k.toDouble / nBuckets))
    val bounds = df.agg(
      percentile(s, array(qs: _*)).as("__bounds"),
      count(lit(1)).as("__tot_n"), sum(y).as("__tot_pos"))
    // bucket = nBuckets − (#boundaries strictly below the score): ties sit
    // wholly in one bucket; the filter runs over an (nBuckets−1)-element
    // broadcast array, not the corpus
    val bucket = (lit(nBuckets) -
      size(filter(col("__bounds"), b => s > b))).as("bucket")
    val byBucket = df.crossJoin(broadcast(bounds))
      .groupBy(bucket, col("__tot_n"), col("__tot_pos"))
      .agg(count(lit(1)).as("n"), sum(y).as("n_pos"))
    val overall = col("__tot_pos").cast("double") / col("__tot_n").cast("double")
    val cumW = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byBucket
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("lift", when(col("__tot_pos") > 0L, col("pos_rate") / overall))
      .withColumn("cum_n", sum(col("n")).over(cumW))
      .withColumn("cum_pos", sum(col("n_pos")).over(cumW))
      .withColumn("cum_lift", when(col("__tot_pos") > 0L,
        (col("cum_pos").cast("double") / col("cum_n").cast("double")) / overall))
      .drop("__bounds", "__tot_n", "__tot_pos")
  }

  /** The 1/log₂(r+1) NDCG discount ladder for ranks 1..k, computed ONCE
    * driver-side and baked into the plan as literal doubles — neither
    * engine's libm log is trusted in the data path (the `embed_project`
    * sign-matrix discipline: the oracle bakes the IDENTICAL literals into
    * its SQL via [[ndcgDiscountSql]]). */
  private[graft] def ndcgDiscounts(k: Int): Array[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).toArray

  /** Ideal-DCG prefix sums of the discount ladder (sequential order —
    * the same order both engines fold the hit list in). */
  private[graft] def ndcgIdcg(k: Int): Array[Double] = {
    val d = ndcgDiscounts(k)
    val out = new Array[Double](k)
    var acc = 0.0
    var i = 0
    while (i < k) { acc += d(i); out(i) = acc; i += 1 }
    out
  }

  /** The discount ladder as a DuckDB CASE expression over a rank column.
    * `java.lang.Double.toString` is shortest-round-trip, and the literal
    * rides as `CAST('<repr>' AS DOUBLE)` — a bare `0.386…163::DOUBLE`
    * literal goes through DuckDB's DECIMAL parser, whose double
    * conversion is NOT correctly rounded (measured: 1-ulp off on the
    * rank-5 discount); the string cast is strtod, which is. */
  private[graft] def ndcgDiscountSql(rankExpr: String, k: Int): String =
    ndcgDiscounts(k).zipWithIndex.map { case (d, i) =>
      s"WHEN ${i + 1} THEN CAST('$d' AS DOUBLE)"
    }.mkString(s"(CASE $rankExpr ", " ", " END)")

  /** Reciprocal-rank fusion (Cormack & Clarke 2009, public formula):
    * merge several systems' ranked lists for the same queries into one —
    * `rrf(q, d) = Σ_systems 1 / (k + rank_s(q, d))` — the standard
    * training-free way to combine BM25 + dense + rerank candidates
    * before labeling. Emits one row per (query, doc) seen by ANY system:
    * `rrf_score`, `n_systems` (how many ranked it — agreement signal),
    * and `fused_rank` (1-based by score desc, doc-id tie-break).
    *
    * Determinism: each term `1/(k + rank)` is one IEEE division of exact
    * integers; the per-doc sum folds terms in SYSTEM-NAME order (sorted
    * struct list — never an unordered float sum); the fused ranking
    * orders by the identically-computed score with a total doc
    * tie-break. Duplicate (query, doc, system) rows fail loudly through
    * the `n_systems` count (a duplicate would double-count its term).
    *
    * Scale shape: one groupBy on (query, doc) over the union of top-k
    * lists (≤ systems·k rows per query), then one per-query window over
    * that bounded candidate frame. */
  def rrfFusion(ranked: DataFrame, queryCol: String, docCol: String,
                rankCol: String, systemCol: String,
                kSmooth: Int = 60): DataFrame = {
    require(kSmooth >= 1, s"kSmooth must be >= 1, got $kSmooth")
    Guards.requireNoReserved(ranked.columns,
      Seq("rrf_score", "n_systems", "fused_rank", "__q", "__d", "__s",
        "__t", "__ts"),
      "rrfFusion")
    val term = lit(1.0) /
      (lit(kSmooth.toLong) + col(rankCol).cast("long")).cast("double")
    val rows = ranked.select(col(queryCol).as("__q"), col(docCol).as("__d"),
      col(systemCol).cast("string").as("__s"), term.as("__t"))
    val dupGuard = when(count(lit(1)) =!= count_distinct(col("__s")),
      raise_error(lit("rrfFusion: a system ranked the same (query, doc) " +
        "twice; de-duplicate per system first")).cast("long"))
      .otherwise(lit(0L))
    val perDoc = rows.groupBy(col("__q"), col("__d"))
      .agg(array_sort(collect_list(struct(col("__s"), col("__t"))))
          .as("__ts"),
        (count(lit(1)) + dupGuard).as("n_systems"))
      .withColumn("rrf_score",
        aggregate(col("__ts"), lit(0.0), (a, x) => a + x.getField("__t")))
    val w = Window.partitionBy(col("__q"))
      .orderBy(col("rrf_score").desc, col("__d"))
    perDoc.select(col("__q").as(queryCol), col("__d").as(docCol),
      col("rrf_score"), col("n_systems"),
      row_number().over(w).cast("long").as("fused_rank"))
  }

  /** Per-query retrieval metrics at cutoff k — recall@k, MRR@k, NDCG@k —
    * for grading a retrieval/ANN system (e.g. the IVF/PQ indexes here)
    * against a relevance set: `ranked` is the system output (one row per
    * (query, doc) with a 1-based `rankCol`, rank 1 = best), `relevant`
    * the ground-truth (query, doc) pairs (any further columns ignored;
    * duplicates collapsed). Emits one row per query appearing in
    * `ranked`: `n_rel` (total relevant, 0 if none), `hits` (relevant in
    * the top-k), `recall_at_k` = hits/n_rel, `mrr_at_k` = 1/first
    * relevant rank (0.0 when the top-k has no hit), `ndcg_at_k` =
    * Σ 1/log₂(rᵢ+1) over hit ranks ÷ ideal-DCG at min(n_rel, k).
    * recall/NDCG are NULL when a query has no relevant docs (undefined,
    * and NULL beats a misleading 0).
    *
    * Determinism: discounts and ideal-DCGs are driver-side literal
    * doubles (see [[ndcgDiscounts]]); the DCG folds the ≤k hit discounts
    * in ascending-rank order (array_sort on the collected (rank,
    * discount) structs); MRR/recall are exact counts with one IEEE
    * division each. Duplicate ranks inside a query's top-k fail loudly —
    * they would silently corrupt every metric.
    *
    * Scale shape: one equi-join of the top-k slice against the distinct
    * relevance set, one map-side-combinable count per query on each
    * frame, per-query state bounded by k. No window over either corpus —
    * ranks are the CALLER's (typically a `topk_by` / WindowGroupLimit
    * output that never materializes beyond k per query). */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame,
                     queryCol: String, docCol: String, rankCol: String,
                     k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    Guards.requireNoReserved(ranked.columns,
      Seq("n_rel", "hits", "recall_at_k", "mrr_at_k", "ndcg_at_k",
        "__q", "__d", "__r", "__rel", "__disc"),
      "rankingMetrics")
    val discArr = array(ndcgDiscounts(k).map(lit): _*)
    val idcgArr = array(ndcgIdcg(k).map(lit): _*)
    val rel = relevant
      .select(col(queryCol).as("__q"), col(docCol).as("__d")).distinct()
    val nRel = rel.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    val top = ranked.select(col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rankCol).cast("long").as("__r"))
      .filter(col("__r") >= 1L && col("__r") <= k)
    val marked = top.join(rel.withColumn("__rel", lit(1)),
      Seq("__q", "__d"), "left")
    // the guard rides INSIDE the hits expression (adding a checked 0L) so
    // column pruning can never optimize the raise_error away
    val dupGuard = when(count(lit(1)) =!= count_distinct(col("__r")),
      raise_error(lit("rankingMetrics: duplicate ranks within a query's " +
        "top-k; fix the ranker before grading it")).cast("long"))
      .otherwise(lit(0L))
    val hitDisc = when(col("__rel") === 1,
      struct(col("__r"), element_at(discArr, col("__r").cast("int"))
        .as("__disc")))
    val perQ = marked.groupBy(col("__q")).agg(
      (coalesce(sum(col("__rel")), lit(0L)) + dupGuard).as("hits"),
      min(when(col("__rel") === 1, col("__r"))).as("__first"),
      array_sort(collect_list(hitDisc)).as("__hl"))
    perQ.join(nRel, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        when(col("n_rel") > 0L,
          col("hits").cast("double") / col("n_rel").cast("double"))
          .as("recall_at_k"),
        coalesce(lit(1.0) / col("__first"), lit(0.0)).as("mrr_at_k"),
        when(col("n_rel") > 0L,
          aggregate(col("__hl"), lit(0.0),
            (a, x) => a + x.getField("__disc")) /
            element_at(idcgArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
          .as("ndcg_at_k"))
  }

  /** Per-group thresholded classification report — the confusion-matrix
    * readout (tp/fp/fn/tn, precision/recall/F1/accuracy) at a fixed
    * decision threshold, the deployment-facing companion to the
    * threshold-free [[binaryAuc]]/[[averagePrecision]]: once a cut is
    * chosen, THESE are the numbers the pipeline lives with.
    *
    * Convention: predicted positive ⟺ `score >= threshold` (boundary
    * inclusive, documented). Counts are exact integers in ONE
    * map-side-combinable pass; each rate is a single correctly-rounded
    * IEEE division — F1 as the one-division form `2·tp/(2·tp+fp+fn)`
    * (the compound `2PR/(P+R)` tree would round three times and is
    * undefined in more cases). NULL precision when nothing is predicted
    * positive, NULL recall when the group has no positives, NULL f1 when
    * both (the sklearn zero_division=NaN contract, made explicit).
    * Null/stray labels and null scores raise ([[binaryAuc]] contract).
    * Emits (groupCols…, `n`, `tp`, `fp`, `fn`, `tn`, `precision`,
    * `recall`, `f1`, `accuracy`). */
  def classificationReport(df: DataFrame, scoreCol: String,
                           labelCol: String, threshold: Double,
                           groupCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("n", "tp", "fp", "fn", "tn", "precision", "recall", "f1",
        "accuracy"), "classificationReport")
    val y = checkedLabel(labelCol, "classificationReport")
    val pred = checkedScore(scoreCol, "classificationReport") >= lit(threshold)
    val counts = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      count(when(pred && y === 1L, 1)).as("tp"),
      count(when(pred && y === 0L, 1)).as("fp"),
      count(when(!pred && y === 1L, 1)).as("fn"),
      count(when(!pred && y === 0L, 1)).as("tn"))
    def d(name: String): Column = col(name).cast("double")
    counts.select((groupCols.map(col) :+ col("n") :+ col("tp") :+
      col("fp") :+ col("fn") :+ col("tn") :+
      when(col("tp") + col("fp") > 0L, d("tp") / (d("tp") + d("fp")))
        .as("precision") :+
      when(col("tp") + col("fn") > 0L, d("tp") / (d("tp") + d("fn")))
        .as("recall") :+
      when(col("tp") + col("fp") + col("fn") > 0L,
        lit(2.0) * d("tp") / (lit(2.0) * d("tp") + d("fp") + d("fn")))
        .as("f1") :+
      (((col("tp") + col("tn")).cast("double")) / d("n")).as("accuracy")): _*)
  }

  /** Chance-corrected agreement metrics per group at a decision
    * threshold — Cohen's κ (agreement beyond the class-prior chance
    * level) and the Matthews correlation coefficient (the binary-
    * confusion φ; the single-number summary that stays honest under
    * class imbalance where accuracy and even F1 inflate). Run beside
    * [[classificationReport]] when the positive rate is far from ½.
    *
    * Exactness: the four confusion counts are exact integers; κ's
    * `(p_o − p_e)/(1 − p_e)` is evaluated in the n²-multiplied integer
    * form (numerator `n(tp+tn) − E`, denominator `n² − E`, with
    * `E = (tp+fp)(tp+fn) + (fn+tn)(fp+tn)` as DECIMAL — exact), one
    * division each; MCC's four marginal products go DECIMAL before the
    * one sqrt/division tree. NULL κ when p_e = 1 (one cell holds
    * everything); NULL MCC when any marginal is zero.
    * One map-side-combinable pass. Emits (groupCols…, `n`, `kappa`,
    * `mcc`). */
  def agreement(df: DataFrame, scoreCol: String, labelCol: String,
                threshold: Double, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "agreement needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "kappa", "mcc", "__tp", "__fp", "__fn", "__tn"),
      "Eval.agreement")
    val y = checkedLabel(labelCol, "agreement")
    val pred = checkedScore(scoreCol, "agreement") >= lit(threshold)
    val counts = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      count(when(pred && y === 1L, 1)).as("__tp"),
      count(when(pred && y === 0L, 1)).as("__fp"),
      count(when(!pred && y === 1L, 1)).as("__fn"),
      count(when(!pred && y === 0L, 1)).as("__tn"))
    def dd(c: Column): Column = c.cast("decimal(38,0)")
    val (tp, fp, fn_, tn) =
      (col("__tp"), col("__fp"), col("__fn"), col("__tn"))
    val nDec = dd(col("n"))
    val e = dd(tp + fp) * dd(tp + fn_) + dd(fn_ + tn) * dd(fp + tn)
    val kNum = (nDec * dd(tp + tn) - e).cast("double")
    val kDen = (nDec * nDec - e).cast("double")
    val mNum = (dd(tp) * dd(tn) - dd(fp) * dd(fn_)).cast("double")
    val mDen = (dd(tp + fp) * dd(tp + fn_) * dd(tn + fp) * dd(tn + fn_))
      .cast("double")
    counts.select((groupCols.map(col) :+ col("n") :+
      when(kDen > 0.0, kNum / kDen).as("kappa") :+
      when(mDen > 0.0, mNum / sqrt(mDen)).as("mcc")): _*)
  }

  /** Per-group cross-entropy (log-loss) of probability scores against
    * 0/1 labels — the proper scoring rule beside [[brierScore]]:
    * `−mean(y·ln(p) + (1−y)·ln(1−p))`, with scores clamped into
    * [eps, 1−eps] so a confidently-wrong 0/1 score costs `−ln(eps)`
    * instead of ∞ (the standard library convention).
    *
    * Determinism: each row's term is one fixed IEEE tree (clamp, ln,
    * multiply-add) QUANTIZED to 10 dp, and the quantized terms
    * accumulate as exact BIGINTs — the mean is order-independent with
    * one final division chain, so the result is engine-identical
    * without any pinned-order fold (error ≤ 5·10⁻¹¹, documented). One
    * map-side-combinable pass. Emits (groupCols…, `n`, `log_loss`). */
  def logLoss(df: DataFrame, scoreCol: String, labelCol: String,
              groupCols: Seq[String], eps: Double = 1e-15): DataFrame = {
    require(eps > 0.0 && eps < 0.5, s"eps in (0, 0.5), got $eps")
    require(groupCols.nonEmpty, "logLoss needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "log_loss", "__t"), "Eval.logLoss")
    val y = checkedLabel(labelCol, "logLoss")
    val p = greatest(lit(eps),
      least(lit(1.0 - eps), checkedScore(scoreCol, "logLoss")))
    val term = -(y.cast("double") * log(p) +
      (lit(1.0) - y.cast("double")) * log(lit(1.0) - p))
    val q = round(term * lit(1e10)).cast("long")
    df.withColumn("__t", q)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("__s"))
      .select((groupCols.map(col) :+ col("n") :+
        (col("__s").cast("double") / col("n").cast("double") / lit(1e10))
          .as("log_loss")): _*)
      .drop("__s")
  }

  /** Per-group ROC curve points — one row per DISTINCT score with the
    * cumulative (fpr, tpr) when thresholding at that score (score-
    * descending sweep; thresholds are inclusive, matching
    * [[classificationReport]]'s `>=`). Feed a plotting layer or locate
    * the operating point; [[binaryAuc]] integrates this curve without
    * materializing it.
    *
    * Exactness: per-score positive/negative counts are exact; the
    * cumulative sums ride one keyed sort; fpr/tpr are single divisions
    * of exact integers. Groups with no positives (or no negatives) emit
    * NULL tpr (fpr). Output size = distinct scores per group — bounded
    * by quantized score cardinality, not corpus rows.
    * Emits (groupCols…, `threshold`, `n_at`, `tpr`, `fpr`). */
  def rocCurve(df: DataFrame, scoreCol: String, labelCol: String,
               groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "rocCurve needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("threshold", "n_at", "tpr", "fpr", "__pos", "__neg"),
      "Eval.rocCurve")
    val y = checkedLabel(labelCol, "rocCurve")
    val perScore = df
      .groupBy((groupCols.map(col) :+
        checkedScore(scoreCol, "rocCurve").as("threshold")): _*)
      .agg(count(lit(1)).as("n_at"), sum(y).as("__pos"),
        sum(lit(1L) - y).as("__neg"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCols.map(col): _*)
    val cumPos = sum(col("__pos")).over(w)
    val cumNeg = sum(col("__neg")).over(w)
    val totPos = sum(col("__pos")).over(tot)
    val totNeg = sum(col("__neg")).over(tot)
    perScore.select((groupCols.map(col) :+ col("threshold") :+
      col("n_at") :+
      when(totPos > 0L, cumPos.cast("double") / totPos.cast("double"))
        .as("tpr") :+
      when(totNeg > 0L, cumNeg.cast("double") / totNeg.cast("double"))
        .as("fpr")): _*)
  }

  /** Best-F1 operating point per group — the threshold SELECTION step
    * after [[rocCurve]]'s full sweep: at every distinct score taken as
    * `score ≥ threshold`, `F1 = 2·TP/(2·TP + FP + FN)`, and the argmax
    * (ties to the HIGHEST threshold — the stricter classifier) comes
    * back as one row per group with its precision/recall.
    *
    * Exactness: the cumulative TP/FP ladder is exact integers on the
    * descending-score sort ([[rocCurve]]'s frame); each F1 is one
    * integer-ratio division, and the argmax packs
    * `(f1, threshold)` as a struct max — float-compare on f1 then the
    * threshold tie-break, deterministic. NULL row values when a group
    * has no positives. One exchange + the distinct-score window.
    * Emits (groupCols…, `threshold`, `f1`, `precision`, `recall`). */
  def bestF1Threshold(df: DataFrame, scoreCol: String, labelCol: String,
                      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "bestF1Threshold needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("threshold", "f1", "precision", "recall", "__pos", "__neg",
        "__cand", "__best", "__tp", "__fp", "__tpos"),
      "bestF1Threshold")
    val y = checkedLabel(labelCol, "bestF1Threshold")
    val perScore = df
      .groupBy((groupCols.map(col) :+
        checkedScore(scoreCol, "bestF1Threshold").as("threshold")): _*)
      .agg(sum(y).as("__pos"), sum(lit(1L) - y).as("__neg"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCols.map(col): _*)
    // stage the three cumulative counts once — inlined references made
    // ExtractWindowExpressions emit 14 window aggregates instead of 3
    val staged = perScore.select(col("*"),
      sum(col("__pos")).over(w).as("__tp"),
      sum(col("__neg")).over(w).as("__fp"),
      sum(col("__pos")).over(tot).as("__tpos"))
    val (tp, fp, totPos) = (col("__tp"), col("__fp"), col("__tpos"))
    val fn = totPos - tp
    val f1 = when(totPos > 0L,
      (lit(2.0) * tp.cast("double")) /
        (lit(2.0) * tp.cast("double") + fp.cast("double") +
          fn.cast("double")))
    val prec = when(tp + fp > 0L,
      tp.cast("double") / (tp + fp).cast("double"))
    val rec = when(totPos > 0L, tp.cast("double") / totPos.cast("double"))
    staged
      .select((groupCols.map(col) :+
        struct(f1.as("f1"), col("threshold"), prec.as("p"), rec.as("r"))
          .as("__cand")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__cand")).as("__best"))
      .select((groupCols.map(col) :+
        col("__best").getField("threshold").as("threshold") :+
        col("__best").getField("f1").as("f1") :+
        col("__best").getField("p").as("precision") :+
        col("__best").getField("r").as("recall")): _*)
  }

  /** Kaplan–Meier survival curve per group (public estimator): at each
    * distinct duration t, `S(t) = Π_{t_i ≤ t} (n_i − d_i)/n_i` over
    * event counts d and at-risk counts n — the time-to-event readout
    * (time-to-conversion, churn, time-to-failure) that censored
    * observations (`event = 0`: still alive at their last observation)
    * enter WITHOUT biasing, which a naive duration mean cannot do.
    *
    * Exactness: per-(group, t) event/censor counts are exact; n_risk is
    * the group total minus the strictly-before cumulative (exact
    * integers on one keyed sort); each step factor is ONE division
    * `(n−d)/n`, and the running product is the NATIVE `runprod` window
    * chain — one IEEE multiply per step, no log/exp round-trip, so the
    * curve replays bit-exactly in any engine applying the same factors
    * in the same order. `timeCol` must be integral (durations, not
    * timestamps — difference them first).
    *
    * One (group, t) aggregate + two window passes on one keyed sort;
    * output is distinct-duration-sized, never row-sized. Emits
    * (groupCols…, `t`, `n_risk`, `events`, `censored`, `survival`). */
  def kaplanMeier(df: DataFrame, timeCol: String, eventCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "kaplanMeier needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("t", "n_risk", "events", "censored", "survival", "__d", "__c"),
      "Eval.kaplanMeier")
    val y = checkedLabel(eventCol, "kaplanMeier")
    val perTime = df
      .groupBy((groupCols.map(col) :+ col(timeCol).cast("long").as("t")): _*)
      .agg(sum(y).as("__d"), sum(lit(1L) - y).as("__c"))
    val tot = Window.partitionBy(groupCols.map(col): _*)
    val before = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ordered = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("t"))
    val nRisk = sum(col("__d") + col("__c")).over(tot) -
      coalesce(sum(col("__d") + col("__c")).over(before), lit(0L))
    val factor = (nRisk - col("__d")).cast("double") / nRisk.cast("double")
    perTime
      .withColumn("n_risk", nRisk)
      .withColumn("survival", graft.functions.FinancialFunctions
        .runprod(factor).over(ordered))
      .select((groupCols.map(col) :+ col("t") :+ col("n_risk") :+
        col("__d").as("events") :+ col("__c").as("censored") :+
        col("survival")): _*)
  }

  /** Nelson–Aalen cumulative hazard per group (public estimator) — the
    * additive companion to [[kaplanMeier]]: `H(t) = Σ_{t_i ≤ t} d_i/n_i`
    * accumulates instantaneous risk instead of multiplying survival,
    * better-behaved for small risk sets and the standard input to
    * hazard-ratio eyeballing. Same censoring semantics and the same
    * (group, t) collapse.
    *
    * Exactness: counts and at-risk sizes are exact integers on the
    * [[kaplanMeier]] frame; each step is ONE division `d/n`, and the
    * cumulative sum is Spark's growing-frame running fold — one IEEE
    * add per step in t-order, which the oracle replays as the identical
    * recursive walk (never a re-associating windowed float sum). Emits
    * (groupCols…, `t`, `n_risk`, `events`, `censored`, `hazard`). */
  def nelsonAalen(df: DataFrame, timeCol: String, eventCol: String,
                  groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "nelsonAalen needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("t", "n_risk", "events", "censored", "hazard", "__d", "__c"),
      "nelsonAalen")
    val y = checkedLabel(eventCol, "nelsonAalen")
    val perTime = df
      .groupBy((groupCols.map(col) :+ col(timeCol).cast("long").as("t")): _*)
      .agg(sum(y).as("__d"), sum(lit(1L) - y).as("__c"))
    val tot = Window.partitionBy(groupCols.map(col): _*)
    val before = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nRisk = sum(col("__d") + col("__c")).over(tot) -
      coalesce(sum(col("__d") + col("__c")).over(before), lit(0L))
    val step = col("__d").cast("double") / nRisk.cast("double")
    perTime
      .withColumn("n_risk", nRisk)
      .withColumn("hazard", sum(step).over(run))
      .select((groupCols.map(col) :+ col("t") :+ col("n_risk") :+
        col("__d").as("events") :+ col("__c").as("censored") :+
        col("hazard")): _*)
  }

  /** McNemar's test per group (public formulation) — the PAIRED
    * classifier comparison: on the same rows, count where only A is
    * correct (`b`) vs only B (`c`); under "equal accuracy" the
    * discordant split is symmetric, `χ² = (b−c)²/(b+c)` (and the
    * continuity-corrected `(|b−c|−1)²/(b+c)`), χ²(1). The right test
    * when two models score the SAME eval set — [[agreement]]'s kappa
    * measures how much they agree, this one tests which is better.
    *
    * Exactness: correctness flags and both discordant counts are exact
    * integers from ONE map-side-combinable aggregate; each statistic is
    * one integer-ratio division. NULL when b + c = 0 (no discordant
    * evidence). NULL labels raise ([[checkedLabel]]); NULL predictions
    * count as incorrect (documented — a non-answer is a wrong answer).
    * Emits (groupCols…, `n`, `a_only`, `b_only`, `mcnemar_chi2`,
    * `mcnemar_chi2_cc`). */
  def mcnemar(df: DataFrame, predACol: String, predBCol: String,
              labelCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "mcnemar needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "a_only", "b_only", "mcnemar_chi2", "mcnemar_chi2_cc"),
      "mcnemar")
    val y = checkedLabel(labelCol, "mcnemar") === 1L
    val okA = coalesce(col(predACol).cast("boolean") === y, lit(false))
    val okB = coalesce(col(predBCol).cast("boolean") === y, lit(false))
    val sums = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(when(okA && !okB, 1L).otherwise(0L)).as("a_only"),
      sum(when(!okA && okB, 1L).otherwise(0L)).as("b_only"))
    val b = col("a_only")
    val c = col("b_only")
    val disc = (b + c).cast("double")
    val diff = (b - c).cast("double")
    val diffCc = (abs(b - c) - lit(1L)).cast("double")
    sums.select((groupCols.map(col) :+ col("n") :+ b :+ c :+
      when(b + c > 0L, (diff * diff) / disc).as("mcnemar_chi2") :+
      when(b + c > 0L, (diffCc * diffCc) / disc)
        .as("mcnemar_chi2_cc")): _*)
  }

  /** Hosmer–Lemeshow goodness-of-fit per group (public formulation) —
    * the calibration TEST beside [[calibrationBins]]' descriptive
    * reliability curve: decile the predictions, compare observed
    * positives against the summed predicted probability per decile,
    * `χ² = Σ_g (O_g − E_g)²/(E_g(1 − E_g/n_g))`, asymptotically
    * χ²(bins − 2). A model can have great AUC and still fail here
    * (right ranking, wrong probabilities).
    *
    * Exactness: probabilities quantize to `scale` decimals (out-of-range
    * values raise), so each decile's `E` is an exact integer sum
    * descaled once; binning is `ntile` over the TOTAL order
    * (probability, tieCol) — the [[graft.operators.Stats.bhAdjust]]
    * tie-column contract, making the decile multisets deterministic;
    * the ≤bins-element fold runs in bin order. NULL χ² when any bin
    * degenerates (E ≤ 0 or E ≥ n — no information) or a group has
    * fewer rows than bins. One keyed sort + two combinable aggregates.
    * Emits (groupCols…, `n`, `k_bins`, `hl_chi2`). */
  def hosmerLemeshow(df: DataFrame, probCol: String, labelCol: String,
                     tieCol: String, groupCols: Seq[String],
                     bins: Int = 10, scale: Int = 6): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    require(scale >= 1 && scale <= 9, s"scale must be in [1,9], got $scale")
    require(groupCols.nonEmpty,
      "hosmerLemeshow needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "k_bins", "hl_chi2", "__p", "__y", "__bin", "__terms"),
      "hosmerLemeshow")
    val unit = math.pow(10, scale).toLong
    val pi = round(col(probCol).cast("double") * lit(unit.toDouble))
      .cast("long")
    val pChecked = when(pi.isNull || pi < 0L || pi > unit,
        raise_error(concat(lit(s"hosmerLemeshow: $probCol must be a " +
          "probability in [0,1], got "), col(probCol).cast("string"))))
      .otherwise(pi)
    val y = checkedLabel(labelCol, "hosmerLemeshow")
    val base = df.select((groupCols.map(col) :+ pChecked.as("__p") :+
      y.as("__y") :+ col(tieCol).as("__tie")): _*)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__p"), col("__tie"))
    val binned = base.withColumn("__bin", ntile(bins).over(w))
    val perBin = binned.groupBy((groupCols.map(col) :+ col("__bin")): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__y")).as("__og"),
        sum(col("__p")).as("__sg"))
    val e = col("__sg").cast("double") / lit(unit.toDouble)
    val nd = col("__ng").cast("double")
    val od = col("__og").cast("double")
    val term = when(e > 0.0 && e < nd,
      ((od - e) * (od - e)) / (e * (lit(1.0) - e / nd)))
    val sums = perBin
      .withColumn("__term", term)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__ng")).as("n"),
        count(lit(1)).cast("long").as("k_bins"),
        sort_array(collect_list(struct(col("__bin"),
          coalesce(col("__term"), lit(Double.NaN)).as("__t"))))
          .as("__terms"))
    val chi2 = aggregate(col("__terms"), lit(0.0),
      (acc, s) => acc + s.getField("__t"))
    sums.select((groupCols.map(col) :+ col("n") :+ col("k_bins") :+
      when(col("k_bins") === bins.toLong && !isnan(chi2), chi2)
        .as("hl_chi2")): _*)
  }

  /** Truncated rank-biased overlap per query (public formulation,
    * Webber 2010): compare two top-k rankings with geometric
    * top-weighting — `RBO_k = (1−p)·Σ_{d=1..k} p^{d−1}·(ov_d/d)` where
    * `ov_d` is the overlap of the two depth-d prefixes. The
    * top-heavy comparison [[rrfFusion]]'s consumers want (Jaccard of
    * top-k treats rank 1 and rank k alike; RBO does not).
    *
    * Determinism: a shared item contributes from depth
    * `m = max(rank_A, rank_B)` on, so `ov_d` is an exact cumulative
    * count; the geometric weights `(1−p)·p^{d−1}` FOLD AT PLAN BUILD
    * (Scala doubles, embedded verbatim in the oracle — no runtime pow),
    * and the ≤k-term sum folds in depth order. Ranks must be 1-based
    * and unique per (query, list) — build them with a deterministic
    * tie-broken `row_number`. Emits (queryCol…, `n_shared`, `rbo`). */
  def rankBiasedOverlap(df: DataFrame, queryCols: Seq[String],
                        rankACol: String, rankBCol: String, k: Int,
                        pPm: Int = 900): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    require(pPm >= 1 && pPm <= 999, s"p permille must be in [1,999], got $pPm")
    require(queryCols.nonEmpty,
      "rankBiasedOverlap needs at least one query column")
    Guards.requireNoReserved(df.columns,
      Seq("n_shared", "rbo", "__m", "__terms"), "rankBiasedOverlap")
    val p = pPm / 1000.0
    // (1−p)·p^(d−1) folded on the Scala side, one literal per depth
    val weights: IndexedSeq[Double] = {
      var pw = 1.0
      (1 to k).map { _ => val w = (1.0 - p) * pw; pw = pw * p; w }
    }
    val ra = col(rankACol).cast("long")
    val rb = col(rankBCol).cast("long")
    val shared = df
      .filter(ra.isNotNull && rb.isNotNull && ra <= k.toLong &&
        rb <= k.toLong)
      .select((queryCols.map(col) :+
        greatest(ra, rb).as("__m")): _*)
    // ov_d = count of shared items with m <= d; term_d = w_d * ov_d / d
    val counts = shared.groupBy((queryCols.map(col) :+ col("__m")): _*)
      .agg(count(lit(1)).as("__cm"))
    val grp = Window.partitionBy(queryCols.map(col): _*)
    val run = grp.orderBy(col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ov at each DISTINCT m; depths between distinct m values reuse the
    // previous ov — expand to the full 1..k ladder via a k-bounded fold
    val withOv = counts.withColumn("__ov", sum(col("__cm")).over(run))
    val packed = withOv.groupBy(queryCols.map(col): _*)
      .agg(sum(col("__cm")).as("n_shared"),
        sort_array(collect_list(struct(col("__m"), col("__ov"))))
          .as("__terms"))
    // depth ladder: for d in 1..k, ov_d = ov at the largest m <= d —
    // evaluate as one fold over the k literal weights, walking the
    // (m, ov) steps with a (index, acc) accumulator
    val termArr = array(weights.zipWithIndex.map { case (w, i) =>
      struct(lit(i + 1).as("d"), lit(w).as("w"))
    }: _*)
    val rboCol = aggregate(termArr, lit(0.0), (acc, e) => {
      val d = e.getField("d").cast("long")
      val stepsLe = filter(col("__terms"), t => t.getField("__m") <= d)
      val ovAtD = coalesce(
        get(stepsLe, size(stepsLe) - 1).getField("__ov"), lit(0L))
      acc + e.getField("w") * (ovAtD.cast("double") / d.cast("double"))
    })
    packed.select((queryCols.map(col) :+ col("n_shared") :+
      rboCol.as("rbo")): _*)
  }

  /** Restricted mean survival time per group (public estimator): the
    * area under the [[kaplanMeier]] curve up to horizon `tau` — "average
    * survival time over the first τ days", the single-number effect
    * size clinicians and churn teams quote where a hazard ratio is
    * unintuitive. Completes the survival family: KM (curve),
    * [[nelsonAalen]] (hazard), [[logRank]] (test), RMST (effect size).
    *
    * Exactness: the step curve's factors and at-risk ladder are the KM
    * frame verbatim (native runprod chain); each rectangle is one fixed
    * tree `S_i·(min(t_{i+1},τ) − min(t_i,τ))` on exact integer clamps,
    * and the accumulation is a t-ordered growing-frame fold (the
    * [[nelsonAalen]] contract) plus the exact `min(t₁,τ)` head segment
    * at S = 1. `tau` and the durations are integral. Emits one row per
    * group: (groupCols…, `n`, `tau`, `rmst`). */
  def rmst(df: DataFrame, timeCol: String, eventCol: String,
           groupCols: Seq[String], tau: Long): DataFrame = {
    require(tau > 0L, s"tau must be > 0, got $tau")
    require(groupCols.nonEmpty, "rmst needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "tau", "rmst", "__d", "__c", "__t", "__area", "__rn",
        "__cnt", "__head", "__n"), "rmst")
    val y = checkedLabel(eventCol, "rmst")
    val perTime = df
      .groupBy((groupCols.map(col) :+ col(timeCol).cast("long").as("__t")): _*)
      .agg(sum(y).as("__d"), sum(lit(1L) - y).as("__c"))
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val ord = grp.orderBy(col("__t"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nRisk = sum(col("__d") + col("__c")).over(grp) -
      coalesce(sum(col("__d") + col("__c")).over(before), lit(0L))
    val factor = (nRisk - col("__d")).cast("double") / nRisk.cast("double")
    val surv = graft.functions.FinancialFunctions.runprod(factor).over(ord)
    val nextT = coalesce(lead(col("__t"), 1).over(ord), lit(tau))
    val width = greatest(lit(0L),
      least(nextT, lit(tau)) - least(col("__t"), lit(tau)))
    val seg = surv * width.cast("double")
    val withRuns = perTime
      .withColumn("__area", sum(seg).over(run))
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__cnt", count(lit(1)).over(grp))
      .withColumn("__head",
        least(min(col("__t")).over(grp), lit(tau)).cast("double"))
      .withColumn("__n", sum(col("__d") + col("__c")).over(grp))
    withRuns
      .filter(col("__rn") === col("__cnt"))
      .select((groupCols.map(col) :+ col("__n").as("n") :+
        lit(tau).as("tau") :+
        (col("__head") + col("__area")).as("rmst")): _*)
  }

  /** Expected calibration error per group (public formulation) — the
    * magnitude sibling of [[hosmerLemeshow]]'s hypothesis test:
    * `ECE = Σ_g (n_g/n)·|acc_g − conf_g|` over the same deterministic
    * deciles — "on average, how far is the stated confidence from the
    * realized accuracy", the number model cards quote. Same binning,
    * quantization, and fold discipline as hosmerLemeshow; no degenerate
    * guard needed (every term is defined). NULL when the group
    * underfills its bins. Emits (groupCols…, `n`, `k_bins`, `ece`). */
  def expectedCalibrationError(df: DataFrame, probCol: String,
                               labelCol: String, tieCol: String,
                               groupCols: Seq[String], bins: Int = 10,
                               scale: Int = 6): DataFrame = {
    require(bins >= 1, s"need at least 1 bin, got $bins")
    require(scale >= 1 && scale <= 9, s"scale must be in [1,9], got $scale")
    require(groupCols.nonEmpty,
      "expectedCalibrationError needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "k_bins", "ece", "__p", "__y", "__bin", "__terms",
        "__tie", "__term"),
      "expectedCalibrationError")
    val unit = math.pow(10, scale).toLong
    val pi = round(col(probCol).cast("double") * lit(unit.toDouble))
      .cast("long")
    val pChecked = when(pi.isNull || pi < 0L || pi > unit,
        raise_error(concat(lit(s"expectedCalibrationError: $probCol must " +
          "be a probability in [0,1], got "), col(probCol).cast("string"))))
      .otherwise(pi)
    val y = checkedLabel(labelCol, "expectedCalibrationError")
    val base = df.select((groupCols.map(col) :+ pChecked.as("__p") :+
      y.as("__y") :+ col(tieCol).as("__tie")): _*)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__p"), col("__tie"))
    val binned = base.withColumn("__bin", ntile(bins).over(w))
    val perBin = binned.groupBy((groupCols.map(col) :+ col("__bin")): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__y")).as("__og"),
        sum(col("__p")).as("__sg"))
    val ng = col("__ng").cast("double")
    val acc = col("__og").cast("double") / ng
    val conf = (col("__sg").cast("double") / lit(unit.toDouble)) / ng
    val sums = perBin
      .withColumn("__term", struct(col("__bin"),
        (col("__ng").cast("double") * abs(acc - conf)).as("__w")))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__ng")).as("n"),
        count(lit(1)).cast("long").as("k_bins"),
        sort_array(collect_list(col("__term"))).as("__terms"))
    val fold = aggregate(col("__terms"), lit(0.0),
      (acc0, s) => acc0 + s.getField("__w"))
    sums.select((groupCols.map(col) :+ col("n") :+ col("k_bins") :+
      when(col("k_bins") === bins.toLong,
        fold / col("n").cast("double")).as("ece")): _*)
  }

  /** Two-arm log-rank test per group (public formulation) — the
    * hypothesis test over [[kaplanMeier]]'s curves: at each event time,
    * compare arm A's observed events `d_A` against the expectation
    * `e_A = d·n_A/n` under the pooled-risk null, with the
    * hypergeometric variance `v = d·(n_A/n)·(1 − n_A/n)·(n−d)/(n−1)`;
    * `z = Σ(d_A − e_A)/√Σv`, χ²(1) = z². The "are these two survival
    * curves the same" readout (treatment vs control churn, cohort A vs
    * B time-to-conversion).
    *
    * Exactness: per-time counts and at-risk sizes are exact integers on
    * one keyed sort; each time's (d_A − e_A) and v are fixed double
    * trees; BOTH running sums accumulate in t-order via growing-frame
    * folds (one IEEE add per step — the [[nelsonAalen]] contract, which
    * the oracle mirrors as a recursive walk). Rows with an arm outside
    * {A, B} raise. NULL z when either arm is empty or ΣV ≤ 0. Emits one
    * row per group: (groupCols…, `n_a`, `n_b`, `logrank_z`,
    * `logrank_chi2`). */
  def logRank(df: DataFrame, timeCol: String, eventCol: String,
              armCol: String, armA: String, armB: String,
              groupCols: Seq[String]): DataFrame = {
    require(armA != armB, "the two arms must differ")
    require(groupCols.nonEmpty, "logRank needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_a", "n_b", "logrank_z", "logrank_chi2",
        "__arm", "__t", "__ev", "__da", "__db", "__ca", "__cb",
        "__u", "__v", "__rn", "__cnt", "__ta", "__tb", "__pa", "__pb"),
      "logRank")
    val a = col(armCol)
    val armChecked = when(a.isNull || (a =!= armA && a =!= armB),
        raise_error(concat(
          lit(s"logRank: $armCol must be '$armA' or '$armB', got "),
          coalesce(a, lit("NULL")))))
      .otherwise(a)
    val y = checkedLabel(eventCol, "logRank")
    val perTime = df
      .select((groupCols.map(col) :+ armChecked.as("__arm") :+
        col(timeCol).cast("long").as("__t") :+ y.as("__ev")): _*)
      .groupBy((groupCols.map(col) :+ col("__t")): _*)
      .agg(
        sum(when(col("__arm") === armA, col("__ev")).otherwise(0L))
          .as("__da"),
        sum(when(col("__arm") =!= armA, col("__ev")).otherwise(0L))
          .as("__db"),
        sum(when(col("__arm") === armA, lit(1L) - col("__ev"))
          .otherwise(0L)).as("__ca"),
        sum(when(col("__arm") =!= armA, lit(1L) - col("__ev"))
          .otherwise(0L)).as("__cb"))
    val grp = Window.partitionBy(groupCols.map(col): _*)
    val before = grp.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = grp.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // STAGE the six primitive window aggregates as columns before any
    // arithmetic reuses them: inlining (the old shape) made
    // ExtractWindowExpressions emit one aggregate PER REFERENCE — 36
    // window buffers instead of 8 (nA/frac alone appear 5× in the u/v
    // trees). Staged, every closed form below is plain column math.
    val staged = perTime.select(col("*"),
      sum(col("__da") + col("__ca")).over(grp).as("__ta"),
      sum(col("__db") + col("__cb")).over(grp).as("__tb"),
      coalesce(sum(col("__da") + col("__ca")).over(before), lit(0L))
        .as("__pa"),
      coalesce(sum(col("__db") + col("__cb")).over(before), lit(0L))
        .as("__pb"),
      row_number().over(grp.orderBy(col("__t"))).as("__rn"),
      count(lit(1)).over(grp).as("__cnt"))
    val nA = col("__ta") - col("__pa")
    val nB = col("__tb") - col("__pb")
    val d = col("__da") + col("__db")
    val n = nA + nB
    val frac = nA.cast("double") / n.cast("double")
    val eA = d.cast("double") * frac
    val uTerm = col("__da").cast("double") - eA
    val vTerm = when(n > 1L,
      d.cast("double") * frac * (lit(1.0) - frac) *
        ((n - d).cast("double") / (n - lit(1L)).cast("double")))
      .otherwise(lit(0.0))
    val withRuns = staged
      .withColumn("__u", sum(uTerm).over(run))
      .withColumn("__v", sum(vTerm).over(run))
    val z = col("__u") / sqrt(when(col("__v") > 0.0, col("__v")))
    withRuns
      .filter(col("__rn") === col("__cnt"))
      .select((groupCols.map(col) :+ col("__ta").as("n_a") :+
        col("__tb").as("n_b") :+
        when(col("__ta") >= 1L && col("__tb") >= 1L, z).as("logrank_z") :+
        when(col("__ta") >= 1L && col("__tb") >= 1L, z * z)
          .as("logrank_chi2")): _*)
  }

  /** Per-key forecast-error metrics — MAE, RMSE, and MASE (mean absolute
    * error scaled by the in-sample m-step seasonal-naive error, the
    * scale-free Hyndman–Koehler benchmark metric: MASE < 1 beats the
    * naive forecaster). The backtest readout for any per-key prediction
    * column (a lagged close, an SMA, a model score).
    *
    * Exactness: both columns quantize to `scale` decimals; |e| and e²
    * accumulate as exact BIGINTs (e² per term ≤ (range·10^scale)² must
    * fit — the [[graft.operators.Stats.welchT]] bound), and each metric
    * is a fixed IEEE tree: `mae = (Σ|e|/n)/10^s`,
    * `rmse = sqrt(Σe²/n)/10^s`, `mase = (Σ|e|/n)/(Σ|d_m|/n_m)` with
    * `d_m = a_t − a_{t−m}` over the SAME keyed sort — scale cancels in
    * MASE, so it needs no descaling. Rows with a NULL actual or forecast
    * are excluded from the error sums; the naive denominator uses all
    * complete (a_t, a_{t−m}) pairs. NULL `mase` when the naive error sum
    * is zero (a constant series — the benchmark does not exist). NULL
    * `mae`/`rmse` on an empty key. One keyed sort (for the seasonal
    * lag), one map-side-combinable aggregate.
    * Emits (keyCols…, `n`, `mae`, `rmse`, `mase`). */
  def forecastErrors(df: DataFrame, actualCol: String, forecastCol: String,
                     keyCols: Seq[String], orderCols: Seq[String],
                     m: Int = 1, scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "forecastErrors needs at least one key column")
    require(m >= 1, s"seasonality must be >= 1, got $m")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "mae", "rmse", "mase", "__a", "__f", "__d"),
      "forecastErrors")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ai = round(col(actualCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val fi = round(col(forecastCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df.select((keyCols.map(col) :+ ai.as("__a") :+ fi.as("__f")) :+
      (ai - lag(ai, m).over(w)).as("__d"): _*)
    val e = col("__a") - col("__f")
    val ok = col("__a").isNotNull && col("__f").isNotNull
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(when(ok, 1)).as("n"),
      sum(when(ok, abs(e))).as("__sae"),
      sum(when(ok, e * e)).as("__see"),
      count(col("__d")).as("__nm"),
      sum(abs(col("__d"))).as("__snd"))
    val nD = col("n").cast("double")
    val descale = lit(math.pow(10, scale))
    val mae = col("__sae").cast("double") / nD
    sums.select((keyCols.map(col) :+ col("n") :+
      when(col("n") >= 1L, mae / descale).as("mae") :+
      when(col("n") >= 1L,
        sqrt(col("__see").cast("double") / nD) / descale).as("rmse") :+
      when(col("n") >= 1L && col("__snd") > 0L,
        mae / (col("__snd").cast("double") / col("__nm").cast("double")))
        .as("mase")): _*)
  }

  /** Per-key pinball (quantile) loss — the proper scoring rule for a
    * QUANTILE forecast (a VaR line, a p90 latency predictor): under-
    * prediction of the τ-quantile costs `τ·e`, over-prediction
    * `(1−τ)·|e|`; the expected loss is minimized exactly at the true
    * quantile. The quantile companion to [[forecastErrors]]' point
    * metrics.
    *
    * Exactness: both columns quantize to `scale` decimals; with τ in
    * permille the PER-MILLE loss `1000·L = τ‰·e` (e ≥ 0) or
    * `(τ‰−1000)·e` (e < 0) is an exact BIGINT per row, summed exactly —
    * the mean descales as ONE fixed tree `(Σ/(1000·n))/10^s`. NULL rows
    * (either side) are excluded; NULL loss on an empty key. One
    * map-side-combinable aggregate, no sort. Emits (keyCols…, `n`,
    * `pinball`). */
  def pinballLoss(df: DataFrame, actualCol: String, forecastCol: String,
                  keyCols: Seq[String], tauPm: Int,
                  scale: Int = 0): DataFrame = {
    require(tauPm >= 1 && tauPm <= 999,
      s"tau permille must be in [1,999], got $tauPm")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(keyCols.nonEmpty, "pinballLoss needs at least one key column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "pinball", "__a", "__f"), "pinballLoss")
    val ai = round(col(actualCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val fi = round(col(forecastCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((keyCols.map(col) :+ ai.as("__a") :+ fi.as("__f")): _*)
      .filter(col("__a").isNotNull && col("__f").isNotNull)
    val e = col("__a") - col("__f")
    val lossPm = when(e >= 0L, lit(tauPm.toLong) * e)
      .otherwise(lit(tauPm.toLong - 1000L) * e)
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"), sum(lossPm).as("__s"))
    sums.select((keyCols.map(col) :+ col("n") :+
      when(col("n") >= 1L,
        (col("__s").cast("double") /
          (lit(1000.0) * col("n").cast("double"))) /
          lit(math.pow(10, scale))).as("pinball")): _*)
  }

  /** Kupiec proportion-of-failures (POF) test per key — VaR-model
    * backtesting (public formulation): given a forecast loss line
    * (`varCol`, e.g. a rolling quantile) claiming violation probability
    * p, does the OBSERVED violation count x/n reject the claim?
    * `LR = −2[(n−x)ln(1−p) + x·ln p − (n−x)ln(1−x/n) − x·ln(x/n)]`,
    * asymptotically χ²(1). The calibration companion to
    * [[graft.operators.Rolling.historicalVar]] (which builds the line)
    * and [[pinballLoss]] (which scores its level).
    *
    * A violation is a raw IEEE `actual < var` compare (both sides the
    * caller's doubles — no quantization; the count is deterministic in
    * any engine); rows with a NULL on either side are excluded. Each
    * data-dependent `ln` rounds to 10 decimals in-engine (cross-engine
    * libm ulp — the [[graft.operators.TextOps.bigramPmi]] contract);
    * `x = 0` / `x = n` edge terms are exact zeros, not `0·ln 0` NaNs.
    * NULL LR on an empty key. One map-side-combinable aggregate, no
    * sort. Emits (keyCols…, `n`, `violations`, `kupiec_lr`). */
  def kupiecPof(df: DataFrame, actualCol: String, varCol: String,
                keyCols: Seq[String], pPm: Int): DataFrame = {
    require(pPm >= 1 && pPm <= 999, s"p permille must be in [1,999], got $pPm")
    require(keyCols.nonEmpty, "kupiecPof needs at least one key column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "violations", "kupiec_lr", "__viol"), "kupiecPof")
    val a = col(actualCol).cast("double")
    val v = col(varCol).cast("double")
    val base = df
      .filter(a.isNotNull && v.isNotNull)
      .select((keyCols.map(col) :+
        when(a < v, 1L).otherwise(0L).as("__viol")): _*)
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"), sum(col("__viol")).as("violations"))
    val p = pPm / 1000.0
    def r10(c: Column): Column = round(log(c), 10) + lit(0.0)
    val nD = col("n").cast("double")
    val xD = col("violations").cast("double")
    val nx = nD - xD
    val claim = nx * lit(r10Const(math.log(1.0 - p))) +
      xD * lit(r10Const(math.log(p)))
    val fit = when(col("violations") < col("n"),
        nx * r10(lit(1.0) - xD / nD)).otherwise(lit(0.0)) +
      when(col("violations") > 0L, xD * r10(xD / nD)).otherwise(lit(0.0))
    val lr = lit(-2.0) * (claim - fit)
    sums.select((keyCols.map(col) :+ col("n") :+ col("violations") :+
      when(col("n") >= 1L, lr).as("kupiec_lr")): _*)
  }

  /** Scala-side 10-dp HALF_UP rounding matching Spark/DuckDB `round(x, 10)`
    * — for ln-of-constant terms folded at plan build. */
  private def r10Const(x: Double): Double =
    BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Christoffersen independence test per key — [[kupiecPof]]'s partner
    * in the conditional-coverage pair (public formulation): POF asks
    * whether violations are as FREQUENT as claimed; this asks whether
    * they CLUSTER — a first-order Markov chain on the violation flag,
    * `LR_ind` comparing one common violation probability against
    * state-dependent (π01, π11), asymptotically χ²(1). A VaR line can
    * pass POF and still fail here (right count, wrong days — all in one
    * crisis week).
    *
    * Violation flags are raw IEEE `actual < var` compares; consecutive
    * pairs come from ONE keyed sort; the four transition counts are
    * exact. Each data-dependent `ln` rounds to 10 decimals in-engine
    * (the [[kupiecPof]] contract); zero-count terms are exact zeros.
    * NULL LR when no pairs or a degenerate chain (all-violation /
    * no-violation series: the alternative is not identified). Emits
    * (keyCols…, `n00`, `n01`, `n10`, `n11`, `christoffersen_lr`). */
  def christoffersenInd(df: DataFrame, actualCol: String, varCol: String,
                        keyCols: Seq[String],
                        orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "christoffersenInd needs at least one key column")
    Guards.requireNoReserved(df.columns,
      Seq("n00", "n01", "n10", "n11", "christoffersen_lr",
        "__viol", "__prev"), "christoffersenInd")
    val a = col(actualCol).cast("double")
    val v = col(varCol).cast("double")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val base = df
      .filter(a.isNotNull && v.isNotNull)
      .select(((keyCols ++ orderCols).distinct.map(col) :+
        when(a < v, 1L).otherwise(0L).as("__viol")): _*)
      .withColumn("__prev", lag(col("__viol"), 1).over(w))
      .filter(col("__prev").isNotNull)
    def cnt(p: Long, c: Long): Column =
      sum(when(col("__prev") === p && col("__viol") === c, 1L)
        .otherwise(0L))
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      cnt(0L, 0L).as("n00"), cnt(0L, 1L).as("n01"),
      cnt(1L, 0L).as("n10"), cnt(1L, 1L).as("n11"))
    def d(c: Column): Column = c.cast("double")
    val (c00, c01, c10, c11) =
      (col("n00"), col("n01"), col("n10"), col("n11"))
    val nT = d(c00) + d(c01) + d(c10) + d(c11)
    val pi = (d(c01) + d(c11)) / nT
    val pi01 = d(c01) / (d(c00) + d(c01))
    val pi11 = d(c11) / (d(c10) + d(c11))
    def r10(c: Column): Column = round(log(c), 10) + lit(0.0)
    def term(n: Column, arg: Column): Column =
      when(n > 0L, n.cast("double") * r10(arg)).otherwise(lit(0.0))
    val common = term(c00 + c10, lit(1.0) - pi) + term(c01 + c11, pi)
    val markov = term(c00, lit(1.0) - pi01) + term(c01, pi01) +
      term(c10, lit(1.0) - pi11) + term(c11, pi11)
    val lr = lit(-2.0) * (common - markov)
    val degenerate = (c01 + c11) === 0L || (c00 + c10) === 0L
    sums.select((keyCols.map(col) :+ c00 :+ c01 :+ c10 :+ c11 :+
      when(nT > 0.0 && !degenerate, lr).as("christoffersen_lr")): _*)
  }

  /** Per-key Theil's U2 — forecast accuracy RELATIVE to the naive
    * last-value forecaster: `U2 = √(Σ(f_t−a_t)² / Σ(a_{t−1}−a_t)²)`
    * over the rows where all three values exist. U2 < 1 beats naive —
    * the go/no-go gate for shipping any model over a persistence
    * baseline; the ratio twin of [[forecastErrors]]' MASE (which scales
    * by the naive MAE, not RMSE).
    *
    * Exactness: quantized BIGINT errors, both squared sums exact (the
    * quantization scale cancels in the ratio), `√(num/den)` as one
    * fixed tree. NULL when no complete rows or a constant series
    * (den = 0). One keyed sort (the naive lag) + one map-side-
    * combinable aggregate. Emits (keyCols…, `n_pairs`, `theil_u2`). */
  def theilU2(df: DataFrame, actualCol: String, forecastCol: String,
              keyCols: Seq[String], orderCols: Seq[String],
              scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "theilU2 needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_pairs", "theil_u2", "__a", "__f", "__nv"), "theilU2")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ai = round(col(actualCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val fi = round(col(forecastCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((keyCols.map(col) :+ ai.as("__a") :+ fi.as("__f")) :+
        lag(ai, 1).over(w).as("__nv"): _*)
      .filter(col("__a").isNotNull && col("__f").isNotNull &&
        col("__nv").isNotNull)
    val ef = col("__f") - col("__a")
    val en = col("__nv") - col("__a")
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(ef * ef).as("__num"), sum(en * en).as("__den"))
    sums.select((keyCols.map(col) :+ col("n_pairs") :+
      when(col("n_pairs") >= 1L && col("__den") > 0L,
        sqrt(col("__num").cast("double") / col("__den").cast("double")))
        .as("theil_u2")): _*)
  }
}
