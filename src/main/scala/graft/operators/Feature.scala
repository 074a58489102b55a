package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group feature conditioning for training pipelines: tail clipping
  * (winsorization) and min-max scaling. Both follow the [[Anomaly]] /
  * [[Profile]] shape — ONE stats aggregation into a tiny per-group frame
  * that broadcasts back onto the corpus — so the corpus is scanned twice
  * and shuffled never (the stats agg shuffles only its map-side partials).
  *
  * Winsorization defaults to exact grouped `percentile` (the DuckDB
  * oracle replays `quantile_cont` bit-for-bit on it — proven by the
  * quantile gate); `approx = true` swaps in `percentile_approx` (bounded
  * sketch state, map-side combinable) for the 100 TB profile-everything
  * path, same query shape — the same flag contract as
  * [[Anomaly.iqrOutliers]].
  */
object Feature {

  /** Clip `valueCol` into its per-group [pLow, pHigh] percentile band —
    * the standard heavy-tail defense before scaling. Adds
    * `<valueCol>_winsor`. */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                pLow: Double, pHigh: Double, approx: Boolean = false,
                accuracy: Int = 10000): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh,
      s"need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val out = s"${valueCol}_winsor"
    Guards.requireNoReserved(df.columns, Seq(out, "__lo", "__hi"),
      "Feature.winsorize")
    val x = col(valueCol).cast("double")
    def pct(p: Double) =
      if (approx) percentile_approx(x, lit(p), lit(accuracy))
      else percentile(x, lit(p))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(pct(pLow).as("__lo"), pct(pHigh).as("__hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(out, least(greatest(x, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust scaling (the sklearn `RobustScaler` formula):
    * `(x − median) / (p75 − p25)` within the group — centering and spread
    * from order statistics, so heavy tails cannot drag the scale the way
    * they drag a mean/σ standardization. NULL on a zero IQR (no spread to
    * scale by). Exact grouped percentiles by default (oracle parity via
    * `quantile_cont`), `approx = true` for the sketch path. Adds
    * `<valueCol>_robust`. */
  def robustScale(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val out = s"${valueCol}_robust"
    Guards.requireNoReserved(df.columns, Seq(out, "__med", "__q1", "__q3"),
      "Feature.robustScale")
    val x = col(valueCol).cast("double")
    def pct(p: Double) =
      if (approx) percentile_approx(x, lit(p), lit(accuracy))
      else percentile(x, lit(p))
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(pct(0.5).as("__med"), pct(0.25).as("__q1"), pct(0.75).as("__q3"))
    df.join(broadcast(stats), groupCols)
      .withColumn(out,
        when(col("__q3") =!= col("__q1"),
          (x - col("__med")) / (col("__q3") - col("__q1"))))
      .drop("__med", "__q1", "__q3")
  }

  /** Frequency-ordered label indexing (the `StringIndexer` contract):
    * every distinct label maps to a dense 0-based index, most frequent
    * first, alphabetical tie-break — a pure function of the corpus, so
    * train and inference sides derive identical vocabularies. Emits
    * (labelCol, `n`, `label_index`). The ranking window runs on the
    * COUNTS frame (|labels| rows), never the corpus. */
  def labelIndex(df: DataFrame, labelCol: String): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("n", "label_index"),
      "Feature.labelIndex")
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col(labelCol).asc)
    counts.withColumn("label_index",
      (row_number().over(w) - 1).cast("int"))
  }

  /** Smoothed target encoding (the classic m-estimate, public formula):
    * each category encodes as `(Σy_c + m·prior) / (n_c + m)` with
    * `prior` = the global target mean — categories with little evidence
    * shrink toward the prior instead of memorizing noise. One tiny
    * per-category aggregation plus a one-row global frame; exact on
    * integer-valued (or scaled) targets, the two divisions are one fixed
    * IEEE tree. Emits (categoryCol, `n`, `target_enc`). */
  def targetEncode(df: DataFrame, categoryCol: String, targetCol: String,
                   m: Double = 10.0): DataFrame = {
    require(m >= 0, s"smoothing must be non-negative, got $m")
    Guards.requireNoReserved(df.columns,
      Seq("n", "target_enc", "__sy", "__N", "__S"), "Feature.targetEncode")
    val y = col(targetCol).cast("double")
    val cats = df.groupBy(col(categoryCol))
      .agg(count(y).as("n"), sum(y).as("__sy"))
    val global = df.agg(count(y).as("__N"), sum(y).as("__S"))
    cats.crossJoin(broadcast(global))
      .withColumn("target_enc",
        (col("__sy") + lit(m) * (col("__S") / col("__N")))
          / (col("n") + lit(m)))
      .drop("__sy", "__N", "__S")
  }

  /** Balanced class weights (the sklearn `class_weight='balanced'`
    * heuristic, public formula): `weight = N / (K · n_c)` for each label
    * with count `n_c`, total rows `N`, `K` distinct labels — rare classes
    * weigh up, the weighted corpus balances. One tiny counts aggregation;
    * the totals frame is one row and cross-joins back onto it (broadcast
    * by construction). Emits (labelCol, `n`, `weight`). */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("n", "weight", "__N", "__K"),
      "Feature.classWeights")
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__N"), count(lit(1)).as("__K"))
    counts.crossJoin(broadcast(totals))
      .withColumn("weight",
        col("__N").cast("double") / (col("__K") * col("n")).cast("double"))
      .drop("__N", "__K")
  }

  /** Scale `valueCol` to [0, 1] within its group:
    * `(x − min) / (max − min)`; NULL on a flat group (no range to scale
    * into — the caller decides the fill). Exact selections + one IEEE
    * division. Adds `<valueCol>_scaled`. */
  def minMaxScale(df: DataFrame, valueCol: String,
                  groupCols: Seq[String]): DataFrame = {
    val out = s"${valueCol}_scaled"
    Guards.requireNoReserved(df.columns, Seq(out, "__mn", "__mx"),
      "Feature.minMaxScale")
    val x = col(valueCol).cast("double")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(min(x).as("__mn"), max(x).as("__mx"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(out,
        when(col("__mx") =!= col("__mn"),
          (x - col("__mn")) / (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }

  /** Quantile normalization across groups — map every group's value onto
    * the POOLED distribution at the value's within-group quantile: the
    * batch-effect corrector (bioinformatics lineage) that forces all
    * groups onto one common distribution while preserving each group's
    * internal order. After it, per-source score distributions are
    * directly comparable — the cross-source calibration step before a
    * single corpus-wide quality threshold.
    *
    * Contract: within a group, a DISTINCT value of rank `r` (of `n`
    * distinct, ascending) sits at `p = (r−1)/(n−1)` (singleton groups
    * pin `p = 0.5`); the output is the pooled multiset's linearly
    * interpolated quantile at `p` (`percentile` semantics over ALL
    * rows). Ties within a group map identically by construction.
    *
    * Scale shape: ranks come from a keyed window over the DISTINCT
    * (group, value) frame; pooled positions come from the shared
    * bucketed prefix-sum kernel ([[Prefix]], no global sort) giving each
    * pooled value its position segment `[lo, hi]`; the two position
    * lookups (floor/ceil of the interpolation index) are
    * [[RangeJoin.rangeJoin]] bucketized point-in-interval equi-joins;
    * the result joins back to the corpus on (group, value). Every rank
    * and position is an exact integer; `p`, the index `h = p·(N−1)`,
    * and the interpolation are single IEEE trees — bit-replayable.
    * Nulls fail loudly. Emits the input plus `quantile_normalized`. */
  def quantileNormalize(df: DataFrame, valueCol: String,
                        groupCols: Seq[String],
                        posBucketWidth: Long = 1L << 20): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize needs a group column")
    require(posBucketWidth >= 1, s"bad posBucketWidth $posBucketWidth")
    Guards.requireNoReserved(df.columns,
      Seq("quantile_normalized", "__v", "__r", "__n", "__cnt", "__ntot",
        "__h", "__k", "__kk", "__pk", "__ntot", "__pv1", "__pv2", "__lo1", "__hi1",
        "__lo2", "__hi2", "cum___cnt"), "quantileNormalize")
    val x = when(col(valueCol).isNull, raise_error(lit(
        s"quantileNormalize: $valueCol must be non-null; filter or impute " +
          "first"))).otherwise(col(valueCol).cast("double"))
    val keyed = df.select(groupCols.map(col) :+ x.as("__v"): _*)
    // within-group DISTINCT-value ranks (reduced frame, keyed window)
    val dv = keyed.distinct()
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val ranked = dv
      .withColumn("__r", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wn))
    // pooled multiset position segments via the bucketed prefix kernel
    val pooled = keyed.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
    val seg = Prefix.bucketedCumsum(pooled, "__v", Seq("__cnt"), 64)
      .select(col("__v").as("__pv1"),
        (col("cum___cnt") - col("__cnt")).as("__lo1"),
        (col("cum___cnt") - 1L).as("__hi1"))
    val total = pooled.agg(sum(col("__cnt")).as("__ntot"))
    val p = when(col("__n") === 1, lit(0.5))
      .otherwise((col("__r") - 1).cast("double") /
        (col("__n") - 1).cast("double"))
    val h = p * (col("__ntot").cast("double") - lit(1.0))
    val positioned = ranked.crossJoin(broadcast(total))
      .withColumn("__h", h)
      .withColumn("__k", floor(col("__h")).cast("long"))
      .withColumn("__kk", least(col("__k") + 1L, col("__ntot") - 1L))
      .withColumn("__pk", lit(1))
    val seg1 = seg.withColumn("__ik1", lit(1))
    val j1 = RangeJoin.rangeJoin(positioned, seg1,
      "__pk", "__ik1", "__k", "__lo1", "__hi1", posBucketWidth)
      .drop("__ik1", "__lo1", "__hi1")
    val seg2 = seg.select(col("__pv1").as("__pv2"), col("__lo1").as("__lo2"),
      col("__hi1").as("__hi2")).withColumn("__ik2", lit(1))
    val j2 = RangeJoin.rangeJoin(j1, seg2,
      "__pk", "__ik2", "__kk", "__lo2", "__hi2", posBucketWidth)
      .drop("__pk", "__ik2", "__lo2", "__hi2")
    val frac = col("__h") - floor(col("__h"))
    val mapped = j2.select(groupCols.map(col) :+ col("__v") :+
      (col("__pv1") + frac * (col("__pv2") - col("__pv1")))
        .as("quantile_normalized"): _*)
    df.withColumn("__v", x)
      .join(mapped, groupCols :+ "__v")
      .drop("__v")
  }
}
