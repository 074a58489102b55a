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
}
