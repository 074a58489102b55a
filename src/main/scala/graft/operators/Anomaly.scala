package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped z-score outlier detection — the distribution-shift / bad-shard
  * screen a training pipeline runs over metric columns (values, lengths,
  * scores) before ingestion.
  *
  * Plan: one pass computing per-group (n, Σx, Σx²) — all map-side
  * combinable — then the tiny stats frame broadcasts back onto the corpus
  * and each row gets `z = (x − μ)/σ` with
  * `σ = sqrt(Σx²/n − (Σx/n)²)` (population form). No window, no sort: at
  * 100 TB this is two corpus scans (stats, then flag) of which the second
  * fuses into whatever consumes the flags.
  *
  * Determinism note: when the values are integer-valued and small enough
  * that Σx and Σx² stay under 2^53 (counts, token lengths, quantities —
  * the usual screen targets), both sums are EXACT doubles regardless of
  * aggregation order, and everything downstream is a fixed IEEE expression
  * tree — bit-identical in any engine (the oracle gate runs this way).
  * For general doubles the sums are order-dependent in the last ulp, same
  * as any parallel sum.
  */
object Anomaly {

  /** Robust (Tukey-fence) outlier screen: flag rows outside
    * `[q1 − k·IQR, q3 + k·IQR]` within their group. Unlike the z-score
    * screen, quartiles don't move when the outliers themselves are extreme
    * — the usual choice for heavy-tailed metrics (doc lengths, scores).
    *
    * Plan: exact grouped quartiles by default (one aggregation), then the
    * tiny bounds frame broadcasts back onto the corpus. On integer-valued
    * metrics the interpolated quartiles land on exact binary fractions and
    * the fence arithmetic is a fixed IEEE tree — bit-identical in any
    * engine (the oracle gate runs this way).
    *
    * `approx = true` is the 100 TB path: `percentile_approx`'s bounded
    * KLL-style sketch replaces the exact percentile — same single-
    * aggregation query shape, but per-group state is O(accuracy) instead
    * of every value, so no group can blow executor memory. The sketch
    * returns an actual data value at most 1/accuracy of the rank away from
    * the true quantile (no interpolation) — the fence moves by at most
    * that rank error, bounded in the tolerance spec.
    *
    * Emits the input columns plus `lo_bound`, `hi_bound`, `is_outlier`. */
  def iqrOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Double = 1.5, approx: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "iqrOutliers needs at least one group column")
    require(k > 0, s"fence multiplier must be positive, got $k")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    Guards.requireNoReserved(df.columns,
      Seq("lo_bound", "hi_bound", "is_outlier", "__q1", "__q3"), "iqrOutliers")
    val x = col(valueCol).cast("double")
    def quantile(p: Double) =
      if (approx) percentile_approx(x, lit(p), lit(accuracy))
      else percentile(x, lit(p))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(quantile(0.25).as("__q1"),
           quantile(0.75).as("__q3"))
    val iqr = col("__q3") - col("__q1")
    df.join(broadcast(bounds), groupCols)
      .withColumn("lo_bound", col("__q1") - lit(k) * iqr)
      .withColumn("hi_bound", col("__q3") + lit(k) * iqr)
      .withColumn("is_outlier", x < col("lo_bound") || x > col("hi_bound"))
      .drop("__q1", "__q3")
  }

  /** Flag rows whose `|z| > threshold` within their group. Emits the input
    * columns plus `z_score` and `is_outlier`; groups with σ = 0 (constant
    * value) emit z = 0 and never flag. */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "zscoreOutliers needs at least one group column")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    Guards.requireNoReserved(df.columns,
      Seq("z_score", "is_outlier", "__n", "__sum", "__sumsq"), "zscoreOutliers")
    val x = col(valueCol).cast("double")
    val stats = df.groupBy(groupCols.map(col): _*).agg(
      count(x).as("__n"),
      sum(x).as("__sum"),
      sum(x * x).as("__sumsq"))
    val mu = col("__sum") / col("__n")
    val sigma = sqrt(col("__sumsq") / col("__n") - mu * mu)
    val z = when(sigma > 0.0, (x - mu) / sigma).otherwise(lit(0.0))
    df.join(broadcast(stats), groupCols)
      .withColumn("z_score", z)
      .withColumn("is_outlier", abs(col("z_score")) > threshold)
      .drop("__n", "__sum", "__sumsq")
  }

  /** Grubbs' outlier statistic per group (public formula): the
    * single-most-extreme-point readout `G = max|x − x̄|/s` (sample s)
    * plus the suspect value and its side — the hypothesis-flavored
    * companion to [[zscoreOutliers]]' pointwise flags (G is the max
    * z-score against the SAMPLE sd, the quantity textbook critical
    * tables are stated for).
    *
    * Exactness: values quantize to `scale` decimals; (n, Σx, Σx², min,
    * max) are exact integers from ONE map-side-combinable aggregate —
    * no window, no second scan; `max|x − x̄|` evaluates integer-exactly
    * as `max(n·max − Σx, Σx − n·min)` (both BIGINTs, the n-multiplied
    * trick), and G is one fixed tree `(dev/n) / √(Cxx/(n·(n−1)))` — the
    * 10^scale factors cancel between deviation and sd. NULL G when
    * n < 3 (Grubbs is
    * undefined) or zero variance. Emits (groupCols…, `n`, `grubbs_g`,
    * `suspect`, `suspect_side` — 'high'/'low', ties to high). */
  def grubbs(df: DataFrame, valueCol: String, groupCols: Seq[String],
             scale: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "grubbs needs at least one group column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "grubbs_g", "suspect", "suspect_side",
        "__xi", "__sx", "__sxx", "__mn", "__mx"), "Anomaly.grubbs")
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val sums = df
      .select((groupCols.map(col) :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
      .groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum(col("__xi")).as("__sx"),
        sum(col("__xi").cast("decimal(38,0)") * col("__xi")).as("__sxx"),
        min(col("__xi")).as("__mn"),
        max(col("__xi")).as("__mx"))
    val nL = col("n")
    val devHi = nL * col("__mx") - col("__sx")     // n·(max − x̄), exact
    val devLo = col("__sx") - nL * col("__mn")     // n·(x̄ − min), exact
    val dev = greatest(devHi, devLo).cast("double")
    val cxx = (nL.cast("decimal(38,0)") * col("__sxx") -
      col("__sx").cast("decimal(38,0)") * col("__sx")).cast("double")
    val nD = nL.cast("double")
    // max|x−x̄| = dev/n and s = √(Cxx/(n(n−1))) — quantization cancels
    val g = (dev / nD) /
      sqrt(when(cxx > 0.0, cxx) / (nD * (nD - lit(1.0))))
    val pow10 = lit(math.pow(10, scale))
    sums.select((groupCols.map(col) :+ col("n") :+
      when(nL >= 3L, g).as("grubbs_g") :+
      (when(devHi >= devLo, col("__mx")).otherwise(col("__mn"))
        .cast("double") / pow10).as("suspect") :+
      when(devHi >= devLo, lit("high")).otherwise(lit("low"))
        .as("suspect_side")): _*)
  }

  /** Benford first-significant-digit screen over a positive decimal
    * column — the classic fabricated-numbers detector (organic
    * multi-scale amounts follow `P(d) = log10(1 + 1/d)`; invented,
    * capped, or synthetic values don't). Emits ONE ROW PER DIGIT 1–9
    * (`digit`, `n`, `p_obs`, `p_benford`, `chi2_term`) — callers sum
    * `chi2_term` for the test statistic ([[Divergence.psi]] per-row
    * discipline; zero-count digits emit via the spine).
    *
    * Cross-engine exactness: the value scales to a BIGINT at the
    * caller's decimal `scale` ([[Rolling.vwap]] discipline) and the
    * first digit comes from the LONG's string rendering — integer
    * formatting is identical everywhere, where float `log10`-based
    * digit extraction is ulp-fragile near powers of ten. The Benford
    * probabilities round to 10 decimals in-engine (`log10` ulp); the
    * chi² term is then a fixed IEEE tree. Nulls and non-positive values
    * fail loudly (they have no first significant digit — filter first).
    *
    * One counting aggregation (≤ 9 groups, map-side combinable) + the
    * 9-row spine join: scan-bound at any scale. */
  def benford(df: DataFrame, valueCol: String, scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("digit", "n", "p_obs", "p_benford", "chi2_term", "__N"), "benford")
    val xInt = {
      val v = round(col(valueCol).cast("double") *
        lit(math.pow(10, scale))).cast("long")
      when(col(valueCol).isNull || v <= 0L, raise_error(concat(
          lit(s"benford: $valueCol must be positive and non-null at " +
            s"scale=$scale, got "),
          coalesce(col(valueCol).cast("string"), lit("NULL")))))
        .otherwise(v)
    }
    val digit = substring(xInt.cast("string"), 1, 1).cast("int")
    val counts = df.groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val total = counts.agg(sum(col("n")).as("__N"))
    val pBen = round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")),
      10) + lit(0.0)
    val nD = coalesce(col("n"), lit(0L))
    val nT = col("__N").cast("double")
    val expected = nT * col("p_benford")
    spine.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), nD.as("n"), col("__N"),
        (nD.cast("double") / nT).as("p_obs"), pBen.as("p_benford"))
      .select(col("digit"), col("n"), col("p_obs"), col("p_benford"),
        ((col("n").cast("double") - expected) *
          (col("n").cast("double") - expected) / expected).as("chi2_term"))
  }

  /** Two-sided CUSUM change-point screen over keyed, ordered series —
    * the sequential drift detector that catches a persistent small mean
    * shift long before any per-point outlier screen fires: the classic
    * recurrences `S⁺_i = max(0, S⁺_{i−1} + (x_i − target − slack))` /
    * `S⁻_i = max(0, S⁻_{i−1} + (target − x_i − slack))`, flagged when
    * either side reaches `threshold`.
    *
    * THE PLAN TRICK: the max-0 reset looks like an irreducible
    * sequential recurrence, but `S_i = C_i − min(0, min_{j≤i} C_j)` with
    * `C` the plain cumulative sum of deviations — so both sides are ONE
    * keyed window pass (cumsum + running min share the frame), fully
    * declarative, no fold, no UDF state. The [[Rolling.vwap]]
    * scaled-BIGINT discipline makes every C/min/S an exact integer in
    * any layout; only the descaled outputs divide.
    *
    * `orderCols` must totally order each partition (append a tie id) —
    * a tied order would make the path layout-dependent. Emits the input
    * plus `cusum_hi`, `cusum_lo`, `is_shift`. */
  def cusum(df: DataFrame, valueCol: String, partCols: Seq[String],
            orderCols: Seq[String], target: Double, slack: Double,
            threshold: Double, scale: Int = 0): DataFrame = {
    require(partCols.nonEmpty, "cusum needs at least one partition column")
    require(orderCols.nonEmpty, "cusum needs an ordering")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("cusum_hi", "cusum_lo", "is_shift", "__chi", "__clo",
        "__mhi", "__mlo"), "cusum")
    val pow = math.pow(10, scale)
    val xInt = round(col(valueCol).cast("double") * lit(pow)).cast("long")
    val tInt = math.round(target * pow)
    val kInt = math.round(slack * pow)
    val hInt = math.round(threshold * pow)
    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // two window projections over the SAME spec (cumsum, then running min
    // of the cumsum) — one exchange, one sort, two Window ops: the
    // q_ma_crossover nested-window shape
    val cummed = df
      .withColumn("__chi", sum(xInt - lit(tInt + kInt)).over(w))
      .withColumn("__clo", sum(lit(tInt - kInt) - xInt).over(w))
      // stage the running mins once — sHi/sLo are each referenced twice
      // (output + shift flag), which doubled the min window expressions
      .withColumn("__mhi", min(col("__chi")).over(w))
      .withColumn("__mlo", min(col("__clo")).over(w))
    val sHi = col("__chi") - least(lit(0L), col("__mhi"))
    val sLo = col("__clo") - least(lit(0L), col("__mlo"))
    cummed
      .withColumn("cusum_hi", sHi.cast("double") / lit(pow))
      .withColumn("cusum_lo", sLo.cast("double") / lit(pow))
      .withColumn("is_shift", sHi >= lit(hInt) || sLo >= lit(hInt))
      .drop("__chi", "__clo", "__mhi", "__mlo")
  }

  /** Median/MAD robust outlier screen: flag rows whose modified z-score
    * `|x − median| / (1.4826·MAD)` exceeds `threshold` within their group
    * — the most outlier-resistant of the three screens (the mean AND the
    * spread estimate both have 50% breakdown, where [[zscoreOutliers]]
    * has 0% and the IQR fence 25%). The 1.4826 constant (`1/Φ⁻¹(3/4)`)
    * scales MAD to σ under normality, so `threshold` is in familiar
    * σ units (3.5 is the Iglewicz–Hoaglin convention).
    *
    * Plan: TWO grouped percentile passes by construction (the MAD is a
    * median OF deviations from the median — the second pass cannot start
    * before the first finishes): medians aggregate and broadcast back,
    * then deviations aggregate and broadcast back. Same `approx` /
    * `accuracy` contract as [[iqrOutliers]] for the 100 TB path. On
    * integer-valued metrics the interpolated medians are exact binary
    * fractions and the score is a fixed IEEE tree — bit-replayable.
    *
    * Groups with MAD = 0 (over half the group at the median) emit
    * `robust_z` = 0 and never flag — σ=0 [[zscoreOutliers]] precedent;
    * rank-based screens are the wrong tool there anyway.
    *
    * Emits the input columns plus `med`, `mad`, `robust_z`,
    * `is_outlier`. */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  threshold: Double = 3.5, approx: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "madOutliers needs at least one group column")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    Guards.requireNoReserved(df.columns,
      Seq("med", "mad", "robust_z", "is_outlier", "__dev"), "madOutliers")
    val x = col(valueCol).cast("double")
    def med(c: org.apache.spark.sql.Column) =
      if (approx) percentile_approx(c, lit(0.5), lit(accuracy))
      else percentile(c, lit(0.5))
    val medians = df.groupBy(groupCols.map(col): _*).agg(med(x).as("med"))
    val withDev = df.join(broadcast(medians), groupCols)
      .withColumn("__dev", abs(x - col("med")))
    val mads = withDev.groupBy(groupCols.map(col): _*)
      .agg(med(col("__dev")).as("mad"))
    val scale = lit(1.4826) * col("mad")
    withDev.join(broadcast(mads), groupCols)
      .withColumn("robust_z",
        when(col("mad") > 0.0, (x - col("med")) / scale).otherwise(lit(0.0)))
      .withColumn("is_outlier", abs(col("robust_z")) > threshold)
      .drop("__dev")
  }
}
