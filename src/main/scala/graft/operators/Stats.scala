package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact grouped statistics — correlation, least-squares trend, and
  * categorical-independence screening for dataset analysis (feature
  * drift, metric coupling, source×label dependence).
  *
  * Everything is built from sufficient statistics — per-group
  * `(n, Σx, Σy, Σxy, Σx², Σy²)` or contingency counts — so each pass is
  * one map-side-combinable aggregation; no window, no sort, no second
  * corpus scan. The closed forms then evaluate as fixed IEEE expression
  * trees on the tiny aggregated frame.
  *
  * Determinism contract (same as [[Anomaly]]): on integer-valued inputs
  * whose sums stay under 2^53 the sufficient statistics are EXACT in any
  * aggregation order, and every downstream op (multiply, divide, sqrt) is
  * IEEE-correctly-rounded — bit-identical in any engine, which is how the
  * oracle gates run. On general doubles the sums are order-dependent in
  * the last ulp, as with any parallel sum.
  */
object Stats {

  /** Per-group Pearson correlation and OLS fit `y = slope·x + intercept`.
    * Emits `n`, `corr_xy`, `slope`, `intercept`; groups with zero variance
    * in x (or y for corr) emit NULL for the undefined quantities. */
  def corrRegression(df: DataFrame, xCol: String, yCol: String,
                     groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "corrRegression needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "corr_xy", "slope", "intercept",
        "__sx", "__sy", "__sxy", "__sxx", "__syy"), "corrRegression")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val sums = df.groupBy(groupCols.map(col): _*).agg(
      count(when(x.isNotNull && y.isNotNull, 1)).cast("double").as("n"),
      sum(when(y.isNotNull, x)).as("__sx"),
      sum(when(x.isNotNull, y)).as("__sy"),
      sum(x * y).as("__sxy"),
      sum(when(y.isNotNull, x * x)).as("__sxx"),
      sum(when(x.isNotNull, y * y)).as("__syy"))
    // nΣxy − ΣxΣy etc. — the standard computational forms; each is one
    // exactly-rounded IEEE op chain over exact sums
    val covN = col("n") * col("__sxy") - col("__sx") * col("__sy")
    val varXN = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val varYN = col("n") * col("__syy") - col("__sy") * col("__sy")
    sums
      .withColumn("corr_xy",
        when(varXN > 0.0 && varYN > 0.0, covN / sqrt(varXN * varYN)))
      .withColumn("slope", when(varXN > 0.0, covN / varXN))
      .withColumn("intercept",
        when(varXN > 0.0, (col("__sy") - covN / varXN * col("__sx")) / col("n")))
      .withColumn("n", col("n").cast("long"))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** Chi-squared contingency table over two categorical columns: one row
    * per observed `(a, b)` cell with observed count, expected count under
    * independence `rowTot·colTot/total`, and the cell's χ² contribution
    * `(obs − exp)²/exp`. The caller sums contributions (and compares to
    * the χ² distribution) when a single statistic is wanted — emitting
    * per-cell terms keeps the output free of any cross-cell FP reduction
    * (and is the useful view anyway: WHICH cells deviate).
    *
    * Plan: one contingency aggregation over the corpus; margins aggregate
    * the tiny cells frame (never rescan the corpus) and broadcast back. */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("n_obs", "expected", "chi2_term", "__rt", "__ct", "__tot"),
      "chiSquareCells")
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("n_obs"))
    val rowTot = cells.groupBy(col(aCol)).agg(sum("n_obs").as("__rt"))
    val colTot = cells.groupBy(col(bCol)).agg(sum("n_obs").as("__ct"))
    val total = cells.agg(sum("n_obs").as("__tot"))
    // rowTot·colTot is an exact BIGINT product; the cast and division are
    // single exactly-rounded ops
    val expected = (col("__rt") * col("__ct")).cast("double") / col("__tot").cast("double")
    cells
      .join(broadcast(rowTot), aCol)
      .join(broadcast(colTot), bCol)
      .crossJoin(broadcast(total))
      .withColumn("expected", expected)
      .withColumn("chi2_term",
        (col("n_obs").cast("double") - col("expected")) *
        (col("n_obs").cast("double") - col("expected")) / col("expected"))
      .drop("__rt", "__ct", "__tot")
  }

  /** Binned mutual information between two numeric columns — the
    * information-theoretic dependence screen for NUMERIC pairs, where
    * [[chiSquareCells]] handles categorical ones (feature redundancy
    * detection, leakage screening before a split). Both columns bucket
    * into fixed-width clamped bins ([[Divergence.psi]] edges), and each
    * occupied 2-D cell emits its MI contribution
    * `p_xy·ln(p_xy/(p_x·p_y))` — ONE ROW PER CELL (the [[psi]]
    * discipline: callers sum `mi_term` for the scalar, and per-cell
    * output sidesteps cross-engine summation order). Empty cells
    * contribute 0 and are absent.
    *
    * Scale shape: the corpus aggregates ONCE into ≤ nBinsX·nBinsY
    * cells (map-side combinable); margins re-aggregate the CELLS frame
    * and broadcast back (the [[chiSquareCells]] plan). The single `ln`
    * of a rational rounds to 10 decimals ([[Divergence.tokenEntropy]]
    * rationale); counts and ratios are exact. Nulls fail loudly. */
  def mutualInfoBins(df: DataFrame, xCol: String, yCol: String,
                     nBinsX: Int, loX: Double, hiX: Double,
                     nBinsY: Int, loY: Double, hiY: Double): DataFrame = {
    require(nBinsX >= 2 && nBinsY >= 2,
      s"need >= 2 bins per axis, got ($nBinsX, $nBinsY)")
    require(loX < hiX && loY < hiY,
      s"need lo < hi per axis, got [$loX,$hiX) [$loY,$hiY)")
    Guards.requireNoReserved(df.columns,
      Seq("bin_x", "bin_y", "n_xy", "n_x", "n_y", "mi_term",
        "__nx", "__ny", "__tot"), "mutualInfoBins")
    def binned(c: String, nBins: Int, lo: Double, hi: Double): Column = {
      val width = (hi - lo) / nBins
      val x = when(col(c).isNull, raise_error(lit(
          s"mutualInfoBins: $c must be non-null (a null would silently " +
            "land in bin 0); filter or impute first")))
        .otherwise(col(c).cast("double"))
      least(lit(nBins - 1),
        greatest(lit(0), floor((x - lit(lo)) / lit(width)).cast("int")))
    }
    val cells = df.groupBy(
        binned(xCol, nBinsX, loX, hiX).as("bin_x"),
        binned(yCol, nBinsY, loY, hiY).as("bin_y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy(col("bin_x")).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col("bin_y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("__tot"))
    val pxy = col("n_xy").cast("double") / col("__tot").cast("double")
    // ln(p_xy/(p_x·p_y)) = ln(n_xy·N/(n_x·n_y)) — one ln of a rational
    val ratio = (col("n_xy") * col("__tot")).cast("double") /
      (col("n_x") * col("n_y")).cast("double")
    cells
      .join(broadcast(mx), "bin_x")
      .join(broadcast(my), "bin_y")
      .crossJoin(broadcast(tot))
      .select(col("bin_x"), col("bin_y"), col("n_xy"), col("n_x"), col("n_y"),
        (pxy * (round(log(ratio), 10) + lit(0.0))).as("mi_term"))
  }

  /** Per-group Welch's t-test between two variants of an experiment —
    * the unequal-variance two-sample test behind every A/B metric
    * readout. Emits one row per group: `n_a`, `n_b`, `mean_a`, `mean_b`,
    * `t`, `df_welch` (the Welch–Satterthwaite degrees of freedom).
    * `t`/`df_welch` are NULL when either side has < 2 rows or both
    * variances are zero (the statistic is undefined); the p-value cut is
    * left to the caller (a threshold on |t| at the df — policy, and
    * erf is not portable across engines).
    *
    * ONE map-side-combinable aggregation pass over the event log: six
    * conditional sums per group. The [[Rolling.vwap]] scaled-BIGINT
    * discipline makes it bit-replayable: `valueCol` is scaled by
    * `10^scale` and rounded to a long (the metric must be
    * decimal-valued at that scale), so the sufficient statistics are
    * exact integers in any aggregation order, and `t`/`df_welch` are
    * scale-invariant closed forms — fixed IEEE trees, no rounding.
    * Sum-of-squares bound: `n·(max|x|·10^scale)² < 2^63`. Rows with a
    * variant outside {a, b} fail loudly (a silently dropped arm is a
    * corrupted experiment readout — filter first if intended). */
  def welchT(df: DataFrame, valueCol: String, variantCol: String,
             variantA: String, variantB: String, groupCols: Seq[String],
             scale: Int = 0): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_a", "n_b", "mean_a", "mean_b", "t", "df_welch",
        "__sa", "__sb", "__qa", "__qb"), "welchT")
    val v = col(variantCol)
    val xInt = when(v.isNull || (v =!= variantA && v =!= variantB),
        raise_error(concat(
          lit(s"welchT: $variantCol must be '$variantA' or '$variantB', got "),
          coalesce(v, lit("NULL")))))
      .otherwise(round(col(valueCol).cast("double") *
        lit(math.pow(10, scale))).cast("long"))
    val isA = v === variantA
    val sums = df.groupBy(groupCols.map(col): _*).agg(
      count(when(isA, 1)).as("n_a"),
      count(when(!isA, 1)).as("n_b"),
      sum(when(isA, xInt)).as("__sa"),
      sum(when(!isA, xInt)).as("__sb"),
      sum(when(isA, xInt * xInt)).as("__qa"),
      sum(when(!isA, xInt * xInt)).as("__qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val sa = col("__sa").cast("double")
    val sb = col("__sb").cast("double")
    // sample variances in SCALED units — t and df are scale-invariant,
    // so only the reported means descale
    val va = (col("__qa").cast("double") - sa * sa / na) / (na - 1.0)
    val vb = (col("__qb").cast("double") - sb * sb / nb) / (nb - 1.0)
    val sea = va / na
    val seb = vb / nb
    val defined = col("n_a") >= 2L && col("n_b") >= 2L
    val denomPos = defined && (sea + seb) > 0.0
    val descale = lit(math.pow(10, scale))
    sums.select((groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
      (sa / na / descale).as("mean_a") :+
      (sb / nb / descale).as("mean_b") :+
      when(denomPos, (sa / na - sb / nb) / sqrt(sea + seb)).as("t") :+
      when(denomPos,
        (sea + seb) * (sea + seb) /
          (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))).as("df_welch")): _*)
  }

  /** Per-group Spearman rank correlation — Pearson over DOUBLED average
    * ranks, which makes the whole rank layer exact integers: a tie
    * group's average rank is `rank + (peers − 1)/2`, so
    * `2·avg = 2·rank + peers − 1` needs no fractions. Robust (monotone-
    * invariant) dependence, the complement to [[corrRegression]]'s
    * linear Pearson.
    *
    * Exactness discipline: values quantize to `scale` decimals before
    * ranking (ties are then engine-identical), rank sums accumulate as
    * DECIMAL(38,0) (order-independent at any size), and the closed form
    * runs once in doubles with the corrBeta clamp. NULL pairs are
    * excluded up front. Plan: one hash exchange on the group key; the
    * two rank layers are two sorts over that one exchange (rank and its
    * peers count share each sort via a RANGE CURRENT ROW frame); the
    * final aggregate is map-side combinable.
    * Emits (groupCols…, `n`, `spearman`). */
  def spearman(df: DataFrame, groupCols: Seq[String], xCol: String,
               yCol: String, scale: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "spearman needs at least one group column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "spearman", "__xi", "__yi", "__ra", "__rb"), "Stats.spearman")
    import org.apache.spark.sql.expressions.Window
    val xi = round(col(xCol).cast("double") * lit(math.pow(10, scale))).cast("long")
    val yi = round(col(yCol).cast("double") * lit(math.pow(10, scale))).cast("long")
    val base = df
      .select((groupCols.map(col) :+ xi.as("__xi") :+ yi.as("__yi")): _*)
      .filter(col("__xi").isNotNull && col("__yi").isNotNull)
    val wx = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__xi"))
    val wy = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__yi"))
    def rank2(w: org.apache.spark.sql.expressions.WindowSpec): Column =
      lit(2L) * rank().over(w).cast("long") +
        count(lit(1)).over(w.rangeBetween(Window.currentRow, Window.currentRow))
          .cast("long") - lit(1L)
    val ranked = base
      .withColumn("__ra", rank2(wx))
      .withColumn("__rb", rank2(wy))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val sums = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        dec(col("__ra")).as("__sa"), dec(col("__rb")).as("__sb"),
        dec(col("__ra") * col("__ra")).as("__saa"),
        dec(col("__rb") * col("__rb")).as("__sbb"),
        dec(col("__ra") * col("__rb")).as("__sab"))
    val nD = col("n").cast("double")
    def d(name: String): Column = col(name).cast("double")
    val num = nD * d("__sab") - d("__sa") * d("__sb")
    val dx = nD * d("__saa") - d("__sa") * d("__sa")
    val dy = nD * d("__sbb") - d("__sb") * d("__sb")
    sums.withColumn("spearman",
        when(dx > 0.0 && dy > 0.0,
          greatest(lit(-1.0), least(lit(1.0), num / (sqrt(dx) * sqrt(dy))))))
      .drop("__sa", "__sb", "__saa", "__sbb", "__sab")
  }

  /** Exact grouped weighted median (lower-median convention): the
    * smallest value whose cumulative weight reaches half the group's
    * total — the importance-weighted center for corpus statistics where
    * each row carries a weight (token counts, sampling rates). Weights
    * must be non-negative integers (exact cumulative comparisons — a
    * float cumsum would make the crossing row engine-dependent);
    * zero-weight rows can never be the crossing row.
    *
    * One keyed window pass: the running and total weight sums share one
    * (group, value)-sorted partition, the crossing row is
    * `2·cum ≥ W > 2·(cum − w)` — exactly one row per non-empty-weight
    * group, selected by exact integer comparisons. Rows with a NULL
    * value OR weight are excluded up front (a NULL value would sort to
    * a different end in different engines and could be SELECTED as the
    * crossing row; a NULL weight would silently shrink the total).
    * Emits (groupCols…, `weighted_median`, `total_weight`). */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
                     valueCol: String, weightCol: String): DataFrame = {
    require(groupCols.nonEmpty, "weightedMedian needs at least one group column")
    val w0 = col(weightCol).cast("long")
    // loud rail: a negative weight silently corrupts the crossing test
    val w = when(w0 < 0L, raise_error(
      lit(s"weightedMedian: negative weight in $weightCol"))).otherwise(w0)
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    df.select((groupCols.map(col) :+ col(valueCol) :+ w.as("__w")): _*)
      .filter(col(valueCol).isNotNull && col("__w").isNotNull)
      .withColumn("__cum", sum(col("__w")).over(ordered))
      .withColumn("__tot", sum(col("__w")).over(whole))
      .filter(col("__cum") * 2 >= col("__tot") &&
        (col("__cum") - col("__w")) * 2 < col("__tot"))
      .select((groupCols.map(col) :+
        col(valueCol).as("weighted_median") :+
        col("__tot").as("total_weight")): _*)
  }

  /** Per-group Mann–Whitney U (Wilcoxon rank-sum, public formula): the
    * NONPARAMETRIC A/B readout — does arm A stochastically dominate arm
    * B — robust where [[welchT]]'s mean comparison is outlier-fragile.
    *
    * Exactness discipline: values quantize to `scale` decimals, the
    * pooled rank layer uses the [[spearman]] DOUBLED-average-rank trick
    * (a tie group's 2·avgrank = 2·rank + peers − 1 — exact integers), so
    * `2·U_A = Σ_A 2r − n_A(n_A+1)` is an exact BIGINT. The tie
    * correction `T = Σ(t³ − t)` accumulates per ROW as `t² − 1` (each
    * tie-group member contributes once — no second shuffle on the value).
    * `u`/`z` are then single fixed IEEE trees over five exact integers:
    * `z = (U − n_An_B/2) / √((n_An_B/12)·(n+1 − T/(n(n−1))))` (no
    * continuity correction — documented). NULL `z` on a degenerate group
    * (an empty arm, or all values tied). Rows with a variant outside
    * {a, b} fail loudly, the [[welchT]] contract. Plan: one hash
    * exchange on the group key; rank and tie-size share ONE sort; the
    * final aggregate is map-side combinable.
    * Emits (groupCols…, `n_a`, `n_b`, `u`, `z`). */
  def mannWhitney(df: DataFrame, valueCol: String, variantCol: String,
                  variantA: String, variantB: String, groupCols: Seq[String],
                  scale: Int = 0): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "mannWhitney needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_a", "n_b", "u", "z", "__xi", "__r2", "__t"), "Stats.mannWhitney")
    import org.apache.spark.sql.expressions.Window
    val v = col(variantCol)
    val xi = when(v.isNull || (v =!= variantA && v =!= variantB),
        raise_error(concat(
          lit(s"mannWhitney: $variantCol must be '$variantA' or '$variantB', got "),
          coalesce(v, lit("NULL")))))
      .otherwise(round(col(valueCol).cast("double") *
        lit(math.pow(10, scale))).cast("long"))
    val base = df
      .select((groupCols.map(col) :+ v.as("__arm") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__xi"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow)).cast("long")
    val ranked = base
      .withColumn("__t", peers)
      .withColumn("__r2",
        lit(2L) * rank().over(w).cast("long") + col("__t") - lit(1L))
    val isA = col("__arm") === variantA
    val sums = ranked.groupBy(groupCols.map(col): _*).agg(
      count(when(isA, 1)).as("n_a"),
      count(when(!isA, 1)).as("n_b"),
      sum(when(isA, col("__r2"))).as("__s2a"),
      sum(col("__t") * col("__t") - lit(1L)).as("__tcorr"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val u = (col("__s2a").cast("double") - na * (na + lit(1.0))) / lit(2.0)
    val sig2 = (na * nb / lit(12.0)) *
      ((n + lit(1.0)) - col("__tcorr").cast("double") / (n * (n - lit(1.0))))
    sums.select((groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
      when(col("n_a") >= 1L && col("n_b") >= 1L, u).as("u") :+
      when(col("n_a") >= 1L && col("n_b") >= 1L && sig2 > 0.0,
        (u - na * nb / lit(2.0)) / sqrt(sig2)).as("z")): _*)
  }

  /** Pairwise correlation matrix across series — the portfolio
    * dependence structure (which series co-move): for every unordered
    * key pair, the full-overlap Pearson correlation of the
    * time-aligned values. The classic risk-matrix build.
    *
    * Plan shape: ONE self-join equi-keyed on the timestamp (both sides
    * co-partition on time — no cross join; the `keyA < keyB` predicate
    * halves the matrix), then a map-side-combinable five-sum aggregate
    * on the pair key. Output is pair-cardinality-sized (K²/2 rows for K
    * series), never row-count-sized. At 100 TB the join is the cost:
    * rows-per-timestamp × K fan-out — bound K (select your universe)
    * before calling, exactly like any all-pairs matrix.
    *
    * Exactness: the [[graft.operators.Rolling.corrBeta]] discipline —
    * values quantize to `scale` decimals, all five sums are BIGINT, the
    * correlation is one fixed IEEE tree with separate square roots and
    * the [−1, 1] clamp. Pairs with overlap < `minOverlap` are dropped.
    * Emits (`key_a`, `key_b`, `n_overlap`, `corr`). */
  def pairwiseCorr(df: DataFrame, keyCol: String, timeCol: String,
                   valueCol: String, minOverlap: Int = 2,
                   scale: Int = 0): DataFrame = {
    require(minOverlap >= 2, s"need minOverlap >= 2, got $minOverlap")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("key_a", "key_b", "n_overlap", "corr"), "Stats.pairwiseCorr")
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val left = df.select(col(keyCol).as("__ka"), col(timeCol).as("__t"),
        xi.as("__x"))
      .filter(col("__x").isNotNull)
    val right = left.select(col("__ka").as("__kb"), col("__t").as("__t2"),
      col("__x").as("__y"))
    val sums = left
      .join(right, col("__t") === col("__t2") && col("__ka") < col("__kb"))
      .groupBy(col("__ka").as("key_a"), col("__kb").as("key_b"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .filter(col("n_overlap") >= minOverlap.toLong)
    val n = col("n_overlap")
    val num = (n * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (n * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (n * col("__syy") - col("__sy") * col("__sy")).cast("double")
    sums.select(col("key_a"), col("key_b"), n,
      when(dx > 0.0 && dy > 0.0,
        greatest(lit(-1.0), least(lit(1.0), num / (sqrt(dx) * sqrt(dy)))))
        .as("corr"))
  }

  /** Per-group higher moments (public formulas): population skewness,
    * excess kurtosis, and the Jarque–Bera normality statistic — the
    * distribution-shape screen (fat tails, asymmetry, fabricated
    * too-normal data) next to [[corrRegression]]'s first two moments.
    *
    * Exactness: values quantize to `scale` decimals; the four power sums
    * accumulate as DECIMAL(38,0) (exact in any aggregation order — x⁴
    * fits a BIGINT per term, the SUM would not). Central moments come
    * from the raw-moment closed forms, each ONE fixed IEEE tree:
    * `M2 = S2/n − m²`, `M3 = S3/n − 3m·S2/n + 2m³`,
    * `M4 = S4/n − 4m·S3/n + 6m²·S2/n − 3m⁴`, then
    * `skew = M3/M2^{3/2}`, `kurt = M4/M2² − 3`,
    * `JB = n/6·(skew² + kurt²/4)`. Skew/kurt/JB are scale-invariant, so
    * only `mean` descales. NULL shape stats on a zero-variance group.
    * ONE map-side-combinable aggregation — no window, no second pass.
    * Emits (groupCols…, `n`, `mean`, `skewness`, `kurtosis_excess`,
    * `jarque_bera`). */
  def moments(df: DataFrame, valueCol: String, groupCols: Seq[String],
              scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "moments needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "mean", "skewness", "kurtosis_excess", "jarque_bera",
        "__s1", "__s2", "__s3", "__s4"), "Stats.moments")
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val sums = df.filter(xi.isNotNull)
      .groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).as("n"),
        dec(xi).as("__s1"),
        dec(xi * xi).as("__s2"),
        dec(xi * xi * xi).as("__s3"),
        dec(xi * xi * xi * xi).as("__s4"))
    val nD = col("n").cast("double")
    def d(name: String): Column = col(name).cast("double")
    val m = d("__s1") / nD
    val m2 = d("__s2") / nD - m * m
    val m3 = d("__s3") / nD - lit(3.0) * m * (d("__s2") / nD) +
      lit(2.0) * m * m * m
    val m4 = d("__s4") / nD - lit(4.0) * m * (d("__s3") / nD) +
      lit(6.0) * m * m * (d("__s2") / nD) - lit(3.0) * m * m * m * m
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2) - lit(3.0)
    val ok = col("n") >= 2L && m2 > 0.0
    sums.select((groupCols.map(col) :+ col("n") :+
      (m / lit(math.pow(10, scale))).as("mean") :+
      when(ok, skew).as("skewness") :+
      when(ok, kurt).as("kurtosis_excess") :+
      when(ok, (nD / lit(6.0)) * (skew * skew + kurt * kurt / lit(4.0)))
        .as("jarque_bera")): _*)
  }

  /** One-way ANOVA F per group — the k-arm generalization of [[welchT]]
    * (classic equal-variance ANOVA; for two arms prefer Welch): does the
    * metric's mean differ across the variants of `variantCol`? The
    * multi-arm experiment / per-source-mean-shift readout.
    *
    * Exactness: values quantize to `scale` decimals; per-variant
    * (n, Σx, Σx²) are exact integers in ONE map-side-combinable pass.
    * The one order-sensitive double reduction — the between-groups term
    * `B = Σ_g s_g²/n_g` — folds over the ≤k-row per-variant frame in
    * ASCENDING VARIANT ORDER (the [[Divergence]] token-fold discipline),
    * so any engine replays the same left fold. Then `SSB = B − S²/N`,
    * `SSW = Q − B`, `F = (SSB/(k−1)) / (SSW/(N−k))` — fixed IEEE trees,
    * scale-invariant, no rounding. NULL `f` when k < 2, N ≤ k, or
    * SSW = 0. NULL variants raise (the [[welchT]] loud-arm contract);
    * NULL values are excluded. State per group is k structs — bounded by
    * the variant cardinality, never the row count.
    * Emits (groupCols…, `k`, `n`, `f`, `ss_between`, `ss_within`) with
    * the sums of squares in SCALED units² (descale by 10^(2·scale) if
    * needed; F needs no descaling). */
  def anovaF(df: DataFrame, valueCol: String, variantCol: String,
             groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "anovaF needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("k", "n", "f", "ss_between", "ss_within",
        "__v", "__xi", "__gs"), "Stats.anovaF")
    val v = when(col(variantCol).isNull,
        raise_error(lit(s"anovaF: NULL $variantCol — a silently dropped " +
          "arm is a corrupted experiment readout; filter first if intended")))
      .otherwise(col(variantCol).cast("string"))
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val perVariant = df
      .select((groupCols.map(col) :+ v.as("__v") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
      .groupBy((groupCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__xi")).as("__sg"),
        sum(col("__xi") * col("__xi")).as("__qg"))
    val folded = perVariant.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("k"),
      sum(col("__ng")).as("n"),
      sum(col("__sg")).as("__s"),
      sum(col("__qg").cast("decimal(38,0)")).as("__q"),
      sort_array(collect_list(struct(col("__v"), col("__ng"), col("__sg"))))
        .as("__gs"))
    // variant-ordered left fold of s_g²/n_g — the one double accumulation
    val b = aggregate(col("__gs"), lit(0.0),
      (acc, e) => acc +
        (e.getField("__sg").cast("double") * e.getField("__sg").cast("double")) /
          e.getField("__ng").cast("double"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val s = col("__s").cast("double")
    val ssb = b - s * s / nD
    val ssw = col("__q").cast("double") - b
    val ok = col("k") >= 2L && nD > kD && ssw > 0.0
    folded.select((groupCols.map(col) :+ col("k") :+ col("n") :+
      when(ok, (ssb / (kD - lit(1.0))) / (ssw / (nD - kD))).as("f") :+
      ssb.as("ss_between") :+ ssw.as("ss_within")): _*)
  }

  /** Kruskal–Wallis H per group — the k-arm generalization of
    * [[mannWhitney]]: the NONPARAMETRIC multi-variant readout, robust
    * where [[anovaF]]'s mean comparison is outlier-fragile.
    *
    * Exactness: the pooled rank layer is the [[spearman]] DOUBLED-
    * average-rank trick (exact integers under ties); per-variant doubled
    * rank sums `R2_g` and the per-row tie term `t² − 1` (summing to
    * `Σ(t³ − t)`) are exact BIGINTs. The one double reduction —
    * `Σ_g R2_g²/n_g` — folds over the ≤k-row variant frame in ascending
    * variant order (the [[anovaF]] discipline). With `R_g = R2_g/2`,
    * `H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) = 3·fold/(N(N+1)) − 3(N+1)`
    * (the /4 fused into the constant — exact), tie-corrected by
    * `1 − Σ(t³−t)/(N³−N)`. Bit-exactness bound: `N³ < 2^53` per group
    * (N < ~2·10⁵). NULL `h` when k < 2 or every value is tied. NULL
    * variants raise; NULL values are excluded.
    * Emits (groupCols…, `k`, `n`, `h`). */
  def kruskalWallis(df: DataFrame, valueCol: String, variantCol: String,
                    groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "kruskalWallis needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("k", "n", "h", "__v", "__xi", "__r2", "__t", "__gs"),
      "Stats.kruskalWallis")
    import org.apache.spark.sql.expressions.Window
    val v = when(col(variantCol).isNull,
        raise_error(lit(s"kruskalWallis: NULL $variantCol — a silently " +
          "dropped arm is a corrupted experiment readout; filter first")))
      .otherwise(col(variantCol).cast("string"))
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((groupCols.map(col) :+ v.as("__v") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__xi"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow)).cast("long")
    val ranked = base
      .withColumn("__t", peers)
      .withColumn("__r2",
        lit(2L) * rank().over(w).cast("long") + col("__t") - lit(1L))
    val perVariant = ranked
      .groupBy((groupCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__r2")).as("__rg"),
        sum(col("__t") * col("__t") - lit(1L)).as("__tc"))
    val folded = perVariant.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("k"),
      sum(col("__ng")).as("n"),
      sum(col("__tc")).as("__tcorr"),
      sort_array(collect_list(struct(col("__v"), col("__ng"), col("__rg"))))
        .as("__gs"))
    val fold = aggregate(col("__gs"), lit(0.0),
      (acc, e) => acc +
        (e.getField("__rg").cast("double") * e.getField("__rg").cast("double")) /
          e.getField("__ng").cast("double"))
    val nD = col("n").cast("double")
    val hRaw = lit(3.0) * fold / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - col("__tcorr").cast("double") / (nD * nD * nD - nD)
    val ok = col("k") >= 2L && corr > 0.0
    folded.select((groupCols.map(col) :+ col("k") :+ col("n") :+
      when(ok, hRaw / corr).as("h")): _*)
  }

  /** Ljung–Box portmanteau test per key: Q(m) = n(n+2)·Σ_{k=1..m}
    * ρ_k²/(n−k) over the key's whole series — the "is anything left in
    * the residuals" white-noise screen run after fitting any forecaster
    * (large Q ⇒ autocorrelation remains; compare against χ²_m).
    *
    * Exactness: values quantize to scaled BIGINTs and each lag's
    * autocorrelation is one exact integer ratio — multiplying the
    * centered forms through by n² gives `A_k = n²·C_k − n·S·P_k +
    * (n−k)·S²` over pair sums `C_k = Σx_t·x_{t−k}`, `P_k = Σ(x_t+x_{t−k})`
    * and `B = n·(n·Σx² − S²)` … with both accumulated as DECIMAL(38,0)
    * (exact in any order), ρ_k = A_k/B is ONE IEEE division; Q is the
    * fixed left-to-right k-fold of ρ_k²/(n−k). NULL values are dropped
    * BEFORE sequencing (the lag alignment is over observed rows — the
    * frozen≡filtered convention). NULL q_stat when n ≤ m (some lag has
    * no pairs) or zero variance.
    *
    * Plan shape: all m lag shifts ride ONE keyed sort, then one
    * map-side-combinable groupBy(key) aggregate of the 3 + 2m sums — no
    * explode, no second scan. Emits (keyCols…, `n`, `q_stat`). */
  def ljungBox(df: DataFrame, valueCol: String, keyCols: Seq[String],
               orderCols: Seq[String], m: Int, scale: Int = 0): DataFrame = {
    require(m >= 1, s"need at least 1 lag, got $m")
    require(keyCols.nonEmpty, "ljungBox needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "q_stat", "__x") ++ (1 to m).map(k => s"__l$k"),
      "Stats.ljungBox")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df.filter(xi.isNotNull)
      .select((keyCols.map(col) :+ xi.as("__x")) ++
        (1 to m).map(k => lag(xi, k).over(w).as(s"__l$k")): _*)
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val x = col("__x")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), dec(x).as("__s"), dec(x * x).as("__s2")) ++
        (1 to m).flatMap { k =>
          val lk = col(s"__l$k")
          // product goes decimal BEFORE multiplying — per-term x·lag can
          // overflow a long at 10-dp return scales (the crossCorr rule)
          Seq(sum(when(lk.isNotNull, x.cast("decimal(38,0)") * lk)
              .otherwise(lit(0L).cast("decimal(38,0)"))).as(s"__c$k"),
            dec(when(lk.isNotNull, x + lk).otherwise(lit(0L))).as(s"__p$k"))
        }
    val sums = base.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val nDec = col("n").cast("decimal(38,0)")
    val bDen = (nDec * (nDec * col("__s2") - col("__s") * col("__s")))
      .cast("double")
    // fixed left-to-right fold over the literal lag list — one IEEE tree
    val qSum = (1 to m).map { k =>
      val ak = (nDec * nDec * col(s"__c$k") -
        nDec * col("__s") * col(s"__p$k") +
        (nDec - lit(k).cast("decimal(38,0)")) * col("__s") * col("__s"))
        .cast("double")
      val rho = ak / bDen
      rho * rho / (col("n") - lit(k)).cast("double")
    }.reduceLeft(_ + _)
    val nD = col("n").cast("double")
    sums.select((keyCols.map(col) :+ col("n") :+
      when(col("n") > lit(m.toLong) && bDen > 0.0,
        nD * (nD + lit(2.0)) * qSum).as("q_stat")): _*)
  }

  /** Kendall's τ-b rank correlation per group — the concordance view of
    * monotone association (beside [[spearman]]'s rank-linear view):
    * τ_b = (C−D)/√((C+D+Tx)(C+D+Ty)) over all unordered pairs, with the
    * tie corrections that keep |τ|≤1 under heavy ties.
    *
    * Exactness: pair classification compares quantized BIGINTs (sign of
    * (x_i−x_j)·(y_i−y_j)), the four counts are exact integers, and τ is
    * one fixed tree (two casts, one product, one sqrt, one division).
    * Rows with a NULL x or y are dropped. NULL tau when every pair is
    * tied on x or on y.
    *
    * SCALE CONTRACT: pairs are generated by a WITHIN-GROUP self-join —
    * O(n_g²) per group. This is the cross-sectional shape (groups of
    * 10²–10⁴ rows: a date, a cohort), NOT a whole-corpus op; Σn_g² is the
    * real cost and the join never crosses groups, so it partitions
    * cleanly by group at any corpus size. Use [[spearman]] when groups
    * are large. Emits (groupCols…, `n`, `n_pairs`, `tau`). */
  def kendallTau(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String, scale: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "kendallTau needs at least one group column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "n_pairs", "tau", "__xi", "__yi", "__rn"), "Stats.kendallTau")
    val k = lit(math.pow(10, scale))
    val xi = round(col(xCol).cast("double") * k).cast("long")
    val yi = round(col(yCol).cast("double") * k).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(xi, yi)
    val base = df.filter(xi.isNotNull && yi.isNotNull)
      .select((groupCols.map(col) :+ xi.as("__xi") :+ yi.as("__yi")) :+
        row_number().over(w).as("__rn"): _*)
    val l = base
    val r = base.select(col(groupCols.head).as("__gk0") +:
      (groupCols.tail.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__gk${i + 1}") } :+
        col("__xi").as("__xj") :+ col("__yi").as("__yj") :+
        col("__rn").as("__rj")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) === col(s"__gk$i") }
      .reduce(_ && _) && col("__rn") < col("__rj")
    val dx = col("__xi") - col("__xj")
    val dy = col("__yi") - col("__yj")
    val pairs = l.join(r, cond)
    val counts = pairs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      count(when(dx =!= 0L && dy =!= 0L &&
        ((dx > 0L) === (dy > 0L)), 1)).as("__c"),
      count(when(dx =!= 0L && dy =!= 0L &&
        ((dx > 0L) =!= (dy > 0L)), 1)).as("__d"),
      count(when(dx === 0L && dy =!= 0L, 1)).as("__tx"),
      count(when(dx =!= 0L && dy === 0L, 1)).as("__ty"))
    val ns = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val denomX = (col("__c") + col("__d") + col("__tx")).cast("double")
    val denomY = (col("__c") + col("__d") + col("__ty")).cast("double")
    ns.join(counts, groupCols, "left")
      .select((groupCols.map(col) :+ col("n") :+
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs") :+
        when(denomX > 0.0 && denomY > 0.0,
          (col("__c") - col("__d")).cast("double") /
            sqrt(denomX * denomY)).as("tau")): _*)
  }

  /** Mann–Kendall trend test per key (public formula): over the
    * time-ordered series, `S = Σ_{i<j} sign(x_j − x_i)` with the
    * tie-corrected variance
    * `Var = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18` and the
    * continuity-corrected `z = (S ∓ 1)/√Var` — the distribution-free
    * IS-there-a-trend answer that [[dickeyFuller]]'s parametric form
    * can miss on non-linear drifts. Sen's slope (the magnitude) is
    * [[theilSen]] against the time ordinal.
    *
    * Exactness: sign pairs compare quantized BIGINTs, S and the tie
    * sums are exact integers, z is one fixed tree. NULL z when n < 2
    * or Var ≤ 0 (all values tied). SCALE CONTRACT as [[kendallTau]]:
    * within-key O(n²) pairs — bounded series per key (10²–10⁴ rows),
    * the cross-section fans out freely. Emits (keyCols…, `n`, `s_stat`,
    * `mk_z`). */
  def mannKendall(df: DataFrame, valueCol: String, keyCols: Seq[String],
                  orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "mannKendall needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "s_stat", "mk_z", "__xi", "__rn"), "Stats.mannKendall")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df.filter(xi.isNotNull)
      .select((keyCols.map(col) :+ xi.as("__xi")) :+
        row_number().over(w).as("__rn"): _*)
    val r = base.select(col(keyCols.head).as("__gk0") +:
      (keyCols.tail.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__gk${i + 1}") } :+
        col("__xi").as("__xj") :+ col("__rn").as("__rj")): _*)
    val cond = keyCols.zipWithIndex
      .map { case (c, i) => col(c) === col(s"__gk$i") }
      .reduce(_ && _) && col("__rn") < col("__rj")
    val sPairs = base.join(r, cond)
      .groupBy(keyCols.map(col): _*)
      .agg((count(when(col("__xj") > col("__xi"), 1)) -
        count(when(col("__xj") < col("__xi"), 1))).as("s_stat"))
    val ties = base.groupBy((keyCols.map(col) :+ col("__xi")): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__t")).as("n"),
        sum(col("__t").cast("decimal(38,0)") *
          (col("__t") - lit(1L)) * (lit(2L) * col("__t") + lit(5L)))
          .as("__tcorr"))
    val nDec = col("n").cast("decimal(38,0)")
    val varNum = (nDec * (nDec - lit(1L).cast("decimal(38,0)")) *
      (lit(2L).cast("decimal(38,0)") * nDec +
        lit(5L).cast("decimal(38,0)")) - col("__tcorr")).cast("double")
    val variance = varNum / lit(18.0)
    val s = coalesce(col("s_stat"), lit(0L))
    val safeVar = when(variance > 0.0, variance)
    val z = when(s > 0L, (s.cast("double") - lit(1.0)) / sqrt(safeVar))
      .when(s < 0L, (s.cast("double") + lit(1.0)) / sqrt(safeVar))
      .otherwise(lit(0.0))
    ties.join(sPairs, keyCols, "left")
      .select((keyCols.map(col) :+ col("n") :+ s.as("s_stat") :+
        when(col("n") >= 2L && variance > 0.0, z).as("mk_z")): _*)
  }

  /** Wald–Wolfowitz runs test per key (public formula): dichotomize the
    * series by the SIGN of its first difference (zeros dropped), count
    * maximal same-sign runs R, and score
    * `z = (R − μ)/σ` with `μ = 2·n₊·n₋/n + 1` and
    * `σ² = 2n₊n₋(2n₊n₋ − n)/(n²(n−1))` — the distribution-free
    * randomness screen beside [[ljungBox]] (too FEW runs ⇒ trending,
    * too MANY ⇒ mean-reverting, |z| ≳ 2 either way).
    *
    * Exactness: signs come from quantized BIGINT differences; R and the
    * counts are exact integers on one keyed sort (a run starts where
    * the sign differs from the previous sign); μ and σ² are fixed
    * IEEE trees on DECIMAL-exact products (2n₊n₋ and its n-product
    * stay integral). NULL z when n₊ = 0 or n₋ = 0 or n < 2.
    * One keyed sort + one map-side-combinable aggregate. Emits
    * (keyCols…, `n_up`, `n_down`, `runs`, `runs_z`). */
  def runsTest(df: DataFrame, valueCol: String, keyCols: Seq[String],
               orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "runsTest needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_up", "n_down", "runs", "runs_z", "__x", "__s", "__ps"),
      "Stats.runsTest")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val d = xi - lag(xi, 1).over(w)
    val sign = when(d > 0L, lit(1)).when(d < 0L, lit(-1))
    val base = df
      .select((keyCols.map(col) ++ orderCols.map(col)) :+ sign.as("__s"): _*)
      .filter(col("__s").isNotNull)
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val newRun = when(lag(col("__s"), 1).over(sw).isNull ||
      lag(col("__s"), 1).over(sw) =!= col("__s"), 1).otherwise(0)
    val sums = base.withColumn("__ps", newRun)
      .groupBy(keyCols.map(col): _*)
      .agg(count(when(col("__s") === 1, 1)).as("n_up"),
        count(when(col("__s") === -1, 1)).as("n_down"),
        sum(col("__ps")).as("runs"))
    val nU = col("n_up").cast("decimal(38,0)")
    val nD = col("n_down").cast("decimal(38,0)")
    val nT = nU + nD
    val twoUD = (lit(2L).cast("decimal(38,0)") * nU * nD)
    val mu = twoUD.cast("double") / nT.cast("double") + lit(1.0)
    val sig2 = (twoUD * (twoUD - nT)).cast("double") /
      (nT * nT * (nT - lit(1L).cast("decimal(38,0)"))).cast("double")
    val z = (col("runs").cast("double") - mu) /
      sqrt(when(sig2 > 0.0, sig2))
    sums.select((keyCols.map(col) :+ col("n_up") :+ col("n_down") :+
      col("runs") :+
      when(col("n_up") >= 1L && col("n_down") >= 1L &&
        col("n_up") + col("n_down") >= 2L, z).as("runs_z")): _*)
  }

  /** Dickey–Fuller unit-root test per key (the constant-only DF form,
    * public): regress `Δx_t = α + β·x_{t−1}` and report β̂ and its
    * t-statistic — the stationarity screen run before ANY mean-reversion
    * strategy or differencing decision (t far below ≈ −2.86 rejects the
    * unit root; β̂ near 0 means the series is a random walk and every
    * "reversion signal" on it is noise).
    *
    * Exactness: x quantizes to scaled BIGINTs; with `A = nΣxy − ΣxΣy`,
    * `B = nΣx² − (Σx)²`, `C = nΣy² − (Σy)²` over the (lag, diff) pairs
    * — all exact DECIMAL integers — the estimates are fixed trees:
    * `β = A/B`, `t = (A/B)/√((C − A²/B)/((n−2)·B))`. The one non-integer
    * intermediate (`A²/B`) is a single division each — deterministic.
    * NULL when n < 3, zero lag-variance, or zero residual variance.
    * ONE keyed sort (the lag), one map-side-combinable aggregate.
    * Emits (keyCols…, `n_pairs`, `df_beta`, `df_t`). */
  def dickeyFuller(df: DataFrame, valueCol: String, keyCols: Seq[String],
                   orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "dickeyFuller needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_pairs", "df_beta", "df_t", "__x", "__lx", "__dx"),
      "Stats.dickeyFuller")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df.filter(xi.isNotNull)
      .select((keyCols.map(col) :+ lag(xi, 1).over(w).as("__lx")) :+
        (xi - lag(xi, 1).over(w)).as("__dx"): _*)
      .filter(col("__lx").isNotNull)
    def dd(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val (x, y) = (col("__lx"), col("__dx"))
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      dd(x).as("__sx"), dd(y).as("__sy"),
      sum(x.cast("decimal(38,0)") * x).as("__sxx"),
      sum(y.cast("decimal(38,0)") * y).as("__syy"),
      sum(x.cast("decimal(38,0)") * y).as("__sxy"))
    val nDec = col("n_pairs").cast("decimal(38,0)")
    val a = (nDec * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val b = (nDec * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val c = (nDec * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val safeB = when(b > 0.0, b)
    val beta = a / safeB
    val n = col("n_pairs").cast("double")
    val ssr = c - a * a / safeB
    val se2 = ssr / ((n - lit(2.0)) * safeB)
    val t = beta / sqrt(when(se2 > 0.0, se2))
    sums.select((keyCols.map(col) :+ col("n_pairs") :+
      when(col("n_pairs") >= 3L, beta).as("df_beta") :+
      when(col("n_pairs") >= 3L, t).as("df_t")): _*)
  }

  /** Lag-1 Granger causality per key (public formulation): in the
    * regression `y_t = α + β·y_{t−1} + γ·x_{t−1}`, does the OTHER
    * series' history carry information beyond y's own — the t-statistic
    * on γ̂. The hypothesis-test companion to [[Rolling.crossCorr]]'s
    * descriptive lead–lag screen (|t| ≳ 2 says the lead is real, not
    * sampling noise).
    *
    * Exactness: both series quantize to scaled BIGINTs; with the
    * n-multiplied centered sums (`Sxx = nΣx² − (Σx)²`, …) — exact
    * DECIMALs — the 2-regressor normal equations collapse to fixed
    * trees: `γ̂ = (Sxx·Szy − Sxz·Sxy)/det`, `det = Sxx·Szz − Sxz²`
    * (the n factors cancel), `t = γ̂/√(SSR·Sxx/((n−3)·det))` with
    * `SSR = Syy − β̂·Sxy − γ̂·Szy`. Products reach ~10²⁵ — exact in
    * DECIMAL(38,0), correctly-rounded on the single cast to double
    * (the oracle uses the VARCHAR strtod bridge). NULL when n < 4,
    * a collinear/constant regressor (det ≤ 0), or zero residual
    * variance. ONE keyed sort, one map-side-combinable aggregate.
    * Emits (keyCols…, `n_pairs`, `ar_beta`, `granger_gamma`,
    * `granger_t`). */
  def grangerLag1(df: DataFrame, yCol: String, xCol: String,
                  keyCols: Seq[String], orderCols: Seq[String],
                  yScale: Int = 0, xScale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "grangerLag1 needs at least one key column")
    require(yScale >= 0 && xScale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("n_pairs", "ar_beta", "granger_gamma", "granger_t",
        "__y", "__ly", "__lx"), "Stats.grangerLag1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val yi = round(col(yCol).cast("double") * lit(math.pow(10, yScale)))
      .cast("long")
    val xiR = round(col(xCol).cast("double") * lit(math.pow(10, xScale)))
      .cast("long")
    val base = df
      .select((keyCols.map(col) :+ yi.as("__y")) :+
        lag(yi, 1).over(w).as("__ly") :+ lag(xiR, 1).over(w).as("__lx"): _*)
      .filter(col("__ly").isNotNull && col("__lx").isNotNull &&
        col("__y").isNotNull)
    def dd(c: Column): Column = sum(c.cast("decimal(38,0)"))
    def dp(a: Column, b: Column): Column =
      sum(a.cast("decimal(38,0)") * b)
    val (y, x, z) = (col("__y"), col("__ly"), col("__lx"))
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      dd(y).as("__sy"), dd(x).as("__sx"), dd(z).as("__sz"),
      dp(x, x).as("__sxx"), dp(z, z).as("__szz"), dp(x, z).as("__sxz"),
      dp(x, y).as("__sxy"), dp(z, y).as("__szy"), dp(y, y).as("__syy"))
    val nDec = col("n_pairs").cast("decimal(38,0)")
    def cen(sab: Column, sa: Column, sb: Column): Column =
      nDec * sab - sa * sb
    val sxx = cen(col("__sxx"), col("__sx"), col("__sx"))
    val szz = cen(col("__szz"), col("__sz"), col("__sz"))
    val sxz = cen(col("__sxz"), col("__sx"), col("__sz"))
    val sxy = cen(col("__sxy"), col("__sx"), col("__sy"))
    val szy = cen(col("__szy"), col("__sz"), col("__sy"))
    val syy = cen(col("__syy"), col("__sy"), col("__sy"))
    val det = (sxx * szz - sxz * sxz).cast("double")
    val safeDet = when(det > 0.0, det)
    val gamma = (sxx * szy - sxz * sxy).cast("double") / safeDet
    val beta = (szz * sxy - sxz * szy).cast("double") / safeDet
    val ssr = syy.cast("double") - beta * sxy.cast("double") -
      gamma * szy.cast("double")
    val n = col("n_pairs").cast("double")
    val varG = ssr * sxx.cast("double") / ((n - lit(3.0)) * safeDet)
    val t = gamma / sqrt(when(varG > 0.0, varG))
    sums.select((keyCols.map(col) :+ col("n_pairs") :+
      when(col("n_pairs") >= 4L, beta).as("ar_beta") :+
      when(col("n_pairs") >= 4L, gamma).as("granger_gamma") :+
      when(col("n_pairs") >= 4L, t).as("granger_t")): _*)
  }

  /** Standardized effect sizes for a two-variant comparison per group —
    * the "how big, not just how significant" companion to [[welchT]] /
    * [[mannWhitney]]: Cohen's d (pooled-SD mean gap), Hedges' g (the
    * small-sample bias correction `d·(1 − 3/(4·df − 1))`), and Cliff's
    * δ (the ordinal `P(a>b) − P(a<b)`, from the same midrank U statistic
    * as mannWhitney — robust to any monotone transform).
    *
    * Exactness: per-variant (n, Σx, Σx²) accumulate as exact DECIMALs;
    * the variance numerators are the n-multiplied integer forms
    * (`n·Σx² − S²`), d/g are fixed trees (the quantization scale cancels
    * between numerator and pooled SD, like MASE); δ uses the DOUBLED
    * midrank sum — half-integer arithmetic, exact in doubles. NULL d/g
    * when either arm has < 2 rows or the pooled variance is 0; NULL δ
    * when either arm is empty. One keyed rank sort + one
    * map-side-combinable aggregate. Emits (groupCols…, `n_a`, `n_b`,
    * `cohen_d`, `hedges_g`, `cliffs_delta`). */
  def effectSizes(df: DataFrame, valueCol: String, variantCol: String,
                  variantA: String, variantB: String, groupCols: Seq[String],
                  scale: Int = 0): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "effectSizes needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_a", "n_b", "cohen_d", "hedges_g", "cliffs_delta", "__xi",
        "__r2", "__t", "__arm"), "Stats.effectSizes")
    import org.apache.spark.sql.expressions.Window
    val v = col(variantCol)
    val xi = when(v.isNull || (v =!= variantA && v =!= variantB),
        raise_error(concat(
          lit(s"effectSizes: $variantCol must be '$variantA' or '$variantB', got "),
          coalesce(v, lit("NULL")))))
      .otherwise(round(col(valueCol).cast("double") *
        lit(math.pow(10, scale))).cast("long"))
    val base = df
      .select((groupCols.map(col) :+ v.as("__arm") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__xi"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow)).cast("long")
    val ranked = base
      .withColumn("__t", peers)
      .withColumn("__r2",
        lit(2L) * rank().over(w).cast("long") + col("__t") - lit(1L))
    val isA = col("__arm") === variantA
    def dd(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val x = col("__xi")
    val sums = ranked.groupBy(groupCols.map(col): _*).agg(
      count(when(isA, 1)).as("n_a"),
      count(when(!isA, 1)).as("n_b"),
      sum(when(isA, col("__r2"))).as("__s2a"),
      dd(when(isA, x).otherwise(lit(0L))).as("__sa"),
      sum(when(isA, x.cast("decimal(38,0)") * x)
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("__qa"),
      dd(when(!isA, x).otherwise(lit(0L))).as("__sb"),
      sum(when(!isA, x.cast("decimal(38,0)") * x)
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("__qb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val naDec = col("n_a").cast("decimal(38,0)")
    val nbDec = col("n_b").cast("decimal(38,0)")
    val varA = (naDec * col("__qa") - col("__sa") * col("__sa")).cast("double")
    val varB = (nbDec * col("__qb") - col("__sb") * col("__sb")).cast("double")
    val sp2 = (varA / na + varB / nb) / (na + nb - lit(2.0))
    val meanGap = col("__sa").cast("double") / na -
      col("__sb").cast("double") / nb
    val dTree = meanGap / sqrt(when(sp2 > 0.0, sp2))
    val gTree = dTree *
      (lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb - lit(2.0)) - lit(1.0)))
    val u = (col("__s2a").cast("double") - na * (na + lit(1.0))) / lit(2.0)
    val delta = (lit(2.0) * u - na * nb) / (na * nb)
    sums.select((groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
      when(col("n_a") >= 2L && col("n_b") >= 2L, dTree).as("cohen_d") :+
      when(col("n_a") >= 2L && col("n_b") >= 2L, gTree).as("hedges_g") :+
      when(col("n_a") >= 1L && col("n_b") >= 1L, delta)
        .as("cliffs_delta")): _*)
  }

  /** Grouped χ² independence + Cramér's V per family — the
    * effect-size-normalized version of [[chiSquareCells]] rolled up to
    * one row per group: `V = √(χ²/(n·(min(r,c)−1)))` ∈ [0,1], the
    * association strength that is comparable ACROSS tables of different
    * sizes (raw χ² is not).
    *
    * Exactness: cell/marginal counts are exact integers on ONE
    * (group, a, b) aggregate with window marginals; zero cells are never
    * materialized — the identity `Σ_all (o−e)²/e = Σ_obs o²/e − n`
    * charges them through the observed rows; the fold runs in ascending
    * (a, b) order (doubles — the pinned-order fold; cells per group =
    * category-product-bounded, tiny). NULL V when min(r, c) < 2.
    * Emits (groupCols…, `n`, `dof`, `chi2`, `cramers_v`). */
  def cramersV(df: DataFrame, aCol: String, bCol: String,
               groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "cramersV needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "dof", "chi2", "cramers_v", "__o", "__rt", "__ct", "__tot",
        "__term", "__r", "__c", "__l"), "Stats.cramersV")
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy((groupCols.map(col) :+ col(aCol) :+ col(bCol)): _*)
      .agg(count(lit(1)).as("__o"))
    val gw = Window.partitionBy(groupCols.map(col): _*)
    val rw = Window.partitionBy((groupCols.map(col) :+ col(aCol)): _*)
    val cw = Window.partitionBy((groupCols.map(col) :+ col(bCol)): _*)
    val e = (sum(col("__o")).over(rw) * sum(col("__o")).over(cw))
      .cast("double") / sum(col("__o")).over(gw).cast("double")
    // χ² over ALL r×c cells (zero cells contribute e) via the observed-
    // cells-only identity Σ_all (o−e)²/e = Σ_obs o²/e − n — no dense
    // cell grid needs materializing
    val term = (col("__o").cast("double") * col("__o").cast("double")) / e
    val withTerm = cells
      .withColumn("__term", term)
      .withColumn("__tot", sum(col("__o")).over(gw))
    val agg = withTerm.groupBy(groupCols.map(col): _*).agg(
      max(col("__tot")).as("n"),
      countDistinct(col(aCol)).as("__r"),
      countDistinct(col(bCol)).as("__c"),
      sort_array(collect_list(
        struct(col(aCol).cast("string").as("a"),
          col(bCol).cast("string").as("b"), col("__term").as("t"))))
        .as("__l"))
    val chi2 = aggregate(transform(col("__l"), x => x.getField("t")),
      lit(0.0), (acc, x) => acc + x) - col("n").cast("double")
    val minRc = least(col("__r"), col("__c")).cast("double")
    agg.select((groupCols.map(col) :+ col("n") :+
      ((col("__r") - lit(1L)) * (col("__c") - lit(1L))).as("dof") :+
      chi2.as("chi2") :+
      when(least(col("__r"), col("__c")) >= 2L,
        sqrt(chi2 / (col("n").cast("double") * (minRc - lit(1.0)))))
        .as("cramers_v")): _*)
  }

  /** Partial autocorrelation at lags 1–3 per key via the Durbin–Levinson
    * recursion unrolled to fixed trees (public textbook): φ_kk is the
    * lag-k correlation with the shorter lags regressed out — the AR
    * order-selection diagnostic beside [[ljungBox]] (an AR(p) series
    * cuts off after φ_pp where the plain ACF tails forever).
    *
    * Exactness: the ρ_k are the same exact integer ratios as
    * [[ljungBox]] (A_k/B, one division each); the three unrolled DL
    * trees are fixed IEEE expressions on them:
    * `φ11 = ρ1`, `φ22 = (ρ2 − ρ1²)/(1 − ρ1²)`,
    * `φ33 = (ρ3 − φ21ρ2 − φ22ρ1)/(1 − φ21ρ1 − φ22ρ2)` with
    * `φ21 = ρ1 − φ22·ρ1`. NULL φ_kk when n ≤ k, zero variance, or a DL
    * denominator is 0 (a perfectly-predicted series). NULLs drop before
    * sequencing. Same plan shape as [[ljungBox]]: ONE keyed sort, one
    * map-side-combinable aggregate. Emits (keyCols…, `n`, `pacf_1`,
    * `pacf_2`, `pacf_3`). */
  def pacf(df: DataFrame, valueCol: String, keyCols: Seq[String],
           orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "pacf needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "pacf_1", "pacf_2", "pacf_3", "__x", "__phi22") ++
        (1 to 3).flatMap(k => Seq(s"__l$k", s"__r$k")), "Stats.pacf")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df.filter(xi.isNotNull)
      .select((keyCols.map(col) :+ xi.as("__x")) ++
        (1 to 3).map(k => lag(xi, k).over(w).as(s"__l$k")): _*)
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val x = col("__x")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), dec(x).as("__s"), dec(x * x).as("__s2")) ++
        (1 to 3).flatMap { k =>
          val lk = col(s"__l$k")
          Seq(sum(when(lk.isNotNull, x.cast("decimal(38,0)") * lk)
              .otherwise(lit(0L).cast("decimal(38,0)"))).as(s"__c$k"),
            dec(when(lk.isNotNull, x + lk).otherwise(lit(0L))).as(s"__p$k"))
        }
    val sums = base.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val nDec = sums("n").cast("decimal(38,0)")
    val bDen = (nDec * (nDec * col("__s2") - col("__s") * col("__s")))
      .cast("double")
    // every division goes through a NULL-guarded denominator: a zero
    // denominator yields NULL (never an ANSI divide error or a NaN that
    // poisons the when-conditions), and NULL then propagates through
    // the DL trees to the output
    val safeB = when(bDen > 0.0, bDen)
    def rho(k: Int): Column =
      (nDec * nDec * col(s"__c$k") - nDec * col("__s") * col(s"__p$k") +
        (nDec - lit(k).cast("decimal(38,0)")) * col("__s") * col("__s"))
        .cast("double") / safeB
    // STAGING (codegen 64 KB guard): the Durbin–Levinson recursion
    // references each rho many times; inlined Columns duplicate the whole
    // decimal subtree per reference and CollapseProject then fuses the
    // exponential expression into the hash aggregate's output method,
    // blowing janino's 64 KB method limit (observed: ~16.8k-line class,
    // interpreted fallback). Materializing r1..r3 and phi22 as aliases
    // that are multi-referenced downstream stops the collapse (Catalyst
    // only collapses projects when repeated aliases are cheap), keeping
    // every generated method linear in the formula size.
    val rhos = sums.select((keyCols.map(col) :+ col("n") :+
      rho(1).as("__r1") :+ rho(2).as("__r2") :+ rho(3).as("__r3")): _*)
    val r1 = col("__r1"); val r2 = col("__r2"); val r3 = col("__r3")
    val d2 = lit(1.0) - r1 * r1
    val phis = rhos.withColumn("__phi22",
      (r2 - r1 * r1) / when(d2 =!= 0.0, d2))
    val phi22 = col("__phi22")
    val phi21 = r1 - phi22 * r1
    val d3 = lit(1.0) - phi21 * r1 - phi22 * r2
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) / when(d3 =!= 0.0, d3)
    phis.select((keyCols.map(col) :+ col("n") :+
      when(col("n") > 1L, r1).as("pacf_1") :+
      when(col("n") > 2L, phi22).as("pacf_2") :+
      when(col("n") > 3L, phi33).as("pacf_3")): _*)
  }

  /** Theil–Sen robust regression per group (public estimator): slope =
    * the MEDIAN of all pairwise slopes `(y_j−y_i)/(x_j−x_i)`, intercept
    * = the median of `y − slope·x` — the outlier-proof trend line (up
    * to ~29% contamination) beside [[corrRegression]]'s least squares.
    *
    * Determinism: x/y quantize to scaled BIGINTs; each pair slope is ONE
    * division of exact integers; the median picks by rank over
    * `(slope, i, j)` — a total order, so the selected middle VALUES are
    * engine-identical even with duplicate slopes, and the even-count
    * average is one fixed tree. Same SCALE CONTRACT as [[kendallTau]]:
    * within-group O(n²) pair generation — cross-sectional groups only.
    * Emits (groupCols…, `n`, `n_slopes`, `ts_slope`, `ts_intercept`). */
  def theilSen(df: DataFrame, groupCols: Seq[String], xCol: String,
               yCol: String, scale: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "theilSen needs at least one group column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "n_slopes", "ts_slope", "ts_intercept", "__xi", "__yi",
        "__rn", "__sl", "__res", "__r", "__m"), "Stats.theilSen")
    val k = lit(math.pow(10, scale))
    val xi = round(col(xCol).cast("double") * k).cast("long")
    val yi = round(col(yCol).cast("double") * k).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(xi, yi)
    val base = df.filter(xi.isNotNull && yi.isNotNull)
      .select((groupCols.map(col) :+ xi.as("__xi") :+ yi.as("__yi")) :+
        row_number().over(w).as("__rn"): _*)
    val r = base.select(col(groupCols.head).as("__gk0") +:
      (groupCols.tail.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__gk${i + 1}") } :+
        col("__xi").as("__xj") :+ col("__yi").as("__yj") :+
        col("__rn").as("__rj")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => col(c) === col(s"__gk$i") }
      .reduce(_ && _) && col("__rn") < col("__rj")
    val slopes = base.join(r, cond)
      .filter(col("__xj") =!= col("__xi"))
      .select((groupCols.map(col) :+
        ((col("__yj") - col("__yi")).cast("double") /
          (col("__xj") - col("__xi")).cast("double")).as("__sl") :+
        col("__rn") :+ col("__rj")): _*)
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__sl"), col("__rn"), col("__rj"))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val ranked = slopes.withColumn("__r", row_number().over(sw))
      .withColumn("__m", count(lit(1)).over(cw))
    // middle ranks: ⌊(m+1)/2⌋ and ⌊m/2⌋+1 (equal when m is odd) —
    // integer halving via pmod-free long arithmetic, not the double `/`
    def half(c: Column): Column = ((c - pmod(c, lit(2L))) / lit(2L))
      .cast("long")
    val lower = half(col("__m") + lit(1L))
    val upper = half(col("__m")) + lit(1L)
    val med = ranked
      .filter(col("__r") === lower || col("__r") === upper)
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__m")).as("n_slopes"),
        (sum(col("__sl")) / count(lit(1)).cast("double")).as("ts_slope"))
    // intercept: median of y − slope·x over the group's points, the same
    // total-order selection
    val withSlope = base.join(med.select(
      (groupCols.map(col) :+ col("n_slopes") :+ col("ts_slope")): _*),
      groupCols, "left")
    val resid = col("__yi").cast("double") / k -
      col("ts_slope") * (col("__xi").cast("double") / k)
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__res"), col("__rn"))
    val rankedRes = withSlope.withColumn("__res", resid)
      .withColumn("__r", row_number().over(rw))
      .withColumn("__m", count(lit(1)).over(cw))
    val medRes = rankedRes
      .filter(col("__r") === half(col("__m") + lit(1L)) ||
        col("__r") === half(col("__m")) + lit(1L))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__m")).as("n"),
        max(col("n_slopes")).as("n_slopes"),
        max(col("ts_slope")).as("ts_slope"),
        (sum(col("__res")) / count(lit(1)).cast("double"))
          .as("ts_intercept"))
    medRes.select((groupCols.map(col) :+ col("n") :+
      coalesce(col("n_slopes"), lit(0L)).as("n_slopes") :+
      col("ts_slope") :+ col("ts_intercept")): _*)
  }

  /** Benjamini–Hochberg step-up FDR adjustment per family: each row's
    * adjusted p is `p_adj(i) = min(1, min_{j ≥ i} m·p_(j)/j)` over the
    * family's ascending-p order — the multiple-testing control run over
    * any battery of per-key test outputs (a [[welchT]] sweep, a drift
    * screen per feature) before acting on "significant" rows.
    *
    * Determinism: the order statistic ranks by `(p, tieCol)` — the
    * caller's tie column makes the permutation total, so rank `j` is
    * engine-identical even with duplicate p's (and BH's adjusted values
    * are invariant to tie order anyway: equal p's get the suffix-min of
    * the same set). Each candidate is the fixed tree `(p·m)/j`; the
    * suffix-min runs as a RUNNING min over the REVERSED order — Spark
    * executes unbounded-FOLLOWING frames by rescanning the tail per row
    * (O(n²) per family; measured: a 1M-row family never finishes), while
    * the reversed running frame is the O(n) sliding accumulator. min of
    * doubles is exact either way.
    * NULL p rows are excluded from m and ranking and emit NULL p_adj.
    *
    * One keyed sort each way (rank + reversed running min), no join.
    * Emits the input plus (`p_rank`, `p_adj`, `significant`). */
  /** Wilcoxon signed-rank test per group (public formula): the PAIRED
    * nonparametric readout — is the median of `x − y` zero — where
    * [[mannWhitney]] compares two independent arms. The classic
    * before/after screen, robust to outliers that break a paired t.
    *
    * Exactness: both sides quantize to `scale` decimals so `d = x − y`
    * is an exact BIGINT; zero differences drop (the standard Wilcoxon
    * discard, n counts the survivors); |d| ranks with the [[spearman]]
    * DOUBLED-average-rank trick, so `2W⁺ = Σ_{d>0} 2r` is an exact
    * BIGINT and `W⁺` an exact half-integer. The tie term accumulates
    * per row as `t² − 1` (summing to `Σ(t³ − t)`). The normal
    * approximation is ONE fixed IEEE tree:
    * `z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)`.
    * NULL `z` when n = 0 or every |d| is tied at one value (variance
    * ≤ 0). One hash exchange on the group key; rank and tie-size share
    * ONE sort; the final aggregate is map-side combinable. Emits
    * (groupCols…, `n_nonzero`, `w_plus`, `wsr_z`). */
  def wilcoxonSignedRank(df: DataFrame, xCol: String, yCol: String,
                         groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty,
      "wilcoxonSignedRank needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_nonzero", "w_plus", "wsr_z", "__d", "__a", "__r2", "__t"),
      "Stats.wilcoxonSignedRank")
    import org.apache.spark.sql.expressions.Window
    def q(c: String): Column =
      round(col(c).cast("double") * lit(math.pow(10, scale))).cast("long")
    val base = df
      .select((groupCols.map(col) :+ (q(xCol) - q(yCol)).as("__d")): _*)
      .filter(col("__d").isNotNull && col("__d") =!= 0L)
      .withColumn("__a", abs(col("__d")))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__a"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow)).cast("long")
    val ranked = base
      .withColumn("__t", peers)
      .withColumn("__r2",
        lit(2L) * rank().over(w).cast("long") + col("__t") - lit(1L))
    val sums = ranked.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_nonzero"),
      sum(when(col("__d") > 0L, col("__r2")).otherwise(0L)).as("__s2p"),
      sum(col("__t") * col("__t") - lit(1L)).as("__tcorr"))
    val n = col("n_nonzero").cast("double")
    val wPlus = col("__s2p").cast("double") / lit(2.0)
    val mu = n * (n + lit(1.0)) / lit(4.0)
    val sig2 = n * (n + lit(1.0)) * (lit(2.0) * n + lit(1.0)) / lit(24.0) -
      col("__tcorr").cast("double") / lit(48.0)
    sums.select((groupCols.map(col) :+ col("n_nonzero") :+
      when(col("n_nonzero") >= 1L, wPlus).as("w_plus") :+
      when(col("n_nonzero") >= 1L && sig2 > 0.0,
        (wPlus - mu) / sqrt(sig2)).as("wsr_z")): _*)
  }

  /** Brown–Forsythe variance-homogeneity test per group (public
    * formulation — Levene's test with the MEDIAN center, the robust
    * default): are the k variants' spreads equal — the precondition
    * screen for [[anovaF]]'s pooled-variance assumption. Statistic:
    * one-way ANOVA F on the absolute deviations from each variant's
    * median.
    *
    * Exactness: values quantize to `scale` decimals; each variant's
    * DOUBLED median `m2` is exact (the lo/hi mid-rank pick — odd n
    * reads one row twice, even n sums the two middles, never a float
    * interpolation), so the deviations `|2x − m2|` are exact BIGINTs
    * and the F inherits [[anovaF]]'s variant-ordered-fold determinism
    * verbatim (the doubling cancels in the ratio). NULL variants
    * raise, NULL values drop — the anovaF contract. Plan: ONE hash
    * exchange on (group, variant) shared by the median sort, the
    * median aggregate, and the co-partitioned join back; then anovaF's
    * two map-side-combinable aggregates. Emits (groupCols…, `k`, `n`,
    * `f`, `ss_between`, `ss_within`) — sums of squares in the doubled
    * quantized domain. */
  def brownForsythe(df: DataFrame, valueCol: String, variantCol: String,
                    groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty,
      "brownForsythe needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("k", "n", "f", "ss_between", "ss_within",
        "__v", "__xi", "__rn", "__ng", "__m2", "__z"),
      "Stats.brownForsythe")
    import org.apache.spark.sql.expressions.Window
    val v = when(col(variantCol).isNull,
        raise_error(lit(s"brownForsythe: NULL $variantCol — a silently " +
          "dropped arm is a corrupted experiment readout; filter first")))
      .otherwise(col(variantCol).cast("string"))
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((groupCols.map(col) :+ v.as("__v") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val keys = groupCols.map(col) :+ col("__v")
    val wv = Window.partitionBy(keys: _*).orderBy(col("__xi"))
    val ranked = base
      .withColumn("__rn", row_number().over(wv))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy(keys: _*)))
    val lo = expr("(__ng + 1) DIV 2")
    val hi = expr("(__ng DIV 2) + 1")
    val med = ranked.groupBy(keys: _*).agg(
      (sum(when(col("__rn") === lo, col("__xi")).otherwise(0L)) +
        sum(when(col("__rn") === hi, col("__xi")).otherwise(0L))).as("__m2"))
    val z = ranked
      .join(med, groupCols :+ "__v")
      .select((groupCols.map(col) :+ col("__v").as("__bf_v") :+
        abs(lit(2L) * col("__xi") - col("__m2")).as("__bf_z")): _*)
    anovaF(z, "__bf_z", "__bf_v", groupCols, scale = 0)
  }

  /** Two-sample Cramér–von Mises statistic per group (public
    * formulation, Anderson 1962): the WHOLE-distribution distance
    * between two arms — where [[Divergence.ksTest]] reads only the
    * single worst ECDF gap, CvM integrates the squared gap over the
    * whole support, so many small persistent shifts register that KS
    * misses. `T = U/(nmN) − (4nm−1)/(6N)` with
    * `U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)²` (pooled rank minus within-arm
    * index).
    *
    * Exactness: values quantize to `scale` decimals; pooled ranks use
    * the DOUBLED-midrank trick and within-arm indexes are doubled to
    * match, so each `D = 2r − 2i` is an exact integer whose squares sum
    * exactly (DECIMAL — the Σ reaches ~N³); `U·4 = n·ΣD_a² + m·ΣD_b²`
    * stays exact, and T is ONE fixed tree
    * `U4/(4nmN) − (4nm−1)/(6N)`. Tied same-arm rows swap indexes
    * without changing the sum (r equal, the i-set fixed), so the
    * statistic is tie-deterministic. NULL T on an empty arm. Variants
    * outside {a, b} raise — the [[mannWhitney]] contract. Plan: the
    * pooled rank and the within-arm index are two sorts over one hash
    * exchange family; the final aggregate is map-side combinable.
    * Emits (groupCols…, `n_a`, `n_b`, `cvm_t`). */
  def cramerVonMises(df: DataFrame, valueCol: String, variantCol: String,
                     variantA: String, variantB: String,
                     groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty,
      "cramerVonMises needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_a", "n_b", "cvm_t", "__xi", "__arm", "__r2", "__i2", "__d"),
      "Stats.cramerVonMises")
    import org.apache.spark.sql.expressions.Window
    val v = col(variantCol)
    val xi = when(v.isNull || (v =!= variantA && v =!= variantB),
        raise_error(concat(
          lit(s"cramerVonMises: $variantCol must be '$variantA' or " +
            s"'$variantB', got "),
          coalesce(v, lit("NULL")))))
      .otherwise(round(col(valueCol).cast("double") *
        lit(math.pow(10, scale))).cast("long"))
    val base = df
      .select((groupCols.map(col) :+ v.as("__arm") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val wp = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__xi"))
    val wa = Window.partitionBy((groupCols.map(col) :+ col("__arm")): _*)
      .orderBy(col("__xi"))
    val peers = count(lit(1))
      .over(wp.rangeBetween(Window.currentRow, Window.currentRow))
      .cast("long")
    val ranked = base
      .withColumn("__r2", lit(2L) * rank().over(wp).cast("long") +
        peers - lit(1L))
      .withColumn("__i2", lit(2L) * row_number().over(wa).cast("long"))
      .withColumn("__d", col("__r2") - col("__i2"))
    val isA = col("__arm") === variantA
    val sums = ranked.groupBy(groupCols.map(col): _*).agg(
      count(when(isA, 1)).as("n_a"),
      count(when(!isA, 1)).as("n_b"),
      sum(when(isA, (col("__d") * col("__d")).cast("decimal(38,0)"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("__da"),
      sum(when(!isA, (col("__d") * col("__d")).cast("decimal(38,0)"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("__db"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nn = na + nb
    val u4 = (col("n_a").cast("decimal(38,0)") * col("__da") +
      col("n_b").cast("decimal(38,0)") * col("__db")).cast("double")
    val t = u4 / (lit(4.0) * na * nb * nn) -
      (lit(4.0) * na * nb - lit(1.0)) / (lit(6.0) * nn)
    sums.select((groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
      when(col("n_a") >= 1L && col("n_b") >= 1L, t).as("cvm_t")): _*)
  }

  /** Two-proportion z-test per group (public formula) — THE conversion
    * readout: is arm A's success RATE different from arm B's,
    * `z = (p̂_A − p̂_B)/√(p̂(1−p̂)(1/n_A + 1/n_B))` with the pooled p̂.
    * The binary-outcome member of the A/B family beside [[welchT]]
    * (means) and [[mannWhitney]] (distributions).
    *
    * Exactness: success/total counts are exact integers from one
    * map-side-combinable pass ([[graft.operators.Eval.checkedLabel]]
    * outcomes — non-0/1 raises); the z is ONE fixed tree on their
    * casts. NULL z on an empty arm or a degenerate pooled rate (all
    * successes / all failures — no variance). Variants outside {A, B}
    * raise. Emits (groupCols…, `n_a`, `n_b`, `rate_a`, `rate_b`,
    * `prop_z`). */
  def twoProportionZ(df: DataFrame, successCol: String, variantCol: String,
                     variantA: String, variantB: String,
                     groupCols: Seq[String]): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    require(groupCols.nonEmpty,
      "twoProportionZ needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_a", "n_b", "rate_a", "rate_b", "prop_z", "__arm", "__y"),
      "Stats.twoProportionZ")
    val v = col(variantCol)
    val armChecked = when(v.isNull || (v =!= variantA && v =!= variantB),
        raise_error(concat(
          lit(s"twoProportionZ: $variantCol must be '$variantA' or " +
            s"'$variantB', got "), coalesce(v, lit("NULL")))))
      .otherwise(v)
    val s = col(successCol)
    val y = when(s.isNull || (s.cast("long") =!= 0L && s.cast("long") =!= 1L),
        raise_error(concat(lit(s"twoProportionZ: $successCol must be " +
          "0 or 1, got "), coalesce(s.cast("string"), lit("NULL")))))
      .otherwise(s.cast("long"))
    val base = df.select((groupCols.map(col) :+ armChecked.as("__arm") :+
      y.as("__y")): _*)
    val isA = col("__arm") === variantA
    val sums = base.groupBy(groupCols.map(col): _*).agg(
      count(when(isA, 1)).as("n_a"),
      count(when(!isA, 1)).as("n_b"),
      sum(when(isA, col("__y")).otherwise(0L)).as("__sa"),
      sum(when(!isA, col("__y")).otherwise(0L)).as("__sb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("__sa").cast("double") / na
    val pb = col("__sb").cast("double") / nb
    val pooled = (col("__sa") + col("__sb")).cast("double") / (na + nb)
    val se2 = pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb)
    sums.select((groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
      when(col("n_a") >= 1L, pa).as("rate_a") :+
      when(col("n_b") >= 1L, pb).as("rate_b") :+
      when(col("n_a") >= 1L && col("n_b") >= 1L && se2 > 0.0,
        (pa - pb) / sqrt(se2)).as("prop_z")): _*)
  }

  /** Cochran–Armitage trend test per group (public formulation): across
    * k ORDERED doses (days, buckets, exposure levels), does the success
    * PROPORTION trend monotonically —
    * `z = Σᵢwᵢ(sᵢ − nᵢp̄) / √(p̄(1−p̄)(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/n))` with the
    * dose value as the weight. The ordered-alternative member of the
    * proportion family: [[twoProportionZ]] (two arms),
    * [[chiSquareCells]] (any-difference), this (monotone trend) — the
    * proportions twin of [[pageTrend]].
    *
    * Exactness: per-dose success/total counts and every weighted sum
    * (`Σws`, `Σwn`, `Σw²n`) are exact BIGINTs from one combinable
    * aggregate over the (group, dose) frame; the z is ONE fixed tree —
    * the numerator multiplies through by n
    * (`n·Σws − Σwn·S` exact DECIMAL) so no per-dose float expectation
    * is ever summed. NULL z on a degenerate rate (all success/failure)
    * or zero weight variance (one dose). `doseCol` must be integral.
    * Emits (groupCols…, `n`, `k_doses`, `ca_z`). */
  def cochranArmitage(df: DataFrame, successCol: String, doseCol: String,
                      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "cochranArmitage needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "k_doses", "ca_z", "__w", "__y"), "Stats.cochranArmitage")
    val s = col(successCol)
    val y = when(s.isNull || (s.cast("long") =!= 0L && s.cast("long") =!= 1L),
        raise_error(concat(lit(s"cochranArmitage: $successCol must be " +
          "0 or 1, got "), coalesce(s.cast("string"), lit("NULL")))))
      .otherwise(s.cast("long"))
    val w = col(doseCol).cast("long")
    val base = df
      .select((groupCols.map(col) :+ w.as("__w") :+ y.as("__y")): _*)
      .filter(col("__w").isNotNull)
    val sums = base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      countDistinct(col("__w")).as("k_doses"),
      sum(col("__y")).as("__s"),
      sum(col("__w") * col("__y")).as("__ws"),
      sum(col("__w")).as("__wn"),
      sum(col("__w") * col("__w")).as("__wwn"))
    val nL = col("n")
    val nDec = nL.cast("decimal(38,0)")
    // n-multiplied numerator and variance pieces, exact in DECIMAL
    val num = (nDec * col("__ws") -
      col("__wn").cast("decimal(38,0)") * col("__s")).cast("double")
    val cw = (nDec * col("__wwn") -
      col("__wn").cast("decimal(38,0)") * col("__wn")).cast("double")
    val sD = col("__s").cast("double")
    val nD = nL.cast("double")
    val pbar = sD / nD
    // z = num/n / sqrt(p(1-p)·cw/n) = num / sqrt(p(1-p)·cw·n)
    val varTerm = pbar * (lit(1.0) - pbar) * cw * nD
    sums.select((groupCols.map(col) :+ col("n") :+ col("k_doses") :+
      when(nL >= 1L && varTerm > 0.0, num / sqrt(varTerm)).as("ca_z")): _*)
  }

  /** Bland–Altman agreement analysis per group (public formulation):
    * for two measurement methods on the same rows, the bias
    * `d̄ = mean(x − y)` and the 95% limits of agreement
    * `d̄ ± 1.96·sd(d)` — the standard "can method B replace method A"
    * readout (correlation alone cannot answer it: two methods can
    * correlate at 0.99 and still disagree by a constant clinically
    * fatal offset).
    *
    * Exactness: differences are exact quantized BIGINTs; (n, Σd, Σd²)
    * accumulate exactly in one combinable pass; bias and the sample sd
    * are fixed trees on the n-multiplied centered sum, with 1.96 as a
    * literal. NULL limits when n < 2 or zero variance (bias still
    * emitted). Emits (groupCols…, `n`, `ba_bias`, `ba_sd`, `ba_lower`,
    * `ba_upper`). */
  def blandAltman(df: DataFrame, xCol: String, yCol: String,
                  groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "blandAltman needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "ba_bias", "ba_sd", "ba_lower", "ba_upper", "__d"),
      "Stats.blandAltman")
    def q(c: String): Column =
      round(col(c).cast("double") * lit(math.pow(10, scale))).cast("long")
    val base = df
      .select((groupCols.map(col) :+ (q(xCol) - q(yCol)).as("__d")): _*)
      .filter(col("__d").isNotNull)
    val sums = base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__d")).as("__s"),
      sum(col("__d").cast("decimal(38,0)") * col("__d")).as("__sdd"))
    val nD = col("n").cast("double")
    val pow10 = lit(math.pow(10, scale))
    val bias = (col("__s").cast("double") / nD) / pow10
    val cdd = (col("n").cast("decimal(38,0)") * col("__sdd") -
      col("__s").cast("decimal(38,0)") * col("__s")).cast("double")
    val sd = sqrt(when(cdd > 0.0, cdd) / (nD * (nD - lit(1.0)))) / pow10
    sums.select((groupCols.map(col) :+ col("n") :+
      when(col("n") >= 1L, bias).as("ba_bias") :+
      when(col("n") >= 2L, sd).as("ba_sd") :+
      when(col("n") >= 2L, bias - lit(1.96) * sd).as("ba_lower") :+
      when(col("n") >= 2L, bias + lit(1.96) * sd).as("ba_upper")): _*)
  }

  /** Process capability Cp/Cpk per group (public SPC formulas): against
    * caller spec limits (LSL, USL), `Cp = (USL−LSL)/6σ` (potential) and
    * `Cpk = min(USL−μ, μ−LSL)/3σ` (realized, off-center-penalized) —
    * the acceptance numbers behind [[graft.operators.Rolling.ewmaChart]]'s
    * monitoring: the chart says "did it drift", Cpk says "does the
    * process fit the spec at all". Uses the sample σ.
    *
    * Exactness: quantized integer sums; μ and σ are fixed trees on the
    * n-multiplied centered sum; spec limits are literals quantized on
    * the same grid. NULL when n < 2 or zero variance. Emits
    * (groupCols…, `n`, `cp`, `cpk`). */
  def processCapability(df: DataFrame, valueCol: String,
                        groupCols: Seq[String], lsl: Double, usl: Double,
                        scale: Int = 0): DataFrame = {
    require(usl > lsl, s"USL ($usl) must exceed LSL ($lsl)")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty,
      "processCapability needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "cp", "cpk", "__xi"), "Stats.processCapability")
    val pow10 = math.pow(10, scale)
    val xi = round(col(valueCol).cast("double") * lit(pow10)).cast("long")
    val base = df
      .select((groupCols.map(col) :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val sums = base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__xi")).as("__s"),
      sum(col("__xi").cast("decimal(38,0)") * col("__xi")).as("__sxx"))
    val nD = col("n").cast("double")
    val mu = col("__s").cast("double") / nD
    val cxx = (col("n").cast("decimal(38,0)") * col("__sxx") -
      col("__s").cast("decimal(38,0)") * col("__s")).cast("double")
    val sigma = sqrt(when(cxx > 0.0, cxx) / (nD * (nD - lit(1.0))))
    val uslQ = lit(usl * pow10)
    val lslQ = lit(lsl * pow10)
    val cp = (uslQ - lslQ) / (lit(6.0) * sigma)
    val cpk = least(uslQ - mu, mu - lslQ) / (lit(3.0) * sigma)
    sums.select((groupCols.map(col) :+ col("n") :+
      when(col("n") >= 2L, cp).as("cp") :+
      when(col("n") >= 2L, cpk).as("cpk")): _*)
  }

  /** 2×2 odds ratio and relative risk per group (public formulas) —
    * [[twoProportionZ]] answers "is there a difference"; these answer
    * "how big, in the units epidemiology and growth teams quote":
    * `OR = (s_A·f_B)/(f_A·s_B)`, `RR = p̂_A/p̂_B`, with the Woolf
    * standard error `se(ln OR) = √(1/s_A + 1/f_A + 1/s_B + 1/f_B)` for
    * CI construction downstream.
    *
    * Exactness: the four cell counts are exact integers from one
    * combinable pass; OR and RR are single integer-ratio trees; the
    * only libm is `ln OR`, rounded to 10 decimals in-engine (the
    * [[graft.operators.TextOps.bigramPmi]] contract); se is a fixed
    * tree of four exact reciprocals. NULL OR/log/se when any cell is
    * zero (the classic undefined table — apply Haldane's +0.5 upstream
    * if you want it); NULL RR when either arm is empty or B never
    * succeeds. Emits (groupCols…, `s_a`, `f_a`, `s_b`, `f_b`,
    * `odds_ratio`, `log_or`, `se_log_or`, `risk_ratio`). */
  def oddsRiskRatio(df: DataFrame, successCol: String, variantCol: String,
                    variantA: String, variantB: String,
                    groupCols: Seq[String]): DataFrame = {
    require(variantA != variantB, "the two variants must differ")
    require(groupCols.nonEmpty,
      "oddsRiskRatio needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("s_a", "f_a", "s_b", "f_b", "odds_ratio", "log_or", "se_log_or",
        "risk_ratio", "__arm", "__y"), "Stats.oddsRiskRatio")
    val v = col(variantCol)
    val armChecked = when(v.isNull || (v =!= variantA && v =!= variantB),
        raise_error(concat(
          lit(s"oddsRiskRatio: $variantCol must be '$variantA' or " +
            s"'$variantB', got "), coalesce(v, lit("NULL")))))
      .otherwise(v)
    val s = col(successCol)
    val y = when(s.isNull || (s.cast("long") =!= 0L && s.cast("long") =!= 1L),
        raise_error(concat(lit(s"oddsRiskRatio: $successCol must be " +
          "0 or 1, got "), coalesce(s.cast("string"), lit("NULL")))))
      .otherwise(s.cast("long"))
    val base = df.select((groupCols.map(col) :+ armChecked.as("__arm") :+
      y.as("__y")): _*)
    val isA = col("__arm") === variantA
    val sums = base.groupBy(groupCols.map(col): _*).agg(
      sum(when(isA, col("__y")).otherwise(0L)).as("s_a"),
      sum(when(isA, lit(1L) - col("__y")).otherwise(0L)).as("f_a"),
      sum(when(!isA, col("__y")).otherwise(0L)).as("s_b"),
      sum(when(!isA, lit(1L) - col("__y")).otherwise(0L)).as("f_b"))
    val (sa, fa, sb, fb) =
      (col("s_a"), col("f_a"), col("s_b"), col("f_b"))
    val allPos = sa > 0L && fa > 0L && sb > 0L && fb > 0L
    def d(c: Column): Column = c.cast("double")
    val or = (d(sa) * d(fb)) / (d(fa) * d(sb))
    val se = sqrt(lit(1.0) / d(sa) + lit(1.0) / d(fa) +
      lit(1.0) / d(sb) + lit(1.0) / d(fb))
    val rr = (d(sa) / (d(sa) + d(fa))) / (d(sb) / (d(sb) + d(fb)))
    sums.select((groupCols.map(col) :+ sa :+ fa :+ sb :+ fb :+
      when(allPos, or).as("odds_ratio") :+
      when(allPos, round(log(or), 10) + lit(0.0)).as("log_or") :+
      when(allPos, se).as("se_log_or") :+
      when(sa + fa > 0L && sb + fb > 0L && sb > 0L, rr)
        .as("risk_ratio")): _*)
  }

  /** Herfindahl–Hirschman concentration index per group (public
    * formula): `HHI = Σ_m s_m²` over member shares `s_m = v_m/Σv` —
    * market/portfolio/source concentration in (0, 1] (1 = monopoly,
    * 1/k = k equal members). The single-number companion to
    * [[Divergence.gini]]'s full inequality curve; in a data pipeline it
    * reads source-domination of a corpus slice at a glance.
    *
    * Exactness: member totals are exact quantized BIGINTs from one
    * (group, member) aggregate; `HHI = ΣV_m² / (ΣV_m)²` evaluates as
    * ONE double division of two exact DECIMAL sums (shares never
    * materialize — no per-member float divisions to re-sum). Negative
    * member totals raise (shares are undefined). NULL HHI on a zero
    * total. Two map-side-combinable aggregates on one exchange chain.
    * Emits (groupCols…, `n_members`, `total`, `hhi`). */
  def hhi(df: DataFrame, valueCol: String, memberCol: String,
          groupCols: Seq[String], scale: Int = 0): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "hhi needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_members", "total", "hhi", "__m", "__vm"), "Stats.hhi")
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val perMember = df
      .select((groupCols.map(col) :+ col(memberCol).as("__m") :+
        xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
      .groupBy((groupCols.map(col) :+ col("__m")): _*)
      .agg(sum(col("__xi")).as("__vm"))
      .withColumn("__vm", when(col("__vm") < 0L,
        raise_error(lit("hhi: negative member total — shares are " +
          "undefined; screen or shift the value upstream")))
        .otherwise(col("__vm")))
    val sums = perMember.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_members"),
      sum(col("__vm")).as("__tot"),
      sum(col("__vm").cast("decimal(38,0)") * col("__vm")).as("__sq"))
    val tot = col("__tot").cast("decimal(38,0)")
    sums.select((groupCols.map(col) :+ col("n_members") :+
      (col("__tot").cast("double") / lit(math.pow(10, scale)))
        .as("total") :+
      when(col("__tot") > 0L,
        col("__sq").cast("double") / (tot * tot).cast("double"))
        .as("hhi")): _*)
  }

  /** Trimmed mean per group (public formula): drop the lowest and
    * highest `trimPm`‰ of rows (per side, by position in the value
    * order) and average the rest — the robust location readout between
    * the mean (trim 0) and the median (trim → 500‰), standard for
    * heavy-tailed metrics where [[Anomaly.grubbs]] flags what the mean
    * can't survive.
    *
    * Exactness: values quantize to `scale` decimals; the per-side trim
    * count is the exact integer `t = ⌊n·trimPm/1000⌋`; positional
    * trimming keeps a DETERMINISTIC multiset under ties (which tied row
    * survives is arbitrary, but the surviving VALUES are not), so the
    * kept sum is an exact BIGINT and the mean is one fixed tree
    * `(S/(n−2t))/10^scale`. NULL when the trim swallows everything.
    * One keyed sort + one map-side-combinable aggregate. Emits
    * (groupCols…, `n`, `n_kept`, `trimmed_mean`). */
  def trimmedMean(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  trimPm: Int = 50, scale: Int = 0): DataFrame = {
    require(trimPm >= 0 && trimPm < 500,
      s"per-side trim permille must be in [0,500), got $trimPm")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "trimmedMean needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n", "n_kept", "trimmed_mean", "__xi", "__rn", "__ng"),
      "Stats.trimmedMean")
    import org.apache.spark.sql.expressions.Window
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((groupCols.map(col) :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val ranked = base
      .withColumn("__rn", row_number().over(wg.orderBy(col("__xi"))))
      .withColumn("__ng", count(lit(1)).over(wg))
    val t = expr(s"(__ng * $trimPm) DIV 1000")
    val kept = col("__rn") > t && col("__rn") <= col("__ng") - t
    val sums = ranked.groupBy(groupCols.map(col): _*).agg(
      max(col("__ng")).as("n"),
      sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
      sum(when(kept, col("__xi")).otherwise(0L)).as("__s"))
    sums.select((groupCols.map(col) :+ col("n") :+ col("n_kept") :+
      when(col("n_kept") >= 1L,
        (col("__s").cast("double") / col("n_kept").cast("double")) /
          lit(math.pow(10, scale))).as("trimmed_mean")): _*)
  }

  /** Hill tail-index estimator per group (public formula): over the k
    * largest POSITIVE values, `H = (1/k)·Σ ln(x_(i)/x_(k+1))` and the
    * tail index `α = 1/H` — how heavy the upper tail is (α ≲ 2: infinite
    * variance; α ≲ 4: unstable kurtosis). The estimation-side companion
    * to [[Rolling.historicalVar]]'s empirical quantiles: VaR reads the
    * tail, Hill parameterizes it.
    *
    * Determinism: values quantize to `scale` decimals (the scale cancels
    * inside the ratio); the top k+1 rows per key come from one keyed
    * rank (ties straddling the boundary keep a deterministic multiset);
    * each `ln` term rounds to 10 decimals in-engine (cross-engine libm
    * ulp — the [[TextOps.bigramPmi]] contract) and the k-bounded fold
    * runs in rank order. NULL when the group has < k+1 positive rows;
    * NULL α when every top value ties the threshold (H = 0). k is
    * bounded (driver-side list of k+1 per group — keep it ≤ ~10⁴).
    * Emits (groupCols…, `n_pos`, `hill_h`, `hill_alpha`). */
  def hillTail(df: DataFrame, valueCol: String, groupCols: Seq[String],
               k: Int, scale: Int = 0): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1,10000], got $k")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "hillTail needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_pos", "hill_h", "hill_alpha", "__xi", "__rn", "__top"),
      "Stats.hillTail")
    import org.apache.spark.sql.expressions.Window
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((groupCols.map(col) :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull && col("__xi") > 0L)
    val wg = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__xi").desc)
    val ranked = base.withColumn("__rn", row_number().over(wg))
    val sums = ranked.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_pos"),
      sort_array(collect_list(when(col("__rn") <= (k + 1).toLong,
        struct(col("__rn"), col("__xi"))))).as("__top"))
    // get() (0-based) is NULL out-of-bounds under ANSI, unlike element_at
    val thr = get(col("__top"), lit(k)).getField("__xi").cast("double")
    val fold = aggregate(
      slice(col("__top"), 1, k),
      lit(0.0),
      (acc, e) => acc +
        (round(log(e.getField("__xi").cast("double") / thr), 10) +
          lit(0.0)))
    val h = when(col("n_pos") >= (k + 1).toLong, fold / lit(k.toDouble))
    sums.select((groupCols.map(col) :+ col("n_pos") :+
      h.as("hill_h") :+
      when(h > 0.0, lit(1.0) / h).as("hill_alpha")): _*)
  }

  /** Friedman test per group (public formulation, Conover's tie-corrected
    * form): the k-treatment PAIRED nonparametric readout — across n
    * matched blocks, do the k treatments rank consistently differently —
    * completing the family: [[wilcoxonSignedRank]] (paired, k=2),
    * [[mannWhitney]] (independent, k=2), [[kruskalWallis]] (independent,
    * k-ary). Each (block, treatment) CELL is the exact integer SUM of
    * the quantized values (sums, not means — means would need exact
    * rational rank comparisons), ranked WITHIN its block.
    *
    * Exactness: cells are exact BIGINTs; within-block ranks use the
    * [[spearman]] DOUBLED-average-rank trick, so with `R2_j = Σ_blocks
    * 2r` and `A2 = Σ_cells (2r)²` the tie-corrected statistic is
    * integer until ONE final division:
    * `Q = (k−1)·(Σ_j R2_j² − n²k(k+1)²) / (A2 − nk(k+1)²)`.
    * Blocks missing a treatment (cell count ≠ k) are DROPPED — the
    * standard complete-block requirement; n counts survivors. NULL Q
    * when n = 0, k < 2, or every block is fully tied (denominator 0).
    *
    * Plan: one (group, block, treatment) aggregate; the block-rank
    * window and both downstream aggregates reuse the (group, block)
    * exchange; the per-treatment fold is k-row-bounded. Emits
    * (groupCols…, `n_blocks`, `k`, `friedman_q`). */
  def friedman(df: DataFrame, valueCol: String, blockCol: String,
               treatCol: String, k: Int, groupCols: Seq[String],
               scale: Int = 0): DataFrame = {
    require(k >= 2, s"need at least 2 treatments, got $k")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "friedman needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_blocks", "k", "friedman_q", "__b", "__v", "__cell", "__nc",
        "__t", "__r2"), "Stats.friedman")
    import org.apache.spark.sql.expressions.Window
    val v = when(col(treatCol).isNull,
        raise_error(lit(s"friedman: NULL $treatCol — a silently dropped " +
          "treatment corrupts the block structure; filter first")))
      .otherwise(col(treatCol).cast("string"))
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val cells = df
      .select((groupCols.map(col) :+ col(blockCol).as("__b") :+
        v.as("__v") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
      .groupBy((groupCols.map(col) :+ col("__b") :+ col("__v")): _*)
      .agg(sum(col("__xi")).as("__cell"))
    val blockKeys = groupCols.map(col) :+ col("__b")
    val wb = Window.partitionBy(blockKeys: _*)
    val complete = cells
      .withColumn("__nc", count(lit(1)).over(wb))
      .filter(col("__nc") === k.toLong)
    val wr = wb.orderBy(col("__cell"))
    val peers = count(lit(1))
      .over(wr.rangeBetween(Window.currentRow, Window.currentRow))
      .cast("long")
    val ranked = complete
      .withColumn("__t", peers)
      .withColumn("__r2",
        lit(2L) * rank().over(wr).cast("long") + col("__t") - lit(1L))
    // per-treatment doubled rank sums (k rows per group), then the
    // group-level fold: both exact BIGINT sums
    val perTreat = ranked.groupBy((groupCols.map(col) :+ col("__v")): _*)
      .agg(sum(col("__r2")).as("__rj2"), count(lit(1)).as("__nj"),
        sum(col("__r2") * col("__r2")).as("__a2j"))
    val sums = perTreat.groupBy(groupCols.map(col): _*).agg(
      max(col("__nj")).as("n_blocks"),
      count(lit(1)).cast("long").as("k"),
      sum(col("__rj2") * col("__rj2")).as("__sr2"),
      sum(col("__a2j")).as("__a2"))
    val n = col("n_blocks")
    val kk = lit(k.toLong)
    val kSq = kk * (kk + lit(1L)) * (kk + lit(1L))
    val num = (col("__sr2") - n * n * kSq).cast("double")
    val den = (col("__a2") - n * kSq).cast("double")
    sums.select((groupCols.map(col) :+ col("n_blocks") :+ col("k") :+
      when(n >= 1L && col("k") === k.toLong && den > 0.0,
        lit((k - 1).toDouble) * num / den).as("friedman_q")): _*)
  }

  /** Page's trend test per group (public formulation): the ORDERED-
    * alternative companion to [[friedman]] — when the k treatments have
    * a natural order (doses, days, stages), `L = Σⱼ j·Rⱼ` weights the
    * within-block rank sums by treatment position, gaining power over
    * Friedman's any-difference alternative for monotone trends. The
    * treatment order is the ascending sort of the treatment labels
    * (encode the order into the label — zero-padded stage numbers).
    *
    * Exactness: cells, completeness, and doubled midranks are
    * [[friedman]] verbatim; `L2 = Σⱼ j·R2ⱼ` stays an exact BIGINT
    * (L = L2/2, an exact half-integer double), and the NO-TIES normal
    * approximation `z = (L − nk(k+1)²/4)/√(nk²(k+1)²(k−1)/144)` is one
    * fixed tree (under heavy ties z is approximate — the documented
    * Page contract; L itself is exact either way). Incomplete blocks
    * drop; NULL z when no complete blocks survive. Same plan shape as
    * friedman plus one k-row rank pass. Emits (groupCols…, `n_blocks`,
    * `k`, `page_l`, `page_z`). */
  def pageTrend(df: DataFrame, valueCol: String, blockCol: String,
                treatCol: String, k: Int, groupCols: Seq[String],
                scale: Int = 0): DataFrame = {
    require(k >= 2, s"need at least 2 treatments, got $k")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(groupCols.nonEmpty, "pageTrend needs at least one group column")
    Guards.requireNoReserved(df.columns,
      Seq("n_blocks", "k", "page_l", "page_z", "__b", "__v", "__cell",
        "__nc", "__t", "__r2", "__j"), "Stats.pageTrend")
    import org.apache.spark.sql.expressions.Window
    val v = when(col(treatCol).isNull,
        raise_error(lit(s"pageTrend: NULL $treatCol — a silently dropped " +
          "treatment corrupts the block structure; filter first")))
      .otherwise(col(treatCol).cast("string"))
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val cells = df
      .select((groupCols.map(col) :+ col(blockCol).as("__b") :+
        v.as("__v") :+ xi.as("__xi")): _*)
      .filter(col("__xi").isNotNull)
      .groupBy((groupCols.map(col) :+ col("__b") :+ col("__v")): _*)
      .agg(sum(col("__xi")).as("__cell"))
    val wb = Window.partitionBy((groupCols.map(col) :+ col("__b")): _*)
    val complete = cells
      .withColumn("__nc", count(lit(1)).over(wb))
      .filter(col("__nc") === k.toLong)
    val wr = wb.orderBy(col("__cell"))
    val peers = count(lit(1))
      .over(wr.rangeBetween(Window.currentRow, Window.currentRow))
      .cast("long")
    val ranked = complete
      .withColumn("__t", peers)
      .withColumn("__r2",
        lit(2L) * rank().over(wr).cast("long") + col("__t") - lit(1L))
    val perTreat = ranked.groupBy((groupCols.map(col) :+ col("__v")): _*)
      .agg(sum(col("__r2")).as("__rj2"), count(lit(1)).as("__nj"))
      .withColumn("__j", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col("__v")))
        .cast("long"))
    val sums = perTreat.groupBy(groupCols.map(col): _*).agg(
      max(col("__nj")).as("n_blocks"),
      count(lit(1)).cast("long").as("k"),
      sum(col("__j") * col("__rj2")).as("__l2"))
    val nD = col("n_blocks").cast("double")
    val kD = lit(k.toDouble)
    val k1 = kD + lit(1.0)
    val lVal = col("__l2").cast("double") / lit(2.0)
    val mu = nD * kD * k1 * k1 / lit(4.0)
    val sig2 = nD * (kD * kD) * (k1 * k1) * (kD - lit(1.0)) / lit(144.0)
    sums.select((groupCols.map(col) :+ col("n_blocks") :+ col("k") :+
      when(col("n_blocks") >= 1L, lVal).as("page_l") :+
      when(col("n_blocks") >= 1L && col("k") === k.toLong,
        (lVal - mu) / sqrt(sig2)).as("page_z")): _*)
  }

  /** Durbin–Watson statistic per key (public formula): on the
    * demeaned series, `DW = Σ(e_t − e_{t−1})²/Σe_t²` — the classic
    * residual-autocorrelation readout (≈2 independent, →0 positive,
    * →4 negative serial correlation). The descriptive companion to
    * [[Rolling.autocorr]]'s lag-1 coefficient (DW ≈ 2(1−ρ₁)) in the
    * form regression practitioners quote.
    *
    * Exactness: values quantize to `scale` decimals and demeaning is
    * MULTIPLIED THROUGH by n — `ẽ_t = n·x_t − Σx` is an exact BIGINT
    * (never a rational mean per row), the n factors cancel in the
    * ratio, and both quadratic sums accumulate as exact DECIMALs on one
    * keyed sort. DW is ONE double division. NULL when n < 2 or the
    * series is constant (Σẽ² = 0). Emits (keyCols…, `n`, `dw`). */
  def durbinWatson(df: DataFrame, valueCol: String, keyCols: Seq[String],
                   orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "durbinWatson needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n", "dw", "__xi", "__lx"), "Stats.durbinWatson")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((keyCols.map(col) :+ xi.as("__xi")) :+
        lag(xi, 1).over(w).as("__lx"): _*)
      .filter(col("__xi").isNotNull)
    // with ẽ = n·x − S, (ẽ_t − ẽ_{t−1}) = n·(x_t − x_{t−1}) — the mean
    // cancels in differences, so the numerator needs only raw diffs
    val d = col("__xi") - col("__lx")
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__xi")).as("__s"),
      sum(col("__xi").cast("decimal(38,0)") * col("__xi")).as("__sxx"),
      sum(when(col("__lx").isNotNull,
        d.cast("decimal(38,0)") * d).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__sdd"))
    val nDec = col("n").cast("decimal(38,0)")
    // Σẽ² = n²Σx² − n·S² → /n: n·Σx² − S² (exact); numerator Σ(nΔ)²/n =
    // n·ΣΔ² — both sides divided by n once
    val den = (nDec * col("__sxx") -
      col("__s").cast("decimal(38,0)") * col("__s")).cast("double")
    val num = (nDec * col("__sdd")).cast("double")
    sums.select((keyCols.map(col) :+ col("n") :+
      when(col("n") >= 2L && den > 0.0, num / den).as("dw")): _*)
  }

  /** Roll effective-spread estimator per key (public formula, Roll
    * 1984): bid-ask bounce makes consecutive PRICE CHANGES negatively
    * autocorrelated, so `spread = 2·√(−cov(Δp_t, Δp_{t−1}))` recovers
    * the effective spread from trade prices alone — no quote data. The
    * microstructure companion to [[graft.operators.Rolling]]'s Amihud
    * illiquidity (price impact) readout. NULL when the autocovariance
    * is non-negative (the estimator is undefined — trending/informed
    * flow) or n < 2 pairs.
    *
    * Exactness — the [[archLm]] discipline: prices quantize to `scale`
    * decimals so Δp and its lag are exact BIGINTs; the pair sums
    * accumulate as DECIMALs and the population covariance numerator
    * `n·Σdd' − Σd·Σd'` is exact; the spread is ONE fixed tree
    * `2·√(−c/n²)/10^s`. ONE keyed sort + one map-side-combinable
    * aggregate. Emits (keyCols…, `n_pairs`, `roll_spread`). */
  def rollSpread(df: DataFrame, priceCol: String, keyCols: Seq[String],
                 orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "rollSpread needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_pairs", "roll_spread", "__d", "__ld"), "Stats.rollSpread")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(priceCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val di = xi - lag(xi, 1).over(w)
    val base = df
      .select(((keyCols ++ orderCols).distinct.map(col) :+ di.as("__d")): _*)
      .withColumn("__ld", lag(col("__d"), 1).over(w))
      .filter(col("__d").isNotNull && col("__ld").isNotNull)
    val (d, l) = (col("__d"), col("__ld"))
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(d.cast("decimal(38,0)")).as("__sd"),
      sum(l.cast("decimal(38,0)")).as("__sl"),
      sum(d.cast("decimal(38,0)") * l).as("__sdl"))
    val nDec = col("n_pairs").cast("decimal(38,0)")
    val c = (nDec * col("__sdl") - col("__sd") * col("__sl")).cast("double")
    val nD = col("n_pairs").cast("double")
    val spread = lit(2.0) * sqrt(when(c < 0.0, -(c / (nD * nD)))) /
      lit(math.pow(10, scale))
    sums.select((keyCols.map(col) :+ col("n_pairs") :+
      when(col("n_pairs") >= 2L, spread).as("roll_spread")): _*)
  }

  /** Kendall's coefficient of concordance W per group (public
    * formulation): how strongly the n blocks (raters) AGREE on the
    * ranking of the k treatments (items), `W = Q/(n(k−1))` from the
    * tie-corrected [[friedman]] Q — 1 is unanimous ordering, 0 is no
    * agreement. The effect-size companion to friedman's hypothesis
    * test (identical plan — one extra exact division). Emits
    * (groupCols…, `n_blocks`, `k`, `kendall_w`). */
  def kendallW(df: DataFrame, valueCol: String, blockCol: String,
               treatCol: String, k: Int, groupCols: Seq[String],
               scale: Int = 0): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("kendall_w"), "Stats.kendallW")
    friedman(df, valueCol, blockCol, treatCol, k, groupCols, scale)
      .select((groupCols.map(col) :+ col("n_blocks") :+ col("k") :+
        (col("friedman_q") /
          (col("n_blocks").cast("double") * lit((k - 1).toDouble)))
          .as("kendall_w")): _*)
  }

  /** Engle's lag-1 ARCH-LM test per key (public formulation): volatility
    * clustering shows up as autocorrelation in SQUARED (de-meaned-free)
    * returns, so regress `u²_t` on `u²_{t−1}` and report `LM = n·R²`
    * (asymptotically χ²(1) under no-ARCH) plus the slope. The
    * hypothesis-test companion to [[graft.streaming.StreamingGarch]]:
    * run this first to decide whether a GARCH fit is even warranted.
    *
    * Exactness — the [[grangerLag1]] discipline: `u` quantizes to a
    * scaled BIGINT, `s = u²` is an exact DECIMAL, the pair sums
    * `(n, Σs, Σs', Σss', Σs², Σs'²)` accumulate as DECIMAL(38,0), and
    * `R² = Cxy²/(Cxx·Cyy)` evaluates on the n-multiplied centered sums
    * as ONE fixed double tree (each exact centered sum cast once).
    * NULL when n < 3 or either centered sum of squares is ≤ 0 (constant
    * |u|). ONE keyed sort + one map-side-combinable aggregate. Emits
    * (keyCols…, `n_pairs`, `arch_beta`, `arch_lm`). */
  def archLm(df: DataFrame, valueCol: String, keyCols: Seq[String],
             orderCols: Seq[String], scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "archLm needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_pairs", "arch_beta", "arch_lm", "__s", "__ls"),
      "Stats.archLm")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ui = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val s = (ui.cast("decimal(38,0)") * ui).as("__s")
    val base = df
      .select((keyCols.map(col) :+ s) :+
        lag(ui, 1).over(w).as("__lu"): _*)
      .withColumn("__ls", col("__lu").cast("decimal(38,0)") * col("__lu"))
      .filter(col("__ls").isNotNull && col("__s").isNotNull)
    val (y, x) = (col("__s"), col("__ls"))
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(y).as("__sy"), sum(x).as("__sx"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
      sum(y * y).as("__syy"))
    val nDec = col("n_pairs").cast("decimal(38,0)")
    val cxx = (nDec * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val cyy = (nDec * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    val cxy = (nDec * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val safeCxx = when(cxx > 0.0, cxx)
    val safeCyy = when(cyy > 0.0, cyy)
    val beta = cxy / safeCxx
    val r2 = (cxy * cxy) / (safeCxx * safeCyy)
    val n = col("n_pairs").cast("double")
    sums.select((keyCols.map(col) :+ col("n_pairs") :+
      when(col("n_pairs") >= 3L, beta).as("arch_beta") :+
      when(col("n_pairs") >= 3L, n * r2).as("arch_lm")): _*)
  }

  /** Chow structural-break test per key (public formulation) for the
    * linear trend `y = α + β·t` at a KNOWN breakpoint: fit the trend on
    * the pre-segment, the post-segment, and pooled; the F-statistic
    * `F = ((SSR_p − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n−4))` asks whether
    * the two segments need different (α, β). The known-date companion
    * to [[mannKendall]]'s "is there a trend at all" and
    * [[Rolling.drawdownEpisodes]]' descriptive regime cuts.
    *
    * `t` is the exact epoch-day of `tsCol` (integer regressor — day
    * resolution keeps n-multiplied products ~10²⁰, far inside exact
    * DECIMAL range); `y` quantizes by `scale`. Per-segment sufficient
    * statistics accumulate as conditional DECIMAL sums in ONE map-side
    * aggregate (no second scan, no join); pooled sums are their exact
    * decimal totals. Each segment SSR evaluates as the fixed tree
    * `(Cyy − Cxy²/Cxx)/n` on once-cast centered sums, so the oracle
    * replays bit-identically. NULL when either segment has < 3 rows,
    * any segment (or pooled) time-variance ≤ 0, or the residual
    * denominator is ≤ 0. Emits (keyCols…, `n_pre`, `n_post`,
    * `chow_f`). */
  def chowTest(df: DataFrame, yCol: String, tsCol: String,
               keyCols: Seq[String], breakDate: String,
               scale: Int = 0): DataFrame = {
    require(keyCols.nonEmpty, "chowTest needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_pre", "n_post", "chow_f", "__t", "__y", "__pre"),
      "Stats.chowTest")
    val t = datediff(col(tsCol).cast("date"), to_date(lit("1970-01-01")))
      .cast("long")
    val yi = round(col(yCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df
      .select((keyCols.map(col) :+ t.as("__t") :+ yi.as("__y")): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
      .withColumn("__pre",
        col("__t") < datediff(to_date(lit(breakDate)),
          to_date(lit("1970-01-01"))).cast("long"))
    def dseg(pre: Boolean, c: Column): Column =
      sum(when(col("__pre") === pre, c.cast("decimal(38,0)"))
        .otherwise(lit(0).cast("decimal(38,0)")))
    def seg(pre: Boolean): Seq[Column] = {
      val tag = if (pre) "a" else "b"
      Seq(
        sum(when(col("__pre") === pre, 1L).otherwise(0L)).as(s"__n_$tag"),
        dseg(pre, col("__t")).as(s"__st_$tag"),
        dseg(pre, col("__y")).as(s"__sy_$tag"),
        dseg(pre, col("__t").cast("decimal(38,0)") * col("__t"))
          .as(s"__stt_$tag"),
        dseg(pre, col("__t").cast("decimal(38,0)") * col("__y"))
          .as(s"__sty_$tag"),
        dseg(pre, col("__y").cast("decimal(38,0)") * col("__y"))
          .as(s"__syy_$tag"))
    }
    val sums = base.groupBy(keyCols.map(col): _*)
      .agg((seg(pre = true) ++ seg(pre = false)).head,
        (seg(pre = true) ++ seg(pre = false)).tail: _*)
    // per-segment SSR from n-multiplied centered sums, as a fixed tree
    def ssr(n: Column, st: Column, sy: Column, stt: Column, sty: Column,
            syy: Column): (Column, Column) = {
      val nDec = n.cast("decimal(38,0)")
      val ctt = (nDec * stt - st * st).cast("double")
      val cty = (nDec * sty - st * sy).cast("double")
      val cyy = (nDec * syy - sy * sy).cast("double")
      val safeCtt = when(ctt > 0.0, ctt)
      (when(n >= 3L, (cyy - cty * cty / safeCtt) / n.cast("double")),
        safeCtt)
    }
    def sc(tag: String, p: String): Column = col(s"__$p" + "_" + tag)
    val (ssrA, _) = ssr(sc("a", "n"), sc("a", "st"), sc("a", "sy"),
      sc("a", "stt"), sc("a", "sty"), sc("a", "syy"))
    val (ssrB, _) = ssr(sc("b", "n"), sc("b", "st"), sc("b", "sy"),
      sc("b", "stt"), sc("b", "sty"), sc("b", "syy"))
    val nP = sc("a", "n") + sc("b", "n")
    val (ssrP, _) = ssr(nP, sc("a", "st") + sc("b", "st"),
      sc("a", "sy") + sc("b", "sy"), sc("a", "stt") + sc("b", "stt"),
      sc("a", "sty") + sc("b", "sty"), sc("a", "syy") + sc("b", "syy"))
    val df2 = (nP - lit(4L)).cast("double")
    val denom = (ssrA + ssrB) / when(df2 > 0.0, df2)
    val f = ((ssrP - ssrA - ssrB) / lit(2.0)) /
      when(denom > 0.0, denom)
    sums.select((keyCols.map(col) :+
      sc("a", "n").as("n_pre") :+ sc("b", "n").as("n_post") :+
      f.as("chow_f")): _*)
  }

  def bhAdjust(df: DataFrame, familyCols: Seq[String], pCol: String,
               tieCol: String, alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    Guards.requireNoReserved(df.columns,
      Seq("p_rank", "p_adj", "significant", "__m"), "Stats.bhAdjust")
    val p = col(pCol).cast("double")
    val famW = org.apache.spark.sql.expressions.Window
      .partitionBy(familyCols.map(col): _*)
    val ordW = famW.orderBy(p.asc_nulls_last, col(tieCol))
    // suffix-min in ascending order ≡ running min in descending order
    val revW = famW.orderBy(p.desc_nulls_first, col(tieCol).desc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__m", count(p).over(famW))
      .withColumn("p_rank", when(p.isNotNull, row_number().over(ordW)))
      .withColumn("p_adj",
        when(p.isNotNull, least(lit(1.0),
          min(when(p.isNotNull,
            (p * col("__m").cast("double")) / col("p_rank").cast("double")))
            .over(revW))))
      .withColumn("significant",
        when(p.isNotNull, col("p_adj") <= lit(alpha)))
      .drop("__m")
  }
}
