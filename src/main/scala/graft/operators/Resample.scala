package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar densification: give every key a row for EVERY date between
  * its first and last observation — the regular-grid repair in front of
  * window indicators, whose row frames silently treat a 3-day gap as one
  * tick. Compose with [[Rolling.ffill]] to carry values across the
  * injected gap rows.
  *
  * Scale shape: one map-side-combinable min/max agg per key (a tiny spans
  * frame), one `sequence` + `explode` to generate the spine (spine size =
  * Σ key spans in DAYS — bounded by keys × calendar, independent of tick
  * count), and one left equi-join of spine to data on (key, date). The
  * join shuffles both sides on the same key — at 100 TB the spine side is
  * the small one; AQE picks the strategy. Dates only by design:
  * a second-granular spine would explode the row count, and sub-day grids
  * belong to the streaming window path.
  */
object Resample {

  /** Left-join a per-key daily date spine onto `df`. Every column of a
    * missing day's row is NULL except the keys and `dateCol`. */
  def densify(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    Guards.requireNoReserved(df.columns, Seq("__lo", "__hi"), "Resample.densify")
    val spans = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    // Explicit width below the explode (the winnow-ingest precedent, guide
    // §2.5): spans is |keys| rows and AQE coalesces its exchange to one
    // partition by BYTES, blind to the |days|-per-key fan-out the sequence
    // explode is about to apply — measured at sf0.1, the spine generation
    // plus probe join ran as two single-task 1.0-1.3 s straggler jobs.
    // ROUND-ROBIN at the session's shuffle width (scale-adaptive, not a
    // constant): a keyed repartition on the group keys is collapsed into
    // the aggregate's identical exchange and then coalesced away, and
    // round-robin additionally spreads the fan-out evenly even when one
    // key's span dwarfs the others (the 1000-row local sort it pays —
    // sortBeforeRepartition — is noise at |keys| cardinality).
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val spine = spans.repartition(width).select(
      keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as(dateCol): _*)
    spine.join(df, keyCols :+ dateCol, "left")
  }

  /** Day-of-week seasonal profile + deseasonalization — the STL-lite
    * weekday-effect correction every daily operational series needs
    * before drift/anomaly screens (a Sunday dip is seasonality, not an
    * incident): per (key, dow) the mean of `valueCol`, and per row the
    * additive residual `x − dow_mean` as `<valueCol>_deseason`.
    *
    * One map-side-combinable (key, dow) aggregation (≤ 7 rows per key)
    * broadcast back onto the scan — the [[graft.operators.Anomaly]]
    * stats shape, no window anywhere. On integer-valued metrics the
    * (n, Σx) sums are exact in any order and the mean/residual are
    * fixed IEEE trees — bit-replayable. `dow` uses Spark `dayofweek`
    * (1=Sunday…7=Saturday; the NOTES.md cross-engine mapping). */
  def dowProfile(df: DataFrame, valueCol: String, dateCol: String,
                 keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "dowProfile needs at least one key column")
    val out = s"${valueCol}_deseason"
    Guards.requireNoReserved(df.columns,
      Seq("dow", "dow_mean", out, "__n", "__s"), "Resample.dowProfile")
    val x = col(valueCol).cast("double")
    val withDow = df.withColumn("dow", dayofweek(col(dateCol)))
    val stats = withDow.groupBy((keyCols :+ "dow").map(col): _*)
      .agg(count(x).as("__n"), sum(x).as("__s"))
      .select((keyCols :+ "dow").map(col) :+
        (col("__s") / col("__n").cast("double")).as("dow_mean"): _*)
    withDow.join(broadcast(stats), keyCols :+ "dow")
      .withColumn(out, x - col("dow_mean"))
  }

  /** Per-key linear time interpolation of NULL gaps — the proportional
    * repair between [[Rolling.ffill]] (step-carry, biased on trends) and
    * dropping the row: a NULL at time t between surrounding non-null
    * observations (t₀, v₀) and (t₁, v₁) becomes
    * `v₀ + (v₁ − v₀) · (t − t₀)/(t₁ − t₀)`, time-weighted so an
    * off-center gap row lands proportionally, not halfway. Leading and
    * trailing NULLs (no surrounding pair) stay NULL — interior repair
    * only, by design; compose with [[Rolling.ffill]] for edge carry.
    *
    * Exactness: `ordCol` must be integral (epoch micros/nanos, or the
    * [[densify]] date cast to days) so the time deltas are exact longs;
    * the interpolation is then ONE fixed IEEE tree per row (one exact-
    * rounded division, multiply, add) — engine-replayable with no
    * rounding step. Requires a TOTAL order: `ordCol` must be distinct
    * per key (densified grids are), or a tied frame boundary is
    * layout-dependent.
    *
    * Plan: one keyed exchange, two frame passes on the same sort
    * (backward last-non-null, forward first-non-null) carrying (t, v)
    * structs so the timestamp and value always come from the SAME
    * anchor row. Appends `<valueCol>_interp`. */
  def interpolate(df: DataFrame, keyCols: Seq[String], ordCol: String,
                  valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "interpolate needs at least one key column")
    val out = s"${valueCol}_interp"
    Guards.requireNoReserved(df.columns,
      Seq(out, "__prev", "__next"), "Resample.interpolate")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val anchor = when(v.isNotNull,
      struct(col(ordCol).cast("long").as("t"), v.cast("double").as("v")))
    val back = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // first-non-null FOLLOWING ≡ last-non-null preceding in the REVERSED
    // order: Spark executes unbounded-following frames by rescanning the
    // tail per row (O(n²) per key — measured 8.3 s on the sf0.1 bars),
    // while both passes as running frames are the O(n) sliding
    // accumulator (one extra in-partition sort, no extra exchange)
    val fwdRev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withAnchors = df
      .withColumn("__prev", last(anchor, ignoreNulls = true).over(back))
      .withColumn("__next", last(anchor, ignoreNulls = true).over(fwdRev))
    val t = col(ordCol).cast("long")
    val p = col("__prev")
    val nx = col("__next")
    val interp = p.getField("v") +
      (nx.getField("v") - p.getField("v")) *
        ((t - p.getField("t")).cast("double") /
          (nx.getField("t") - p.getField("t")).cast("double"))
    withAnchors
      .withColumn(out,
        when(v.isNotNull, v.cast("double"))
          .otherwise(when(p.isNotNull && nx.isNotNull, interp)))
      .drop("__prev", "__next")
  }

  /** Classical additive seasonal decomposition per key (the
    * moving-average method behind every `decompose()` call — public
    * textbook algorithm): `x_t = trend_t + seasonal_(t mod p) + resid_t`
    * over the key's row sequence with period `p`. Trend is the centered
    * p-MA (the 2×p weighted MA when p is even); the seasonal component
    * is the phase mean of the detrended series, centered to sum to zero
    * across phases. Choose `p` from [[Rolling.harmonicPower]]'s argmax.
    *
    * Exactness: x quantizes to scaled BIGINTs and the trend numerator is
    * an INTEGER window sum (odd p: Σ of p values, D = p; even p: 1-2-…-
    * 2-1 weights, D = 2p), so `detrend_num = D·x − N` is exact; phase
    * means accumulate the integer numerators as DECIMAL (exact in any
    * order) with ONE double division each; the phase-mean centering
    * folds the ≤ p phase means in ascending-phase order (doubles — the
    * pinned-order fold, p is tiny); trend/seasonal/resid are then fixed
    * IEEE trees per row. NULL values are dropped before sequencing
    * (frozen≡filtered); trend and resid are NULL on the p/2-row edges
    * where the centered frame is incomplete (those rows still carry
    * their phase's seasonal).
    *
    * Plan: one keyed sort (row_number + the centered frame sum ride it),
    * one (key, phase) aggregate (keys×p rows), one key-level fold of
    * that tiny frame, two small joins back (key, phase) and (key) — the
    * corpus is exchanged once. Emits the input keys/order plus
    * (`phase`, `value`, `trend`, `seasonal`, `resid`). */
  /** Seasonal and trend STRENGTH per key (public formulation, Hyndman &
    * Athanasopoulos): on a [[seasonalDecompose]] output frame,
    * `F_s = max(0, 1 − Var(R)/Var(S+R))` and
    * `F_t = max(0, 1 − Var(R)/Var(T+R))` — one number each for "how
    * seasonal / how trended is this series", the triage that decides
    * whether a seasonal model is worth fitting.
    *
    * Determinism: the decomposition's component doubles re-quantize at
    * `scale` decimals so every variance is the exact n-multiplied
    * integer form `n·Σx² − (Σx)²` (one combinable aggregate, no float
    * re-summation); each strength is one fixed tree (the n factors
    * cancel in the ratio). Rows with a NULL trend (the 2×MA warm-up)
    * drop — the standard STL-strength convention. NULL strengths when
    * the denominator variance is 0. Emits (keyCols…, `n`,
    * `seasonal_strength`, `trend_strength`). */
  def seasonalStrength(decomposed: DataFrame, keyCols: Seq[String],
                       scale: Int = 4): DataFrame = {
    require(keyCols.nonEmpty,
      "seasonalStrength needs at least one key column")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(
      decomposed.columns.filterNot(Seq("trend", "seasonal", "resid")
        .contains),
      Seq("n", "seasonal_strength", "trend_strength", "__r", "__sr",
        "__tr"), "Resample.seasonalStrength")
    def q(c: Column): Column =
      round(c.cast("double") * lit(math.pow(10, scale))).cast("long")
    val base = decomposed
      .filter(col("trend").isNotNull && col("resid").isNotNull)
      .select((keyCols.map(col) :+ q(col("resid")).as("__r") :+
        q(col("seasonal") + col("resid")).as("__sr") :+
        q(col("trend") + col("resid")).as("__tr")): _*)
    def cvar(c: String): Column = {
      val nDec = count(lit(1)).cast("decimal(38,0)")
      (nDec * sum(col(c).cast("decimal(38,0)") * col(c)) -
        sum(col(c).cast("decimal(38,0)")) * sum(col(c))).cast("double")
    }
    val sums = base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      cvar("__r").as("__vr"), cvar("__sr").as("__vsr"),
      cvar("__tr").as("__vtr"))
    def strength(den: Column): Column =
      when(den > 0.0,
        greatest(lit(0.0), lit(1.0) - col("__vr") / den))
    sums.select((keyCols.map(col) :+ col("n") :+
      strength(col("__vsr")).as("seasonal_strength") :+
      strength(col("__vtr")).as("trend_strength")): _*)
  }

  def seasonalDecompose(df: DataFrame, valueCol: String, keyCols: Seq[String],
                        orderCols: Seq[String], period: Int,
                        scale: Int = 0): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("phase", "value", "trend", "seasonal", "resid",
        "__x", "__n", "__dn", "__sm", "__adj"), "Resample.seasonalDecompose")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val half = period / 2
    val frameW = w.rowsBetween(-half, half)
    val dBig = if (period % 2 == 0) 2L * period else period.toLong
    val base0 = df.filter(xi.isNotNull)
      .select((keyCols.map(col) ++ orderCols.map(col)) :+ xi.as("__x") :+
        ((row_number().over(w) - lit(1)).cast("long") % lit(period.toLong))
          .cast("int").as("phase"): _*)
    // integer trend numerator over the centered frame; NULL unless the
    // frame holds its full 2·half+1 rows
    val full = count(col("__x")).over(frameW) === (2 * half + 1)
    val num =
      if (period % 2 == 0)
        // 1,2,2,…,2,1 over ±half: 2·Σframe − first − last
        lit(2L) * sum(col("__x")).over(frameW) -
          first(col("__x")).over(frameW) - last(col("__x")).over(frameW)
      else sum(col("__x")).over(frameW)
    val base = base0.withColumn("__n", when(full, num))
      .withColumn("__dn", lit(dBig) * col("__x") - col("__n"))
    val phaseMeans = base.groupBy((keyCols.map(col) :+ col("phase")): _*)
      .agg((sum(col("__dn").cast("decimal(38,0)")).cast("double") /
        (count(col("__dn")).cast("double") * lit(dBig.toDouble)))
        .as("__sm"))
    // center: subtract the mean of the phase means (ascending-phase fold);
    // phases with no full-frame row (series shorter than p+1) have a NULL
    // mean and are excluded from the centering rather than poisoning it
    val adj = phaseMeans.filter(col("__sm").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg((aggregate(
        transform(sort_array(collect_list(struct(col("phase"), col("__sm")))),
          e => e("__sm")),
        lit(0.0), (a, b) => a + b) /
        count(lit(1)).cast("double")).as("__adj"))
    val descale = lit(math.pow(10, scale))
    base
      .join(phaseMeans, keyCols :+ "phase")
      .join(adj, keyCols, "left")
      .select((keyCols.map(col) ++ orderCols.map(col)) :+ col("phase") :+
        (col("__x").cast("double") / descale).as("value") :+
        (col("__n").cast("double") / lit(dBig.toDouble) / descale)
          .as("trend") :+
        ((col("__sm") - col("__adj")) / descale).as("seasonal") :+
        (((col("__x").cast("double") * lit(dBig.toDouble) -
          col("__n").cast("double")) / lit(dBig.toDouble) -
          (col("__sm") - col("__adj"))) / descale).as("resid"): _*)
  }
}
