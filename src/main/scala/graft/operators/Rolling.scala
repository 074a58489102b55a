package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling robust statistics over trailing row frames — the composition
  * companions to the native SMA/EMA/RSI/MACD window indicators
  * ([[graft.functions.WindowIndicators]]): a rolling median (the
  * outlier-immune moving average) and Bollinger bands (mean ± k·σ
  * envelope, Bollinger's public technique).
  *
  * Both follow the indicator null contract: NULL until the trailing frame
  * is full. Both are single keyed Window passes — one hash exchange on the
  * partition key, the frame never leaves its partition, same 100 TB cost
  * shape as any indicator.
  *
  * Determinism note: the band arithmetic is an explicit IEEE tree over two
  * window MEANS (`sqrt(avg(x²) − avg(x)²)`, population σ) rather than an
  * engine's `var_pop`/`stddev` — variance implementations differ in update
  * order (Welford vs sums, segment-tree reassociation in sliding frames),
  * but on integer-valued metrics the two plain sums are exact under ANY
  * association order, so any engine replays the bands bit-for-bit. On
  * general doubles the usual parallel-sum last-ulp caveat applies, and
  * `avg(x²) − avg(x)²` can go fractionally negative — the gate metric is
  * integer-valued, where both risks vanish.
  */
object Rolling {

  private def frame(partCols: Seq[String], orderCols: Seq[String], n: Int) =
    Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)

  /** Trailing-n rolling MEDIAN: exact `percentile(0.5)` over the frame.
    * Use an odd `n` for an interpolation-free (element-exact) median.
    * O(w log w) per row locally — fine at indicator window sizes. Adds
    * `roll_median`. */
  def median(df: DataFrame, valueCol: String, partCols: Seq[String],
             orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns, Seq("roll_median"), "Rolling.median")
    val w = frame(partCols, orderCols, n)
    val x = col(valueCol).cast("double")
    df.withColumn("roll_median",
      when(count(x).over(w) === n, percentile(x, lit(0.5)).over(w)))
  }

  /** Bollinger bands: `bb_mid` = trailing-n mean, `bb_upper`/`bb_lower` =
    * mid ± k·σ with σ = `sqrt(avg(x²) − mean²)` (population form; see the
    * determinism note above). */
  def bollinger(df: DataFrame, valueCol: String, partCols: Seq[String],
                orderCols: Seq[String], n: Int, k: Double): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(k > 0, s"band width multiplier must be positive, got $k")
    Guards.requireNoReserved(df.columns,
      Seq("bb_mid", "bb_upper", "bb_lower", "__bb_n", "__bb_m", "__bb_m2"),
      "Rolling.bollinger")
    val w = frame(partCols, orderCols, n)
    val x = col(valueCol).cast("double")
    // stage the three frame aggregates once (one Window pass with three
    // buffers); inlining them into the three band trees expanded to 12
    // window expressions — each a separate per-row re-fold of the frame
    val staged = df.select(col("*"),
      count(x).over(w).as("__bb_n"),
      avg(x).over(w).as("__bb_m"),
      avg(x * x).over(w).as("__bb_m2"))
    val full = col("__bb_n") === n
    val mean = col("__bb_m")
    val dev = sqrt(col("__bb_m2") - mean * mean)
    staged.select(col("*"),
      when(full, mean).as("bb_mid"),
      when(full, mean + lit(k) * dev).as("bb_upper"),
      when(full, mean - lit(k) * dev).as("bb_lower"))
      .drop("__bb_n", "__bb_m", "__bb_m2")
  }

  /** Stochastic oscillator (Lane's %K/%D, public formula): `%K = 100 ·
    * (x − min_n) / (max_n − min_n)` over the trailing n-row frame, `%D` =
    * 3-period simple average of %K. NULL until the %K frame fills (%D
    * additionally needs two prior %K rows); a flat window (max = min)
    * yields NULL %K — there is no momentum direction to report.
    *
    * Determinism: min/max are exact selections, so %K is one fixed IEEE
    * tree; %D is written as `(K + lag(K,1) + lag(K,2)) / 3` — an explicit
    * left-to-right sum, engine-identical where a windowed `avg` of
    * arbitrary doubles is association-order-sensitive (see the VWAP
    * note). Adds `pct_k`, `pct_d`. */
  def stochastic(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("pct_k", "pct_d", "__st_n", "__st_lo", "__st_hi"),
      "Rolling.stochastic")
    val w = frame(partCols, orderCols, n)
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("double")
    // stage the frame extremes once — sliding min/max are non-invertible
    // (full re-fold per row), so each inlined duplicate doubled that work
    val staged = df.select(col("*"),
      count(x).over(w).as("__st_n"),
      min(x).over(w).as("__st_lo"),
      max(x).over(w).as("__st_hi"))
    val (lo, hi) = (col("__st_lo"), col("__st_hi"))
    val k = when(col("__st_n") === n && hi =!= lo,
      lit(100.0) * (x - lo) / (hi - lo))
    val withK = staged.select(col("*"), k.as("pct_k"))
      .drop("__st_n", "__st_lo", "__st_hi")
    withK.select(col("*"),
      ((col("pct_k") + lag(col("pct_k"), 1).over(seqW)
        + lag(col("pct_k"), 2).over(seqW)) / lit(3.0)).as("pct_d"))
  }

  /** On-balance volume (Granville, public formula): running total of
    * volume signed by the price direction — `+vol` on an up-tick, `−vol`
    * on a down-tick, 0 on a flat tick or the first row. The classic
    * volume-flow confirmation signal for price moves.
    *
    * Determinism: volume is quantized to `volScale` decimals and the
    * running total is a BIGINT sum (exact in any engine under any
    * accumulation order); the single final descale division is IEEE.
    * A volume that rounds to zero at `volScale` contributes 0 to the
    * running total regardless of price direction — a deliberate no-op
    * tick, matching the signed-volume definition (raise `volScale` if
    * sub-unit volumes must count). One keyed window pass (lag + running
    * sum share the partition). Adds `obv` (DOUBLE, in volume units). */
  def obv(df: DataFrame, priceCol: String, volCol: String,
          partCols: Seq[String], orderCols: Seq[String],
          volScale: Int = 0): DataFrame = {
    require(volScale >= 0)
    Guards.requireNoReserved(df.columns, Seq("obv", "__obv_pp"), "Rolling.obv")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val running = seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = col(priceCol).cast("double")
    val vInt = round(col(volCol).cast("double") * lit(math.pow(10, volScale)))
      .cast("long")
    // stage the lag once — the sign tree referenced it 3×
    val prev = col("__obv_pp")
    val signed = when(prev.isNull, lit(0L))
      .when(p > prev, vInt)
      .when(p < prev, -vInt)
      .otherwise(lit(0L))
    df.withColumn("__obv_pp", lag(p, 1).over(seqW))
      .withColumn("obv",
        sum(signed).over(running).cast("double") / lit(math.pow(10, volScale)))
      .drop("__obv_pp")
  }

  /** Average true range (Wilder's volatility gauge, SMA form — public
    * formula) over OHLC bars such as [[Bars.ohlc]] produces: true range =
    * `greatest(high − low, |high − prev close|, |low − prev close|)` (the
    * plain `high − low` on each partition's first bar, where there is no
    * prior close), averaged over the trailing n-bar frame. NULL until the
    * frame fills.
    *
    * Determinism: TR is a fixed tree of exact selections and subtractions;
    * on integer-valued bars the window sum is exact under any association
    * order and only the final mean division runs in IEEE. One keyed Window
    * pass (lag and the trailing mean share the partition). Adds `atr`. */
  def atr(df: DataFrame, highCol: String, lowCol: String, closeCol: String,
          partCols: Seq[String], orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("atr", "graft_tr", "__atr_pc"), "Rolling.atr")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val (h, l, c) =
      (col(highCol).cast("double"), col(lowCol).cast("double"),
        col(closeCol).cast("double"))
    // stage the lag once — the TR tree referenced it 3×, each a separate
    // window expression after ExtractWindowExpressions
    val prevC = col("__atr_pc")
    val tr = when(prevC.isNull, h - l)
      .otherwise(greatest(h - l, abs(h - prevC), abs(l - prevC)))
    // TR must be bound in its own projection: the trailing avg's frame
    // cannot see a lag() computed in the same Window pass
    df.withColumn("__atr_pc", lag(c, 1).over(seqW))
      .withColumn("graft_tr", tr)
      .select(col("*"),
        when(count(col("graft_tr")).over(w) === n,
          avg(col("graft_tr")).over(w)).as("atr"))
      .drop("graft_tr", "__atr_pc")
  }

  /** Average Directional Index (Wilder's trend-strength oscillator,
    * public formula — the standard companion to RSI/ATR in the reference
    * family): `+DM`/`−DM` from consecutive high/low moves, TR as in
    * [[atr]], all three Wilder-smoothed by the NATIVE `wilder(x, n)`
    * recurrence window function; `DI± = 100·sm(±DM)/sm(TR)`,
    * `DX = 100·|DI⁺−DI⁻|/(DI⁺+DI⁻)` (0 where both DIs are 0), and
    * `adx = wilder(DX, n)` — so the first ADX emits after 2n−1 bars, the
    * textbook schedule.
    *
    * Plan shape: the lag exprs bind in one projection, the three Wilder
    * smoothings share the second Window pass, DX binds, and the final
    * smoothing is a third pass — ALL over the same (partition, order)
    * spec: one hash exchange, one sort. The whole chain is the
    * deterministic indicator state machine, NULL-frozen like every
    * recurrence here. Adds `di_plus`, `di_minus`, `adx`. */
  def adx(df: DataFrame, highCol: String, lowCol: String, closeCol: String,
          partCols: Seq[String], orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("di_plus", "di_minus", "adx", "__tr", "__pdm", "__mdm",
        "__str", "__spdm", "__smdm", "__dx",
        "__adx_pc", "__adx_ph", "__adx_pl"), "Rolling.adx")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (h, l, c) =
      (col(highCol).cast("double"), col(lowCol).cast("double"),
        col(closeCol).cast("double"))
    // stage the three lags once — the TR/±DM trees referenced each up to
    // 4×, expanding to 12 lag window expressions
    val lagged = df.select(col("*"),
      lag(c, 1).over(seqW).as("__adx_pc"),
      lag(h, 1).over(seqW).as("__adx_ph"),
      lag(l, 1).over(seqW).as("__adx_pl"))
    val (prevC, prevH, prevL) =
      (col("__adx_pc"), col("__adx_ph"), col("__adx_pl"))
    val tr = when(prevC.isNull, h - l)
      .otherwise(greatest(h - l, abs(h - prevC), abs(l - prevC)))
    val up = h - prevH
    val down = prevL - l
    // first bar has no move: ±DM are NULL there (frozen, not zero), so
    // the Wilder seeds count exactly the n move-bearing bars
    val pdm = when(prevH.isNotNull,
      when(up > down && up > lit(0.0), up).otherwise(lit(0.0)))
    val mdm = when(prevL.isNotNull,
      when(down > up && down > lit(0.0), down).otherwise(lit(0.0)))
    val trN = when(prevC.isNotNull, tr) // align TR count with the DM count
    val smoothed = lagged
      .withColumn("__tr", trN).withColumn("__pdm", pdm).withColumn("__mdm", mdm)
      .drop("__adx_pc", "__adx_ph", "__adx_pl")
      .select(col("*"),
        graft.functions.FinancialFunctions.wilder(col("__tr"), n).over(seqW)
          .as("__str"),
        graft.functions.FinancialFunctions.wilder(col("__pdm"), n).over(seqW)
          .as("__spdm"),
        graft.functions.FinancialFunctions.wilder(col("__mdm"), n).over(seqW)
          .as("__smdm"))
    val diP = lit(100.0) * col("__spdm") / col("__str")
    val diM = lit(100.0) * col("__smdm") / col("__str")
    val dx = when(col("__str").isNotNull,
      when(diP + diM === lit(0.0), lit(0.0))
        .otherwise(lit(100.0) * abs(diP - diM) / (diP + diM)))
    smoothed
      .withColumn("di_plus", diP)
      .withColumn("di_minus", diM)
      .withColumn("__dx", dx)
      .select(col("*"),
        graft.functions.FinancialFunctions.wilder(col("__dx"), n).over(seqW)
          .as("adx"))
      .drop("__tr", "__pdm", "__mdm", "__str", "__spdm", "__smdm", "__dx")
  }

  /** Per-bar returns: simple `(x − prev)/prev` and log `ln(x/prev)` —
    * the inputs every risk metric consumes. NULL on the first bar and on
    * a non-positive base (no return to report). The log return rounds to
    * 10 decimals at the SOURCE ([[graft.operators.Divergence]] `ln`
    * discipline), so every downstream fold — [[realizedVol]], Sharpe
    * compositions — accumulates bit-identical elements on any engine.
    * Adds `ret_simple`, `ret_log`. */
  def logReturns(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("ret_simple", "ret_log", "__lr_p"), "Rolling.logReturns")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("double")
    // stage the lag once — its 7 inlined references each became their
    // own window expression
    val staged = df.select(col("*"), lag(x, 1).over(seqW).as("__lr_p"))
    val prev = col("__lr_p")
    staged.withColumn("ret_simple",
        when(prev.isNotNull && prev > 0.0, (x - prev) / prev))
      .withColumn("ret_log",
        when(prev.isNotNull && prev > 0.0 && x > 0.0,
          round(log(x / prev), 10) + lit(0.0)))
      .drop("__lr_p")
  }

  /** Realized (historical) volatility: the sample standard deviation of
    * the trailing `n` returns, scaled by `annualize` (pass
    * `sqrt(252)` for daily→annual; 1.0 for raw). NULL until `n` returns
    * fill the n-row frame (a leading return-less bar just delays the
    * first emission). The [[cci]] fold discipline: the BOUNDED frame's
    * returns collect in window order, mean and squared-deviation sums
    * are left folds — never a windowed `stddev` (whose update order no
    * other engine replays), never an unbounded cumulative list. Adds
    * `rvol`. */
  def realizedVol(df: DataFrame, retCol: String, partCols: Seq[String],
                  orderCols: Seq[String], n: Int,
                  annualize: Double = 1.0): DataFrame = {
    require(n >= 2, s"need >= 2 returns for a sample stddev, got $n")
    require(annualize > 0.0, s"annualize must be positive, got $annualize")
    Guards.requireNoReserved(df.columns,
      Seq("rvol", "__rets", "__mu"), "Rolling.realizedVol")
    def fold(lst: org.apache.spark.sql.Column,
             term: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(lst, term), lit(0.0), (acc, x) => acc + x)
    val w = frame(partCols, orderCols, n)
    val r = col(retCol).cast("double")
    df.withColumn("__rets",
        when(count(r).over(w) === n, collect_list(r).over(w)))
      .withColumn("__mu", fold(col("__rets"), x => x) / lit(n.toDouble))
      .withColumn("rvol",
        sqrt(fold(col("__rets"),
            x => (x - col("__mu")) * (x - col("__mu"))) /
          lit(n - 1.0)) * lit(annualize))
      .drop("__rets", "__mu")
  }

  /** Per-key performance summary — ONE ROW PER KEY from its full return
    * series: `n_returns`, `total_ret` (sum of log returns = log of the
    * period growth factor), `mean_ret`, `vol` (sample stddev ·
    * `annualize`), and `sharpe` (mean/stddev · `annualize`, NULL on zero
    * vol). The portfolio-screen companion to the rolling metrics.
    *
    * Determinism: the series folds in `orderCols` order (collected per
    * key — state is the series length, the per-key scale unit like every
    * keyed recurrence here); mean/stddev/sharpe are fixed IEEE trees on
    * the folded sums. Feed [[logReturns]]' source-rounded `ret_log` so
    * the folded elements are engine-identical. */
  def perfSummary(df: DataFrame, retCol: String, partCols: Seq[String],
                  orderCols: Seq[String],
                  annualize: Double = 1.0): DataFrame = {
    require(annualize > 0.0, s"annualize must be positive, got $annualize")
    Guards.requireNoReserved(df.columns,
      Seq("n_returns", "total_ret", "mean_ret", "vol", "sharpe", "__ts",
        "__mu"), "Rolling.perfSummary")
    def fold(lst: org.apache.spark.sql.Column,
             term: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(lst, term), lit(0.0), (acc, x) => acc + x)
    val r = col(retCol).cast("double")
    val grouped = df.filter(r.isNotNull)
      .groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_returns"),
        transform(
          sort_array(collect_list(struct(orderCols.map(col) :+
            r.as("__r"): _*))),
          t => t.getField("__r")).as("__ts"))
    val n = col("n_returns").cast("double")
    val total = fold(col("__ts"), x => x)
    val mu = col("__mu")
    val sd = sqrt(fold(col("__ts"), x => (x - mu) * (x - mu)) / (n - 1.0))
    grouped
      .withColumn("total_ret", total)
      .withColumn("__mu", col("total_ret") / n)
      .withColumn("mean_ret", col("__mu"))
      .withColumn("vol",
        when(col("n_returns") >= 2L, sd * lit(annualize)))
      .withColumn("sharpe",
        when(col("n_returns") >= 2L && sd > 0.0,
          col("__mu") / sd * lit(annualize)))
      .drop("__ts", "__mu")
  }

  /** Per-key downside risk-ratio battery (public formulas): Sortino
    * (mean over DOWNSIDE deviation — the Sharpe that doesn't punish
    * upside), Omega at threshold 0 (gross gains over gross losses), and
    * Calmar (total return over maximum drawdown, both in log-return
    * space).
    *
    * Exactness — no folds needed anywhere: returns are 10-dp quantized
    * ([[logReturns]]' rounding), so they scale to exact BIGINTs; the
    * drawdown path is two integer window passes (running cumsum, running
    * peak — the [[drawdown]]/cusum shape); gains/losses are conditional
    * BIGINT sums; the squared-downside sum rides DECIMAL(38,0). Each
    * ratio is scale-invariant, so the quantization factor cancels and
    * the final trees run once in doubles. Conventions documented: Omega
    * threshold = 0; downside deviation divides by ALL n returns; Calmar
    * is total-over-maxdd (annualize externally if needed). NULL rails:
    * Sortino on zero downside, Omega on zero losses, Calmar on a
    * drawdown-free series. One keyed exchange (windows + agg share the
    * key). Emits (partCols…, `n_returns`, `total_ret`, `sortino`,
    * `omega`, `calmar`). */
  def riskRatios(df: DataFrame, retCol: String, partCols: Seq[String],
                 orderCols: Seq[String], annualize: Double = 1.0): DataFrame = {
    require(annualize > 0.0, s"annualize must be positive, got $annualize")
    Guards.requireNoReserved(df.columns,
      Seq("n_returns", "total_ret", "sortino", "omega", "calmar",
        "__ri", "__cum", "__dd"), "Rolling.riskRatios")
    val k = 1e10 // matches logReturns' 10-dp rounding
    val running = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ri = round(col(retCol).cast("double") * lit(k)).cast("long")
    val sums = df.filter(col(retCol).isNotNull)
      .withColumn("__ri", ri)
      .withColumn("__cum", sum(col("__ri")).over(running))
      .withColumn("__dd", max(col("__cum")).over(running) - col("__cum"))
      .groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_returns"),
        sum(col("__ri")).as("__s"),
        sum(greatest(col("__ri"), lit(0L))).as("__g"),
        sum(greatest(-col("__ri"), lit(0L))).as("__l"),
        // the square must go decimal BEFORE multiplying — ri ~ 4e10 on
        // extreme ratios, so ri² overflows a long
        sum(when(col("__ri") < 0L,
            col("__ri").cast("decimal(38,0)") * col("__ri"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__d"),
        max(col("__dd")).as("__mdd"))
    val nD = col("n_returns").cast("double")
    val muS = col("__s").cast("double") / nD
    val ddS = sqrt(col("__d").cast("double") / nD)
    sums.select((partCols.map(col) :+ col("n_returns") :+
      (col("__s").cast("double") / lit(k)).as("total_ret") :+
      when(col("n_returns") >= 2L && ddS > 0.0,
        muS / ddS * lit(annualize)).as("sortino") :+
      when(col("__l") > 0L,
        col("__g").cast("double") / col("__l").cast("double")).as("omega") :+
      when(col("__mdd") > 0L,
        col("__s").cast("double") / col("__mdd").cast("double"))
        .as("calmar")): _*)
  }

  /** Stochastic RSI (Chande & Kroll 1994, public formula): the
    * stochastic oscillator APPLIED TO the RSI series —
    * `(rsi − min_n(rsi)) / (max_n(rsi) − max−min)` in [0, 1] — momentum
    * of momentum, faster than either parent. The RSI layer is the
    * native recurrence; the stochastic layer is exact selections over
    * its bound column (identical doubles in both engines, so the
    * min/max pick identical values). NULL through the RSI warm-up,
    * until the stochastic frame holds n RSI values, and on a flat RSI
    * window. Both layers share one (partition, order) spec. Adds
    * `stoch_rsi`. */
  def stochRsi(df: DataFrame, valueCol: String, partCols: Seq[String],
               orderCols: Seq[String], rsiN: Int = 14,
               stochN: Int = 14): DataFrame = {
    require(rsiN >= 1 && stochN >= 1)
    Guards.requireNoReserved(df.columns,
      Seq("stoch_rsi", "__srsi", "__sr_n", "__sr_lo", "__sr_hi"),
      "Rolling.stochRsi")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, stochN)
    // stage the frame extremes once (sliding min/max re-fold per row —
    // inlined duplicates doubled the fold)
    df.withColumn("__srsi", graft.functions.FinancialFunctions
        .rsi(col(valueCol).cast("double"), rsiN).over(seqW))
      .select(col("*"),
        count(col("__srsi")).over(w).as("__sr_n"),
        min(col("__srsi")).over(w).as("__sr_lo"),
        max(col("__srsi")).over(w).as("__sr_hi"))
      .select(col("*"), {
        val (lo, hi) = (col("__sr_lo"), col("__sr_hi"))
        when(col("__sr_n") === stochN && hi =!= lo,
          (col("__srsi") - lo) / (hi - lo)).as("stoch_rsi")
      })
      .drop("__srsi", "__sr_n", "__sr_lo", "__sr_hi")
  }

  /** True Strength Index (Blau 1991, public formula): double-smoothed
    * momentum — `100 · ema₁₃(ema₂₅(Δx)) / ema₁₃(ema₂₅(|Δx|))` — a
    * momentum oscillator with two EMA layers of noise removed, bounded
    * by ±100. All four EMA layers are the native recurrence over bound
    * columns on ONE sort; each key's first row has no Δ, and the
    * frozen-NULL contract absorbs it exactly as in
    * [[forceIndex]]. NULL on a zero double-smoothed absolute momentum
    * (a constant series has no strength to report). Adds `tsi`. */
  def tsi(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], slow: Int = 25, fast: Int = 13): DataFrame = {
    require(slow >= 1 && fast >= 1)
    Guards.requireNoReserved(df.columns,
      Seq("tsi", "__m", "__ma", "__e1", "__e1a", "__e2", "__e2a"),
      "Rolling.tsi")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ema25 = graft.functions.FinancialFunctions.ema(_: Column, slow)
    val ema13 = graft.functions.FinancialFunctions.ema(_: Column, fast)
    val x = col(valueCol).cast("double")
    df.withColumn("__m", x - lag(x, 1).over(seqW))
      .withColumn("__ma", abs(col("__m")))
      .select(col("*"),
        ema25(col("__m")).over(seqW).as("__e1"),
        ema25(col("__ma")).over(seqW).as("__e1a"))
      .select(col("*"),
        ema13(col("__e1")).over(seqW).as("__e2"),
        ema13(col("__e1a")).over(seqW).as("__e2a"))
      .withColumn("tsi",
        when(col("__e2a") =!= 0.0, lit(100.0) * col("__e2") / col("__e2a")))
      .drop("__m", "__ma", "__e1", "__e1a", "__e2", "__e2a")
  }

  /** Connors RSI (Connors & Alvarez 2012, public formula): the
    * three-component mean-reversion composite
    * `crsi = (rsi₃(close) + rsi₂(streak) + pctRank₁₀₀(ret)) / 3` where
    *
    *  - `streak` is the SIGNED consecutive up/down run length (an equal
    *    close — and each key's first bar — resets it to 0), computed
    *    DECLARATIVELY via the gaps-and-islands identity (`rn` minus the
    *    per-direction `rn` is constant along a run) — pure integer
    *    windows, no new recurrence;
    *  - both RSIs are the native recurrence (the streak one over the
    *    derived integer series);
    *  - `pctRank` is the count of the PRIOR `rankN` returns strictly
    *    below today's (10-dp log returns — exact doubles), an integer
    *    count that IS the percentage when rankN = 100.
    *
    * NULL until every component is live (rsi warm-ups + a full prior
    * rank window). All windows share one (partition, order) sort
    * prefix; the direction/island partitions only refine it. Adds
    * `streak`, `pct_rank`, `crsi`. */
  def connorsRsi(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String], rsiN: Int = 3, streakN: Int = 2,
                 rankN: Int = 100): DataFrame = {
    require(rsiN >= 1 && streakN >= 1 && rankN >= 1)
    Guards.requireNoReserved(df.columns,
      Seq("streak", "pct_rank", "crsi", "__d", "__rn", "__rnd", "__isl",
        "__pos", "__ret", "__rl", "__r3", "__rs", "__prev"),
      "Rolling.connorsRsi")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    def keyedW(extra: String*) =
      Window.partitionBy((partCols ++ extra).map(col): _*)
        .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("double")
    // stage the lag once — __d and __ret referenced it 5× combined
    val prev = col("__prev")
    val rankW = seqW.rowsBetween(-rankN, -1)
    df.withColumn("__prev", lag(x, 1).over(seqW))
      .withColumn("__d",
        when(prev.isNull, lit(0)).otherwise(signum(x - prev).cast("int")))
      .withColumn("__ret",
        when(prev.isNotNull && prev > 0.0 && x > 0.0,
          round(log(x / prev), 10) + lit(0.0)))
      .withColumn("__rn", row_number().over(seqW))
      .withColumn("__rnd", row_number().over(keyedW("__d")))
      .withColumn("__isl", col("__rn") - col("__rnd"))
      .withColumn("__pos", row_number().over(keyedW("__d", "__isl")))
      .withColumn("streak",
        when(col("__d") === 0, lit(0L))
          .otherwise(col("__d").cast("long") * col("__pos")))
      .select(col("*"),
        graft.functions.FinancialFunctions.rsi(x, rsiN).over(seqW).as("__r3"),
        graft.functions.FinancialFunctions
          .rsi(col("streak").cast("double"), streakN).over(seqW).as("__rs"),
        collect_list(col("__ret")).over(rankW).as("__rl"))
      .withColumn("pct_rank",
        when(size(col("__rl")) === rankN && col("__ret").isNotNull,
          size(filter(col("__rl"), e => e < col("__ret"))).cast("double")
            * lit(100.0) / lit(rankN.toDouble)))
      .withColumn("crsi",
        (col("__r3") + col("__rs") + col("pct_rank")) / lit(3.0))
      .drop("__d", "__rn", "__rnd", "__isl", "__pos", "__ret", "__rl",
        "__r3", "__rs", "__prev")
  }

  /** Rolling historical Value-at-Risk and Expected Shortfall over the
    * trailing `n` returns: `var_alpha = −quantile(returns, alpha)` (the
    * exact interpolated percentile — `quantile_cont` parity proven by
    * the quantile gates) and `es_alpha` = −mean of the
    * `k = max(1, floor(alpha·n))` WORST returns (the discrete-tail ES
    * convention: an integer cut, no interpolation ambiguity across
    * engines). NULL until the frame fills.
    *
    * ONE frame materialization serves both: the ascending-sorted frame
    * list is built once (`collect_list` + `sort_array`), the ES tail
    * folds over its first `k` elements ([[cci]] discipline), and VaR
    * interpolates INTO it — replicating Spark `percentile`'s linear
    * interpolation at indices that are compile-time constants, because
    * the value only emits on exactly-full frames (`count == n`). That
    * halves the per-row window buffering vs the naive
    * `percentile().over(w)` + `collect_list().over(w)` pair (which
    * buffers the same n-row frame twice per row). Adds `var_alpha`,
    * `es_alpha`. */
  def historicalVar(df: DataFrame, retCol: String, partCols: Seq[String],
                    orderCols: Seq[String], n: Int,
                    alpha: Double = 0.05): DataFrame = {
    require(n >= 2, s"window must be >= 2, got $n")
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    Guards.requireNoReserved(df.columns,
      Seq("var_alpha", "es_alpha", "__sorted"), "Rolling.historicalVar")
    val k = math.max(1, math.floor(alpha * n).toInt)
    val w = frame(partCols, orderCols, n)
    val r = col(retCol).cast("double")
    // Spark Percentile semantics on a full frame: position = α·(n−1) with
    // constant floor/ceil indices and weights — same IEEE ops, same order
    val pos = alpha * (n - 1).toDouble
    val lo = math.floor(pos).toInt // 0-based; element_at is 1-based
    val hi = math.ceil(pos).toInt
    val sorted = col("__sorted")
    val varQ =
      if (lo == hi) element_at(sorted, lo + 1)
      else element_at(sorted, lo + 1) * lit(hi.toDouble - pos) +
        element_at(sorted, hi + 1) * lit(pos - lo.toDouble)
    val esSum = aggregate(slice(sorted, 1, k), lit(0.0), (acc, x) => acc + x)
    df.withColumn("__sorted",
        when(count(r).over(w) === n, sort_array(collect_list(r).over(w))))
      .withColumn("var_alpha", -varQ)
      .withColumn("es_alpha", -(esSum / lit(k.toDouble)))
      .drop("__sorted")
  }

  /** Aroon oscillator lines (public formula): over the last `n+1` bars,
    * `aroon_up = 100·(n − bars_since_highest_high)/n` and `aroon_down`
    * likewise for the lowest low — trend-age gauges built ONLY from the
    * POSITIONS of window extremes. Ties break to the most recent bar
    * (the conventional reading). All arithmetic is integer positions +
    * one multiply/divide — bit-exact everywhere with no float-compare
    * subtleties. NULL until the `n+1`-bar frame fills. Adds `aroon_up`,
    * `aroon_down`. */
  def aroon(df: DataFrame, highCol: String, lowCol: String,
            partCols: Seq[String], orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"period must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("aroon_up", "aroon_down", "__rn"), "Rolling.aroon")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n + 1)
    val (h, l) = (col(highCol).cast("double"), col(lowCol).cast("double"))
    // struct-max picks the max value and, among ties, the LARGEST row
    // number — the most recent extreme, same in any engine
    val withRn = df.withColumn("__rn", row_number().over(seqW).cast("long"))
    val sinceHigh = col("__rn") -
      max(struct(h, col("__rn"))).over(w).getField("__rn")
    val sinceLow = col("__rn") -
      max(struct(negate(l), col("__rn"))).over(w).getField("__rn")
    val full = count(h).over(w) === (n + 1) && count(l).over(w) === (n + 1)
    withRn
      .withColumn("aroon_up",
        when(full, lit(100.0) * (lit(n) - sinceHigh).cast("double") / lit(n.toDouble)))
      .withColumn("aroon_down",
        when(full, lit(100.0) * (lit(n) - sinceLow).cast("double") / lit(n.toDouble)))
      .drop("__rn")
  }

  /** Money Flow Index (public formula) — the volume-weighted RSI: per
    * bar, raw money flow `tp·volume` (`tp = (h+l+c)/3`) counts positive
    * when tp rose and negative when it fell (a flat bar contributes ZERO
    * to both sides — the textbook convention); over the trailing `n`
    * bars, `MFI = 100 − 100/(1 + Σpos/Σneg)` (100 on a zero negative
    * sum). NULL until `n` flow-defined bars fill the frame (the first
    * bar of a series has no flow).
    *
    * Determinism ([[cci]] discipline): the signed flows collect over the
    * BOUNDED n-row frame in window order and both sums are left folds —
    * never a windowed `sum` of doubles, never an unbounded cumulative
    * list. Adds `mfi`. */
  def mfi(df: DataFrame, highCol: String, lowCol: String, closeCol: String,
          volCol: String, partCols: Seq[String], orderCols: Seq[String],
          n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("mfi", "__tp", "__ptp", "__flow", "__flows", "__pos", "__neg"),
      "Rolling.mfi")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (h, l, c, v) = (col(highCol).cast("double"), col(lowCol).cast("double"),
      col(closeCol).cast("double"), col(volCol).cast("double"))
    def fold(lst: org.apache.spark.sql.Column,
             term: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(lst, term), lit(0.0), (acc, x) => acc + x)
    val bound = df.withColumn("__tp", (h + l + c) / lit(3.0))
      // stage the lag once — the flow tree referenced it 3×
      .withColumn("__ptp", lag(col("__tp"), 1).over(seqW))
    val prevTp = col("__ptp")
    // signed flow: rise → +tp·v, fall → −tp·v, flat → 0 (still a flow-
    // defined bar); NULL only where no previous bar exists
    val flow = when(prevTp.isNotNull,
      when(col("__tp") > prevTp, col("__tp") * v)
        .when(col("__tp") < prevTp, -(col("__tp") * v))
        .otherwise(lit(0.0)))
    val w = frame(partCols, orderCols, n)
    val flowed = bound.withColumn("__flow", flow)
      .withColumn("__flows",
        when(count(col("__flow")).over(w) === n,
          collect_list(col("__flow")).over(w)))
    val pos = fold(col("__flows"), x => when(x > lit(0.0), x).otherwise(lit(0.0)))
    val neg = fold(col("__flows"), x => when(x < lit(0.0), -x).otherwise(lit(0.0)))
    flowed
      .withColumn("__pos", when(col("__flows").isNotNull, pos))
      .withColumn("__neg", when(col("__flows").isNotNull, neg))
      .withColumn("mfi",
        when(col("__neg") === lit(0.0), when(col("__pos").isNotNull, lit(100.0)))
          .otherwise(lit(100.0) -
            lit(100.0) / (lit(1.0) + col("__pos") / col("__neg"))))
      .drop("__tp", "__ptp", "__flow", "__flows", "__pos", "__neg")
  }

  /** Commodity Channel Index (public formula):
    * `CCI = (tp − SMA(tp, n)) / (0.015 · MD)` with `tp = (h+l+c)/3` and
    * `MD` the mean ABSOLUTE deviation of the frame's typical prices from
    * the frame mean — the overbought/oversold oscillator whose
    * denominator is a robust spread, not σ. NULL until the frame fills
    * and on a zero deviation (flat frame).
    *
    * Determinism: the frame's typical prices collect IN WINDOW ORDER and
    * both the mean and the deviation sum are LEFT FOLDS over that list
    * (the [[graft.operators.Divergence]] discipline) — a windowed
    * `avg()` would pit Spark's sequential sum against DuckDB's pairwise
    * one. O(n) state per row, like the rolling median. Adds `cci`. */
  def cci(df: DataFrame, highCol: String, lowCol: String, closeCol: String,
          partCols: Seq[String], orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("cci", "__tp", "__tps", "__smatp", "__md"), "Rolling.cci")
    val w = frame(partCols, orderCols, n)
    val (h, l, c) =
      (col(highCol).cast("double"), col(lowCol).cast("double"),
        col(closeCol).cast("double"))
    def fold(lst: org.apache.spark.sql.Column,
             term: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(lst, term), lit(0.0), (acc, x) => acc + x)
    df.withColumn("__tp", (h + l + c) / lit(3.0))
      .withColumn("__tps",
        when(count(col("__tp")).over(w) === n,
          collect_list(col("__tp")).over(w)))
      .withColumn("__smatp", fold(col("__tps"), x => x) / lit(n.toDouble))
      .withColumn("__md",
        fold(col("__tps"), x => abs(x - col("__smatp"))) / lit(n.toDouble))
      .withColumn("cci",
        when(col("__md") =!= lit(0.0),
          (col("__tp") - col("__smatp")) / (lit(0.015) * col("__md"))))
      .drop("__tp", "__tps", "__smatp", "__md")
  }

  /** Chaikin Money Flow (public formula, Chaikin): `CMF_n =
    * Σₙ mfv / Σₙ vol` where `mfv = mfm·vol` and the money-flow
    * multiplier `mfm = ((close−low) − (high−close)) / (high−low)` — the
    * buying-vs-selling-pressure oscillator in [−1, 1]. A flat bar
    * (high = low) has no range to locate the close in: its `mfm` is 0
    * by the standard convention (contributes volume, no signed flow).
    *
    * Determinism — the [[cci]] discipline: `mfv` is per-row IEEE (one
    * fixed tree), and BOTH frame sums are in-order left folds over the
    * collected frame list, never a windowed float sum (Spark's sliding
    * sum associates differently than a fresh per-frame fold). Volumes
    * fold as doubles in the same list order, so the oracle replays both
    * folds verbatim. NULL until the frame fills or on zero total
    * volume. One keyed Window pass. Adds `cmf`. */
  def cmf(df: DataFrame, highCol: String, lowCol: String, closeCol: String,
          volCol: String, partCols: Seq[String], orderCols: Seq[String],
          n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("cmf", "__mfv", "__vd", "__pairs"), "Rolling.cmf")
    val w = frame(partCols, orderCols, n)
    val (h, l, c) =
      (col(highCol).cast("double"), col(lowCol).cast("double"),
        col(closeCol).cast("double"))
    val vd = col(volCol).cast("double")
    def fold(lst: org.apache.spark.sql.Column,
             term: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(lst, term), lit(0.0), (acc, x) => acc + x)
    val mfm = when(h =!= l, ((c - l) - (h - c)) / (h - l)).otherwise(lit(0.0))
    df.withColumn("__mfv", mfm * vd)
      .withColumn("__vd", vd)
      .withColumn("__pairs",
        when(count(col("__mfv")).over(w) === n,
          collect_list(struct(col("__mfv"), col("__vd"))).over(w)))
      .withColumn("cmf", {
        val num = fold(col("__pairs"), p => p.getField("__mfv"))
        val den = fold(col("__pairs"), p => p.getField("__vd"))
        when(den =!= lit(0.0), num / den)
      })
      .drop("__mfv", "__vd", "__pairs")
  }

  /** Ichimoku Kinko Hyo base lines (public formula): conversion
    * (Tenkan, (max+min)/2 over `pConv` bars), base (Kijun, over
    * `pBase`), leading span A ((Tenkan+Kijun)/2 shifted `pBase`
    * FORWARD), leading span B (midpoint over `pSpanB`, shifted
    * forward), lagging span (close shifted `pBase` BACK). Every line is
    * an exact window extreme plus IEEE halvings — no recurrence, so
    * results are bit-exact on any engine, NULL until each line's frame
    * fills (and at the shift edges).
    *
    * ONE keyed Window pass computes all midpoints (shared spec, three
    * frames); the two forward shifts are `lag` over the same spec, the
    * lagging span a `lead`. Adds `tenkan`, `kijun`, `senkou_a`,
    * `senkou_b`, `chikou`. */
  def ichimoku(df: DataFrame, highCol: String, lowCol: String,
               closeCol: String, partCols: Seq[String],
               orderCols: Seq[String], pConv: Int = 9, pBase: Int = 26,
               pSpanB: Int = 52): DataFrame = {
    require(pConv >= 1 && pBase >= 1 && pSpanB >= 1,
      s"periods must be >= 1, got ($pConv, $pBase, $pSpanB)")
    Guards.requireNoReserved(df.columns,
      Seq("tenkan", "kijun", "senkou_a", "senkou_b", "chikou", "__sb_lead"),
      "Rolling.ichimoku")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (h, l, c) =
      (col(highCol).cast("double"), col(lowCol).cast("double"),
        col(closeCol).cast("double"))
    def mid(n: Int): org.apache.spark.sql.Column = {
      val w = frame(partCols, orderCols, n)
      when(count(h).over(w) === n && count(l).over(w) === n,
        (max(h).over(w) + min(l).over(w)) / lit(2.0))
    }
    df.withColumn("tenkan", mid(pConv))
      .withColumn("kijun", mid(pBase))
      .withColumn("senkou_b", mid(pSpanB))
      // bind the midpoints, then shift in a second pass over the SAME spec
      .select(col("*"),
        lag((col("tenkan") + col("kijun")) / lit(2.0), pBase).over(seqW)
          .as("senkou_a"),
        lag(col("senkou_b"), pBase).over(seqW).as("__sb_lead"),
        lead(c, pBase).over(seqW).as("chikou"))
      .withColumn("senkou_b", col("__sb_lead"))
      .drop("__sb_lead")
  }

  /** Rate of change (momentum oscillator, public formula):
    * `100 · (x − x_{t−n}) / x_{t−n}` — NULL while no n-back value exists
    * and on a zero base (no finite percentage to report). One fixed IEEE
    * division per row; one keyed Window pass. Adds `roc`. */
  def roc(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"lookback must be >= 1, got $n")
    Guards.requireNoReserved(df.columns, Seq("roc", "__roc_b"), "Rolling.roc")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("double")
    // stage the lag once — the percentage tree referenced it 4×
    val base = col("__roc_b")
    df.withColumn("__roc_b", lag(x, n).over(seqW))
      .withColumn("roc",
        when(base.isNotNull && base =!= 0.0, lit(100.0) * (x - base) / base))
      .drop("__roc_b")
  }

  /** Donchian channel (Donchian's breakout envelope, public formula):
    * `dc_upper`/`dc_lower` = trailing-n max/min, `dc_mid` = their midpoint.
    * NULL until the frame fills. Exact selections + one IEEE halving;
    * one keyed Window pass. */
  def donchian(df: DataFrame, valueCol: String, partCols: Seq[String],
               orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("dc_upper", "dc_lower", "dc_mid", "__dc_n", "__dc_hi", "__dc_lo"),
      "Rolling.donchian")
    val w = frame(partCols, orderCols, n)
    val x = col(valueCol).cast("double")
    // stage the frame extremes once (sliding min/max re-fold per row —
    // inlined duplicates tripled the count and doubled each extreme)
    val staged = df.select(col("*"),
      count(x).over(w).as("__dc_n"),
      max(x).over(w).as("__dc_hi"),
      min(x).over(w).as("__dc_lo"))
    val full = col("__dc_n") === n
    val (hi, lo) = (col("__dc_hi"), col("__dc_lo"))
    staged.select(col("*"),
      when(full, hi).as("dc_upper"),
      when(full, lo).as("dc_lower"),
      when(full, (hi + lo) / lit(2.0)).as("dc_mid"))
      .drop("__dc_n", "__dc_hi", "__dc_lo")
  }

  /** Williams %R (Larry Williams' oscillator, public formula):
    * `−100 · (max_n − x) / (max_n − min_n)` over the trailing n-row frame —
    * the stochastic %K's mirror, scaled to [−100, 0]. NULL until the frame
    * fills and on a flat window (no range to locate x within). One keyed
    * Window pass. Adds `will_r`. */
  def williamsR(df: DataFrame, valueCol: String, partCols: Seq[String],
                orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("will_r", "__wr_n", "__wr_lo", "__wr_hi"), "Rolling.williamsR")
    val w = frame(partCols, orderCols, n)
    val x = col(valueCol).cast("double")
    // stage the frame extremes once (hi appeared 3×, each a re-fold)
    val staged = df.select(col("*"),
      count(x).over(w).as("__wr_n"),
      min(x).over(w).as("__wr_lo"),
      max(x).over(w).as("__wr_hi"))
    val (lo, hi) = (col("__wr_lo"), col("__wr_hi"))
    staged.withColumn("will_r",
      when(col("__wr_n") === n && hi =!= lo,
        lit(-100.0) * (hi - x) / (hi - lo)))
      .drop("__wr_n", "__wr_lo", "__wr_hi")
  }

  /** Running drawdown: `peak` = running max of the series, `drawdown` =
    * `(x − peak) / peak` (≤ 0; 0 at every new high) — the standard
    * peak-to-trough decline measure. NULL drawdown on a zero peak. Exact
    * running max + one IEEE division; one keyed Window pass. */
  def drawdown(df: DataFrame, valueCol: String, partCols: Seq[String],
               orderCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("peak", "drawdown"), "Rolling.drawdown")
    val running = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("double")
    // stage the running max once — the drawdown tree referenced it 4×
    val peak = col("peak")
    df.withColumn("peak", max(x).over(running))
      .withColumn("drawdown", when(peak =!= 0.0, (x - peak) / peak))
  }

  /** Drawdown duration ("time under water"): rows since the running peak
    * was last set or re-touched — 0 at every new high-water mark, k after
    * k consecutive below-peak rows. The recovery-time companion to
    * [[drawdown]]'s depth: together they answer "how deep and for how
    * long". Pure integer arithmetic (`row_number − last peak-row
    * number`), engine-exact with no float compare subtleties (a re-touch
    * EQUAL to the peak counts as recovery, matching the high-water-mark
    * convention). One keyed exchange; adds `dd_duration`. */
  def drawdownDuration(df: DataFrame, valueCol: String, partCols: Seq[String],
                       orderCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("dd_duration", "__rn", "__is_peak", "__peak_rn"),
      "Rolling.drawdownDuration")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val running = seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("double")
    // staged projections: window functions cannot nest, and all three
    // share the one keyed sort anyway
    df.withColumn("__rn", row_number().over(seqW).cast("long"))
      .withColumn("__is_peak", x >= max(x).over(running))
      .withColumn("__peak_rn",
        max(when(col("__is_peak"), col("__rn"))).over(running))
      .withColumn("dd_duration", col("__rn") - col("__peak_rn"))
      .drop("__rn", "__is_peak", "__peak_rn")
  }

  /** Keltner channel (Keltner/Chester's volatility envelope, public
    * formula, EMA-ATR form): `kc_mid` = EMA(close, emaN), `kc_upper` /
    * `kc_lower` = mid ± k·ATR(atrN) — the volatility-adaptive band that
    * pairs the native EMA recurrence with [[atr]] over OHLC bars.
    * `kc_mid` runs from each partition's first row (EMA seeds on it); the
    * bands are NULL until the ATR frame fills.
    *
    * Requires [[graft.functions.FinancialFunctions.registerAll]] — the
    * EMA resolves through the function registry. Plan: the ATR pass and
    * the EMA share the one keyed exchange (same partition/order). */
  def keltner(df: DataFrame, highCol: String, lowCol: String,
              closeCol: String, partCols: Seq[String],
              orderCols: Seq[String], emaN: Int, atrN: Int,
              k: Double): DataFrame = {
    require(k > 0, s"band width multiplier must be positive, got $k")
    Guards.requireNoReserved(df.columns,
      Seq("kc_mid", "kc_upper", "kc_lower"), "Rolling.keltner")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val mid = graft.functions.FinancialFunctions
      .ema(col(closeCol).cast("double"), emaN).over(seqW)
    atr(df, highCol, lowCol, closeCol, partCols, orderCols, atrN)
      .select(col("*"), mid.as("kc_mid"))
      .select(col("*"),
        (col("kc_mid") + lit(k) * col("atr")).as("kc_upper"),
        (col("kc_mid") - lit(k) * col("atr")).as("kc_lower"))
  }

  /** Elder Ray bull/bear power (public formula, Elder 1993): `bull =
    * high − EMA(close, n)`, `bear = low − EMA(close, n)` — how far the
    * bar's extremes push above/below the trend consensus. Composes the
    * NATIVE EMA recurrence (registry required, the [[keltner]]
    * precedent); the EMA binds ONCE in its own projection so the
    * recurrence isn't evaluated twice. One keyed pass; EMA runs from
    * each key's first row (first-value seed). Adds `bull_power`,
    * `bear_power`. */
  def elderRay(df: DataFrame, highCol: String, lowCol: String,
               closeCol: String, partCols: Seq[String],
               orderCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("bull_power", "bear_power", "__er_ema"), "Rolling.elderRay")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__er_ema", graft.functions.FinancialFunctions
        .ema(col(closeCol).cast("double"), n).over(seqW))
      .withColumn("bull_power", col(highCol).cast("double") - col("__er_ema"))
      .withColumn("bear_power", col(lowCol).cast("double") - col("__er_ema"))
      .drop("__er_ema")
  }

  /** Force Index (public formula, Elder 1993): `EMA((close − prev
    * close)·volume, n)` — price change weighted by the volume behind it.
    * Each key's FIRST row has no previous close, so the raw force is
    * NULL there and the native EMA's frozen-NULL contract handles it
    * exactly: the first row emits NULL and the recurrence seeds on the
    * first REAL force value. One keyed pass (the lag and the EMA share
    * the sort). Adds `force_index`. */
  def forceIndex(df: DataFrame, closeCol: String, volCol: String,
                 partCols: Seq[String], orderCols: Seq[String],
                 n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("force_index", "__fi_raw"), "Rolling.forceIndex")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val c = col(closeCol).cast("double")
    df.withColumn("__fi_raw",
        (c - lag(c, 1).over(seqW)) * col(volCol).cast("double"))
      .withColumn("force_index", graft.functions.FinancialFunctions
        .ema(col("__fi_raw"), n).over(seqW))
      .drop("__fi_raw")
  }

  /** Trailing-n Pearson correlation AND OLS slope (beta) between two
    * series in one window pass — the pair-trading / hedging primitive.
    * NULL until the frame fills or while either series is degenerate
    * (zero variance: no direction to correlate against).
    *
    * Determinism — the same scaled-integer discipline as [[vwap]]: both
    * series quantize to `xScale`/`yScale` decimals, ALL window sums
    * (Σx, Σy, Σx², Σy², Σxy) are exact BIGINT sums, and the closed forms
    * evaluate as one fixed IEEE tree on the exact sums. Correlation is
    * scale-invariant, so no descaling; beta descales by the one extra
    * exact power-of-ten ratio. The two variance terms go under SEPARATE
    * square roots (their BIGINT product could overflow; the double
    * product cannot), and the quotient clamps to [−1, 1] — the separate
    * roots can round the denominator a last-ulp short on perfectly
    * collinear frames. Adds `roll_corr`, `roll_beta` (slope of y on x). */
  def corrBeta(df: DataFrame, xCol: String, yCol: String,
               partCols: Seq[String], orderCols: Seq[String], n: Int,
               xScale: Int = 0, yScale: Int = 0): DataFrame = {
    require(n >= 2, s"need a window of >= 2, got $n")
    require(xScale >= 0 && yScale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("roll_corr", "roll_beta", "__cb_n", "__cb_sx", "__cb_sy",
        "__cb_sxx", "__cb_syy", "__cb_sxy"), "Rolling.corrBeta")
    val w = frame(partCols, orderCols, n)
    val xi = round(col(xCol).cast("double") * lit(math.pow(10, xScale))).cast("long")
    val yi = round(col(yCol).cast("double") * lit(math.pow(10, yScale))).cast("long")
    // STAGE the six frame sums as materialized columns: inlining them
    // into the corr/beta CASE trees makes ExtractWindowExpressions emit
    // one window aggregate PER REFERENCE (26 sliding buffers instead of
    // 6 — measured 2× the keyed-window family's scale exponent before
    // this split). After the split the Window operator evaluates exactly
    // six aggregates; the closed forms below reference plain attributes,
    // which CollapseProject can merge freely without re-expansion.
    val staged = df.select(col("*"),
      count(when(xi.isNotNull && yi.isNotNull, 1)).over(w).as("__cb_n"),
      sum(xi).over(w).as("__cb_sx"), sum(yi).over(w).as("__cb_sy"),
      sum(xi * xi).over(w).as("__cb_sxx"),
      sum(yi * yi).over(w).as("__cb_syy"),
      sum(xi * yi).over(w).as("__cb_sxy"))
    val nL = lit(n.toLong)
    val num = (nL * col("__cb_sxy") - col("__cb_sx") * col("__cb_sy")).cast("double")
    val dx = (nL * col("__cb_sxx") - col("__cb_sx") * col("__cb_sx")).cast("double")
    val dy = (nL * col("__cb_syy") - col("__cb_sy") * col("__cb_sy")).cast("double")
    val full = col("__cb_n") === n
    staged.select(col("*"),
      when(full && dx > 0.0 && dy > 0.0,
        greatest(lit(-1.0), least(lit(1.0),
          num / (sqrt(dx) * sqrt(dy))))).as("roll_corr"),
      when(full && dx > 0.0,
        (num / dx) * lit(math.pow(10, xScale) / math.pow(10, yScale)))
        .as("roll_beta"))
      .drop("__cb_n", "__cb_sx", "__cb_sy", "__cb_sxx", "__cb_syy", "__cb_sxy")
  }

  /** Whole-series cross-correlation function (CCF) of two columns per
    * key at a SET of lags — the lead–lag diagnostic (which series moves
    * first): for lag ℓ ≥ 0 the correlation of x shifted ℓ steps back
    * against current y (x LEADS y by ℓ); negative ℓ shifts x forward
    * (x LAGS y). The classic pre-hedge/pairs screen before committing to
    * a single-lag model.
    *
    * Exactness: the [[corrBeta]] discipline — both columns quantize to
    * scaled BIGINTs, five exact integer sums per (key, lag) over the
    * COMPLETE pairs only, one fixed IEEE tree with separate square roots
    * and the [−1, 1] clamp. NULL corr when fewer than 2 complete pairs
    * or a zero-variance side.
    *
    * Plan shape: ALL lag shifts ride ONE keyed sort (lag/lead windows
    * share the partition+order), then one explode of a |lags|-element
    * struct array fans each row out to its (lag, x_shifted, y) pairs,
    * and one map-side-combinable aggregate on (key, lag) reduces to the
    * tiny (keys × lags) output frame. One corpus-sized exchange (the
    * keyed sort); the (key, lag) aggregate reuses nothing corpus-sized.
    * Emits (partCols…, `lag`, `n_pairs`, `xcorr`). */
  def crossCorr(df: DataFrame, xCol: String, yCol: String,
                partCols: Seq[String], orderCols: Seq[String],
                lags: Seq[Int], xScale: Int = 0, yScale: Int = 0): DataFrame = {
    require(lags.nonEmpty, "crossCorr needs at least one lag")
    require(lags.distinct.size == lags.size, "duplicate lags")
    require(partCols.nonEmpty, "crossCorr needs at least one key column")
    require(xScale >= 0 && yScale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("lag", "n_pairs", "xcorr", "__p", "__y"), "Rolling.crossCorr")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(xCol).cast("double") * lit(math.pow(10, xScale)))
      .cast("long")
    val yi = round(col(yCol).cast("double") * lit(math.pow(10, yScale)))
      .cast("long")
    val shifted = df.select(
      (partCols.map(col) :+ yi.as("__y")) ++
        lags.map { l =>
          (if (l >= 0) lag(xi, l) else lead(xi, -l)).over(w).as(s"__x_$l")
        }: _*)
    val pairs = shifted.select(
      (partCols.map(col) :+
        explode(array(lags.map { l =>
          struct(lit(l).as("lag"), col(s"__x_$l").as("__x"),
            col("__y").as("__yv"))
        }: _*)).as("__p")): _*)
    val x = col("__p.__x")
    val y = col("__p.__yv")
    val both = x.isNotNull && y.isNotNull
    // per-term products fit a BIGINT; the SUMS (and n·Σxx − Σx²) do not
    // at volume-sized scales — accumulate as DECIMAL(38,0), exact in any
    // order (the moments discipline; DuckDB's HUGEINT sums mirror it)
    def dec(c: Column): Column = sum(when(both, c).cast("decimal(38,0)"))
    val sums = pairs
      .groupBy((partCols.map(col) :+ col("__p.lag").as("lag")): _*)
      .agg(count(when(both, 1)).as("n_pairs"),
        dec(x).as("__sx"), dec(y).as("__sy"),
        dec(x * x).as("__sxx"), dec(y * y).as("__syy"),
        dec(x * y).as("__sxy"))
    val nL = col("n_pairs")
    val nDec = nL.cast("decimal(38,0)")
    val num = (nDec * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (nDec * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (nDec * col("__syy") - col("__sy") * col("__sy")).cast("double")
    sums.withColumn("xcorr",
        when(nL >= 2L && dx > 0.0 && dy > 0.0,
          greatest(lit(-1.0), least(lit(1.0), num / (sqrt(dx) * sqrt(dy))))))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** Rolling beta and correlation of each series AGAINST THE MARKET —
    * the cross-sectional companion to [[corrBeta]]. The market index is
    * the per-timestamp SUM of the scaled metric across ALL series (an
    * equal-weight aggregate kept in BIGINTs — a sum, not a mean, so the
    * index is integer-exact); each series then runs the exact
    * scaled-BIGINT rolling-regression kernel against it.
    *
    * Scale shape: the index table has one row per timestamp — tiny next
    * to the fact table — so it BROADCASTS back (asserted in the spec);
    * the fact table is shuffled once, on the series key, for the window
    * pass. The series' own value is part of the index (standard
    * equal-weight-index caveat; at hundreds of series the self-term is
    * ~1/N). NULL until the frame holds n complete pairs. Adds
    * `mkt_corr`, `mkt_beta` (slope of the series on the index). */
  def marketBeta(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String], n: Int, scale: Int = 0): DataFrame = {
    require(n >= 2, s"need a window of >= 2, got $n")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("mkt_corr", "mkt_beta", "__mkt"), "Rolling.marketBeta")
    val k = math.pow(10, scale)
    val xi = round(col(valueCol).cast("double") * lit(k)).cast("long")
    val mkt = df.groupBy(orderCols.map(col): _*).agg(sum(xi).as("__mkt"))
    df.join(broadcast(mkt), orderCols)
      .transform(corrBeta(_, "__mkt", valueCol, partCols, orderCols, n,
        0, scale))
      .withColumnRenamed("roll_corr", "mkt_corr")
      .withColumnRenamed("roll_beta", "mkt_beta")
      .drop("__mkt")
  }

  /** Trailing-n lag-k autocorrelation of one series — the single-lag ACF
    * run as a rolling diagnostic (mean reversion < 0 < momentum). The
    * lagged twin is materialized once with `lag(value, k)` on the same
    * keyed order, then the pair runs the exact [[corrBeta]] machinery
    * (scaled-BIGINT window sums, one IEEE tree, [−1, 1] clamp), so all
    * of its determinism guarantees carry over verbatim. NULL until the
    * frame holds n complete (x, x₋ₖ) pairs — the first k rows of each
    * key can never contribute a pair. The lag window and the frame sums
    * share one partitioning and sort → one keyed exchange.
    * Adds `roll_autocorr`. */
  def autocorr(df: DataFrame, valueCol: String, partCols: Seq[String],
               orderCols: Seq[String], n: Int, lagK: Int,
               scale: Int = 0): DataFrame = {
    require(lagK >= 1, s"lag must be >= 1, got $lagK")
    Guards.requireNoReserved(df.columns,
      Seq("roll_autocorr", "__lag"), "Rolling.autocorr")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__lag", lag(col(valueCol), lagK).over(seqW))
      .transform(corrBeta(_, valueCol, "__lag", partCols, orderCols, n,
        scale, scale))
      .withColumnRenamed("roll_corr", "roll_autocorr")
      .drop("roll_beta", "__lag")
  }

  /** Forward fill: replace NULLs with the most recent non-NULL value of
    * the series (`last(x) IGNORE NULLS` over the running frame) — the gap
    * repair step in front of recurrence indicators when frozen-state NULL
    * passthrough (§7.1) is not wanted. Leading NULLs (no value yet to
    * carry) stay NULL. One keyed Window pass. Adds `<valueCol>_filled`. */
  def ffill(df: DataFrame, valueCol: String, partCols: Seq[String],
            orderCols: Seq[String]): DataFrame = {
    val out = s"${valueCol}_filled"
    Guards.requireNoReserved(df.columns, Seq(out), "Rolling.ffill")
    val running = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(col(valueCol), ignoreNulls = true).over(running))
  }

  /** Vortex indicator (Botes & Siepman 2010, public formula): trend
    * direction from the ratio of directional movement to range —
    * `vi_plus = Σ|high_t − low_{t−1}| / ΣTR` and
    * `vi_minus = Σ|low_t − high_{t−1}| / ΣTR` over the trailing n bars.
    * The first bar of each key has no prior bar, so its VM/TR terms are
    * NULL (not zero) and the frame needs n complete terms — first
    * emission at bar n+1, the textbook schedule.
    *
    * Determinism: VM and TR are quantized to `scale` decimals and summed
    * as BIGINTs (exact under ANY accumulation order — the sliding-frame
    * double-sum trap, see [[vwap]]); each VI is then ONE IEEE division.
    * One keyed Window pass. Adds `vi_plus`, `vi_minus`. */
  def vortex(df: DataFrame, highCol: String, lowCol: String,
             closeCol: String, partCols: Seq[String], orderCols: Seq[String],
             n: Int, scale: Int = 0): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("vi_plus", "vi_minus", "__vmp", "__vmm", "__tr",
        "__vx_n", "__vx_str", "__vx_svp", "__vx_svm",
        "__vx_ph", "__vx_pl", "__vx_pc"), "Rolling.vortex")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val k = lit(math.pow(10, scale))
    def q(c: Column) = round(c * k).cast("long")
    val (h, l, c) = (col(highCol).cast("double"), col(lowCol).cast("double"),
      col(closeCol).cast("double"))
    // stage the three lags once (prevC appeared 3×, prevH/prevL 2× each)
    val lagged = df.select(col("*"),
      lag(h, 1).over(seqW).as("__vx_ph"),
      lag(l, 1).over(seqW).as("__vx_pl"),
      lag(c, 1).over(seqW).as("__vx_pc"))
    val (prevH, prevL, prevC) =
      (col("__vx_ph"), col("__vx_pl"), col("__vx_pc"))
    // NULL on the first bar (no prior), so the frame-count gate needs n
    // TRUE inter-bar terms — never a zero-padded warm-up
    val vmp = when(prevL.isNotNull, q(abs(h - prevL)))
    val vmm = when(prevH.isNotNull, q(abs(l - prevH)))
    val tr = when(prevC.isNotNull,
      q(greatest(h, prevC) - least(l, prevC)))
    // lag exprs must bind before the frame sums can see them (same
    // projection split as atr); the frame sums then stage ONCE — the TR
    // sum appeared 4×, each a separate per-row re-fold of the frame
    lagged.withColumn("__vmp", vmp).withColumn("__vmm", vmm)
      .withColumn("__tr", tr)
      .drop("__vx_ph", "__vx_pl", "__vx_pc")
      .select(col("*"),
        count(col("__tr")).over(w).as("__vx_n"),
        sum(col("__tr")).over(w).as("__vx_str"),
        sum(col("__vmp")).over(w).as("__vx_svp"),
        sum(col("__vmm")).over(w).as("__vx_svm"))
      .select(col("*"),
        when(col("__vx_n") === n && col("__vx_str") =!= 0L,
          col("__vx_svp").cast("double") /
            col("__vx_str").cast("double")).as("vi_plus"),
        when(col("__vx_n") === n && col("__vx_str") =!= 0L,
          col("__vx_svm").cast("double") /
            col("__vx_str").cast("double")).as("vi_minus"))
      .drop("__vmp", "__vmm", "__tr", "__vx_n", "__vx_str", "__vx_svp", "__vx_svm")
  }

  /** Chande Momentum Oscillator (Chande 1994, public formula):
    * `100 · (Σup − Σdown) / (Σup + Σdown)` over the trailing n one-bar
    * moves — RSI's cousin with the raw (unsmoothed) sums, bounded
    * [−100, 100]. NULL until n complete moves exist (first emission at
    * row n+1) and on a flat window (Σup + Σdown = 0: no momentum to
    * report, the [[williamsR]] flat-window convention).
    *
    * Determinism: moves are quantized to `scale` decimals and summed as
    * BIGINTs; the oscillator is one fixed IEEE tree over the two exact
    * sums. One keyed Window pass. Adds `cmo`. */
  def cmo(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], n: Int, scale: Int = 0): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("cmo", "__up", "__dn", "__cm_d", "__cm_n", "__cm_su", "__cm_sd"),
      "Rolling.cmo")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val k = lit(math.pow(10, scale))
    val x = col(valueCol).cast("double")
    // stage the diff once — it feeds both the up and the down branch
    // (the inlined form expanded the lag to four window expressions)
    val staged = df.select(col("*"),
      (x - lag(x, 1).over(seqW)).as("__cm_d"))
    val d = col("__cm_d")
    // greatest() skips NULLs (greatest(NULL, 0) = 0), which would smuggle a
    // zero move into each key's first row — gate on the diff explicitly so
    // the frame-count warm-up counts only TRUE moves
    val up = when(d.isNotNull, round(greatest(d, lit(0.0)) * k).cast("long"))
    val dn = when(d.isNotNull, round(greatest(-d, lit(0.0)) * k).cast("long"))
    // stage the two frame sums once — each appeared 3× (a separate
    // per-row re-fold of the sliding frame per reference)
    staged.withColumn("__up", up).withColumn("__dn", dn)
      .drop("__cm_d")
      .select(col("*"),
        count(col("__up")).over(w).as("__cm_n"),
        sum(col("__up")).over(w).as("__cm_su"),
        sum(col("__dn")).over(w).as("__cm_sd"))
      .select(col("*"),
        when(col("__cm_n") === n &&
            (col("__cm_su") + col("__cm_sd")) =!= 0L,
          lit(100.0) *
            (col("__cm_su") - col("__cm_sd")).cast("double") /
            (col("__cm_su") + col("__cm_sd")).cast("double"))
          .as("cmo"))
      .drop("__up", "__dn", "__cm_n", "__cm_su", "__cm_sd")
  }

  /** Ultimate Oscillator (Williams 1976, public formula): buying pressure
    * `BP = close − min(low, prevClose)` over true range
    * `TR = max(high, prevClose) − min(low, prevClose)`, averaged over
    * three trailing horizons and blended 4:2:1 —
    * `100 · (4·ΣBP₇/ΣTR₇ + 2·ΣBP₁₄/ΣTR₁₄ + ΣBP₂₈/ΣTR₂₈) / 7`.
    * NULL until the LONGEST frame holds n₃ complete terms and whenever
    * any ΣTR is zero. First bar per key contributes nothing (no
    * prevClose — NULL term, the [[vortex]] convention).
    *
    * Determinism: BP/TR quantized to `scale` decimals, summed as
    * BIGINTs; three IEEE divisions feed one fixed blend tree. The three
    * frames share one (partition, order) spec — one exchange, one sort.
    * Adds `ultimate`. */
  def ultimateOscillator(df: DataFrame, highCol: String, lowCol: String,
                         closeCol: String, partCols: Seq[String],
                         orderCols: Seq[String], n1: Int = 7, n2: Int = 14,
                         n3: Int = 28, scale: Int = 0): DataFrame = {
    require(n1 >= 1 && n2 > n1 && n3 > n2,
      s"horizons must ascend: got ($n1, $n2, $n3)")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("ultimate", "__bp", "__tr", "__uo_pc", "__uo_n",
        "__uo_b1", "__uo_b2", "__uo_b3", "__uo_t1", "__uo_t2", "__uo_t3"),
      "Rolling.ultimateOscillator")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val k = lit(math.pow(10, scale))
    val (h, l, c) = (col(highCol).cast("double"), col(lowCol).cast("double"),
      col(closeCol).cast("double"))
    // stage the prev-close lag once — the BP and TR trees referenced it
    // 5× combined, expanding to five lag window expressions
    val lagged = df.select(col("*"), lag(c, 1).over(seqW).as("__uo_pc"))
    val prevC = col("__uo_pc")
    val bp = when(prevC.isNotNull, round((c - least(l, prevC)) * k).cast("long"))
    val tr = when(prevC.isNotNull,
      round((greatest(h, prevC) - least(l, prevC)) * k).cast("long"))
    val bound = lagged.withColumn("__bp", bp).withColumn("__tr", tr)
      .drop("__uo_pc")
    // stage the seven frame aggregates once (per horizon: ΣBP and ΣTR;
    // each ΣTR appeared twice — its zero guard plus the ratio — and each
    // duplicate re-folded its sliding frame per row)
    val fullW = frame(partCols, orderCols, n3)
    val staged = bound.select(col("*"),
      count(col("__tr")).over(fullW).as("__uo_n"),
      sum(col("__bp")).over(frame(partCols, orderCols, n1)).as("__uo_b1"),
      sum(col("__bp")).over(frame(partCols, orderCols, n2)).as("__uo_b2"),
      sum(col("__bp")).over(fullW).as("__uo_b3"),
      sum(col("__tr")).over(frame(partCols, orderCols, n1)).as("__uo_t1"),
      sum(col("__tr")).over(frame(partCols, orderCols, n2)).as("__uo_t2"),
      sum(col("__tr")).over(fullW).as("__uo_t3"))
    def ratio(i: Int): Column =
      col(s"__uo_b$i").cast("double") / col(s"__uo_t$i").cast("double")
    staged.select(col("*"),
        when(col("__uo_n") === n3 &&
            col("__uo_t1") =!= 0L && col("__uo_t2") =!= 0L &&
            col("__uo_t3") =!= 0L,
          lit(100.0) * (lit(4.0) * ratio(1) + lit(2.0) * ratio(2) +
            ratio(3)) / lit(7.0)).as("ultimate"))
      .drop("__bp", "__tr", "__uo_n",
        "__uo_b1", "__uo_b2", "__uo_b3", "__uo_t1", "__uo_t2", "__uo_t3")
  }

  /** Detrended Price Oscillator (public formula): the price's distance
    * from a DISPLACED trailing mean — `x_t − SMA_n(t − (n/2 + 1))` —
    * which strips the n-bar trend and leaves the shorter cycle. NULL
    * until the displaced SMA exists (row n + n/2 + 1 per key).
    *
    * Determinism: the SMA is `avg` over an exact frame — sum of
    * `scale`-quantized BIGINTs, ONE division — then lagged; the subtract
    * is one more IEEE op. One keyed Window pass (the lag and the frame
    * share the spec). Adds `dpo`. */
  def dpo(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], n: Int, scale: Int = 0): DataFrame = {
    require(n >= 2, s"window must be >= 2, got $n")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns, Seq("dpo", "__sma"), "Rolling.dpo")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val k = math.pow(10, scale)
    val x = col(valueCol).cast("double")
    val xi = round(x * lit(k)).cast("long")
    val sma = when(count(xi).over(w) === n,
      sum(xi).over(w).cast("double") / lit(n.toDouble * k))
    val shift = n / 2 + 1
    df.withColumn("__sma", sma)
      .withColumn("dpo",
        x - lag(col("__sma"), shift, null, ignoreNulls = false).over(seqW))
      .drop("__sma")
  }

  /** Classic floor-trader pivot points (public formula): today's support/
    * resistance ladder from YESTERDAY's bar — `pp = (H+L+C)/3`,
    * `r1 = 2·pp − L`, `s1 = 2·pp − H`, `r2 = pp + (H−L)`,
    * `s2 = pp − (H−L)` (H/L/C all prior-bar). NULL on each key's first
    * bar (no prior bar to pivot from).
    *
    * Determinism: five fixed IEEE trees over three lagged values — no
    * sums, no frames, engine-exact by construction. One keyed Window
    * pass. Adds `pp`, `r1`, `s1`, `r2`, `s2`. */
  def pivotPoints(df: DataFrame, highCol: String, lowCol: String,
                  closeCol: String, partCols: Seq[String],
                  orderCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("pp", "r1", "s1", "r2", "s2", "__pv_h", "__pv_l", "__pv_c"),
      "Rolling.pivotPoints")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // stage the three lags once — inlining them through pp's tree into
    // all five outputs expanded to 21 window expressions; the staged
    // values are the identical doubles, so every level is bit-identical
    val staged = df.select(col("*"),
      lag(col(highCol).cast("double"), 1).over(seqW).as("__pv_h"),
      lag(col(lowCol).cast("double"), 1).over(seqW).as("__pv_l"),
      lag(col(closeCol).cast("double"), 1).over(seqW).as("__pv_c"))
    val (ph, pl, pc) = (col("__pv_h"), col("__pv_l"), col("__pv_c"))
    val pp = (ph + pl + pc) / lit(3.0)
    staged.select(col("*"),
      pp.as("pp"),
      (lit(2.0) * pp - pl).as("r1"),
      (lit(2.0) * pp - ph).as("s1"),
      (pp + (ph - pl)).as("r2"),
      (pp - (ph - pl)).as("s2"))
      .drop("__pv_h", "__pv_l", "__pv_c")
  }

  /** Heikin-Ashi bar smoothing (public Japanese candlestick technique):
    * `ha_close = (o+h+l+c)/4`, `ha_open = (ha_open′ + ha_close′)/2` (prior
    * bar's values, seeded from the first bar's `(o+c)/2`), and
    * `ha_high`/`ha_low` = the bar extreme vs both HA prices.
    *
    * The ha_open recurrence IS an EMA: with `z₁ = (o₁+c₁)/2` and
    * `z_t = ha_close_{t−1}`, `ha_open = ema(z, 3)` — α = 2/(3+1) = ½
    * exactly, and the native EMA's first-value seed is exactly z₁. So the
    * whole operator is one native-recurrence window pass over a derived
    * column, no new expression needed.
    *
    * Determinism: every HA value is built from halvings and quarterings
    * of integer-valued bars — dyadic rationals, bit-exact in IEEE
    * doubles until mantissas genuinely fill; the oracle replays the
    * identical op tree so both engines round identically even then. A
    * NULL input bar freezes the recurrence (the §7.1 contract) — the
    * seed branch keys on row_number, never on "previous value was NULL".
    * One keyed exchange. Adds `ha_open`, `ha_high`, `ha_low`,
    * `ha_close`. */
  def heikinAshi(df: DataFrame, openCol: String, highCol: String,
                 lowCol: String, closeCol: String, partCols: Seq[String],
                 orderCols: Seq[String]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("ha_open", "ha_high", "ha_low", "ha_close", "__ha_z", "__ha_rn"),
      "Rolling.heikinAshi")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (o, h, l, c) = (col(openCol).cast("double"), col(highCol).cast("double"),
      col(lowCol).cast("double"), col(closeCol).cast("double"))
    df.withColumn("ha_close", (o + h + l + c) / lit(4.0))
      .withColumn("__ha_rn", row_number().over(seqW))
      // z binds in its own projection so the EMA's window can see it
      .withColumn("__ha_z",
        when(col("__ha_rn") === 1, (o + c) / lit(2.0))
          .otherwise(lag(col("ha_close"), 1).over(seqW)))
      .withColumn("ha_open", graft.functions.FinancialFunctions
        .ema(col("__ha_z"), 3).over(seqW))
      .withColumn("ha_high", greatest(h, col("ha_open"), col("ha_close")))
      .withColumn("ha_low", least(l, col("ha_open"), col("ha_close")))
      .drop("__ha_z", "__ha_rn")
  }

  /** Percentage Price Oscillator (public formula): MACD normalized by the
    * slow EMA — `100 · (ema_fast − ema_slow) / ema_slow` — so momentum is
    * comparable across price levels. Both EMAs are the native recurrence
    * bound in ONE window pass; the oscillator is one fixed IEEE tree.
    * NULL while the EMAs are NULL (each key's leading frozen rows) and on
    * a zero slow EMA. Adds `ppo`. */
  def ppo(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], fast: Int = 12, slow: Int = 26): DataFrame = {
    require(fast >= 1 && slow > fast,
      s"need slow > fast >= 1, got ($fast, $slow)")
    Guards.requireNoReserved(df.columns,
      Seq("ppo", "__ppo_f", "__ppo_s"), "Rolling.ppo")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("double")
    df.select(col("*"),
        graft.functions.FinancialFunctions.ema(x, fast).over(seqW).as("__ppo_f"),
        graft.functions.FinancialFunctions.ema(x, slow).over(seqW).as("__ppo_s"))
      .withColumn("ppo",
        when(col("__ppo_s") =!= 0.0,
          lit(100.0) * (col("__ppo_f") - col("__ppo_s")) / col("__ppo_s")))
      .drop("__ppo_f", "__ppo_s")
  }

  /** TRIX (Hutson 1983, public formula): the 1-bar percentage rate of
    * change of a TRIPLE-smoothed EMA — `100 · (e3 − e3′) / e3′` with
    * `e3 = ema(ema(ema(x, n), n), n)` — a momentum line with the noise
    * of three smoothing passes removed. Each EMA layer is the native
    * recurrence over the previous layer's bound column: three Window
    * passes plus the final lag, ALL on one (partition, order) spec — one
    * exchange, one sort. NULL on each key's first row (no prior e3) and
    * on a zero prior e3. Adds `trix`. */
  def trix(df: DataFrame, valueCol: String, partCols: Seq[String],
           orderCols: Seq[String], n: Int = 15): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("trix", "__e1", "__e2", "__e3", "__pe3"), "Rolling.trix")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ema = graft.functions.FinancialFunctions.ema(_: Column, n)
    // stage the lag once — the percentage tree referenced it 4×
    val prev = col("__pe3")
    df.withColumn("__e1", ema(col(valueCol).cast("double")).over(seqW))
      .withColumn("__e2", ema(col("__e1")).over(seqW))
      .withColumn("__e3", ema(col("__e2")).over(seqW))
      .withColumn("__pe3", lag(col("__e3"), 1).over(seqW))
      .withColumn("trix",
        when(prev.isNotNull && prev =!= 0.0,
          lit(100.0) * (col("__e3") - prev) / prev))
      .drop("__e1", "__e2", "__e3", "__pe3")
  }

  /** Linear weighted moving average (public formula): weights 1..n with
    * the most recent bar heaviest — `Σ i·x_i / (n(n+1)/2)`.
    *
    * Computed in O(1) per row from TWO running frame sums instead of an
    * O(n) per-row weighted fold: with `rn` the key-local row number,
    * `Σ_frame (rn_j − (rn_t − n))·x_j = Σ rn_j·x_j − (rn_t − n)·Σ x_j` —
    * the weight ladder falls out of the global row numbers. Values are
    * quantized to `scale` decimals so both sums are BIGINT-exact under
    * any accumulation order; ONE final IEEE division. NULL until the
    * frame holds n values. One keyed Window pass. Adds `wma`. */
  def wma(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], n: Int, scale: Int = 0): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("wma", "__xi", "__rn", "__rnx"), "Rolling.wma")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val k = math.pow(10, scale)
    val xi = round(col(valueCol).cast("double") * lit(k)).cast("long")
    df.withColumn("__xi", xi)
      .withColumn("__rn", row_number().over(seqW).cast("long"))
      .withColumn("__rnx", col("__rn") * col("__xi"))
      .select(col("*"),
        when(count(col("__xi")).over(w) === n,
          (sum(col("__rnx")).over(w) -
            (col("__rn") - lit(n.toLong)) * sum(col("__xi")).over(w))
            .cast("double") / lit(k * n * (n + 1) / 2.0)).as("wma"))
      .drop("__xi", "__rn", "__rnx")
  }

  /** Hull moving average (Hull 2005, public formula): the lag-corrected
    * smooth — `hma = wma(2·wma(n/2) − wma(n), ⌊√n⌋)`. Both inner WMAs
    * ride the [[wma]] two-running-sum trick (BIGINT-exact); the tiny
    * outer WMA runs over DOUBLES, so it folds the collected ⌊√n⌋-element
    * frame list in order with position weights (the [[cci]] discipline —
    * never a windowed float sum). All passes share one (partition,
    * order) spec: one exchange, one sort. NULL until the outer frame
    * holds ⌊√n⌋ complete inner values. Adds `hma`. */
  def hullMa(df: DataFrame, valueCol: String, partCols: Seq[String],
             orderCols: Seq[String], n: Int, scale: Int = 0): DataFrame = {
    require(n >= 2, s"window must be >= 2, got $n")
    require(scale >= 0)
    val half = n / 2
    val m = math.sqrt(n.toDouble).toInt
    Guards.requireNoReserved(df.columns,
      Seq("hma", "__xi", "__rn", "__rnx", "__h1", "__hl"), "Rolling.hullMa")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val k = math.pow(10, scale)
    val xi = round(col(valueCol).cast("double") * lit(k)).cast("long")
    def wmaExpr(nn: Int): Column = {
      val w = frame(partCols, orderCols, nn)
      when(count(col("__xi")).over(w) === nn,
        (sum(col("__rnx")).over(w) -
          (col("__rn") - lit(nn.toLong)) * sum(col("__xi")).over(w))
          .cast("double") / lit(k * nn * (nn + 1) / 2.0))
    }
    val wm = frame(partCols, orderCols, m)
    df.withColumn("__xi", xi)
      .withColumn("__rn", row_number().over(seqW).cast("long"))
      .withColumn("__rnx", col("__rn") * col("__xi"))
      .withColumn("__h1", lit(2.0) * wmaExpr(half) - wmaExpr(n))
      .withColumn("__hl",
        when(count(col("__h1")).over(wm) === m,
          collect_list(col("__h1")).over(wm)))
      .withColumn("hma",
        aggregate(
          transform(col("__hl"), (x, i) => x * (i + lit(1)).cast("double")),
          lit(0.0), (a, b) => a + b) / lit(m * (m + 1) / 2.0))
      .drop("__xi", "__rn", "__rnx", "__h1", "__hl")
  }

  /** SuperTrend (public formula): ATR envelope with ratcheting bands and
    * a close-crossing trend flip. This wrapper builds the BASIC bands —
    * `mid ± mult·atr` over the [[atr]] SMA-form true-range average — and
    * hands them to the native `supertrend(ub, lb, close)` recurrence
    * ([[graft.functions.WindowIndicators.SuperTrend]]), which runs the
    * sequential ratchet/flip state machine in O(1) state per key. NULL
    * through the ATR warm-up (bands undefined), then seeds on the first
    * banded bar. The ATR pass and the recurrence share one (partition,
    * order) spec — one exchange, one sort. `close >= supertrend` reads
    * as "in an up-trend". Adds `supertrend`. */
  def superTrend(df: DataFrame, highCol: String, lowCol: String,
                 closeCol: String, partCols: Seq[String],
                 orderCols: Seq[String], n: Int, mult: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(mult >= 1, s"band multiplier must be >= 1, got $mult")
    Guards.requireNoReserved(df.columns,
      Seq("supertrend", "atr", "graft_tr", "__st_ub", "__st_lb"),
      "Rolling.superTrend")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (h, l, c) = (col(highCol).cast("double"), col(lowCol).cast("double"),
      col(closeCol).cast("double"))
    val mid = (h + l) / lit(2.0)
    atr(df, highCol, lowCol, closeCol, partCols, orderCols, n)
      .withColumn("__st_ub", mid + lit(mult.toDouble) * col("atr"))
      .withColumn("__st_lb", mid - lit(mult.toDouble) * col("atr"))
      .withColumn("supertrend", graft.functions.FinancialFunctions
        .supertrend(col("__st_ub"), col("__st_lb"), c).over(seqW))
      .drop("__st_ub", "__st_lb", "atr")
  }

  /** Parabolic SAR (Wilder 1978, public formula): the trailing
    * stop-and-reverse parabola, run by the native
    * `psar(high, low, af0, step, max)` recurrence
    * ([[graft.functions.WindowIndicators.Psar]]) — acceleration factors
    * as permille ints (20/20/200 ≡ 0.02/0.02/0.2). First bar per key is
    * NULL (nothing to trail yet); trend seeds on the second bar. One
    * keyed Window pass, O(1) state. `low > psar` reads as "in an
    * up-trend". Adds `psar`. */
  def parabolicSar(df: DataFrame, highCol: String, lowCol: String,
                   partCols: Seq[String], orderCols: Seq[String],
                   af0Pm: Int = 20, stepPm: Int = 20,
                   maxPm: Int = 200): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("psar"), "Rolling.parabolicSar")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("psar", graft.functions.FinancialFunctions
      .psar(col(highCol).cast("double"), col(lowCol).cast("double"),
        af0Pm, stepPm, maxPm).over(seqW))
  }

  /** Awesome Oscillator (Bill Williams, public formula): momentum as the
    * gap between a fast and a slow simple average of the bar MIDPOINT —
    * `ao = sma_f((h+l)/2) − sma_s((h+l)/2)`. Computed from BIGINT sums
    * of `h+l` (twice the midpoint, integer on integer-valued bars):
    * `S_f/(2f) − S_s/(2s)` — two exact sums, two divisions, one
    * subtract. NULL until the SLOW frame fills. One keyed Window pass.
    * Adds `ao`. */
  def awesomeOscillator(df: DataFrame, highCol: String, lowCol: String,
                        partCols: Seq[String], orderCols: Seq[String],
                        fast: Int = 5, slow: Int = 34,
                        scale: Int = 0): DataFrame = {
    require(fast >= 1 && slow > fast,
      s"need slow > fast >= 1, got ($fast, $slow)")
    require(scale >= 0)
    Guards.requireNoReserved(df.columns, Seq("ao", "__m2"),
      "Rolling.awesomeOscillator")
    val k = math.pow(10, scale)
    val m2 = round((col(highCol).cast("double") + col(lowCol).cast("double"))
      * lit(k)).cast("long")
    val wf = frame(partCols, orderCols, fast)
    val ws = frame(partCols, orderCols, slow)
    df.withColumn("__m2", m2)
      .select(col("*"),
        when(count(col("__m2")).over(ws) === slow,
          sum(col("__m2")).over(wf).cast("double") / lit(2.0 * fast * k) -
            sum(col("__m2")).over(ws).cast("double") / lit(2.0 * slow * k))
          .as("ao"))
      .drop("__m2")
  }

  /** Chandelier Exit (LeBeau, public formula): the volatility trailing
    * stop — long stop `max_n(high) − mult·atr_n`, short stop
    * `min_n(low) + mult·atr_n` over the same trailing frame as the
    * [[atr]]. Exact extremes plus the proven ATR tree; NULL until the
    * frame fills. The extremes and the TR average share one
    * (partition, order) spec — one exchange, one sort. Adds
    * `chandelier_long`, `chandelier_short`. */
  def chandelierExit(df: DataFrame, highCol: String, lowCol: String,
                     closeCol: String, partCols: Seq[String],
                     orderCols: Seq[String], n: Int = 22,
                     mult: Int = 3): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(mult >= 1, s"multiplier must be >= 1, got $mult")
    Guards.requireNoReserved(df.columns,
      Seq("chandelier_long", "chandelier_short", "atr", "graft_tr"),
      "Rolling.chandelierExit")
    val w = frame(partCols, orderCols, n)
    val (h, l) = (col(highCol).cast("double"), col(lowCol).cast("double"))
    atr(df, highCol, lowCol, closeCol, partCols, orderCols, n)
      .select(col("*"),
        (max(h).over(w) - lit(mult.toDouble) * col("atr"))
          .as("chandelier_long"),
        (min(l).over(w) + lit(mult.toDouble) * col("atr"))
          .as("chandelier_short"))
      .drop("atr")
  }

  /** Mass Index (Dorsey 1992, public formula): reversal-bulge detector —
    * `Σ₂₅ ema₉(range) / ema₉(ema₉(range))` with `range = high − low`.
    * The two EMA layers are native recurrences on one sort (the [[trix]]
    * layering); the ratio is one IEEE division (NULL on a zero double-
    * smoothed range — degenerate flat market); the 25-bar sum folds the
    * collected frame list in order (the [[cci]] discipline — the terms
    * are genuine doubles). NULL until 25 complete ratios exist. Adds
    * `mass_index`. */
  def massIndex(df: DataFrame, highCol: String, lowCol: String,
                partCols: Seq[String], orderCols: Seq[String],
                emaN: Int = 9, sumN: Int = 25): DataFrame = {
    require(emaN >= 1 && sumN >= 1)
    Guards.requireNoReserved(df.columns,
      Seq("mass_index", "__r", "__e1", "__e2", "__ratio", "__rl"),
      "Rolling.massIndex")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, sumN)
    val ema = graft.functions.FinancialFunctions.ema(_: Column, emaN)
    df.withColumn("__r",
        col(highCol).cast("double") - col(lowCol).cast("double"))
      .withColumn("__e1", ema(col("__r")).over(seqW))
      .withColumn("__e2", ema(col("__e1")).over(seqW))
      .withColumn("__ratio",
        when(col("__e2") =!= 0.0, col("__e1") / col("__e2")))
      .withColumn("__rl",
        when(count(col("__ratio")).over(w) === sumN,
          collect_list(col("__ratio")).over(w)))
      .withColumn("mass_index",
        aggregate(col("__rl"), lit(0.0), (a, b) => a + b))
      .drop("__r", "__e1", "__e2", "__ratio", "__rl")
  }

  /** Know Sure Thing (Pring, public formula): four rate-of-change
    * horizons, each SMA-smoothed, blended 1:2:3:4 —
    * `kst = Σᵢ i · sma_{mᵢ}(roc_{pᵢ})` with the standard daily params
    * (10/15/20/30 ROC, 10/10/10/15 SMA). Each ROC is one IEEE tree off a
    * lag; each smoothing folds its collected frame list in order (ROCs
    * are genuine doubles — the [[cci]] discipline); the blend is one
    * fixed left-associated tree. NULL until every branch's frame holds
    * its full complement of ROCs. All lags, frames, and folds share one
    * (partition, order) spec — one exchange, one sort. Adds `kst`. */
  def kst(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String],
          rocPeriods: Seq[Int] = Seq(10, 15, 20, 30),
          smaPeriods: Seq[Int] = Seq(10, 10, 10, 15)): DataFrame = {
    require(rocPeriods.length == 4 && smaPeriods.length == 4,
      "kst takes exactly four (roc, sma) branch periods")
    require((rocPeriods ++ smaPeriods).forall(_ >= 1))
    val internals = (1 to 4).flatMap(i =>
      Seq(s"__roc$i", s"__s$i", s"__kb$i"))
    Guards.requireNoReserved(df.columns, "kst" +: internals,
      "Rolling.kst")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("double")
    def fold(lst: Column): Column = aggregate(lst, lit(0.0), (a, b) => a + b)
    // stage the four ROC base lags once (each was referenced 3× in its
    // ROC tree — 12 lag window expressions before the split)
    val lagged = df.select(col("*") +: rocPeriods.zipWithIndex.map {
      case (p, i) => lag(x, p).over(seqW).as(s"__kb${i + 1}")
    }: _*)
    val withRocs = lagged.select(col("*") +: (1 to 4).map { i =>
      val base = col(s"__kb$i")
      when(base.isNotNull && base =!= 0.0,
        lit(100.0) * (x - base) / base).as(s"__roc$i")
    }: _*)
    val withSmas = withRocs.select(col("*") +: smaPeriods.zipWithIndex.map {
      case (m, i) =>
        val w = frame(partCols, orderCols, m)
        val r = col(s"__roc${i + 1}")
        (fold(when(count(r).over(w) === m, collect_list(r).over(w))) /
          lit(m.toDouble)).as(s"__s${i + 1}")
    }: _*)
    withSmas
      .withColumn("kst",
        col("__s1") + lit(2.0) * col("__s2") + lit(3.0) * col("__s3") +
          lit(4.0) * col("__s4"))
      .drop(internals: _*)
  }

  /** Coppock Curve (Coppock 1962, public formula): the long-horizon
    * momentum bottom-finder — `wma₁₀(roc₁₄ + roc₁₁)` (periods in BARS
    * here; Coppock's original ran on months). The ROC sum is one IEEE
    * tree; the weighted smooth folds the collected 10-element frame list
    * with position weights (doubles — the [[hullMa]] outer-pass
    * discipline). NULL until ten complete ROC sums exist. One keyed
    * exchange. Adds `coppock`. */
  def coppock(df: DataFrame, valueCol: String, partCols: Seq[String],
              orderCols: Seq[String], wmaN: Int = 10, roc1: Int = 14,
              roc2: Int = 11): DataFrame = {
    require(wmaN >= 1 && roc1 >= 1 && roc2 >= 1)
    Guards.requireNoReserved(df.columns,
      Seq("coppock", "__rsum", "__rl", "__cop_b1", "__cop_b2"),
      "Rolling.coppock")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, wmaN)
    val x = col(valueCol).cast("double")
    // stage the two ROC base lags once (each was referenced 3× in its
    // ROC tree — six window expressions for two lags)
    val lagged = df.select(col("*"),
      lag(x, roc1).over(seqW).as("__cop_b1"),
      lag(x, roc2).over(seqW).as("__cop_b2"))
    def roc(base: Column): Column =
      when(base.isNotNull && base =!= 0.0, lit(100.0) * (x - base) / base)
    lagged
      .withColumn("__rsum", roc(col("__cop_b1")) + roc(col("__cop_b2")))
      .drop("__cop_b1", "__cop_b2")
      .withColumn("__rl",
        when(count(col("__rsum")).over(w) === wmaN,
          collect_list(col("__rsum")).over(w)))
      .withColumn("coppock",
        aggregate(
          transform(col("__rl"), (v, i) => v * (i + lit(1)).cast("double")),
          lit(0.0), (a, b) => a + b) / lit(wmaN * (wmaN + 1) / 2.0))
      .drop("__rsum", "__rl")
  }

  /** Trailing-n VWAP (volume-weighted average price):
    * `Σ(price·volume) / Σ(volume)` over the frame, NULL until it fills.
    *
    * Determinism — the money-safe formulation: prices/volumes are
    * quantized to `priceScale`/`volScale` decimals and summed as BIGINTs,
    * which are exact in any engine under ANY accumulation order (double
    * sums of 2-decimal prices differ in the last ulp between a fresh
    * per-frame sum and a segment-tree sliding sum — measured, not
    * hypothetical); only the single final division runs in IEEE doubles.
    * Adds `vwap`. */
  def vwap(df: DataFrame, priceCol: String, volCol: String,
           partCols: Seq[String], orderCols: Seq[String], n: Int,
           priceScale: Int = 2, volScale: Int = 0): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(priceScale >= 0 && volScale >= 0)
    Guards.requireNoReserved(df.columns,
      Seq("vwap", "__vw_n", "__vw_sv", "__vw_spv"), "Rolling.vwap")
    val w = frame(partCols, orderCols, n)
    val pInt = round(col(priceCol).cast("double") * lit(math.pow(10, priceScale)))
      .cast("long")
    val vInt = round(col(volCol).cast("double") * lit(math.pow(10, volScale)))
      .cast("long")
    val pv = pInt * vInt
    // A full frame whose TOTAL scaled volume is zero has no defined VWAP;
    // guard it explicitly so the NULL is an intentional contract (frame
    // not full, or zero volume) rather than Spark's silent ÷0→NULL.
    // The three frame sums are staged once (the volume sum appeared
    // twice — one extra sliding re-fold per row inlined).
    val staged = df.select(col("*"),
      count(pv).over(w).as("__vw_n"),
      sum(vInt).over(w).as("__vw_sv"),
      sum(pv).over(w).as("__vw_spv"))
    staged.withColumn("vwap",
      when(col("__vw_n") === n && col("__vw_sv") =!= 0L,
        col("__vw_spv").cast("double") /
          (lit(math.pow(10, priceScale)) * col("__vw_sv").cast("double"))))
      .drop("__vw_n", "__vw_sv", "__vw_spv")
  }

  /** Accumulation/Distribution Line (Chaikin, public formula): the
    * running sum of money-flow volume `mfm · vol` with
    * `mfm = ((c − l) − (h − c)) / (h − l)` (0 on a flat bar) — the
    * close-location-weighted volume flow that [[cmf]] ratios over a
    * frame, here accumulated over the key's whole history.
    *
    * Determinism — the [[obv]] discipline: each bar's money-flow volume
    * is quantized to `scale` decimals and the running total is a BIGINT
    * sum (exact in any engine under any accumulation order); the single
    * final descale division is IEEE. A bar whose MFV rounds to zero at
    * `scale` is a deliberate no-op tick. One keyed Window pass. Adds
    * `adl` (DOUBLE, volume units). */
  def adl(df: DataFrame, highCol: String, lowCol: String, closeCol: String,
          volCol: String, partCols: Seq[String], orderCols: Seq[String],
          scale: Int = 2): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns, Seq("adl"), "Rolling.adl")
    val running = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val (h, l, c) =
      (col(highCol).cast("double"), col(lowCol).cast("double"),
        col(closeCol).cast("double"))
    val vd = col(volCol).cast("double")
    val mfm = when(h =!= l, ((c - l) - (h - c)) / (h - l)).otherwise(lit(0.0))
    val mfvInt = round(mfm * vd * lit(math.pow(10, scale))).cast("long")
    df.withColumn("adl",
      sum(mfvInt).over(running).cast("double") / lit(math.pow(10, scale)))
  }

  /** Chaikin Oscillator (public formula): `ema(adl, fast) − ema(adl,
    * slow)` — the momentum of the [[adl]] accumulation line, the classic
    * 3/10 volume-flow divergence signal. The ADL layer is the exact
    * BIGINT cumsum above; both EMAs are the NATIVE `ema` recurrence over
    * the bound `adl` column, so the whole chain shares ONE (partition,
    * order) spec: one hash exchange, one sort, three Window passes.
    * Emits from each key's first row (both EMAs seed on it). Adds
    * `chaikin_osc` (and the intermediate `adl`). */
  def chaikinOsc(df: DataFrame, highCol: String, lowCol: String,
                 closeCol: String, volCol: String, partCols: Seq[String],
                 orderCols: Seq[String], fast: Int = 3, slow: Int = 10,
                 scale: Int = 2): DataFrame = {
    require(fast >= 1 && slow > fast,
      s"need slow > fast >= 1, got ($fast, $slow)")
    Guards.requireNoReserved(df.columns,
      Seq("adl", "chaikin_osc", "__co_f", "__co_s"), "Rolling.chaikinOsc")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val ema = graft.functions.FinancialFunctions.ema(_: Column, _: Int)
    adl(df, highCol, lowCol, closeCol, volCol, partCols, orderCols, scale)
      .select(col("*"),
        ema(col("adl"), fast).over(seqW).as("__co_f"),
        ema(col("adl"), slow).over(seqW).as("__co_s"))
      .withColumn("chaikin_osc", col("__co_f") - col("__co_s"))
      .drop("__co_f", "__co_s")
  }

  /** Ulcer Index (Martin 1987, public formula): the RMS of percentage
    * drawdowns from the trailing n-bar high —
    * `sqrt(Σ d²/n)` with `d = 100·(c − max_n) / max_n` per bar — the
    * downside-only volatility gauge (a calm rally scores 0 where σ
    * penalizes it).
    *
    * Window-over-window: pass one binds each bar's drawdown vs its OWN
    * trailing-n max (exact extremes + one fixed IEEE tree; NULL until
    * the frame fills and on a zero/negative max); pass two folds the
    * collected n drawdown squares IN FRAME ORDER (doubles — the [[cci]]
    * discipline; a windowed `sum` would differ cross-engine in the last
    * ulp), one IEEE divide + correctly-rounded sqrt. Both passes share
    * one (partition, order) spec. NULL until n complete drawdowns
    * exist (first emit at bar 2n−1). Adds `ulcer`. */
  def ulcerIndex(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String], n: Int = 14): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("ulcer", "__ui_dd", "__ui_l", "__ui_n", "__ui_mx"),
      "Rolling.ulcerIndex")
    val w = frame(partCols, orderCols, n)
    val x = col(valueCol).cast("double")
    // stage the frame max once (it appeared 3× — sliding max re-folds
    // the frame per row)
    val staged = df.select(col("*"),
      count(x).over(w).as("__ui_n"),
      max(x).over(w).as("__ui_mx"))
    val mx = col("__ui_mx")
    val dd = when(col("__ui_n") === n && mx > 0.0,
      lit(100.0) * (x - mx) / mx)
    staged.withColumn("__ui_dd", dd)
      .drop("__ui_n", "__ui_mx")
      .withColumn("__ui_l",
        when(count(col("__ui_dd")).over(w) === n,
          collect_list(col("__ui_dd") * col("__ui_dd")).over(w)))
      .withColumn("ulcer",
        sqrt(aggregate(col("__ui_l"), lit(0.0), (a, b) => a + b) /
          lit(n.toDouble)))
      .drop("__ui_dd", "__ui_l")
  }

  /** Ease of Movement (Arms, public formula): how far price moves per
    * unit of volume — `emv = dm · (h − l) / vol` with the midpoint move
    * `dm = ((h + l) − (ph + pl)) / 2`, smoothed by an n-bar SMA. High
    * EOM = large moves on thin volume (low resistance); near 0 = churn.
    *
    * `emv` is NULL on each key's first bar (no prior midpoint) and on a
    * zero-volume bar (no defined ratio — explicit guard, not a silent
    * ÷0). The smooth folds the collected n-element frame list in order
    * (doubles — the [[cci]] discipline). Lag and fold share one
    * (partition, order) spec. Adds `eom`. */
  def easeOfMovement(df: DataFrame, highCol: String, lowCol: String,
                     volCol: String, partCols: Seq[String],
                     orderCols: Seq[String], n: Int = 14): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("eom", "__emv", "__emv_l", "__eom_ph", "__eom_pl"),
      "Rolling.easeOfMovement")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val (h, l) = (col(highCol).cast("double"), col(lowCol).cast("double"))
    val vd = col(volCol).cast("double")
    // stage the two lags once — the emv tree referenced ph twice
    val (ph, pl) = (col("__eom_ph"), col("__eom_pl"))
    val dm = ((h + l) - (ph + pl)) / lit(2.0)
    val emv = when(ph.isNotNull && vd =!= 0.0, dm * (h - l) / vd)
    df.withColumn("__eom_ph", lag(h, 1).over(seqW))
      .withColumn("__eom_pl", lag(l, 1).over(seqW))
      .withColumn("__emv", emv)
      .withColumn("__emv_l",
        when(count(col("__emv")).over(w) === n,
          collect_list(col("__emv")).over(w)))
      .withColumn("eom",
        aggregate(col("__emv_l"), lit(0.0), (a, b) => a + b) /
          lit(n.toDouble))
      .drop("__emv", "__emv_l", "__eom_ph", "__eom_pl")
  }

  /** Kaufman Adaptive Moving Average (Kaufman 1995, public formula): an
    * EMA whose smoothing constant tracks trend efficiency —
    * `ER = |x_t − x_{t−n}| / Σ_{i=t−n+1..t} |x_i − x_{i−1}|` (net move
    * over path length; 0 when the path length is 0, i.e. a flat window),
    * `sc = (ER·(α_f − α_s) + α_s)²` with `α = 2/(p+1)` for the fast/slow
    * periods, then `kama' = sc·x + (1 − sc)·kama` — trending markets get
    * the fast EMA, choppy ones the slow.
    *
    * The recurrence is the NATIVE `var_ema` window expression
    * ([[graft.functions.VarEma]] — the [[graft.functions.Ema]] update
    * tree with the row's own `sc`); the path-length denominator folds the
    * collected n-diff frame list IN ORDER (doubles — the [[cci]]
    * discipline), the rest is one fixed IEEE tree. `sc` is NULL until n
    * consecutive diffs exist, so the machine seeds `kama = x` on each
    * key's bar n+1 (the textbook schedule) and is frozen before that.
    * Two Window passes (diff layer, then fold + recurrence) over ONE
    * (partition, order) spec — one exchange, one sort. Adds `kama`. */
  def kama(df: DataFrame, valueCol: String, partCols: Seq[String],
           orderCols: Seq[String], n: Int = 10, fast: Int = 2,
           slow: Int = 30): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    require(fast >= 1 && slow > fast,
      s"need slow > fast >= 1, got ($fast, $slow)")
    Guards.requireNoReserved(df.columns,
      Seq("kama", "__ka_d", "__ka_sc", "__ka_l", "__ka_c", "__ka_pn"),
      "Rolling.kama")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val w = frame(partCols, orderCols, n)
    val x = col(valueCol).cast("double")
    val aF = lit(2.0) / lit(fast + 1.0)
    val aS = lit(2.0) / lit(slow + 1.0)
    val d = abs(x - lag(x, 1).over(seqW))
    // stage the frame list / count / n-lag once: the inlined er tree
    // referenced the collected frame TWICE, so the n-row list was built
    // per row twice (one window expression per reference)
    val staged = df.withColumn("__ka_d", d)
      .select(col("*"),
        collect_list(col("__ka_d")).over(w).as("__ka_l"),
        count(col("__ka_d")).over(w).as("__ka_c"),
        lag(x, n).over(seqW).as("__ka_pn"))
    val sc = {
      val vol = aggregate(col("__ka_l"), lit(0.0), (a, b) => a + b)
      val er = when(vol =!= 0.0, abs(x - col("__ka_pn")) / vol)
        .otherwise(lit(0.0))
      val base = er * (aF - aS) + aS
      // the count guard must wrap the WHOLE sc tree: an unfilled frame
      // must yield NULL (frozen state), not the er=0 slow-alpha branch
      when(col("__ka_c") === n, base * base)
    }
    staged.withColumn("__ka_sc", sc)
      .withColumn("kama",
        graft.functions.FinancialFunctions.varEma(x, col("__ka_sc"))
          .over(seqW))
      .drop("__ka_d", "__ka_sc", "__ka_l", "__ka_c", "__ka_pn")
  }

  /** Drawdown-episode table: one row per maximal run of below-peak bars
    * — the episode view behind [[drawdown]]'s per-bar depth and
    * [[drawdownDuration]]'s per-bar clock: `start`/`end` order keys,
    * `trough` (the episode's lowest value and the bar that set it),
    * `peak` (the high-water mark the episode fell from), `depth_pct`
    * (`100·(peak − trough)/peak`), and `duration` in bars. The risk
    * report ("the five worst drawdowns, how deep, how long") reads
    * straight off this frame.
    *
    * Determinism: values quantize to `scale` decimals (BIGINT), the
    * running peak is an exact integer extreme, the underwater flag an
    * integer compare (a re-touch EQUAL to the peak ends the episode —
    * the high-water-mark convention), and episodes are gaps-and-islands
    * (`count(at-peak rows) so-far` as the island id — pure integers).
    * Trough tie-break: the EARLIEST bar at the minimum (struct-min on
    * (value, order)). The single IEEE op is the final depth division.
    * Two same-spec window passes + one groupBy on (key, island): two
    * exchanges. Emits (`partCols…`, `start`, `end`, `trough_at`,
    * `peak`, `trough`, `depth_pct`, `duration`). */
  def drawdownEpisodes(df: DataFrame, valueCol: String,
                       partCols: Seq[String], orderCol: String,
                       scale: Int = 2): DataFrame = {
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("start", "end", "trough_at", "peak", "trough", "depth_pct",
        "duration", "__ci", "__pk", "__uw", "__isl"),
      "Rolling.drawdownEpisodes")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(orderCol))
    val running = seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = lit(math.pow(10, scale))
    val ci = round(col(valueCol).cast("double") * k).cast("long")
    val pk = max(ci).over(running)
    val flagged = df
      .withColumn("__ci", ci)
      .withColumn("__pk", pk)
      .withColumn("__uw", (col("__ci") < col("__pk")).cast("long"))
    val islands = flagged.withColumn("__isl",
      sum(lit(1L) - col("__uw")).over(running))
    islands.filter(col("__uw") === 1L)
      .groupBy(partCols.map(col) :+ col("__isl"): _*)
      .agg(
        min(col(orderCol)).as("start"),
        max(col(orderCol)).as("end"),
        min(struct(col("__ci"), col(orderCol))).as("__tr"),
        min(col("__pk")).as("__peak"), // constant within the island
        count(lit(1)).as("duration"))
      .select(partCols.map(col) :+
        col("start") :+ col("end") :+
        col("__tr").getField(orderCol).as("trough_at") :+
        (col("__peak").cast("double") / k).as("peak") :+
        (col("__tr").getField("__ci").cast("double") / k).as("trough") :+
        when(col("__peak") =!= 0L,
          lit(100.0) * (col("__peak") - col("__tr").getField("__ci")).cast("double") /
            col("__peak").cast("double")).as("depth_pct") :+
        col("duration"): _*)
  }

  /** Negative & Positive Volume Indexes (Fosback, public formula): two
    * compound-growth lines that apply each bar's simple return only on
    * falling-volume bars (NVI — "smart money" days) or rising-volume
    * bars (PVI — crowd days): `idx' = idx · (1 + ret)` when the volume
    * condition holds, else `idx' = idx`; both start at `base`.
    *
    * The multiplicative recurrence is the NATIVE `runprod` window
    * expression ([[graft.functions.RunProd]]) over a caller-side factor
    * column — each factor is a fixed IEEE tree (`1 + (c − pc)/pc`, 1.0
    * on the condition's complement, the first bar, and a zero prior
    * close), and the product chain replays bit-exactly in any engine
    * with the same op order (a log/exp rewrite would put libm in the
    * data path — see the expression's scaladoc). One keyed Window pass
    * computes the lags; the recurrences share the spec. Adds `nvi`,
    * `pvi` (both DOUBLE, in `base` units). */
  def volumeIndexes(df: DataFrame, closeCol: String, volCol: String,
                    partCols: Seq[String], orderCols: Seq[String],
                    base: Double = 1000.0): DataFrame = {
    require(base > 0.0, s"base must be > 0, got $base")
    Guards.requireNoReserved(df.columns,
      Seq("nvi", "pvi", "__vi_fn", "__vi_fp", "__vi_pc", "__vi_pv"),
      "Rolling.volumeIndexes")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val c = col(closeCol).cast("double")
    val v = col(volCol).cast("double")
    // stage the two lags once — their inlined references (pc appeared 4×
    // per factor) each expanded to a separate window expression
    val staged = df.select(col("*"),
      lag(c, 1).over(seqW).as("__vi_pc"),
      lag(v, 1).over(seqW).as("__vi_pv"))
    val (pc, pv) = (col("__vi_pc"), col("__vi_pv"))
    val ret = (c - pc) / pc
    def factor(cond: Column): Column =
      when(pv.isNotNull && cond && pc.isNotNull && pc =!= 0.0,
        lit(1.0) + ret).otherwise(lit(1.0))
    val rp = graft.functions.FinancialFunctions.runprod(_: Column)
    staged.withColumn("__vi_fn", factor(v < pv))
      .withColumn("__vi_fp", factor(v > pv))
      .select(col("*"),
        (lit(base) * rp(col("__vi_fn")).over(seqW)).as("nvi"),
        (lit(base) * rp(col("__vi_fp")).over(seqW)).as("pvi"))
      .drop("__vi_fn", "__vi_fp", "__vi_pc", "__vi_pv")
  }

  /** Renko brick level (public charting technique): price snapped to a
    * fixed-brick grid via the NATIVE `renko` recurrence
    * ([[graft.functions.Renko]]) — the level only moves when price
    * travels ≥ one full brick from it, so chop inside a brick freezes
    * the line and every change is a confirmed ≥ brick move. One keyed
    * Window pass, O(1) state. Adds `renko` (DOUBLE, price units). */
  def renkoLevel(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String], brickCenti: Int): DataFrame = {
    require(brickCenti >= 1, s"brick_centi must be >= 1, got $brickCenti")
    Guards.requireNoReserved(df.columns, Seq("renko"), "Rolling.renkoLevel")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("renko",
      graft.functions.FinancialFunctions
        .renko(col(valueCol).cast("double"), brickCenti).over(seqW))
  }

  /** Williams Fractals (public formula): strict local extremes over a
    * ±`wings` neighborhood — a bar is a fractal high when its high
    * strictly exceeds the `wings` bars on BOTH sides (lows mirrored).
    * The standard swing-point / support-resistance primitive; strictness
    * means tied plateaus produce NO fractal (deterministic, no
    * arbitrary tie side). Emits the extreme's price in `fractal_high` /
    * `fractal_low`, NULL elsewhere and within `wings` bars of each key's
    * edges (neighbors missing — a fractal needs its full neighborhood).
    * One keyed Window pass of 4·wings shifts, pure comparisons, no
    * state. */
  def fractals(df: DataFrame, highCol: String, lowCol: String,
               partCols: Seq[String], orderCols: Seq[String],
               wings: Int = 2): DataFrame = {
    require(wings >= 1, s"wings must be >= 1, got $wings")
    Guards.requireNoReserved(df.columns,
      Seq("fractal_high", "fractal_low"), "Rolling.fractals")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val h = col(highCol).cast("double")
    val l = col(lowCol).cast("double")
    val isHigh = (1 to wings).map { i =>
      h > lag(h, i).over(seqW) && h > lead(h, i).over(seqW)
    }.reduce(_ && _)
    val isLow = (1 to wings).map { i =>
      l < lag(l, i).over(seqW) && l < lead(l, i).over(seqW)
    }.reduce(_ && _)
    df.withColumn("fractal_high", when(isHigh, h))
      .withColumn("fractal_low", when(isLow, l))
  }

  /** Balance of Power (Livermore via Worden, public formula): per-bar
    * buyer/seller dominance `(c − o) / (h − l)` in [−1, 1] (0 on a flat
    * bar — no range, no winner), smoothed by an n-bar SMA. A persistent
    * positive BOP = closes pinned near highs (buyers absorbing supply).
    *
    * One fixed IEEE tree per bar; the smooth folds the collected frame
    * list in order (doubles — the [[cci]] discipline). One keyed Window
    * pass. NULL until the frame fills. Adds `bop`. */
  def balanceOfPower(df: DataFrame, openCol: String, highCol: String,
                     lowCol: String, closeCol: String,
                     partCols: Seq[String], orderCols: Seq[String],
                     n: Int = 14): DataFrame = {
    require(n >= 1, s"window must be >= 1, got $n")
    Guards.requireNoReserved(df.columns,
      Seq("bop", "__bop_r", "__bop_l"), "Rolling.balanceOfPower")
    val w = frame(partCols, orderCols, n)
    val (o, h, l, c) =
      (col(openCol).cast("double"), col(highCol).cast("double"),
        col(lowCol).cast("double"), col(closeCol).cast("double"))
    val raw = when(h =!= l, (c - o) / (h - l)).otherwise(lit(0.0))
    df.withColumn("__bop_r", raw)
      .withColumn("__bop_l",
        when(count(col("__bop_r")).over(w) === n,
          collect_list(col("__bop_r")).over(w)))
      .withColumn("bop",
        aggregate(col("__bop_l"), lit(0.0), (a, b) => a + b) /
          lit(n.toDouble))
      .drop("__bop_r", "__bop_l")
  }

  /** How many decimal digits the twiddle factors keep — every cos/sin is
    * baked driver-side as `round(cos(2π·phase/p)·10^12)`, an integer
    * LITERAL in both the Spark plan and the DuckDB oracle, so engine
    * libm differences can never surface (the ndcg-discount discipline,
    * promoted from baked doubles to baked integers). */
  val HarmonicCosScale = 12

  /** The baked twiddle table for [[harmonicPower]]: (period, phase,
    * ci, si) rows with ci = round(cos(2π·phase/period)·10^12). Public so
    * the oracle builder can emit the IDENTICAL integers as SQL VALUES. */
  def harmonicTwiddles(periods: Seq[Int]): Seq[(Int, Int, Long, Long)] = {
    val k = math.pow(10, HarmonicCosScale)
    for (p <- periods; ph <- 0 until p) yield {
      val a = 2.0 * math.Pi * ph.toDouble / p.toDouble
      (p, ph, math.round(math.cos(a) * k), math.round(math.sin(a) * k))
    }
  }

  /** Mean-removed periodogram power at a literal set of INTEGER periods
    * per key — the seasonality detector (is there a weekly/monthly cycle
    * in this series, and how strong): for period p,
    * `I(p) = ((Σ(x−μ)cos_t)² + (Σ(x−μ)sin_t)²) / n` with
    * cos_t = cos(2π·t/p) over the row index t. Run it before committing
    * to a seasonal model ([[Resample.seasonalDecompose]]'s period
    * argument comes from this table's argmax).
    *
    * Exactness: x quantizes to scaled BIGINTs; the twiddle factors are
    * baked 12-dp INTEGERS ([[harmonicTwiddles]]), so every product is
    * exact decimal arithmetic; mean removal multiplies through by n
    * (`n·Σx·c − S·Σc` — all integers, Σc itself an exact integer sum of
    * baked values), and only the two final centered sums cast to double
    * before the fixed square/add/divide tree. NULL values are dropped
    * before indexing (frozen≡filtered). NULL power on an empty key.
    *
    * Plan shape: ONE keyed sort (row_number), one explode to
    * (key, period) terms, one map-side-combinable aggregate → tiny
    * (keys × periods) frame. Emits (partCols…, `period`, `n`, `power`),
    * power in descaled value² units. */
  def harmonicPower(df: DataFrame, valueCol: String, partCols: Seq[String],
                    orderCols: Seq[String], periods: Seq[Int],
                    scale: Int = 0): DataFrame = {
    require(periods.nonEmpty, "harmonicPower needs at least one period")
    require(periods.forall(_ >= 2), s"periods must be >= 2, got $periods")
    require(periods.distinct.size == periods.size, "duplicate periods")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("period", "n", "power", "__x", "__t", "__h"),
      "Rolling.harmonicPower")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val twiddles = harmonicTwiddles(periods)
    val base = df.filter(xi.isNotNull)
      .select((partCols.map(col) :+ xi.as("__x")) :+
        (row_number().over(w) - lit(1)).cast("long").as("__t"): _*)
    // per period: the phase lookup is element_at over a p-element literal
    // array — O(1) per row, no join
    val terms = base.select(
      (partCols.map(col) :+ col("__x") :+
        explode(array(periods.map { p =>
          val cs = twiddles.filter(_._1 == p).sortBy(_._2)
          val ph = (col("__t") % lit(p.toLong)).cast("int")
          struct(lit(p).as("period"),
            element_at(array(cs.map(t => lit(t._3)): _*), ph + lit(1))
              .as("ci"),
            element_at(array(cs.map(t => lit(t._4)): _*), ph + lit(1))
              .as("si"))
        }: _*)).as("__h")): _*)
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val x = col("__x")
    val sums = terms.groupBy(
        (partCols.map(col) :+ col("__h.period").as("period")): _*)
      .agg(count(lit(1)).as("n"),
        dec(x).as("__s"),
        sum(x.cast("decimal(38,0)") * col("__h.ci")).as("__sc"),
        sum(x.cast("decimal(38,0)") * col("__h.si")).as("__ss"),
        dec(col("__h.ci")).as("__tc"),
        dec(col("__h.si")).as("__ts"))
    val nDec = col("n").cast("decimal(38,0)")
    val a = (nDec * col("__sc") - col("__s") * col("__tc")).cast("double")
    val b = (nDec * col("__ss") - col("__s") * col("__ts")).cast("double")
    val d = col("n").cast("double") *
      lit(math.pow(10, HarmonicCosScale + scale))
    val ca = a / d
    val cb = b / d
    sums.select((partCols.map(col) :+ col("period") :+ col("n") :+
      when(col("n") >= 1L,
        (ca * ca + cb * cb) / col("n").cast("double")).as("power")): _*)
  }

  /** Croston's method for intermittent demand (public formula): over a
    * key's SPARSE demand series (rows exist only on demand days), two
    * exponential recurrences — demand size `z' = α·x + (1−α)z` and
    * inter-demand interval `p' = α·q + (1−α)p` (q in days) — give the
    * per-period forecast `z/p`. The standard slow-mover/spare-parts
    * forecaster where plain EMA over a densified grid drowns in zeros.
    *
    * Both recurrences run as the NATIVE `var_ema` window (O(1) state
    * per key, frozen-NULL seeding: p seeds at the SECOND demand row
    * since the first has no interval), sharing ONE keyed sort with the
    * interval lag. `dateCol` must be a date (intervals are exact
    * integer day gaps). `croston` is NULL until both recurrences are
    * live. Adds (`croston_z`, `croston_p`, `croston`). */
  def croston(df: DataFrame, valueCol: String, dateCol: String,
              partCols: Seq[String], orderCols: Seq[String],
              alphaPm: Int = 100): DataFrame = {
    require(alphaPm >= 1 && alphaPm <= 1000,
      s"alpha permille must be in [1,1000], got $alphaPm")
    Guards.requireNoReserved(df.columns,
      Seq("croston_z", "croston_p", "croston", "__q"), "Rolling.croston")
    val a = lit(alphaPm / 1000.0)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val q = datediff(col(dateCol),
      lag(col(dateCol), 1).over(w)).cast("double")
    df.withColumn("__q", q)
      .withColumn("croston_z",
        graft.functions.FinancialFunctions
          .varEma(col(valueCol).cast("double"), a).over(w))
      .withColumn("croston_p",
        graft.functions.FinancialFunctions.varEma(col("__q"), a).over(w))
      .withColumn("croston",
        col("croston_z") / when(col("croston_p") > 0.0, col("croston_p")))
      .drop("__q")
  }

  /** EWMA control chart (public SPC formulation): the smoothed monitor
    * `z_t = λx_t + (1−λ)z_{t−1}` seeded at the SERIES MEAN `μ0` (the
    * textbook target seed, not [[graft.functions.FinancialFunctions.varEma]]'s
    * first-value seed), with the exact time-varying limits
    * `μ0 ± L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t}))` — tighter early, widening to
    * the asymptote. The small-persistent-shift detector beside
    * [[graft.streaming.StreamingCusum]]'s jump detector and
    * [[Anomaly.zscoreOutliers]]' pointwise screen.
    *
    * Determinism: values quantize to `scale` decimals; μ0 and the
    * population σ come from exact per-key integer sums (one map-side
    * aggregate joined back — the winsorize stats-frame shape). The
    * μ0-seed rides on TWO native recurrences sharing one keyed sort:
    * `y = var_ema(x, λ)` (x₁-seeded) and the decay power
    * `p_t = (1−λ)^t` as a `runprod` of the constant factor; then
    * `z_t = y_t + p_t·(μ0 − x₁)` — algebraically the μ0-seeded
    * recurrence, evaluated as one fixed tree the oracle replays. The
    * variance factor reuses `p` as `1 − p²` (no pow, no libm
    * divergence). NULL-value rows follow varEma's frozen-state
    * contract; `orderCols` must totally order each key. Adds
    * (`ewma`, `ewma_ucl`, `ewma_lcl`, `ewma_ooc`) in input units. */
  def ewmaChart(df: DataFrame, valueCol: String, partCols: Seq[String],
                orderCols: Seq[String], lambdaPm: Int = 200,
                l: Double = 3.0, scale: Int = 0): DataFrame = {
    require(lambdaPm >= 1 && lambdaPm <= 999,
      s"lambda permille must be in [1,999], got $lambdaPm")
    require(l > 0.0, s"control-limit width L must be > 0, got $l")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("ewma", "ewma_ucl", "ewma_lcl", "ewma_ooc",
        "__xq", "__n", "__sx", "__sxx", "__mu", "__sig", "__y", "__p"),
      "Rolling.ewmaChart")
    val lam = lambdaPm / 1000.0
    val om = 1.0 - lam
    val ratio = lam / (2.0 - lam)
    val pow10 = math.pow(10, scale)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(pow10)).cast("long")
    val keyed = df.withColumn("__xq", xi)
    val stats = keyed.groupBy(partCols.map(col): _*).agg(
      count(col("__xq")).as("__n"),
      sum(col("__xq")).as("__sx"),
      sum(col("__xq").cast("decimal(38,0)") * col("__xq")).as("__sxx"))
    val nDec = col("__n").cast("decimal(38,0)")
    val cxx = (nDec * col("__sxx") -
      col("__sx").cast("decimal(38,0)") * col("__sx")).cast("double")
    val statsCols = stats.select((partCols.map(col) :+
      (col("__sx").cast("double") / col("__n").cast("double")).as("__mu") :+
      (sqrt(cxx) / col("__n").cast("double")).as("__sig")): _*)
    val x = col("__xq").cast("double")
    val z = col("__y") +
      col("__p") * (col("__mu") - first(x, ignoreNulls = true).over(w))
    val hw = lit(l) * col("__sig") *
      sqrt(lit(ratio) * (lit(1.0) - col("__p") * col("__p")))
    keyed
      .join(statsCols, partCols)
      .withColumn("__y",
        graft.functions.FinancialFunctions.varEma(x, lit(lam)).over(w))
      .withColumn("__p", graft.functions.FinancialFunctions
        .runprod(lit(om)).over(w))
      .withColumn("ewma", z / lit(pow10))
      .withColumn("ewma_ucl", (col("__mu") + hw) / lit(pow10))
      .withColumn("ewma_lcl", (col("__mu") - hw) / lit(pow10))
      .withColumn("ewma_ooc", abs(z - col("__mu")) > hw)
      .drop("__xq", "__mu", "__sig", "__y", "__p")
  }

  /** Rolling Sharpe ratio over a trailing n-return frame — the windowed
    * companion to [[riskRatios]]' whole-series readout: per row,
    * `mean(r)/stddev(r)` over the last n returns (population σ, the
    * RiskMetrics convention; multiply by `annualize` for yearly units).
    * The regime monitor: a strategy whose rolling Sharpe decays is dying
    * long before its whole-series number notices.
    *
    * Exactness: returns quantize to 10-dp BIGINTs ([[logReturns]]'
    * convention); the frame's Σr and Σr² come from RUNNING cumsums
    * differenced at lag n (`C_t − C_{t−n}`) — exact integers either
    * way, but running frames are O(1)/row where Spark replays a sliding
    * frame's n rows per row (measured 4× on the decimal squares sum);
    * the ratio is then the fixed tree `(Σr/n) / √(Σr²/n − (Σr/n)²)`
    * with the quantization scale cancelling. NULL until the frame holds
    * n non-null returns and on zero variance. One keyed Window pass
    * (cumsums + lags share the sort). Adds `roll_sharpe`. */
  def rollingSharpe(df: DataFrame, retCol: String, partCols: Seq[String],
                    orderCols: Seq[String], n: Int,
                    annualize: Double = 1.0): DataFrame = {
    require(n >= 2, s"window must be >= 2, got $n")
    require(annualize > 0.0, s"annualize must be positive, got $annualize")
    Guards.requireNoReserved(df.columns,
      Seq("roll_sharpe", "__ri", "__c1", "__c2", "__cn",
        "__rs_p1", "__rs_p2", "__rs_pn"),
      "Rolling.rollingSharpe")
    val seqW = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val running = seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ri = round(col(retCol).cast("double") * lit(1e10)).cast("long")
    val nD = lit(n.toDouble)
    val zeroDec = lit(0L).cast("decimal(38,0)")
    val withCums = df.withColumn("__ri", ri)
      .withColumn("__c1",
        sum(coalesce(col("__ri").cast("decimal(38,0)"), zeroDec))
          .over(running))
      .withColumn("__c2",
        sum(coalesce(col("__ri").cast("decimal(38,0)") * col("__ri"),
          zeroDec)).over(running))
      .withColumn("__cn", count(col("__ri")).over(running))
    // stage the three n-lags once — the mean/variance trees reference
    // them up to 4× each, and every inlined reference became its own
    // window expression (14 aggregates instead of 7 before staging)
    val staged = withCums.select(col("*"),
      lag(col("__c1"), n).over(seqW).as("__rs_p1"),
      lag(col("__c2"), n).over(seqW).as("__rs_p2"),
      lag(col("__cn"), n).over(seqW).as("__rs_pn"))
    val s1 = (col("__c1") - coalesce(col("__rs_p1"), zeroDec)).cast("double")
    val s2 = (col("__c2") - coalesce(col("__rs_p2"), zeroDec)).cast("double")
    val cnt = col("__cn") - coalesce(col("__rs_pn"), lit(0L))
    val mean = s1 / nD
    val variance = s2 / nD - mean * mean
    staged
      .withColumn("roll_sharpe",
        when(cnt === n && variance > 0.0,
          mean / sqrt(variance) * lit(annualize)))
      .drop("__ri", "__c1", "__c2", "__cn", "__rs_p1", "__rs_p2", "__rs_pn")
  }

  /** Hurst exponent per key via rescaled-range (R/S) analysis (Hurst
    * 1951 / Mandelbrot, public formula): slope of ln(avg R/S) against
    * ln(block size) over a literal ladder of block sizes — the
    * long-memory diagnostic (H ≈ 0.5 random walk, > 0.5 trending,
    * < 0.5 mean-reverting) run on a return series before trusting any
    * momentum or mean-reversion signal.
    *
    * Exactness: per complete block of size b, `R/S =
    * (maxd − mind)/√(b·Σx² − S²)` where `d_i = b·C_i − i·S` over the
    * within-block cumsum C_i — ALL integers (the n-multiplied centering
    * trick), so R/S is one sqrt + one division; each block's R/S
    * quantizes to 10 dp and the per-(key, size) average accumulates as
    * exact BIGINTs (order-free); ln of the tiny averaged frame and the
    * 4-point regression are fixed trees with the ln(b) abscissas and
    * their sums BAKED as driver-side literals. NULL `hurst` unless
    * EVERY block size has ≥ 1 valid (complete, non-constant) block —
    * pick sizes ≤ series length. NULLs drop before sequencing.
    *
    * Plan: one keyed sort (row_number + cumsum ride it), one explode to
    * (key, size) block terms, one (key, size, block) aggregate, one
    * (key, size) aggregate, one key-level pivot to the fixed tree — the
    * corpus is exchanged once, everything after the first aggregate is
    * blocks-sized. Emits (keyCols…, `n`, `rs_<b>`…, `hurst`). */
  def hurst(df: DataFrame, valueCol: String, keyCols: Seq[String],
            orderCols: Seq[String], blockSizes: Seq[Int] = Seq(8, 16, 32, 64),
            scale: Int = 0): DataFrame = {
    require(blockSizes.size >= 2, "hurst needs at least 2 block sizes")
    require(blockSizes.forall(_ >= 2), s"block sizes >= 2, got $blockSizes")
    require(blockSizes.distinct.size == blockSizes.size, "duplicate sizes")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    val sizes = blockSizes.sorted
    Guards.requireNoReserved(df.columns,
      Seq("n", "hurst", "__x", "__t", "__b", "__blk", "__i", "__c", "__e",
        "__d", "__cnt", "__s", "__s2", "__maxd", "__mind", "__rsq", "__nb",
        "__srs", "__rs") ++ sizes.map(b => s"rs_$b"), "Rolling.hurst")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val xi = round(col(valueCol).cast("double") * lit(math.pow(10, scale)))
      .cast("long")
    val base = df.filter(xi.isNotNull)
      .select((keyCols.map(col) :+ xi.as("__x")) :+
        (row_number().over(w) - lit(1)).cast("long").as("__t"): _*)
    val terms = base.select(
      (keyCols.map(col) :+ col("__x") :+
        explode(array(sizes.map { b =>
          struct(lit(b).as("b"),
            (col("__t") / lit(b.toLong)).cast("long").as("blk"),
            (col("__t") % lit(b.toLong) + lit(1L)).as("i"))
        }: _*)).as("__e")): _*)
      .select((keyCols.map(col) :+ col("__x") :+ col("__e.b").as("__b") :+
        col("__e.blk").as("__blk") :+ col("__e.i").as("__i")): _*)
    // Within-block cumsum rides one (key, size, block) shuffle+sort;
    // blocks are tiny so the per-block aggregate collapses immediately.
    // DO NOT replace this with sort_array(collect_list(...)) per block:
    // that shape was 0.75× at sf0.1 but OOM'd at the 30× probe — the
    // map-side ObjectHashAggregate buffers every in-flight group's array
    // (millions of groups per task at scale), where WindowExec streams
    // sorted rows with O(1) concurrent state (NOTES.md round-11 lesson).
    val bw = Window
      .partitionBy((keyCols.map(col) :+ col("__b") :+ col("__blk")): _*)
      .orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = terms.withColumn("__c", sum(col("__x")).over(bw))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val dev = col("__b").cast("long").cast("decimal(38,0)") *
      col("__c").cast("decimal(38,0)") -
      col("__i").cast("decimal(38,0)") * sum(col("__x")).over(
        Window.partitionBy(
          (keyCols.map(col) :+ col("__b") :+ col("__blk")): _*))
    val blocks = withCum
      .withColumn("__d", dev)
      .groupBy((keyCols.map(col) :+ col("__b") :+ col("__blk")): _*)
      .agg(count(lit(1)).as("__cnt"),
        dec(col("__x")).as("__s"), dec(col("__x") * col("__x")).as("__s2"),
        max(col("__d")).as("__maxd"), min(col("__d")).as("__mind"))
    val den = (col("__b").cast("long").cast("decimal(38,0)") * col("__s2") -
      col("__s") * col("__s")).cast("double")
    val rs = (col("__maxd") - col("__mind")).cast("double") / sqrt(den)
    val rsq = round(rs * lit(1e10)).cast("long")
    val perSize = blocks
      .filter(col("__cnt") === col("__b").cast("long") && den > 0.0)
      .withColumn("__rsq", rsq)
      .groupBy((keyCols.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__nb"), sum(col("__rsq")).as("__srs"))
      .withColumn("__rs", col("__srs").cast("double") /
        col("__nb").cast("double") / lit(1e10))
    // one row per key: rs_<b> wide, then the fixed 4-point regression
    // with baked ln(b) abscissas
    val wide = perSize.groupBy(keyCols.map(col): _*)
      .agg(max(when(col("__b") === sizes.head, col("__rs")))
          .as(s"rs_${sizes.head}"),
        sizes.tail.map(b =>
          max(when(col("__b") === b, col("__rs"))).as(s"rs_$b")): _*)
    val k = sizes.size.toDouble
    val us = sizes.map(b => math.log(b.toDouble))
    val su = us.reduceLeft(_ + _)
    val suu = us.map(u => u * u).reduceLeft(_ + _)
    // ln differs by 1 ulp between libm implementations — round the
    // ordinates to 10 dp so the regression tree is engine-identical
    // (the cooccurrencePmi discipline)
    def v(b: Int): Column = round(log(col(s"rs_$b")), 10)
    val sv = sizes.map(v).reduceLeft(_ + _)
    val suv = sizes.zip(us).map { case (b, u) => lit(u) * v(b) }
      .reduceLeft(_ + _)
    val slope = (lit(k) * suv - lit(su) * sv) /
      lit(k * suu - su * su)
    val ok = sizes.map(b => col(s"rs_$b").isNotNull && col(s"rs_$b") > 0.0)
      .reduce(_ && _)
    val ns = base.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    ns.join(wide, keyCols, "left")
      .select((keyCols.map(col) :+ col("n")) ++
        sizes.map(b => col(s"rs_$b")) :+
        when(ok, slope).as("hurst"): _*)
  }

  /** Amihud illiquidity per key (Amihud 2002, public formula): the mean
    * over bars of `|return_t| / dollar_volume_t` — price impact per unit
    * traded; the standard cross-sectional liquidity screen (×10⁶ in most
    * papers; this emits the raw ratio).
    *
    * Returns are simple close-over-close ratios; dollar volume is
    * `close·volume`. Both quantize to `scale`-dp BIGINTs first, each
    * bar's term is then a fixed two-division tree
    * `|c_t − c_{t−1}| / c_{t−1} / (c_t·v_t / 10^s)` on exact integers,
    * and the term MEAN folds the per-key term list in ascending
    * (orderCols-struct) order — term sums of doubles are order-dependent,
    * so the fold order is pinned by `sort_array` (the [[cci]] discipline
    * lifted to whole-series: per-key series must be driver-bounded in
    * the millions, the cross-section fans out freely). Bars with a zero
    * close, zero volume, or no previous close contribute nothing.
    * Emits (partCols…, `n_terms`, `illiq`). */
  def amihud(df: DataFrame, closeCol: String, volCol: String,
             partCols: Seq[String], orderCols: Seq[String],
             scale: Int = 0): DataFrame = {
    require(orderCols.size == 1,
      "amihud orders by ONE atomic column (pack composite orders first)")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_terms", "illiq", "__c", "__v", "__pc", "__term", "__o", "__l"),
      "Rolling.amihud")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val k = math.pow(10, scale)
    val ci = round(col(closeCol).cast("double") * lit(k)).cast("long")
    val vi = round(col(volCol).cast("double") * lit(k)).cast("long")
    val base = df
      .select((partCols.map(col) :+ col(orderCols.head).as("__o")) :+
        ci.as("__c") :+ vi.as("__v") :+ lag(ci, 1).over(w).as("__pc"): _*)
    val ok = col("__pc").isNotNull && col("__pc") > 0L &&
      col("__c") > 0L && col("__v") > 0L
    // dollar volume in descaled units: (c/10^s)·(v/10^s) = c·v/10^2s
    val term = abs(col("__c") - col("__pc")).cast("double") /
      col("__pc").cast("double") /
      ((col("__c").cast("decimal(38,0)") * col("__v")).cast("double") /
        lit(k * k))
    val folded = base
      .select((partCols.map(col) :+
        when(ok, struct(col("__o"), term.as("t"))).as("__term")): _*)
      .groupBy(partCols.map(col): _*)
      .agg(count(col("__term")).as("n_terms"),
        sort_array(collect_list(col("__term"))).as("__l"))
    folded.select((partCols.map(col) :+ col("n_terms") :+
      when(col("n_terms") >= 1L,
        aggregate(transform(col("__l"), e => e("t")), lit(0.0),
          (a, b) => a + b) / col("n_terms").cast("double")).as("illiq")): _*)
  }

  /** Scala-folded 1/(4·ln 2) (Parkinson) and 2·ln 2 − 1 (Garman–Klass);
    * the literals expose the exact doubles for the DuckDB oracle. */
  private val ParkCoef = 1.0 / (4.0 * math.log(2.0))
  def parkinsonCoefLiteral: String = ParkCoef.toString
  private val GkCoef = 2.0 * math.log(2.0) - 1.0
  def gkCoefLiteral: String = GkCoef.toString

  /** Per-key OHLC range-based volatility estimators (public closed forms):
    * Parkinson `σ²_P = 1/(4 ln 2)·mean(ln(H/L)²)` (range only),
    * Garman–Klass `σ²_GK = mean(½·ln(H/L)² − (2 ln 2 − 1)·ln(C/O)²)`
    * (range + body), and drift-free Rogers–Satchell
    * `σ²_RS = mean(ln(H/C)·ln(H/O) + ln(L/C)·ln(L/O))` — the three
    * classic upgrades over close-to-close [[realizedVol]], extracting
    * intrabar information the close series throws away.
    *
    * Exactness discipline (the [[amihud]] pattern): every ln output is
    * `round(…,10) + 0.0` so each per-bar term is the identical double in
    * any engine; the per-key means fold the terms in bar order from ONE
    * sorted collect (never an unordered SUM over doubles); the two libm
    * constants are Scala-folded literals shared with the oracle; the final
    * √ is the only trailing libm call, rounded once more. Bars with a
    * NULL or non-positive price, or H < L, are excluded and `n_bars`
    * counts only the included bars; a key with none gets NULL vols. A
    * negative GK/RS mean (possible on pathological bars) is NULL, never a
    * NaN √.
    *
    * Scale shape: one hash exchange on `partCols`, per-key state is one
    * 3-double struct per bar (bars, not ticks — the reduction upstream in
    * [[Bars.ohlc]] already collapsed ticks), so a year of daily bars is
    * ~365 structs per key regardless of corpus size. Adds `n_bars`,
    * `park_vol`, `gk_vol`, `rs_vol`. */
  def ohlcVolatility(df: DataFrame, openCol: String, highCol: String,
                     lowCol: String, closeCol: String,
                     partCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty,
      "ohlcVolatility needs an explicit bar ordering for the deterministic fold")
    Guards.requireNoReserved(df.columns,
      Seq("n_bars", "park_vol", "gk_vol", "rs_vol", "__t", "__l"),
      "Rolling.ohlcVolatility")
    def r10(c: Column): Column = round(c, 10) + lit(0.0)
    val o = col(openCol).cast("double")
    val h = col(highCol).cast("double")
    val l = col(lowCol).cast("double")
    val c = col(closeCol).cast("double")
    val ok = o.isNotNull && h.isNotNull && l.isNotNull && c.isNotNull &&
      o > 0.0 && l > 0.0 && c > 0.0 && h >= l
    val hl = r10(log(h / l))
    val co = r10(log(c / o))
    val hc = r10(log(h / c))
    val ho = r10(log(h / o))
    val lc = r10(log(l / c))
    val lo = r10(log(l / o))
    val pk = hl * hl
    val gk = lit(0.5) * hl * hl - lit(GkCoef) * co * co
    val rs = hc * ho + lc * lo
    val base = df.select((partCols.map(col) :+
      when(ok, struct((orderCols.map(col) :+ pk.as("pk") :+ gk.as("gk") :+
        rs.as("rs")): _*)).as("__t")): _*)
    val folded = base.groupBy(partCols.map(col): _*)
      .agg(count(col("__t")).as("n_bars"),
        sort_array(collect_list(col("__t"))).as("__l"))
    def mean(field: String): Column =
      aggregate(transform(col("__l"), e => e(field)), lit(0.0),
        (a, b) => a + b) / col("n_bars").cast("double")
    def vol(m: Column): Column =
      when(col("n_bars") >= 1L && m >= 0.0, r10(sqrt(m)))
    folded.select((partCols.map(col) :+ col("n_bars") :+
      vol(lit(ParkCoef) * mean("pk")).as("park_vol") :+
      vol(mean("gk")).as("gk_vol") :+
      vol(mean("rs")).as("rs_vol")): _*)
  }

  /** Scala-folded 3 − 2√2, the Corwin–Schultz denominator; the literal
    * exposes the exact double for the DuckDB oracle. */
  private val CsDen = 3.0 - 2.0 * math.sqrt(2.0)
  def csDenLiteral: String = CsDen.toString

  /** Corwin–Schultz bid–ask spread estimator (public 2012 closed form):
    * from each overlapping two-bar span,
    * `β = ln(H_t/L_t)² + ln(H_t₊₁/L_t₊₁)²`,
    * `γ = ln(max(H)/min(L))²` over the span,
    * `α = (√(2β) − √β)/(3 − 2√2) − √(γ/(3 − 2√2))`,
    * `S = 2(e^α − 1)/(1 + e^α)` — the high–low estimate of the effective
    * spread that needs no quote data, the range-based sibling of
    * [[graft.operators.Stats]]' Roll serial-covariance estimator. Negative
    * two-day spreads clamp to 0 (the paper's standard treatment) before
    * the per-key mean.
    *
    * Exactness: every libm OUTPUT (ln, √, exp) rounds to 10 dp so each
    * per-span spread is the identical double in any engine; the span means
    * fold in span order from one sorted collect; 3 − 2√2 is a Scala-folded
    * literal shared with the oracle. Spans where either bar fails the
    * positive-price / H ≥ L guard are excluded; `n_spans` counts survivors.
    *
    * Scale shape: one window pass (lag 1) plus one hash exchange on
    * `partCols` — identical cost to [[amihud]]. Adds `n_spans`,
    * `cs_spread`. */
  def corwinSchultz(df: DataFrame, highCol: String, lowCol: String,
                    partCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty,
      "corwinSchultz needs an explicit bar ordering")
    Guards.requireNoReserved(df.columns,
      Seq("n_spans", "cs_spread", "__t", "__l", "__h", "__lo", "__ph",
        "__pl"), "Rolling.corwinSchultz")
    def r10(x: Column): Column = round(x, 10) + lit(0.0)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val h = col(highCol).cast("double")
    val l = col(lowCol).cast("double")
    val base = df.select((partCols.map(col) ++ orderCols.map(col) :+
      h.as("__h") :+ l.as("__lo") :+ lag(h, 1).over(w).as("__ph") :+
      lag(l, 1).over(w).as("__pl")): _*)
    val ok = col("__ph").isNotNull && col("__pl").isNotNull &&
      col("__pl") > 0.0 && col("__lo") > 0.0 &&
      col("__ph") >= col("__pl") && col("__h") >= col("__lo")
    val hl0 = r10(log(col("__ph") / col("__pl")))
    val hl1 = r10(log(col("__h") / col("__lo")))
    val beta = hl0 * hl0 + hl1 * hl1
    val gog = r10(log(greatest(col("__h"), col("__ph")) /
      least(col("__lo"), col("__pl"))))
    val gamma = gog * gog
    val alpha = (r10(sqrt(lit(2.0) * beta)) - r10(sqrt(beta))) / lit(CsDen) -
      r10(sqrt(gamma / lit(CsDen)))
    val ea = r10(exp(alpha))
    val spread = greatest(lit(2.0) * (ea - lit(1.0)) / (lit(1.0) + ea),
      lit(0.0))
    val folded = base
      .select((partCols.map(col) :+
        when(ok, struct((orderCols.map(col) :+ spread.as("s")): _*))
          .as("__t")): _*)
      .groupBy(partCols.map(col): _*)
      .agg(count(col("__t")).as("n_spans"),
        sort_array(collect_list(col("__t"))).as("__l"))
    folded.select((partCols.map(col) :+ col("n_spans") :+
      when(col("n_spans") >= 1L,
        aggregate(transform(col("__l"), e => e("s")), lit(0.0),
          (a, b) => a + b) / col("n_spans").cast("double"))
        .as("cs_spread")): _*)
  }

  /** Kyle's lambda (public market-microstructure regression): the
    * through-origin slope of price change on SIGNED volume,
    * `λ = Σ Δp·sv / Σ sv²` with the tick-rule sign `sv = sign(Δp)·v` —
    * the per-unit-flow price impact, the causal companion to [[amihud]]'s
    * ratio. A larger λ means thinner depth.
    *
    * Exactness: prices and volumes quantize to `scale` decimals as BIGINT,
    * so Δp, sv, and both product sums are exact integers accumulated as
    * DECIMAL(38,0) (order-free at any parallelism); λ is ONE double
    * division at the end, descaled by construction (the 10^scale factors
    * cancel in the ratio except one net 10^-scale on Δp, reported in
    * descaled price-per-descaled-volume units). Rows with no previous
    * close, zero Δp contribution are kept (sv = 0 adds nothing); keys with
    * a zero denominator (constant price) report NULL λ.
    *
    * Scale shape: one window pass (lag 1) + one hash exchange; integer
    * state only. Adds `n_terms`, `kyle_lambda`. */
  def kyleLambda(df: DataFrame, closeCol: String, volCol: String,
                 partCols: Seq[String], orderCols: Seq[String],
                 scale: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "kyleLambda needs an explicit bar ordering")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    Guards.requireNoReserved(df.columns,
      Seq("n_terms", "kyle_lambda", "__c", "__v", "__pc", "__dp", "__sv"),
      "Rolling.kyleLambda")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val k = math.pow(10, scale)
    val ci = round(col(closeCol).cast("double") * lit(k)).cast("long")
    val vi = round(col(volCol).cast("double") * lit(k)).cast("long")
    val base = df.select((partCols.map(col) :+ ci.as("__c") :+
      vi.as("__v") :+ lag(ci, 1).over(w).as("__pc")): _*)
    val ok = col("__pc").isNotNull && col("__v") >= 0L
    val dp = col("__c") - col("__pc")
    val sv = signum(dp).cast("long") * col("__v")
    val terms = base.select((partCols.map(col) :+
      when(ok, dp).as("__dp") :+ when(ok, sv).as("__sv")): _*)
    val agged = terms.groupBy(partCols.map(col): _*).agg(
      count(col("__dp")).as("n_terms"),
      sum(col("__dp").cast("decimal(38,0)") * col("__sv")).as("__num"),
      sum(col("__sv").cast("decimal(38,0)") * col("__sv")).as("__den"))
    // net scaling: num ~ 10^2s·Δp·v, den ~ 10^2s·v² — the 10^2s cancel,
    // leaving λ in (descaled price)/(descaled volume) units directly
    agged.select((partCols.map(col) :+ col("n_terms") :+
      when(col("n_terms") >= 1L && col("__den") > 0L,
        col("__num").cast("double") / col("__den").cast("double"))
        .as("kyle_lambda")): _*)
  }

  /** Lo–MacKinlay variance-ratio test (public 1988 form): is the q-period
    * return variance q× the 1-period variance, as a random walk demands?
    * `VR(q) = σ̂²_q/σ̂²_1` over log returns, with the unbiased
    * overlapping-sum estimator (`m = q(n−q+1)(1−q/n)`), and the
    * homoskedastic z `z = (VR−1)/√(2(2q−1)(q−1)/(3qn))` — the
    * mean-reversion / momentum readout beside [[graft.operators.Stats]]'
    * Dickey–Fuller unit-root regression.
    *
    * Exactness: log returns quantize to 1e-10 as BIGINT once
    * (`round(ln(c/c₋₁)·1e10)`), after which BOTH demeaned sums multiply
    * through by n² into exact DECIMAL(38,0) integers
    * (`A = n²Σr² − nS²`, `B = n²Σc² − 2qnSΣc + (n−q+1)q²S²` with `c` the
    * exact q-row window sums) — the ratio collapses to
    * `VR = B·n·(n−1) / (A·q·(n−q+1)·(n−q))`, exact integers into ONE
    * pinned double expression. φ's q-part folds in Scala; √φ is the only
    * libm call, rounded to 10 dp. Keys with n ≤ q returns or zero return
    * variance report NULL.
    *
    * Scale shape: two window passes (lag, q-row sum) + one exchange;
    * integer state only. Adds `n_rets`, `vr`, `z_vr`. */
  def varianceRatio(df: DataFrame, closeCol: String, partCols: Seq[String],
                    orderCols: Seq[String], q: Int): DataFrame = {
    require(q >= 2, s"variance ratio needs q >= 2, got $q")
    Guards.requireNoReserved(df.columns,
      Seq("n_rets", "vr", "z_vr", "__r", "__c", "__i", "__pc"),
      "Rolling.varianceRatio")
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val c = col(closeCol).cast("double")
    // stage the lag once — the return guard referenced it 3×
    val pc = col("__pc")
    val r = when(pc.isNotNull && pc > 0.0 && c > 0.0,
      round(log(c / pc) * lit(1e10)).cast("long"))
    val rets = df
      .withColumn("__pc", lag(c, 1).over(w))
      .select((partCols.map(col) ++ orderCols.map(col) :+ r.as("__r")): _*)
      .filter(col("__r").isNotNull)
    val wq = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(q - 1), Window.currentRow)
    val staged = rets
      .withColumn("__i", row_number().over(w))
      .withColumn("__c", when(col("__i") >= q, sum(col("__r")).over(wq)))
    val dec = "decimal(38,0)"
    val agged = staged.groupBy(partCols.map(col): _*).agg(
      count(col("__r")).as("n_rets"),
      sum(col("__r").cast(dec)).as("__s"),
      sum(col("__r").cast(dec) * col("__r")).as("__q2"),
      sum(col("__c").cast(dec)).as("__sc"),
      sum(col("__c").cast(dec) * col("__c")).as("__sc2"))
    val n = col("n_rets").cast(dec)
    val s = col("__s")
    val a = n * n * col("__q2") - n * s * s
    val nmq1 = (col("n_rets") - lit(q) + lit(1)).cast(dec)
    val b = n * n * col("__sc2") -
      lit(2L * q).cast(dec) * n * s * col("__sc") +
      nmq1 * lit(q.toLong * q).cast(dec) * s * s
    val nd = col("n_rets").cast("double")
    val defined = col("n_rets") > lit(q).cast("long") && a > lit(0).cast(dec)
    val vr = b.cast("double") * nd * (nd - lit(1.0)) /
      (a.cast("double") * lit(q.toDouble) * (nd - lit(q - 1).cast("double")) *
        (nd - lit(q.toDouble)))
    val sqphi = round(sqrt(lit(2.0 * (2 * q - 1) * (q - 1)) /
      (lit(3.0 * q) * nd)), 10) + lit(0.0)
    agged
      .withColumn("vr", when(defined, vr))
      .withColumn("z_vr", when(defined, (col("vr") - lit(1.0)) / sqphi))
      .select((partCols.map(col) :+ col("n_rets") :+ col("vr") :+
        col("z_vr")): _*)
  }

  /** KPSS level-stationarity test (public 1992 form): partial sums of the
    * demeaned series against a Bartlett-kernel long-run variance,
    * `η = n⁻²ΣS_t² / σ̂²_lrv` with
    * `σ̂²_lrv = γ₀ + 2Σ_{k≤L}(1 − k/(L+1))γ_k` — the null here is
    * STATIONARITY, making it the mirror-image companion to
    * q_dickey_fuller's unit-root null (reject both → structural trouble).
    *
    * Exactness: values quantize to `scale` decimals; demeaning multiplies
    * through by n (`ẽ_t = n·y_t − Σy`, `S̃_t = n·cum_t − t·Σy` — exact
    * BIGINTs), autocovariance products multiply through by n² and the
    * Bartlett weights by (L+1), so the statistic collapses to
    * `η = ΣS̃²·(L+1) / (n·D)` with
    * `D = (L+1)P₀ + 2Σ(L+1−k)P_k` — exact DECIMAL(38,0) integers into ONE
    * double division, no libm at all. A constant series (D = 0) or a key
    * with < 2 observations reports NULL. Missing high-order lags on short
    * keys contribute zero (their P_k is empty), matching the truncated
    * kernel.
    *
    * Scale shape: one window stage (running + whole-partition sums and L
    * lags share the partition) + one exchange; integer state. Adds
    * `n_obs`, `kpss_eta`. */
  def kpss(df: DataFrame, valueCol: String, partCols: Seq[String],
           orderCols: Seq[String], lags: Int, scale: Int = 0): DataFrame = {
    require(lags >= 0, s"lags must be >= 0, got $lags")
    require(scale >= 0, s"scale must be >= 0, got $scale")
    require(orderCols.nonEmpty, "kpss needs an explicit ordering")
    Guards.requireNoReserved(df.columns,
      (Seq("n_obs", "kpss_eta", "__y", "__n", "__s", "__e", "__st") ++
        (1 to lags).map(k => s"__e$k")), "Rolling.kpss")
    val wSeq = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wCum = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = wSeq.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val k10 = math.pow(10, scale)
    val yi = round(col(valueCol).cast("double") * lit(k10)).cast("long")
    val base = df
      .select((partCols.map(col) ++ orderCols.map(col) :+ yi.as("__y")): _*)
      .filter(col("__y").isNotNull)
    val staged = base
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__y")).over(wAll))
      .withColumn("__e", col("__n") * col("__y") - col("__s"))
      .withColumn("__st",
        col("__n") * sum(col("__y")).over(wCum) -
          row_number().over(wSeq).cast("long") * col("__s"))
    val lagged = (1 to lags).foldLeft(staged) { (d, k) =>
      d.withColumn(s"__e$k", lag(col("__e"), k).over(wSeq))
    }
    val dec = "decimal(38,0)"
    val aggs =
      Seq(count(col("__y")).as("n_obs"),
        sum(col("__st").cast(dec) * col("__st")).as("__num"),
        sum(col("__e").cast(dec) * col("__e")).as("__p0")) ++
      (1 to lags).map(k =>
        coalesce(sum(col("__e").cast(dec) * col(s"__e$k")),
          lit(0).cast(dec)).as(s"__p$k"))
    val agged = lagged.groupBy(partCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val lp1 = lit(lags + 1).cast(dec)
    val d = (1 to lags).foldLeft(lp1 * col("__p0")) { (acc, k) =>
      acc + lit(2L * (lags + 1 - k)).cast(dec) * col(s"__p$k")
    }
    val n = col("n_obs").cast(dec)
    val eta = (col("__num") * lp1).cast("double") / (n * d).cast("double")
    agged.select((partCols.map(col) :+ col("n_obs") :+
      when(col("n_obs") >= 2L && d > lit(0).cast(dec), eta)
        .as("kpss_eta")): _*)
  }
}
