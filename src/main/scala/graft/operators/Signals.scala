package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FinancialFunctions

/** Batch signal detection (reference `src/polygon/signals.rs`) as single
  * DataFrame pipelines — no collect-then-loop: the reference materializes
  * Arrow batches and scans rows on the driver (`signals.rs:50-90`); here the
  * thresholding is a column expression that runs inside the same job, so
  * the operator distributes and the driver only sees the (small) signal
  * rows. One shuffle on the window partition key.
  */
object Signals {

  /** RSI thresholds shared by the batch scans and the streaming rules
    * (reference `signals.rs:69-87`, `streaming.rs:191-212`). */
  val RsiOversold = 30.0
  val RsiOverbought = 70.0

  /** RSI thresholds scan (reference `signals.rs:32-93`):
    * BUY below 30 with confidence (30−rsi)/30, SELL above 70 with
    * confidence (rsi−70)/30. */
  def detectRsiSignals(df: DataFrame, tickerCol: String, orderCols: Seq[String],
                       closeCol: String, window: Int = 14): DataFrame = {
    FinancialFunctions.registerAll(df.sparkSession) // idempotent; the rsi call resolves via the registry
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(tickerCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("rsi", FinancialFunctions.rsi(col(closeCol), window).over(w))
      .filter(col("rsi").isNotNull &&
        (col("rsi") < RsiOversold || col("rsi") > RsiOverbought))
      .select(
        (col(tickerCol).as("symbol") +: orderCols.map(col)) ++ Seq(
          col(closeCol).as("price"), col("rsi"),
          rsiSignalType(col("rsi")).as("signal_type"),
          rsiConfidence(col("rsi")).as("confidence")): _*)
  }

  /** Internal: threshold expressions shared by batch + streaming paths. */
  private[operators] def rsiSignalType(rsi: Column): Column =
    when(rsi < RsiOversold, lit("BUY")).when(rsi > RsiOverbought, lit("SELL"))

  private[operators] def rsiConfidence(rsi: Column): Column =
    when(rsi < RsiOversold, (lit(RsiOversold) - rsi) / lit(RsiOversold))
      .when(rsi > RsiOverbought, (rsi - lit(RsiOverbought)) / lit(RsiOversold))

  /** MA-crossover scan (reference `signals.rs:96-169`): crossover rows are
    * where the SMA-short/SMA-long relation flips vs the previous row; BUY
    * if short is now above, confidence = min(|short−long|/price, 1). */
  def detectMaCrossoverSignals(df: DataFrame, tickerCol: String,
                               orderCols: Seq[String], closeCol: String,
                               shortWindow: Int = 20, longWindow: Int = 50): DataFrame = {
    FinancialFunctions.registerAll(df.sparkSession) // idempotent; the sma calls resolve via the registry
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(tickerCol)).orderBy(orderCols.map(col): _*)
    // nested LAG(sma(...)) needs two passes (SURVEY §7.4 hard part 5)
    val withMa = df
      .withColumn("sma_short", FinancialFunctions.sma(col(closeCol), shortWindow).over(w))
      .withColumn("sma_long", FinancialFunctions.sma(col(closeCol), longWindow).over(w))
    val lagged = withMa
      .withColumn("prev_short", lag(col("sma_short"), 1).over(w))
      .withColumn("prev_long", lag(col("sma_long"), 1).over(w))
    lagged
      .filter(col("sma_short").isNotNull && col("sma_long").isNotNull &&
        col("prev_short").isNotNull && col("prev_long").isNotNull &&
        ((col("prev_short") <= col("prev_long") && col("sma_short") > col("sma_long")) ||
          (col("prev_short") >= col("prev_long") && col("sma_short") < col("sma_long"))))
      .select(
        (col(tickerCol).as("symbol") +: orderCols.map(col)) ++ Seq(
          col(closeCol).as("price"), col("sma_short"), col("sma_long"),
          when(col("sma_short") > col("sma_long"), lit("BUY")).otherwise(lit("SELL")).as("signal_type"),
          least(abs(col("sma_short") - col("sma_long")) / col(closeCol), lit(1.0)).as("confidence")): _*)
  }

  /** Event study — "does the signal work?": mean FORWARD return at
    * horizons `1..maxHorizon` after signal bars versus the all-bars
    * baseline, per horizon: (`horizon`, `n_signal`, `mean_signal`,
    * `n_base`, `mean_base`, `lift`). A real edge shows positive `lift`
    * decaying with horizon; a mirage shows noise around 0.
    *
    * Determinism: feed [[graft.operators.Rolling.logReturns]]'
    * source-rounded `ret_log` — 10-dp returns scale EXACTLY to BIGINT at
    * 10^10 ([[graft.operators.Stats.welchT]] discipline), so the
    * per-horizon sums are exact integers in any aggregation order and
    * the means/lift are fixed IEEE trees. Forward returns are `lead`s
    * over ONE keyed window spec; horizons explode from a struct array —
    * one scan, one exchange, one ≤maxHorizon-group aggregation. */
  def eventStudy(df: DataFrame, retCol: String, signalCol: String,
                 partCols: Seq[String], orderCols: Seq[String],
                 maxHorizon: Int): DataFrame = {
    require(maxHorizon >= 1, s"maxHorizon must be >= 1, got $maxHorizon")
    Guards.requireNoReserved(df.columns,
      Seq("horizon", "n_signal", "mean_signal", "n_base", "mean_base",
        "lift", "__fwd", "__sig"), "Signals.eventStudy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val pow = 1e10
    // bind every lead in its own projection FIRST — window expressions
    // inside an exploded array get inferred into a generator filter
    // (the NOTES.md InferFiltersFromGenerate trap, here fatally so)
    val bound = df.select(col(signalCol).as("__sig") +:
      (1 to maxHorizon).map(h =>
        round(lead(col(retCol).cast("double"), h).over(w) * lit(pow))
          .cast("long").as(s"__f$h")): _*)
    val horizons = array((1 to maxHorizon).map(h =>
      struct(lit(h).as("horizon"), col(s"__f$h").as("__fwd"))): _*)
    val exploded = bound
      .select(col("__sig"), explode(horizons).as("e"))
      .select(col("__sig"), col("e.horizon").as("horizon"),
        col("e.__fwd").as("__fwd"))
      .filter(col("__fwd").isNotNull)
    val agg = exploded.groupBy(col("horizon")).agg(
      count(when(col("__sig"), 1)).as("n_signal"),
      sum(when(col("__sig"), col("__fwd"))).as("__ss"),
      count(lit(1)).as("n_base"),
      sum(col("__fwd")).as("__sb"))
    val meanSig = when(col("n_signal") > 0L,
      col("__ss").cast("double") / col("n_signal").cast("double") / lit(pow))
    val meanBase = col("__sb").cast("double") / col("n_base").cast("double") /
      lit(pow)
    agg
      .withColumn("mean_signal", meanSig)
      .withColumn("mean_base", meanBase)
      .withColumn("lift", col("mean_signal") - col("mean_base"))
      .drop("__ss", "__sb")
  }

  /** Candlestick pattern detection over OHLC bars — the classic bar-shape
    * rules (public formulas), each a pure per-row/one-lag column
    * expression, so the scan stays a single keyed Window pass with no
    * state at all:
    *
    *  - `doji`: body ≤ `dojiBodyMax` of the bar's range (indecision);
    *  - `hammer`: lower shadow ≥ 2·body, upper shadow ≤ body (rejection
    *    of the low);
    *  - `bullish_engulfing` / `bearish_engulfing`: this body strictly
    *    contains the previous bar's body, with opposing directions.
    *
    * Degenerate bars (zero range) are no pattern; the first bar of a
    * series cannot engulf. Emits the input plus the four boolean flags —
    * exact comparisons on exact prices, bit-identical anywhere. */
  def candlePatterns(df: DataFrame, openCol: String, highCol: String,
                     lowCol: String, closeCol: String,
                     partCols: Seq[String], orderCols: Seq[String],
                     dojiBodyMax: Double = 0.1): DataFrame = {
    require(dojiBodyMax > 0.0 && dojiBodyMax < 1.0,
      s"dojiBodyMax must be in (0,1), got $dojiBodyMax")
    Guards.requireNoReserved(df.columns,
      Seq("doji", "hammer", "bullish_engulfing", "bearish_engulfing",
        "__cp_po", "__cp_pc"),
      "Signals.candlePatterns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (o, h, l, c) = (col(openCol).cast("double"), col(highCol).cast("double"),
      col(lowCol).cast("double"), col(closeCol).cast("double"))
    val body = abs(c - o)
    val range = h - l
    val upper = h - greatest(o, c)
    val lower = least(o, c) - l
    // stage the two lags once — each engulfing tree referenced them 3×,
    // expanding to six window expressions
    val staged = df.select(col("*"),
      lag(o, 1).over(w).as("__cp_po"),
      lag(c, 1).over(w).as("__cp_pc"))
    val (po, pc) = (col("__cp_po"), col("__cp_pc"))
    staged
      .withColumn("doji", range > 0.0 && body <= lit(dojiBodyMax) * range)
      .withColumn("hammer",
        range > 0.0 && body > 0.0 && lower >= lit(2.0) * body && upper <= body)
      .withColumn("bullish_engulfing",
        po.isNotNull && pc < po && c > o && o < pc && c > po)
      .withColumn("bearish_engulfing",
        po.isNotNull && pc > po && c < o && o > pc && c < po)
      .drop("__cp_po", "__cp_pc")
  }

  /** Vectorized long/flat MA-crossover backtest: the equity curve of
    * "hold while the fast SMA was above the slow at the PRIOR bar" —
    * `position_t = [sma_f(t−1) > sma_s(t−1)]` (decided strictly on
    * information available before the bar — no lookahead),
    * `equity_t = Π (1 + position·ret)` from `base`. The whole backtest
    * is one declarative plan: two native SMA recurrences, one lag, and
    * the NATIVE `runprod` compound chain — no driver loop, a million
    * tickers backtest as one job.
    *
    * Determinism: SMAs fold their buffers in order (native expression),
    * the position compare reads identically-computed doubles, each
    * growth factor is a fixed IEEE tree (1.0 on flat position, warm-up,
    * and zero prior close), and the product chain is exact per-op
    * ([[graft.functions.RunProd]]). One keyed exchange — every window
    * shares the (ticker, order) spec. Adds `position` (0.0/1.0) and
    * `equity` (in `base` units). */
  /** Generalized equity curve: compound `base` through
    * `1 + position·ret` growth factors for ANY caller-supplied position
    * column (signal output, allocation weight, −1/0/1 long-flat-short…)
    * — the strategy-agnostic core [[backtestMaCrossover]] specializes.
    * The caller owns lookahead hygiene: `positionCol` must be decided
    * from information available BEFORE each bar (lag your signal).
    *
    * A NULL position is treated as flat (factor 1) — an unknown signal
    * holds cash rather than poisoning the whole remaining curve. Same
    * determinism story as the MA backtest: fixed IEEE factor trees into
    * the native `runprod` chain, one keyed exchange. Adds `equity`. */
  def equityCurve(df: DataFrame, tickerCol: String, orderCols: Seq[String],
                  closeCol: String, positionCol: String,
                  base: Double = 1.0): DataFrame = {
    require(base > 0.0, s"base must be > 0, got $base")
    Guards.requireNoReserved(df.columns, Seq("equity", "__eq_fac", "__eq_pc"),
      "Signals.equityCurve")
    FinancialFunctions.registerAll(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(tickerCol)).orderBy(orderCols.map(col): _*)
    val c = col(closeCol).cast("double")
    // stage the lag once: its four inlined references each became their
    // own window expression (one evaluated lag per reference)
    val staged = df.select(col("*"), lag(c, 1).over(w).as("__eq_pc"))
    val pc = col("__eq_pc")
    val pos = col(positionCol).cast("double")
    val factor = when(pos.isNotNull && pos =!= 0.0 &&
        pc.isNotNull && pc =!= 0.0,
      lit(1.0) + pos * ((c - pc) / pc)).otherwise(lit(1.0))
    staged.withColumn("__eq_fac", factor)
      .withColumn("equity",
        lit(base) * FinancialFunctions.runprod(col("__eq_fac")).over(w))
      .drop("__eq_fac", "__eq_pc")
  }

  def backtestMaCrossover(df: DataFrame, tickerCol: String,
                          orderCols: Seq[String], closeCol: String,
                          shortWindow: Int = 20, longWindow: Int = 50,
                          base: Double = 1.0): DataFrame = {
    require(shortWindow >= 1 && longWindow > shortWindow,
      s"need long > short >= 1, got ($shortWindow, $longWindow)")
    require(base > 0.0, s"base must be > 0, got $base")
    Guards.requireNoReserved(df.columns,
      Seq("position", "equity", "__bt_f", "__bt_s", "__bt_fac",
        "__bt_pc", "__bt_pf", "__bt_ps"),
      "Signals.backtestMaCrossover")
    FinancialFunctions.registerAll(df.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(tickerCol)).orderBy(orderCols.map(col): _*)
    val c = col(closeCol).cast("double")
    // stage each lag/SMA once — inlined references each expanded to their
    // own window expression (pc alone appeared 4×)
    val withMas = df.select(col("*"),
      FinancialFunctions.sma(c, shortWindow).over(w).as("__bt_f"),
      FinancialFunctions.sma(c, longWindow).over(w).as("__bt_s"),
      lag(c, 1).over(w).as("__bt_pc"))
    val staged = withMas.select(col("*"),
      lag(col("__bt_f"), 1).over(w).as("__bt_pf"),
      lag(col("__bt_s"), 1).over(w).as("__bt_ps"))
    val pc = col("__bt_pc")
    val ret = (c - pc) / pc
    val (pf, ps) = (col("__bt_pf"), col("__bt_ps"))
    val pos = when(pf.isNotNull && ps.isNotNull && pf > ps, lit(1.0))
      .otherwise(lit(0.0))
    val factor = when(pos === 1.0 && pc.isNotNull && pc =!= 0.0,
      lit(1.0) + ret).otherwise(lit(1.0))
    staged
      .withColumn("position", pos)
      .withColumn("__bt_fac", factor)
      .withColumn("equity",
        lit(base) * FinancialFunctions.runprod(col("__bt_fac")).over(w))
      .drop("__bt_f", "__bt_s", "__bt_fac", "__bt_pc", "__bt_pf", "__bt_ps")
  }
}
