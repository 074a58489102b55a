package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}

/** Registration bundle + typed Column API for the indicator window functions —
  * the Spark analog of the reference's `register_financial_functions`
  * (`/root/reference/src/lib.rs:13-19`).
  *
  * After `FinancialFunctions.registerAll(spark)`,
  * `spark.sql("SELECT sma(close, 20) OVER (PARTITION BY t ORDER BY d) ...")`
  * resolves natively through the Catalyst function registry; or use the
  * Column API: `sma($"close", 20).over(w)`.
  */
object FinancialFunctions {

  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n) {
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    }
    exprs
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "sma" -> (e => { val a = arity("sma", 2)(e); Sma(a(0), a(1)) }),
    "ema" -> (e => { val a = arity("ema", 2)(e); Ema(a(0), a(1)) }),
    "var_ema" -> (e => { val a = arity("var_ema", 2)(e); VarEma(a(0), a(1)) }),
    "runprod" -> (e => { val a = arity("runprod", 1)(e); RunProd(a(0)) }),
    "renko" -> (e => { val a = arity("renko", 2)(e); Renko(a(0), a(1)) }),
    "rsi" -> (e => { val a = arity("rsi", 2)(e); Rsi(a(0), a(1)) }),
    "macd" -> (e => { val a = arity("macd", 1)(e); Macd(a(0)) }),
    "macd_signal" -> (e => { val a = arity("macd_signal", 1)(e); MacdSignal(a(0)) }),
    "macd_hist" -> (e => { val a = arity("macd_hist", 1)(e); MacdHist(a(0)) }),
    "ewmcov" -> (e => { val a = arity("ewmcov", 3)(e); EwmCov(a(0), a(1), a(2)) }),
    "wilder" -> (e => { val a = arity("wilder", 2)(e); Wilder(a(0), a(1)) }),
    "holt" -> (e => { val a = arity("holt", 3)(e); Holt(a(0), a(1), a(2)) }),
    "kalman" -> (e => { val a = arity("kalman", 3)(e); Kalman(a(0), a(1), a(2)) }),
    "holt_winters" -> (e => { val a = arity("holt_winters", 5)(e)
      HoltWinters(a(0), a(1), a(2), a(3), a(4)) }),
    "garch" -> (e => { val a = arity("garch", 4)(e); Garch(a(0), a(1), a(2), a(3)) }),
    "supertrend" -> (e => { val a = arity("supertrend", 3)(e); SuperTrend(a(0), a(1), a(2)) }),
    "psar" -> (e => { val a = arity("psar", 5)(e); Psar(a(0), a(1), a(2), a(3), a(4)) }),
    "vec_dot" -> (e => { val a = arity("vec_dot", 2)(e); VecDot(a(0), a(1)) }),
    "bpe_count" -> (e => { val a = arity("bpe_count", 1)(e); BpeCount(a(0)) }),
    "kmv_distinct" -> (e => { val a = arity("kmv_distinct", 2)(e); KmvDistinct(a(0), a(1)) }),
    "hll_sketch" -> (e => { val a = arity("hll_sketch", 2)(e); HllSketch(a(0), a(1)) }),
    "hll_registers" -> (e => { val a = arity("hll_registers", 2)(e); HllRegisters(a(0), a(1)) }),
    "hll_merge" -> (e => { val a = arity("hll_merge", 2)(e); HllMerge(a(0), a(1)) }),
    "topk_by" -> (e => { val a = arity("topk_by", 4)(e); TopKBy(a(0), a(1), a(2), a(3)) }),
    "argmin_by" -> (e => { val a = arity("argmin_by", 3)(e); ArgMinBy(a(0), a(1), a(2)) }),
    "word_shingles" -> (e => {
      val a = arity("word_shingles", 2)(e)
      val n = a(1) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"word_shingles n must be an integer literal, got $other")
      }
      WordShingles(a(0), n, distinct = true)
    })
  )

  /** Register sma/ema/rsi/macd into an existing session's function registry. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  // ---- Column API ----------------------------------------------------------
  // call_function resolves through the function registry at analysis time and
  // produces a node that `.over(windowSpec)` wraps correctly, exactly like a
  // built-in aggregate. Requires registerAll(spark) (or GraftExtensions).
  import org.apache.spark.sql.functions.{call_function, lit}
  def sma(value: Column, n: Int): Column = call_function("sma", value, lit(n))
  def ema(value: Column, n: Int): Column = call_function("ema", value, lit(n))
  /** Exponential smoothing with a per-row α column (adaptive MAs). */
  def varEma(value: Column, alpha: Column): Column =
    call_function("var_ema", value, alpha)
  /** Running product of growth factors (compound returns, NVI/PVI). */
  def runprod(factor: Column): Column = call_function("runprod", factor)
  /** Renko brick level; brick size in hundredths (500 → 5.0). */
  def renko(value: Column, brickCenti: Int): Column =
    call_function("renko", value, lit(brickCenti))
  def rsi(value: Column, n: Int): Column = call_function("rsi", value, lit(n))
  def macd(value: Column): Column = call_function("macd", value)
  def macdSignal(value: Column): Column = call_function("macd_signal", value)
  def macdHist(value: Column): Column = call_function("macd_hist", value)
  /** RiskMetrics EWMA covariance; λ as a permille int (940 → 0.94). */
  def ewmcov(x: Column, y: Column, lambdaPm: Int): Column =
    call_function("ewmcov", x, y, lit(lambdaPm))
  def wilder(value: Column, n: Int): Column =
    call_function("wilder", value, lit(n))
  /** Holt forecast; α/β as permille ints (0.3 → 300). */
  def holt(value: Column, alphaPm: Int, betaPm: Int): Column =
    call_function("holt", value, lit(alphaPm), lit(betaPm))
  /** Local-level Kalman filtered level; q/r as permille ints. */
  def kalman(value: Column, qPm: Int, rPm: Int): Column =
    call_function("kalman", value, lit(qPm), lit(rPm))
  /** Additive Holt–Winters fitted ℓ+b+s; α/β/γ permille, cold-start
    * zero seasonal state. */
  def holtWinters(value: Column, period: Int, alphaPm: Int, betaPm: Int,
                  gammaPm: Int): Column =
    call_function("holt_winters", value, lit(period), lit(alphaPm),
      lit(betaPm), lit(gammaPm))
  /** GARCH(1,1) conditional volatility; ω in ppm, α/β permille. */
  def garch(ret: Column, omegaPpm: Int, alphaPm: Int, betaPm: Int): Column =
    call_function("garch", ret, lit(omegaPpm), lit(alphaPm), lit(betaPm))
  /** SuperTrend line over caller-computed basic bands (mid ± mult·atr). */
  def supertrend(upper: Column, lower: Column, close: Column): Column =
    call_function("supertrend", upper, lower, close)
  /** Parabolic SAR; acceleration factors as permille ints (20/20/200). */
  def psar(high: Column, low: Column, af0Pm: Int, stepPm: Int,
           maxPm: Int): Column =
    call_function("psar", high, low, lit(af0Pm), lit(stepPm), lit(maxPm))
}

/** Session-extension variant: lets users opt in via
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * so the functions exist in every session without an explicit
  * `registerAll` call. Shares the arity-validated builders with
  * [[FinancialFunctions.registerAll]], so both paths register the same
  * function set with the same error behavior. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val usages = Map(
    "sma" -> "sma(value, n) - trailing simple moving average over a window",
    "ema" -> "ema(value, n) - exponential moving average over a window",
    "var_ema" -> "var_ema(value, alpha) - exponential smoothing with a per-row alpha column",
    "runprod" -> "runprod(factor) - running product of per-row growth factors",
    "renko" -> "renko(value, brick_centi) - Renko brick level (brick in hundredths)",
    "rsi" -> "rsi(value, n) - Wilder relative strength index over a window",
    "macd" -> "macd(value) - MACD line (EMA12 - EMA26) over a window",
    "macd_signal" -> "macd_signal(value) - EMA9 signal line of the MACD",
    "macd_hist" -> "macd_hist(value) - MACD histogram (line - signal)",
    "ewmcov" -> "ewmcov(x, y, lambda_pm) - RiskMetrics EWMA covariance (zero-mean recurrence)",
    "holt" -> "holt(value, alpha_pm, beta_pm) - Holt double-exponential one-step forecast",
    "wilder" -> "wilder(value, n) - Wilder smoothing (RSI-style seeded running average)",
    "kalman" -> "kalman(value, q_pm, r_pm) - local-level Kalman filtered level",
    "holt_winters" -> "holt_winters(value, period, alpha_pm, beta_pm, gamma_pm) - additive Holt-Winters fitted level+trend+seasonal",
    "garch" -> "garch(return, omega_ppm, alpha_pm, beta_pm) - GARCH(1,1) conditional volatility",
    "supertrend" -> "supertrend(upper, lower, close) - SuperTrend ratcheted-band trend line",
    "psar" -> "psar(high, low, af0_pm, step_pm, max_pm) - Wilder's Parabolic SAR",
    "vec_dot" -> "vec_dot(a, b) - sequential-fold dot product of two numeric arrays",
    "bpe_count" -> "bpe_count(text) - merge-table BPE token count (default merge table)",
    "kmv_distinct" -> "kmv_distinct(hash60, k) - KMV distinct-count estimate from a 60-bit uniform hash",
    "topk_by" -> "topk_by(ord, id, tag, k) - bounded-heap smallest-k (ord,id,tag) entries, sorted ascending",
    "argmin_by" -> "argmin_by(ord, id, payload) - smallest-(ord,id) entry with a float-array payload",
    "word_shingles" -> "word_shingles(text, n) - distinct word n-gram array, one codegen'd pass")

  override def apply(ext: SparkSessionExtensions): Unit = {
    FinancialFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usages(name)),
        builder))
    }
  }
}
// NB: the SURVEY par-7.1.6 ORDER BY requirement needs no custom rule — Spark's
// analyzer already rejects an unordered window for AggregateWindowFunctions
// with a running frame ("requires window to be ordered"), on every
// registration path. Probed end-to-end in tools/ExtensionsDrive.
