package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Option-pricing column math — pure per-row expressions (whole-stage
  * codegen, zero shuffle at any corpus size): price a billion option rows
  * as one projection over the scan.
  *
  * Determinism contract: the only non-IEEE-exact primitives are `ln` and
  * `exp` (libm, engine-specific in the last ulp) — each of their outputs
  * rounds to 10 decimals in-engine (the
  * [[graft.operators.TextOps.bigramPmi]] contract) before feeding the
  * downstream arithmetic, and the standard-normal CDF is the public
  * Abramowitz–Stegun 26.2.17 polynomial (|ε| < 7.5·10⁻⁸ — far below any
  * trading tolerance) with its published constants as literal decimals,
  * so both engines evaluate the IDENTICAL fixed tree. `√(2π)` is folded
  * once on the Scala side and embedded as the same literal in the oracle.
  */
object Pricing {

  /** Abramowitz–Stegun 26.2.17 constants (public). */
  private val A = 0.2316419
  private val B1 = 0.319381530
  private val B2 = -0.356563782
  private val B3 = 1.781477937
  private val B4 = -1.821255978
  private val B5 = 1.330274429

  /** Scala-folded √(2π); [[sqrt2PiLiteral]] exposes the exact decimal for
    * the DuckDB oracle so both engines hold the identical double. */
  private val Sqrt2Pi = math.sqrt(2.0 * math.Pi)
  def sqrt2PiLiteral: String = Sqrt2Pi.toString

  private def r10(c: Column): Column = round(c, 10) + lit(0.0)

  /** European Black–Scholes call/put prices per row (public formula):
    * `call = S·N(d1) − K·e^{−rT}·N(d2)`, put via parity-free direct
    * `K·e^{−rT}·N(−d2) − S·N(−d1)`, with
    * `d1 = (ln(S/K) + (r + σ²/2)T)/(σ√T)`, `d2 = d1 − σ√T`.
    *
    * Output prices round to 10 decimals (the oracle grid). NULL when
    * T ≤ 0, σ ≤ 0, or S/K non-positive (the formula is undefined — no
    * silent clamping). Pure projection: no shuffle, no state; at 100 TB
    * this is scan-bound. Intermediates (d1, t, φ, N) materialize as
    * STAGED projection columns — reusing them as raw `Column`s would
    * inline each subtree at every reference (the NOTES.md duplication
    * trap: the two `when` branches alone double the CDF tree, and four
    * CDF calls each re-inline d1/d2 — measured 5.5 s → sub-second at
    * sf0.1 after staging). Adds (`bs_call`, `bs_put`). */
  private val StageCols = Seq("__d1", "__d2", "__disc", "__t1", "__t2",
    "__phi1", "__phi2", "__nabs1", "__nabs2", "__nd1", "__nd2",
    "__nmd1", "__nmd2")

  /** Shared staged-intermediate frame: d1/d2, discount, CDF scaffolding
    * — each as its OWN projection column (see [[blackScholes]] scaladoc
    * for why). Returns (staged df, the validity guard). */
  private def stage(df: DataFrame, sCol: String, kCol: String,
                    tCol: String, rCol: String,
                    sigmaCol: String): (DataFrame, Column) = {
    val s = col(sCol).cast("double")
    val k = col(kCol).cast("double")
    val tt = col(tCol).cast("double")
    val r = col(rCol).cast("double")
    val sg = col(sigmaCol).cast("double")
    val ok = tt > 0.0 && sg > 0.0 && s > 0.0 && k > 0.0
    def t(d: Column): Column = lit(1.0) / (lit(1.0) + lit(A) * abs(d))
    def phi(d: Column): Column =
      r10(exp(-(abs(d) * abs(d)) / lit(2.0))) / lit(Sqrt2Pi)
    def nAbs(tc: Column, phic: Column): Column =
      lit(1.0) - phic * ((((lit(B5) * tc + lit(B4)) * tc + lit(B3)) * tc +
        lit(B2)) * tc + lit(B1)) * tc
    def cdf(x: Column, nabs: Column): Column =
      when(x >= 0.0, nabs).otherwise(lit(1.0) - nabs)
    val staged = df
      // the ok-guard sits HERE: the d1 divisions are the only
      // undefined-input sites (ANSI divide-by-zero on σ = 0 / K = 0),
      // and a NULL __d1 propagates NULL through every later stage
      .withColumn("__d1", when(ok,
        (r10(log(s / k)) + (r + sg * sg / lit(2.0)) * tt) / (sg * sqrt(tt))))
      .withColumn("__d2", col("__d1") - sg * sqrt(tt))
      .withColumn("__disc", r10(exp(-(r * tt))))
      .withColumn("__t1", t(col("__d1")))
      .withColumn("__t2", t(col("__d2")))
      .withColumn("__phi1", phi(col("__d1")))
      .withColumn("__phi2", phi(col("__d2")))
      .withColumn("__nabs1", nAbs(col("__t1"), col("__phi1")))
      .withColumn("__nabs2", nAbs(col("__t2"), col("__phi2")))
      .withColumn("__nd1", cdf(col("__d1"), col("__nabs1")))
      .withColumn("__nmd1", cdf(-col("__d1"), col("__nabs1")))
      .withColumn("__nd2", cdf(col("__d2"), col("__nabs2")))
      .withColumn("__nmd2", cdf(-col("__d2"), col("__nabs2")))
    (staged, ok)
  }

  def blackScholes(df: DataFrame, sCol: String, kCol: String, tCol: String,
                   rCol: String, sigmaCol: String): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("bs_call", "bs_put") ++ StageCols, "Pricing.blackScholes")
    val s = col(sCol).cast("double")
    val k = col(kCol).cast("double")
    val (staged, ok) = stage(df, sCol, kCol, tCol, rCol, sigmaCol)
    staged
      .withColumn("bs_call", when(ok,
        r10(s * col("__nd1") - k * col("__disc") * col("__nd2"))))
      .withColumn("bs_put", when(ok,
        r10(k * col("__disc") * col("__nmd2") - s * col("__nmd1"))))
      .drop(StageCols: _*)
  }

  /** Call-side Black–Scholes Greeks (public closed forms) off the SAME
    * staged intermediates as [[blackScholes]]: `Δ = N(d1)`,
    * `Γ = φ(d1)/(Sσ√T)`, `vega = S·φ(d1)·√T`,
    * `θ = −Sφ(d1)σ/(2√T) − rK·e^{−rT}·N(d2)`,
    * `ρ = KT·e^{−rT}·N(d2)` — φ here is the standard normal pdf (the
    * staged rounded-exp density). Same determinism and NULL contract;
    * pure projection. Adds (`bs_delta`, `bs_gamma`, `bs_vega`,
    * `bs_theta`, `bs_rho`), each rounded to 10 decimals. */
  def blackScholesGreeks(df: DataFrame, sCol: String, kCol: String,
                         tCol: String, rCol: String,
                         sigmaCol: String): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("bs_delta", "bs_gamma", "bs_vega", "bs_theta", "bs_rho") ++
        StageCols, "Pricing.blackScholesGreeks")
    val s = col(sCol).cast("double")
    val k = col(kCol).cast("double")
    val tt = col(tCol).cast("double")
    val r = col(rCol).cast("double")
    val sg = col(sigmaCol).cast("double")
    val (staged, ok) = stage(df, sCol, kCol, tCol, rCol, sigmaCol)
    staged
      .withColumn("bs_delta", when(ok, r10(col("__nd1"))))
      .withColumn("bs_gamma", when(ok,
        r10(col("__phi1") / (s * sg * sqrt(tt)))))
      .withColumn("bs_vega", when(ok, r10(s * col("__phi1") * sqrt(tt))))
      .withColumn("bs_theta", when(ok,
        r10(-(s * col("__phi1") * sg) / (lit(2.0) * sqrt(tt)) -
          r * k * col("__disc") * col("__nd2"))))
      .withColumn("bs_rho", when(ok,
        r10(k * tt * col("__disc") * col("__nd2"))))
      .drop(StageCols: _*)
  }
}
