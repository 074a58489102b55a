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

  /** Standard-normal CDF as the A&S polynomial on a rounded-exp density —
    * one fixed tree, branch on sign via the reflection N(−x) = 1 − N(x). */
  private def normCdf(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(A) * ax)
    val poly = ((((lit(B5) * t + lit(B4)) * t + lit(B3)) * t + lit(B2)) * t +
      lit(B1)) * t
    val phi = r10(exp(-(ax * ax) / lit(2.0))) / lit(Sqrt2Pi)
    val nAbs = lit(1.0) - phi * poly
    when(x >= 0.0, nAbs).otherwise(lit(1.0) - nAbs)
  }

  /** European Black–Scholes call/put prices per row (public formula):
    * `call = S·N(d1) − K·e^{−rT}·N(d2)`, put via parity-free direct
    * `K·e^{−rT}·N(−d2) − S·N(−d1)`, with
    * `d1 = (ln(S/K) + (r + σ²/2)T)/(σ√T)`, `d2 = d1 − σ√T`.
    *
    * Output prices round to 10 decimals (the oracle grid). NULL when
    * T ≤ 0, σ ≤ 0, or S/K non-positive (the formula is undefined — no
    * silent clamping). Pure projection: no shuffle, no state; at 100 TB
    * this is scan-bound. Adds (`bs_call`, `bs_put`). */
  def blackScholes(df: DataFrame, sCol: String, kCol: String, tCol: String,
                   rCol: String, sigmaCol: String): DataFrame = {
    Guards.requireNoReserved(df.columns, Seq("bs_call", "bs_put"),
      "Pricing.blackScholes")
    val s = col(sCol).cast("double")
    val k = col(kCol).cast("double")
    val tt = col(tCol).cast("double")
    val r = col(rCol).cast("double")
    val sg = col(sigmaCol).cast("double")
    val ok = tt > 0.0 && sg > 0.0 && s > 0.0 && k > 0.0
    val lnSK = r10(log(s / k))
    val sqT = sqrt(tt)
    val d1 = (lnSK + (r + sg * sg / lit(2.0)) * tt) / (sg * sqT)
    val d2 = d1 - sg * sqT
    val disc = r10(exp(-(r * tt)))
    val call = s * normCdf(d1) - k * disc * normCdf(d2)
    val put = k * disc * normCdf(-d2) - s * normCdf(-d1)
    df.withColumn("bs_call", when(ok, r10(call)))
      .withColumn("bs_put", when(ok, r10(put)))
  }
}
