package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PricingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r10(x: Double) =
    BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's exact tree, re-walked in plain Scala. */
  private def bs(s: Double, k: Double, t: Double, r: Double, sg: Double) = {
    val sqrt2pi = math.sqrt(2.0 * math.Pi)
    def cdf(x: Double): Double = {
      val ax = math.abs(x)
      val tt = 1.0 / (1.0 + 0.2316419 * ax)
      val poly = ((((1.330274429 * tt + -1.821255978) * tt + 1.781477937) *
        tt + -0.356563782) * tt + 0.319381530) * tt
      val phi = r10(math.exp(-(ax * ax) / 2.0)) / sqrt2pi
      val nAbs = 1.0 - phi * poly
      if (x >= 0.0) nAbs else 1.0 - nAbs
    }
    val lnSK = r10(math.log(s / k))
    val sqT = math.sqrt(t)
    val d1 = (lnSK + (r + sg * sg / 2.0) * t) / (sg * sqT)
    val d2 = d1 - sg * sqT
    val disc = r10(math.exp(-(r * t)))
    (r10(s * cdf(d1) - k * disc * cdf(d2)),
      r10(k * disc * cdf(-d2) - s * cdf(-d1)), disc)
  }

  test("blackScholes: textbook ATM case matches the re-walked tree") {
    val rows = Seq((100.0, 100.0, 1.0, 0.05, 0.2))
      .toDF("s", "k", "t", "r", "sigma")
    val out = Pricing.blackScholes(rows, "s", "k", "t", "r", "sigma")
      .collect().head
    val (call, put, disc) = bs(100.0, 100.0, 1.0, 0.05, 0.2)
    assert(out.getAs[Double]("bs_call") === call)
    assert(out.getAs[Double]("bs_put") === put)
    // literature value ~10.4506 for this case
    assert(math.abs(call - 10.4506) < 0.002)
    // put-call parity holds by construction (N(x) + N(-x) = 1 exactly)
    assert(math.abs((call - put) - (100.0 - 100.0 * disc)) < 1e-8)
  }

  test("blackScholes: deep ITM call converges to forward intrinsic; guards") {
    val rows = Seq(
      (200.0, 100.0, 0.25, 0.02, 0.15),  // deep in the money
      (100.0, 100.0, 0.0, 0.02, 0.15),   // T = 0 -> NULL
      (100.0, 100.0, 0.25, 0.02, 0.0))   // sigma = 0 -> NULL
      .toDF("s", "k", "t", "r", "sigma")
    val out = Pricing.blackScholes(rows, "s", "k", "t", "r", "sigma")
      .collect()
    val disc = r10(math.exp(-(0.02 * 0.25)))
    assert(math.abs(out(0).getAs[Double]("bs_call") -
      (200.0 - 100.0 * disc)) < 1e-3)
    assert(out(1).isNullAt(out(1).fieldIndex("bs_call")))
    assert(out(2).isNullAt(out(2).fieldIndex("bs_put")))
  }

  test("blackScholesGreeks: ATM case matches the re-walked trees") {
    val sqrt2pi = math.sqrt(2.0 * math.Pi)
    def cdf(x: Double): Double = {
      val ax = math.abs(x)
      val tt = 1.0 / (1.0 + 0.2316419 * ax)
      val poly = ((((1.330274429 * tt + -1.821255978) * tt + 1.781477937) *
        tt + -0.356563782) * tt + 0.319381530) * tt
      val phi = r10(math.exp(-(ax * ax) / 2.0)) / sqrt2pi
      val nAbs = 1.0 - phi * poly
      if (x >= 0.0) nAbs else 1.0 - nAbs
    }
    val (s, k, t, r, sg) = (100.0, 100.0, 1.0, 0.05, 0.2)
    val d1 = (r10(math.log(s / k)) + (r + sg * sg / 2.0) * t) /
      (sg * math.sqrt(t))
    val d2 = d1 - sg * math.sqrt(t)
    val phi1 = r10(math.exp(-(math.abs(d1) * math.abs(d1)) / 2.0)) / sqrt2pi
    val disc = r10(math.exp(-(r * t)))
    val out = Pricing.blackScholesGreeks(
        Seq((s, k, t, r, sg)).toDF("s", "k", "t", "r", "sigma"),
        "s", "k", "t", "r", "sigma").collect().head
    assert(out.getAs[Double]("bs_delta") === r10(cdf(d1)))
    assert(out.getAs[Double]("bs_gamma") ===
      r10(phi1 / (s * sg * math.sqrt(t))))
    assert(out.getAs[Double]("bs_vega") === r10(s * phi1 * math.sqrt(t)))
    assert(out.getAs[Double]("bs_theta") ===
      r10(-(s * phi1 * sg) / (2.0 * math.sqrt(t)) - r * k * disc * cdf(d2)))
    assert(out.getAs[Double]("bs_rho") === r10(k * t * disc * cdf(d2)))
    // literature sanity for this case
    assert(math.abs(out.getAs[Double]("bs_delta") - 0.6368) < 0.001)
    assert(math.abs(out.getAs[Double]("bs_vega") - 37.524) < 0.01)
  }

  test("blackScholes plan is a pure projection - no exchange") {
    val rows = (1 to 100).map(i =>
      (100.0 + i, 100.0, 0.5, 0.02, 0.2)).toDF("s", "k", "t", "r", "sigma")
    val plan = Pricing.blackScholes(rows, "s", "k", "t", "r", "sigma")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pricing must not shuffle:\n$plan")
  }
}
