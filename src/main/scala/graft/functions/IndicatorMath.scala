package graft.functions

/** Single source of truth for the four financial-indicator recurrences.
  *
  * Semantics mirror the reference implementation
  * (`/root/reference/src/functions/{sma,ema,rsi,macd}.rs`) with the null
  * contract of SURVEY.md §7.1: a NULL input row emits NULL and leaves all
  * indicator state unchanged (the reference's per-row null branch,
  * e.g. `sma.rs:102-117`, is unreachable in Rust because
  * `Float64Array::value(i).into()` is always `Some`; we implement the
  * *documented* contract instead).
  *
  * Floating-point operation ORDER is part of the contract: the Catalyst
  * window expressions in [[WindowIndicators]] and the DuckDB oracle SQL in
  * [[graft.SparkEntry.oracleSql]] replicate these exact expression trees so
  * results are bit-identical across engines.
  *
  *  - SMA (`sma.rs:102-117`): trailing mean of the last `n` non-null values,
  *    summed left-to-right; NULL until `n` values seen.
  *  - EMA (`ema.rs:101-124`): first value seeds and is emitted as-is;
  *    `ema' = α·x + (1−α)·ema`, `α = 2/(n+1)`.
  *  - RSI (`rsi.rs:115-160`): first value → NULL; gains/losses from
  *    consecutive diffs; NULL until `n` diffs; seed averages = sum/n; then
  *    Wilder `avg' = avg·(1−α) + g·α`, `α = 1/n`;
  *    `RSI = 100 − 100/(1+gain/loss)`, `100` when avg_loss == 0
  *    (`rsi.rs:72-78`).
  *  - MACD (`macd.rs:55-120`): `ema12 − ema26`, α = 2/13 and 2/27, both
  *    seeded by the first value (so row 0 emits 0.0). Line only — no signal
  *    line, no histogram.
  */
object IndicatorMath {

  def smaSeries(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] = {
    require(n > 0, s"window size must be positive, got $n")
    val buf = scala.collection.mutable.Queue.empty[Double]
    xs.map {
      case None => None
      case Some(x) =>
        buf.enqueue(x)
        if (buf.size > n) buf.dequeue()
        if (buf.size == n) Some(buf.foldLeft(0.0)(_ + _) / n) else None
    }
  }

  def emaSeries(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] = {
    require(n > 0, s"window size must be positive, got $n")
    val alpha = 2.0 / (n + 1.0)
    val beta = 1.0 - alpha
    var ema: Option[Double] = None
    xs.map {
      case None => None
      case Some(x) =>
        ema = ema match {
          case None       => Some(x)
          case Some(prev) => Some(alpha * x + beta * prev)
        }
        ema
    }
  }

  def rsiSeries(xs: Seq[Option[Double]], n: Int): Seq[Option[Double]] = {
    require(n > 0, s"window size must be positive, got $n")
    val alpha = 1.0 / n
    val beta = 1.0 - alpha
    var prev: Option[Double] = None
    var sumG = 0.0; var sumL = 0.0 // running sums until n diffs, then averages
    var cnt = 0
    xs.map {
      case None => None
      case Some(x) =>
        prev match {
          case None =>
            prev = Some(x); None
          case Some(p) =>
            val change = x - p
            val g = if (change > 0.0) change else 0.0
            val l = if (change < 0.0) -change else 0.0
            cnt += 1
            prev = Some(x)
            if (cnt < n) { sumG += g; sumL += l; None }
            else {
              if (cnt == n) { sumG = (sumG + g) / n; sumL = (sumL + l) / n }
              else { sumG = sumG * beta + g * alpha; sumL = sumL * beta + l * alpha }
              Some(if (sumL == 0.0) 100.0 else 100.0 - (100.0 / (1.0 + sumG / sumL)))
            }
        }
    }
  }

  def macdSeries(xs: Seq[Option[Double]]): Seq[Option[Double]] = {
    val a12 = 2.0 / 13.0; val b12 = 1.0 - a12
    val a26 = 2.0 / 27.0; val b26 = 1.0 - a26
    var e12: Option[Double] = None
    var e26: Option[Double] = None
    xs.map {
      case None => None
      case Some(x) =>
        e12 = e12 match { case None => Some(x); case Some(p) => Some(a12 * x + b12 * p) }
        e26 = e26 match { case None => Some(x); case Some(p) => Some(a26 * x + b26 * p) }
        Some(e12.get - e26.get)
    }
  }

  /** RiskMetrics zero-mean EWMA covariance series: seeded by the first
    * complete pair's product; a row with either side missing emits None
    * and freezes the state. */
  def ewmCovSeries(xs: Seq[Option[Double]], ys: Seq[Option[Double]],
                   lambdaPm: Int): Seq[Option[Double]] = {
    val lam = lambdaPm / 1000.0; val b = 1.0 - lam
    var cov: Option[Double] = None
    xs.zip(ys).map {
      case (Some(x), Some(y)) =>
        cov = cov match {
          case None => Some(x * y)
          case Some(p) => Some(lam * p + b * (x * y))
        }
        cov
      case _ => None
    }
  }

  /** (signal, histogram) companion to [[macdSeries]]: signal = EMA9
    * (α = 2/10) of the MACD line, seeded by the first line value (0.0 at
    * the seed row); histogram = line − signal. Same frozen-state NULL
    * contract. */
  def macdSignalHistSeries(
      xs: Seq[Option[Double]]): Seq[(Option[Double], Option[Double])] = {
    val a12 = 2.0 / 13.0; val b12 = 1.0 - a12
    val a26 = 2.0 / 27.0; val b26 = 1.0 - a26
    val a9 = 2.0 / 10.0; val b9 = 1.0 - a9
    var e12: Option[Double] = None
    var e26: Option[Double] = None
    var sig: Option[Double] = None
    xs.map {
      case None => (None, None)
      case Some(x) =>
        e12 = e12 match { case None => Some(x); case Some(p) => Some(a12 * x + b12 * p) }
        e26 = e26 match { case None => Some(x); case Some(p) => Some(a26 * x + b26 * p) }
        val m = e12.get - e26.get
        sig = sig match { case None => Some(m); case Some(p) => Some(a9 * m + b9 * p) }
        (sig, Some(m - sig.get))
    }
  }
}
