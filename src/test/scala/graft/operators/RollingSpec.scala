package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RollingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def series(vs: Double*) =
    vs.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("sym", "i", "v")

  test("rolling median: null until full, element-exact, outlier-immune") {
    val df = series(1, 2, 3, 100, 5) // the 100 is an outlier spike
    val out = Rolling.median(df, "v", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").select("roll_median").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(out(0).isEmpty && out(1).isEmpty) // frame not full
    assert(out(2) === Some(2.0))
    assert(out(3) === Some(3.0))  // median shrugs at the spike...
    assert(out(4) === Some(5.0))
    val mean = Rolling.bollinger(df, "v", Seq("sym"), Seq("i"), n = 3, k = 2.0)
      .orderBy("i").collect()(3).getAs[Double]("bb_mid")
    assert(mean === 35.0) // ...while the mean is dragged to 35
  }

  test("bollinger: constant series collapses the bands onto the mid") {
    val out = Rolling.bollinger(series(7, 7, 7, 7), "v", Seq("sym"), Seq("i"),
        n = 3, k = 2.0)
      .orderBy("i").collect().drop(2)
    out.foreach { r =>
      assert(r.getAs[Double]("bb_mid") === 7.0)
      assert(r.getAs[Double]("bb_upper") === 7.0)
      assert(r.getAs[Double]("bb_lower") === 7.0)
    }
  }

  test("bollinger: textbook mean ± k·σ on a known window") {
    // window (2, 4, 6): mean 4, σ² = (4+16+36)/3 − 16 = 2.666…, σ = 1.632…
    val out = Rolling.bollinger(series(2, 4, 6), "v", Seq("sym"), Seq("i"),
        n = 3, k = 2.0)
      .orderBy("i").collect().last
    val sigma = math.sqrt(56.0 / 3.0 - 16.0)
    assert(out.getAs[Double]("bb_mid") === 4.0)
    assert(math.abs(out.getAs[Double]("bb_upper") - (4.0 + 2.0 * sigma)) < 1e-12)
    assert(math.abs(out.getAs[Double]("bb_lower") - (4.0 - 2.0 * sigma)) < 1e-12)
  }

  test("vwap: textbook weighted average, null until full, exact on 2-dp prices") {
    val df = Seq(("s", 0, 10.50, 2.0), ("s", 1, 11.00, 1.0), ("s", 2, 9.10, 3.0))
      .toDF("sym", "i", "p", "v")
    val out = Rolling.vwap(df, "p", "v", Seq("sym"), Seq("i"), n = 2)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("vwap")))
    // (10.50·2 + 11.00·1) / 3 = 32/3
    assert(math.abs(out(1).getAs[Double]("vwap") - 32.0 / 3.0) < 1e-12)
    // (11.00·1 + 9.10·3) / 4 = 38.3/4 = 9.575 — exact in scaled integers
    assert(out(2).getAs[Double]("vwap") === 3830.0 / (100.0 * 4.0))
  }

  test("stochastic: %K at the extremes, flat windows yield NULL, %D needs 3 Ks") {
    val df = series(1, 2, 3, 3, 3, 9)
    val out = Rolling.stochastic(df, "v", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    def k(i: Int) = Option(out(i).get(out(i).fieldIndex("pct_k")))
      .map(_.asInstanceOf[Double])
    assert(k(0).isEmpty && k(1).isEmpty) // frame not full
    assert(k(2) === Some(100.0)) // 3 is the max of (1,2,3)
    assert(k(3) === Some(100.0)) // still the max of (2,3,3)
    assert(k(4).isEmpty)         // (3,3,3) is flat — no direction
    assert(k(5) === Some(100.0)) // 9 tops (3,3,9)
    // %D = mean of the last 3 %K values; any NULL K nulls it
    val d = out.map(r => Option(r.get(r.fieldIndex("pct_d"))))
    assert(d(3).isEmpty && d(4).isEmpty && d(5).isEmpty) // NULL K in range
  }

  test("obv: signed running volume — up adds, down subtracts, flat and first ignore") {
    val df = Seq(("s", 0, 10.0, 100.0), ("s", 1, 11.0, 50.0), ("s", 2, 11.0, 70.0),
        ("s", 3, 9.0, 20.0), ("s", 4, 12.0, 5.5))
      .toDF("sym", "i", "p", "v")
    val out = Rolling.obv(df, "p", "v", Seq("sym"), Seq("i"), volScale = 1)
      .orderBy("i").collect().map(_.getAs[Double]("obv"))
    assert(out.toSeq === Seq(0.0, 50.0, 50.0, 30.0, 35.5))
  }

  test("atr: first bar falls back to high−low, gaps widen TR via prev close") {
    // bars: (h,l,c) rows; bar 2 gaps up — TR must use |high − prev close|
    val bars = Seq(("s", 0, 12.0, 8.0, 10.0), ("s", 1, 11.0, 9.0, 11.0),
        ("s", 2, 20.0, 18.0, 19.0))
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.atr(bars, "h", "l", "c", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("atr")))
    assert(out(1).isNullAt(out(1).fieldIndex("atr")))
    // TRs: 4 (h−l, no prev), 2 (h−l wins), 9 (|20−11| gap wins) → mean 5
    assert(out(2).getAs[Double]("atr") === 5.0)
  }

  test("roc: momentum vs the n-back value, null base and zero base yield NULL") {
    val df = series(0, 10, 12, 8)
    val out = Rolling.roc(df, "v", Seq("sym"), Seq("i"), n = 2)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("roc"))) // no 2-back value
    assert(out(1).isNullAt(out(1).fieldIndex("roc")))
    assert(out(2).isNullAt(out(2).fieldIndex("roc"))) // base is 0
    assert(out(3).getAs[Double]("roc") === -20.0)     // (8−10)/10
  }

  test("donchian: channel tracks window extremes, null until full") {
    val out = Rolling.donchian(series(5, 1, 9, 3), "v", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("dc_upper")))
    assert(out(2).getAs[Double]("dc_upper") === 9.0)
    assert(out(2).getAs[Double]("dc_lower") === 1.0)
    assert(out(2).getAs[Double]("dc_mid") === 5.0)
    assert(out(3).getAs[Double]("dc_upper") === 9.0) // (1,9,3)
    assert(out(3).getAs[Double]("dc_lower") === 1.0)
  }

  test("williams %R: mirrored stochastic — 0 at the high, −100 at the low") {
    val out = Rolling.williamsR(series(1, 2, 3, 1), "v", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("will_r")))
    assert(out(2).getAs[Double]("will_r") === 0.0)    // 3 is the window high
    assert(out(3).getAs[Double]("will_r") === -100.0) // 1 is the window low
  }

  test("drawdown: zero at new highs, peak-relative decline after") {
    val out = Rolling.drawdown(series(10, 20, 15, 20, 5), "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    assert(out.map(_.getAs[Double]("peak")).toSeq === Seq(10.0, 20.0, 20.0, 20.0, 20.0))
    assert(out(1).getAs[Double]("drawdown") === 0.0)
    assert(out(2).getAs[Double]("drawdown") === -0.25)
    assert(out(4).getAs[Double]("drawdown") === -0.75)
  }

  test("keltner: mid is the EMA from row one, bands wait for the ATR frame") {
    graft.functions.FinancialFunctions.registerAll(spark)
    val bars = Seq(("s", 0, 12.0, 8.0, 10.0), ("s", 1, 11.0, 9.0, 11.0),
        ("s", 2, 20.0, 18.0, 19.0))
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.keltner(bars, "h", "l", "c", Seq("sym"), Seq("i"),
        emaN = 3, atrN = 3, k = 2.0)
      .orderBy("i").collect()
    assert(out(0).getAs[Double]("kc_mid") === 10.0) // EMA seeds on row 1
    assert(out(0).isNullAt(out(0).fieldIndex("kc_upper"))) // ATR frame not full
    // row 3: ATR = mean(4, 2, 9) = 5 (from the atr spec); EMA(3): α = 0.5
    // → 10, 10.5, 14.75; upper = 14.75 + 2·5
    assert(out(2).getAs[Double]("kc_mid") === 14.75)
    assert(out(2).getAs[Double]("kc_upper") === 24.75)
    assert(out(2).getAs[Double]("kc_lower") === 4.75)
  }

  test("corrBeta: perfectly linear series → corr ±1 and the exact slope") {
    val df = Seq(("s", 0, 1.0, 10.0), ("s", 1, 2.0, 8.0), ("s", 2, 3.0, 6.0))
      .toDF("sym", "i", "x", "y") // y = 12 − 2x
    val out = Rolling.corrBeta(df, "x", "y", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    assert(out(1).isNullAt(out(1).fieldIndex("roll_corr"))) // frame not full
    assert(out(2).getAs[Double]("roll_corr") === -1.0)
    assert(out(2).getAs[Double]("roll_beta") === -2.0)
  }

  test("corrBeta: a flat series has no direction — NULL corr and beta") {
    val df = Seq(("s", 0, 5.0, 1.0), ("s", 1, 5.0, 2.0), ("s", 2, 5.0, 3.0))
      .toDF("sym", "i", "x", "y")
    val out = Rolling.corrBeta(df, "x", "y", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect().last
    assert(out.isNullAt(out.fieldIndex("roll_corr")))
    assert(out.isNullAt(out.fieldIndex("roll_beta")))
  }

  test("corrBeta: scaled decimals stay exact (2-dp y series)") {
    // x = (1,2,3), y = (1.01, 1.02, 1.03): exactly linear in scaled ints
    val df = Seq(("s", 0, 1.0, 1.01), ("s", 1, 2.0, 1.02), ("s", 2, 3.0, 1.03))
      .toDF("sym", "i", "x", "y")
    val out = Rolling.corrBeta(df, "x", "y", Seq("sym"), Seq("i"), n = 3,
        xScale = 0, yScale = 2)
      .orderBy("i").collect().last
    assert(out.getAs[Double]("roll_corr") === 1.0)
    assert(out.getAs[Double]("roll_beta") === 0.01)
  }

  test("autocorr: linear series → +1, alternating series at lag 1 → −1") {
    // x = i: x and lag-2 x are perfectly collinear once 3 pairs exist
    val lin = (0 until 6).map(i => ("s", i, i.toDouble)).toDF("sym", "i", "x")
    val outL = Rolling.autocorr(lin, "x", Seq("sym"), Seq("i"),
        n = 3, lagK = 2).orderBy("i").collect()
    // rows 0..3: fewer than 3 (x, x−2) pairs in the 3-row frame → NULL
    assert(outL(3).isNullAt(outL(3).fieldIndex("roll_autocorr")))
    assert(outL(4).getAs[Double]("roll_autocorr") === 1.0)
    assert(outL(5).getAs[Double]("roll_autocorr") === 1.0)
    // alternating ±1 against its own 1-lag is exactly anti-correlated
    val alt = (0 until 6).map(i => ("s", i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("sym", "i", "x")
    val outA = Rolling.autocorr(alt, "x", Seq("sym"), Seq("i"),
        n = 4, lagK = 1).orderBy("i").collect()
    assert(outA.last.getAs[Double]("roll_autocorr") === -1.0)
  }

  test("autocorr: constant series has no direction — NULL") {
    val df = (0 until 8).map(i => ("s", i, 5.0)).toDF("sym", "i", "x")
    val out = Rolling.autocorr(df, "x", Seq("sym"), Seq("i"),
        n = 3, lagK = 1).orderBy("i").collect().last
    assert(out.isNullAt(out.fieldIndex("roll_autocorr")))
  }

  test("elderRay: powers measure extremes against the EMA; forceIndex seeds on row 2") {
    graft.functions.FinancialFunctions.registerAll(spark)
    // closes 10, 12; EMA(1) == close itself → bull = h − c, bear = l − c
    val df = Seq(("s", 1, 11.0, 9.0, 10.0, 5.0), ("s", 2, 13.0, 11.5, 12.0, 4.0))
      .toDF("sym", "i", "h", "l", "c", "v")
    val er = Rolling.elderRay(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 1)
      .orderBy("i").collect()
    assert(er(0).getAs[Double]("bull_power") === 1.0)
    assert(er(0).getAs[Double]("bear_power") === -1.0)
    assert(er(1).getAs[Double]("bull_power") === 1.0)
    // force index: row 1 NULL (no prev close), row 2 seeds on (12−10)·4
    val fi = Rolling.forceIndex(df, "c", "v", Seq("sym"), Seq("i"), n = 13)
      .orderBy("i").collect()
    assert(fi(0).isNullAt(fi(0).fieldIndex("force_index")))
    assert(fi(1).getAs[Double]("force_index") === 8.0)
  }

  test("cmf: hand value, flat-bar convention, bounds") {
    // n=2 frame: bars (h,l,c,v): (10,0,10,2) mfm=1; (10,0,0,3) mfm=-1;
    // (10,10,10,5) flat → mfm=0
    val df = Seq(
      ("s", 1, 10.0, 0.0, 10.0, 2.0), ("s", 2, 10.0, 0.0, 0.0, 3.0),
      ("s", 3, 10.0, 10.0, 10.0, 5.0)
    ).toDF("sym", "i", "h", "l", "c", "v")
    val out = Rolling.cmf(df, "h", "l", "c", "v", Seq("sym"), Seq("i"), n = 2)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("cmf"))) // frame not full
    // rows 1-2: (1·2 + (−1)·3)/(2+3) = −0.2
    assert(out(1).getAs[Double]("cmf") === -0.2)
    // rows 2-3: ((−1)·3 + 0·5)/(3+5) = −0.375; CMF stays in [−1, 1]
    assert(out(2).getAs[Double]("cmf") === -0.375)
    assert(out.flatMap(r => Option(r.getAs[java.lang.Double]("cmf")))
      .forall(v => v >= -1.0 && v <= 1.0))
  }

  test("drawdownDuration: hand trace with re-touch recovery") {
    // series 10, 8, 9, 10, 7, 6, 11:
    //   peaks at rows 0 (10), 3 (re-touch of 10), 6 (new high 11)
    //   durations: 0, 1, 2, 0, 1, 2, 0
    val df = Seq(10.0, 8.0, 9.0, 10.0, 7.0, 6.0, 11.0).zipWithIndex
      .map { case (v, i) => ("s", i, v) }.toDF("sym", "i", "x")
    val got = Rolling.drawdownDuration(df, "x", Seq("sym"), Seq("i"))
      .orderBy("i").collect().map(_.getAs[Long]("dd_duration")).toSeq
    assert(got === Seq(0L, 1L, 2L, 0L, 1L, 2L, 0L))
  }

  test("ffill: carries the last value forward, leading nulls stay null") {
    val df = Seq(("s", 0, None), ("s", 1, Some(4.0)), ("s", 2, None),
        ("s", 3, None), ("s", 4, Some(7.0)))
      .toDF("sym", "i", "v")
    val out = Rolling.ffill(df, "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
      .map(r => Option(r.get(r.fieldIndex("v_filled"))).map(_.asInstanceOf[Double]))
    assert(out.toSeq === Seq(None, Some(4.0), Some(4.0), Some(4.0), Some(7.0)))
  }

  test("all three band columns evaluate in ONE window pass") {
    val p = Rolling.bollinger(series(1, 2, 3), "v", Seq("sym"), Seq("i"),
        n = 2, k = 1.0)
      .queryExecution.executedPlan.toString
    assert(p.split("\n").count(_.trim.startsWith("+- Window")) <= 1,
      s"expected one Window operator for all bands:\n$p")
  }

  test("corrBeta: all six window sums evaluate in ONE window pass") {
    val df = Seq(("s", 0, 1.0, 2.0), ("s", 1, 2.0, 3.0)).toDF("sym", "i", "x", "y")
    val p = Rolling.corrBeta(df, "x", "y", Seq("sym"), Seq("i"), n = 2)
      .queryExecution.executedPlan.toString
    assert(p.split("\n").count(_.trim.startsWith("+- Window")) <= 1,
      s"expected one Window operator for all sums:\n$p")
  }

  test("perfSummary: one row per key, textbook sums, zero-vol NULL sharpe") {
    val df = Seq(("a", 0, 0.01), ("a", 1, -0.02), ("a", 2, 0.03),
      ("b", 0, 0.05), ("b", 1, 0.05), ("c", 0, 0.01))
      .toDF("sym", "i", "r")
    val out = Rolling.perfSummary(df, "r", Seq("sym"), Seq("i"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_returns") === 3L)
    assert(math.abs(a.getAs[Double]("total_ret") - 0.02) < 1e-15)
    val rets = Seq(0.01, -0.02, 0.03)
    val mu = rets.sum / 3.0
    val sd = math.sqrt(rets.map(x => (x - mu) * (x - mu)).sum / 2.0)
    assert(math.abs(a.getAs[Double]("vol") - sd) < 1e-15)
    assert(math.abs(a.getAs[Double]("sharpe") - mu / sd) < 1e-12)
    // constant returns: vol 0 → sharpe NULL, vol 0.0
    val b = out("b")
    assert(b.getAs[Double]("vol") === 0.0)
    assert(b.get(b.fieldIndex("sharpe")) === null)
    // a single return: vol and sharpe undefined
    val c = out("c")
    assert(c.get(c.fieldIndex("vol")) === null)
  }

  test("historicalVar: quantile VaR and discrete-tail ES on a hand frame") {
    // returns: -.05, .01, .02, -.03, .04 ; n=5, alpha=0.2 → k=1
    val rets = Seq(-0.05, 0.01, 0.02, -0.03, 0.04)
    val df = rets.zipWithIndex.map { case (r, i) => ("s", i, r) }
      .toDF("sym", "i", "r")
    val out = Rolling.historicalVar(df, "r", Seq("sym"), Seq("i"),
        n = 5, alpha = 0.2)
      .orderBy(col("i").desc).limit(1).collect().head
    // percentile(0.2) over sorted (-.05,-.03,.01,.02,.04): h=.2*4=.8 →
    // -.05 + .8*(.02) = -.034 → var = .034
    assert(math.abs(out.getAs[Double]("var_alpha") - 0.034) < 1e-12)
    // k=1 worst return = -.05 → es = .05
    assert(out.getAs[Double]("es_alpha") === 0.05)
    // unfilled frames are NULL
    val early = Rolling.historicalVar(df, "r", Seq("sym"), Seq("i"), 5, 0.2)
      .orderBy(col("i")).limit(1).collect().head
    assert(early.get(early.fieldIndex("var_alpha")) === null)
    assert(early.get(early.fieldIndex("es_alpha")) === null)
  }

  test("logReturns: hand values, first-row and non-positive-base NULLs") {
    val df = Seq(100.0, 110.0, 99.0, 0.0, 50.0).zipWithIndex
      .map { case (v, i) => ("s", i, v) }.toDF("sym", "i", "v")
    val out = Rolling.logReturns(df, "v", Seq("sym"), Seq("i"))
      .collect().map(r => r.getInt(1) ->
        ((Option(r.getAs[java.lang.Double]("ret_simple")),
          Option(r.getAs[java.lang.Double]("ret_log"))))).toMap
    assert(out(0) === ((None, None)))
    assert(out(1)._1.map(_.doubleValue()) === Some(0.10000000000000001) ||
      out(1)._1.map(_.doubleValue()) === Some(0.1))
    val ln11 = BigDecimal(math.log(1.1))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1)._2.map(_.doubleValue()) === Some(ln11))
    // base 0 at i=4: no simple/log return
    assert(out(4) === ((None, None)))
    // x = 0 at i=3: simple return defined (-1), log return NULL
    assert(out(3)._1.map(_.doubleValue()) === Some(-1.0))
    assert(out(3)._2 === None)
  }

  test("realizedVol: matches a direct sample-stddev computation") {
    val rets = Seq(0.01, -0.02, 0.03, 0.01, -0.01)
    val df = rets.zipWithIndex.map { case (r, i) => ("s", i, r) }
      .toDF("sym", "i", "r")
    val out = Rolling.realizedVol(df, "r", Seq("sym"), Seq("i"), n = 3)
      .collect().map(r => r.getInt(1) ->
        Option(r.getAs[java.lang.Double]("rvol")).map(_.doubleValue())).toMap
    assert(out(1) === None)
    def sd(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1.0))
    }
    assert(math.abs(out(2).get - sd(rets.slice(0, 3))) < 1e-15)
    assert(math.abs(out(4).get - sd(rets.slice(2, 5))) < 1e-15)
    // annualization is a plain multiplier
    val ann = Rolling.realizedVol(df, "r", Seq("sym"), Seq("i"), n = 3,
        annualize = math.sqrt(252.0))
      .collect().map(r => r.getInt(1) ->
        Option(r.getAs[java.lang.Double]("rvol")).map(_.doubleValue())).toMap
    assert(ann(2).get === out(2).get * math.sqrt(252.0))
  }

  test("aroon: extreme positions, recent-tie convention, fill schedule") {
    // highs: 5, 9, 7, 9, 6 ; lows = highs - 2 ; n = 3 → frame of 4
    val hs = Seq(5.0, 9.0, 7.0, 9.0, 6.0)
    val df = hs.zipWithIndex.map { case (h, i) => ("s", i, h, h - 2.0) }
      .toDF("sym", "i", "h", "l")
    val out = Rolling.aroon(df, "h", "l", Seq("sym"), Seq("i"), n = 3)
      .collect().map(r => r.getInt(1) ->
        (Option(r.getAs[java.lang.Double]("aroon_up")).map(_.doubleValue()),
         Option(r.getAs[java.lang.Double]("aroon_down")).map(_.doubleValue())))
      .toMap
    assert(out(2) === ((None, None)), "frame not yet full")
    // i=3: frame (5,9,7,9): tied highs at i=1,3 → most recent (i=3) wins
    assert(out(3)._1 === Some(100.0))
    // lowest low in frame = 3.0 at i=0 → since=3 → 100·(3-3)/3 = 0
    assert(out(3)._2 === Some(0.0))
    // i=4: frame (9,7,9,6): high at i=3 → since=1 → 100·2/3
    assert(out(4)._1 === Some(100.0 * 2.0 / 3.0))
    // low 4.0 at i=4 (current) → 100
    assert(out(4)._2 === Some(100.0))
  }

  test("mfi: hand-computed flows, flat bars count as zero flow, saturation") {
    // tp == close (h=l=c); volume 10; closes: 1,2,3,2,2,4
    // flows: NULL, +20, +30, -20, 0 (flat), +40
    val cs = Seq(1.0, 2.0, 3.0, 2.0, 2.0, 4.0)
    val df = cs.zipWithIndex.map { case (c, i) => ("s", i, c, c, c, 10.0) }
      .toDF("sym", "i", "h", "l", "c", "vol")
    val out = Rolling.mfi(df, "h", "l", "c", "vol", Seq("sym"), Seq("i"), n = 3)
      .collect().map(r => r.getInt(1) ->
        Option(r.getAs[java.lang.Double]("mfi")).map(_.doubleValue())).toMap
    assert(out(2) === None, "frame still spans the flowless first bar")
    // i=3: flows (+20,+30,-20): pos=50, neg=20 → 100-100/(1+2.5)
    assert(out(3) === Some(100.0 - 100.0 / (1.0 + 50.0 / 20.0)))
    // i=4: flows (+30,-20,0): the flat bar contributes zero to both sides
    assert(out(4) === Some(100.0 - 100.0 / (1.0 + 30.0 / 20.0)))
    // i=5: flows (-20,0,+40)
    assert(out(5) === Some(100.0 - 100.0 / (1.0 + 40.0 / 20.0)))
    // all-rising series saturates at 100
    val up = (1 to 6).map(i => ("s", i, i.toDouble, i.toDouble, i.toDouble, 1.0))
      .toDF("sym", "i", "h", "l", "c", "vol")
    val sat = Rolling.mfi(up, "h", "l", "c", "vol", Seq("sym"), Seq("i"), n = 3)
      .orderBy(col("i").desc).limit(1).collect().head.getAs[Double]("mfi")
    assert(sat === 100.0)
  }

  test("cci: hand-computed value, flat-frame NULL, fill schedule") {
    // tp = close here (h=l=c); frame n=3
    val mk = Seq(10.0, 12.0, 14.0, 14.0, 14.0)
    val df = mk.zipWithIndex.map { case (v, i) => ("s", i, v, v, v) }
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.cci(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 3)
      .collect().map(r => r.getInt(1) ->
        Option(r.getAs[java.lang.Double]("cci")).map(_.doubleValue())).toMap
    assert(out(1) === None, "unfilled frame")
    // i=2: frame (10,12,14): sma=12, md=(2+0+2)/3; cci=(14-12)/(.015*4/3)
    assert(out(2) === Some(2.0 / (0.015 * (4.0 / 3.0))))
    // i=4: frame (14,14,14): md=0 → NULL
    assert(out(4) === None)
  }

  test("ichimoku: hand-computed midpoints, shifts, and fill schedule") {
    // bars i=0..9: high = 10+i, low = 8+i, close = 9+i
    val df = (0 until 10).map(i => ("s", i, 10.0 + i, 8.0 + i, 9.0 + i))
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.ichimoku(df, "h", "l", "c", Seq("sym"), Seq("i"),
        pConv = 3, pBase = 5, pSpanB = 7)
      .collect().map(r => r.getInt(1) -> r).toMap
    def d(i: Int, c: String) =
      Option(out(i).getAs[java.lang.Double](c)).map(_.doubleValue())
    // tenkan at i>=2: (max(h over 3) + min(l over 3))/2 = (10+i + 8+i-2)/2
    assert(d(1, "tenkan") === None)
    assert(d(2, "tenkan") === Some((12.0 + 8.0) / 2))
    assert(d(9, "tenkan") === Some((19.0 + 15.0) / 2))
    // kijun fills at i>=4
    assert(d(3, "kijun") === None)
    assert(d(4, "kijun") === Some((14.0 + 8.0) / 2))
    // senkou_a = (tenkan+kijun)/2 shifted 5 forward: first at i=9
    // (source row 4 is the first with both lines)
    assert(d(8, "senkou_a") === None)
    assert(d(9, "senkou_a") === Some((d(4, "tenkan").get + d(4, "kijun").get) / 2))
    // senkou_b = 7-bar midpoint shifted 5: first at i=11 → none in 10 bars
    assert((0 until 10).forall(i => d(i, "senkou_b").isEmpty))
    // chikou at i = close(i+5); absent for the last 5 bars
    assert(d(0, "chikou") === Some(14.0))
    assert(d(4, "chikou") === Some(18.0))
    assert(d(5, "chikou") === None)
  }

  test("ichimoku: one exchange, shared window spec") {
    val df = (0 until 60).map(i => ("s", i, 10.0 + i, 8.0 + i, 9.0 + i))
      .toDF("sym", "i", "h", "l", "c")
    val p = Rolling.ichimoku(df, "h", "l", "c", Seq("sym"), Seq("i"))
      .queryExecution.executedPlan.toString
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) <= 1,
      s"one exchange expected:\n$p")
  }

  test("holt: matches the direct level+trend recurrence; linear series " +
      "forecast exactly") {
    import org.apache.spark.sql.expressions.Window
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0)
    val df = series(xs: _*)
    val w = Window.partitionBy("sym").orderBy("i")
    val out = df.select(col("i"),
        graft.functions.FinancialFunctions.holt(col("v"), 300, 200).over(w)
          .as("f"))
      .collect().map(r => r.getInt(0) ->
        Option(r.getAs[java.lang.Double]("f")).map(_.doubleValue())).toMap
    assert(out(0) === None, "one value cannot seed a trend")
    // direct replay
    val (a, b) = (0.3, 0.2)
    var lvl = xs(0); var trd = Double.NaN
    val exp = xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) None
      else if (i == 1) { trd = x - lvl; lvl = x; Some(lvl + trd) }
      else {
        val nl = a * x + (1 - a) * (lvl + trd)
        trd = b * (nl - lvl) + (1 - b) * trd
        lvl = nl
        Some(lvl + trd)
      }
    }
    for (i <- xs.indices) assert(out(i) === exp(i), s"row $i")
    // a perfectly linear series forecasts the next point exactly
    val lin = series((1 to 8).map(i => 5.0 + 2.0 * i): _*)
    val lf = lin.select(col("i"),
        graft.functions.FinancialFunctions.holt(col("v"), 500, 500).over(w)
          .as("f"))
      .collect().map(r => r.getInt(0) ->
        Option(r.getAs[java.lang.Double]("f")).map(_.doubleValue())).toMap
    for (i <- 1 until 7)
      assert(math.abs(lf(i).get - (5.0 + 2.0 * (i + 2))) < 1e-9,
        s"linear forecast at $i")
  }

  test("wilder: NULL until n values, mean seed, then the recurrence") {
    import org.apache.spark.sql.expressions.Window
    val df = series(1, 2, 3, 4)
    val w = Window.partitionBy("sym").orderBy("i")
    val out = df.select(col("i"),
        graft.functions.FinancialFunctions.wilder(col("v"), 2).over(w)
          .as("wd"))
      .collect().map(r => r.getInt(0) ->
        Option(r.getAs[java.lang.Double]("wd")).map(_.doubleValue())).toMap
    assert(out(0) === None)
    assert(out(1) === Some(1.5))            // (1+2)/2 seed
    assert(out(2) === Some(1.5 * 0.5 + 3 * 0.5))
    assert(out(3) === Some(2.25 * 0.5 + 4 * 0.5))
  }

  /** Textbook ADX recurrence, replayed directly in Scala — validates the
    * window plumbing (projection binding, shared specs, native wilder)
    * against an independent sequential implementation. */
  private def adxReplay(bars: Seq[(Double, Double, Double)], n: Int)
      : Seq[Option[Double]] = {
    def wilderSeq(xs: Seq[Option[Double]]): Seq[Option[Double]] = {
      var avg = 0.0; var cnt = 0
      xs.map {
        case None => None
        case Some(x) =>
          cnt += 1
          avg = if (cnt < n) avg + x
                else if (cnt == n) (avg + x) / n
                else avg * (1.0 - 1.0 / n) + x * (1.0 / n)
          if (cnt < n) None else Some(avg)
      }
    }
    val trs = bars.zipWithIndex.map { case ((h, l, c), i) =>
      if (i == 0) None
      else {
        val pc = bars(i - 1)._3
        Some(math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc))))
      }
    }
    val pdms = bars.zipWithIndex.map { case ((h, _, _), i) =>
      if (i == 0) None
      else {
        val up = h - bars(i - 1)._1; val dn = bars(i - 1)._2 - bars(i)._2
        Some(if (up > dn && up > 0) up else 0.0)
      }
    }
    val mdms = bars.zipWithIndex.map { case ((_, l, _), i) =>
      if (i == 0) None
      else {
        val up = bars(i)._1 - bars(i - 1)._1; val dn = bars(i - 1)._2 - l
        Some(if (dn > up && dn > 0) dn else 0.0)
      }
    }
    val (str, spd, smd) = (wilderSeq(trs), wilderSeq(pdms), wilderSeq(mdms))
    val dx = str.indices.map { i =>
      (str(i), spd(i), smd(i)) match {
        case (Some(t), Some(p), Some(m)) =>
          val dp = 100.0 * p / t; val dm = 100.0 * m / t
          Some(if (dp + dm == 0.0) 0.0 else 100.0 * math.abs(dp - dm) / (dp + dm))
        case _ => None
      }
    }
    wilderSeq(dx)
  }

  test("adx: matches the independent sequential replay; 2n-1 bar schedule") {
    val bars = Seq(
      (10.0, 8.0, 9.0), (11.0, 9.0, 10.5), (12.0, 10.0, 11.5),
      (11.5, 9.5, 10.0), (13.0, 11.0, 12.5), (14.0, 12.0, 13.5),
      (13.0, 11.0, 12.0), (15.0, 13.0, 14.5), (16.0, 14.0, 15.5),
      (15.0, 13.0, 14.0))
    val df = bars.zipWithIndex.map { case ((h, l, c), i) => ("s", i, h, l, c) }
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.adx(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 3)
      .collect().map(r => r.getInt(1) ->
        Option(r.getAs[java.lang.Double]("adx")).map(_.doubleValue())).toMap
    val expected = adxReplay(bars, 3)
    for (i <- bars.indices)
      assert(out(i) === expected(i), s"bar $i")
    // first ADX at bar index 2n-1 = 5 (n DX values need n smoothed bars,
    // which need n moves, which start at bar 1)
    assert((0 until 5).forall(out(_).isEmpty))
    assert(out(5).isDefined)
  }

  test("adx: a strong one-way trend reads higher than choppy alternation") {
    val trend = (0 until 20).map(i =>
      (100.0 + 2 * i + 1, 100.0 + 2 * i - 1, 100.0 + 2 * i))
    val chop = (0 until 20).map(i =>
      if (i % 2 == 0) (101.0, 99.0, 100.0) else (102.0, 100.0, 101.0))
    def lastAdx(bars: Seq[(Double, Double, Double)]): Double = {
      val df = bars.zipWithIndex.map { case ((h, l, c), i) => ("s", i, h, l, c) }
        .toDF("sym", "i", "h", "l", "c")
      Rolling.adx(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 4)
        .orderBy(col("i").desc).limit(1)
        .collect().head.getAs[Double]("adx")
    }
    assert(lastAdx(trend) > 80.0, "sustained trend → high ADX")
    assert(lastAdx(trend) > lastAdx(chop))
  }

  test("vortex: hand-traced VI± over n=2, first two rows null") {
    val df = Seq((10.0, 8.0, 9.0), (11.0, 9.0, 10.0), (12.0, 10.0, 11.0),
        (9.0, 7.0, 8.0))
      .zipWithIndex.map { case ((h, l, c), i) => ("s", i, h, l, c) }
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.vortex(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 2)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("vi_plus")))
    assert(out(1).isNullAt(out(1).fieldIndex("vi_plus"))) // one term, need 2
    // bars 2+3: VM+ = 3+3, VM− = 1+1, TR = 2+2
    assert(out(2).getAs[Double]("vi_plus") === 1.5)
    assert(out(2).getAs[Double]("vi_minus") === 0.5)
    // bars 3+4: VM+ = 3+1, VM− = 1+5, TR = 2+4
    assert(out(3).getAs[Double]("vi_plus") === 4.0 / 6.0)
    assert(out(3).getAs[Double]("vi_minus") === 1.0)
  }

  test("cmo: raw momentum sums, flat window yields null") {
    val out = Rolling.cmo(series(1, 2, 4, 3, 5), "v", Seq("sym"), Seq("i"),
        n = 3)
      .orderBy("i").collect()
    (0 to 2).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("cmo"))))
    assert(out(3).getAs[Double]("cmo") === 50.0) // up 3, down 1
    assert(out(4).getAs[Double]("cmo") === 60.0) // up 4, down 1
    val flat = Rolling.cmo(series(5, 5, 5, 5), "v", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    assert(flat(3).isNullAt(flat(3).fieldIndex("cmo")))
  }

  test("ultimate oscillator: steady BP/TR ratio lands exactly on 50") {
    val df = Seq((10.0, 8.0, 9.0), (11.0, 9.0, 10.0), (12.0, 10.0, 11.0),
        (13.0, 11.0, 12.0))
      .zipWithIndex.map { case ((h, l, c), i) => ("s", i, h, l, c) }
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.ultimateOscillator(df, "h", "l", "c", Seq("sym"),
        Seq("i"), n1 = 1, n2 = 2, n3 = 3)
      .orderBy("i").collect()
    (0 to 2).foreach(i =>
      assert(out(i).isNullAt(out(i).fieldIndex("ultimate"))))
    // every bar: BP = 1, TR = 2 → all three ratios 0.5 → 100·3.5/7 = 50
    assert(out(3).getAs[Double]("ultimate") === 50.0)
  }

  test("dpo: price minus the displaced trailing mean") {
    val out = Rolling.dpo(series(1, 2, 3, 4, 5), "v", Seq("sym"), Seq("i"),
        n = 2) // shift = n/2 + 1 = 2
      .orderBy("i").collect()
    (0 to 2).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("dpo"))))
    assert(out(3).getAs[Double]("dpo") === 4.0 - 1.5)
    assert(out(4).getAs[Double]("dpo") === 5.0 - 2.5)
  }

  test("pivot points: textbook ladder from yesterday's bar") {
    val df = Seq((10.0, 8.0, 9.0), (11.0, 9.0, 10.0))
      .zipWithIndex.map { case ((h, l, c), i) => ("s", i, h, l, c) }
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.pivotPoints(df, "h", "l", "c", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("pp")))
    assert(out(1).getAs[Double]("pp") === 9.0)
    assert(out(1).getAs[Double]("r1") === 10.0)
    assert(out(1).getAs[Double]("s1") === 8.0)
    assert(out(1).getAs[Double]("r2") === 11.0)
    assert(out(1).getAs[Double]("s2") === 7.0)
  }

  test("heikin-ashi: textbook seed and recurrence, extremes span both HA prices") {
    val df = Seq((10.0, 12.0, 8.0, 11.0), (11.0, 13.0, 9.0, 12.0))
      .zipWithIndex.map { case ((o, h, l, c), i) => ("s", i, o, h, l, c) }
      .toDF("sym", "i", "o", "h", "l", "c")
    val out = Rolling.heikinAshi(df, "o", "h", "l", "c", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    assert(out(0).getAs[Double]("ha_close") === 10.25)
    assert(out(0).getAs[Double]("ha_open") === 10.5) // (o+c)/2 seed
    assert(out(0).getAs[Double]("ha_high") === 12.0)
    assert(out(0).getAs[Double]("ha_low") === 8.0)
    // ha_open₂ = (ha_open₁ + ha_close₁)/2 = (10.5 + 10.25)/2
    assert(out(1).getAs[Double]("ha_open") === 10.375)
    assert(out(1).getAs[Double]("ha_close") === 11.25)
    assert(out(1).getAs[Double]("ha_high") === 13.0)
    assert(out(1).getAs[Double]("ha_low") === 9.0)
  }

  test("ppo: zero on a flat series, hand-traced on a step") {
    val flat = Rolling.ppo(series(5, 5, 5), "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    flat.foreach(r => assert(r.getAs[Double]("ppo") === 0.0))
    // fast=1 → ema = x; slow=3 (α=½): e = 1, then 1.5 → 100·(2−1.5)/1.5
    val out = Rolling.ppo(series(1, 2), "v", Seq("sym"), Seq("i"),
        fast = 1, slow = 3)
      .orderBy("i").collect()
    assert(out(0).getAs[Double]("ppo") === 0.0)
    assert(math.abs(out(1).getAs[Double]("ppo") - 100.0 / 3.0) < 1e-12)
  }

  test("trix: n=1 collapses the triple EMA to the raw 1-bar ROC") {
    val out = Rolling.trix(series(1, 2, 4), "v", Seq("sym"), Seq("i"), n = 1)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("trix"))) // no prior e3
    assert(out(1).getAs[Double]("trix") === 100.0)
    assert(out(2).getAs[Double]("trix") === 100.0)
  }

  test("wma: triangular weights favour the recent bar, null until full") {
    val out = Rolling.wma(series(1, 2, 3, 4), "v", Seq("sym"), Seq("i"), n = 3)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("wma")))
    assert(out(1).isNullAt(out(1).fieldIndex("wma")))
    assert(out(2).getAs[Double]("wma") === 14.0 / 6.0) // (1·1+2·2+3·3)/6
    assert(out(3).getAs[Double]("wma") === 20.0 / 6.0) // (2·1+3·2+4·3)/6
  }

  test("hull ma: zero lag on a linear ramp — hma(t) = x(t) exactly") {
    val out = Rolling.hullMa(series(1, 2, 3, 4, 5, 6), "v", Seq("sym"),
        Seq("i"), n = 4) // half = 2, outer m = 2
      .orderBy("i").collect()
    (0 to 3).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("hma"))))
    // the lag-corrected smooth tracks a ramp with NO delay
    assert(math.abs(out(4).getAs[Double]("hma") - 5.0) < 1e-12)
    assert(math.abs(out(5).getAs[Double]("hma") - 6.0) < 1e-12)
  }

  test("supertrend: hand-traced ratchet, down-flip, and re-flip up") {
    // n=1 → atr = current TR, so bands are defined from bar 1; mult=1
    val df = Seq((10.0, 8.0, 9.0), (11.0, 9.0, 10.0), (6.0, 4.0, 5.0),
        (13.0, 11.0, 12.0))
      .zipWithIndex.map { case ((h, l, c), i) => ("s", i, h, l, c) }
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.superTrend(df, "h", "l", "c", Seq("sym"), Seq("i"),
        n = 1, mult = 1)
      .orderBy("i").collect().map(_.getAs[Double]("supertrend"))
    assert(out(0) === 7.0)  // seed: up-trend, line = lower band
    assert(out(1) === 8.0)  // lower band ratchets up 7 → 8
    assert(out(2) === 11.0) // close 5 < flb 8 → flip down, line = fub
    assert(out(3) === 4.0)  // close 12 > fub 11 → flip back up
  }

  test("supertrend: null through the atr warm-up, then seeds") {
    val df = (0 until 5).map(i => ("s", i, 10.0 + i, 8.0 + i, 9.0 + i))
      .toDF("sym", "i", "h", "l", "c")
    val out = Rolling.superTrend(df, "h", "l", "c", Seq("sym"), Seq("i"),
        n = 3, mult = 2)
      .orderBy("i").collect()
    (0 to 1).foreach(i =>
      assert(out(i).isNullAt(out(i).fieldIndex("supertrend"))))
    assert(!out(2).isNullAt(out(2).fieldIndex("supertrend")))
  }

  test("psar: hand-traced seed, two-bar-low clamp, acceleration, reversal") {
    // af = 0.5, step = 0.5, max = 1.0 keeps the parabola arithmetic exact
    val df = Seq((10.0, 8.0), (12.0, 10.0), (14.0, 12.0), (9.0, 7.0))
      .zipWithIndex.map { case ((h, l), i) => ("s", i, h, l) }
      .toDF("sym", "i", "h", "l")
    val out = Rolling.parabolicSar(df, "h", "l", Seq("sym"), Seq("i"),
        af0Pm = 500, stepPm = 500, maxPm = 1000)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("psar"))) // nothing to trail
    assert(out(1).getAs[Double]("psar") === 8.0)  // seed: up, sar = prior low
    // cand = 8 + 0.5·(12−8) = 10, clamped to min(10, 10, 8) = 8; high 14
    // is a new extreme → ep = 14, af accelerates to the 1.0 cap
    assert(out(2).getAs[Double]("psar") === 8.0)
    // cand = 8 + 1.0·(14−8) = 14 clamps to 10; low 7 pierces → reversal:
    // SAR jumps to the old EP
    assert(out(3).getAs[Double]("psar") === 14.0)
  }

  test("market beta: exact slope on the equal-weight index, index broadcasts") {
    val df = Seq(("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
        ("b", 0, 2.0), ("b", 1, 4.0), ("b", 2, 6.0))
      .toDF("sym", "i", "v")
    val out = Rolling.marketBeta(df, "v", Seq("sym"), Seq("i"), n = 3)
    val rows = out.orderBy("sym", "i").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("mkt_beta"))) // frame short
    // market = (3, 6, 9); a moves 1 per 3 index points, b moves 2
    assert(rows(2).getAs[Double]("mkt_beta") === 1.0 / 3.0)
    assert(rows(2).getAs[Double]("mkt_corr") === 1.0)
    assert(rows(5).getAs[Double]("mkt_beta") === 2.0 / 3.0)
    assert(rows(5).getAs[Double]("mkt_corr") === 1.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"index join should broadcast:\n$plan")
  }

  test("awesome oscillator: hand-traced fast/slow midpoint gap") {
    val df = Seq((10.0, 8.0), (12.0, 10.0))
      .zipWithIndex.map { case ((h, l), i) => ("s", i, h, l) }
      .toDF("sym", "i", "h", "l")
    val out = Rolling.awesomeOscillator(df, "h", "l", Seq("sym"), Seq("i"),
        fast = 1, slow = 2)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("ao")))
    // midpoints 9, 11: fast avg 11, slow avg 10
    assert(out(1).getAs[Double]("ao") === 1.0)
  }

  test("chandelier exit: textbook stops at n=1") {
    val df = Seq(("s", 0, 10.0, 8.0, 9.0)).toDF("sym", "i", "h", "l", "c")
    val out = Rolling.chandelierExit(df, "h", "l", "c", Seq("sym"), Seq("i"),
        n = 1, mult = 1)
      .collect().head
    assert(out.getAs[Double]("chandelier_long") === 8.0)  // 10 − 2
    assert(out.getAs[Double]("chandelier_short") === 10.0) // 8 + 2
  }

  test("mass index: unit ratios sum to the window length") {
    // emaN = 1 → e1 = range, e2 = e1 → every ratio is exactly 1
    val df = (0 until 5).map(i => ("s", i, 10.0 + i, 8.0 + i))
      .toDF("sym", "i", "h", "l")
    val out = Rolling.massIndex(df, "h", "l", Seq("sym"), Seq("i"),
        emaN = 1, sumN = 3)
      .orderBy("i").collect()
    assert(out(1).isNullAt(out(1).fieldIndex("mass_index")))
    (2 to 4).foreach(i => assert(out(i).getAs[Double]("mass_index") === 3.0))
  }

  test("kst and coppock: flat series scores exactly zero after warm-up") {
    val df = (0 until 50).map(i => ("s", i, 5.0)).toDF("sym", "i", "v")
    val k = Rolling.kst(df, "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    assert(k(43).isNullAt(k(43).fieldIndex("kst"))) // s4 frame one short
    assert(k(44).getAs[Double]("kst") === 0.0)
    assert(k(49).getAs[Double]("kst") === 0.0)
    val c = Rolling.coppock(df, "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    assert(c(21).isNullAt(c(21).fieldIndex("coppock")))
    assert(c(23).getAs[Double]("coppock") === 0.0)
    assert(c(49).getAs[Double]("coppock") === 0.0)
  }

  test("risk ratios: hand-traced sortino/omega/calmar, null rails on an up-only series") {
    val df = Seq(("g", 0, 0.1), ("g", 1, -0.2), ("g", 2, 0.3),
        ("u", 0, 0.1), ("u", 1, 0.2))
      .toDF("sym", "i", "r")
    val out = Rolling.riskRatios(df, "r", Seq("sym"), Seq("i"))
      .collect().map(r => r.getAs[String]("sym") -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n_returns") === 3L)
    assert(g.getAs[Double]("total_ret") === 0.2)
    assert(g.getAs[Double]("omega") === 2.0) // gains 0.4 over losses 0.2
    assert(math.abs(g.getAs[Double]("sortino") - math.sqrt(1.0 / 3.0)) < 1e-12)
    assert(g.getAs[Double]("calmar") === 1.0) // total 0.2 over maxdd 0.2
    val u = out("u")
    assert(u.getAs[Double]("total_ret") === 0.3)
    assert(u.isNullAt(u.fieldIndex("sortino"))) // zero downside
    assert(u.isNullAt(u.fieldIndex("omega")))   // zero losses
    assert(u.isNullAt(u.fieldIndex("calmar")))  // never under water
  }

  test("stoch rsi: oscillates 0↔1 on an alternating series at n=1") {
    // rsi(1) snaps to 100 after a gain, 0 after a loss; stoch(2) then
    // locates each value inside the two-element window
    val out = Rolling.stochRsi(series(1, 2, 1, 2), "v", Seq("sym"), Seq("i"),
        rsiN = 1, stochN = 2)
      .orderBy("i").collect()
    assert(out(1).isNullAt(out(1).fieldIndex("stoch_rsi"))) // one rsi only
    assert(out(2).getAs[Double]("stoch_rsi") === 0.0)
    assert(out(3).getAs[Double]("stoch_rsi") === 1.0)
  }

  test("tsi: collapses to the momentum sign at 1/1, null on flat") {
    val out = Rolling.tsi(series(1, 3, 2), "v", Seq("sym"), Seq("i"),
        slow = 1, fast = 1)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("tsi"))) // no momentum yet
    assert(out(1).getAs[Double]("tsi") === 100.0)
    assert(out(2).getAs[Double]("tsi") === -100.0)
    val flat = Rolling.tsi(series(5, 5, 5), "v", Seq("sym"), Seq("i"),
        slow = 1, fast = 1)
      .orderBy("i").collect()
    assert(flat(2).isNullAt(flat(2).fieldIndex("tsi"))) // zero |momentum|
  }

  test("connors rsi: signed streaks, prior-window percent rank, null schedule") {
    val out = Rolling.connorsRsi(series(1, 2, 3, 2, 2, 3), "v", Seq("sym"),
        Seq("i"), rsiN = 1, streakN = 1, rankN = 2)
      .orderBy("i").collect()
    assert(out.map(_.getAs[Long]("streak")).toSeq ===
      Seq(0L, 1L, 2L, -1L, 0L, 1L))
    (0 to 2).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("pct_rank"))))
    assert(out(3).getAs[Double]("pct_rank") === 0.0)   // ln(2/3) below both
    assert(out(4).getAs[Double]("pct_rank") === 50.0)  // 0 above one of two
    assert(out(5).getAs[Double]("pct_rank") === 100.0) // ln(1.5) above both
    assert(out(3).getAs[Double]("crsi") >= 0.0 &&
      out(3).getAs[Double]("crsi") <= 100.0)
    assert(out(2).isNullAt(out(2).fieldIndex("crsi"))) // rank window short
  }

  test("adl: hand-traced money-flow cumsum; flat bar and balanced close are no-ops") {
    val df = Seq(
      ("s", 0, 10.0, 8.0, 10.0, 5.0), // mfm = 1 → +5
      ("s", 1, 10.0, 8.0, 8.0, 3.0),  // mfm = −1 → −3
      ("s", 2, 7.0, 7.0, 7.0, 9.0),   // flat bar → 0
      ("s", 3, 10.0, 8.0, 9.0, 4.0))  // close dead-center → mfm 0
      .toDF("sym", "i", "h", "l", "c", "v")
    val out = Rolling.adl(df, "h", "l", "c", "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect().map(_.getAs[Double]("adl")).toSeq
    assert(out === Seq(5.0, 2.0, 2.0, 2.0))
  }

  test("chaikin oscillator: fast=1 EMA is the adl itself; hand-fold the slow leg") {
    val df = Seq(
      ("s", 0, 10.0, 8.0, 10.0, 5.0), // adl 5
      ("s", 1, 10.0, 8.0, 8.0, 3.0))  // adl 2
      .toDF("sym", "i", "h", "l", "c", "v")
    val out = Rolling.chaikinOsc(df, "h", "l", "c", "v", Seq("sym"), Seq("i"),
        fast = 1, slow = 2)
      .orderBy("i").collect()
    assert(out(0).getAs[Double]("chaikin_osc") === 0.0) // both seed on adl
    // slow ema(2): α = 2/3 → (2/3)·2 + (1/3)·5 = 3; osc = 2 − 3 = −1
    assert(out(1).getAs[Double]("chaikin_osc") ===
      2.0 - ((2.0 / 3.0) * 2.0 + (1.0 - 2.0 / 3.0) * 5.0))
  }

  test("ulcer index: RMS of trailing-high drawdowns, textbook schedule") {
    val out = Rolling.ulcerIndex(series(10, 8, 8), "v", Seq("sym"), Seq("i"),
        n = 2)
      .orderBy("i").collect()
    // dd: NULL (frame short), −20 (8 vs max 10), 0 (8 vs max 8)
    assert(out(0).isNullAt(out(0).fieldIndex("ulcer")))
    assert(out(1).isNullAt(out(1).fieldIndex("ulcer"))) // one dd, need two
    assert(out(2).getAs[Double]("ulcer") ===
      math.sqrt((-20.0 * -20.0 + 0.0) / 2.0))
  }

  test("ease of movement: hand-traced midpoint move; zero volume stays null") {
    val df = Seq(("s", 0, 10.0, 6.0, 4.0), ("s", 1, 12.0, 8.0, 8.0),
        ("s", 2, 12.0, 8.0, 0.0))
      .toDF("sym", "i", "h", "l", "v")
    val out = Rolling.easeOfMovement(df, "h", "l", "v", Seq("sym"), Seq("i"),
        n = 1)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("eom"))) // no prior midpoint
    // dm = ((12+8) − (10+6))/2 = 2; emv = 2·(12−8)/8 = 1
    assert(out(1).getAs[Double]("eom") === 1.0)
    assert(out(2).isNullAt(out(2).fieldIndex("eom"))) // zero volume
  }

  test("balance of power: full-range close scores 1, flat bar scores 0") {
    val df = Seq(("s", 0, 8.0, 10.0, 8.0, 10.0), ("s", 1, 9.0, 9.0, 9.0, 9.0))
      .toDF("sym", "i", "o", "h", "l", "c")
    val out = Rolling.balanceOfPower(df, "o", "h", "l", "c", Seq("sym"),
        Seq("i"), n = 1)
      .orderBy("i").collect().map(_.getAs[Double]("bop")).toSeq
    assert(out === Seq(1.0, 0.0))
  }

  test("kama: seeds on bar n+1, trending sc, exact var_ema update") {
    val df = series(10, 11, 13, 12)
    val out = Rolling.kama(df, "v", Seq("sym"), Seq("i"), n = 2, fast = 2,
        slow = 4)
      .orderBy("i").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("kama")))
    assert(out(1).isNullAt(out(1).fieldIndex("kama"))) // one diff, need two
    assert(out(2).getAs[Double]("kama") === 13.0)      // seed row emits x
    // vol = |13−11| + |12−13| = 3, dir = |12−11| = 1 → er = 1/3;
    // sc = (er·(αf−αs) + αs)², update = sc·x + (1−sc)·prev — same doubles
    val sc = { val b = (1.0 / 3.0) * (2.0 / 3.0 - 2.0 / 5.0) + 2.0 / 5.0; b * b }
    assert(out(3).getAs[Double]("kama") === sc * 12.0 + (1.0 - sc) * 13.0)
  }

  test("kama: a null value freezes the state and re-warms over n diffs") {
    val df = Seq(("s", 0, Some(10.0)), ("s", 1, Some(11.0)),
        ("s", 2, Some(13.0)), ("s", 3, None: Option[Double]),
        ("s", 4, Some(12.0)), ("s", 5, Some(12.5)), ("s", 6, Some(12.25)))
      .toDF("sym", "i", "v")
    val out = Rolling.kama(df, "v", Seq("sym"), Seq("i"), n = 2, fast = 2,
        slow = 4)
      .orderBy("i").collect()
    assert(out(2).getAs[Double]("kama") === 13.0)
    (3 to 5).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("kama")),
      s"row $i should still be warming"))
    // rows 5,6 give two consecutive diffs again → row 6 resumes FROM the
    // frozen 13.0 state, not from a fresh seed
    val r6 = out(6).getAs[Double]("kama")
    assert(!out(6).isNullAt(out(6).fieldIndex("kama")))
    assert(r6 > 12.25 && r6 < 13.0, s"expected blend below frozen 13.0, got $r6")
  }

  test("volume indexes: NVI moves on falling volume only, PVI on rising") {
    val df = Seq(("s", 0, 10.0, 5.0), ("s", 1, 11.0, 3.0), ("s", 2, 12.1, 6.0))
      .toDF("sym", "i", "c", "v")
    val out = Rolling.volumeIndexes(df, "c", "v", Seq("sym"), Seq("i"))
      .orderBy("i").collect()
    assert(out(0).getAs[Double]("nvi") === 1000.0)
    assert(out(0).getAs[Double]("pvi") === 1000.0)
    val f2 = 1.0 + (11.0 - 10.0) / 10.0   // vol fell → NVI factor
    val f3 = 1.0 + (12.1 - 11.0) / 11.0   // vol rose → PVI factor
    assert(out(1).getAs[Double]("nvi") === 1000.0 * f2)
    assert(out(1).getAs[Double]("pvi") === 1000.0)
    assert(out(2).getAs[Double]("nvi") === 1000.0 * f2) // frozen on rise
    assert(out(2).getAs[Double]("pvi") === 1000.0 * f3)
  }

  test("drawdown episodes: islands split on peak re-touch, exact depth") {
    val out = Rolling.drawdownEpisodes(series(10, 8, 9, 10, 12, 11), "v",
        Seq("sym"), "i")
      .orderBy("start").collect()
    assert(out.length === 2)
    val e1 = out(0)
    assert(e1.getAs[Int]("start") === 1 && e1.getAs[Int]("end") === 2)
    assert(e1.getAs[Int]("trough_at") === 1)
    assert(e1.getAs[Double]("peak") === 10.0 && e1.getAs[Double]("trough") === 8.0)
    assert(e1.getAs[Double]("depth_pct") === 100.0 * 200.0 / 1000.0)
    assert(e1.getAs[Long]("duration") === 2L) // re-touch at 10 ENDS it
    val e2 = out(1)
    assert(e2.getAs[Int]("start") === 5 && e2.getAs[Long]("duration") === 1L)
    assert(e2.getAs[Double]("depth_pct") === 100.0 * 100.0 / 1200.0)
  }

  test("renko level: hand-traced grid walk — chop freezes, jumps snap whole bricks") {
    val out = Rolling.renkoLevel(series(10, 12, 17, 16, 4), "v",
        Seq("sym"), Seq("i"), brickCenti = 500)
      .orderBy("i").collect().map(_.getAs[Double]("renko")).toSeq
    // seed 10; +2 inside brick → 10; +7 → one brick up 15; −1 → 15;
    // −11 → two bricks down 5
    assert(out === Seq(10.0, 10.0, 15.0, 15.0, 5.0))
  }

  test("fractals: strict extremes only — plateaus and edges stay null") {
    val df = Seq(("s", 0, 1.0, 5.0), ("s", 1, 3.0, 4.0), ("s", 2, 2.0, 2.0),
        ("s", 3, 3.0, 4.0), ("s", 4, 3.0, 5.0))
      .toDF("sym", "i", "h", "l")
    val out = Rolling.fractals(df, "h", "l", Seq("sym"), Seq("i"), wings = 1)
      .orderBy("i").collect()
    assert(out(1).getAs[Double]("fractal_high") === 3.0)
    assert(out(2).getAs[Double]("fractal_low") === 2.0)
    // bar 3 ties bar 4's high → strictness rejects it; edges null
    assert(out(3).isNullAt(out(3).fieldIndex("fractal_high")))
    assert(out(0).isNullAt(out(0).fieldIndex("fractal_high")))
    assert(out(4).isNullAt(out(4).fieldIndex("fractal_high")))
  }

  test("adx: one exchange — every window shares the (sym, i) spec") {
    val df = (0 until 30).map(i => ("s", i, 10.0 + i, 8.0 + i, 9.0 + i))
      .toDF("sym", "i", "h", "l", "c")
    val p = Rolling.adx(df, "h", "l", "c", Seq("sym"), Seq("i"), n = 3)
      .queryExecution.executedPlan.toString
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) <= 1,
      s"one exchange expected:\n$p")
  }

test("crossCorr: a shifted copy is perfectly correlated at its lag only") {
    // y_t = x_{t-1} for a curved (non-affine-shift) path: lag 1 pairs
    // are identical values; no other alignment is collinear
    val x = Seq(1.0, 2.0, 4.0, 7.0, 11.0)
    val rows = x.indices.map { i =>
      ("k", i.toLong, x(i), if (i >= 1) Some(x(i - 1)) else None)
    }
    val df = rows.toDF("key", "t", "x", "y")
    val out = Rolling.crossCorr(df, "x", "y", Seq("key"), Seq("t"),
        Seq(-1, 0, 1))
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"),
          Option(r.getAs[Any]("xcorr")).map(_.asInstanceOf[Double]))).toMap
    assert(out(1)._1 === 4L)          // t = 1..4 have both x_{t-1} and y
    assert(out(1)._2 === Some(1.0))   // identical pairs -> exactly 1
    assert(out(0)._2.get < 1.0)       // convexity breaks the lag-0 match
    assert(out(-1)._2.get < out(1)._2.get)
  }

  test("crossCorr: anti-correlated at lag 0, NULL on zero variance") {
    val rows = Seq(("k", 1L, 1.0, -1.0), ("k", 2L, 2.0, -2.0),
      ("k", 3L, 3.0, -3.0), ("z", 1L, 5.0, 1.0), ("z", 2L, 5.0, 2.0))
    val out = Rolling.crossCorr(rows.toDF("key", "t", "x", "y"),
        "x", "y", Seq("key"), Seq("t"), Seq(0))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Double]("xcorr") === -1.0)
    assert(out("z").isNullAt(out("z").fieldIndex("xcorr"))) // flat x side
  }

  test("harmonicPower: pure period-4 cosine concentrates at period 4") {
    // x = cos(2*pi*t/4) over two full cycles: I(4) = |sum|^2/n = 16/8 = 2,
    // I(8) = 0 (the quadrature sums cancel exactly on the baked integers)
    val x = Seq(1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0)
    val rows = x.indices.map(t => ("k", t.toLong, x(t)))
    val out = Rolling.harmonicPower(rows.toDF("key", "t", "x"), "x",
        Seq("key"), Seq("t"), Seq(4, 8))
      .collect().map(r => r.getAs[Int]("period") -> r).toMap
    assert(out(4).getAs[Long]("n") === 8L)
    assert(out(4).getAs[Double]("power") === 2.0)
    assert(out(8).getAs[Double]("power") === 0.0)
  }

  test("harmonicPower: mean removal kills the DC leak; twiddles are baked") {
    // constant series: zero power at every period after centering
    val rows = (0 to 9).map(t => ("k", t.toLong, 7.5))
    val out = Rolling.harmonicPower(rows.toDF("key", "t", "x"), "x",
        Seq("key"), Seq("t"), Seq(5), scale = 1)
      .collect().head
    assert(out.getAs[Double]("power") === 0.0)
    // the baked table is phase-indexed integers at 12 dp
    val tw = Rolling.harmonicTwiddles(Seq(4))
    assert(tw.map(t => (t._3, t._4)) ===
      Seq((1000000000000L, 0L), (0L, 1000000000000L),
        (-1000000000000L, 0L), (0L, -1000000000000L)))
  }

  test("amihud: hand-computed illiquidity, degenerate bars skipped") {
    // terms: |11-10|/10/(11*4) and |10-11|/11/(10*5); the zero-volume and
    // zero-close bars contribute nothing
    val rows = Seq(("k", 1L, 10.0, 2.0), ("k", 2L, 11.0, 4.0),
      ("k", 3L, 10.0, 5.0), ("k", 4L, 10.0, 0.0), ("k", 5L, 0.0, 3.0))
    val r = Rolling.amihud(rows.toDF("key", "t", "close", "vol"),
      "close", "vol", Seq("key"), Seq("t")).collect().head
    assert(r.getAs[Long]("n_terms") === 2L)
    val expected = (1.0 / 10.0 / 44.0 + 1.0 / 11.0 / 50.0) / 2.0
    assert(r.getAs[Double]("illiq") === expected)
  }

  test("hurst: linear trend scores near 1, alternating series below ½") {
    // x = t: every b-block has R = b³/8·… exactly (R = 8 at b=4, 64 at
    // b=8) over den = b·Σx²−S² (20, 336) — H lands near 1 (trending)
    val trend = (0 until 32).map(t => ("k", t.toLong, t.toDouble))
    val r = Rolling.hurst(trend.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), blockSizes = Seq(4, 8)).collect().head
    assert(r.getAs[Long]("n") === 32L)
    val q4 = math.round(8.0 / math.sqrt(20.0) * 1e10)
    val q8 = math.round(64.0 / math.sqrt(336.0) * 1e10)
    val rs4 = (8L * q4).toDouble / 8.0 / 1e10
    val rs8 = (4L * q8).toDouble / 4.0 / 1e10
    assert(r.getAs[Double]("rs_4") === rs4)
    assert(r.getAs[Double]("rs_8") === rs8)
    val (u4, u8) = (math.log(4.0), math.log(8.0))
    def r10(x: Double): Double =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (v4, v8) = (r10(math.log(rs4)), r10(math.log(rs8)))
    val su = u4 + u8
    val suu = u4 * u4 + u8 * u8
    val expected = (2.0 * (u4 * v4 + u8 * v8) - su * (v4 + v8)) /
      (2.0 * suu - su * su)
    assert(r.getAs[Double]("hurst") === expected)
    assert(expected > 0.9)  // strong trend -> H near 1
    // alternating series: R/S = 1 at both sizes -> slope exactly 0
    val alt = (0 until 32).map(t => ("k", t.toLong, (t % 2).toDouble))
    val r2 = Rolling.hurst(alt.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), blockSizes = Seq(4, 8)).collect().head
    assert(r2.getAs[Double]("rs_4") === 1.0)
    assert(r2.getAs[Double]("rs_8") === 1.0)
    assert(r2.getAs[Double]("hurst") === 0.0)  // ln 1 everywhere
  }

  test("hurst: NULL when a block size never completes or variance dies") {
    val short = (0 until 10).map(t => ("k", t.toLong, (t % 3).toDouble))
    val r1 = Rolling.hurst(short.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), blockSizes = Seq(4, 16)).collect().head
    assert(r1.isNullAt(r1.fieldIndex("rs_16")))
    assert(r1.isNullAt(r1.fieldIndex("hurst")))
    val const = (0 until 32).map(t => ("k", t.toLong, 5.0))
    val r2 = Rolling.hurst(const.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), blockSizes = Seq(4, 8)).collect().head
    assert(r2.isNullAt(r2.fieldIndex("hurst")))  // zero-variance blocks
  }

  test("croston: hand-traced forecast over an intermittent series") {
    // demand days 1, 4, 6 (gaps 3, 2), sizes 10, 20, 30, alpha = 0.5
    val rows = Seq(("k", java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("k", java.sql.Date.valueOf("2024-01-04"), 20.0),
      ("k", java.sql.Date.valueOf("2024-01-06"), 30.0))
    val out = Rolling.croston(rows.toDF("key", "d", "v"), "v", "d",
        Seq("key"), Seq("d"), alphaPm = 500)
      .orderBy("d").collect()
    assert(out(0).getAs[Double]("croston_z") === 10.0) // seed = first size
    assert(out(0).isNullAt(out(0).fieldIndex("croston_p"))) // no gap yet
    assert(out(0).isNullAt(out(0).fieldIndex("croston")))
    val z1 = 0.5 * 20.0 + 0.5 * 10.0
    assert(out(1).getAs[Double]("croston_z") === z1)
    assert(out(1).getAs[Double]("croston_p") === 3.0)  // p seeds at gap 1
    assert(out(1).getAs[Double]("croston") === z1 / 3.0)
    val z2 = 0.5 * 30.0 + 0.5 * z1
    val p2 = 0.5 * 2.0 + 0.5 * 3.0
    assert(out(2).getAs[Double]("croston") === z2 / p2)
  }

  test("ewmaChart: hand-traced mean-seeded recurrence and limits") {
    // x = 10,20,30, lambda = 0.5: mu0 = 20, sigma = sqrt(600)/3;
    // z = 15, 17.5, 23.75 (the mu0-seeded textbook walk)
    val rows = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 30.0))
    val out = Rolling.ewmaChart(rows.toDF("key", "t", "v"), "v",
        Seq("key"), Seq("t"), lambdaPm = 500, l = 3.0)
      .orderBy("t").collect()
    assert(out.map(_.getAs[Double]("ewma")).toSeq ===
      Seq(15.0, 17.5, 23.75))
    val sig = math.sqrt(600.0) / 3.0
    def hw(p: Double) =
      (3.0 * sig) * math.sqrt((0.5 / 1.5) * (1.0 - p * p))
    assert(out(0).getAs[Double]("ewma_ucl") === 20.0 + hw(0.5))
    assert(out(2).getAs[Double]("ewma_lcl") === 20.0 - hw(0.125))
    assert(out.map(_.getAs[Boolean]("ewma_ooc")).toSeq ===
      Seq(false, false, false))
  }

  test("ewmaChart: a persistent shift trips the chart") {
    // long stable run then a sustained +4-sigma-ish shift: pointwise
    // z-scores of the shifted tail are modest but the EWMA accumulates
    val stable = (1 to 40).map(t => ("k", t.toLong, 100.0 + (t % 2)))
    val shifted = (41 to 60).map(t => ("k", t.toLong, 104.0 + (t % 2)))
    val out = Rolling.ewmaChart((stable ++ shifted).toDF("key", "t", "v"),
        "v", Seq("key"), Seq("t"), lambdaPm = 200, l = 3.0)
      .orderBy("t").collect()
    assert(!out.take(48).exists(_.getAs[Boolean]("ewma_ooc")))
    assert(out.drop(48).forall(_.getAs[Boolean]("ewma_ooc")))
  }

  test("rollingSharpe: hand-computed ratio, warm-up and zero-variance NULL") {
    val rows = Seq(("k", 1L, 1.0), ("k", 2L, 2.0), ("k", 3L, 3.0),
      ("k", 4L, 2.0), ("z", 1L, 5.0), ("z", 2L, 5.0), ("z", 3L, 5.0))
    val out = Rolling.rollingSharpe(rows.toDF("key", "t", "r"), "r",
        Seq("key"), Seq("t"), n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(out(("k", 2L)).isNullAt(out(("k", 2L)).fieldIndex("roll_sharpe")))
    // frame (1,2,3) scaled 1e10: mean 2e10, var = 1.4e21/3 - 4e20
    val m = 2e10
    val v = 1.4e21 / 3.0 - m * m
    assert(out(("k", 3L)).getAs[Double]("roll_sharpe") ===
      m / math.sqrt(v) * 1.0)
    assert(out(("z", 3L)).isNullAt(out(("z", 3L)).fieldIndex("roll_sharpe")))
  }

  test("amihud: constant price has zero illiquidity, empty key NULL") {
    val rows = Seq(("k", 1L, 5.0, 2.0), ("k", 2L, 5.0, 3.0),
      ("e", 1L, 4.0, 1.0))
    val out = Rolling.amihud(rows.toDF("key", "t", "close", "vol"),
        "close", "vol", Seq("key"), Seq("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Double]("illiq") === 0.0)
    assert(out("e").getAs[Long]("n_terms") === 0L)   // no previous close
    assert(out("e").isNullAt(out("e").fieldIndex("illiq")))
  }

  test("ohlcVolatility: hand-walked Parkinson/GK/RS on two bars") {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bars = Seq(("k", 1L, 10.0, 12.0, 9.0, 11.0),
      ("k", 2L, 11.0, 11.0, 10.0, 10.0))
    val out = Rolling.ohlcVolatility(
        bars.toDF("key", "t", "open", "high", "low", "close"),
        "open", "high", "low", "close", Seq("key"), Seq("t"))
      .collect()
    assert(out.length === 1 && out(0).getAs[Long]("n_bars") === 2L)
    // replay the public closed forms with the same rounded-ln discipline
    def terms(o: Double, h: Double, l: Double, c: Double) = {
      val (hl, co) = (r10(math.log(h / l)), r10(math.log(c / o)))
      val (hc, ho) = (r10(math.log(h / c)), r10(math.log(h / o)))
      val (lc, lo) = (r10(math.log(l / c)), r10(math.log(l / o)))
      (hl * hl, 0.5 * hl * hl - (2.0 * math.log(2.0) - 1.0) * co * co,
        hc * ho + lc * lo)
    }
    val (p1, g1, s1) = terms(10, 12, 9, 11)
    val (p2, g2, s2) = terms(11, 11, 10, 10)
    assert(out(0).getAs[Double]("park_vol") ===
      r10(math.sqrt(1.0 / (4.0 * math.log(2.0)) * ((p1 + p2) / 2.0))))
    assert(out(0).getAs[Double]("gk_vol") === r10(math.sqrt((g1 + g2) / 2.0)))
    assert(out(0).getAs[Double]("rs_vol") === r10(math.sqrt((s1 + s2) / 2.0)))
  }

  test("ohlcVolatility: flat bars give zero vol; bad bars excluded; " +
      "empty key NULL") {
    val bars = Seq(
      ("flat", 1L, 5.0, 5.0, 5.0, 5.0), ("flat", 2L, 5.0, 5.0, 5.0, 5.0),
      ("mix", 1L, 10.0, 12.0, 9.0, 11.0),
      ("mix", 2L, 10.0, 12.0, -1.0, 11.0),  // non-positive low: excluded
      ("dead", 1L, 0.0, 0.0, 0.0, 0.0))     // nothing survives the guard
    val out = Rolling.ohlcVolatility(
        bars.toDF("key", "t", "open", "high", "low", "close"),
        "open", "high", "low", "close", Seq("key"), Seq("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getAs[Double]("park_vol") === 0.0)
    assert(out("flat").getAs[Double]("gk_vol") === 0.0)
    assert(out("flat").getAs[Double]("rs_vol") === 0.0)
    assert(out("mix").getAs[Long]("n_bars") === 1L)
    assert(out("dead").getAs[Long]("n_bars") === 0L)
    assert(out("dead").isNullAt(out("dead").fieldIndex("park_vol")))
  }

  test("corwinSchultz: hand-walked two-bar span") {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bars = Seq(("k", 1L, 102.0, 98.0), ("k", 2L, 103.0, 99.0))
    val out = Rolling.corwinSchultz(bars.toDF("key", "t", "high", "low"),
        "high", "low", Seq("key"), Seq("t")).collect()
    assert(out.length === 1 && out(0).getAs[Long]("n_spans") === 1L)
    val den = 3.0 - 2.0 * math.sqrt(2.0)
    val hl0 = r10(math.log(102.0 / 98.0))
    val hl1 = r10(math.log(103.0 / 99.0))
    val beta = hl0 * hl0 + hl1 * hl1
    val gog = r10(math.log(103.0 / 98.0))
    val gamma = gog * gog
    val alpha = (r10(math.sqrt(2.0 * beta)) - r10(math.sqrt(beta))) / den -
      r10(math.sqrt(gamma / den))
    val ea = r10(math.exp(alpha))
    val s = math.max(2.0 * (ea - 1.0) / (1.0 + ea), 0.0)
    assert(out(0).getAs[Double]("cs_spread") === s)
  }

  test("corwinSchultz: flat bars give zero spread; lone bar key NULL") {
    val bars = Seq(("k", 1L, 5.0, 5.0), ("k", 2L, 5.0, 5.0),
      ("solo", 1L, 9.0, 8.0))
    val out = Rolling.corwinSchultz(bars.toDF("key", "t", "high", "low"),
        "high", "low", Seq("key"), Seq("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Double]("cs_spread") === 0.0)
    assert(out("solo").getAs[Long]("n_spans") === 0L)
    assert(out("solo").isNullAt(out("solo").fieldIndex("cs_spread")))
  }

  test("kyleLambda: hand regression through origin, constant price NULL") {
    val rows = Seq(("k", 1L, 10.0, 5.0), ("k", 2L, 12.0, 3.0),
      ("k", 3L, 11.0, 4.0),
      ("c", 1L, 7.0, 2.0), ("c", 2L, 7.0, 9.0))
    val out = Rolling.kyleLambda(rows.toDF("key", "t", "close", "vol"),
        "close", "vol", Seq("key"), Seq("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    // spans: Δp=+2,sv=+3 → (6,9); Δp=−1,sv=−4 → (4,16); λ = 10/25
    assert(out("k").getAs[Long]("n_terms") === 2L)
    assert(out("k").getAs[Double]("kyle_lambda") === 0.4)
    // constant price: sv = 0 everywhere → zero denominator → NULL
    assert(out("c").getAs[Long]("n_terms") === 1L)
    assert(out("c").isNullAt(out("c").fieldIndex("kyle_lambda")))
  }

  test("varianceRatio: hand-walked VR and z at q=2") {
    val prices = Seq(10.0, 11.0, 10.0, 12.0, 11.0, 13.0)
    val df = prices.zipWithIndex.map { case (p, i) => ("k", i.toLong, p) }
      .toDF("key", "t", "close")
    val out = Rolling.varianceRatio(df, "close", Seq("key"), Seq("t"), q = 2)
      .collect()
    assert(out.length === 1)
    // independent replay: BigInt sufficient statistics, pinned final tree
    val r = prices.sliding(2).map { case Seq(a, b) =>
      BigDecimal(math.log(b / a) * 1e10)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt }.toVector
    val n = r.length
    val c = r.sliding(2).map(_.sum).toVector
    val (s, q2) = (r.sum, r.map(x => x * x).sum)
    val (sc, sc2) = (c.sum, c.map(x => x * x).sum)
    val a = BigInt(n) * n * q2 - BigInt(n) * s * s
    val b = BigInt(n) * n * sc2 - BigInt(2 * 2) * n * s * sc +
      BigInt(n - 2 + 1) * 4 * s * s
    val nd = n.toDouble
    val vr = b.toDouble * nd * (nd - 1.0) /
      (a.toDouble * 2.0 * (nd - 1.0) * (nd - 2.0))
    val sqphi = BigDecimal(math.sqrt(2.0 * 3 * 1 / (6.0 * nd)))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Long]("n_rets") === n.toLong)
    assert(out(0).getAs[Double]("vr") === vr)
    assert(out(0).getAs[Double]("z_vr") === (vr - 1.0) / sqphi)
    assert(vr < 1.0)  // the alternating series mean-reverts
  }

  test("varianceRatio: constant-return and short keys are NULL") {
    // geometric walk: every log return identical → zero return variance
    val rows = Seq(("g", 1L, 8.0), ("g", 2L, 16.0), ("g", 3L, 32.0),
      ("g", 4L, 64.0), ("s", 1L, 5.0), ("s", 2L, 6.0))
    val out = Rolling.varianceRatio(rows.toDF("key", "t", "close"),
        "close", Seq("key"), Seq("t"), q = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Long]("n_rets") === 3L)
    assert(out("g").isNullAt(out("g").fieldIndex("vr")))
    assert(out("s").isNullAt(out("s").fieldIndex("vr")))  // n = 1 <= q
    intercept[IllegalArgumentException] {
      Rolling.varianceRatio(rows.toDF("key", "t", "close"), "close",
        Seq("key"), Seq("t"), q = 1)
    }
  }

  test("ohlcVolatility: reserved column and missing ordering rejected") {
    val df = Seq(("k", 1L, 1.0, 1.0, 1.0, 1.0, 0L))
      .toDF("key", "t", "o", "h", "l", "c", "n_bars")
    intercept[IllegalArgumentException] {
      Rolling.ohlcVolatility(df, "o", "h", "l", "c", Seq("key"), Seq("t"))
    }
    intercept[IllegalArgumentException] {
      Rolling.ohlcVolatility(df.drop("n_bars"), "o", "h", "l", "c",
        Seq("key"), Seq.empty)
    }
  }
}
