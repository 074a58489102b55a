package graft.operators

import java.sql.Timestamp
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ValidationSignalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("minute-aggs validation counts each planted violation (FIXTURES §2)") {
    val rows = Seq(
      // (ticker, window_start, open, high, low, close, volume, vwap, transactions)
      ("BTC", ts("2023-01-15 10:00:00"), 10.0, 11.0, 9.0, 10.5, 100L, 10.2, 5L),
      ("BTC", ts("2023-01-15 10:01:00"), 10.5, 11.5, 10.0, 11.0, 120L, 10.9, 6L),
      ("BTC", ts("2023-01-15 10:05:00"), 11.0, 12.0, 10.5, 11.5, 90L, 11.2, 4L), // 4-min gap
      ("BTC", ts("2023-01-15 10:06:00"), -1.0, 12.0, 10.5, 11.5, -5L, 11.2, 4L), // negative price+volume
      ("BTC", ts("2023-01-15 10:07:00"), 11.0, 10.0, 10.5, 11.5, 90L, 11.2, 4L)  // high < low
    ).toDF("ticker", "window_start", "open", "high", "low", "close", "volume", "vwap", "transactions")
    val r = Validation.validateMinuteAggs(rows, maxGapSeconds = 60)
    assert(r.totalRows === 5)
    assert(r.checks("timestamp_gaps") === 1)
    assert(r.checks("negative_volume") === 1)
    assert(r.checks("nonpositive_prices") === 1)
    assert(r.checks("ohlc_violations") >= 1)
    assert(!r.passed)
    assert(r.summary.contains("FAILED"))
  }

  test("day-aggs validation flags weekend rows with translated DOW constants") {
    val rows = Seq(
      ("BTC", java.sql.Date.valueOf("2023-01-16"), 1.0, 2.0, 0.5, 1.5, 10L, 1.2, 2L), // Monday
      ("BTC", java.sql.Date.valueOf("2023-01-15"), 1.0, 2.0, 0.5, 1.5, 10L, 1.2, 2L), // Sunday
      ("BTC", java.sql.Date.valueOf("2023-01-14"), 1.0, 2.0, 0.5, 1.5, 10L, 1.2, 2L)  // Saturday
    ).toDF("ticker", "date", "open", "high", "low", "close", "volume", "vwap", "transactions")
    val r = Validation.validateDayAggs(rows)
    assert(r.totalRows === 3)
    assert(r.checks("weekend_rows") === 2)
    assert(!r.passed)
  }

  test("clean data passes validation") {
    val rows = Seq(
      ("BTC", ts("2023-01-16 10:00:00"), 10.0, 11.0, 9.0, 10.5, 100L, 10.2, 5L),
      ("BTC", ts("2023-01-16 10:01:00"), 10.5, 11.5, 10.0, 11.0, 120L, 10.9, 6L)
    ).toDF("ticker", "window_start", "open", "high", "low", "close", "volume", "vwap", "transactions")
    assert(Validation.validateMinuteAggs(rows).passed)
  }

  private lazy val priceSeries: org.apache.spark.sql.DataFrame = {
    // deterministic oscillating series with a sharp drop to trigger RSI < 30
    val xs = (1 to 60).map { i =>
      val base = if (i <= 40) 100.0 + i * 0.1 else 104.0 - (i - 40) * 2.0
      ("TST", i, base)
    }
    xs.toDF("ticker", "seq", "close")
  }

  test("detectRsiSignals emits BUY on oversold with confidence in (0,1]") {
    val sigs = Signals.detectRsiSignals(priceSeries, "ticker", Seq("seq"), "close", window = 5)
      .collect()
    assert(sigs.nonEmpty)
    assert(sigs.forall(_.getAs[String]("signal_type") != null))
    val buys = sigs.filter(_.getAs[String]("signal_type") == "BUY")
    assert(buys.nonEmpty)
    buys.foreach { r =>
      val c = r.getAs[Double]("confidence")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Double]("rsi") < 30.0)
    }
  }

  test("detectMaCrossoverSignals fires on relation flips only") {
    val sigs = Signals.detectMaCrossoverSignals(priceSeries, "ticker", Seq("seq"), "close",
      shortWindow = 3, longWindow = 10).collect()
    assert(sigs.nonEmpty)
    sigs.foreach { r =>
      val short = r.getAs[Double]("sma_short"); val long = r.getAs[Double]("sma_long")
      val typ = r.getAs[String]("signal_type")
      assert(if (short > long) typ == "BUY" else typ == "SELL")
      val c = r.getAs[Double]("confidence")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("fkOrphans: orphan keys with blast radius; clean join is empty") {
    import spark.implicits._
    val fact = Seq((1L, "x"), (1L, "y"), (2L, "z"), (9L, "a"), (9L, "b"),
      (9L, "c")).toDF("k", "payload")
    val dim = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("id")
    val out = Validation.fkOrphans(fact, dim, "k", "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_rows")).toMap
    assert(out === Map(9L -> 3L))
    assert(Validation.fkOrphans(fact.filter($"k" < 3), dim, "k", "id")
      .count() === 0L)
  }

  test("paretoContribution: shares, cumulative order, head flag") {
    import spark.implicits._
    // totals: a=50, b=30, c=15, d=5 → shares .5/.3/.15/.05
    val df = Seq(("a", 50), ("b", 20), ("b", 10), ("c", 15), ("d", 5))
      .toDF("k", "v")
    val out = Validation.paretoContribution(df, "k", "v", headShare = 0.8)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("share"), r.getAs[Double]("cum_share"),
          r.getAs[Boolean]("in_head")))).toMap
    assert(out("a") === ((0.5, 0.5, true)))
    assert(out("b") === ((0.3, 0.8, true)))
    // c starts exactly at 0.8 → outside the head (strict <)
    assert(out("c")._3 === false && math.abs(out("c")._2 - 0.95) < 1e-12)
    assert(out("d")._3 === false)
  }

  test("eventStudy: hand-computed forward means, lift, and edge handling") {
    import spark.implicits._
    // rets: .1, -.2, .3, .4; signal at i=0 and i=2
    val df = Seq((0, 0.1, true), (1, -0.2, false), (2, 0.3, true),
      (3, 0.4, false)).map { case (i, r, s) => ("s", i, r, s) }
      .toDF("sym", "i", "r", "sig")
    val out = Signals.eventStudy(df, "r", "sig", Seq("sym"), Seq("i"),
        maxHorizon = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    // h=1: fwd exists for i=0..2 → base mean = (-.2+.3+.4)/3; signal rows
    // i=0 (fwd -.2) and i=2 (fwd .4) → mean .1
    val h1 = out(1)
    assert(h1.getAs[Long]("n_signal") === 2L && h1.getAs[Long]("n_base") === 3L)
    assert(math.abs(h1.getAs[Double]("mean_signal") - 0.1) < 1e-12)
    assert(math.abs(h1.getAs[Double]("mean_base") - 0.5 / 3.0) < 1e-12)
    assert(math.abs(h1.getAs[Double]("lift") -
      (0.1 - 0.5 / 3.0)) < 1e-12)
    // h=2: fwd exists for i=0,1 → signal row only i=0 (fwd .3)
    val h2 = out(2)
    assert(h2.getAs[Long]("n_signal") === 1L && h2.getAs[Long]("n_base") === 2L)
    assert(math.abs(h2.getAs[Double]("mean_signal") - 0.3) < 1e-12)
    // no signal rows with a fwd → NULL mean_signal and lift
    val none = Signals.eventStudy(
      Seq(("s", 0, 0.1, false), ("s", 1, 0.2, false))
        .toDF("sym", "i", "r", "sig"), "r", "sig", Seq("sym"), Seq("i"), 1)
      .collect().head
    assert(none.get(none.fieldIndex("mean_signal")) === null)
    assert(none.get(none.fieldIndex("lift")) === null)
  }

  test("candlePatterns: textbook shapes flag; degenerate and first bars " +
      "do not") {
    import spark.implicits._
    // (o, h, l, c): doji, hammer, engulfings, flat bar
    val bars = Seq(
      (0, 10.0, 11.0, 9.0, 10.05),   // doji: body .05 ≤ .1·range 2
      (1, 10.0, 10.1, 8.0, 9.95),    // hammer: body .05, lower 1.95, upper .1? no: upper=.1 > body .05 → NOT hammer
      (2, 10.0, 10.04, 8.0, 9.96),   // hammer: body .04, lower 1.96, upper .04
      (3, 10.0, 10.5, 9.4, 9.5),     // red bar (pc 9.5 < po 10)
      (4, 9.4, 10.8, 9.3, 10.2),     // bullish engulfing of bar 3
      (5, 10.3, 10.9, 9.2, 9.3),     // bearish engulfing of bar 4
      (6, 7.0, 7.0, 7.0, 7.0))       // flat: no range → nothing
    val df = bars.map { case (i, o, h, l, c) => ("s", i, o, h, l, c) }
      .toDF("sym", "i", "o", "h", "l", "c")
    val out = Signals.candlePatterns(df, "o", "h", "l", "c",
        Seq("sym"), Seq("i"))
      .collect().map(r => r.getInt(1) ->
        ((r.getAs[Boolean]("doji"), r.getAs[Boolean]("hammer"),
          r.getAs[Boolean]("bullish_engulfing"),
          r.getAs[Boolean]("bearish_engulfing")))).toMap
    assert(out(0)._1 === true)
    assert(out(1)._2 === false, "upper shadow exceeds the body")
    assert(out(2)._2 === true)
    assert(out(4)._3 === true && out(4)._4 === false)
    assert(out(5)._4 === true && out(5)._3 === false)
    assert(out(6) === ((false, false, false, false)))
  }

  test("equity curve: long/short compounding, NULL position holds cash") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("s", 0, 10.0, None: Option[Double]),
        ("s", 1, 12.0, Some(-1.0)), ("s", 2, 9.0, Some(1.0)))
      .toDF("sym", "i", "c", "pos")
    val out = Signals.equityCurve(df, "sym", Seq("i"), "c", "pos")
      .orderBy("i").collect().map(_.getAs[Double]("equity")).toSeq
    val f2 = 1.0 + (-1.0) * ((12.0 - 10.0) / 10.0) // short the +20% move
    val f3 = 1.0 + 1.0 * ((9.0 - 12.0) / 12.0)     // long the −25% move
    assert(out === Seq(1.0, f2, f2 * f3))
  }

  test("backtest: lookahead-free position, exact compound equity") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("s", 0, 10.0), ("s", 1, 12.0), ("s", 2, 8.0),
        ("s", 3, 12.0))
      .toDF("sym", "i", "c")
    val out = Signals.backtestMaCrossover(df, "sym", Seq("i"), "c",
        shortWindow = 1, longWindow = 2)
      .orderBy("i").collect()
    // position only at bar 2 (prior sma1=12 > prior sma2=11) — decided
    // BEFORE the bar's −33% move hits the equity
    assert(out.map(_.getAs[Double]("position")).toSeq ===
      Seq(0.0, 0.0, 1.0, 0.0))
    val f3 = 1.0 + (8.0 - 12.0) / 12.0
    assert(out.map(_.getAs[Double]("equity")).toSeq ===
      Seq(1.0, 1.0, f3, f3))
  }
}
