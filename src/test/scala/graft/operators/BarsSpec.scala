package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BarsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ticks() = Seq(
    // (sym, day, seq, price, vol) — day 1 ticks arrive out of seq order
    ("a", 1, 2, 12.0, 1.10),
    ("a", 1, 1, 10.0, 2.00),
    ("a", 1, 3, 11.0, 0.50),
    ("a", 2, 1, 11.5, 1.00),
    ("b", 1, 1, 7.0, 3.00)
  ).toDF("sym", "day", "seq", "p", "v")

  test("ohlc: open/close follow the tick order, not arrival order") {
    val out = Bars.ohlc(ticks(), "p", "v", Seq("sym"), "day", Seq("seq"),
        volScale = 2)
      .orderBy("sym", "day").collect()
    val a1 = out(0)
    assert(a1.getAs[Double]("open") === 10.0)  // seq 1, though it arrived second
    assert(a1.getAs[Double]("high") === 12.0)
    assert(a1.getAs[Double]("low") === 10.0)
    assert(a1.getAs[Double]("close") === 11.0) // seq 3
    assert(a1.getAs[Double]("volume") === 3.60) // exact on 2-dp volumes
    assert(a1.getAs[Long]("n_ticks") === 3L)
    assert(out(1).getAs[Double]("open") === 11.5) // single-tick bar
    assert(out(1).getAs[Double]("close") === 11.5)
    assert(out(2).getAs[String]("sym") === "b")
  }

  test("ohlc: null prices never win open/close or move high/low, but count as ticks") {
    val df = Seq(("a", 1, 1, Some(10.0), 1.0), ("a", 1, 2, None, 1.0),
        ("a", 1, 3, Some(12.0), 1.0))
      .toDF("sym", "day", "seq", "p", "v")
    val out = Bars.ohlc(df, "p", "v", Seq("sym"), "day", Seq("seq")).collect()(0)
    assert(out.getAs[Double]("open") === 10.0)
    assert(out.getAs[Double]("close") === 12.0) // seq 3; the null seq-2 skipped
    assert(out.getAs[Double]("high") === 12.0)
    assert(out.getAs[Long]("n_ticks") === 3L)
  }

  test("ohlc: map-side combinable, and a single tie-break column stays hash-aggregated") {
    // the scale property: partial aggregates run below the one exchange
    val single = Bars.ohlc(ticks(), "p", "v", Seq("sym"), "day", Seq("seq"))
      .queryExecution.executedPlan.toString
    assert(single.contains("partial_min_by"),
      s"expected partial aggregates below the exchange:\n$single")
    assert(!single.contains("SortAggregate"),
      s"atomic ordering buffer should hash-aggregate:\n$single")
    // a multi-column tie-break pays SortAggregate (struct buffer) but the
    // partial agg — the thing that bounds the shuffle — is still there
    val multi = Bars.ohlc(ticks(), "p", "v", Seq("sym"), "day", Seq("day", "seq"))
      .queryExecution.executedPlan.toString
    assert(multi.contains("partial_min_by"),
      s"expected partial aggregates below the exchange:\n$multi")
    assert(multi.split("Exchange").length - 1 <= 1,
      s"expected a single exchange:\n$multi")
  }

  test("ohlc: rejects reserved output column names") {
    intercept[IllegalArgumentException] {
      Bars.ohlc(ticks().withColumnRenamed("p", "close"), "close", "v",
        Seq("sym"), "day", Seq("seq"))
    }
  }

  test("twap: hand-computed holding times incl. the bucket boundary") {
    import spark.implicits._
    // bucket width 100: ticks at ts 10 (p=1) and 60 (p=3) → Δt 50 and 40
    // (last tick holds to the boundary at 100); no phantom weight before
    // the first tick → twap = (1·50 + 3·40)/90
    val df = Seq(
      ("u", 10L, 0L, 1.0), ("u", 60L, 1L, 3.0),  // bucket 0
      ("u", 250L, 2L, 5.0),                      // bucket 2, single tick
      ("w", 120L, 3L, 2.0)                       // other key
    ).toDF("k", "t", "id", "p")
    val out = Bars.twap(df, "p", "t", Seq("k"), Seq("t", "id"),
        bucketNanos = 100L, priceScale = 0)
      .orderBy("k", "bucket").collect()
    assert(out.length === 3)
    val b0 = out(0)
    assert(b0.getAs[Long]("bucket") === 0L && b0.getAs[Long]("n_ticks") === 2L)
    assert(b0.getAs[Double]("twap") === 170.0 / 90.0)
    // single tick: holds from its own ts to the boundary → twap = its price
    assert(out(1).getAs[Double]("twap") === 5.0)
    assert(out(2).getAs[Double]("twap") === 2.0)
  }
}
