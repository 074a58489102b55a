package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val quotes = Seq(
    (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 99L, 999.0))
    .toDF("q_sym", "q_ts", "q_price")

  private lazy val trades = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 9L, "early"), (2L, 5L, "c"))
    .toDF("t_sym", "t_ts", "t_tag")

  test("asof join picks the most recent right row at or before each left time") {
    val out = AsofJoin.asofJoin(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts")
      .orderBy("t_sym", "t_ts")
      .collect().map(r => (r.getAs[Long]("t_sym"), r.getAs[Long]("t_ts"),
        r.getAs[String]("t_tag"), Option(r.getAs[Any]("q_ts")), Option(r.getAs[Any]("q_price"))))
    assert(out.toSeq === Seq(
      (1L, 9L, "early", None, None),               // before any quote
      (1L, 10L, "a", Some(10L), Some(100.0)),      // inclusive tie
      (1L, 20L, "b", Some(15L), Some(150.0)),      // latest prior
      (2L, 5L, "c", None, None)))                  // key 2's quote is later
  }

  test("tolerance nulls out matches older than the bound (numeric units)") {
    val out = AsofJoin.asofJoin(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts",
        tolerance = Some(4L))
      .orderBy("t_sym", "t_ts")
      .collect().map(r => (r.getAs[Long]("t_ts"), Option(r.getAs[Any]("q_price"))))
    assert(out.toSeq === Seq(
      (9L, None),              // no prior quote at all
      (10L, Some(100.0)),      // age 0 <= 4
      (20L, None),             // latest prior is age 5 > 4 -> dropped
      (5L, None)))
    // tolerance 5 keeps the age-5 match (inclusive bound)
    val incl = AsofJoin.asofJoin(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts",
        tolerance = Some(5L))
      .filter($"t_ts" === 20L).head()
    assert(incl.getAs[Double]("q_price") === 150.0)
  }

  test("tolerance keeps null-right-time matches, agreeing with classic mode") {
    // ADVICE r3: a matched right row with NULL time makes `age` NULL — the
    // tolerance gate must keep it (coalesce), not silently null the match
    val q = Seq((1L, Option.empty[java.lang.Long], 42.0))
      .toDF("q_sym", "q_ts", "q_price")
    val t = Seq((1L, 10L, "a")).toDF("t_sym", "t_ts", "t_tag")
    val classic = AsofJoin.asofJoin(t, q, "t_sym", "q_sym", "t_ts", "q_ts")
      .head().getAs[Any]("q_price")
    val bounded = AsofJoin.asofJoin(t, q, "t_sym", "q_sym", "t_ts", "q_ts",
      tolerance = Some(4L)).head().getAs[Any]("q_price")
    assert(classic === bounded)
    assert(bounded === 42.0)
  }

  test("asof join rejects overlapping column names") {
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, trades, "t_sym", "t_sym", "t_ts", "t_ts")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("asof join rejects inputs that use its reserved internal columns") {
    val bad = quotes.withColumnRenamed("q_price", "__m") // would corrupt the final select
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, bad, "t_sym", "q_sym", "t_ts", "q_ts")
    }
    assert(e.getMessage.contains("reserved"))
  }
}
