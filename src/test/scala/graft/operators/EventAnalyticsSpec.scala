package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cohortRetention: hand-built retention triangle") {
    // u1 first day 0, active 0,1,2; u2 first day 0, active 0,2; u3 first day 1
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 2L),
      (2L, 0L), (2L, 2L), (3L, 1L)).toDF("user_id", "day")
    val out = EventAnalytics.cohortRetention(ev, "user_id", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }

  test("funnel: strict ordering of first occurrences") {
    val ev = Seq(
      // u1 completes all three in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2 clicks before viewing: stops at step 1
      (2L, "click", 5L), (2L, "view", 6L), (2L, "purchase", 7L),
      // u3 views then clicks, never purchases
      (3L, "view", 1L), (3L, "click", 2L),
      // u4 only purchases: reaches no step
      (4L, "purchase", 9L)
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out === Map(1 -> ("view", 3L), 2 -> ("click", 2L),
      3 -> ("purchase", 1L)))
  }

  test("funnel: u2's later re-view does not resurrect the chain") {
    // first click precedes first view — a second view after the click must
    // NOT count (first-occurrence semantics, matching the oracle)
    val ev = Seq((2L, "click", 5L), (2L, "view", 6L), (2L, "view", 99L))
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 1L, "click" -> 0L))
  }

  test("funnel scans the log once regardless of depth; firsts broadcast in cohorts") {
    val ev = (1 to 300).map(i =>
      ((i % 20).toLong, Seq("view", "click", "purchase")(i % 3), i.toLong))
      .toDF("user_id", "event_type", "ts")
    val fp = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    assert(fp.split("LocalTableScan").length - 1 <= 1, s"one scan expected:\n$fp")
    val days = ev.withColumn("day", col("ts") % 7)
    val cp = EventAnalytics.cohortRetention(days, "user_id", "day")
      .queryExecution.executedPlan.toString
    assert(cp.contains("BroadcastHashJoin"), s"firsts must broadcast:\n$cp")
  }

  test("cohortRetention approxDistinct: sketch estimate lands near the exact count") {
    val ev = (1 to 3000).map(i => ((i % 300).toLong, (i % 5).toLong))
      .toDF("user_id", "day")
    val exact = EventAnalytics.cohortRetention(ev, "user_id", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = EventAnalytics.cohortRetention(ev, "user_id", "day",
        approxDistinct = true, sketchK = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (cell, est) =>
      val truth = exact(cell).toDouble
      // KMV with k=64: relative standard error ~1/sqrt(k-2) ≈ 13%; 3σ bound
      assert(math.abs(est - truth) <= math.max(3.0, 0.4 * truth),
        s"cell $cell: estimate $est vs exact $truth")
    }
  }

  test("cohortRetention broadcastFirsts=false drops the forced hint and matches results") {
    val ev = (1 to 300).map(i => ((i % 20).toLong, (i % 7).toLong))
      .toDF("user_id", "day")
    val forced = EventAnalytics.cohortRetention(ev, "user_id", "day")
    val free = EventAnalytics.cohortRetention(ev, "user_id", "day",
      broadcastFirsts = false)
    assert(forced.exceptAll(free).isEmpty && free.exceptAll(forced).isEmpty)
    // no ResolvedHint on the firsts side: the optimizer (or AQE at scale)
    // is free to pick a shuffle join when the user dimension is huge
    assert(!free.queryExecution.optimizedPlan.toString.contains("hints=[broadcast]"),
      free.queryExecution.optimizedPlan.toString)
  }

  test("funnel rejects duplicate steps") {
    val ev = Seq((1L, "view", 1L)).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
  }

  test("transitions: counts, conditional p, and mean gap on a hand trace") {
    // user 1: a@0 -> b@10 -> a@30 ; user 2: a@5 -> a@6
    val ev = Seq((1L, 0L, "a", 1L), (1L, 10L, "b", 2L), (1L, 30L, "a", 3L),
      (2L, 5L, "a", 4L), (2L, 6L, "a", 5L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.transitions(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p"),
          r.getAs[Double]("mean_gap")))).toMap
    // from 'a': a->b (gap 10) and a->a (gap 1) → p = 1/2 each
    assert(out(("a", "b")) === ((1L, 0.5, 10.0)))
    assert(out(("a", "a")) === ((1L, 0.5, 1.0)))
    // from 'b': only b->a (gap 20)
    assert(out(("b", "a")) === ((1L, 1.0, 20.0)))
    // per-row probabilities sum to 1
    assert(out.keys.toSeq.groupBy(_._1).forall { case (_, ks) =>
      math.abs(ks.map(out(_)._2).sum - 1.0) < 1e-12 })
  }

  test("transitions: no cross-user pair; ties break on the tie column") {
    val ev = Seq((1L, 100L, "end", 1L), (2L, 100L, "start", 2L),
      // same ts for user 3: event_id orders them x(5) then y(6)
      (3L, 50L, "x", 5L), (3L, 50L, "y", 6L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.transitions(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("x", "y")), "users 1/2 have no pair; tie is x->y")
  }

  test("transitionEntropy: a looping bot scores 0, varied paths score ln(k)") {
    // bot: a->a->a->a (one transition type); organic: 4 distinct pairs
    val ev = (Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "a")) ++
      Seq((2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"), (2L, "a")))
      .zipWithIndex.map { case ((u, t), i) => (u, i.toLong, t, i.toLong) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.transitionEntropy(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_transitions"),
          r.getAs[Double]("transition_entropy")))).toMap
    assert(out(1L) === ((3L, 0.0)), "single-loop bot → zero entropy")
    assert(out(2L)._1 === 4L)
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._2 === ln4, "4 equiprobable transitions → ln 4")
    // single-event users are absent
    val solo = Seq((9L, 0L, "x", 0L)).toDF("user_id", "ts", "event_type",
      "event_id")
    assert(EventAnalytics.transitionEntropy(solo, "user_id", "ts",
      "event_type", "event_id").count() === 0L)
  }

  test("transitions: layout-independent and row totals broadcast") {
    val ev = (1 to 600).map(i =>
      ((i % 7).toLong, i.toLong, s"t${i % 4}", i.toLong))
      .toDF("user_id", "ts", "event_type", "event_id")
    val a = EventAnalytics.transitions(ev, "user_id", "ts", "event_type",
      "event_id").collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    val b = EventAnalytics.transitions(ev.repartition(13), "user_id", "ts",
      "event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(a === b)
    val plan = EventAnalytics.transitions(ev, "user_id", "ts", "event_type",
      "event_id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"totals must broadcast:\n$plan")
  }

  test("attribution: touches credit the next conversion; tail drops") {
    val rows = Seq(("u", 1L, "view"), ("u", 2L, "click"),
      ("u", 3L, "purchase"), ("u", 4L, "view"), ("u", 5L, "purchase"),
      ("u", 6L, "view"),                 // after last conversion -> dropped
      ("v", 1L, "view"))                 // never converts -> dropped
    val out = EventAnalytics.attribution(rows.toDF("user", "t", "etype"),
        "user", "etype", "purchase", Seq("t"))
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L).getAs[Long]("conv_idx") === 1L)
    assert(out(1L).getAs[Double]("credit_linear") === 0.5)
    assert(out(1L).getAs[Boolean]("is_first_touch"))
    assert(!out(1L).getAs[Boolean]("is_last_touch"))
    assert(out(2L).getAs[Boolean]("is_last_touch"))
    assert(out(4L).getAs[Long]("conv_idx") === 2L)
    assert(out(4L).getAs[Double]("credit_linear") === 1.0)
    assert(out(4L).getAs[Boolean]("is_first_touch") &&
      out(4L).getAs[Boolean]("is_last_touch"))
  }
}
