package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics — cohort retention and ordered funnels, the two
  * standard product/behavior queries over an append-only event log.
  *
  * Both are single-aggregation plans over the event scan: no window over
  * the raw events, no self-join of the log. Day/timestamp arithmetic is
  * integer, so results are engine-exact.
  */
object EventAnalytics {

  /** Cohort retention triangle: users cohorted by their first active day,
    * distinct-user counts per (cohort_day, day_offset). `dayCol` is an
    * integer day number (e.g. epoch days).
    *
    * Plan: the firsts frame is one map-side-combinable `min` per user and
    * broadcasts back onto the log (users ≪ events); the retention count is
    * one aggregation of the joined scan. At 100 TB the distinct-count is
    * the memory pressure point — `approxDistinct = true` SWITCHES IN the
    * [[graft.functions.KmvDistinct]] sketch (≤ sketchK longs of state per
    * cell, map-side combinable, deterministic — no RNG, so the estimate is
    * itself oracle-replayable): `countDistinct`'s Expand ships every
    * (cell, user) pair through the exchange, the sketch ships k longs per
    * cell per partition. When the user dimension itself is too large to
    * broadcast (one row per distinct user), pass `broadcastFirsts = false`
    * to let AQE pick the join strategy instead of failing on the broadcast
    * size limit. */
  def cohortRetention(events: DataFrame, userCol: String,
                      dayCol: String, broadcastFirsts: Boolean = true,
                      approxDistinct: Boolean = false,
                      sketchK: Int = 256): DataFrame = {
    Guards.requireNoReserved(events.columns,
      Seq("cohort_day", "day_offset", "n_users"), "cohortRetention")
    val firsts = events.groupBy(col(userCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    val nUsers =
      if (approxDistinct) graft.functions.Kmv.kmvDistinct(col(userCol), sketchK)
      else countDistinct(col(userCol))
    events.join(if (broadcastFirsts) broadcast(firsts) else firsts, userCol)
      .groupBy(col("cohort_day"),
        (col(dayCol) - col("cohort_day")).as("day_offset"))
      .agg(nUsers.as("n_users"))
  }

  /** Ordered funnel over first-occurrence times: a user reaches step k iff
    * their first `steps(0)` event precedes their first `steps(1)` event,
    * which precedes their first `steps(2)` event, … (strict `<`; a missing
    * step breaks the chain). One row per step with the reaching-user count.
    *
    * Plan: ONE aggregation computes every step's first-occurrence time per
    * user (k conditional `min`s, all map-side combinable), one tiny
    * aggregation folds the per-user frame to k counters — the event log is
    * scanned exactly once regardless of funnel depth. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    Guards.requireNoReserved(events.columns,
      Seq("step_index", "step", "n_users"), "funnel")
    val aggs = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i")
    }
    val perUser = events.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
    val reached = steps.indices.map { i =>
      (0 to i).map { j =>
        if (j == 0) col("__t0").isNotNull
        else col(s"__t${j - 1}") < col(s"__t$j") // null tⱼ breaks the chain
      }.reduce(_ && _)
    }
    val counters = perUser.agg(
      count(when(reached.head, 1)).as("__c0"),
      steps.indices.tail.map(i => count(when(reached(i), 1)).as(s"__c$i")): _*)
    counters.select(explode(array(steps.indices.map(i => struct(
        lit(i + 1).as("step_index"),
        lit(steps(i)).as("step"),
        col(s"__c$i").as("n_users"))): _*)).as("r"))
      .select(col("r.step_index"), col("r.step"), col("r.n_users"))
  }

  /** First-order Markov transition matrix of the per-user event stream:
    * for every adjacent (within-user, time-ordered) pair of events, the
    * transition count, the row-conditional probability
    * `p = n / Σ n(from_type, ·)`, and the mean inter-event gap — the
    * behavioral fingerprint behind session-flow dashboards, bot
    * detection (near-deterministic rows), and synthetic-log generation.
    *
    * Plan: ONE keyed window (lag over the user's time-ordered stream —
    * the [[Sessionize]] exchange shape) into a map-side-combinable
    * (from, to) aggregation; row totals re-aggregate the tiny matrix
    * frame (≤ |types|²) and broadcast back. `tieCol` breaks equal-time
    * orderings deterministically (pass the event id — a layout-dependent
    * tie would make the matrix nondeterministic).
    *
    * Determinism: counts and the integer gap sums are exact; `p` and
    * `mean_gap` are single IEEE divisions. `tsCol` must be numeric
    * (epoch micros/nanos — the gap inherits its unit); timestamps cast
    * first. Emits (`from_type`, `to_type`, `n`, `p`, `mean_gap`). */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    Guards.requireNoReserved(events.columns,
      Seq("from_type", "to_type", "n", "p", "mean_gap",
        "__pt", "__pts", "__rt"), "transitions")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val ts = col(tsCol).cast("long")
    val paired = events
      .withColumn("__pt", lag(col(typeCol), 1).over(w))
      .withColumn("__pts", lag(ts, 1).over(w))
      .filter(col("__pt").isNotNull)
    val matrix = paired
      .groupBy(col("__pt").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"), sum(ts - col("__pts")).as("__gap"))
    val rowTotals = matrix.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__rt"))
    matrix.join(broadcast(rowTotals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__rt").cast("double")).as("p"),
        (col("__gap").cast("double") / col("n").cast("double")).as("mean_gap"))
  }

  /** Per-user transition entropy — Shannon entropy (nats) of each user's
    * OWN transition distribution: the behavioral-regularity score that
    * separates scripted traffic (a bot cycling one loop → entropy ≈ 0)
    * from organic use (varied paths → entropy near ln of the observed
    * transition types). The per-user scalar [[transitions]] is the
    * population matrix of.
    *
    * Same plan prefix as [[transitions]] (one keyed lag window), then a
    * per-(user, from, to) count and a per-user fold over the ≤ |types|²
    * support in ascending (from, to) order — the [[Divergence]]
    * determinism discipline, one rounded `ln` per term absorbed by the
    * final `round(_, 10)`. Emits (`userCol`, `n_transitions`,
    * `transition_entropy`); users with a single event (no transition)
    * are absent. */
  def transitionEntropy(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tieCol: String): DataFrame = {
    Guards.requireNoReserved(events.columns,
      Seq("n_transitions", "transition_entropy", "__pt", "__n", "__ts"),
      "transitionEntropy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val paired = events
      .withColumn("__pt", lag(col(typeCol), 1).over(w))
      .filter(col("__pt").isNotNull)
    val counts = paired
      .groupBy(col(userCol), col("__pt"), col(typeCol))
      .agg(count(lit(1)).as("__n"))
    val grouped = counts.groupBy(col(userCol))
      .agg(sum(col("__n")).as("n_transitions"),
        sort_array(collect_list(struct(col("__pt"), col(typeCol),
          col("__n")))).as("__ts"))
    val t = col("n_transitions").cast("double")
    val ent = aggregate(
      transform(col("__ts"), e => {
        val p = e.getField("__n").cast("double") / t
        -(p * log(p))
      }),
      lit(0.0), (acc, x) => acc + x)
    grouped.select(col(userCol), col("n_transitions"),
      (round(ent, 10) + lit(0.0)).as("transition_entropy"))
  }

  /** Multi-touch attribution (public models): assign each CONVERSION's
    * credit across the touch events since the user's previous
    * conversion — first-touch, last-touch, and linear (1/k each) in ONE
    * pass. The fourth classic event-log query beside [[cohortRetention]]
    * / [[funnel]] / [[transitions]].
    *
    * Semantics: a touch belongs to the NEXT conversion in its user's
    * timeline (`conv_idx` = conversions strictly before it + 1); touches
    * after the user's last conversion never convert and are DROPPED
    * (emit-them-with-NULL is one filter away upstream). `orderCols` must
    * totally order each user's events — the
    * [[graft.streaming.KalmanEvent]] tie contract.
    *
    * Exactness: conversion indexes and touch counts are exact integers
    * off one keyed sort (running conversion count); linear credit is ONE
    * division `1/k`; first/last flags are rank comparisons. Plan: the
    * running index and the per-(user, conv) window share one (user)
    * exchange; output is touch-row-sized. Emits one row per attributed
    * touch: (userCol, `conv_idx`, orderCols…, typeCol, `n_touches`,
    * `credit_linear`, `is_first_touch`, `is_last_touch`). */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  convType: String, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "attribution needs ordering columns")
    Guards.requireNoReserved(events.columns,
      Seq("conv_idx", "n_touches", "credit_linear", "is_first_touch",
        "is_last_touch", "__is_conv", "__cb", "__tr"), "attribution")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isConv = when(col(typeCol) === convType, 1L).otherwise(0L)
    // conversions strictly before this row = running count minus own flag
    val indexed = events
      .withColumn("__is_conv", isConv)
      .withColumn("__cb",
        sum(col("__is_conv")).over(run) - col("__is_conv"))
      .withColumn("conv_idx", col("__cb") + lit(1L))
    val touches = indexed.filter(col("__is_conv") === 0L)
    val maxConv = indexed.groupBy(col(userCol))
      .agg(sum(col("__is_conv")).as("__nconv"))
    val wc = Window.partitionBy(col(userCol), col("conv_idx"))
    val wcOrd = wc.orderBy(orderCols.map(col): _*)
    touches
      .join(maxConv, Seq(userCol))
      .filter(col("conv_idx") <= col("__nconv"))
      .withColumn("n_touches", count(lit(1)).over(wc))
      .withColumn("__tr", row_number().over(wcOrd))
      .select((Seq(col(userCol), col("conv_idx")) ++
        orderCols.map(col) :+ col(typeCol) :+ col("n_touches") :+
        (lit(1.0) / col("n_touches").cast("double")).as("credit_linear") :+
        (col("__tr") === 1).as("is_first_touch") :+
        (col("__tr") === col("n_touches")).as("is_last_touch")): _*)
  }
}
