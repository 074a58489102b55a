package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization — split per-user event streams into sessions at
  * inactivity gaps. The standard feature-engineering step over clickstream /
  * interaction logs before they become training data.
  *
  * Scale design: one hash exchange on the user key, then everything is a
  * within-partition window pass (lag → gap flag → running sum). No
  * self-join, no driver-side state; the plan is the same single-Window shape
  * the indicator queries lock in `PlanSpec`. Skewed users (bots) spread via
  * the same salting utilities if needed — the session id is a per-user
  * running count, so salting must stay within a user and is rarely worth it.
  *
  * No reference analog (beyond-reference op for the LLM-pipeline layer).
  */
object Sessionize {

  /** Assign session ids: a new session starts when the gap to the previous
    * event of the same user exceeds `gapSeconds`. Emits the input columns
    * plus `session_id` (1-based per user, in time order).
    *
    * @param events   input frame
    * @param userCol  partition key (user/actor/entity)
    * @param tsCol    event-time column (TimestampType or epoch seconds)
    * @param tieCols  extra ORDER BY columns making the within-user order
    *                 total (required for deterministic ids when timestamps
    *                 tie — same contract as the indicator windows)
    */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
                     gapSeconds: Long, tieCols: Seq[String]): DataFrame = {
    require(gapSeconds > 0)
    Guards.requireNoReserved(events.columns,
      Seq("session_id", "__new_session"), "assignSessions")
    val order = (col(tsCol) +: tieCols.map(col)): Seq[Column]
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull
        .or(col(tsCol).cast("long") - prev.cast("long") > gapSeconds), 1L)
      .otherwise(0L)
    events
      .withColumn("__new_session", isNew)
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session aggregates: event count, span seconds, first/last event
    * time — the usual session-level features. One additional exchange on
    * (user, session) — or zero if the caller's layout already satisfies
    * it. */
  def sessionStats(sessionized: DataFrame, userCol: String,
                   tsCol: String): DataFrame =
    sessionized.groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long"))
          .as("span_seconds"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Streaming sessionization via Spark's native session window: gap-based
    * event-time sessions with watermark-bounded state — the streaming twin
    * of [[assignSessions]] (ids become (user, session_start) pairs instead
    * of running counts, the streaming-safe identifier).
    *
    * Boundary contract (Spark's, pinned by the q_session_window oracle
    * and the gap-equal spec): events MERGE when the gap is less than OR
    * EQUAL to `gap` (next start on the closing boundary still merges) —
    * the same convention as [[assignSessions]]'s `> gapSeconds` split;
    * the window end is `last event + gap`. Batch execution ignores the
    * watermark, which is how the oracle gate replays it. */
  def streamingSessionStats(events: DataFrame, userCol: String, tsCol: String,
                            gap: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
