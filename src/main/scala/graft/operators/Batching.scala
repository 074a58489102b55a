package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly — the padding-efficiency accounting a
  * training pipeline runs before batching variable-length sequences.
  *
  * Documents batched together pad to a common sequence length; batching a
  * 12-token doc with a 2048-token doc wastes 2036 slots. The standard fix
  * is a small ladder of bucket lengths (usually powers of two): each doc
  * goes to the smallest bucket that holds it, docs longer than the top
  * bucket truncate to it, and per-bucket padding waste
  * `Σ max(bucket − n, 0)` quantifies the ladder's efficiency.
  *
  * Scale design: the bucket id is a pure per-row CASE chain over the
  * (small, caller-fixed) ladder — codegen'd, no shuffle; the stats are one
  * map-side-combinable aggregation over ≤ |ladder| groups. Everything is
  * integer arithmetic, so the DuckDB oracle replays it bit-for-bit.
  */
object Batching {

  /** Smallest ladder bucket ≥ `n`, clamped to the top bucket for longer
    * docs. Pure CASE chain — exact in any engine. */
  def lengthBucket(n: Column, buckets: Seq[Long]): Column = {
    require(buckets.nonEmpty, "lengthBucket needs a non-empty ladder")
    require(buckets == buckets.sorted && buckets.distinct == buckets,
      s"ladder must be strictly increasing, got $buckets")
    require(buckets.head > 0, s"ladder must be positive, got $buckets")
    buckets.init.foldRight(lit(buckets.last)) { (b, rest) =>
      when(n <= b, lit(b)).otherwise(rest)
    }
  }

  /** Per-document bucket assignment: adds `seq_bucket` (ladder slot),
    * `stored_tokens` (tokens that fit: `min(n, bucket)` — docs above the
    * top bucket truncate) and `padding_tokens` (`max(bucket − n, 0)`). */
  def bucketAssignments(df: DataFrame, nTokensCol: String,
                        buckets: Seq[Long]): DataFrame = {
    Guards.requireNoReserved(df.columns,
      Seq("seq_bucket", "stored_tokens", "padding_tokens"), "bucketAssignments")
    val n = col(nTokensCol).cast("long")
    val guarded = when(n.isNull || n < 0L, raise_error(concat(
      lit(s"bucketAssignments: $nTokensCol must be a non-null count >= 0, got "),
      coalesce(n.cast("string"), lit("NULL"))))).otherwise(n)
    // stored/padding also go through the guard so it evaluates even when a
    // single-rung ladder folds the bucket CASE to a constant
    df.withColumn("seq_bucket", lengthBucket(guarded, buckets))
      .withColumn("stored_tokens", least(guarded, col("seq_bucket")))
      .withColumn("padding_tokens", greatest(col("seq_bucket") - guarded, lit(0L)))
  }

  /** Token-budget corpus selection — "keep the best N tokens per group":
    * rank documents by a quality score (descending, doc id tie-break) and
    * keep each group's prefix whose cumulative token count stays within
    * `budget`. The first doc of a group is always kept even if it alone
    * exceeds the budget (a budget must select SOMETHING to be useful —
    * and a single over-budget doc is a data-quality signal, not a reason
    * to emit an empty group).
    *
    * Plan: one keyed window (hash exchange on the group + in-partition
    * sort) computing the running total; the filter fuses into the window's
    * output projection. At 100 TB the group key IS the budget shard
    * (domain, source, language) — budgets per shard avoid any global
    * sort, and shard counts set writer parallelism. */
  def tokenBudgetSelect(df: DataFrame, groupCols: Seq[String],
                        nTokensCol: String, scoreCol: String, idCol: String,
                        budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "tokenBudgetSelect needs a group column")
    require(budget > 0, s"budget must be positive, got $budget")
    Guards.requireNoReserved(df.columns,
      Seq("tokens_before", "cum_tokens"), "tokenBudgetSelect")
    val n = col(nTokensCol).cast("long")
    val guarded = when(n.isNull || n < 0L, raise_error(concat(
      lit(s"tokenBudgetSelect: $nTokensCol must be a non-null count >= 0, got "),
      coalesce(n.cast("string"), lit("NULL"))))).otherwise(n)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(guarded).over(w))
      .withColumn("tokens_before", col("cum_tokens") - guarded)
      .filter(col("tokens_before") < budget)
  }

  /** Ladder efficiency report: one row per occupied bucket with doc count,
    * raw/stored/padding token totals. `capacity_tokens = bucket · n_docs`
    * is what the batch actually occupies; `stored/capacity` is the ladder's
    * utilization. One partial aggregation over ≤ |ladder| groups. */
  def bucketStats(df: DataFrame, nTokensCol: String,
                  buckets: Seq[Long]): DataFrame = {
    bucketAssignments(df, nTokensCol, buckets)
      .groupBy(col("seq_bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol).cast("long")).as("raw_tokens"),
        sum(col("stored_tokens")).as("stored_tokens"),
        sum(col("padding_tokens")).as("padding_tokens"))
  }
}
