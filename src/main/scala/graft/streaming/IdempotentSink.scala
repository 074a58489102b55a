package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once file delivery from Structured Streaming's at-least-once
  * `foreachBatch` contract.
  *
  * `foreachBatch` can REPLAY a micro-batch: if the process dies between
  * the sink write and the offset commit, the restarted query re-runs the
  * same `batchId` with the same data. A naive append sink then delivers
  * duplicates. The standard public fix is an IDEMPOTENT write keyed by
  * `batchId`: each batch goes to its own `batch_id=<id>` partition
  * directory with mode OVERWRITE, so a replay REPLACES its own (possibly
  * partial) output instead of appending beside it — at-least-once
  * execution, exactly-once contents. Readers consume the whole directory
  * as one partitioned dataset (`batch_id` surfaces as a partition
  * column, prunable like any other).
  *
  * At scale this is one parquet write per micro-batch with no global
  * coordination — the commit "transaction" is the atomic directory
  * replace, per batch, which is why the partition key must be the
  * batchId and nothing else. */
object IdempotentSink {

  /** The per-batch writer — exposed so specs (and foreachBatch retries)
    * can invoke it directly with a repeated batchId. */
  def writeBatch(dir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** Start `df` (a streaming DataFrame) into `dir` with exactly-once
    * per-batch parquet delivery and the given checkpoint. */
  def start(df: DataFrame, dir: String, checkpoint: String): StreamingQuery =
    df.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writeBatch(dir) _)
      .start()
}
