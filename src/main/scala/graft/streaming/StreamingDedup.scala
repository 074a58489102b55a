package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingestion-path twin of the batch
  * `Dedup.exact` operator, for a curation pipeline that receives documents
  * continuously instead of as a static corpus.
  *
  * Scale design: dedup state in a stream is a set of seen keys, which grows
  * without bound unless something expires it. `dropDuplicatesWithinWatermark`
  * keeps a key's state only until the event-time watermark passes it, so
  * state is proportional to the ingest volume inside the watermark delay —
  * not to all history. At 100 TB/day that difference is the whole ballgame;
  * exact forever-dedup belongs in the batch layer (`Dedup.exact`), the
  * stream guards the recent window. State lives in the configured state
  * store (RocksDB for production — same provider the indicator stream's
  * restart spec drives).
  *
  * No reference analog (the reference's streaming layer has no dedup;
  * beyond-reference op for the LLM-pipeline layer).
  */
object StreamingDedup {

  /** Drop re-deliveries of the same content within the watermark horizon.
    *
    * Keys on `md5(text)` — the same content hash the batch dedup operators
    * use — so replayed/duplicated documents with different ids still
    * collapse. The first arrival (in processing order) survives.
    *
    * @param docs         streaming DataFrame with `textCol` and `eventTimeCol`
    * @param textCol      document content column
    * @param eventTimeCol event-time timestamp column the watermark rides on
    * @param delay        watermark delay, e.g. `"10 minutes"` — duplicates
    *                     farther apart than this may both survive (they are
    *                     the batch layer's job)
    */
  def dedupByContent(docs: DataFrame, textCol: String, eventTimeCol: String,
                     delay: String): DataFrame = {
    require(!docs.columns.contains("__content_hash"),
      "column name __content_hash is reserved by dedupByContent")
    docs.withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
  }

  /** Key-based variant: exactly-once delivery per id within the watermark
    * horizon (e.g. re-sent events keyed by event id). */
  def dedupByKey(rows: DataFrame, keyCols: Seq[String], eventTimeCol: String,
                 delay: String): DataFrame =
    rows.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
