package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming trending-token detection — the freshness monitor of a
  * continuously-ingesting text pipeline: per event-time window, the
  * tokens whose document frequency is spiking (a new topic flooding the
  * crawl, a spam template bursting, a source going off-topic). The batch
  * twin of the vocabulary/drift family ([[graft.operators.Freq]],
  * [[graft.operators.Divergence]]) for the ingestion path.
  *
  * Scale design: the streaming stage is ONE watermarked windowed count —
  * tumbling-window token counts are order-independent partial aggregates,
  * so state is one partial count per (window, token) inside the watermark
  * horizon and is evicted at window finalization. The per-window top-k cut
  * runs in the BATCH layer on the emitted counts (the bounded-heap
  * `topk_by` aggregate — ≤ k entries of state per window, no sort), via
  * `foreachBatch` or over the append-sink table: ranking inside the
  * streaming stage would force a second stateful shuffle per trigger for
  * a result the sink-side cut computes from finalized counts exactly.
  *
  * No reference analog (the reference's streaming layer is
  * indicator-only; beyond-reference op for the LLM-pipeline layer).
  */
object StreamingTrending {

  /** Watermarked tumbling-window token counts over a streaming document
    * frame: one output row per (window, token) with the token's document
    * frequency (`n_docs`, distinct-per-doc via the per-doc token-set
    * explode) — append-mode emission once the watermark closes the
    * window.
    *
    * @param docs         streaming frame with `textCol` and `eventTimeCol`
    * @param textCol      document content column (tokenized with the
    *                     shared [[graft.operators.TextOps.tokens]] rules)
    * @param eventTimeCol event-time column the watermark rides on
    * @param windowLen    tumbling window length, e.g. `"1 hour"`
    * @param delay        watermark delay bounding state/lateness
    */
  def windowTokenCounts(docs: DataFrame, textCol: String,
                        eventTimeCol: String, windowLen: String,
                        delay: String): DataFrame = {
    require(!docs.columns.contains("token"),
      "column name token is reserved by windowTokenCounts")
    docs
      .withWatermark(eventTimeCol, delay)
      // per-doc DISTINCT tokens → the count is a document frequency, the
      // burst signal that a repeated token inside one spam doc cannot fake
      .select(col(eventTimeCol),
        explode(array_distinct(graft.operators.TextOps.tokens(col(textCol))))
          .as("token"))
      .groupBy(window(col(eventTimeCol), windowLen), col("token"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("token"), col("n_docs"))
  }

  /** Per-window top-k cut over (finalized) window token counts — the
    * batch-layer half, run inside `foreachBatch` or over the sink table.
    * One ranking window over the ALREADY-REDUCED counts frame (per-window
    * vocabulary, never documents — the [[graft.operators.Eval.binaryAuc]]
    * reduced-frame-window shape); `WindowGroupLimit` keeps per-partition
    * k-row heaps on both sides of the exchange. Ties break to the
    * lexicographically earlier token — deterministic on any layout. */
  def topTokens(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_docs").desc, col("token").asc)
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("window_start"), col("token"), col("n_docs"), col("rank"))
  }
}
