package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order within each shard and split into fixed-length token
  * windows ("packs"), documents spanning pack boundaries — the standard
  * concat-and-chunk layout of packed pretraining data. This operator emits
  * the assignment map a packed-dataset writer needs: for every document,
  * the pack its first token lands in and the offset inside that pack.
  *
  * Scale design: packing is per-SHARD (the unit a single writer task owns),
  * so the plan is one hash exchange on the shard key plus a within-shard
  * window cumsum — no global sort, no driver state. Shard count is the
  * caller's parallelism knob; a 100 TB corpus packs with as many concurrent
  * writers as shards. A GLOBAL pack numbering would be a 1-partition sort
  * (the classic scale-killer); per-shard ids plus the shard key are the
  * distributed equivalent.
  *
  * No reference analog (beyond-reference op for the LLM-pipeline layer).
  */
object Packing {

  /** Assign each document its (pack, offset) under concat-and-chunk packing.
    *
    * @param docs       input frame
    * @param idCol      unique doc id; also the within-shard concat order
    *                   (with `tieCols` appended for non-unique layouts)
    * @param nTokensCol per-document token count column (positive)
    * @param shardCol   shard key column (each shard packs independently)
    * @param seqLen     pack length in tokens
    * @return input columns plus `token_start` (running offset of the doc's
    *         first token inside its shard's concat stream), `pack_id`
    *         (0-based within shard), `offset_in_pack`
    */
  def packAssignments(docs: DataFrame, idCol: String, nTokensCol: String,
                      shardCol: String, seqLen: Long,
                      tieCols: Seq[String] = Seq.empty): DataFrame = {
    require(seqLen > 0)
    Guards.requireNoReserved(docs.columns,
      Seq("token_start", "pack_id", "offset_in_pack"), "packAssignments")
    // A negative token count would silently corrupt the pack map (negative
    // token_start; `%` keeps the sign in Spark, so offset_in_pack goes
    // negative too), and a NULL count (e.g. a failed cast from a
    // non-numeric column) is skipped by sum() so token_start/pack_id come
    // back NULL silently — fail loudly per row on both.
    val nTok = {
      val n = col(nTokensCol).cast("long")
      when(n.isNull || n < 0L, raise_error(concat(
        lit(s"packAssignments: $nTokensCol must be a non-null count >= 0, got "),
        coalesce(n.cast("string"), lit("NULL"))))).otherwise(n)
    }
    val w = Window.partitionBy(col(shardCol))
      .orderBy((col(idCol) +: tieCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("token_start", sum(nTok).over(w) - nTok)
      .withColumn("pack_id", expr(s"token_start DIV $seqLen"))
      .withColumn("offset_in_pack", col("token_start") % seqLen)
  }
}
