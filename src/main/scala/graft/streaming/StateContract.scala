package graft.streaming

import org.apache.spark.sql.SparkSession

/** Checkpoint ↔ operator-shape contract for the stateful streaming
  * operators (ADVICE r12): round 12 changed [[StreamingPipeline.indicatorsTws]]'s
  * DEFAULT from unbounded state (`IndicatorProcessor`, `TimeMode.None`) to
  * a 7-day event-time TTL (`TtlIndicatorProcessor`, `TimeMode.EventTime`
  * plus a watermark) — a DIFFERENT operator/state shape. A production
  * stream restarting from a checkpoint written under the old default
  * would hit Spark's opaque state-incompatibility errors mid-restart.
  * This contract fails FAST with a clear migration message instead:
  *
  *  - on a FRESH checkpoint location, [[validate]] records the operator
  *    shape in `graft_state_contract.json` inside the checkpoint dir;
  *  - on an EXISTING checkpoint, the recorded shape must match — a
  *    mismatch (or a pre-contract checkpoint with no marker) throws,
  *    naming both shapes and the two migration options: pin the old
  *    behavior (`idleMs = KeepForever`) or start a fresh checkpoint
  *    (state re-warms from the stream).
  *
  * Call it right before `writeStream.option("checkpointLocation", dir)
  * .start()` with the SAME dir — [[StreamingLive]] shows the wiring. */
object StateContract {

  val MarkerFile = "graft_state_contract.json"

  /** The shape keys of [[StreamingPipeline.indicatorsTws]]: operator
    * identity, state/timer mode, and window size (a window change alters
    * the meaning of persisted buffers even though they deserialize). */
  def indicatorsTwsContract(windowSize: Int, idleMs: Long): Map[String, String] =
    Map(
      "operator" -> "indicatorsTws",
      "stateShape" -> (if (idleMs == StreamingPipeline.KeepForever)
        "keepForever" else "eventTimeTtl"),
      "windowSize" -> windowSize.toString)

  private def render(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")

  private def parse(s: String): Map[String, String] =
    """"([^"]+)":"([^"]*)"""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap

  /** Validate `checkpointLocation` against `contract`; record the contract
    * on first use. Local-filesystem paths only need java.nio; a real
    * deployment on HDFS/S3 passes a Hadoop-visible path — resolved through
    * the session's Hadoop FS so the marker lives next to Spark's own
    * offsets/state dirs wherever they are. */
  def validate(spark: SparkSession, checkpointLocation: String,
               contract: Map[String, String]): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(checkpointLocation)
    val fs = dir.getFileSystem(hconf)
    val marker = new org.apache.hadoop.fs.Path(dir, MarkerFile)
    val hasOffsets = fs.exists(new org.apache.hadoop.fs.Path(dir, "offsets"))
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded = try {
        val baos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { baos.write(buf, 0, n); n = in.read(buf) }
        parse(new String(baos.toByteArray, "UTF-8"))
      } finally in.close()
      val diffs = (contract.keySet ++ recorded.keySet).toSeq.sorted.flatMap { k =>
        if (recorded.get(k) == contract.get(k)) None
        else Some(s"$k: checkpoint=${recorded.getOrElse(k, "<absent>")} " +
          s"requested=${contract.getOrElse(k, "<absent>")}")
      }
      if (diffs.nonEmpty) throw new IllegalStateException(
        s"checkpoint $checkpointLocation was written under a DIFFERENT " +
          s"stateful-operator shape (${diffs.mkString("; ")}). Restarting " +
          "would fail or corrupt state mid-stream. Either pin the original " +
          "shape (e.g. idleMs = StreamingPipeline.KeepForever for a " +
          "pre-TTL checkpoint, and the original windowSize), or start a " +
          "fresh checkpointLocation (state re-warms from the stream).")
    } else if (hasOffsets) {
      throw new IllegalStateException(
        s"checkpoint $checkpointLocation predates the state contract (no " +
          s"$MarkerFile) — it was most likely written under the pre-r13 " +
          "UNBOUNDED default (idleMs = KeepForever), and the current " +
          "default is a 7-day event-time TTL with a different operator " +
          "shape. Pin idleMs = StreamingPipeline.KeepForever to keep " +
          "reading it, or start a fresh checkpointLocation; then record " +
          "the shape by calling StateContract.validate before start().")
    } else {
      fs.mkdirs(dir)
      val out = fs.create(marker, true)
      try out.write(render(contract).getBytes("UTF-8")) finally out.close()
    }
  }

}
