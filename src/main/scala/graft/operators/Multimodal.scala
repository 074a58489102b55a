package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are treated as
  * opaque `binary` columns with typed metadata, exactly as a 100 TB
  * training-data pipeline would carry them next to text.
  *
  * The real decode step (JPEG decode, audio resample, …) would run inside
  * [[decodeFeatures]]'s per-partition iterator — the image/audio libraries
  * are not available in this environment, so the decode is a clearly-marked
  * deterministic fake (byte histogram). Everything around it — schema,
  * partition-iterator batching, frame sampling, metadata struct — is the
  * real Spark plumbing and is tested.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to each row (here the UTF-8
    * bytes of the text column stand in for a real media payload). */
  def withMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      col(payloadCol).cast("binary").as("media"),
      struct(
        octet_length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit("application/x-fake").as("mime"),
        md5(col(payloadCol).cast("binary")).as("content_md5")
      ).as("media_meta"))

  /** Deterministic frame sampling: `nFrames` fixed-width byte slices at
    * even strides through the payload (the binary analog of video frame
    * sampling). Pure column expressions — no data leaves the executor. */
  def frameSamples(df: DataFrame, nFrames: Int = 4, frameLen: Int = 16): DataFrame = {
    val n = col("media_meta.n_bytes")
    val frames = sequence(lit(0), lit(nFrames - 1))
    df.withColumn("frames",
      transform(frames, f => {
        // long arithmetic: f * (n_bytes - frameLen) overflows Int once the
        // payload passes ~Int.MaxValue/nFrames bytes (video-sized blobs)
        val start = (f.cast("long") * greatest(n.cast("long") - frameLen, lit(1L)) / lit(nFrames)) + 1
        lower(hex(substring(col("media"), start.cast("int"), lit(frameLen))))
      }))
  }

  /** The decode plug-point: per-partition iterator over (id, payload) rows
    * producing a fixed-width feature vector. A real deployment swaps
    * `fakeDecode` for the actual decoder (e.g. JPEG → CNN features); the
    * signature, batching shape and schema stay identical.
    *
    * Implemented with `mapPartitions` (the Scala analog of `mapInPandas`):
    * rows stream through one partition at a time, never collected. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // one iterator per partition: the decoder amortizes any per-batch
        // setup (codec contexts, model weights) across the partition
        iter.map { case (id, bytes) => (id, fakeDecode(bytes, nBuckets)) }
      }
      .toDF(idCol, "features")
  }

  /** STUB — stands in for the real media decoder (`???` in a deployment
    * without codecs). Deterministic byte-histogram features, normalized. */
  private[operators] def fakeDecode(bytes: Array[Byte], nBuckets: Int): Array[Double] = {
    val hist = new Array[Double](nBuckets)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * nBuckets) / 256) += 1.0
      i += 1
    }
    val total = math.max(1.0, bytes.length.toDouble)
    var j = 0
    while (j < nBuckets) { hist(j) /= total; j += 1 }
    hist
  }
}
