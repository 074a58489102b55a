package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** The `events` table reader: physical INT64 `ts` normalized to
  * NANOSECOND Longs regardless of the parquet's declared timestamp unit.
  *
  * Why this exists: Catalyst has no timestamp type covering INT64
  * TIMESTAMP(NANOS), so `ts` is read through an explicit LongType schema
  * (raw stored int64, no session-wide `nanosAsLong` conf mutation) — but
  * the raw value's UNIT then depends on how the file was written, and the
  * testdata generator has shipped both ns- and µs-unit files across
  * rounds. A wrong unit assumption silently scales every session gap,
  * embargo window, and bar boundary by 1000×. The unit is read from the
  * parquet FOOTER's logical-type annotation — no data pages touched, so
  * the probe is free at any corpus size (and cached per path).
  */
object Events {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val unitCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Multiplier converting `path`'s raw int64 `ts` values to nanoseconds:
    * 1 for TIMESTAMP(NANOS) (or plain INT64, assumed nanos), 1000 for
    * MICROS, 1e6 for MILLIS. Footer-only read; the cache key includes the
    * footer file's (modtime, length) so a regenerated file at the same
    * path — the exact silent-rescaling hazard this class kills — re-reads
    * the footer instead of reusing a stale unit. */
  def nanosMultiplier(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val fp = new Path(path)
    val fs = fp.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(fp).isDirectory) {
        // one footer stands for all parts: a single writer produced them
        val parts = fs.listStatus(fp).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
        require(parts.nonEmpty,
          s"Events.nanosMultiplier: no .parquet parts under $path " +
            "(partial write or wrong directory)")
        parts.minBy(_.getName)
      } else fp
    val st = fs.getFileStatus(file)
    val key = s"$file@${st.getModificationTime}:${st.getLen}"
    unitCache.computeIfAbsent(key, _ => {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val msgType = reader.getFooter.getFileMetaData.getSchema
        msgType.getType(msgType.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.NANOS  => 1L
              case LogicalTypeAnnotation.TimeUnit.MICROS => 1000L
              case LogicalTypeAnnotation.TimeUnit.MILLIS => 1000000L
            }
          case _ => 1L // un-annotated int64 → already raw nanos
        }
      } finally reader.close()
    })
  }

  /** events frame with `ts` in nanos. When the file is already ns-unit the
    * plan is a bare scan (no multiply node). */
  def readNanos(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val raw = spark.read.schema(schema).parquet(path)
    val mult = nanosMultiplier(spark, path)
    if (mult == 1L) raw
    else raw.withColumn("ts", col("ts") * lit(mult))
  }
}
