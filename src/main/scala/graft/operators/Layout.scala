package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering — write-time ordering that makes 100 TB readable.
  *
  * Parquet scans prune with file/row-group min-max statistics; pruning
  * power is entirely determined by how the writer clustered the data. A
  * single-column sort gives perfect pruning on that column and none on any
  * other. Interleaving the bits of several columns into one Z-order
  * (Morton) key — the public Bayer/Markl UB-tree / Delta OPTIMIZE ZORDER
  * technique — gives every interleaved column partial locality: a filter
  * on ANY of them hits a small fraction of files instead of all of them.
  *
  * Everything here is exact integer arithmetic (shift/mask/or), identical
  * in any engine — the DuckDB oracle replays the key bit-for-bit — and
  * codegen-friendly (pure column expressions, no UDF).
  */
object Layout {

  /** Morton/Z-order key: round-robin bit-interleave of `bits` low bits of
    * each column (bit `i` of dimension `d` lands at position
    * `i·dims + d`). Inputs must already be non-negative and fit `bits`
    * bits — map real domains first (e.g. `pmod`, epoch-day, quantized
    * floats); values outside the domain fold silently, which only weakens
    * pruning, never correctness of the key itself. */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits > 0, s"bits must be positive, got $bits")
    require(bits * cols.size <= 63,
      s"bits*dims must fit a signed long: $bits*${cols.size} > 63")
    val d = cols.size
    cols.zipWithIndex.map { case (c, di) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + di)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster a frame for writing: range-partition into `numFiles` output
    * tasks by Z-key, sort within each partition. One range exchange (with
    * its sampling pass) — the standard sort-for-layout cost; downstream
    * `.write.parquet` emits one tightly-clustered file per partition whose
    * min-max stats prune on every interleaved dimension. */
  def clusterByZOrder(df: DataFrame, cols: Seq[Column], bits: Int,
                      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    Guards.requireNoReserved(df.columns, Seq("__zkey"), "clusterByZOrder")
    df.withColumn("__zkey", zOrderKey(cols, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }

  /** The DuckDB-SQL twin of [[zOrderKey]] for oracle queries — the same
    * shift/mask/or tree rendered as SQL text over the given column
    * expressions. */
  def zOrderKeySql(exprs: Seq[String], bits: Int): String = {
    require(exprs.nonEmpty && bits > 0 && bits * exprs.size <= 63)
    val d = exprs.size
    exprs.zipWithIndex.flatMap { case (e, di) =>
      (0 until bits).map(i => s"(((($e) >> $i) & 1) << ${i * d + di})")
    }.mkString(" | ")
  }

  /** Small-files compaction — the table-maintenance pass every long-lived
    * 100 TB dataset needs. Streaming sinks and fine-grained partitioned
    * writes accumulate thousands of KB-sized files; each costs a scan task
    * plus a name-node/object-store round trip, and at some point listing
    * dominates reading. Compaction rewrites a directory into
    * `ceil(rows / targetRowsPerFile)` evenly-sized files.
    *
    * Plan: one `count()` over the input (metadata-only for parquet), then
    * either a round-robin repartition (no ordering requirement — no sort,
    * one exchange) or, when `sortCols` are given, a range partition +
    * in-partition sort so the rewrite also restores min-max clustering
    * (compaction and Z-order/sort layout compose: pass the Z-key).
    * `maxRecordsPerFile` caps stragglers without an extra pass. */
  def compact(df: DataFrame, targetRowsPerFile: Long,
              sortCols: Seq[Column] = Seq.empty): DataFrame = {
    require(targetRowsPerFile > 0,
      s"targetRowsPerFile must be positive, got $targetRowsPerFile")
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    if (sortCols.isEmpty) df.repartition(nFiles)
    else df.repartitionByRange(nFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
  }

  /** Write `df` compacted to `path` (parquet, overwrite), returning the
    * file count actually produced. The count uses the Hadoop FileSystem
    * API, so it is correct for any supported URI scheme (local, hdfs://,
    * s3a://), not just local paths. */
  def compactTo(df: DataFrame, path: String, targetRowsPerFile: Long,
                sortCols: Seq[Column] = Seq.empty): Long = {
    compact(df, targetRowsPerFile, sortCols)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(hPath).count { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
    }.toLong
  }

  /** Per-file min/max/count statistics for a parquet table — the
    * data-skipping manifest a Delta/Iceberg-style layout audit reads:
    * for each file and each requested column, (`file`, `n_rows`,
    * `<col>_min`, `<col>_max`). Feed it the Z-order columns to SEE the
    * pruning power a layout buys (tight per-file ranges = selective
    * scans; full-range files = that column cannot prune).
    *
    * One scan grouped by `input_file_name()` — map-side-combinable
    * min/max/count, output rows = file count. Works on any Hadoop
    * filesystem (the grouping key is the split's path, no directory
    * listing involved). */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
                cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.drop(1): _*)
  }
}
