package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the shuffle-free-join strategy for fact-to-fact
  * joins at 100 TB.
  *
  * A broadcast join covers small dimensions; a salted join covers skew; but
  * two LARGE tables repeatedly joined on the same key (orders ⋈ lineitem,
  * documents ⋈ annotations) should pay their shuffle ONCE, at write time:
  * `bucketBy(n, key)` hash-partitions rows into a fixed number of buckets
  * per partition-directory and records the layout in the catalog. A later
  * join of two tables bucketed on the same key with the same bucket count
  * reads matching buckets pairwise — SortMergeJoin with NO Exchange on
  * either side (and with `sortBy`, no Sort either). The `PlanSpec` suite
  * locks exactly that shape.
  *
  * The reference has no writer surface at all (it only reads Polygon CSVs),
  * so this is a beyond-reference op; it is the standard Spark answer to the
  * "pre-partitioned table" layout every warehouse engine provides.
  */
object Bucketed {

  /** Write `df` as a parquet table bucketed (and sorted) by `key` into
    * `buckets` buckets at `path`, registered as `table` in the session
    * catalog. Overwrites any previous layout. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: String): Unit = {
    require(buckets > 0)
    df.write.format("parquet")
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket key. When both sides
    * were written with the same `buckets` count on `key`, the plan contains
    * no shuffle (disable broadcast to see the bucketed SortMergeJoin; with
    * broadcast enabled Spark may still pick the even cheaper plan for a
    * small side — both are correct). */
  def cobucketedJoin(spark: SparkSession, leftTable: String,
                     rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Hive-style partitioned layout (`path/col=value/...`): the other half
    * of the write-time layout story. Bucketing solves JOIN co-location;
    * directory partitioning solves SCAN pruning — a reader filtering on the
    * partition column touches only matching directories (`PartitionFilters`
    * in the plan, asserted in `BucketedSpec`), so a date- or
    * language-restricted query over 100 TB reads only its slice. Choose a
    * low-cardinality column; high-cardinality partitioning explodes file
    * counts (the small-files problem). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty)
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
