package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zOrderKey(Seq(col("x"), col("y")), bits).as("z"))
      .collect().head.getLong(0)

  test("zOrderKey interleaves bits round-robin (textbook Morton values)") {
    // x=0b11, y=0b01: x bit0→pos0, y bit0→pos1, x bit1→pos2, y bit1→pos3
    assert(z(3L, 1L, 2) === 7L)
    assert(z(0L, 0L, 4) === 0L)
    assert(z(1L, 0L, 4) === 1L)
    assert(z(0L, 1L, 4) === 2L)
    // full 4-bit lattice corner
    assert(z(15L, 15L, 4) === 255L)
  }

  test("zOrderKeySql renders the identical key") {
    val df = Seq((5L, 9L), (12L, 3L), (1023L, 511L)).toDF("x", "y")
    val got = df.select(
      Layout.zOrderKey(Seq(col("x"), col("y")), 10).as("a"),
      expr(Layout.zOrderKeySql(Seq("x", "y"), 10)).as("b"))
    assert(got.filter(col("a") =!= col("b")).count() === 0L)
  }

  test("guards: bits*dims must fit a signed long") {
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(Seq(col("x"), col("y")), 32)
    }
    intercept[IllegalArgumentException] { Layout.zOrderKey(Seq.empty, 4) }
    intercept[IllegalArgumentException] {
      Layout.clusterByZOrder(Seq((1L, 2L)).toDF("x", "y"),
        Seq(col("x")), 8, numFiles = 0)
    }
  }

  test("clusterByZOrder range-partitions by key and sorts within partitions") {
    val df = (1L to 4000L).map(i => (i, i * 37 % 1024, i * 91 % 1024))
      .toDF("id", "a", "b")
    val out = Layout.clusterByZOrder(df, Seq(col("a"), col("b")), 10, numFiles = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"), s"plan:\n$plan")
    assert(plan.contains("Sort"), s"plan:\n$plan")
    assert(out.count() === 4000L)
    // every input row survives, schema unchanged (no residual __zkey)
    assert(out.columns.toSeq === Seq("id", "a", "b"))
  }

  test("z-clustering concentrates key ranges per partition (pruning power)") {
    val df = (1L to 8000L).map(i => (i * 37 % 1024, i * 91 % 1024))
      .toDF("a", "b")
    val out = Layout.clusterByZOrder(df, Seq(col("a"), col("b")), 10, numFiles = 16)
      .withColumn("zkey", Layout.zOrderKey(Seq(col("a"), col("b")), 10))
    // per-output-partition z-range must be narrow vs the global range —
    // that's exactly what file-level min-max pruning exploits
    val spans = out.rdd.mapPartitions { it =>
      val zs = it.map(_.getAs[Long]("zkey")).toSeq
      if (zs.isEmpty) Iterator.empty
      else Iterator((zs.min, zs.max))
    }.collect()
    val globalSpan = (1L << 20).toDouble
    val meanSpan = spans.map { case (lo, hi) => (hi - lo).toDouble }.sum / spans.length
    assert(meanSpan < globalSpan / 4,
      f"expected clustered partitions, mean span $meanSpan%.0f of $globalSpan%.0f")
  }

  test("compact rewrites many small files into ceil(rows/target) files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    val smallPath = new java.io.File(dir, "small").getPath
    val bigPath = new java.io.File(dir, "compacted").getPath
    try {
      // 100 files of 10 rows each — the small-files antipattern
      (1L to 1000L).toDF("id").repartition(100)
        .write.parquet(smallPath)
      val written = Option(new java.io.File(smallPath).listFiles()).get
        .count(f => f.getName.endsWith(".parquet"))
      assert(written === 100)
      val nOut = Layout.compactTo(
        spark.read.parquet(smallPath), bigPath, targetRowsPerFile = 400L)
      assert(nOut === 3L, s"1000 rows / 400 per file -> 3 files, got $nOut") // ceil
      val back = spark.read.parquet(bigPath)
      assert(back.count() === 1000L)
      assert(back.select(sum(col("id"))).head().getLong(0) === 500500L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("compact with sortCols restores min-max clustering") {
    val df = (1L to 4000L).map(i => (i * 37 % 1024, i)).toDF("k", "id")
    val out = Layout.compact(df, targetRowsPerFile = 1000L, sortCols = Seq(col("k")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"), s"plan:\n$plan")
    assert(out.count() === 4000L)
    // per-partition key ranges must not overlap (range partitioning)
    val spans = out.select(col("k")).rdd.mapPartitions { it =>
      val ks = it.map(_.getLong(0)).toSeq
      if (ks.isEmpty) Iterator.empty else Iterator((ks.min, ks.max))
    }.collect().sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"overlapping partition ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("fileStats: per-file min/max/count manifest shows clustering power") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fstats").toString
    // range-partitioned by id → tight, non-overlapping per-file id ranges
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "grp")
    Layout.compactTo(df, dir, targetRowsPerFile = 250L,
      sortCols = Seq(col("id")))
    val stats = Layout.fileStats(spark, dir, Seq("id")).collect()
    assert(stats.length >= 4)
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 1000L)
    // ranges must not overlap (the clustering payoff fileStats exposes)
    val ranges = stats.map(r =>
      (r.getAs[Long]("id_min"), r.getAs[Long]("id_max"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("schemaDrift: added/removed/type/nullability changes; quiet when same") {
    import spark.implicits._
    val oldDf = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val newDf = Seq((1L, 2, true)).toDF("id", "score", "fresh")
      .selectExpr("id", "CAST(score AS INT) AS score", "fresh")
    val out = Profile.schemaDrift(oldDf, newDf).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2),
        r.getString(3)))).toMap
    assert(out("name") === (("removed", "string", null)))
    assert(out("fresh") === (("added", null, "boolean")))
    assert(out("score") === (("type_changed", "double", "int")))
    assert(!out.contains("id"))
    assert(Profile.schemaDrift(oldDf, oldDf).count() === 0L)
  }
}
