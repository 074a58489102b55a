package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toksOf(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunks: starts, sizes and trailing-chunk arithmetic") {
    val df = Seq(
      (1L, toksOf(10)),  // 10 tokens, size 4 / overlap 1 -> starts 0,3,6
      (2L, toksOf(4)),   // exactly one chunk
      (3L, toksOf(2)),   // fewer than overlap+1 -> still one chunk
      (4L, ""),          // no tokens -> no chunks
      (5L, toksOf(5))    // 5 tokens -> starts 0,3 (chunk 2 short)
    ).toDF("doc_id", "text")
    val out = TextOps.chunks(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    graft.CacheScope.release()
    assert(out.toSeq === Seq(
      (1L, 0, 4, "w1 w2 w3 w4"), (1L, 1, 4, "w4 w5 w6 w7"),
      (1L, 2, 4, "w7 w8 w9 w10"),
      (2L, 0, 4, "w1 w2 w3 w4"),
      (3L, 0, 2, "w1 w2"),
      (5L, 0, 4, "w1 w2 w3 w4"), (5L, 1, 2, "w4 w5")))
  }

  test("chunks: overlap 0 partitions the token stream exactly") {
    val df = Seq((1L, toksOf(7))).toDF("doc_id", "text")
    val out = TextOps.chunks(df, "doc_id", "text", chunkSize = 3, overlap = 0)
      .orderBy("chunk_id").collect().map(_.getString(3))
    graft.CacheScope.release()
    assert(out.toSeq === Seq("w1 w2 w3", "w4 w5 w6", "w7"))
  }

  test("chunks rejects bad parameters") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.chunks(df, "doc_id", "text", chunkSize = 0)
    }
    intercept[IllegalArgumentException] {
      TextOps.chunks(df, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("spanDedup keeps the first occurrence and reassembles survivors") {
    val shared = "alpha beta gamma"  // a 3-token span repeated across docs
    val df = Seq(
      (1L, s"$shared one two three"),        // owns the span (lowest id)
      (2L, s"$shared four five six"),        // loses the shared span
      (3L, "unique text only here now yes"), // untouched
      (4L, "")                                // no tokens
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    graft.CacheScope.release()
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, "alpha beta gamma one two three"),
      (2L, 2L, 1L, "four five six"),
      (3L, 2L, 2L, "unique text only here now yes"),
      (4L, 0L, 0L, "")))
  }

  test("spanDedup dedups repeated spans inside ONE document too") {
    val df = Seq((1L, "x y z x y z tail end")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", n = 3).collect()
    graft.CacheScope.release()
    assert(out.head.getLong(1) === 3L) // spans: "x y z","x y z","tail end"
    assert(out.head.getLong(2) === 2L)
    assert(out.head.getString(3) === "x y z tail end")
  }

  test("incrementalDedup drops exact and near dups vs the reference only") {
    // near-dup pair: same 12 tokens, one word changed at the end
    val base = (1 to 12).map(i => s"tok$i").mkString(" ")
    val near = (1 to 11).map(i => s"tok$i").mkString(" ") + " changed"
    val ref = Seq(
      (100L, "ref exact duplicate text body", "en", 1),
      (102L, base, "en", 2)
    ).toDF("doc_id", "text", "lang", "n")
    val fresh = Seq(
      (1L, "ref exact duplicate text body", "en", 3), // exact dup of 100
      (3L, near, "en", 4),                            // near dup of 102
      (5L, "completely different fresh document here today", "en", 5),
      (7L, "completely different fresh document here today", "en", 6) // dup of 5 WITHIN the batch — kept
    ).toDF("doc_id", "text", "lang", "n")
    // rowsPerBand = 2: at J ≈ 0.82 the default 4×4 banding has ~91% recall
    // and the fixed hash constants happen to miss this pair (LSH recall is
    // probabilistic BY DESIGN); 8 narrower bands make the collision certain
    // at this similarity, so the spec tests the drop path, not banding luck
    val out = Dedup.incrementalDedup(fresh, ref, "doc_id", "text",
      rowsPerBand = 2, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    graft.CacheScope.release()
    // 1 exact-dropped, 3 near-dropped, 5 and 7 both survive (new×new pairs
    // are out of scope by design — the batch dedups against the ref only)
    assert(out.toSeq === Seq(5L, 7L))
  }

  test("incrementalDedup with an empty reference keeps everything") {
    val fresh = Seq((1L, "some document text here")).toDF("doc_id", "text")
    val ref = fresh.filter(lit(false))
    val out = Dedup.incrementalDedup(fresh, ref, "doc_id", "text")
    assert(out.count() === 1L)
    graft.CacheScope.release()
  }

  test("incrementalDedupWithIndex: persisted index gives identical results, ref text never scanned") {
    val base = (1 to 12).map(i => s"tok$i").mkString(" ")
    val near = (1 to 11).map(i => s"tok$i").mkString(" ") + " changed"
    val fresh = Seq(
      (1L, "ref exact duplicate text body"),
      (3L, near),
      (5L, "completely different fresh document here today")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("refindex").toString
    try {
      Seq((100L, "ref exact duplicate text body"), (102L, base))
        .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/refdocs")
      val ref = spark.read.parquet(s"$tmp/refdocs")
      // build once from the reference corpus, persist the three frames …
      val built = Dedup.buildRefIndex(ref, "doc_id", "text", rowsPerBand = 2)
      built.hashes.write.mode("overwrite").parquet(s"$tmp/hashes")
      built.bands.write.mode("overwrite").parquet(s"$tmp/bands")
      built.sets.write.mode("overwrite").parquet(s"$tmp/sets")
      // … and dedup a later batch purely from disk, without the ref corpus
      val index = Dedup.RefIndex(
        spark.read.parquet(s"$tmp/hashes"),
        spark.read.parquet(s"$tmp/bands"),
        spark.read.parquet(s"$tmp/sets"), k = 16, rowsPerBand = 2)
      val viaIndex = Dedup.incrementalDedupWithIndex(fresh, index, "doc_id", "text")
      val direct = Dedup.incrementalDedup(fresh, ref, "doc_id", "text",
        rowsPerBand = 2)
      assert(viaIndex.exceptAll(direct).isEmpty && direct.exceptAll(viaIndex).isEmpty)
      assert(viaIndex.select("doc_id").as[Long].collect().sorted.toSeq === Seq(5L))
      // the plan touches only the persisted index frames: the ref corpus
      // parquet never appears in any scan
      val p = viaIndex.queryExecution.executedPlan.toString
      assert(!p.contains("refdocs"), s"ref corpus must not be re-scanned:\n$p")
      assert(p.contains("bands"), s"expected the persisted band index scan:\n$p")
    } finally {
      graft.CacheScope.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
