package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 well-separated cluster centers in 8-dim; 10 points each with a tiny
  // deterministic jitter on one coordinate
  private def clustered() = {
    val centers = Seq(
      Array(10f, 10f, 10f, 10f, 0f, 0f, 0f, 0f),
      Array(-10f, -10f, -10f, -10f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 10f, 10f, 10f, 10f),
      Array(0f, 0f, 0f, 0f, -10f, -10f, -10f, -10f))
    (0 until 40).map { i =>
      val c = centers(i % 4).clone()
      c(i % 8) += (i % 5) * 0.1f
      (i.toLong, c)
    }.toDF("vec_id", "embedding")
  }

  test("codebooks: m·k entries of width dim/m, codes in range") {
    val df = clustered()
    val books = Pq.trainCodebooks(df, dim = 8, m = 2, k = 4, iters = 2)
    val rows = books.collect()
    // ≤ m·k: a centroid whose cluster empties during an iteration drops
    // out (standard k-means behavior; the oracle replays it identically)
    assert(rows.length <= 8 && rows.length >= 2)
    assert(rows.map(_.getInt(0)).toSet === Set(0, 1)) // both subspaces alive
    assert(rows.forall(_.getSeq[Double](2).length === 4))
    val codes = Pq.encode(df, books, dim = 8, m = 2)
    val cs = codes.collect()
    assert(cs.length === 80) // 40 vectors x 2 subspaces
    assert(cs.forall { r => val c = r.getInt(2); c >= 0 && c < 4 })
  }

  test("reconstruction stays near the cluster center (quantization works)") {
    val df = clustered()
    val books = Pq.trainCodebooks(df, dim = 8, m = 2, k = 4, iters = 2)
    val recon = Pq.reconstruct(Pq.encode(df, books, dim = 8, m = 2), books)
    val err = recon.join(df, "vec_id")
      .select(Pq.sqDist(col("embedding"), col("recon")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    // jitter is <= 0.4 per point; centers are 400 apart in sq-L2 — any
    // correct codebook reconstructs within the jitter scale
    assert(err < 1.0, s"max reconstruction sq-error $err")
  }

  test("adcKnn: neighbors come from the query's own cluster") {
    val df = clustered()
    val out = Pq.adcKnn(df, df.filter(col("vec_id") < 4), topK = 5,
      dim = 8, m = 2, k = 4, iters = 2).collect()
    assert(out.length === 20) // 4 queries x top-5
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(q % 4 === n % 4, s"neighbor $n of query $q crosses clusters")
    }
  }

  test("adcKnn matches exact sq-L2 ranking on cluster-separated data") {
    val df = clustered()
    val approx = Pq.adcKnn(df, df.filter(col("vec_id") === 0), topK = 10,
        dim = 8, m = 2, k = 4, iters = 2)
      .collect().map(_.getLong(1)).toSet
    val exact = df.filter(col("vec_id") =!= 0)
      .crossJoin(df.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      .select(col("vec_id"), Pq.sqDist(col("q"), col("embedding")).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    // recall@10 on separated clusters: the 9 same-cluster points must all
    // be found (10th rank is an arbitrary cross-cluster tie — allow 1 miss)
    assert((approx & exact).size >= 9, s"approx=$approx exact=$exact")
  }

  test("codebooks broadcast; ADC scan never shuffles the corpus before ranking") {
    val df = clustered()
    val p = Pq.adcKnn(df, df.filter(col("vec_id") < 2), topK = 3,
      dim = 8, m = 2, k = 4, iters = 1).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }

  test("ivfAdcKnn: probed-cluster ADC finds the same-cluster neighbors, deterministic") {
    val df = clustered()
    val out = Pq.ivfAdcKnn(df, df.filter(col("vec_id") < 4), topK = 5,
      dim = 8, m = 2, k = 4, iters = 2, nlist = 4, nprobe = 1, coarseIters = 2)
    val rows = out.collect()
    assert(rows.length === 20) // 4 queries × top-5
    rows.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(q % 4 === n % 4, s"IVF-ADC neighbor $n of query $q crosses clusters")
    }
    val again = Pq.ivfAdcKnn(df, df.filter(col("vec_id") < 4), topK = 5,
      dim = 8, m = 2, k = 4, iters = 2, nlist = 4, nprobe = 1, coarseIters = 2).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("ivfAdcKnn plans: no SortAggregate, rankings via bounded-heap aggregates") {
    val df = clustered()
    val p = Pq.ivfAdcKnn(df, df.filter(col("vec_id") < 2), topK = 3,
        dim = 8, m = 2, k = 4, iters = 1, nlist = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortAggregate"), s"no sort-based aggregation:\n$p")
    assert(p.contains("partial_topk_by") && p.contains("partial_argmin_by"),
      s"expected heap/argmin partials:\n$p")
  }

  test("adcSearch from a persisted index: identical results, corpus never re-scanned") {
    val df = clustered()
    val direct = Pq.adcKnn(df, df.filter(col("vec_id") < 4), topK = 5,
      dim = 8, m = 2, k = 4, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("pqindex").toString
    try {
      val built = Pq.buildIndex(df, dim = 8, m = 2, k = 4, iters = 2)
      built.codebooks.write.mode("overwrite").parquet(s"$tmp/codebooks")
      built.codes.write.mode("overwrite").parquet(s"$tmp/codes")
      df.write.mode("overwrite").parquet(s"$tmp/corpusvecs")
      val index = Pq.PqIndex(
        spark.read.parquet(s"$tmp/codebooks"),
        spark.read.parquet(s"$tmp/codes"))
      // queries come from the corpus parquet; the INDEX side must not
      val queries = spark.read.parquet(s"$tmp/corpusvecs").filter(col("vec_id") < 4)
      val viaIndex = Pq.adcSearch(index, queries, topK = 5)
      assert(viaIndex.exceptAll(direct).isEmpty && direct.exceptAll(viaIndex).isEmpty)
      val p = viaIndex.queryExecution.executedPlan.toString
      // exactly one corpusvecs scan — the broadcast query side; the scored
      // side reads only the persisted codes/codebooks
      assert(p.split("corpusvecs").length - 1 <= 1,
        s"search must not re-scan corpus embeddings:\n$p")
      assert(p.contains("codes"), s"expected the persisted codes scan:\n$p")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("dim must split into m equal slices") {
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(clustered(), dim = 8, m = 3, k = 2, iters = 1)
    }
  }
}
