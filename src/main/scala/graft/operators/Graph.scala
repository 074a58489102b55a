package graft.operators

import graft.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation: fixed-iteration PageRank,
  * the standard quality-weighting signal over a domain/citation graph
  * (harvested links, wiki references, citation edges) — documents from
  * high-centrality sources get boosted sampling weights the way
  * [[Sampling.weighted]] consumes them.
  *
  * Scale shape: the Pregel shape as DataFrames — per iteration one join
  * of ranks to edges on `src` (co-partitioned with the degree frame) and
  * one map-side-combinable contribution sum on `dst`; the rank frame is
  * |nodes| rows, lineage cut per round with `localCheckpoint` and the
  * superseded round's blocks dropped eagerly (the
  * [[Dedup.connectedComponents]] block-scoping discipline).
  *
  * Determinism: the per-node contribution sum is a parallel double sum
  * (order-dependent in the last ulp), so every iteration rounds ranks to
  * 10 decimals — the k-means-centroid precedent — making the fixpoint
  * layout-independent and bit-replayable in the DuckDB oracle.
  */
object Graph {

  /** PageRank after exactly `iters` iterations, damping `d`:
    * `pr(v) = (1−d)/N + d·Σ_{u→v} pr(u)/outdeg(u)`, ranks rounded to 10
    * decimals each iteration. Simplified variant: sink nodes (no
    * out-edges) keep only their teleport share and their mass leaks —
    * feed a bidirectional edge list (as the gate does) when conservation
    * matters. Emits `(node, pr)`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val sc = edges.sparkSession.sparkContext
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def drop(ids: Set[Int]): Unit = ids.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // nodes feeds the init, N, and every round's spine — persist for the
    // loop's lifetime (|nodes| rows) so the distinct doesn't rerun per round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFrame = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("__deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (ranks, rankBlocks) = checkpointed(
      nodes.crossJoin(broadcast(nFrame))
        .select(col("node"), round(lit(1.0) / col("__n"), 10).as("pr")))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("pr") / col("__deg")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      val (updated, updatedBlocks) = checkpointed(
        nodes.join(contribs, Seq("node"), "left")
          .crossJoin(broadcast(nFrame))
          .select(col("node"),
            round(lit(1.0 - damping) / col("__n") +
              lit(damping) * coalesce(col("__s"), lit(0.0)), 10).as("pr")))
      drop(rankBlocks)
      rankBlocks = updatedBlocks
      ranks = updated
    }
    e.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    CacheScope.registerRddIds(sc, rankBlocks)
    ranks
  }
}
