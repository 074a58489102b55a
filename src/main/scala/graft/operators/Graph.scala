package graft.operators

import graft.CacheScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation: fixed-iteration PageRank,
  * the standard quality-weighting signal over a domain/citation graph
  * (harvested links, wiki references, citation edges) — documents from
  * high-centrality sources get boosted sampling weights the way
  * [[Sampling.weighted]] consumes them.
  *
  * Scale shape: the Pregel shape as DataFrames — per iteration one join
  * of ranks to the degree-annotated edge frame on `src` and one
  * map-side-combinable contribution sum on `dst`; the rank frame is
  * |nodes| rows. Small fixed iteration counts stay ONE lazy DAG (no
  * per-round action or barrier — at local scale the per-round jobs were
  * the dominant cost); every 4th round cuts lineage with
  * `localCheckpoint`, superseded blocks dropped eagerly (the
  * [[Dedup.connectedComponents]] block-scoping discipline), so long runs
  * cannot build an unbounded plan.
  *
  * Determinism: the per-node contribution sum is a parallel double sum
  * (order-dependent in the last ulp), so every iteration rounds ranks to
  * 10 decimals — the k-means-centroid precedent — making the fixpoint
  * layout-independent and bit-replayable in the DuckDB oracle.
  */
object Graph {

  // (A partition-preserving checkpoint variant — AQE disabled around the
  // localCheckpoint action so HashPartitioning survives into the LogicalRDD
  // and the iterative joins could co-partition — was A/B-tested here and
  // REJECTED: per-half-step job sums measured 6.1 s vs 4.0 s with plain
  // AQE-on checkpoints at sf0.1. AQE's runtime coalescing + broadcast
  // conversion on the tiny per-round frames beats static co-partitioning
  // at 32-way width, and alias rewrites broke the preserved partitioning
  // at the aggregate boundaries anyway, so the exchanges stayed.)

  /** PageRank after exactly `iters` iterations, damping `d`:
    * `pr(v) = (1−d)/N + d·Σ_{u→v} pr(u)/outdeg(u)`, ranks rounded to 10
    * decimals each iteration. Simplified variant: sink nodes (no
    * out-edges) keep only their teleport share and their mass leaks —
    * feed a bidirectional edge list (as the gate does) when conservation
    * matters. Emits `(node, pr)`.
    *
    * Convergence mode: `tol > 0` turns `iters` into a CAP and stops as
    * soon as `max |Δpr| < tol` — one scalar probe per round (the kCore
    * convergence-count precedent), each round eagerly checkpointed so the
    * probe's action is the round's only materialization. The default
    * `tol = 0` keeps the exact fixed-iteration semantics (and its lazy
    * every-4th-round checkpoint cadence) that the oracle gate replays. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               tol: Double = 0.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    require(tol >= 0.0, s"tol must be >= 0, got $tol")
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
    // EAGER localCheckpoint of the normalized edge frame (not persist): a
    // persisted frame keeps its full logical lineage, so the iters-round
    // lazy chain re-embedded the whole graph-construction subtree ~4x per
    // round and single-threaded driver ANALYSIS of that plan dominated the
    // gate (3.1 s of 5.4 s steady-state at sf0.1, plan dump 222 KB) — and
    // was session-sensitive (the driver measured 19 s where a fresh
    // session measured 4.9 s). The checkpoint truncates every downstream
    // plan to LogicalRDD leaves. Cutting e FIRST also means the degree
    // aggregation and the degree join below read the materialized blocks
    // instead of re-running the caller's edge subtree twice (the gate's
    // orders⋈lineitem+distinct scan ran 2x per materialization before —
    // ~0.9 s each at sf0.1).
    val (eCut, eBlocks) = checkpointed(e)
    // fold out-degrees INTO the edge frame once — one (src, dst, deg) cut
    // replaces a per-round degree join
    val (ew, ewBlocks) = checkpointed(eCut.join(
        eCut.groupBy(col("src")).agg(count(lit(1)).cast("double").as("__deg")),
        "src"))
    // e's blocks back nothing after ew is cut — release them eagerly
    drop(eBlocks)
    // nodes feeds the init and every round's spine — checkpointed off the
    // cut edge frame (no second scan of the raw edges), and ALSO persisted:
    // the materialized cache stats (|nodes| rows, a few hundred KB here)
    // let the planner broadcast the round-1 rank frame (verified in the
    // plan dump; later rounds' estimates degrade through the joins and
    // ride AQE's runtime conversion instead), and the identical edge-side
    // exchange subtrees of the SMJ rounds collapse into ONE ReusedExchange
    // per action. Estimate-driven at scale: a billion-node rank frame
    // reports GBs and falls back to SMJ on its own; no forced hint.
    val (nodesCut, nodeBlocks) = checkpointed(
      ew.select(col("src").as("node"))
        .union(ew.select(col("dst").as("node"))).distinct())
    val nodes = CacheScope.register(nodesCut
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // one scalar driver action (the connectedComponents convergence-probe
    // precedent) — N as a literal kills a per-round broadcast crossJoin
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n // same IEEE division the oracle runs
    var ranks = nodes.select(col("node"), round(lit(1.0 / n), 10).as("pr"))
    var rankBlocks = Set.empty[Int]
    var i = 1
    var converged = false
    while (i <= iters && !converged) {
      val contribs = ew
        .join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), (col("pr") / col("__deg")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) +
            lit(damping) * coalesce(col("__s"), lit(0.0)), 10).as("pr"))
      if (tol > 0.0) {
        // eager cut FIRST so the probe below is the round's only compute,
        // then one scalar max|Δ| against the previous (already-cut) ranks
        val (cut, cutBlocks) = checkpointed(next)
        val delta = cut
          .join(ranks.select(col("node"), col("pr").as("__prev")), "node")
          .agg(max(abs(col("pr") - col("__prev"))).as("__d"))
          .head.getDouble(0)
        drop(rankBlocks)
        rankBlocks = cutBlocks
        ranks = cut
        converged = delta < tol
      } else {
        ranks = next
        // lineage stays bounded for small fixed iters — everything below
        // evaluates lazily in the caller's one action; only cut (and pay an
        // eager materialization) every 4th round so long runs can't build
        // an unbounded plan
        if (i % 4 == 0 && i < iters) {
          val (cut, cutBlocks) = checkpointed(ranks)
          drop(rankBlocks)
          rankBlocks = cutBlocks
          ranks = cut
        }
      }
      i += 1
    }
    // ew/nodes checkpoint blocks back the returned lazy plan — CacheScope
    // owns their release (the harness sweeps after each query's action),
    // like the final CC checkpoint blocks
    CacheScope.registerRddIds(sc, ewBlocks ++ nodeBlocks ++ rankBlocks)
    ranks
  }

  /** k-core decomposition: the maximal subgraph in which every node has
    * degree ≥ `k`, by iterative peeling (repeatedly drop sub-`k` nodes
    * until a fixpoint) — the density filter that isolates tightly-knit
    * communities (spam rings, citation cores) where raw degree or
    * PageRank see only volume. The k-core is unique, so the result is
    * order- and layout-independent by construction; emits the surviving
    * (`node`, `degree`) frame (degree WITHIN the core).
    *
    * Scale shape ([[graft.operators.Dedup.connectedComponents]]
    * discipline): per round one degree aggregation (map-side
    * combinable) + one broadcast anti-join of the (small, shrinking)
    * sub-`k` node set against the edge frame; `localCheckpoint` cuts
    * lineage each round with superseded blocks dropped eagerly; the
    * per-round convergence check is a count on the WEAK frame, not the
    * graph. Fails loudly if `maxIters` rounds don't converge — a
    * silently-partial core is a wrong answer. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val sc = edges.sparkSession.sparkContext
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def drop(ids: Set[Int]): Unit = ids.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    var (e, eBlocks) = checkpointed(edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val weak = deg.filter(col("d") < k).select(col("node"))
      converged = weak.isEmpty
      if (!converged) {
        val (next, nextBlocks) = checkpointed(e
          .join(broadcast(weak.select(col("node").as("u"))), Seq("u"), "left_anti")
          .join(broadcast(weak.select(col("node").as("v"))), Seq("v"), "left_anti"))
        drop(eBlocks)
        eBlocks = nextBlocks
        e = next
        i += 1
      }
    }
    if (!converged) {
      drop(eBlocks)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIters rounds — raise maxIters")
    }
    CacheScope.registerRddIds(sc, eBlocks)
    e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Deterministic synchronous label propagation (Raghavan et al. 2007,
    * public algorithm): community detection by iterated majority vote —
    * every node starts as its own label and, each round, adopts the most
    * frequent label among its neighbors. Classic LPA is
    * nondeterministic (random update order, random tie-break); this
    * variant is REPRODUCIBLE by construction: synchronous rounds (all
    * nodes update from the same snapshot) and a total tie order (highest
    * count, then LOWEST label — via `max(struct(cnt, −label))`, the
    * portable argmax). A fixed `iters` keeps the plan finite and the
    * oracle unrollable; LPA quality plateaus in a handful of rounds on
    * social-style graphs (the published behavior).
    *
    * Scale shape: per round, one equi-join of the edge list against the
    * label table and two key aggregates — all map-side combinable; the
    * label table is node-cardinality-sized. Lineage is cut per round
    * with `localCheckpoint` (the [[pageRank]]/[[kCore]] discipline).
    * Emits (`node`, `community`). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val sc = edges.sparkSession.sparkContext
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def drop(ids: Set[Int]): Unit = ids.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    val half = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val (und, undBlocks) = checkpointed(
      half.union(half.select(col("b").as("a"), col("a").as("b"))).distinct())
    var (labels, labelBlocks) = checkpointed(
      und.select(col("a").as("node")).distinct()
        .withColumn("label", col("node")))
    for (_ <- 1 to iters) {
      val votes = und
        .join(labels.select(col("node").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
      val (next, nextBlocks) = checkpointed(votes
        .groupBy(col("a"))
        .agg(max(struct(col("cnt"), negate(col("label")).as("nl"))).as("m"))
        .select(col("a").as("node"), negate(col("m.nl")).as("label")))
      drop(labelBlocks)
      labelBlocks = nextBlocks
      labels = next
    }
    CacheScope.registerRddIds(sc, undBlocks ++ labelBlocks)
    labels.select(col("node"), col("label").as("community"))
  }

  /** Degree assortativity coefficient (Newman 2002, public formula):
    * the Pearson correlation of endpoint degrees over all directed edge
    * instances (each undirected edge in both orientations — the
    * standard symmetric convention). Positive = hubs link to hubs
    * (social-style); negative = hubs link to leaves (internet-style) —
    * the one-number structure fingerprint next to [[triangleCount]].
    *
    * Exactness: degrees are integers; the five sums ride DECIMAL(38,0)
    * (deg² × edge-count overflows a BIGINT on large graphs); the
    * coefficient is the [[graft.operators.Rolling.corrBeta]] clamp tree.
    * Two key aggregates + two degree joins — no window. Emits ONE row
    * (`n_edges`, `assortativity`; NULL on a degree-regular graph, where
    * the variance is zero). */
  def assortativity(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val half = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val adj = half.select(col("u").as("a"), col("v").as("b"))
      .union(half.select(col("v").as("a"), col("u").as("b")))
    val deg = adj.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val sums = adj
      .join(deg.select(col("node").as("a"), col("d").as("dx")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("dy")), Seq("b"))
      .agg(count(lit(1)).as("__m"),
        dec(col("dx")).as("__sx"), dec(col("dy")).as("__sy"),
        dec(col("dx") * col("dx")).as("__sxx"),
        dec(col("dy") * col("dy")).as("__syy"),
        dec(col("dx") * col("dy")).as("__sxy"))
    val m = col("__m").cast("double")
    def d(name: String): Column = col(name).cast("double")
    val num = m * d("__sxy") - d("__sx") * d("__sy")
    val dx = m * d("__sxx") - d("__sx") * d("__sx")
    val dy = m * d("__syy") - d("__sy") * d("__sy")
    sums.select((col("__m") / lit(2L)).cast("long").as("n_edges"),
      when(dx > 0.0 && dy > 0.0,
        greatest(lit(-1.0), least(lit(1.0), num / (sqrt(dx) * sqrt(dy)))))
        .as("assortativity"))
  }

  /** Link prediction scores (public formulas — Liben-Nowell & Kleinberg
    * 2003): for every NON-ADJACENT node pair with at least `minCommon`
    * common neighbors, the three classic topology scores —
    * common-neighbor count, Jaccard `|Γa∩Γb| / |Γa∪Γb|`, and
    * Adamic–Adar `Σ_{m∈Γa∩Γb} 1/ln(deg m)` (rarer shared neighbors
    * weigh more). Existing edges are anti-joined away: the output is the
    * CANDIDATE list, ranked.
    *
    * Scale shape: the wedge self-join through the middle node is the
    * quadratic-risk step (Σ deg(m)² — the same hub hazard as triangle
    * counting; bound your universe or degree-cap upstream for power-law
    * graphs); everything else is key aggregates and equi-joins. Output
    * is candidate-pair-sized.
    *
    * Determinism: counts and degree sums are integers; Jaccard is one
    * division; Adamic–Adar folds the middle-degree list in MIDDLE-NODE
    * ORDER with the per-term rounded-ln convention (`round(ln d, 10)`),
    * so the double sum is order-pinned and engine-replayable. A common
    * neighbor has degree ≥ 2 by construction, so `ln` never sees 1.
    * Emits (`node_a`, `node_b`, `common_n`, `jaccard`, `adamic_adar`). */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     minCommon: Int = 1): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val half = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val adj = half.select(col("u").as("m"), col("v").as("x"))
      .union(half.select(col("v").as("m"), col("u").as("x")))
    val deg = adj.groupBy(col("m").as("node")).agg(count(lit(1)).as("d"))
    val wed = adj.select(col("m"), col("x").as("na"))
      .join(adj.select(col("m"), col("x").as("nb")), Seq("m"))
      .filter(col("na") < col("nb"))
    val scored = wed
      .join(deg.select(col("node").as("m"), col("d")), Seq("m"))
      .groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("common_n"),
        sort_array(collect_list(struct(col("m"), col("d")))).as("__md"))
      .filter(col("common_n") >= minCommon.toLong)
      // existing edges are not candidates — the (na < nb) wedge order
      // matches half's (u < v) normalization, so one anti-join suffices
      .join(half.select(col("u").as("na"), col("v").as("nb")),
        Seq("na", "nb"), "left_anti")
    val aa = aggregate(
      transform(col("__md"), t => lit(1.0) /
        (round(log(t.getField("d").cast("double")), 10) + lit(0.0))),
      lit(0.0), (a, b) => a + b)
    scored
      .join(deg.select(col("node").as("na"), col("d").as("__da")), Seq("na"))
      .join(deg.select(col("node").as("nb"), col("d").as("__db")), Seq("nb"))
      .select(col("na").as("node_a"), col("nb").as("node_b"),
        col("common_n"),
        (col("common_n").cast("double") /
          (col("__da") + col("__db") - col("common_n")).cast("double"))
          .as("jaccard"),
        aa.as("adamic_adar"))
  }

  /** Exact triangle count of the UNDIRECTED simple graph underlying
    * `edges` (direction, duplicates, and self-loops are normalized away).
    * Emits one row (`n_edges`, `n_triangles`) — the global clustering /
    * community-density signal that, with [[pageRank]], grades a link
    * graph's quality (spam farms are triangle-dense cliques; organic link
    * graphs are sparse).
    *
    * Scale shape — the compact-forward / degree-ordered node-iterator
    * (Latapy 2008, the MapReduce triangle-counting standard): every
    * normalized edge is ORIENTED from its lower-(degree, id) endpoint to
    * the higher, which caps every node's out-degree at O(√m); the wedge
    * self-join `(a→b)⋈(b→c)` — the only quadratic-risk step — is
    * therefore Σ outdeg² = O(m^1.5) worst-case instead of Σ deg²
    * (catastrophic under power-law hubs: one degree-10⁶ hub is 10¹²
    * unordered wedges). The closing check is an equi-join of wedges
    * against the oriented edge set on BOTH endpoints; each triangle is
    * counted exactly once (its vertices' ranks form one orientation).
    * Everything is equi-joins + one global count: no window, no sort, no
    * driver state. The oriented frame feeds three plan branches, so it
    * persists for the job ([[graft.CacheScope]] owns the release).
    *
    * Determinism: an exact integer count — layout- and engine-independent
    * by construction. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val (oriented, _, triangles) = orientedTriangles(edges, srcCol, dstCol)
    val nEdges = oriented.agg(count(lit(1)).as("n_edges"))
    nEdges.crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
  }

  /** Shared compact-forward kernel (see [[triangleCount]]'s scaladoc for
    * the degree-orientation argument): returns the persisted oriented
    * edge frame, the full-degree frame, and the (a, b, c) triangle
    * frame. */
  private def orientedTriangles(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame, DataFrame) = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val ranked = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = CacheScope.register(ranked.select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
    val triangles = wedges
      .join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"))
    (oriented, deg, triangles)
  }

  /** Per-vertex local clustering coefficient — `2·T(v) / (d(v)·(d(v)−1))`
    * with `T(v)` the triangles through `v` — the node-level cohesion
    * score whose corpus-curation reading is the same as
    * [[triangleCount]]'s global one: spam/SEO link farms cluster near 1,
    * organic hubs near 0. Emits (`node`, `degree`, `triangles`, `lcc`);
    * `lcc` is 0 for degree-<2 nodes (no possible wedge, the standard
    * convention).
    *
    * Scale shape: the [[triangleCount]] compact-forward kernel (wedge
    * volume O(m^1.5), not Σ deg²), then ONE explode of the (a, b, c)
    * triangle frame — each triangle feeds all three of its corners — and
    * a map-side-combinable count per node. Everything exact-integer until
    * the single final IEEE division, so results are layout- and
    * engine-independent with no rounding. */
  def localClustering(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val (_, deg, triangles) = orientedTriangles(edges, srcCol, dstCol)
    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.select(col("n").as("node"), col("d").as("degree"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2L,
          (lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double")) /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** HITS hubs-and-authorities after exactly `iters` mutual-reinforcement
    * rounds (Kleinberg 1999, public formula) over the DIRECTED edge list:
    * `auth'(v) = Σ_{u→v} hub(u)`, then `hub'(u) = Σ_{u→v} auth'(v)`,
    * each half-step normalized by its MAX score — the max of doubles is
    * exact in any order (unlike the L2 norm's sum of squares), so the
    * only order-sensitive step is the per-node contribution sum, which is
    * rounded to 10 decimals like [[pageRank]]'s — making every iteration
    * layout-independent and oracle-replayable. Hubs start at 1.0; a node
    * with no in-edges scores auth 0, no out-edges hub 0. Emits (`node`,
    * `hub`, `auth`).
    *
    * Scale shape: per round two keyed aggregations over the edge frame
    * (map-side combinable) and two scalar maxes that ride back as
    * broadcast one-row frames (the winsorize stats-frame shape — no
    * driver action inside the loop); the edge and node frames persist
    * once. Each half-step's raw score frame (|nodes| rows) is EAGERLY
    * localCheckpoint-ed before normalization: the max-agg and the join
    * both reference it, and left lazy that double reference doubles the
    * whole un-materialized subtree per half-step — 2^(2·iters) recompute
    * (measured: 100 s for 3 rounds on the sf0.1 trade graph; ~7 s cut).
    * Only the two most recent cuts stay alive — each cut's lineage stops
    * at the previous one. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    val sc = edges.sparkSession.sparkContext
    def checkpointed(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def drop(ids: Set[Int]): Unit = ids.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    // EAGER localCheckpoint of the edge frame (the pageRank rationale: a
    // persisted frame keeps its full lineage, so all 2*iters per-half-step
    // cut plans re-embedded and re-analyzed the graph-construction subtree
    // — measured 5.8 s of 6.6 s steady-state at sf0.1 spent OFF the
    // executors across 50 tiny jobs); nodes is cut off the materialized
    // edge blocks instead of re-scanning the caller's edge subtree. The
    // cut frame is ALSO persisted: a bare LogicalRDD reports no size, and
    // without e's materialized cache stats the per-half-step score joins
    // lost their estimate-driven broadcast and re-shuffled the edge frame
    // every half-step (measured: suite shuffle 19.7 -> 37.9 MB with the
    // checkpoint alone). Persist-over-checkpoint keeps both properties —
    // truncated lineage AND accurate stats — and stays estimate-driven at
    // scale (a billion-node score frame falls back to SMJ on its own,
    // no forced broadcast hint).
    val (eCut, eBlocks) = checkpointed(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    val e = CacheScope.register(eCut
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val (nodes, nodeBlocks) = checkpointed(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    CacheScope.registerRddIds(sc, nodeBlocks)
    var live: List[Set[Int]] = Nil
    def cut(df: DataFrame): DataFrame = {
      val (c, bs) = checkpointed(df) // eager — see scaladoc
      live = bs :: live
      live.drop(2).foreach(drop) // older cuts are lineage-unreachable now
      live = live.take(2)
      c
    }
    def maxNormalized(rawCut: DataFrame, scoreCol: String): DataFrame = {
      // both references read the checkpointed blocks — no recompute
      val m = rawCut.agg(max(col(scoreCol)).as("__mx"))
      rawCut.crossJoin(broadcast(m))
        .select(col("node"),
          round(col(scoreCol) / col("__mx"), 10).as(scoreCol))
    }
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    var auth: DataFrame = null
    var i = 1
    while (i <= iters) {
      val authRaw = cut(e.join(hub, e("src") === hub("node"))
        .groupBy(col("dst").as("node"))
        .agg(round(sum(col("hub")), 10).as("auth")))
      auth = maxNormalized(authRaw, "auth")
      val hubRaw = cut(e.join(auth, e("dst") === auth("node"))
        .groupBy(col("src").as("node"))
        .agg(round(sum(col("auth")), 10).as("hub")))
      hub = maxNormalized(hubRaw, "hub")
      i += 1
    }
    // the loop is done with the edge frame — the returned plan reads only
    // nodes + the last two cuts, so its blocks are released eagerly here
    // rather than held until the harness sweep (the cache is registered
    // with CacheScope and released by the harness)
    drop(eBlocks)
    e.unpersist(blocking = false)
    // the returned frame reads the LAST two cuts (auth's and hub's raws)
    live.foreach(bs => CacheScope.registerRddIds(sc, bs))
    nodes
      .join(hub.select(col("node"), col("hub")), Seq("node"), "left")
      .join(auth.select(col("node"), col("auth")), Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("auth"), lit(0.0)).as("auth"))
  }
}
