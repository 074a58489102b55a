package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared input-contract checks for operators that add internal or output
  * columns: one wording, one semantics, every operator. */
private[graft] object Guards {

  /** Default-on candidate-pair budget for every pair-emitting candidate
    * generator ([[Dedup.minhashNearDups]], [[Dedup.ngramJaccardPairs]],
    * [[Dedup.containmentPairs]], [[Dedup.simhashPairs]],
    * [[FuzzyJoin.editDistancePairs]]): the bucketed self-join's output is
    * Σ_bucket C(m,2) rows, which is QUADRATIC in the flood multiplicity on
    * a near-dup-flooded or stop-shingle corpus (measured: pairmass.json —
    * 2.38 M pairs at 30×, ×9.6 per 3× scale, exactly C(S,2)). The budget
    * predicts that mass from the bucket sizes — one map-side-combinable
    * aggregate over the already-built bucket frame, CHEAP relative to the
    * join it guards — and fails LOUDLY before the join materializes a
    * runaway output, naming the cluster-oriented escape hatches. Same
    * "dangerous default" fix shape as SemDeDup's `maxClusterSize` (r11)
    * and streaming TTL (r12). `maxPairs <= 0` opts into the unbounded
    * pair space explicitly. */
  val DefaultMaxCandidatePairs: Long = 1000000000L

  /** Explicit opt-out: no pair budget (the pre-r13 unbounded behavior). */
  val UnboundedPairs: Long = 0L

  /** Gate `keyed` (one row per bucket member) behind the predicted
    * self-join pair mass Σ_bucket C(m,2) over `keyCols` buckets: the frame
    * passes through unchanged when the prediction fits `maxPairs`, and
    * every downstream task fails with `op`'s message when it does not.
    * The check is IN-PLAN (a broadcast single-row frame + a filter whose
    * predicate raises), so callers stay lazy — no extra driver action —
    * and the quadratic join never runs when over budget. The mass is an
    * upper bound on DISTINCT candidate pairs (a pair colliding in b
    * buckets is counted b times) and exactly the join's pre-distinct
    * output row count — the number that actually shuffles. Computed in
    * doubles: the bound only thresholds, and C(m,2) overflows a long at
    * m ≈ 4.3e9 members while staying exact far past any sane budget. */
  def pairBudget(keyed: DataFrame, keyCols: Seq[String], maxPairs: Long,
                 op: String): DataFrame = {
    if (maxPairs <= 0L) return keyed
    requireNoReserved(keyed.columns, Seq("__predicted"), op)
    val mass = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("__m"))
      .agg(coalesce(sum(col("__m") * (col("__m") - 1.0) / 2.0), lit(0.0))
        .as("__predicted"))
    keyed.crossJoin(broadcast(mass))
      .filter(
        when(col("__predicted") > lit(maxPairs.toDouble),
          raise_error(concat(
            lit(s"$op: predicted candidate-pair mass "),
            col("__predicted").cast("long").cast("string"),
            lit(s" exceeds maxPairs=$maxPairs — the corpus is pair-flooded " +
              "(huge duplicate clusters or a dominant bucket key). For " +
              "keep/drop dedup use the cluster path " +
              "(Dedup.nearDupKeep / Dedup.starNearDupClusters — O(members) " +
              "edges per bucket), or collapse exact replicas first " +
              "(Dedup.exact), or raise maxPairs / pass " +
              "Guards.UnboundedPairs to opt into the quadratic output")))
            .cast("boolean"))
          .otherwise(lit(true)))
      .drop("__predicted")
  }

  /** Bipartite variant of [[pairBudget]] for probe×build bucket joins
    * ([[FuzzyJoin.editDistancePairs]]): predicted join output is
    * Σ_bucket probe_m · build_m. Gates the PROBE side; the build side
    * passes through the caller untouched. */
  def pairBudgetJoin(probe: DataFrame, build: DataFrame,
                     keyCols: Seq[String], maxPairs: Long,
                     op: String): DataFrame = {
    if (maxPairs <= 0L) return probe
    requireNoReserved(probe.columns, Seq("__predicted"), op)
    val k = keyCols.map(col)
    val pm = probe.groupBy(k: _*).agg(count(lit(1)).cast("double").as("__pm"))
    val bm = build.groupBy(k: _*).agg(count(lit(1)).cast("double").as("__bm"))
    val mass = pm.join(bm, keyCols)
      .agg(coalesce(sum(col("__pm") * col("__bm")), lit(0.0)).as("__predicted"))
    probe.crossJoin(broadcast(mass))
      .filter(
        when(col("__predicted") > lit(maxPairs.toDouble),
          raise_error(concat(
            lit(s"$op: predicted candidate-pair mass "),
            col("__predicted").cast("long").cast("string"),
            lit(s" exceeds maxPairs=$maxPairs — one bucket key dominates " +
              "(a flooded length band / replica cluster). Block further " +
              "upstream (e.g. add a content-derived blocking key), or " +
              "raise maxPairs / pass Guards.UnboundedPairs to opt into " +
              "the quadratic output")))
            .cast("boolean"))
          .otherwise(lit(true)))
      .drop("__predicted")
  }

  /** Fail fast when the input already uses a column name the operator would
    * silently overwrite (`withColumn`) or mis-join on (internal keys). */
  def requireNoReserved(cols: Iterable[String], reserved: Iterable[String],
                        op: String): Unit = {
    val clash = cols.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"column names $clash are reserved by $op — rename them first")
  }

  /** Fail fast when two join inputs share column names (operators that
    * combine both sides into one output row). */
  def requireDisjoint(left: Iterable[String], right: Iterable[String],
                      what: String): Unit = {
    val overlap = left.toSet.intersect(right.toSet)
    require(overlap.isEmpty, s"$what column names must be disjoint, shared: $overlap")
  }
}
