package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string matching at corpus scale — edit-distance pair
  * finding and dirty-to-canonical best-match linkage — the record-linkage
  * sibling of the n-gram/MinHash document dedup family ([[Dedup]]).
  *
  * Scale shape: never all-pairs. Candidates come from a LENGTH-BAND
  * bucket equi-join: strings within edit distance d differ in length by
  * at most d, so bucketing length by width d+1 and exploding only the
  * PROBE side to its ≤3 reachable buckets yields a bounded-expansion
  * equi-join whose candidate set provably covers every true pair. The
  * `levenshtein` verify (codegen'd built-in) runs per candidate, never
  * per cross-pair. For Zipfian short-string corpora where one length
  * band dominates, compose with positional-q-gram prefix pruning the way
  * [[Dedup.ngramJaccardPairsPrefix]] bounds stop-shingle posting lists.
  *
  * Determinism: integer edit distances and integer packed argmins — no
  * floating point anywhere, bit-replayable in any engine (levenshtein
  * parity with DuckDB is gated by q_string_funcs).
  */
object FuzzyJoin {

  private val PackShift = 1L << 40 // dist ≤ 2^23, id < 2^40

  /** Probe-side bucket explosion: every length-band bucket a string
    * within `maxDist` edits could live in (clamped at 0). */
  private def probeBuckets(len: org.apache.spark.sql.Column, maxDist: Int) = {
    val w = maxDist + 1
    explode(sequence(
      greatest(lit(0), (len - lit(maxDist)).cast("int").divide(lit(w)).cast("int")),
      (len + lit(maxDist)).cast("int").divide(lit(w)).cast("int")))
  }

  /** All unordered pairs `(id_a < id_b)` within `maxDist` edits, one
    * output row per pair with the exact distance. Pairs are emitted
    * exactly once WITHOUT a distinct: only the probe row with the
    * smaller id emits, and band coverage is symmetric, so the other
    * orientation never survives the filter. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        maxDist: Int,
                        maxPairs: Long = Guards.DefaultMaxCandidatePairs): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val w = maxDist + 1
    // bipartite pair budget over the length bands: a short-string corpus
    // where one band dominates (the documented Zipfian caveat) makes the
    // bucket join output-quadratic — fail loudly before it materializes
    val probe = Guards.pairBudgetJoin(
      df.select(col(idCol).cast("long").as("id_a"),
        col(textCol).as("__ta"),
        probeBuckets(length(col(textCol)), maxDist).as("__bucket")),
      df.select((length(col(textCol)).divide(lit(w))).cast("int").as("__bucket")),
      Seq("__bucket"), maxPairs, "FuzzyJoin.editDistancePairs")
    val build = df.select(col(idCol).cast("long").as("id_b"),
        col(textCol).as("__tb"),
        (length(col(textCol)).divide(lit(w))).cast("int").as("__bucket"))
    probe.join(build, "__bucket")
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("__ta")) - length(col("__tb"))) <= lit(maxDist))
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")))
      .filter(col("dist") <= lit(maxDist))
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Each left row's single best match among `right` rows within
    * `maxDist` edits: smallest distance, ties to the smallest right id —
    * the dirty-to-canonical linkage step after blocking. Lefts with no
    * match within `maxDist` are absent (anti-join the output to find
    * them). `excludeSelf` skips identical-id candidates for
    * self-linkage runs.
    *
    * The per-left argmin is `min(dist·2^40 + right_id)` — one packed
    * BIGINT, so the aggregation keeps a primitive buffer and stays in
    * hash aggregation with map-side combine (the single-tie-break-column
    * rule; a struct-ordered min_by would fall back to SortAggregate). */
  def bestMatch(left: DataFrame, right: DataFrame, idCol: String,
                textCol: String, maxDist: Int,
                excludeSelf: Boolean = false): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val w = maxDist + 1
    val probe = left.select(col(idCol).cast("long").as("id"),
        col(textCol).as("__ta"),
        probeBuckets(length(col(textCol)), maxDist).as("__bucket"))
    val build = right.select(
        when(col(idCol).isNull || col(idCol).cast("long") < 0L ||
            col(idCol).cast("long") >= lit(PackShift), raise_error(lit(
            s"bestMatch: $idCol must be in [0, 2^40) to pack")))
          .otherwise(col(idCol).cast("long")).as("__rid"),
        col(textCol).as("__tb"),
        (length(col(textCol)).divide(lit(w))).cast("int").as("__bucket"))
    val cands = probe.join(build, "__bucket")
      .filter(abs(length(col("__ta")) - length(col("__tb"))) <= lit(maxDist))
      .filter(if (excludeSelf) col("id") =!= col("__rid") else lit(true))
      .withColumn("__d", levenshtein(col("__ta"), col("__tb")))
      .filter(col("__d") <= lit(maxDist))
    cands
      .groupBy(col("id"))
      .agg(min(col("__d").cast("long") * lit(PackShift) + col("__rid"))
        .as("__pk"))
      .select(col("id"),
        (col("__pk") % lit(PackShift)).as("match_id"),
        expr(s"CAST(__pk DIV $PackShift AS INT)").as("match_dist"))
  }

  /** Fellegi–Sunter probabilistic record-linkage scoring (public 1969
    * formulation) over a CANDIDATE-PAIR frame (from any blocked
    * generator here — [[probeBuckets]], [[Dedup.sortedNeighborhoodPairs]],
    * or a plain blocking join): each boolean field-agreement column
    * contributes its log₂ likelihood ratio — `log₂(m/u)` on agreement,
    * `log₂((1−m)/(1−u))` on disagreement, 0 when the comparison is NULL
    * (the standard missing-field convention) — and the summed weight
    * classifies against the caller's (upper, lower) thresholds.
    *
    * Determinism: every weight FOLDS AT PLAN BUILD on the Scala side
    * (the only logs in the operator are over caller constants), so the
    * runtime is a branch-and-add over literals — bit-replayable with
    * the weights embedded verbatim in the oracle, no libm at runtime.
    * Plan: pure per-row map over the pair frame — the candidate
    * generator owns all the shuffle. Adds (`fs_weight`, `fs_class` —
    * 'match' / 'possible' / 'nonmatch'). */
  def fellegiSunter(pairs: DataFrame, agreementCols: Seq[String],
                    mu: Seq[(Double, Double)], upper: Double,
                    lower: Double): DataFrame = {
    require(agreementCols.nonEmpty, "need at least one agreement column")
    require(agreementCols.size == mu.size,
      s"${agreementCols.size} agreement columns but ${mu.size} (m,u) pairs")
    require(upper >= lower, s"upper ($upper) must be >= lower ($lower)")
    mu.foreach { case (m, u) =>
      require(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0,
        s"m and u must be in (0,1), got ($m, $u)")
      require(m > u, s"m must exceed u (agreement must favor matches), " +
        s"got ($m, $u)")
    }
    Guards.requireNoReserved(pairs.columns, Seq("fs_weight", "fs_class"),
      "FuzzyJoin.fellegiSunter")
    val ln2 = math.log(2.0)
    val weight = agreementCols.zip(mu).map { case (c, (m, u)) =>
      val wa = math.log(m / u) / ln2
      val wd = math.log((1.0 - m) / (1.0 - u)) / ln2
      when(col(c).isNull, lit(0.0))
        .when(col(c), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    pairs
      .withColumn("fs_weight", weight)
      .withColumn("fs_class",
        when(col("fs_weight") >= upper, lit("match"))
          .when(col("fs_weight") > lower, lit("possible"))
          .otherwise(lit("nonmatch")))
  }
}
