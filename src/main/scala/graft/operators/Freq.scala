package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency estimation over unbounded vocabularies.
  *
  * Two tools for the "how often does each token/URL/ngram occur in 100 TB"
  * problem:
  *
  *  - [[vocabulary]]: the exact path — token → count → top-k. One shuffle
  *    over (token, partial count) pairs with map-side combine, then a
  *    TakeOrdered (per-partition top-k, driver merges p·k rows — the full
  *    vocabulary never reaches one machine).
  *  - [[countMinSketch]] / [[cmsEstimate]]: the sketch path — a fixed
  *    depth×width counter grid regardless of vocabulary size. Per-row cost
  *    is `depth` hashes; the grid aggregates with map-side combine and is
  *    itself a tiny DataFrame, joinable against any candidate set for
  *    point estimates (classic CMS overestimate-only guarantees:
  *    err ≤ 2N/width with prob 1−(1/2)^depth).
  *
  * Hashes derive from md5 (row i salts the input), so both paths are
  * engine-independent and DuckDB-oracle-checkable — no RNG, no
  * partition-order dependence. No reference analog (beyond-reference op
  * for the LLM-pipeline layer).
  */
object Freq {

  /** Exact top-k vocabulary of whitespace/alnum tokens over `textCol`:
    * (token, cnt), ordered by cnt desc then token asc (total order — ties
    * are deterministic). */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0)
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
  }

  /** The depth hash rows all slice ONE md5 (128 bits = four 32-bit hashes,
    * Kirsch–Mitzenmacher-style): row i's bucket comes from hex digits
    * [1+8i, 8+8i). One digest per occurrence instead of `depth` — the md5
    * is the per-row hot cost at 100 TB. The digest is bound in its own
    * projection so the multi-referenced slice expressions cannot inline and
    * recompute it (CollapseProject keeps non-cheap multi-referenced
    * expressions bound). */
  private def hashEntries(v: org.apache.spark.sql.Column, depth: Int,
                          width: Int): org.apache.spark.sql.Column = {
    array((0 until depth).map { i =>
      struct(lit(i).as("i"),
        pmod(conv(substring(v, 1 + 8 * i, 8), 16, 10).cast("long"),
          lit(width.toLong)).as("bucket"))
    }: _*)
  }

  /** Build a depth×width count-min grid over the values of `valueCol`:
    * one row per non-empty cell `(i, bucket, cnt)` where row i's bucket is
    * a 32-bit slice of the value's md5 mod width. Missing cells are zero. */
  def countMinSketch(df: DataFrame, valueCol: String,
                     depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth > 0 && depth <= 4, "depth must be 1..4 (md5 yields four 32-bit slices)")
    require(width > 0)
    df.select(md5(col(valueCol).cast("string")).as("__h"))
      .select(explode(hashEntries(col("__h"), depth, width)).as("__e"))
      .select(col("__e.i").as("i"), col("__e.bucket").as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each item in `items(itemCol)` from a
    * sketch built by [[countMinSketch]] (same depth/width): the minimum
    * over the item's `depth` cells. The sketch side is tiny (≤ depth·width
    * rows) — Spark broadcasts it; the estimate never exceeds reality from
    * below (CMS overestimates only). */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth > 0 && depth <= 4, "depth must be 1..4 (md5 yields four 32-bit slices)")
    val hashed = items
      .select(col(itemCol), md5(col(itemCol).cast("string")).as("__h"))
      .select(col(itemCol), explode(hashEntries(col("__h"), depth, width)).as("__e"))
      .select(col(itemCol), col("__e.i").as("i"), col("__e.bucket").as("bucket"))
    hashed.join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Inverted index build — term → document frequency + postings list
    * `"doc:tf doc:tf …"` sorted by doc id (the text-search / contamination-
    * lookup layout). One (doc,term) aggregation then one per-term
    * aggregation; postings render as a single string so the index is
    * engine-portable and trivially hashable.
    *
    * Scale notes: `minDf` prunes the hapax tail (typically most of the
    * vocabulary); the skew risk is the opposite end — stopword terms whose
    * postings lists approach corpus size. A web-scale index caps those with
    * a stopword filter or shards postings by doc-id range (doc-partitioned
    * index, the standard search-engine layout); the single-row-per-term
    * variant here is the per-shard building block. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L): DataFrame = {
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val tf = df
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            e => concat(e("doc_id").cast("string"), lit(":"), e("tf").cast("string"))),
          " ").as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Pairwise association rules over (basket, item) data — the classic
    * market-basket readout (and, in a corpus pipeline, the
    * co-occurrence miner for tag/entity/source affinities): for every
    * ordered rule `a → c` whose PAIR appears in at least `minSupport`
    * baskets, the support counts, `confidence = sup(a,c)/sup(a)`, and
    * `lift = N·sup(a,c)/(sup(a)·sup(c))` (> 1 = positively associated).
    *
    * Scale shape — the Apriori pruning made declarative: items below
    * `minSupport` broadcast-semi-join OUT before pairing (an infrequent
    * item can never form a frequent pair), so the basket self-join runs
    * on frequent items only; pair space is Σ|frequent-per-basket|² — the
    * [[Graph.triangleCount]] bound discipline, dialed by `minSupport`.
    * Item supports (≤ |items| rows) broadcast into the rule expansion;
    * each unordered pair explodes into its two directed rules, never a
    * second join. Counts are exact; confidence/lift are single-division
    * IEEE trees — bit-replayable, no rounding.
    *
    * Emits (`antecedent`, `consequent`, `sup_pair`, `sup_ante`,
    * `sup_cons`, `confidence`, `lift`). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    Guards.requireNoReserved(df.columns,
      Seq("antecedent", "consequent", "sup_pair", "sup_ante", "sup_cons",
        "confidence", "lift", "__b", "__i", "__n"), "associationRules")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val supports = items.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val frequent = supports.filter(col("__n") >= minSupport)
    val fi = items.join(broadcast(frequent.select(col("__i"))), "__i")
    val nBaskets = items.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__nb"))
    val pairs = fi.select(col("__b"), col("__i").as("i1"))
      .join(fi.select(col("__b"), col("__i").as("i2")), "__b")
      .filter(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("sup_pair"))
      .filter(col("sup_pair") >= minSupport)
    val directed = pairs.select(explode(array(
        struct(col("i1").as("a"), col("i2").as("c"), col("sup_pair")),
        struct(col("i2").as("a"), col("i1").as("c"), col("sup_pair"))))
        .as("r"))
      .select(col("r.a").as("antecedent"), col("r.c").as("consequent"),
        col("r.sup_pair").as("sup_pair"))
    directed
      .join(broadcast(supports.select(col("__i").as("antecedent"),
        col("__n").as("sup_ante"))), "antecedent")
      .join(broadcast(supports.select(col("__i").as("consequent"),
        col("__n").as("sup_cons"))), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("sup_pair"),
        col("sup_ante"), col("sup_cons"),
        (col("sup_pair").cast("double") / col("sup_ante").cast("double"))
          .as("confidence"),
        ((col("sup_pair") * col("__nb")).cast("double") /
          (col("sup_ante") * col("sup_cons")).cast("double")).as("lift"))
  }
}
