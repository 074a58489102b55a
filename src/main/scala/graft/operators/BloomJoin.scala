package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-accelerated EXACT semi/anti joins.
  *
  * The 100 TB decontamination / id-lookup pattern: the big side is a full
  * corpus scan, the small side is a key set that fits a sketch. A plain
  * semi join shuffles (or at best broadcasts a hash set of) every big-side
  * row; here a Bloom filter built from the small side is evaluated INSIDE
  * the big side's scan stage — rows the filter rejects never reach the
  * join. Because a Bloom filter has one-sided error (no false negatives),
  * composing it with an exact join keeps results bit-exact:
  *
  *  - semi join: `might_contain` keeps true matches plus ~fpp false
  *    positives; the exact semi join then removes the false positives.
  *  - anti join: rows REJECTED by the filter are definitely absent from
  *    the key set and are emitted directly with no join at all; only the
  *    ~(match + fpp) "maybe" rows go through the exact anti join.
  *
  * This is the same machinery Spark's AQE runtime row-level filtering
  * injects for shuffle joins (`BloomFilterAggregate` +
  * `BloomFilterMightContain`, both codegen'd), exposed as an explicit
  * operator so the filter also applies to broadcast-join plans and the
  * sizing is caller-controlled. The filter build is one map-side-combinable
  * aggregation over the small side (partial filters OR-merge in the
  * executor tree); only the final `numBits/8`-byte filter reaches the
  * driver, and it ships back to executors as a literal.
  *
  * Reference scope note: the reference engine has no joins at all
  * (SURVEY §2.B) — this is a beyond-reference scale operator.
  */
object BloomJoin {

  /** Optimal Bloom bit count for `n` items at false-positive rate `fpp`:
    * `-n·ln(p)/ln(2)²` (standard Bloom sizing). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Serialized Bloom filter over `small(keyCol)` (xxhash64 of the key, the
    * same hashing Spark's runtime filters use). `None` when the small side
    * has no rows — the aggregate returns NULL, and an empty key set is a
    * legal input (e.g. decontamination where no probe keys survive an
    * upstream filter), not an error. */
  private def buildFilter(small: DataFrame, keyCol: String,
                          expectedItems: Long, fpp: Double): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
    Option(small
      .select(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0))
  }

  /** `might_contain(filter, xxhash64(key))` as a big-side scan predicate. */
  private def mightContain(bytes: Array[Byte], keyCol: String) =
    Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(xxhash64(col(keyCol)))))

  /** Exact semi join `big ⋉ small` with a Bloom prefilter on the big side.
    * Result is bit-identical to `big.join(small, keys, "leftsemi")`; the
    * filter only thins what reaches the join. `expectedItems` should be
    * ≳ the small side's distinct key count (undersizing only raises the
    * false-positive rate, never drops rows). */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
               expectedItems: Long = 1 << 20, fpp: Double = 0.03): DataFrame = {
    requireKeys(big, bigKey, small, smallKey)
    buildFilter(small, smallKey, expectedItems, fpp) match {
      // empty key set: a plain leftsemi returns no rows
      case None => big.filter(lit(false))
      case Some(bytes) =>
        big.filter(mightContain(bytes, bigKey))
          .join(small, big(bigKey) === small(smallKey), "leftsemi")
    }
  }

  /** Exact anti join `big ▷ small` with a Bloom shortcut: filter-rejected
    * rows are emitted directly (no false negatives ⇒ definitely absent);
    * only "maybe" rows pay the exact anti join. Result is bit-identical to
    * `big.join(small, keys, "leftanti")` for non-null keys; null big-side
    * keys are kept (same as left-anti's null semantics, asserted in spec). */
  def antiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
               expectedItems: Long = 1 << 20, fpp: Double = 0.03): DataFrame = {
    requireKeys(big, bigKey, small, smallKey)
    buildFilter(small, smallKey, expectedItems, fpp) match {
      // empty key set: a plain leftanti keeps every big-side row
      case None => big
      case Some(bytes) =>
        // xxhash64 is null-safe (hashes a null to the running seed, never
        // returns null), so `maybe` is total: a null big-side key lands in
        // whichever branch its hash draws — the definite-no branch emits it,
        // the join branch keeps it (null never equals a key) — matching
        // left-anti's keep-nulls semantics either way.
        val maybe = mightContain(bytes, bigKey)
        val definiteNo = big.filter(!maybe)
        val checked = big.filter(maybe)
          .join(small, big(bigKey) === small(smallKey), "leftanti")
        definiteNo.unionAll(checked)
    }
  }

  /** Resolve both key columns up front so a misspelled key fails analysis
    * consistently — the empty-small-side short-circuits never reference the
    * keys, and would otherwise succeed silently. */
  private def requireKeys(big: DataFrame, bigKey: String,
                          small: DataFrame, smallKey: String): Unit = {
    val _ = (big(bigKey), small(smallKey))
  }
}
