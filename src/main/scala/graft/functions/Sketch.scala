package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.functions.{call_function, conv, lit, md5, substring}
import org.apache.spark.sql.types._

/** K-Minimum-Values distinct-count sketch.
  *
  * The classic KMV estimator (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002): keep the k smallest distinct values of a
  * uniform hash; if the k-th smallest normalized hash is U(k), the distinct
  * count is ≈ (k-1)/U(k). With fewer than k distinct hashes the sketch is
  * exact (it simply holds them all).
  *
  * Scale design (the reason this exists next to `COUNT(DISTINCT x)`):
  * `COUNT(DISTINCT)` shuffles every distinct value (an Expand + full
  * re-aggregation — at 100 TB that is a shuffle proportional to the key
  * cardinality). This sketch is a [[TypedImperativeAggregate]] whose state is
  * AT MOST k longs per group, combines map-side (partial aggregation), and
  * ships k*8 bytes per partition per group through the exchange — the
  * cardinality of the data never appears in the shuffle volume.
  *
  * Determinism / oracle story: the hash is NOT computed inside this
  * aggregate. Callers hash with [[Kmv.kmvHash]] — the first 60 bits of
  * `md5(cast(x AS string))` via codegen'd built-ins — so the whole pipeline
  * is engine-independent and a DuckDB oracle reproduces the estimate
  * bit-for-bit (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`, sort, limit k,
  * same double arithmetic). There is no RNG anywhere.
  *
  * No reference analog (beyond-reference op for the LLM-pipeline layer;
  * the reference's only distinct usage is `COUNT(DISTINCT ticker)`,
  * `/root/reference/examples/secure_polygon_integration.rs:92`).
  *
  * @param child a 60-bit uniform hash of the value (LongType, in
  *              `[0, 2^60)` — [[Kmv.kmvHash]] produces exactly this)
  * @param kExpr sketch size k (foldable positive int literal)
  */
case class KmvDistinct(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with BinaryLike[Expression] {

  private def child: Expression = left
  private def kExpr: Expression = right

  // analysis-time k, mirroring the indicator functions' literal-window
  // convention (reference takes window sizes the same way)
  lazy val k: Int = {
    require(kExpr.foldable, "kmv_distinct(hash, k): k must be a literal")
    val v = kExpr.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"kmv_distinct(hash, k): k must be an integer literal, got $other")
    }
    require(v > 1, s"kmv_distinct(hash, k): k must be > 1, got $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct(hash, k): hash must be BIGINT (a 60-bit uniform " +
          s"hash, e.g. Kmv.kmvHash), got ${child.dataType.sql}")
    } else if (!Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(kExpr.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct(hash, k): k must be an integer literal, got ${kExpr.dataType.sql}")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any = buffer.estimate

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvDistinct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kmv_distinct"
}

/** The k smallest distinct hashes seen so far — bounded at k longs. */
final class KmvBuffer(val k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last) { if (set.add(h)) { set.pollLast(); () } }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** (k-1)/U(k) with U(k) = kth smallest hash normalized to [0,1); exact
    * when fewer than k distinct hashes were seen. The arithmetic shape
    * (long→double cast, one division by 2^60, one division) is replicated
    * verbatim by the DuckDB oracle so results compare bit-for-bit. */
  def estimate: Double =
    if (set.size < k) set.size.toDouble
    else (k - 1).toDouble / (set.last.toDouble / Kmv.HashSpace)

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * set.size)
    bb.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object KmvBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

object Kmv {
  /** 2^60 — the hash space size [[kmvHash]] maps into. */
  val HashSpace: Double = 1152921504606846976.0

  /** 60-bit uniform hash of any value: first 15 hex digits of
    * `md5(cast(x AS string))`. Codegen'd built-ins only; DuckDB twin is
    * `CAST('0x' || substr(md5(x::VARCHAR), 1, 15) AS BIGINT)`. */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Estimated distinct count of `c` with a size-k KMV sketch. Builds the
    * aggregate directly (usable without SQL registration, like
    * [[VectorFunctions.vecDot]]); `kmv_distinct` stays registered for SQL. */
  def kmvDistinct(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge => B}
    B.column(KmvDistinct(B.expression(kmvHash(c)),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())
  }
}

/** HyperLogLog distinct-count sketch — REGISTER STATE ONLY.
  *
  * Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm" (AofA 2007). m = 2^p registers; each
  * 60-bit [[Kmv.kmvHash]] routes on its TOP p bits and contributes
  * ρ = position of the highest set bit in the remaining w = 60−p bits
  * (counted from the left, so ρ ∈ [1, w+1]; an all-zero remainder is w+1);
  * registers keep the max.
  *
  * Scale design vs [[KmvDistinct]]: KMV state is k longs and its accuracy
  * is ~1/√(k−2); HLL reaches the same accuracy in m BYTES (~1.04/√m), an
  * 8× state cut at equal k=m — the difference between shipping 2 KB and
  * 256 B per group per partition through the exchange when profiling
  * thousands of columns × groups at 100 TB. Registers max-merge, so the
  * aggregate is map-side combinable and layout-independent like every
  * sketch here.
  *
  * Determinism / oracle contract: this aggregate emits NO floating point —
  * it returns the exact integer sufficient statistics
  * `(sum_scaled, zeros)` where `sum_scaled = Σ_j 2^(rMax − M_j)`
  * (rMax = w+1, empty registers contribute 2^rMax; bounded by
  * m·2^rMax = 2^61, no overflow) and `zeros` = #empty registers. The
  * ESTIMATE — α_m·m²·2^rMax / sum_scaled, with Flajolet's small-range
  * linear-counting correction m·ln(m/zeros) when zeros > 0 and the raw
  * estimate ≤ 2.5m — is computed in SQL ON TOP of the struct, in BOTH
  * engines, with the repo's `round(ln(x), 10) + 0.0` transcendental
  * convention: every FP op runs through each engine's own SQL evaluator
  * on identical integer inputs, so the gate compares bit-for-bit without
  * this class ever choosing a float rounding. The DuckDB register twin is
  * `max(CASE WHEN rem = 0 THEN w+1 ELSE w+1 - length(bin(rem)) END)`
  * over `j = hv // 2^w, rem = hv % 2^w` — `length(bin(x))` is the bit
  * length `64 − numberOfLeadingZeros(x)` used here.
  *
  * No reference analog (beyond-reference op for the LLM-pipeline layer).
  *
  * @param left  a 60-bit uniform hash ([[Kmv.kmvHash]]), LongType
  * @param right register exponent p (foldable int literal, 4 ≤ p ≤ 16)
  */
/** Shared register machinery for the three HLL aggregates
  * ([[HllSketch]] → stats struct, [[HllRegisters]] → raw register blob,
  * [[HllMerge]] → stats struct from stored blobs). The buffer is always
  * the m-byte register vector; merge is element-wise max everywhere, so
  * partial aggregation, shuffle-side combine, and warehouse-level
  * re-aggregation are all the SAME operation. */
sealed trait HllRegisterAgg extends TypedImperativeAggregate[Array[Byte]]
  with BinaryLike[Expression] {

  protected def pExpr: Expression

  lazy val p: Int = {
    require(pExpr.foldable, s"$prettyName: p must be a literal")
    val v = pExpr.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"$prettyName: p must be an integer literal, got $other")
    }
    require(v >= 4 && v <= 16,
      s"$prettyName: p must be in [4, 16], got $v")
    v
  }

  protected lazy val m: Int = 1 << p
  protected lazy val w: Int = 60 - p // remainder bits below the register index

  protected def checkPType: TypeCheckResult =
    if (!Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(pExpr.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: p must be an integer literal, got ${pExpr.dataType.sql}")
    } else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  /** Route `h` (a 60-bit uniform hash) into its register. */
  protected final def updateHash(buffer: Array[Byte], h: Long): Unit = {
    val j = (h >>> w).toInt
    val rem = h & ((1L << w) - 1L)
    val rho =
      if (rem == 0L) w + 1
      else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    if (rho > buffer(j)) buffer(j) = rho.toByte
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  /** The `(sum_scaled, zeros)` exact-integer sufficient statistics. */
  protected final def statsRow(buffer: Array[Byte]): InternalRow = {
    val rMax = w + 1
    var sum = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1L << (rMax - buffer(i))
      if (buffer(i) == 0) zeros += 1
      i += 1
    }
    InternalRow(sum, zeros)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
}

object HllRegisterAgg {
  /** The struct the stats-emitting aggregates return. */
  val StatsType: StructType = StructType(Seq(
    StructField("sum_scaled", LongType, nullable = false),
    StructField("zeros", IntegerType, nullable = false)))
}

case class HllSketch(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HllRegisterAgg {

  private def child: Expression = left
  override protected def pExpr: Expression = right

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"hll_sketch(hash, p): hash must be BIGINT (a 60-bit uniform " +
          s"hash, e.g. Kmv.kmvHash), got ${child.dataType.sql}")
    } else checkPType
  }

  override def dataType: DataType = HllRegisterAgg.StatsType

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) updateHash(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = statsRow(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllSketch =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hll_sketch"
}

/** [[HllSketch]]'s register vector AS THE RESULT — the sketch-warehouse
  * building block: a rollup job stores one m-byte blob per (group,
  * partition key), and later queries re-aggregate the BLOBS with
  * [[HllMerge]] instead of re-scanning raw data. Distinct-over-any-slice
  * becomes a byte-vector max over pre-aggregated rows — the only way a
  * distinct rollup composes at 100 TB (exact distincts cannot roll up:
  * max/sum of per-day distinct counts is not the month's distinct). */
case class HllRegisters(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HllRegisterAgg {

  private def child: Expression = left
  override protected def pExpr: Expression = right

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"hll_registers(hash, p): hash must be BIGINT (a 60-bit uniform " +
          s"hash, e.g. Kmv.kmvHash), got ${child.dataType.sql}")
    } else checkPType
  }

  override def dataType: DataType = BinaryType

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) updateHash(buffer, v.asInstanceOf[Long])
    buffer
  }

  // copy: the returned blob escapes into row storage while the buffer
  // may keep mutating in another group slot
  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllRegisters =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hll_registers"
}

/** Union of stored [[HllRegisters]] blobs: element-wise register max, then
  * the same `(sum_scaled, zeros)` statistics as [[HllSketch]] — so
  * `hll_merge(blobs) ∘ hll_registers(hash)` over any partitioning is
  * bit-identical to `hll_sketch(hash)` over the raw rows (the rollup
  * identity the q_hll_union gate checks cross-engine). */
case class HllMerge(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HllRegisterAgg {

  private def child: Expression = left
  override protected def pExpr: Expression = right

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != BinaryType) {
      TypeCheckResult.TypeCheckFailure(
        s"hll_merge(registers, p): registers must be BINARY (an " +
          s"hll_registers blob), got ${child.dataType.sql}")
    } else checkPType
  }

  override def dataType: DataType = HllRegisterAgg.StatsType

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == m,
        s"hll_merge: register blob has ${regs.length} registers, expected m=$m — was it built at a different p?")
      merge(buffer, regs)
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = statsRow(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllMerge =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hll_merge"
}

object Hll {
  /** `(sum_scaled, zeros)` HLL register statistics of `c` at 2^p
    * registers. Builds the aggregate directly like [[Kmv.kmvDistinct]];
    * `hll_sketch` stays registered for SQL. The ESTIMATE lives in SQL —
    * see [[estimateSql]]. */
  def hllSketch(c: Column, p: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge => B}
    B.column(HllSketch(B.expression(Kmv.kmvHash(c)),
      org.apache.spark.sql.catalyst.expressions.Literal(p)).toAggregateExpression())
  }

  /** The m-byte register blob of `c` at 2^p registers — store it, then
    * re-aggregate slices with [[hllMerge]] (the sketch-warehouse rollup). */
  def hllRegisters(c: Column, p: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge => B}
    B.column(HllRegisters(B.expression(Kmv.kmvHash(c)),
      org.apache.spark.sql.catalyst.expressions.Literal(p)).toAggregateExpression())
  }

  /** `(sum_scaled, zeros)` statistics of the union of stored register
    * blobs. `hllMerge(hllRegisters(x)) ≡ hllSketch(x)` bit-for-bit. */
  def hllMerge(regs: Column, p: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge => B}
    B.column(HllMerge(B.expression(regs),
      org.apache.spark.sql.catalyst.expressions.Literal(p)).toAggregateExpression())
  }

  /** The engine-portable estimate formula over the struct's fields, as a
    * SQL fragment — IDENTICAL text runs in Spark and DuckDB (both sides
    * see the same exact-integer inputs, so the gate compares
    * bit-for-bit). Every constant is CAST(… AS DOUBLE): a bare `0.7213`
    * parses as DECIMAL in both engines and Spark then evaluates α in
    * decimal arithmetic (measured 7.5e-6 drift on the q_hll_distinct
    * estimate) — the casts pin all arithmetic to IEEE doubles in the
    * same operation order on both sides. */
  def estimateSql(sumScaled: String, zeros: String, p: Int): String = {
    val m = 1 << p
    val rMax = 61 - p
    val mD = s"CAST($m AS DOUBLE)"
    val powD = s"CAST(${1L << rMax} AS DOUBLE)" // 2^rMax, exact in double (rMax <= 57)
    val alpha = s"CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / $mD)"
    val raw = s"($alpha) * $mD * $mD * $powD / CAST($sumScaled AS DOUBLE)"
    s"""CASE WHEN $zeros > 0
       |  AND $raw <= CAST(${(5L * m) / 2} AS DOUBLE)
       |  THEN $mD * (round(ln($mD / CAST($zeros AS DOUBLE)), 10) + CAST(0.0 AS DOUBLE))
       |  ELSE $raw END""".stripMargin
  }
}
