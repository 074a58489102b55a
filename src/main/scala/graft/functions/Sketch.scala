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
