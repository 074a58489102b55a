package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** `argmin_by(ord, id, payload)` — the single smallest (ord, id) entry per
  * group, with a float-array payload riding along: returns
  * `struct<id: bigint, payload: array<float>>`.
  *
  * This is the nearest-centroid assignment kernel for k-means / PQ
  * training: per vector, pick the centroid with the smallest distance
  * (ties to the lowest centroid id) while carrying the vector's own data
  * through the aggregation so no join-back is needed.
  *
  * Why not `min(struct(ord, id, payload))`? Identical semantics — but a
  * struct-typed aggregation buffer is not UnsafeRow-mutable, so Catalyst
  * plans the declarative Min as a SortAggregate: every partition sorts its
  * corpus×k candidate rows by the grouping key, per training iteration.
  * This [[TypedImperativeAggregate]] is ObjectHashAggregate-eligible —
  * hash-based, no sort anywhere — and its state is ONE entry per group, so
  * the k candidate rows per vector collapse map-side and the exchange
  * moves one entry per vector per partition.
  *
  * Ordering contract: ascending (ord, id) with `java.lang.Double.compare`
  * semantics on ord (−0.0 < 0.0, NaN last) — identical to Spark's SQL sort
  * order, so the result matches `ORDER BY ord, id` + first-row bit-for-bit.
  * For argmax, negate ord (IEEE negation is exact). Null ord/id/payload
  * rows are skipped; payload arrays must not contain null elements.
  *
  * No reference analog (beyond-reference op; [[KmvDistinct]] pattern).
  */
case class ArgMinBy(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMinBuffer]
  with TernaryLike[Expression] {

  private def ordExpr: Expression = first
  private def idExpr: Expression = second
  private def payloadExpr: Expression = third

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ordExpr.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"argmin_by: ord must be DOUBLE, got ${ordExpr.dataType.sql}")
    } else if (idExpr.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"argmin_by: id must be BIGINT, got ${idExpr.dataType.sql}")
    } else if (payloadExpr.dataType != ArrayType(FloatType, containsNull = false) &&
               payloadExpr.dataType != ArrayType(FloatType, containsNull = true)) {
      TypeCheckResult.TypeCheckFailure(
        s"argmin_by: payload must be ARRAY<FLOAT>, got ${payloadExpr.dataType.sql}")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArgMinBy.resultType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): ArgMinBuffer = new ArgMinBuffer()

  override def update(buffer: ArgMinBuffer, input: InternalRow): ArgMinBuffer = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    // compare BEFORE touching the payload: the losing candidates (k−1 of k
    // rows) never evaluate or copy their float array
    if (o != null && i != null &&
        buffer.wouldAccept(o.asInstanceOf[Double], i.asInstanceOf[Long])) {
      val p = payloadExpr.eval(input)
      if (p != null) {
        buffer.offer(o.asInstanceOf[Double], i.asInstanceOf[Long],
          p.asInstanceOf[ArrayData].toFloatArray())
      }
    }
    buffer
  }

  override def merge(buffer: ArgMinBuffer, other: ArgMinBuffer): ArgMinBuffer = {
    if (other.has) buffer.offer(other.ord, other.id, other.payload)
    buffer
  }

  override def eval(buffer: ArgMinBuffer): Any =
    if (!buffer.has) null
    else InternalRow(buffer.id, UnsafeArrayData.fromPrimitiveArray(buffer.payload))

  override def serialize(buffer: ArgMinBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): ArgMinBuffer =
    ArgMinBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMinBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMinBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ArgMinBy =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "argmin_by"
}

/** The current best (smallest (ord, id)) entry — one entry of state. */
final class ArgMinBuffer {
  var has: Boolean = false
  var ord: Double = 0.0
  var id: Long = 0L
  var payload: Array[Float] = null

  def wouldAccept(o: Double, i: Long): Boolean = !has || {
    val c = java.lang.Double.compare(o, ord)
    c < 0 || (c == 0 && i < id)
  }

  def offer(o: Double, i: Long, p: Array[Float]): Unit =
    if (wouldAccept(o, i)) { has = true; ord = o; id = i; payload = p }

  def serialized: Array[Byte] = {
    if (!has) return Array[Byte](0)
    val bb = ByteBuffer.allocate(1 + 8 + 8 + 4 + 4 * payload.length)
    bb.put(1.toByte)
    bb.putDouble(ord); bb.putLong(id); bb.putInt(payload.length)
    payload.foreach(bb.putFloat)
    bb.array()
  }
}

object ArgMinBuffer {
  def deserialize(bytes: Array[Byte]): ArgMinBuffer = {
    val buf = new ArgMinBuffer()
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 1.toByte) {
      val o = bb.getDouble; val i = bb.getLong
      val p = new Array[Float](bb.getInt)
      var j = 0
      while (j < p.length) { p(j) = bb.getFloat; j += 1 }
      buf.offer(o, i, p)
    }
    buf
  }
}

object ArgMinBy {
  val resultType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Column API — usable without SQL registration. */
  def argminBy(ord: Column, id: Column, payload: Column): Column =
    ExpressionUtils.column(ArgMinBy(
      ExpressionUtils.expression(ord), ExpressionUtils.expression(id),
      ExpressionUtils.expression(payload)).toAggregateExpression())
}
