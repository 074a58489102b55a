package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{col, lit, negate, posexplode}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k: the smallest `k` (ord, id, tag) entries per
  * group, ordered ascending by (ord, id, tag), returned as a sorted array.
  *
  * Scale design (the reason this exists next to
  * `row_number().over(Window.partitionBy(g).orderBy(ord))`): the ranking
  * window materializes EVERY candidate row of a group in one partition and
  * sorts it — for a kNN query set that means each query's partition holds
  * its entire scored corpus slice, a handful of giant single-partition
  * sorts at 100 TB. This aggregate's state is AT MOST k entries per group,
  * it combines map-side (partial aggregation before the exchange), and the
  * shuffle moves k×24 bytes per partition per group — corpus size never
  * appears in the shuffle or sort volume.
  *
  * Ordering contract: ascending by (ord, id, tag) with
  * `java.lang.Double.compare` semantics on ord (−0.0 < 0.0, NaN last) —
  * identical to Spark's SQL sort order, so results match the
  * `ORDER BY ord, id` window bit-for-bit. For descending rankings negate
  * the ord on the way in and back out (IEEE negation is exact and
  * involutive, so the recovered ord is bit-identical). Duplicate
  * (ord, id, tag) triples are kept (heap, not a set), matching
  * `row_number` over duplicate rows. Null ord/id/tag rows are skipped.
  *
  * No reference analog (beyond-reference op; same
  * [[TypedImperativeAggregate]] pattern as [[KmvDistinct]]).
  *
  * @param first  ord — the ranking key (DoubleType)
  * @param second id — the unique per-candidate tie-breaker (LongType)
  * @param third  tag — an opaque payload carried with each entry, compared
  *               only after (ord, id) (LongType; pass 0 when unused)
  * @param fourth k — heap bound (foldable positive int literal)
  */
case class TopKBy(
    first: Expression,
    second: Expression,
    third: Expression,
    fourth: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with QuaternaryLike[Expression] {

  private def ordExpr: Expression = first
  private def idExpr: Expression = second
  private def tagExpr: Expression = third
  private def kExpr: Expression = fourth

  lazy val k: Int = {
    require(kExpr.foldable, "topk_by(ord, id, tag, k): k must be a literal")
    val v = kExpr.eval() match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(
        s"topk_by(ord, id, tag, k): k must be an integer literal, got $other")
    }
    require(v >= 1, s"topk_by(ord, id, tag, k): k must be >= 1, got $v")
    v
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ordExpr.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: ord must be DOUBLE, got ${ordExpr.dataType.sql}")
    } else if (idExpr.dataType != LongType || tagExpr.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: id and tag must be BIGINT, got " +
          s"${idExpr.dataType.sql} and ${tagExpr.dataType.sql}")
    } else if (!Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(kExpr.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: k must be an integer literal, got ${kExpr.dataType.sql}")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = TopKBy.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    // cheap (ord, id) pre-filter against the current worst survivor; add()
    // re-checks with the full comparator
    if (o != null && i != null &&
        buffer.mightAccept(o.asInstanceOf[Double], i.asInstanceOf[Long])) {
      val t = tagExpr.eval(input)
      if (t != null) {
        buffer.add(o.asInstanceOf[Double], i.asInstanceOf[Long], t.asInstanceOf[Long])
      }
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedAscending
    new GenericArrayData(sorted.map(e =>
      InternalRow(e.ord, e.id, e.tag): Any))
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): TopKBy =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)

  override def prettyName: String = "topk_by"
}

final case class TopKEntry(ord: Double, id: Long, tag: Long)

/** The k smallest entries seen so far — a bounded max-heap (head = current
  * worst survivor), so every insert against a full heap is one compare and
  * at most one O(log k) sift. */
final class TopKBuffer(val k: Int) {
  private val heap = new PriorityQueue[TopKEntry](
    math.max(1, k), TopKBuffer.descending)

  /** Conservative acceptance pre-check on (ord, id) only — true whenever
    * [[add]] could change the heap (ties on (ord, id) resolve via tag in
    * add's full compare). */
  def mightAccept(ord: Double, id: Long): Boolean =
    heap.size < k || {
      val w = heap.peek()
      val c = java.lang.Double.compare(ord, w.ord)
      c < 0 || (c == 0 && id <= w.id)
    }

  def add(ord: Double, id: Long, tag: Long): Unit = {
    if (heap.size < k) { heap.offer(TopKEntry(ord, id, tag)); () }
    else {
      val worst = heap.peek()
      if (TopKBuffer.ascending.compare(TopKEntry(ord, id, tag), worst) < 0) {
        heap.poll()
        heap.offer(TopKEntry(ord, id, tag))
        ()
      }
    }
  }

  def mergeIn(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); add(e.ord, e.id, e.tag) }
  }

  def sortedAscending: Array[TopKEntry] = {
    val arr = heap.toArray(new Array[TopKEntry](heap.size))
    java.util.Arrays.sort(arr, TopKBuffer.ascending)
    arr
  }

  def serialized: Array[Byte] = {
    val entries = sortedAscending
    val bb = ByteBuffer.allocate(4 + 24 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { e => bb.putDouble(e.ord); bb.putLong(e.id); bb.putLong(e.tag) }
    bb.array()
  }
}

object TopKBuffer {
  /** (ord, id, tag) ascending; Double.compare gives Spark's SQL sort
    * semantics on ord (−0.0 < 0.0, NaN greatest). */
  val ascending: Comparator[TopKEntry] = new Comparator[TopKEntry] {
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c0 = java.lang.Double.compare(a.ord, b.ord)
      if (c0 != 0) return c0
      val c1 = java.lang.Long.compare(a.id, b.id)
      if (c1 != 0) return c1
      java.lang.Long.compare(a.tag, b.tag)
    }
  }
  val descending: Comparator[TopKEntry] = ascending.reversed()

  def deserialize(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

object TopKBy {
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("tag", LongType, nullable = false))), containsNull = false)

  /** Column API — usable without SQL registration (builds the aggregate
    * expression directly, like [[VectorFunctions.vecDot]]). */
  def topkAsc(ord: Column, id: Column, tag: Column, k: Int): Column =
    ExpressionUtils.column(TopKBy(
      ExpressionUtils.expression(ord), ExpressionUtils.expression(id),
      ExpressionUtils.expression(tag), Literal(k)).toAggregateExpression())

  /** Grouped rank by `ordCol` ascending (ties to the lower `idCol`):
    * `groupBy(groupCol).topk` + one posexplode. Output columns: groupCol,
    * idCol, ordCol, tagCol (if given), rank (1-based BIGINT) — the same
    * frame `row_number().over(partitionBy(groupCol).orderBy(ord, id))
    * .filter(rank <= k)` produces, without the per-group sort. idCol (and
    * tagCol) must be integral types (they round-trip through BIGINT). */
  def rankAscending(df: DataFrame, groupCol: String, ordCol: String,
                    idCol: String, k: Int, tagCol: Option[String] = None): DataFrame =
    ranked(df, groupCol, col(ordCol).cast("double"), back => back,
      ordCol, idCol, k, tagCol)

  /** Grouped rank by `ordCol` DESCENDING (ties to the lower `idCol`): the
    * ord is negated into the heap and negated back on output — IEEE
    * negation is exact and involutive, so the emitted ord is bit-identical
    * to the input. */
  def rankDescending(df: DataFrame, groupCol: String, ordCol: String,
                     idCol: String, k: Int, tagCol: Option[String] = None): DataFrame =
    ranked(df, groupCol, negate(col(ordCol).cast("double")), back => negate(back),
      ordCol, idCol, k, tagCol)

  private def ranked(df: DataFrame, groupCol: String, ordIn: Column,
                     ordOut: Column => Column, ordCol: String, idCol: String,
                     k: Int, tagCol: Option[String]): DataFrame = {
    val tag = tagCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    val agged = df.groupBy(col(groupCol))
      .agg(topkAsc(ordIn, col(idCol).cast("long"), tag, k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__r", "__e")))
    val base = agged.select(
      Seq(col(groupCol),
        col("__e").getField("id").as(idCol),
        ordOut(col("__e").getField("ord")).as(ordCol)) ++
      tagCol.map(t => col("__e").getField("tag").as(t)).toSeq :+
      (col("__r") + 1).cast("long").as("rank"): _*)
    base
  }
}
