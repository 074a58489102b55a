package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Result-equality specs for the bounded-heap [[TopKBy]] and single-entry
  * [[ArgMinBy]] aggregates against the ranking-window plans they replace —
  * same ordering, same tie-breaks, bit-identical ords — plus the plan
  * assertions that they aggregate map-side with no sort. */
class TopKArgMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 groups × 50 candidates with engineered ord ties (ord = i/8 truncated)
  // so the id tie-break is actually exercised; ids unique per group
  private def candidates() =
    (0 until 4).flatMap { g =>
      (0 until 50).map { i => (g.toLong, (i / 8).toDouble, i.toLong, (100 + i).toLong) }
    }.toDF("grp", "ord", "id", "tag").repartition(4)

  test("topk_by ascending equals the row_number window (ties included)") {
    val df = candidates()
    val viaAgg = TopKBy.rankAscending(df, "grp", "ord", "id", k = 7)
      .select("grp", "id", "ord", "rank")
    val w = Window.partitionBy("grp").orderBy(col("ord"), col("id"))
    val viaWin = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7).select("grp", "id", "ord", "rank")
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
  }

  test("topk_by descending equals the desc window and returns ords bit-exactly") {
    val df = candidates()
    val viaAgg = TopKBy.rankDescending(df, "grp", "ord", "id", k = 5)
      .select("grp", "id", "ord", "rank")
    val w = Window.partitionBy("grp").orderBy(col("ord").desc, col("id"))
    val viaWin = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5).select("grp", "id", "ord", "rank")
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
  }

  test("topk_by carries the tag channel through the heap") {
    val out = TopKBy.rankAscending(candidates(), "grp", "ord", "id", k = 3,
      tagCol = Some("tag")).collect()
    assert(out.length === 12)
    out.foreach { r => assert(r.getAs[Long]("tag") === 100 + r.getAs[Long]("id")) }
  }

  test("topk_by k larger than the group returns the whole group ranked") {
    val df = Seq((1L, 2.0, 10L, 0L), (1L, 1.0, 11L, 0L)).toDF("grp", "ord", "id", "tag")
    val out = TopKBy.rankAscending(df, "grp", "ord", "id", k = 99)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(11L, 10L))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }

  test("topk_by keeps duplicate (ord,id) rows like row_number does") {
    val df = Seq((1L, 1.0, 5L, 0L), (1L, 1.0, 5L, 0L), (1L, 2.0, 6L, 0L))
      .toDF("grp", "ord", "id", "tag")
    val out = TopKBy.rankAscending(df, "grp", "ord", "id", k = 2).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Long]("id") === 5L))
  }

  test("topk_by aggregates map-side (partial before the exchange), no Window") {
    val p = TopKBy.rankAscending(candidates(), "grp", "ord", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_by"), s"expected a partial topk aggregate:\n$p")
    assert(!p.contains("Window"), s"expected no ranking window:\n$p")
    assert(!p.contains("SortAggregate"), s"expected hash-based aggregation:\n$p")
  }

  test("argmin_by equals the window argmin, ties to the lowest id, payload intact") {
    val df = (0 until 100).map { i =>
      // 20 vectors × 5 candidates; distances collide (i/2) within a vector
      // every other row so the id tie-break decides
      (i / 5L, (i % 5 / 2).toDouble, (i % 5).toLong, Array((i % 5).toFloat, i.toFloat))
    }.toDF("vec", "d", "cid", "payload").repartition(4)
    val viaAgg = df.groupBy(col("vec"))
      .agg(ArgMinBy.argminBy(col("d"), col("cid"), col("payload")).as("b"))
      .select(col("vec"), col("b.id").as("cid"), col("b.payload").as("payload"))
    val w = Window.partitionBy("vec").orderBy(col("d"), col("cid"))
    val viaWin = df.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select("vec", "cid", "payload")
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
  }

  test("argmin_by plans ObjectHashAggregate with a map-side partial — no sort, no window") {
    val df = Seq((1L, 1.0, 2L, Array(1f))).toDF("vec", "d", "cid", "payload")
    val p = df.groupBy(col("vec"))
      .agg(ArgMinBy.argminBy(col("d"), col("cid"), col("payload")).as("b"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$p")
    assert(p.contains("partial_argmin_by"), s"expected a partial argmin aggregate:\n$p")
    assert(!p.contains("SortAggregate") && !p.contains("Window"),
      s"expected no sort/window:\n$p")
  }

  test("argmin_by orders NaN last and −0.0 before 0.0, like SQL sort") {
    val df = Seq(
      (1L, Double.NaN, 1L, Array(1f)),
      (1L, 0.0, 2L, Array(2f)),
      (1L, -0.0, 3L, Array(3f)),
      (2L, Double.NaN, 9L, Array(9f))).toDF("vec", "d", "cid", "payload")
    val out = df.groupBy(col("vec"))
      .agg(ArgMinBy.argminBy(col("d"), col("cid"), col("payload")).as("b"))
      .select(col("vec"), col("b.id").as("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 3L) // −0.0 < 0.0 < NaN
    assert(out(2L) === 9L) // NaN-only group still yields its row
  }

  test("topk_by buffer serialization round-trips") {
    val buf = new TopKBuffer(3)
    buf.add(3.0, 1L, 10L); buf.add(1.0, 2L, 20L); buf.add(2.0, 3L, 30L); buf.add(0.5, 4L, 40L)
    val back = TopKBuffer.deserialize(3, buf.serialized)
    assert(back.sortedAscending.toSeq === buf.sortedAscending.toSeq)
    assert(back.sortedAscending.map(_.id).toSeq === Seq(4L, 2L, 3L))
  }

  test("argmin_by buffer serialization round-trips (including empty)") {
    val buf = new ArgMinBuffer()
    buf.offer(2.0, 7L, Array(1f, 2f))
    buf.offer(1.0, 9L, Array(3f, 4f))
    val back = ArgMinBuffer.deserialize(buf.serialized)
    assert(back.has && back.ord === 1.0 && back.id === 9L)
    assert(back.payload.toSeq === Seq(3f, 4f))
    assert(!ArgMinBuffer.deserialize(new ArgMinBuffer().serialized).has)
  }

  test("topk_by via SQL registration") {
    candidates().createOrReplaceTempView("topk_cands")
    val out = spark.sql(
      """SELECT grp, topk_by(ord, id, tag, 2) AS top
        |FROM topk_cands GROUP BY grp""".stripMargin).collect()
    assert(out.length === 4)
    assert(out.forall(_.getSeq[Any](1).length === 2))
  }
}
