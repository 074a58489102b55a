package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, "p1"), (1L, 99L, "p2"), (2L, 10L, "p3"), (1L, 130L, "p4"))
    .toDF("p_key", "p_t", "p_tag")

  private lazy val intervals = Seq(
    (1L, 5L, 15L, "i1"),     // contains p1
    (1L, 10L, 10L, "i2"),    // degenerate, contains p1 (inclusive both ends)
    (1L, 90L, 200L, "i3"),   // spans buckets; contains p2 and p4
    (2L, 0L, 50L, "i4"))     // other key; contains p3 only
    .toDF("i_key", "i_s", "i_e", "i_tag")

  test("point-in-interval matches are exact, inclusive, keyed, duplicate-free") {
    for (w <- Seq(1L, 7L, 64L, 1000L)) { // result must be bucket-width independent
      val out = RangeJoin.rangeJoin(points, intervals, "p_key", "i_key", "p_t", "i_s", "i_e", w)
        .select("p_tag", "i_tag").collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(out === Seq("p1" -> "i1", "p1" -> "i2", "p2" -> "i3", "p3" -> "i4", "p4" -> "i3").sorted,
        s"bucketWidth=$w")
    }
  }

  test("range join rejects inputs that use the reserved bucket column") {
    val bad = points.withColumnRenamed("p_tag", "__b")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(bad, intervals, "p_key", "i_key", "p_t", "i_s", "i_e", 16)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("matches the naive non-equi join exactly") {
    val naive = points.join(intervals,
        $"p_key" === $"i_key" && $"p_t" >= $"i_s" && $"p_t" <= $"i_e")
      .select("p_tag", "i_tag").collect().map(_.toSeq).toSet
    val bucketed = RangeJoin.rangeJoin(points, intervals, "p_key", "i_key", "p_t", "i_s", "i_e", 16)
      .select("p_tag", "i_tag").collect().map(_.toSeq).toSet
    assert(bucketed === naive)
  }

  test("overlapCounts equals rangeJoin's per-point group counts (incl. zero)") {
    val counted = RangeJoin.overlapCounts(points, intervals,
        "p_key", "i_key", "p_t", "i_s", "i_e")
      .select("p_tag", "n_overlapping")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // p1 in i1+i2, p2 in i3, p3 in i4, p4 in i3
    assert(counted === Map("p1" -> 2L, "p2" -> 1L, "p3" -> 1L, "p4" -> 1L))
    // a point covered by nothing still comes back, with 0
    val lonely = Seq((1L, 5000L, "p5")).toDF("p_key", "p_t", "p_tag")
    val zero = RangeJoin.overlapCounts(lonely, intervals,
        "p_key", "i_key", "p_t", "i_s", "i_e")
      .select("n_overlapping").head().getLong(0)
    assert(zero === 0L)
  }

  test("overlapCounts boundary semantics: closed interval on both ends") {
    val pts = Seq((9L, 10L, "on_start"), (9L, 20L, "on_end"), (9L, 21L, "after"))
      .map { case (k, t, tag) => (k, t, tag) }.toDF("p_key", "p_t", "p_tag")
    val ivs = Seq((9L, 10L, 20L, "iv")).toDF("i_key", "i_s", "i_e", "i_tag")
    val got = RangeJoin.overlapCounts(pts, ivs, "p_key", "i_key", "p_t", "i_s", "i_e")
      .select("p_tag", "n_overlapping")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("on_start" -> 1L, "on_end" -> 1L, "after" -> 0L))
  }

  test("property: overlapCounts equals the naive join on random instances") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val pts = (1 to 300).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(200).toLong, s"p$i")
      }.toDF("p_key", "p_t", "p_tag")
      val ivs = (1 to 200).map { i =>
        val s = rnd.nextInt(200)
        (rnd.nextInt(5).toLong, s.toLong, (s + rnd.nextInt(30)).toLong, s"i$i")
      }.toDF("i_key", "i_s", "i_e", "i_tag")
      val naive = pts.join(ivs,
          $"p_key" === $"i_key" && $"p_t" >= $"i_s" && $"p_t" <= $"i_e")
        .groupBy("p_tag").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val swept = RangeJoin.overlapCounts(pts, ivs,
          "p_key", "i_key", "p_t", "i_s", "i_e")
        .select("p_tag", "n_overlapping")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // naive drops zero-coverage points; sweep keeps them with 0
      assert(swept.filter(_._2 > 0L) === naive, s"trial $trial")
      assert(swept.size === 300, s"trial $trial: all points must come back")
    }
  }

  test("inverted intervals (start > end) match nothing, like BETWEEN") {
    val ivs = Seq(
      (1L, 15L, 5L, "inv"),   // inverted — BETWEEN matches nothing
      (1L, 5L, 15L, "ok"))    // contains p1
      .toDF("i_key", "i_s", "i_e", "i_tag")
    val joined = RangeJoin.rangeJoin(points, ivs, "p_key", "i_key", "p_t", "i_s", "i_e", 8)
      .select("p_tag", "i_tag").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(joined === Seq("p1" -> "ok"))
    // the sweep must not let the inverted interval's end marker SUBTRACT
    // coverage it never added (p1 sat between the two markers)
    val counts = RangeJoin.overlapCounts(points, ivs, "p_key", "i_key", "p_t", "i_s", "i_e")
      .select("p_tag", "n_overlapping")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts === Map("p1" -> 1L, "p2" -> 0L, "p3" -> 0L, "p4" -> 0L))
  }

  test("overlapCounts plans a single keyed window pass, no join") {
    val p = RangeJoin.overlapCounts(points, intervals,
        "p_key", "i_key", "p_t", "i_s", "i_e")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"sweep must not plan a join:\n$p")
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected one keyed exchange:\n$p")
  }
}
