package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("histogram: fixed-width bins, clamped edges, nulls excluded") {
    val df = Seq(Some(-5.0), Some(0.0), Some(9.9), Some(10.0), Some(25.0),
      Some(99.9), Some(100.0), Some(250.0), None)
      .toDF("v")
    val h = Profile.histogram(df, "v", lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -5 clamps into bin 0; 100 and 250 clamp into bin 9; null dropped
    assert(h(0L) === 3L) // -5.0, 0.0, 9.9
    assert(h(1L) === 1L) // 10.0
    assert(h(2L) === 1L) // 25.0
    assert(h(9L) === 3L) // 99.9, 100.0, 250.0
    assert(h.values.sum === 8L)
    intercept[IllegalArgumentException] {
      Profile.histogram(df, "v", 10.0, 10.0, 5)
    }
  }

  test("columnProfile: counts, nulls, min/max, distinct per column") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (3L, Some("a")))
      .toDF("id", "s")
    val p = Profile.columnProfile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L)
    assert(id.getString(3) === "1" && id.getString(4) === "3")
    assert(id.getLong(5) === 3L)
    val s = p("s")
    assert(s.getLong(2) === 1L) // one null
    assert(s.getLong(5) === 2L) // distinct ignores null
  }

  test("zscoreOutliers: textbook z values and sigma=0 safety") {
    // group g: values 1..5 -> mu=3, sigma=sqrt(2); group h: constant
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("grp", "v")
      .union(Seq(("h", 7.0), ("h", 7.0)).toDF("grp", "v"))
    val out = Anomaly.zscoreOutliers(df, "v", Seq("grp"), threshold = 1.2)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    val s = math.sqrt(2.0)
    assert(math.abs(out(("g", 1.0))._1 - (-2.0 / s)) < 1e-12)
    assert(out(("g", 1.0))._2 === true)   // |z|=1.414 > 1.2
    assert(out(("g", 3.0)) === ((0.0, false)))
    assert(out(("h", 7.0)) === ((0.0, false))) // sigma=0 never flags
  }

  test("equalFrequencyBins: quartiles balance counts; ties fall low") {
    // 1..8 in one group: edges 2.75 / 4.5 / 6.25 -> two values per bin
    val df = (1 to 8).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Profile.equalFrequencyBins(df, "v", Seq("grp"), nBins = 4)
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(out === Map(1.0 -> 0, 2.0 -> 0, 3.0 -> 1, 4.0 -> 1,
      5.0 -> 2, 6.0 -> 2, 7.0 -> 3, 8.0 -> 3))
    // a value exactly on an edge goes to the LOWER bin
    val tie = Seq(("h", 1.0), ("h", 2.0), ("h", 3.0)).toDF("grp", "v")
    val t = Profile.equalFrequencyBins(tie, "v", Seq("grp"), nBins = 2)
      .collect().map(r => r.getDouble(1) -> r.getInt(2)).toMap
    assert(t(2.0) === 0) // median == 2.0, not exceeded
    intercept[IllegalArgumentException] {
      Profile.equalFrequencyBins(df, "v", Seq("grp"), nBins = 1)
    }
  }

  test("iqrOutliers: textbook Tukey fences, robust to the outlier itself") {
    // group g: 1..11 plus a wild 1000 -> q1/q3 from the 12 sorted values
    val vals = (1 to 11).map(_.toDouble) :+ 1000.0
    val df = vals.map(("g", _)).toDF("grp", "v")
    val out = Anomaly.iqrOutliers(df, "v", Seq("grp"), k = 1.5)
      .collect().map(r => r.getDouble(1) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    // sorted: 1..11,1000; q1 = 3.75 (idx 2.75), q3 = 9.25 (idx 8.25)
    val q1 = 3.75; val q3 = 9.25; val iqr = q3 - q1
    assert(out(5.0)._1 === q1 - 1.5 * iqr)
    assert(out(5.0)._2 === q3 + 1.5 * iqr)
    assert(out(1000.0)._3 === true)   // the wild point flags
    assert(out(1.0)._3 === false)     // 1.0 > 3.75 - 8.25 = -4.5
    assert(out(11.0)._3 === false)    // 11 < 9.25 + 8.25 = 17.5
  }

  test("iqrOutliers broadcasts the bounds side") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val plan = Anomaly.iqrOutliers(df, "v", Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("zscoreOutliers broadcasts the stats side") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val plan = Anomaly.zscoreOutliers(df, "v", Seq("grp"), 3.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}
