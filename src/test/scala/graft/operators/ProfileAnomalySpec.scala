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

  test("columnProfileHll: same report shape, estimates near truth, all-null safe") {
    val df = (1 to 3000).map(i => (i.toLong, s"c${i % 9}",
        Option.empty[String])).toDF("id", "cat", "dead")
    val p = Profile.columnProfileHll(df, Seq("id", "cat", "dead"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").schema.fieldNames.toSeq ===
      Seq("col_name", "n_rows", "n_nulls", "min_value", "max_value", "n_distinct_est"))
    // 3000 distinct at m=256 registers: ~6.5% sigma, allow 3 sigma
    assert(math.abs(p("id").getDouble(5) - 3000.0) / 3000.0 < 0.20)
    // 9 distinct -> linear-counting branch, near-exact
    assert(math.abs(p("cat").getDouble(5) - 9.0) < 2.0)
    // all-null column: empty registers estimate 0 (256 * ln(1))
    assert(p("dead").getDouble(5) === 0.0)
    assert(p("dead").getLong(2) === 3000L)
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

  test("columnProfile approxDistinct: exact below k, estimate near truth above k") {
    val df = (1L to 500L).map(i => (i, (i % 7).toString)).toDF("id", "cat")
    val p = Profile.columnProfile(df, Seq("id", "cat"),
        approxDistinct = true, sketchK = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("n_distinct_est")).toMap
    assert(p("cat") === 7.0) // below k → sketch is exact
    // 500 distinct ids through a k=64 sketch: RSE ≈ 1/sqrt(k−2) ≈ 13%
    assert(math.abs(p("id") - 500.0) <= 200.0, s"estimate ${p("id")} too far from 500")
    // the approx report renames the column so shapes are never confused
    val cols = Profile.columnProfile(df, Seq("id"), approxDistinct = true).columns
    assert(cols.contains("n_distinct_est") && !cols.contains("n_distinct"))
  }

  test("equalFrequencyBins fails loudly on a null metric value") {
    val df = Seq((Some(1.0), "g"), (None, "g"), (Some(3.0), "g"), (Some(4.0), "g"))
      .toDF("v", "grp")
    val e = intercept[Exception] {
      Profile.equalFrequencyBins(df, "v", Seq("grp"), nBins = 2).collect()
    }
    assert(e.getMessage.contains("equalFrequencyBins"), e.getMessage)
  }

  test("approx equalFrequencyBins: at high accuracy, bins within one slot of exact") {
    val df = (0 until 400).map(i => (i.toDouble, s"g${i % 2}")).toDF("v", "grp")
    val exact = Profile.equalFrequencyBins(df, "v", Seq("grp"), nBins = 4)
      .select("v", "grp", "bin")
    val approx = Profile.equalFrequencyBins(df, "v", Seq("grp"), nBins = 4,
        approx = true, accuracy = 10000)
      .select(col("v"), col("grp"), col("bin").as("bin_a"))
    val joined = exact.join(approx, Seq("v", "grp")).collect()
    assert(joined.length === 400)
    // sketch error at accuracy 10000 over 200 rows/group: edges are exact
    // data values ≤ 1 rank away — a row can move at most one bin
    assert(joined.forall(r =>
      math.abs(r.getAs[Int]("bin") - r.getAs[Int]("bin_a")) <= 1))
    val agree = joined.count(r => r.getAs[Int]("bin") == r.getAs[Int]("bin_a"))
    assert(agree >= 380, s"only $agree/400 rows agree with the exact bins")
  }

  test("approx iqrOutliers: fences within one data step of exact, flags near-identical") {
    val df = ((0 until 200).map(_.toDouble) ++ Seq(1000.0, -1000.0))
      .map(v => (v, "g")).toDF("v", "grp")
    val exact = Anomaly.iqrOutliers(df, "v", Seq("grp"))
      .select("v", "lo_bound", "hi_bound", "is_outlier")
    val approx = Anomaly.iqrOutliers(df, "v", Seq("grp"), approx = true)
      .select(col("v"), col("lo_bound").as("lo_a"), col("hi_bound").as("hi_a"),
        col("is_outlier").as("out_a"))
    val j = exact.join(approx, "v").collect()
    assert(j.length === 202)
    // exact quartiles interpolate; the sketch returns a neighbor value ≤ 1
    // rank away — with unit-spaced data and k=1.5 the fence moves ≤ 2.5
    j.foreach { r =>
      assert(math.abs(r.getAs[Double]("lo_bound") - r.getAs[Double]("lo_a")) <= 2.5)
      assert(math.abs(r.getAs[Double]("hi_bound") - r.getAs[Double]("hi_a")) <= 2.5)
    }
    val agree = j.count(r => r.getAs[Boolean]("is_outlier") == r.getAs[Boolean]("out_a"))
    assert(agree >= 200, s"only $agree/202 flags agree")
    // the planted extremes must flag under either path
    val flagged = j.filter(_.getAs[Boolean]("out_a")).map(_.getAs[Double]("v")).toSet
    assert(flagged.contains(1000.0) && flagged.contains(-1000.0))
  }

  test("approx iqrOutliers aggregates with bounded sketch state (partial before exchange)") {
    val df = Seq((1.0, "g")).toDF("v", "grp")
    val p = Anomaly.iqrOutliers(df, "v", Seq("grp"), approx = true)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_percentile_approx"),
      s"expected a map-side partial approx-percentile:\n$p")
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

  test("madOutliers: textbook modified z, immune to the outlier itself") {
    // median of (1..9, 1000) = 5.5; deviations 0.5..4.5 and 994.5 →
    // MAD = median(0.5,1.5,...,4.5,994.5) = 2.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("grp", "v")
    val out = Anomaly.madOutliers(df, "v", Seq("grp"), threshold = 3.5)
      .collect().map(r => r.getDouble(1) ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Double]("robust_z"), r.getAs[Boolean]("is_outlier"))).toMap
    assert(out(1000.0)._1 === 5.5 && out(1000.0)._2 === 2.5)
    assert(out(1000.0)._3 === (1000.0 - 5.5) / (1.4826 * 2.5))
    assert(out(1000.0)._4, "the planted outlier must flag")
    assert((1 to 9).forall(i => !out(i.toDouble)._4),
      "inliers must survive a 1000x outlier in the group")
    // symmetric signs
    assert(out(1.0)._3 < 0.0 && out(9.0)._3 > 0.0)
  }

  test("madOutliers: MAD = 0 emits robust_z 0 and never flags") {
    val df = (Seq.fill(6)(7.0) :+ 9.0).map(("g", _)).toDF("grp", "v")
    val out = Anomaly.madOutliers(df, "v", Seq("grp")).collect()
    assert(out.forall(!_.getAs[Boolean]("is_outlier")))
    assert(out.forall(_.getAs[Double]("robust_z") === 0.0))
  }

  test("approx madOutliers: medians within one data step of exact") {
    val df = (1 to 2000).map(i => ("g", (i % 97).toDouble)).toDF("grp", "v")
    val exact = Anomaly.madOutliers(df, "v", Seq("grp"))
      .select("med", "mad").distinct().collect().head
    val approx = Anomaly.madOutliers(df, "v", Seq("grp"), approx = true,
        accuracy = 10000)
      .select("med", "mad").distinct().collect().head
    assert(math.abs(exact.getDouble(0) - approx.getDouble(0)) <= 1.0)
    assert(math.abs(exact.getDouble(1) - approx.getDouble(1)) <= 1.0)
  }

  test("cusum: hand trace — small persistent shift accumulates and flags") {
    val xs = Seq(5.0, 5.0, 5.0, 9.0, 9.0, 9.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("grp", "seq", "v")
    val out = Anomaly.cusum(df, "v", Seq("grp"), Seq("seq"),
        target = 5.0, slack = 1.0, threshold = 5.0)
      .collect().map(r => r.getAs[Long]("seq") ->
        ((r.getAs[Double]("cusum_hi"), r.getAs[Boolean]("is_shift")))).toMap
    assert(out(0L) === ((0.0, false)) && out(2L) === ((0.0, false)))
    assert(out(3L) === ((3.0, false)))
    assert(out(4L) === ((6.0, true)))
    assert(out(5L) === ((9.0, true)))
  }

  test("cusum: matches the direct max(0, .) recurrence on a mixed series") {
    val xs = Seq(3.0, 8.0, 2.0, 9.0, 9.0, 1.0, 5.0, 9.0, 0.0, 9.0, 9.0, 9.0)
    val (target, slack) = (5.0, 0.5)
    val expHi = xs.scanLeft(0.0)((s, x) =>
      math.max(0.0, s + (x - target - slack))).tail
    val expLo = xs.scanLeft(0.0)((s, x) =>
      math.max(0.0, s + (target - x - slack))).tail
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      .toDF("grp", "seq", "v")
    val out = Anomaly.cusum(df, "v", Seq("grp"), Seq("seq"),
        target, slack, threshold = 4.0, scale = 1)
      .collect().sortBy(_.getAs[Long]("seq"))
    assert(out.map(_.getAs[Double]("cusum_hi")).toSeq === expHi)
    assert(out.map(_.getAs[Double]("cusum_lo")).toSeq === expLo)
  }

  test("cusum: downward drift flags the low side; layout-independent") {
    val xs = (1 to 50).map(i => if (i > 30) 2.0 else 5.0)
    val df = xs.zipWithIndex.map { case (x, i) => (s"g${i % 2}", i.toLong, x) }
      .toDF("grp", "seq", "v")
    val a = Anomaly.cusum(df, "v", Seq("grp"), Seq("seq"), 5.0, 0.5, 6.0)
      .collect().map(r => (r.getString(0), r.getAs[Long]("seq")) -> r.toSeq).toMap
    assert(a.exists { case (_, s) => s.last == true },
      "sustained low shift must flag")
    val b = Anomaly.cusum(df.repartition(7), "v", Seq("grp"), Seq("seq"),
        5.0, 0.5, 6.0)
      .collect().map(r => (r.getString(0), r.getAs[Long]("seq")) -> r.toSeq).toMap
    assert(a === b)
  }

  test("benford: digit extraction, spine zeros, and probability law") {
    // values 1..9 once each plus an extra 1 → digit 1 has n=2
    val df = ((1 to 9).map(_.toDouble) :+ 1.0).map(("g", _)).toDF("grp", "v")
    val out = Anomaly.benford(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getAs[Long]("n"),
        r.getAs[Double]("p_obs"), r.getAs[Double]("p_benford")))).toMap
    assert(out.keySet === (1 to 9).toSet)
    assert(out(1)._1 === 2L && out(1)._2 === 0.2)
    assert(out(9)._1 === 1L)
    // law: p(1) ≈ .301, p(9) ≈ .0458, sums to 1
    assert(math.abs(out(1)._3 - 0.3010299957) < 1e-9)
    assert(math.abs((1 to 9).map(out(_)._3).sum - 1.0) < 1e-8)
    // scaled decimals: 0.23 at scale 2 → 23 → digit 2
    val df2 = Seq(("g", 0.23)).toDF("grp", "v")
    val d2 = Anomaly.benford(df2, "v", scale = 2).collect()
      .filter(_.getAs[Long]("n") > 0L)
    assert(d2.length === 1 && d2.head.getInt(0) === 2)
  }

  test("benford: a Benford-conforming sample scores low chi2; a capped " +
      "uniform one scores high") {
    // powers-of-2 are the classic Benford-conforming sequence
    val conforming = (0 until 200).map(i => ("g", math.pow(2.0, i % 60)))
      .toDF("grp", "v")
    val chiC = Anomaly.benford(conforming, "v").collect()
      .map(_.getAs[Double]("chi2_term")).sum
    // values uniform in [100, 200): first digit always 1
    val capped = (0 until 200).map(i => ("g", 100.0 + i % 100))
      .toDF("grp", "v")
    val chiU = Anomaly.benford(capped, "v").collect()
      .map(_.getAs[Double]("chi2_term")).sum
    assert(chiC < 16.0, s"conforming sample should pass, chi2=$chiC")
    assert(chiU > 100.0, s"capped sample must flag, chi2=$chiU")
  }

  test("benford: non-positive or null values fail loudly") {
    val bad = Seq(("g", 0.0)).toDF("grp", "v")
    val e = intercept[Exception] {
      Anomaly.benford(bad, "v").collect()
    }
    assert(e.getMessage.contains("positive") ||
      Option(e.getCause).exists(_.getMessage.contains("positive")))
  }

  test("madOutliers broadcasts both stats sides") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val plan = Anomaly.madOutliers(df, "v", Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"stats must broadcast:\n$plan")
  }

  test("grubbs: hand-computed G, suspect side, and NULL guards") {
    // 1,2,3,10: mean 4, Cxx = 200, dev = 24 (high side), G = 6/sqrt(50/3)
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 10.0),
      ("f", 5.0), ("f", 5.0), ("f", 5.0), ("s", 1.0), ("s", 2.0))
      .toDF("grp", "v")
    val out = Anomaly.grubbs(df, "v", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n") === 4L)
    assert(g.getAs[Double]("grubbs_g") ===
      (24.0 / 4.0) / math.sqrt(200.0 / (4.0 * 3.0)))
    assert(g.getAs[Double]("suspect") === 10.0)
    assert(g.getAs[String]("suspect_side") === "high")
    assert(out("f").isNullAt(out("f").fieldIndex("grubbs_g"))) // zero var
    assert(out("s").isNullAt(out("s").fieldIndex("grubbs_g"))) // n < 3
  }

  test("grubbs: low-side suspect") {
    val df = Seq(("g", -10.0), ("g", 3.0), ("g", 4.0), ("g", 5.0))
      .toDF("grp", "v")
    val r = Anomaly.grubbs(df, "v", Seq("grp")).collect().head
    assert(r.getAs[Double]("suspect") === -10.0)
    assert(r.getAs[String]("suspect_side") === "low")
  }
}
