package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeatureResampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("winsorize: tails clamp to the band, the middle passes through") {
    // group of 11 values 0..100: p10 = 10, p90 = 90 (exact interpolation)
    val df = (0 to 10).map(i => ("g", i * 10.0)).toDF("grp", "v")
    val out = Feature.winsorize(df, "v", Seq("grp"), 0.1, 0.9)
      .orderBy("v").collect().map(_.getAs[Double]("v_winsor"))
    assert(out.head === 10.0)  // 0 clamped up
    assert(out.last === 90.0)  // 100 clamped down
    assert(out(5) === 50.0)    // middle untouched
  }

  test("winsorize: approx flag keeps the shape and stays within sketch error") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val exact = Feature.winsorize(df, "v", Seq("grp"), 0.05, 0.95)
      .agg(min("v_winsor"), max("v_winsor")).collect()(0)
    val approx = Feature.winsorize(df, "v", Seq("grp"), 0.05, 0.95,
        approx = true, accuracy = 10000)
      .agg(min("v_winsor"), max("v_winsor")).collect()(0)
    assert(math.abs(exact.getDouble(0) - approx.getDouble(0)) <= 2.0)
    assert(math.abs(exact.getDouble(1) - approx.getDouble(1)) <= 2.0)
  }

  test("minMaxScale: [0,1] within group, flat group scales to NULL") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0), ("b", 7.0))
      .toDF("grp", "v")
    val out = Feature.minMaxScale(df, "v", Seq("grp"))
    val a = out.filter(col("grp") === "a").orderBy("v")
      .collect().map(_.getAs[Double]("v_scaled"))
    assert(a.toSeq === Seq(0.0, 0.5, 1.0))
    assert(out.filter(col("grp") === "b" && col("v_scaled").isNotNull)
      .count() === 0)
  }

  test("feature bounds broadcast — no shuffle of the corpus side") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val p = Feature.minMaxScale(df, "v", Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bounds frame must broadcast:\n$p")
  }

  test("robustScale: centered on the median, IQR-scaled, outlier-immune") {
    // 0..10 scaled by 10: median 50, q1 25, q3 75 (exact interpolation)
    val df = (0 to 10).map(i => ("g", i * 10.0)).toDF("grp", "v")
    val out = Feature.robustScale(df, "v", Seq("grp"))
      .orderBy("v").collect().map(_.getAs[Double]("v_robust"))
    assert(out(5) === 0.0)          // the median itself
    assert(out.last === 1.0)        // (100 − 50) / 50
    assert(out.head === -1.0)
    // flat group → NULL
    val flat = Feature.robustScale(Seq(("g", 5.0), ("g", 5.0)).toDF("grp", "v"),
      "v", Seq("grp"))
    assert(flat.filter(col("v_robust").isNotNull).count() === 0)
  }

  test("labelIndex: dense ids, most frequent first, alphabetical ties") {
    val df = (Seq.fill(5)("mid") ++ Seq.fill(5)("aaa") ++ Seq.fill(9)("big") ++
      Seq("rare")).toDF("label")
    val out = Feature.labelIndex(df, "label").collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Int]("label_index")).toMap
    assert(out === Map("big" -> 0, "aaa" -> 1, "mid" -> 2, "rare" -> 3))
  }

  test("targetEncode: small categories shrink toward the global prior") {
    // global mean 2.0; category 'tiny' has one y=10 observation
    val df = (Seq.fill(18)(("big", 1.5)) ++ Seq(("big", 3.0), ("tiny", 10.0)))
      .toDF("cat", "y")
    val out = Feature.targetEncode(df, "cat", "y", m = 10.0).collect()
      .map(r => r.getAs[String]("cat") -> r.getAs[Double]("target_enc")).toMap
    val prior = (18 * 1.5 + 3.0 + 10.0) / 20.0
    assert(math.abs(out("tiny") - (10.0 + 10.0 * prior) / 11.0) < 1e-12)
    assert(out("tiny") < 10.0) // shrunk well below its raw mean...
    assert(out("tiny") > prior) // ...but still above the prior
  }

  test("classWeights: sklearn 'balanced' — N/(K·n), rare classes weigh up") {
    val df = Seq.fill(6)("big").map(("r", _)) ++ Seq(("r", "rare"), ("r", "rare"))
    val out = Feature.classWeights(df.toDF("x", "label"), "label")
      .collect().map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n"), r.getAs[Double]("weight"))).toMap
    // N = 8, K = 2: big → 8/(2·6), rare → 8/(2·2)
    assert(out("big") === (6L, 8.0 / 12.0))
    assert(out("rare") === (2L, 2.0))
  }

  test("densify: injects exactly the missing days, keys and dates non-null") {
    val df = Seq(("s", "2024-01-01", 1.0), ("s", "2024-01-04", 4.0),
        ("t", "2024-02-01", 9.0))
      .toDF("sym", "day", "v")
      .withColumn("day", to_date(col("day")))
    val out = Resample.densify(df, Seq("sym"), "day").orderBy("sym", "day")
    val s = out.filter(col("sym") === "s").collect()
    assert(s.length === 4) // Jan 1,2,3,4
    assert(s.count(_.isNullAt(2)) === 2) // Jan 2,3 injected with NULL v
    assert(out.filter(col("sym") === "t").count() === 1) // single-day span
    assert(out.filter(col("day").isNull).count() === 0)
  }

  test("densify then ffill carries bar values across the injected gap") {
    val df = Seq(("s", "2024-01-01", 1.0), ("s", "2024-01-03", 3.0))
      .toDF("sym", "day", "v")
      .withColumn("day", to_date(col("day")))
    val filled = Rolling.ffill(
      Resample.densify(df, Seq("sym"), "day"), "v", Seq("sym"), Seq("day"))
      .orderBy("day").collect().map(_.getAs[Double]("v_filled"))
    assert(filled.toSeq === Seq(1.0, 1.0, 3.0))
  }

  test("quantileNormalize: groups with different scales land on one " +
      "pooled distribution") {
    // pooled multiset sorted: [1,2,3,10,20,30]; both groups have p =
    // 0, .5, 1 → outputs 1, 6.5 (=3+.5·(10−3)), 30 for EACH group
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("grp", "v")
    val out = Feature.quantileNormalize(df, "v", Seq("grp"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("quantile_normalized")).toMap
    assert(out(("a", 1.0)) === 1.0 && out(("b", 10.0)) === 1.0)
    assert(out(("a", 2.0)) === 6.5 && out(("b", 20.0)) === 6.5)
    assert(out(("a", 3.0)) === 30.0 && out(("b", 30.0)) === 30.0)
  }

  test("quantileNormalize: ties map identically; singletons pin p = 0.5") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 9.0), ("s", 7.0))
      .toDF("grp", "v")
    val out = Feature.quantileNormalize(df, "v", Seq("grp")).collect()
    val a5 = out.filter(r => r.getString(0) == "a" && r.getDouble(1) == 5.0)
      .map(_.getAs[Double]("quantile_normalized")).distinct
    assert(a5.length === 1, "tied values must map to one output")
    // pooled sorted: [5,5,7,9], N=4; singleton 's': h = .5·3 = 1.5 →
    // pooled[1] + .5·(pooled[2]−pooled[1]) = 5 + .5·2 = 6
    val s = out.filter(_.getString(0) == "s").head
    assert(s.getAs[Double]("quantile_normalized") === 6.0)
  }

  test("quantileNormalize: preserves within-group order; layout-exact") {
    val df = (1 to 300).map(i =>
      (s"g${i % 3}", ((i * 37) % 101).toDouble + (i % 3) * 50.0))
      .toDF("grp", "v")
    val one = Feature.quantileNormalize(df.coalesce(1), "v", Seq("grp"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("quantile_normalized")).toMap
    val many = Feature.quantileNormalize(df.repartition(13), "v", Seq("grp"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("quantile_normalized")).toMap
    assert(one === many)
    // monotone within each group
    for (g <- Seq("g0", "g1", "g2")) {
      val pairs = one.toSeq.filter(_._1._1 == g).sortBy(_._1._2).map(_._2)
      assert(pairs === pairs.sorted, s"order must be preserved in $g")
    }
  }

  test("quantileNormalize: nulls fail loudly") {
    val df = Seq(("a", Some(1.0)), ("a", None))
      .map { case (g, v) => (g, v.map(Double.box).orNull) }.toDF("grp", "v")
    val e = intercept[Exception] {
      Feature.quantileNormalize(df, "v", Seq("grp")).collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("dowProfile: per-dow means and additive residuals") {
    import java.sql.Date
    // 2024-01-01 is a Monday (dow 2); two Mondays (10, 20) and a Tuesday
    val df = Seq(("k", Date.valueOf("2024-01-01"), 10.0),
      ("k", Date.valueOf("2024-01-08"), 20.0),
      ("k", Date.valueOf("2024-01-02"), 7.0)).toDF("key", "d", "v")
    val out = Resample.dowProfile(df, "v", "d", Seq("key"))
      .collect().map(r => r.getAs[Date]("d").toString ->
        ((r.getAs[Int]("dow"), r.getAs[Double]("dow_mean"),
          r.getAs[Double]("v_deseason")))).toMap
    assert(out("2024-01-01") === ((2, 15.0, -5.0)))
    assert(out("2024-01-08") === ((2, 15.0, 5.0)))
    assert(out("2024-01-02") === ((3, 7.0, 0.0)))
  }

test("interpolate: time-weighted interior fill, edges stay NULL") {
    val rows = Seq(
      ("k", 0L, Some(1.0)), ("k", 4L, None), ("k", 10L, Some(2.0)),
      ("k", 12L, None),                       // trailing: no next anchor
      ("j", 0L, None), ("j", 5L, Some(7.0)))  // leading: no prev anchor
      .toDF("key", "t", "x")
    val out = Resample.interpolate(rows, Seq("key"), "t", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(r.fieldIndex("x_interp"))) None
         else Some(r.getDouble(r.fieldIndex("x_interp"))))).toMap
    assert(out(("k", 0L)) === Some(1.0))           // non-null passes through
    assert(out(("k", 4L)) === Some(1.0 + 1.0 * (4.0 / 10.0))) // 1.4
    assert(out(("k", 12L)) === None)               // trailing NULL
    assert(out(("j", 0L)) === None)                // leading NULL
    assert(out(("j", 5L)) === Some(7.0))
  }

  test("interpolate: consecutive gap rows land proportionally") {
    val rows = Seq(("k", 0L, Some(10.0)), ("k", 2L, None), ("k", 7L, None),
      ("k", 10L, Some(20.0))).toDF("key", "t", "x")
    val out = Resample.interpolate(rows, Seq("key"), "t", "x")
      .collect().map(r => r.getLong(1) ->
        r.getDouble(r.fieldIndex("x_interp"))).toMap
    assert(out(2L) === 10.0 + 10.0 * (2.0 / 10.0))  // 12
    assert(out(7L) === 10.0 + 10.0 * (7.0 / 10.0))  // 17
  }

  test("seasonalDecompose: recovers a planted period-3 pattern exactly") {
    // x_t = t + s[t % 3] with s = (1, -2, 1): seasonal sums to zero over
    // any window, so the centered 3-MA trend is exactly t on the interior
    val s = Seq(1.0, -2.0, 1.0)
    val rows = (0 to 8).map(t => ("k", t.toLong, t.toDouble + s(t % 3)))
    val out = Resample.seasonalDecompose(rows.toDF("key", "t", "x"),
        "x", Seq("key"), Seq("t"), period = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(0L).isNullAt(out(0L).fieldIndex("trend")))  // edge
    assert(out(8L).isNullAt(out(8L).fieldIndex("trend")))
    (1 to 7).foreach { t =>
      assert(out(t.toLong).getAs[Double]("trend") === t.toDouble)
      assert(out(t.toLong).getAs[Double]("resid") === 0.0)
    }
    assert(out(3L).getAs[Double]("seasonal") === 1.0)   // phase 0
    assert(out(1L).getAs[Double]("seasonal") === -2.0)  // phase 1
    assert(out(2L).getAs[Double]("seasonal") === 1.0)   // phase 2
  }

  test("seasonalDecompose: even period uses the 2xp centered MA") {
    // pure linear series, p = 4: the 1-2-2-2-1 weighted MA reproduces t
    // exactly, seasonal and residual vanish on the interior
    val rows = (0 to 11).map(t => ("k", t.toLong, t.toDouble))
    val out = Resample.seasonalDecompose(rows.toDF("key", "t", "x"),
        "x", Seq("key"), Seq("t"), period = 4)
      .collect().map(r => r.getLong(1) -> r).toMap
    (2 to 9).foreach { t =>
      assert(out(t.toLong).getAs[Double]("trend") === t.toDouble)
      assert(out(t.toLong).getAs[Double]("resid") === 0.0)
    }
    (0 to 3).foreach { ph =>
      assert(out(ph.toLong + 4L).getAs[Double]("seasonal") === 0.0)
    }
    assert(out(1L).isNullAt(out(1L).fieldIndex("trend"))) // half = 2 edge
  }

  test("seasonalDecompose: guards reserved names") {
    val bad = Seq(("k", 1L, 2.0)).toDF("key", "t", "trend")
    assert(intercept[IllegalArgumentException] {
      Resample.seasonalDecompose(bad, "trend", Seq("key"), Seq("t"), 3)
    }.getMessage.contains("seasonalDecompose"))
  }

  test("seasonalStrength: hand-computed F_s; flat trend scores 0") {
    // r = ±1, s = ±5 (aligned), t = 10 constant, one warm-up NULL row
    val rows = Seq(
      ("g", Some(10.0), 5.0, 1.0), ("g", Some(10.0), -5.0, -1.0),
      ("g", Some(10.0), 5.0, 1.0), ("g", Some(10.0), -5.0, -1.0),
      ("g", None, 5.0, 1.0))
    val df = rows.toDF("key", "trend", "seasonal", "resid")
    val r = Resample.seasonalStrength(df, Seq("key"), scale = 4)
      .collect().head
    assert(r.getAs[Long]("n") === 4L)  // NULL-trend row dropped
    assert(r.getAs[Double]("seasonal_strength") ===
      1.0 - 1.6e9 / 5.76e10)           // 35/36
    assert(r.getAs[Double]("trend_strength") === 0.0)
  }
}
