package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def auc(rows: Seq[(Double, Int)]): Option[Double] = {
    val df = rows.zipWithIndex
      .map { case ((s, y), i) => (i.toLong, "g", s, y) }
      .toDF("id", "grp", "score", "label")
    val out = Eval.binaryAuc(df, "score", "label", Seq("grp")).collect()
    assert(out.length === 1)
    Option(out.head.getAs[java.lang.Double]("auc")).map(_.doubleValue())
  }

  test("binaryAuc: perfect, inverted, and all-tied scorers") {
    assert(auc(Seq(0.1 -> 0, 0.2 -> 0, 0.3 -> 1, 0.4 -> 1)) === Some(1.0))
    assert(auc(Seq(0.1 -> 1, 0.2 -> 1, 0.3 -> 0, 0.4 -> 0)) === Some(0.0))
    // every score tied: every pos/neg pair counts 1/2
    assert(auc(Seq(5.0 -> 0, 5.0 -> 1, 5.0 -> 0, 5.0 -> 1)) === Some(0.5))
  }

  test("binaryAuc: midrank tie handling matches the hand-computed value") {
    // scores 1,2,2,3 / labels 0,1,0,1 → positive midranks 2.5 and 4,
    // AUC = (6.5 − 2·3/2) / (2·2) = 0.875
    assert(auc(Seq(1.0 -> 0, 2.0 -> 1, 2.0 -> 0, 3.0 -> 1)) === Some(0.875))
  }

  test("binaryAuc: degenerate groups (no positives / no negatives) emit NULL") {
    assert(auc(Seq(1.0 -> 0, 2.0 -> 0)) === None)
    assert(auc(Seq(1.0 -> 1, 2.0 -> 1)) === None)
  }

  test("binaryAuc: layout-independent (exact integer/half-integer sums)") {
    val rows = (0 until 500).map { i =>
      (i.toLong, s"g${i % 3}", (i * 37 % 101).toDouble, i % 5 min 1)
    }
    val df = rows.toDF("id", "grp", "score", "label")
    val once = Eval.binaryAuc(df, "score", "label", Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val again = Eval.binaryAuc(df.repartition(17), "score", "label", Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(once === again)
  }

  test("binaryAuc: non-binary label fails loudly") {
    val df = Seq((1L, "g", 0.5, 2)).toDF("id", "grp", "score", "label")
    val e = intercept[Exception] {
      Eval.binaryAuc(df, "score", "label", Seq("grp")).collect()
    }
    assert(e.getMessage.contains("0/1 label") ||
      Option(e.getCause).exists(_.getMessage.contains("0/1 label")))
  }

  test("calibrationBins: clamping, counts, and rates") {
    val df = Seq(
      (-5.0, 0),  // below lo → bin 0
      (5.0, 1), (15.0, 0), (15.0, 1),
      (95.0, 1), (120.0, 1) // above hi → top bin
    ).toDF("score", "label")
    val out = Eval.calibrationBins(df, "score", "label",
        nBins = 10, lo = 0.0, hi = 100.0)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("bin_lo"), r.getAs[Double]("pos_rate"))).toMap
    assert(out(0) === ((2L, 1L, 0.0, 0.5)))
    assert(out(1) === ((2L, 1L, 10.0, 0.5)))
    assert(out(9) === ((2L, 2L, 90.0, 1.0)))
    assert(out.keySet === Set(0, 1, 9)) // empty bins absent
  }

  test("calibrationBins: null score fails loudly") {
    val df = Seq((Some(1.0), 0), (None, 1))
      .toDF("score", "label")
    val e = intercept[Exception] {
      Eval.calibrationBins(df, "score", "label", 4, 0.0, 1.0).collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  private def ap(rows: Seq[(Double, Int)]): Option[Double] = {
    val df = rows.zipWithIndex
      .map { case ((s, y), i) => (i.toLong, "g", s, y) }
      .toDF("id", "grp", "score", "label")
    val out = Eval.averagePrecision(df, "score", "label", Seq("grp")).collect()
    assert(out.length === 1)
    Option(out.head.getAs[java.lang.Double]("ap")).map(_.doubleValue())
  }

  test("averagePrecision: perfect ranking scores 1; no positives is NULL") {
    assert(ap(Seq(0.9 -> 1, 0.8 -> 1, 0.2 -> 0, 0.1 -> 0)) === Some(1.0))
    assert(ap(Seq(0.9 -> 0, 0.1 -> 0)) === None)
    assert(ap(Seq(0.9 -> 1, 0.1 -> 1)) === Some(1.0)) // all-positive
  }

  test("averagePrecision: hand-computed step-wise value (sklearn convention)") {
    // desc thresholds: tp/cum = 1/1, 1/2, 2/3, 3/4; pos at 1st,3rd,4th
    // AP = (1·1/1 + 1·2/3 + 1·3/4)/3 = 29/36
    assert(ap(Seq(0.9 -> 1, 0.8 -> 0, 0.7 -> 1, 0.6 -> 1))
      === Some((1.0 + 2.0 / 3.0 + 3.0 / 4.0) / 3.0))
    // worst ranking: positives last → AP = (1/3 + 2·(2/4)/?)...
    // 2 pos of 4, both ranked last: terms 1·2/3? no — pos at cum 3,4:
    // (1·1/3 + 1·2/4)/2 = 5/12
    assert(ap(Seq(0.9 -> 0, 0.8 -> 0, 0.7 -> 1, 0.6 -> 1))
      === Some((1.0 / 3.0 + 2.0 / 4.0) / 2.0))
  }

  test("averagePrecision: tied scores merge at one threshold") {
    // scores all tied: single threshold, P=2, n=4 → AP = precision = 1/2
    assert(ap(Seq(5.0 -> 1, 5.0 -> 0, 5.0 -> 1, 5.0 -> 0)) === Some(0.5))
  }

  test("averagePrecision: layout-independent (ordered threshold fold)") {
    val rows = (1 to 400).map(i =>
      (i.toLong, s"g${i % 3}", (i % 17).toDouble, i % 5 min 1))
    val df = rows.toDF("id", "grp", "score", "label")
    val a = Eval.averagePrecision(df, "score", "label", Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ap")).toMap
    val b = Eval.averagePrecision(df.repartition(13), "score", "label", Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ap")).toMap
    assert(a === b)
  }

  test("brierScore: hand-computed value, perfect and uninformed rails") {
    val df = Seq((1.0, 1), (0.0, 0), (0.5, 1), (0.75, 0))
      .toDF("score", "label")
    val out = Eval.brierScore(df, "score", "label", Nil).head()
    // errors²: 0, 0, 0.25, 0.5625 → 0.8125 / 4
    assert(out.getAs[Double]("brier") === 0.203125)
    assert(out.getAs[Long]("n") === 4L)
    // perfect forecast → 0; constant 0.5 → 0.25
    val perfect = Seq((1.0, 1), (0.0, 0)).toDF("score", "label")
    assert(Eval.brierScore(perfect, "score", "label", Nil)
      .head().getAs[Double]("brier") === 0.0)
    val coin = Seq((0.5, 1), (0.5, 0)).toDF("score", "label")
    assert(Eval.brierScore(coin, "score", "label", Nil)
      .head().getAs[Double]("brier") === 0.25)
  }

  test("brierScore: out-of-range score raises") {
    val df = Seq((1.5, 1)).toDF("score", "label")
    val e = intercept[Exception] {
      Eval.brierScore(df, "score", "label", Nil).collect()
    }
    assert(e.getMessage.contains("probability in [0, 1]") ||
      Option(e.getCause).exists(_.getMessage.contains("probability in [0, 1]")))
  }

  test("liftTable: hand-computed two-bucket gains, ties stay whole") {
    // scores 1..10, positives exactly at the top 3 scores → top half has
    // 3/5 positives, bottom half 0/5; overall rate 0.3
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 8) 1 else 0))
      .toDF("score", "label")
    val out = Eval.liftTable(df, "score", "label", nBuckets = 2)
      .orderBy("bucket").collect()
    assert(out.length === 2)
    val top = out(0)
    assert(top.getAs[Int]("bucket") === 1 && top.getAs[Long]("n") === 5L)
    assert(top.getAs[Double]("pos_rate") === 0.6)
    assert(top.getAs[Double]("lift") === 2.0) // 0.6 / 0.3
    assert(top.getAs[Long]("cum_n") === 5L && top.getAs[Double]("cum_lift") === 2.0)
    val bot = out(1)
    assert(bot.getAs[Double]("pos_rate") === 0.0)
    assert(bot.getAs[Long]("cum_n") === 10L)
    assert(bot.getAs[Double]("cum_lift") === 1.0) // whole population
    // heavy tie: one score value everywhere → a single bucket, lift 1
    val tied = (1 to 8).map(i => (5.0, i % 2)).toDF("score", "label")
    val t = Eval.liftTable(tied, "score", "label", nBuckets = 4)
      .collect()
    assert(t.length === 1 && t.head.getAs[Long]("n") === 8L)
    assert(t.head.getAs[Double]("lift") === 1.0)
  }

  private def rankRows(q: String, docs: Seq[String]) =
    docs.zipWithIndex.map { case (d, i) => (q, d, i + 1) }

  test("rrfFusion: hand-computed scores, agreement count, duplicate guard") {
    val ranked = Seq(("q", "a", 1, "A"), ("q", "b", 2, "A"),
        ("q", "b", 1, "B"), ("q", "c", 2, "B"))
      .toDF("q", "doc", "rnk", "sys")
    val out = Eval.rrfFusion(ranked, "q", "doc", "rnk", "sys", kSmooth = 1)
      .orderBy("fused_rank").collect()
    // terms 1/(1+r): a → 1/2; b → 1/2 + 1/3; c → 1/3
    assert(out.map(_.getAs[String]("doc")).toSeq === Seq("b", "a", "c"))
    assert(out(0).getAs[Double]("rrf_score") === 1.0 / 2.0 + 1.0 / 3.0)
    assert(out(0).getAs[Long]("n_systems") === 2L)
    assert(out(1).getAs[Long]("n_systems") === 1L)
    assert(out.map(_.getAs[Long]("fused_rank")).toSeq === Seq(1L, 2L, 3L))
    val dup = Seq(("q", "a", 1, "A"), ("q", "a", 2, "A")).toDF("q", "doc", "rnk", "sys")
    val e = intercept[Exception] {
      Eval.rrfFusion(dup, "q", "doc", "rnk", "sys").collect()
    }
    assert(e.getMessage.contains("ranked the same"))
  }

  test("rankingMetrics: hand-computed recall, MRR, and NDCG at k") {
    // q1: relevant {a, c, z}; ranked a,b,c → hits 2, first 1,
    // dcg = 1 + 1/log2(4), idcg(min(3,3)) = 1 + 1/log2(3) + 1/log2(4)
    // q2: relevant {x}; ranked d,e,f → no hit
    // q3: no relevant docs → recall/ndcg NULL, mrr 0
    val ranked = (rankRows("q1", Seq("a", "b", "c")) ++
        rankRows("q2", Seq("d", "e", "f")) ++
        rankRows("q3", Seq("g", "h", "i")))
      .toDF("q", "doc", "rnk")
    val rel = Seq(("q1", "a"), ("q1", "c"), ("q1", "z"), ("q2", "x"))
      .toDF("q", "doc")
    val out = Eval.rankingMetrics(ranked, rel, "q", "doc", "rnk", k = 3)
      .collect().map(r => r.getAs[String]("q") -> r).toMap
    val d = Eval.ndcgDiscounts(3)
    val q1 = out("q1")
    assert(q1.getAs[Long]("n_rel") === 3L && q1.getAs[Long]("hits") === 2L)
    assert(q1.getAs[Double]("recall_at_k") === 2.0 / 3.0)
    assert(q1.getAs[Double]("mrr_at_k") === 1.0)
    assert(q1.getAs[Double]("ndcg_at_k") ===
      (d(0) + d(2)) / (d(0) + d(1) + d(2)))
    val q2 = out("q2")
    assert(q2.getAs[Long]("hits") === 0L)
    assert(q2.getAs[Double]("recall_at_k") === 0.0)
    assert(q2.getAs[Double]("mrr_at_k") === 0.0)
    assert(q2.getAs[Double]("ndcg_at_k") === 0.0)
    val q3 = out("q3")
    assert(q3.getAs[Long]("n_rel") === 0L)
    assert(q3.isNullAt(q3.fieldIndex("recall_at_k")))
    assert(q3.getAs[Double]("mrr_at_k") === 0.0)
    assert(q3.isNullAt(q3.fieldIndex("ndcg_at_k")))
  }

  test("rankingMetrics: n_rel beyond k caps the ideal DCG at k") {
    // 5 relevant, k=2, both top slots hit → ndcg exactly 1
    val ranked = rankRows("q", Seq("a", "b")).toDF("q", "doc", "rnk")
    val rel = Seq("a", "b", "c", "d", "e").map(("q", _)).toDF("q", "doc")
    val out = Eval.rankingMetrics(ranked, rel, "q", "doc", "rnk", k = 2)
      .collect().head
    assert(out.getAs[Double]("ndcg_at_k") === 1.0)
    assert(out.getAs[Double]("recall_at_k") === 2.0 / 5.0)
  }

  test("rankingMetrics: ranks beyond k are ignored; duplicate ranks fail loudly") {
    val ranked = Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 7))
      .toDF("q", "doc", "rnk")
    val rel = Seq(("q", "c")).toDF("q", "doc")
    val out = Eval.rankingMetrics(ranked, rel, "q", "doc", "rnk", k = 2)
      .collect().head
    assert(out.getAs[Long]("hits") === 0L) // the rank-7 hit is outside k
    val dup = Seq(("q", "a", 1), ("q", "b", 1)).toDF("q", "doc", "rnk")
    val e = intercept[Exception] {
      Eval.rankingMetrics(dup, rel, "q", "doc", "rnk", k = 2).collect()
    }
    assert(e.getMessage.contains("duplicate ranks"))
  }

test("classificationReport: hand-computed confusion and rates") {
    // threshold 0.5, boundary INCLUSIVE: 0.5 predicts positive
    val rows = Seq(
      ("g", 0.9, 1), ("g", 0.5, 1), ("g", 0.6, 0),   // tp tp fp
      ("g", 0.4, 1), ("g", 0.1, 0), ("g", 0.2, 0))   // fn tn tn
    val r = Eval.classificationReport(rows.toDF("grp", "s", "y"), "s", "y",
      0.5, Seq("grp")).collect().head
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) === ((2L, 1L, 1L, 2L)))
    assert(r.getAs[Double]("precision") === 2.0 / 3.0)
    assert(r.getAs[Double]("recall") === 2.0 / 3.0)
    assert(r.getAs[Double]("f1") === 4.0 / 6.0)  // 2tp/(2tp+fp+fn)
    assert(r.getAs[Double]("accuracy") === 4.0 / 6.0)
  }

  test("classificationReport: NULL precision with no predicted positives") {
    val rows = Seq(("g", 0.1, 1), ("g", 0.2, 0))
    val r = Eval.classificationReport(rows.toDF("grp", "s", "y"), "s", "y",
      0.9, Seq("grp")).collect().head
    assert(r.isNullAt(r.fieldIndex("precision")))
    assert(r.getAs[Double]("recall") === 0.0)
    assert(r.getAs[Double]("f1") === 0.0) // fn > 0 keeps f1 defined at 0
  }

  test("classificationReport: stray labels fail loudly") {
    val bad = Seq(("g", 0.5, 2)).toDF("grp", "s", "y")
    assert(intercept[Exception] {
      Eval.classificationReport(bad, "s", "y", 0.5, Seq("grp")).collect()
    }.getMessage.contains("classificationReport"))
  }

test("forecastErrors: hand-computed MAE/RMSE and the MASE identity") {
    // forecast IS the 1-step naive and m = 1: MASE must be exactly 1
    val a = Seq(10.0, 12.0, 11.0, 13.0)
    val rows = a.indices.map { i =>
      ("k", i.toLong, a(i), if (i >= 1) Some(a(i - 1)) else None)
    }
    val r = Eval.forecastErrors(rows.toDF("key", "t", "act", "fc"),
      "act", "fc", Seq("key"), Seq("t"), m = 1).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("mae") === 5.0 / 3.0)
    assert(r.getAs[Double]("rmse") === math.sqrt(9.0 / 3.0))
    assert(r.getAs[Double]("mase") === 1.0)
  }

  test("forecastErrors: constant series has no naive benchmark -> NULL mase") {
    val rows = Seq(("k", 1L, 5.0, 4.0), ("k", 2L, 5.0, 6.0), ("k", 3L, 5.0, 5.0))
    val r = Eval.forecastErrors(rows.toDF("key", "t", "act", "fc"),
      "act", "fc", Seq("key"), Seq("t"), m = 1).collect().head
    assert(r.isNullAt(r.fieldIndex("mase")))
    assert(r.getAs[Double]("mae") === 2.0 / 3.0) // mae itself is defined
  }

  test("agreement: hand-computed kappa and MCC") {
    // confusion (tp,fp,fn,tn) = (4,1,2,3): kappa = 20/50, mcc = 10/sqrt(600)
    val rows =
      Seq.fill(4)(("g", 0.9, 1L)) ++ Seq.fill(1)(("g", 0.9, 0L)) ++
      Seq.fill(2)(("g", 0.1, 1L)) ++ Seq.fill(3)(("g", 0.1, 0L))
    val r = Eval.agreement(rows.toDF("grp", "s", "y"), "s", "y", 0.5,
      Seq("grp")).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("kappa") === 20.0 / 50.0)
    assert(r.getAs[Double]("mcc") === 10.0 / math.sqrt(600.0))
  }

  test("agreement: degenerate single-cell confusion yields NULLs") {
    val rows = Seq(("g", 0.9, 1L), ("g", 0.8, 1L))  // everything is tp
    val r = Eval.agreement(rows.toDF("grp", "s", "y"), "s", "y", 0.5,
      Seq("grp")).collect().head
    assert(r.isNullAt(r.fieldIndex("kappa")))  // p_e = 1
    assert(r.isNullAt(r.fieldIndex("mcc")))    // zero marginals
  }

  test("logLoss: quantized-term mean matches the per-row trees") {
    val rows = Seq(("g", 0.5, 1L), ("g", 0.25, 0L))
    val r = Eval.logLoss(rows.toDF("grp", "p", "y"), "p", "y", Seq("grp"))
      .collect().head
    val t1 = math.round(-math.log(0.5) * 1e10)
    val t2 = math.round(-math.log(1.0 - 0.25) * 1e10)
    assert(r.getAs[Double]("log_loss") === (t1 + t2).toDouble / 2.0 / 1e10)
  }

  test("logLoss: confidently-wrong scores clamp at eps, not infinity") {
    val rows = Seq(("g", 0.0, 1L))
    val r = Eval.logLoss(rows.toDF("grp", "p", "y"), "p", "y", Seq("grp"))
      .collect().head
    val expected = math.round(-math.log(1e-15) * 1e10).toDouble / 1.0 / 1e10
    assert(r.getAs[Double]("log_loss") === expected)
  }

  test("rocCurve: cumulative sweep over distinct thresholds") {
    val rows = Seq(("g", 0.9, 1L), ("g", 0.8, 0L), ("g", 0.8, 1L),
      ("g", 0.4, 0L))
    val out = Eval.rocCurve(rows.toDF("grp", "s", "y"), "s", "y", Seq("grp"))
      .collect().map(r => r.getAs[Double]("threshold") -> r).toMap
    assert(out.size === 3)
    assert(out(0.9).getAs[Double]("tpr") === 0.5)
    assert(out(0.9).getAs[Double]("fpr") === 0.0)
    assert(out(0.8).getAs[Long]("n_at") === 2L)
    assert(out(0.8).getAs[Double]("tpr") === 1.0)
    assert(out(0.8).getAs[Double]("fpr") === 0.5)
    assert(out(0.4).getAs[Double]("fpr") === 1.0)
  }

  test("rocCurve: single-class group leaves the undefined rate NULL") {
    val rows = Seq(("g", 0.9, 1L), ("g", 0.4, 1L))  // no negatives
    val out = Eval.rocCurve(rows.toDF("grp", "s", "y"), "s", "y", Seq("grp"))
      .collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("fpr"))))
    assert(out.forall(!_.isNullAt(out.head.fieldIndex("tpr"))))
  }

  test("kaplanMeier: hand-computed curve with censoring") {
    // N=5: d=2@t1, censor@t2, d=1@t3, censor@t5 ->
    // S = 3/5, 3/5, 3/5 * 1/2, carried
    val rows = Seq(("g", 1L, 1L), ("g", 1L, 1L), ("g", 2L, 0L),
      ("g", 3L, 1L), ("g", 5L, 0L))
    val out = Eval.kaplanMeier(rows.toDF("grp", "dur", "ev"), "dur", "ev",
        Seq("grp"))
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out(1L).getAs[Long]("n_risk") === 5L)
    assert(out(1L).getAs[Long]("events") === 2L)
    assert(out(1L).getAs[Double]("survival") === 3.0 / 5.0)
    assert(out(2L).getAs[Long]("n_risk") === 3L)
    assert(out(2L).getAs[Double]("survival") === (3.0 / 5.0) * 1.0)
    assert(out(3L).getAs[Double]("survival") === ((3.0 / 5.0) * 1.0) * 0.5)
    assert(out(5L).getAs[Long]("n_risk") === 1L)
    assert(out(5L).getAs[Long]("censored") === 1L)
  }

  test("nelsonAalen: hand-computed cumulative hazard with censoring") {
    // same frame as the KM spec: steps 2/5, 0/3, 1/2, 0/1
    val rows = Seq(("g", 1L, 1L), ("g", 1L, 1L), ("g", 2L, 0L),
      ("g", 3L, 1L), ("g", 5L, 0L))
    val out = Eval.nelsonAalen(rows.toDF("grp", "dur", "ev"), "dur", "ev",
        Seq("grp"))
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out(1L).getAs[Long]("n_risk") === 5L)
    assert(out(1L).getAs[Double]("hazard") === 2.0 / 5.0)
    assert(out(2L).getAs[Double]("hazard") === 2.0 / 5.0 + 0.0)
    assert(out(3L).getAs[Double]("hazard") === (2.0 / 5.0 + 0.0) + 0.5)
    assert(out(5L).getAs[Double]("hazard") ===
      ((2.0 / 5.0 + 0.0) + 0.5) + 0.0)
  }

  test("rankBiasedOverlap: hand-computed depth ladder") {
    val p = 0.9
    var pw = 1.0
    val w = (1 to 3).map { _ => val x = (1.0 - p) * pw; pw = pw * p; x }
    // x(1,1) m=1; y(2,3) m=3; z(3,2) m=3; w-item outside k on B side
    val rows = Seq(("q", "x", 1L, 1L), ("q", "y", 2L, 3L),
      ("q", "z", 3L, 2L), ("q", "o", 4L, 9L))
    val r = Eval.rankBiasedOverlap(rows.toDF("query", "item", "ra", "rb"),
      Seq("query"), "ra", "rb", k = 3, pPm = 900).collect().head
    assert(r.getAs[Long]("n_shared") === 3L)
    val expected = ((0.0 + w(0) * (1.0 / 1.0)) + w(1) * (1.0 / 2.0)) +
      w(2) * (3.0 / 3.0)
    assert(r.getAs[Double]("rbo") === expected)
  }

  test("rankBiasedOverlap: identical rankings hit the truncated maximum") {
    val rows = (1 to 5).map(i => ("q", s"i$i", i.toLong, i.toLong))
    val r = Eval.rankBiasedOverlap(rows.toDF("query", "item", "ra", "rb"),
      Seq("query"), "ra", "rb", k = 5, pPm = 800).collect().head
    val p = 0.8
    var pw = 1.0
    val expected = (1 to 5).foldLeft(0.0) { (acc, d) =>
      val x = acc + ((1.0 - p) * pw) * (d.toDouble / d.toDouble)
      pw = pw * p; x
    }
    assert(r.getAs[Double]("rbo") === expected)
  }

  test("rmst: hand-computed area under the KM steps; tau clamps") {
    // events at 1 and 3, no censoring: S = 0.5 on [1,3), 0 after
    val rows = Seq(("g", 1L, 1L), ("g", 3L, 1L))
    val r5 = Eval.rmst(rows.toDF("grp", "dur", "ev"), "dur", "ev",
      Seq("grp"), tau = 5L).collect().head
    assert(r5.getAs[Long]("n") === 2L)
    assert(r5.getAs[Double]("rmst") === 1.0 + (0.5 * 2.0 + 0.0 * 2.0))
    val r2 = Eval.rmst(rows.toDF("grp", "dur", "ev"), "dur", "ev",
      Seq("grp"), tau = 2L).collect().head
    assert(r2.getAs[Double]("rmst") === 1.0 + (0.5 * 1.0 + 0.0 * 0.0))
  }

  test("expectedCalibrationError: perfect calibration gives 0") {
    def mk(lowPos: Int, highPos: Int) =
      ((1 to 10).map(i => ("g", i.toLong, 0.1, if (i <= lowPos) 1L else 0L)) ++
        (11 to 20).map(i => ("g", i.toLong, 0.9,
          if (i <= 10 + highPos) 1L else 0L)))
        .toDF("grp", "tie", "p", "y")
    val cal = Eval.expectedCalibrationError(mk(1, 9), "p", "y", "tie",
      Seq("grp"), bins = 2, scale = 1).collect().head
    assert(cal.getAs[Double]("ece") === 0.0)
    // flipped: each decile is off by 0.8 -> ECE = 0.8
    val bad = Eval.expectedCalibrationError(mk(9, 1), "p", "y", "tie",
      Seq("grp"), bins = 2, scale = 1).collect().head
    val t1 = 10.0 * math.abs(9.0 / 10.0 - (10.0 / 10.0) / 10.0)
    val t2 = 10.0 * math.abs(1.0 / 10.0 - (90.0 / 10.0) / 10.0)
    assert(bad.getAs[Double]("ece") === ((0.0 + t1) + t2) / 20.0)
  }

  test("bestF1Threshold: picks the max-F1 operating point") {
    val rows = Seq(("g", 0.9, 1L), ("g", 0.8, 0L), ("g", 0.7, 1L),
      ("g", 0.6, 0L), ("g", 0.5, 1L), ("z", 0.4, 0L))
    val out = Eval.bestF1Threshold(rows.toDF("grp", "score", "y"),
        "score", "y", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Double]("threshold") === 0.5)
    assert(g.getAs[Double]("f1") === 6.0 / 8.0)
    assert(g.getAs[Double]("precision") === 3.0 / 5.0)
    assert(g.getAs[Double]("recall") === 1.0)
    assert(out("z").isNullAt(out("z").fieldIndex("f1"))) // no positives
  }

  test("mcnemar: hand-computed discordant split; no-evidence NULL") {
    // label 1 everywhere: A correct iff predA; b = 6, c = 2
    val rows = (1 to 6).map(_ => ("g", true, false, 1L)) ++
      (1 to 2).map(_ => ("g", false, true, 1L)) ++
      Seq(("g", true, true, 1L), ("g", false, false, 1L))
    val r = Eval.mcnemar(rows.toDF("grp", "pa", "pb", "y"), "pa", "pb",
      "y", Seq("grp")).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("a_only") === 6L && r.getAs[Long]("b_only") === 2L)
    assert(r.getAs[Double]("mcnemar_chi2") === (4.0 * 4.0) / 8.0)
    assert(r.getAs[Double]("mcnemar_chi2_cc") === (3.0 * 3.0) / 8.0)
    val agree = Seq(("g", true, true, 1L), ("g", false, false, 1L))
    val r2 = Eval.mcnemar(agree.toDF("grp", "pa", "pb", "y"), "pa", "pb",
      "y", Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("mcnemar_chi2")))
  }

  test("hosmerLemeshow: calibrated scores give 0; miscalibration charges") {
    def mk(lowPos: Int, highPos: Int) =
      ((1 to 10).map(i => ("g", i.toLong, 0.1, if (i <= lowPos) 1L else 0L)) ++
        (11 to 20).map(i => ("g", i.toLong, 0.9,
          if (i <= 10 + highPos) 1L else 0L)))
        .toDF("grp", "tie", "p", "y")
    val cal = Eval.hosmerLemeshow(mk(1, 9), "p", "y", "tie", Seq("grp"),
      bins = 2, scale = 1).collect().head
    assert(cal.getAs[Long]("n") === 20L && cal.getAs[Long]("k_bins") === 2L)
    assert(cal.getAs[Double]("hl_chi2") === 0.0)
    val bad = Eval.hosmerLemeshow(mk(9, 1), "p", "y", "tie", Seq("grp"),
      bins = 2, scale = 1).collect().head
    val t1 = ((9.0 - 1.0) * (9.0 - 1.0)) / (1.0 * (1.0 - 1.0 / 10.0))
    val t2 = ((1.0 - 9.0) * (1.0 - 9.0)) / (9.0 * (1.0 - 9.0 / 10.0))
    assert(bad.getAs[Double]("hl_chi2") === (0.0 + t1) + t2)
  }

  test("hosmerLemeshow: degenerate bin and underfilled group yield NULL") {
    val zeros = (1 to 10).map(i => ("g", i.toLong, 0.0, 0L)) ++
      (11 to 20).map(i => ("g", i.toLong, 0.5, 1L))
    val r = Eval.hosmerLemeshow(zeros.toDF("grp", "tie", "p", "y"), "p",
      "y", "tie", Seq("grp"), bins = 2, scale = 1).collect().head
    assert(r.isNullAt(r.fieldIndex("hl_chi2")))  // E = 0 bin
    val few = (1 to 5).map(i => ("g", i.toLong, 0.5, 1L))
    val r2 = Eval.hosmerLemeshow(few.toDF("grp", "tie", "p", "y"), "p",
      "y", "tie", Seq("grp"), bins = 10, scale = 1).collect().head
    assert(r2.getAs[Long]("k_bins") === 5L)
    assert(r2.isNullAt(r2.fieldIndex("hl_chi2")))
  }

  test("logRank: hand-computed U/V on a two-arm frame") {
    // A: events at 1,2; B: event at 2, censor at 3
    val rows = Seq(("g", "A", 1L, 1L), ("g", "A", 2L, 1L),
      ("g", "B", 2L, 1L), ("g", "B", 3L, 0L))
    val r = Eval.logRank(rows.toDF("grp", "arm", "dur", "ev"), "dur", "ev",
      "arm", "A", "B", Seq("grp")).collect().head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    val u = (1.0 - 1.0 * (2.0 / 4.0)) + (1.0 - 2.0 * (1.0 / 3.0)) + 0.0
    val v = ((1.0 * (2.0 / 4.0)) * (1.0 - 2.0 / 4.0)) * (3.0 / 3.0) +
      ((2.0 * (1.0 / 3.0)) * (1.0 - 1.0 / 3.0)) * (1.0 / 2.0) + 0.0
    assert(r.getAs[Double]("logrank_z") === u / math.sqrt(v))
    assert(r.getAs[Double]("logrank_chi2") ===
      (u / math.sqrt(v)) * (u / math.sqrt(v)))
  }

  test("logRank: identical arms give z = 0; empty arm yields NULL") {
    // perfectly mirrored arms: every d_A = e_A exactly
    val rows = Seq(("g", "A", 1L, 1L), ("g", "B", 1L, 1L),
      ("g", "A", 2L, 1L), ("g", "B", 2L, 1L))
    val r = Eval.logRank(rows.toDF("grp", "arm", "dur", "ev"), "dur", "ev",
      "arm", "A", "B", Seq("grp")).collect().head
    assert(r.getAs[Double]("logrank_z") === 0.0)
    val solo = Seq(("g", "A", 1L, 1L), ("g", "A", 2L, 0L))
    val r2 = Eval.logRank(solo.toDF("grp", "arm", "dur", "ev"), "dur", "ev",
      "arm", "A", "B", Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("logrank_z")))
  }

  test("kaplanMeier: no censoring reduces to the empirical survivor") {
    // 4 events at distinct times: S(t_k) = (4-k)/4 exactly
    val rows = (1 to 4).map(t => ("g", t.toLong, 1L))
    val out = Eval.kaplanMeier(rows.toDF("grp", "dur", "ev"), "dur", "ev",
        Seq("grp"))
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Double]("survival")).toMap
    assert(out(1L) === 3.0 / 4.0)
    assert(out(2L) === (3.0 / 4.0) * (2.0 / 3.0))
    assert(out(4L) === (((3.0 / 4.0) * (2.0 / 3.0)) * 0.5) * 0.0)
  }

  test("forecastErrors: scale quantizes before the error sums") {
    // at scale 2 the 0.004 gap rounds away: error counts as 0.00
    val rows = Seq(("k", 1L, 1.004, 1.0), ("k", 2L, 2.0, 1.5))
    val r = Eval.forecastErrors(rows.toDF("key", "t", "act", "fc"),
      "act", "fc", Seq("key"), Seq("t"), m = 1, scale = 2).collect().head
    assert(r.getAs[Double]("mae") === (0.0 + 50.0) / 2.0 / 100.0)
  }

  test("kupiecPof: hand-computed LR; x = 0 edge stays finite") {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 10 rows, 1 violation (a < v), claimed p = 5%
    val rows = (1 to 9).map(i => ("g", 10.0 + i, 5.0)) :+ (("g", 1.0, 5.0))
    val r = Eval.kupiecPof(rows.toDF("key", "act", "vl"), "act", "vl",
      Seq("key"), pPm = 50).collect().head
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("violations") === 1L)
    val claim = 9.0 * r10(math.log(0.95)) + 1.0 * r10(math.log(0.05))
    val fit = 9.0 * r10(math.log(1.0 - 1.0 / 10.0)) +
      1.0 * r10(math.log(1.0 / 10.0))
    assert(r.getAs[Double]("kupiec_lr") === -2.0 * (claim - fit))
    // zero violations: LR = -2 n ln(1-p), no 0*ln(0) NaN
    val clean = (1 to 5).map(i => ("g", 10.0 + i, 5.0))
    val r2 = Eval.kupiecPof(clean.toDF("key", "act", "vl"), "act", "vl",
      Seq("key"), pPm = 50).collect().head
    assert(r2.getAs[Double]("kupiec_lr") ===
      -2.0 * (5.0 * r10(math.log(0.95)) - 0.0))
  }

  test("christoffersenInd: hand-computed Markov LR; degenerate NULL") {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    // flags 0,0,1,0,1,1,0 -> n00=1 n01=2 n10=2 n11=1
    val acts = Seq(10.0, 10.0, 1.0, 10.0, 1.0, 1.0, 10.0)
    val rows = acts.zipWithIndex.map { case (a, t) => ("g", t.toLong, a, 5.0) }
    val r = Eval.christoffersenInd(rows.toDF("key", "t", "act", "vl"),
      "act", "vl", Seq("key"), Seq("t")).collect().head
    assert((r.getAs[Long]("n00"), r.getAs[Long]("n01"),
      r.getAs[Long]("n10"), r.getAs[Long]("n11")) === ((1L, 2L, 2L, 1L)))
    val pi = (2.0 + 1.0) / 6.0
    val common = 3.0 * r10(math.log(1.0 - pi)) + 3.0 * r10(math.log(pi))
    val markov = 1.0 * r10(math.log(1.0 - 2.0 / 3.0)) +
      2.0 * r10(math.log(2.0 / 3.0)) +
      2.0 * r10(math.log(1.0 - 1.0 / 3.0)) +
      1.0 * r10(math.log(1.0 / 3.0))
    assert(r.getAs[Double]("christoffersen_lr") === -2.0 * (common - markov))
    // violation-free series: the alternative is unidentified -> NULL
    val clean = (1 to 5).map(t => ("g", t.toLong, 10.0, 5.0))
    val r2 = Eval.christoffersenInd(clean.toDF("key", "t", "act", "vl"),
      "act", "vl", Seq("key"), Seq("t")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("christoffersen_lr")))
  }

  test("pinballLoss: hand-computed asymmetric penalties at tau = 0.9") {
    // e = +2 (0.9*2), -4 (0.1*4), 0 -> mean 2.2/3
    val rows = Seq(("g", 10.0, 8.0), ("g", 5.0, 9.0), ("g", 7.0, 7.0))
    val r = Eval.pinballLoss(rows.toDF("key", "act", "fc"), "act", "fc",
      Seq("key"), tauPm = 900).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("pinball") === (2200.0 / 3000.0) / 1.0)
  }

  test("theilU2: beats-naive ratio; naive itself scores 1; constant NULL") {
    val rows = Seq(("g", 1L, 10.0, 11.0), ("g", 2L, 12.0, 11.0),
      ("g", 3L, 11.0, 12.0), ("g", 4L, 15.0, 14.0))
    val r = Eval.theilU2(rows.toDF("key", "t", "act", "fc"), "act", "fc",
      Seq("key"), Seq("t")).collect().head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("theil_u2") === math.sqrt(3.0 / 21.0))
    // forecast == naive lag -> U2 exactly 1
    val nv = Seq(("g", 1L, 10.0, 0.0), ("g", 2L, 12.0, 10.0),
      ("g", 3L, 11.0, 12.0))
    val r2 = Eval.theilU2(nv.toDF("key", "t", "act", "fc"), "act", "fc",
      Seq("key"), Seq("t")).collect().head
    assert(r2.getAs[Double]("theil_u2") === 1.0)
    val const = Seq(("g", 1L, 5.0, 6.0), ("g", 2L, 5.0, 6.0))
    val r3 = Eval.theilU2(const.toDF("key", "t", "act", "fc"), "act", "fc",
      Seq("key"), Seq("t")).collect().head
    assert(r3.isNullAt(r3.fieldIndex("theil_u2")))
  }
}
