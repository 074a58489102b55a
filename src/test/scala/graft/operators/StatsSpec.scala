package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("corrRegression: exact fit on a perfect line, textbook corr") {
    // group g: y = 2x + 1 exactly -> corr 1, slope 2, intercept 1
    val line = (1 to 10).map(i => ("g", i.toDouble, 2.0 * i + 1))
    // group h: anti-correlated pair
    val anti = Seq(("h", 1.0, 4.0), ("h", 2.0, 2.0), ("h", 3.0, 0.0))
    val out = Stats.corrRegression((line ++ anti).toDF("grp", "x", "y"),
        "x", "y", Seq("grp"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("g") === ((10L, 1.0, 2.0, 1.0)))
    assert(out("h") === ((3L, -1.0, -2.0, 6.0))) // ȳ−slope·x̄ = 2+2·2
  }

  test("corrRegression: zero x-variance yields NULLs, not division blowups") {
    val df = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("grp", "x", "y")
    val r = Stats.corrRegression(df, "x", "y", Seq("grp")).collect().head
    assert(r.getLong(1) === 2L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("corrRegression: null rows drop from n and every sum") {
    val df = Seq(("g", Some(1.0), Some(2.0)), ("g", Some(2.0), Some(4.0)),
      ("g", Some(3.0), Some(6.0)), ("g", None, Some(99.0)),
      ("g", Some(99.0), None)).toDF("grp", "x", "y")
    val r = Stats.corrRegression(df, "x", "y", Seq("grp")).collect().head
    assert(r.getLong(1) === 3L)       // only complete pairs count
    assert(r.getDouble(3) === 2.0)    // slope unpolluted by the null rows
  }

  test("chiSquareCells: textbook 2x2 contingency") {
    // a1: 30 u / 10 v; a2: 10 u / 30 v — total 80
    val rows =
      Seq.fill(30)(("a1", "u")) ++ Seq.fill(10)(("a1", "v")) ++
      Seq.fill(10)(("a2", "u")) ++ Seq.fill(30)(("a2", "v"))
    val out = Stats.chiSquareCells(rows.toDF("a", "b"), "a", "b")
      .collect().map { r =>
        (r.getAs[String]("a"), r.getAs[String]("b")) ->
          (r.getAs[Long]("n_obs"), r.getAs[Double]("expected"),
            r.getAs[Double]("chi2_term"))
      }.toMap
    // every margin is 40, total 80 -> expected 20 everywhere;
    // each cell contributes (30-20)^2/20 = 5 or (10-20)^2/20 = 5
    assert(out(("a1", "u")) === ((30L, 20.0, 5.0)))
    assert(out(("a1", "v")) === ((10L, 20.0, 5.0)))
    assert(out(("a2", "v")) === ((30L, 20.0, 5.0)))
    assert(out.values.map(_._3).sum === 20.0) // the full chi² statistic
  }

  test("chiSquareCells: null categories are excluded, margins consistent") {
    val df = Seq(Some("a") -> Some("u"), Some("a") -> None, None -> Some("u"),
      Some("b") -> Some("u")).toDF("a", "b")
    val out = Stats.chiSquareCells(df, "a", "b").collect()
    assert(out.map(_.getAs[Long]("n_obs")).sum === 2L)
  }

  test("stats margins broadcast; corpus is scanned once per operator") {
    val df = (1 to 200).map(i => (s"g${i % 3}", s"s${i % 4}")).toDF("a", "b")
    val p = Stats.chiSquareCells(df, "a", "b")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"margins must broadcast:\n$p")
  }

  test("mutualInfoBins: independent uniforms score exactly zero per cell") {
    val rows = (0 until 160).map(i => ((i % 4).toDouble, ((i / 4) % 4).toDouble))
    val df = rows.toDF("x", "y")
    val out = Stats.mutualInfoBins(df, "x", "y", 4, 0.0, 4.0, 4, 0.0, 4.0)
      .collect()
    assert(out.length === 16)
    assert(out.forall(_.getAs[Double]("mi_term") === 0.0))
  }

  test("mutualInfoBins: perfect dependence sums to ln(k)") {
    val rows = (0 until 100).map(i => ((i % 4).toDouble, (i % 4).toDouble))
    val df = rows.toDF("x", "y")
    val out = Stats.mutualInfoBins(df, "x", "y", 4, 0.0, 4.0, 4, 0.0, 4.0)
      .collect()
    assert(out.length === 4) // only the diagonal is occupied
    val mi = out.map(_.getAs[Double]("mi_term")).sum
    assert(math.abs(mi - math.log(4.0)) < 1e-9, s"got $mi")
  }

  test("mutualInfoBins: out-of-range values clamp to edge bins; nulls fail") {
    val df = Seq((-5.0, 99.0), (1.5, 1.5)).toDF("x", "y")
    val out = Stats.mutualInfoBins(df, "x", "y", 4, 0.0, 4.0, 4, 0.0, 4.0)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out === Set((0, 3), (1, 1)))
    val bad = Seq((Some(1.0), Some(2.0)), (None, Some(1.0)))
      .map { case (a, b) => (a.map(Double.box).orNull, b.map(Double.box).orNull) }
      .toDF("x", "y")
    val e = intercept[Exception] {
      Stats.mutualInfoBins(bad, "x", "y", 4, 0.0, 4.0, 4, 0.0, 4.0).collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("mutualInfoBins: margins re-aggregate cells and broadcast (plan)") {
    val df = (1 to 500).map(i => ((i % 7).toDouble, (i % 5).toDouble))
      .toDF("x", "y")
    val p = Stats.mutualInfoBins(df, "x", "y", 7, 0.0, 7.0, 5, 0.0, 5.0)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"margins must broadcast:\n$p")
  }

  private def welch(a: Seq[Double], b: Seq[Double], scale: Int = 0) = {
    val df = (a.map(("a", _)) ++ b.map(("b", _))).zipWithIndex
      .map { case ((v, x), i) => (i.toLong, "g", v, x) }
      .toDF("id", "grp", "variant", "x")
    val out = Stats.welchT(df, "x", "variant", "a", "b", Seq("grp"), scale)
      .collect()
    assert(out.length === 1)
    out.head
  }

  test("welchT: matches the textbook unequal-variance value") {
    // scipy.stats.ttest_ind([1,2,3,4],[2,4,6,8], equal_var=False):
    // t = -1.7320508, Welch-Satterthwaite df = 4.4117647
    val r = welch(Seq(1, 2, 3, 4).map(_.toDouble),
      Seq(2, 4, 6, 8).map(_.toDouble))
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("mean_a") === 2.5)
    assert(r.getAs[Double]("mean_b") === 5.0)
    assert(math.abs(r.getAs[Double]("t") - (-math.sqrt(3.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("df_welch") - 4.411764705882353) < 1e-9)
  }

  test("welchT: identical arms score t = 0; degenerate arms emit NULL") {
    assert(welch(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))
      .getAs[Double]("t") === 0.0)
    // single-row arm: variance undefined
    assert(welch(Seq(1.0), Seq(1.0, 2.0)).get(5) === null)
    // both arms constant: zero denominator
    assert(welch(Seq(2.0, 2.0), Seq(3.0, 3.0)).get(5) === null)
  }

  test("welchT: scaled decimals are layout-exact") {
    val a = (1 to 300).map(i => (i % 50) + 0.25)
    val b = (1 to 300).map(i => (i % 60) + 0.75)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).zipWithIndex
      .map { case ((v, x), i) => (i.toLong, s"g${i % 2}", v, x) }
      .toDF("id", "grp", "variant", "x")
    val one = Stats.welchT(df.coalesce(1), "x", "variant", "a", "b",
      Seq("grp"), scale = 2).collect().map(r => r.getString(0) -> r.toSeq).toMap
    val many = Stats.welchT(df.repartition(17), "x", "variant", "a", "b",
      Seq("grp"), scale = 2).collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(one === many)
  }

  test("welchT: a stray variant fails loudly") {
    val df = Seq((1L, "g", "a", 1.0), (2L, "g", "c", 2.0))
      .toDF("id", "grp", "variant", "x")
    val e = intercept[Exception] {
      Stats.welchT(df, "x", "variant", "a", "b", Seq("grp")).collect()
    }
    assert(e.getMessage.contains("must be 'a' or 'b'") ||
      Option(e.getCause).exists(_.getMessage.contains("must be 'a' or 'b'")))
  }

  test("weightedMedian: crossing row, lower-median tie, zero weights") {
    val df = Seq(
      ("g1", 1.0, 1L), ("g1", 2.0, 3L), ("g1", 3.0, 1L), // W=5 → 2.0
      ("g2", 1.0, 1L), ("g2", 2.0, 1L),                  // even split → lower 1.0
      ("g3", 1.0, 0L), ("g3", 2.0, 1L),                  // zero-weight row skipped
      ("g4", 9.0, 0L)                                    // all-zero group → no row
    ).toDF("g", "v", "w")
    val out = Stats.weightedMedian(df, Seq("g"), "v", "w")
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ===
      Seq(("g1", 2.0, 5L), ("g2", 1.0, 2L), ("g3", 2.0, 1L)))
  }

  test("gini: textbook extremes and a hand-computed middle case") {
    // even distribution → 0; total concentration → (n−1)/n
    val even = Seq.fill(4)(10.0).zipWithIndex.map { case (v, i) => ("g", i, v) }
      .toDF("g", "i", "v")
    val g0 = Divergence.gini(even, Seq("g"), "v").head()
    assert(g0.getAs[Double]("gini") === 0.0 && g0.getAs[Long]("n") === 4L)
    val conc = Seq(("g", 1, 0.0), ("g", 2, 0.0), ("g", 3, 0.0), ("g", 4, 100.0))
      .toDF("g", "i", "v")
    assert(Divergence.gini(conc, Seq("g"), "v").head()
      .getAs[Double]("gini") === 0.75) // (n−1)/n
    // hand case: values 1,2,3,4 → G = (2·(1+4+9+16) − 5·10)/(4·10) = 0.25
    val mid = Seq(("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0), ("g", 4, 4.0))
      .toDF("g", "i", "v")
    assert(Divergence.gini(mid, Seq("g"), "v").head()
      .getAs[Double]("gini") === 0.25)
    // all-zero group → NULL, single row → 0
    val zero = Seq(("z", 1, 0.0)).toDF("g", "i", "v")
    assert(Divergence.gini(zero, Seq("g"), "v").head().isNullAt(2))
    val one = Seq(("o", 1, 7.0)).toDF("g", "i", "v")
    assert(Divergence.gini(one, Seq("g"), "v").head()
      .getAs[Double]("gini") === 0.0)
  }

  test("spearman: monotone ±1, textbook tie case, flat NULL") {
    // any strictly monotone map → +1 / −1 regardless of nonlinearity
    val mono = (1 to 8).map(i => ("g", i.toDouble, math.exp(i.toDouble)))
      .toDF("g", "x", "y")
    assert(Stats.spearman(mono, Seq("g"), "x", "y").head()
      .getAs[Double]("spearman") === 1.0)
    val anti = (1 to 8).map(i => ("g", i.toDouble, -math.pow(i.toDouble, 3)))
      .toDF("g", "x", "y")
    assert(Stats.spearman(anti, Seq("g"), "x", "y").head()
      .getAs[Double]("spearman") === -1.0)
    // tie case by hand: x=(1,2,2,3) → ranks (1, 2.5, 2.5, 4);
    // y=(1,3,2,4) → ranks (1,3,2,4); Pearson = 4.5/√22.5 = √0.9
    val tied = Seq(("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 2.0, 2.0),
      ("g", 3.0, 4.0)).toDF("g", "x", "y")
    val r = Stats.spearman(tied, Seq("g"), "x", "y").head()
      .getAs[Double]("spearman")
    assert(math.abs(r - math.sqrt(0.9)) < 1e-12, s"got $r")
    // constant series → undefined → NULL
    val flat = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("g", "x", "y")
    assert(Stats.spearman(flat, Seq("g"), "x", "y").head().isNullAt(2))
  }

  test("gini: negative value raises") {
    val df = Seq(("g", 1, -1.0), ("g", 2, 3.0)).toDF("g", "i", "v")
    val e = intercept[Exception] {
      Divergence.gini(df, Seq("g"), "v").collect()
    }
    assert(e.getMessage.contains("negative value") ||
      Option(e.getCause).exists(_.getMessage.contains("negative value")))
  }

  test("weightedMedian: negative weight raises") {
    val df = Seq(("g", 1.0, -1L), ("g", 2.0, 3L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Stats.weightedMedian(df, Seq("g"), "v", "w").collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("pairwiseCorr: exact ±1 on (anti)co-moving series, overlap filter") {
    val df = Seq(("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0),
        ("b", 0, 2.0), ("b", 1, 4.0), ("b", 2, 6.0),
        ("c", 0, 3.0), ("c", 1, 2.0), ("c", 2, 1.0),
        ("d", 0, 9.0)) // single point: below minOverlap, must drop
      .toDF("k", "t", "v")
    val out = Stats.pairwiseCorr(df, "k", "t", "v", minOverlap = 2)
      .collect().map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b"))
        -> r.getAs[Double]("corr")).toMap
    assert(out(("a", "b")) === 1.0)
    assert(out(("a", "c")) === -1.0)
    assert(out(("b", "c")) === -1.0)
    assert(out.size === 3) // no pair involving 'd'
  }

  test("mannWhitney: textbook U and z on a clean separation") {
    // A = {1, 2}, B = {3, 4}: A fully below B → U_A = 0
    val df = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 3.0),
        ("g", "b", 4.0))
      .toDF("g", "arm", "v")
    val r = Stats.mannWhitney(df, "v", "arm", "a", "b", Seq("g"))
      .collect().head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("u") === 0.0)
    // z = (0 − 2) / √((4/12)·5) = −2/√(5/3)
    assert(math.abs(r.getAs[Double]("z") - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-12)
  }

  test("mannWhitney: full tie gives the midpoint U and a null z") {
    val df = Seq(("g", "a", 7.0), ("g", "b", 7.0)).toDF("g", "arm", "v")
    val r = Stats.mannWhitney(df, "v", "arm", "a", "b", Seq("g"))
      .collect().head
    assert(r.getAs[Double]("u") === 0.5) // average rank 1.5 → U = 0.5
    assert(r.isNullAt(r.fieldIndex("z"))) // zero variance: everything tied
  }

  test("mannWhitney: stray arm fails loudly") {
    val df = Seq(("g", "a", 1.0), ("g", "c", 2.0)).toDF("g", "arm", "v")
    val e = intercept[Exception] {
      Stats.mannWhitney(df, "v", "arm", "a", "b", Seq("g")).collect()
    }
    assert(e.getMessage.contains("mannWhitney") ||
      Option(e.getCause).exists(_.getMessage.contains("mannWhitney")))
  }

  test("moments: textbook skew/kurtosis on the 3-point uniform, null on constant") {
    val df = Seq(("u", 1.0), ("u", 2.0), ("u", 3.0),
        ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val out = Stats.moments(df, "v", Seq("g")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    val u = out("u")
    assert(u.getAs[Double]("mean") === 2.0)
    // the closed forms run in doubles (m2 = 2/3 is not dyadic) — the
    // textbook values hold to rounding; cross-engine bit-exactness is
    // the oracle gate's job
    assert(math.abs(u.getAs[Double]("skewness")) < 1e-12)
    assert(math.abs(u.getAs[Double]("kurtosis_excess") - (-1.5)) < 1e-12)
    // JB = (3/6)·(0 + 1.5²/4)
    assert(math.abs(u.getAs[Double]("jarque_bera") - 0.5 * (2.25 / 4.0)) < 1e-10)
    val c = out("c")
    assert(c.getAs[Double]("mean") === 5.0)
    assert(c.isNullAt(c.fieldIndex("skewness"))) // zero variance
    assert(c.isNullAt(c.fieldIndex("jarque_bera")))
  }

test("anovaF: hand-computed 3-arm F") {
    // A=(1,2,3) B=(2,3,4) C=(5,6,7): SSB=26, SSW=6, F=(26/2)/(6/6)=13
    val rows = Seq(("g","A",1.0),("g","A",2.0),("g","A",3.0),
      ("g","B",2.0),("g","B",3.0),("g","B",4.0),
      ("g","C",5.0),("g","C",6.0),("g","C",7.0))
    val r = Stats.anovaF(rows.toDF("grp","arm","x"), "x", "arm", Seq("grp"))
      .collect().head
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 9L)
    assert(r.getAs[Double]("f") === 13.0)
    assert(r.getAs[Double]("ss_between") === 26.0)
    assert(r.getAs[Double]("ss_within") === 6.0)
  }

  test("anovaF: identical arms give F = 0; single arm gives NULL") {
    val same = Seq(("g","A",1.0),("g","A",2.0),("g","B",1.0),("g","B",2.0),
      ("h","A",1.0),("h","A",2.0))
    val out = Stats.anovaF(same.toDF("grp","arm","x"), "x", "arm", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Double]("f") === 0.0)
    assert(out("h").isNullAt(out("h").fieldIndex("f"))) // k = 1
  }

  test("anovaF: NULL variant fails loudly; NULL values drop") {
    val bad = Seq(("g", Option("A"), Some(1.0)), ("g", None, Some(2.0)))
      .toDF("grp","arm","x")
    val e = intercept[Exception] {
      Stats.anovaF(bad, "x", "arm", Seq("grp")).collect()
    }
    assert(e.getMessage.contains("anovaF"))
    val nulls = Seq(("g", "A", Some(1.0)), ("g", "A", Some(3.0)),
      ("g", "A", None), ("g", "B", Some(2.0)), ("g", "B", Some(4.0)))
      .toDF("grp","arm","x")
    val r = Stats.anovaF(nulls, "x", "arm", Seq("grp")).collect().head
    assert(r.getAs[Long]("n") === 4L) // the null row is out of every sum
  }

  test("kruskalWallis: hand-computed tie-free H") {
    // A=(1,2,3) B=(4,5,6): R2A=12, R2B=30, fold=348, H=3*348/42-21
    val rows = Seq(("g","A",1.0),("g","A",2.0),("g","A",3.0),
      ("g","B",4.0),("g","B",5.0),("g","B",6.0))
    val r = Stats.kruskalWallis(rows.toDF("grp","arm","x"), "x", "arm",
      Seq("grp")).collect().head
    val expected = 3.0 * (144.0 / 3.0 + 900.0 / 3.0) / (6.0 * 7.0) -
      3.0 * 7.0
    assert(r.getAs[Double]("h") === expected)
  }

  test("kruskalWallis: all-tied group yields NULL, ties correct H upward") {
    val flat = Seq(("g","A",5.0),("g","A",5.0),("g","B",5.0),("g","B",5.0))
    val r = Stats.kruskalWallis(flat.toDF("grp","arm","x"), "x", "arm",
      Seq("grp")).collect().head
    assert(r.isNullAt(r.fieldIndex("h"))) // tie correction divisor = 0
    // one tie pair straddling the arms: H must stay defined
    val some = Seq(("g","A",1.0),("g","A",2.0),("g","B",2.0),("g","B",3.0))
    val r2 = Stats.kruskalWallis(some.toDF("grp","arm","x"), "x", "arm",
      Seq("grp")).collect().head
    assert(!r2.isNullAt(r2.fieldIndex("h")))
  }

  test("ljungBox: hand-computed Q on a 4-point series") {
    // x = 1,2,3,4: rho_1 = 0.25 (centered pair sum 1.25 over variance 5),
    // Q = n(n+2)·rho²/(n−1) evaluated with the operator's own tree
    val rows = (1 to 4).map(t => ("k", t.toLong, t.toDouble))
    val r = Stats.ljungBox(rows.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), m = 1).collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("q_stat") === 4.0 * 6.0 * (0.25 * 0.25 / 3.0))
  }

  test("ljungBox: NULL on constant series and on n <= m; NULLs drop") {
    val const = Seq(("k", 1L, 5.0), ("k", 2L, 5.0), ("k", 3L, 5.0))
    val r1 = Stats.ljungBox(const.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), m = 1).collect().head
    assert(r1.isNullAt(r1.fieldIndex("q_stat")))   // zero variance
    val short = Seq(("k", 1L, 1.0), ("k", 2L, 7.0))
    val r2 = Stats.ljungBox(short.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), m = 2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("q_stat")))   // n = m: lag-2 empty
    // a NULL mid-series drops and the remaining rows re-align
    val withNull = Seq(("k", 1L, Some(1.0)), ("k", 2L, None),
      ("k", 3L, Some(2.0)), ("k", 4L, Some(3.0)), ("k", 5L, Some(4.0)))
    val r3 = Stats.ljungBox(withNull.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), m = 1).collect().head
    assert(r3.getAs[Long]("n") === 4L)
    assert(r3.getAs[Double]("q_stat") === 4.0 * 6.0 * (0.25 * 0.25 / 3.0))
  }

  test("kendallTau: hand-computed tau with and without ties") {
    // no ties: x=(1,2,3), y=(1,3,2) -> C=2, D=1, tau = 1/3
    val a = Seq(("a", 1.0, 1.0), ("a", 2.0, 3.0), ("a", 3.0, 2.0))
    // x-tie: x=(1,1,2), y=(1,2,3) -> C=2, D=0, Tx=1 -> 2/sqrt(6)
    val b = Seq(("b", 1.0, 1.0), ("b", 1.0, 2.0), ("b", 2.0, 3.0))
    // monotone: tau = 1
    val c = Seq(("c", 1.0, 10.0), ("c", 2.0, 20.0), ("c", 3.0, 30.0))
    val out = Stats.kendallTau((a ++ b ++ c).toDF("grp", "x", "y"),
        Seq("grp"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_pairs") === 3L)
    assert(out("a").getAs[Double]("tau") === 1.0 / math.sqrt(9.0))
    assert(out("b").getAs[Double]("tau") === 2.0 / math.sqrt(2.0 * 3.0))
    assert(out("c").getAs[Double]("tau") === 1.0)
  }

  test("kendallTau: all-tied side and singleton group yield NULL tau") {
    val rows = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0), ("g", 5.0, 3.0),
      ("s", 1.0, 1.0))
    val out = Stats.kendallTau(rows.toDF("grp", "x", "y"), Seq("grp"),
        "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").isNullAt(out("g").fieldIndex("tau"))) // C+D+Ty = 0
    assert(out("s").getAs[Long]("n_pairs") === 0L)
    assert(out("s").isNullAt(out("s").fieldIndex("tau")))
  }

  test("pacf: unrolled Durbin-Levinson matches the hand recursion") {
    // x = 1,2,3,4: rho = (0.25, -0.3, -0.45) by the exact integer forms
    val rows = (1 to 4).map(t => ("k", t.toLong, t.toDouble))
    val r = Stats.pacf(rows.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    val r1 = 20.0 / 80.0
    val r2 = -24.0 / 80.0
    val r3 = -36.0 / 80.0
    assert(r.getAs[Double]("pacf_1") === r1)
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(r.getAs[Double]("pacf_2") === phi22)
    val phi21 = r1 - phi22 * r1
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
      (1.0 - phi21 * r1 - phi22 * r2)
    assert(r.getAs[Double]("pacf_3") === phi33)
  }

  test("pacf: NULL on constant series and short series") {
    val const = Seq(("k", 1L, 5.0), ("k", 2L, 5.0), ("k", 3L, 5.0),
      ("k", 4L, 5.0), ("k", 5L, 5.0))
    val r1 = Stats.pacf(const.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("pacf_1")))
    val short = Seq(("k", 1L, 1.0), ("k", 2L, 3.0), ("k", 3L, 2.0))
    val r2 = Stats.pacf(short.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    assert(!r2.isNullAt(r2.fieldIndex("pacf_2")))  // n = 3 > 2
    assert(r2.isNullAt(r2.fieldIndex("pacf_3")))   // n = 3: lag-3 empty
  }

  test("theilSen: outlier-proof slope where least squares bends") {
    // y = x on 4 points plus one wild outlier: TS slope stays exactly 1
    val rows = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0),
      ("g", 4.0, 4.0), ("g", 5.0, 100.0))
    val r = Stats.theilSen(rows.toDF("grp", "x", "y"), Seq("grp"), "x", "y")
      .collect().head
    assert(r.getAs[Long]("n_slopes") === 10L)
    assert(r.getAs[Double]("ts_slope") === 1.0)
    assert(r.getAs[Double]("ts_intercept") === 0.0)  // median residual
  }

  test("theilSen: even-count median averages the two middles; vertical NULL") {
    // slopes sorted (1,1,1,33,49,97): middles 1 and 33 -> 17
    val rows = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0),
      ("g", 4.0, 100.0))
    val r = Stats.theilSen(rows.toDF("grp", "x", "y"), Seq("grp"), "x", "y")
      .collect().head
    assert(r.getAs[Long]("n_slopes") === 6L)
    assert(r.getAs[Double]("ts_slope") === (1.0 + 33.0) / 2.0)
    val vert = Seq(("v", 2.0, 1.0), ("v", 2.0, 5.0))
    val rv = Stats.theilSen(vert.toDF("grp", "x", "y"), Seq("grp"), "x", "y")
      .collect().head
    assert(rv.getAs[Long]("n_slopes") === 0L)
    assert(rv.isNullAt(rv.fieldIndex("ts_slope")))
  }

  test("dickeyFuller: hand-computed beta and t on a mean-reverting series") {
    // x = 1,2,1,3,1: (lag, diff) pairs give A=-20, B=11, C=40
    val rows = Seq(1.0, 2.0, 1.0, 3.0, 1.0).zipWithIndex
      .map { case (v, t) => ("k", t.toLong, v) }
    val r = Stats.dickeyFuller(rows.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    assert(r.getAs[Long]("n_pairs") === 4L)
    val (a, b, c) = (-20.0, 11.0, 40.0)
    val beta = a / b
    val se2 = (c - a * a / b) / ((4.0 - 2.0) * b)
    assert(r.getAs[Double]("df_beta") === beta)
    assert(r.getAs[Double]("df_t") === beta / math.sqrt(se2))
    assert(beta < 0.0)  // mean-reverting: negative unit-root coefficient
  }

  test("dickeyFuller: perfect fit and short series yield NULL t") {
    // x = 1,2,1,2,1: residuals are exactly 0 -> se undefined
    val perfect = Seq(1.0, 2.0, 1.0, 2.0, 1.0).zipWithIndex
      .map { case (v, t) => ("k", t.toLong, v) }
    val r1 = Stats.dickeyFuller(perfect.toDF("key", "t", "x"), "x",
      Seq("key"), Seq("t")).collect().head
    assert(r1.getAs[Double]("df_beta") === -2.0)
    assert(r1.isNullAt(r1.fieldIndex("df_t")))
    val short = Seq(("k", 1L, 1.0), ("k", 2L, 5.0))  // one pair
    val r2 = Stats.dickeyFuller(short.toDF("key", "t", "x"), "x",
      Seq("key"), Seq("t")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("df_beta")))
  }

  test("mannKendall: hand-computed S and tie-corrected z") {
    // monotone: S = 10 over C(5,2) pairs, no ties
    val up = (1 to 5).map(t => ("u", t.toLong, t.toDouble))
    // with a tie at 2: S = 5, tie term 2·1·9 = 18
    val tied = Seq(("t", 1L, 1.0), ("t", 2L, 2.0), ("t", 3L, 2.0),
      ("t", 4L, 3.0))
    val out = Stats.mannKendall((up ++ tied).toDF("key", "tt", "x"), "x",
        Seq("key"), Seq("tt"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("u").getAs[Long]("s_stat") === 10L)
    assert(out("u").getAs[Double]("mk_z") ===
      (10.0 - 1.0) / math.sqrt(300.0 / 18.0))
    assert(out("t").getAs[Long]("s_stat") === 5L)
    assert(out("t").getAs[Double]("mk_z") ===
      (5.0 - 1.0) / math.sqrt(138.0 / 18.0))
  }

  test("mannKendall: all-tied NULL, balanced series z = 0") {
    val rows = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0),
      ("b", 1L, 1.0), ("b", 2L, 2.0), ("b", 3L, 1.0))
    val out = Stats.mannKendall(rows.toDF("key", "tt", "x"), "x",
        Seq("key"), Seq("tt"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("c").isNullAt(out("c").fieldIndex("mk_z"))) // zero variance
    assert(out("b").getAs[Long]("s_stat") === 0L)
    assert(out("b").getAs[Double]("mk_z") === 0.0)
  }

  test("runsTest: hand-computed z on an alternating series") {
    // diffs +,-,+,-: 4 runs of 2 up / 2 down -> z = 1/sqrt(2/3)
    val rows = Seq(1.0, 2.0, 1.0, 2.0, 1.0).zipWithIndex
      .map { case (v, t) => ("k", t.toLong, v) }
    val r = Stats.runsTest(rows.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    assert(r.getAs[Long]("n_up") === 2L)
    assert(r.getAs[Long]("n_down") === 2L)
    assert(r.getAs[Long]("runs") === 4L)
    val mu = 8.0 / 4.0 + 1.0
    val sig2 = 32.0 / 48.0
    assert(r.getAs[Double]("runs_z") === (4.0 - mu) / math.sqrt(sig2))
  }

  test("runsTest: one-sided series yields NULL z; zero diffs drop") {
    val trend = (1 to 6).map(t => ("k", t.toLong, t.toDouble))
    val r1 = Stats.runsTest(trend.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    assert(r1.getAs[Long]("runs") === 1L)
    assert(r1.isNullAt(r1.fieldIndex("runs_z")))   // n_down = 0
    val flat = Seq(("k", 1L, 1.0), ("k", 2L, 1.0), ("k", 3L, 2.0))
    val r2 = Stats.runsTest(flat.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t")).collect().head
    assert(r2.getAs[Long]("n_up") === 1L)          // the 0-diff dropped
    assert(r2.getAs[Long]("n_down") === 0L)
  }

  test("grangerLag1: hand-computed normal equations") {
    // y = 1,2,3,5,4 with x = 10,20,10,20,30: centered x4 sums give
    // det = 10400, gamma = -1080/10400, beta = 7200/10400
    val y = Seq(1.0, 2.0, 3.0, 5.0, 4.0)
    val x = Seq(10.0, 20.0, 10.0, 20.0, 30.0)
    val rows = y.indices.map(t => ("k", t.toLong, y(t), x(t)))
    val r = Stats.grangerLag1(rows.toDF("key", "t", "y", "x"), "y", "x",
      Seq("key"), Seq("t")).collect().head
    assert(r.getAs[Long]("n_pairs") === 4L)
    val det = 10400.0
    val gamma = -1080.0 / det
    val beta = 7200.0 / det
    assert(r.getAs[Double]("granger_gamma") === gamma)
    assert(r.getAs[Double]("ar_beta") === beta)
    val ssr = 20.0 - beta * 18.0 - gamma * 0.0
    val varG = ssr * 35.0 / ((4.0 - 3.0) * det)
    assert(r.getAs[Double]("granger_t") === gamma / math.sqrt(varG))
  }

  test("grangerLag1: constant regressor and short series yield NULLs") {
    // constant x: det = 0 -> everything NULL
    val rows = (0 to 5).map(t => ("k", t.toLong, t.toDouble, 7.0))
    val r1 = Stats.grangerLag1(rows.toDF("key", "t", "y", "x"), "y", "x",
      Seq("key"), Seq("t")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("granger_gamma")))
    // 3 pairs: saturated fit -> guarded by n >= 4
    val short = (0 to 3).map(t => ("k", t.toLong, t * 1.5, t * 2.0))
    val r2 = Stats.grangerLag1(short.toDF("key", "t", "y", "x"), "y", "x",
      Seq("key"), Seq("t")).collect().head
    assert(r2.getAs[Long]("n_pairs") === 3L)
    assert(r2.isNullAt(r2.fieldIndex("granger_t")))
  }

  test("effectSizes: hand-computed d, g, and Cliff's delta") {
    // A = (1,2,3), B = (4,5,6,7): pooled sp2 = 7/5, gap = -3.5,
    // disjoint arms -> delta = -1
    val rows = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 4.0), ("g", "b", 5.0), ("g", "b", 6.0), ("g", "b", 7.0))
    val r = Stats.effectSizes(rows.toDF("grp", "arm", "x"), "x", "arm",
      "a", "b", Seq("grp")).collect().head
    val gap = 6.0 / 3.0 - 22.0 / 4.0
    val sp2 = (6.0 / 3.0 + 20.0 / 4.0) / 5.0
    val d = gap / math.sqrt(sp2)
    assert(r.getAs[Double]("cohen_d") === d)
    assert(r.getAs[Double]("hedges_g") === d * (1.0 - 3.0 / (4.0 * 5.0 - 1.0)))
    assert(r.getAs[Double]("cliffs_delta") === -1.0)
  }

  test("effectSizes: fully tied arms -> delta 0, NULL d on zero variance") {
    val rows = Seq(("g", "a", 1.0), ("g", "a", 1.0), ("g", "b", 1.0),
      ("g", "b", 1.0))
    val r = Stats.effectSizes(rows.toDF("grp", "arm", "x"), "x", "arm",
      "a", "b", Seq("grp")).collect().head
    assert(r.getAs[Double]("cliffs_delta") === 0.0)
    assert(r.isNullAt(r.fieldIndex("cohen_d")))
    assert(r.isNullAt(r.fieldIndex("hedges_g")))
  }

  test("cramersV: perfect association is 1, independence is 0") {
    val perfect = Seq.fill(5)(("g", "a1", "b1")) ++
      Seq.fill(5)(("g", "a2", "b2"))
    val r1 = Stats.cramersV(perfect.toDF("grp", "a", "b"), "a", "b",
      Seq("grp")).collect().head
    assert(r1.getAs[Long]("n") === 10L)
    assert(r1.getAs[Long]("dof") === 1L)
    assert(r1.getAs[Double]("chi2") === 10.0)
    assert(r1.getAs[Double]("cramers_v") === 1.0)
    // uniform 2x2: chi2 = 0 (zero cells charged through the identity)
    val indep = Seq(("g", "a1", "b1"), ("g", "a1", "b2"),
      ("g", "a2", "b1"), ("g", "a2", "b2"))
    val r2 = Stats.cramersV(indep.toDF("grp", "a", "b"), "a", "b",
      Seq("grp")).collect().head
    assert(r2.getAs[Double]("chi2") === 0.0)
    assert(r2.getAs[Double]("cramers_v") === 0.0)
  }

  test("cramersV: single-category side yields NULL V") {
    val rows = Seq(("g", "a1", "b1"), ("g", "a1", "b2"))
    val r = Stats.cramersV(rows.toDF("grp", "a", "b"), "a", "b",
      Seq("grp")).collect().head
    assert(r.getAs[Long]("dof") === 0L)
    assert(r.isNullAt(r.fieldIndex("cramers_v")))
  }

  test("bhAdjust: textbook step-up adjustment") {
    // suffix-min of m·p/j: (0.02, 0.022, 0.0266.., 0.04) -> adj =
    // (0.02, 0.022, 0.0266.., 0.04); all significant at alpha = 0.05
    val rows = Seq(("f", 1L, 0.005), ("f", 2L, 0.011), ("f", 3L, 0.02),
      ("f", 4L, 0.04))
    val out = Stats.bhAdjust(rows.toDF("fam", "id", "p"), Seq("fam"), "p",
        "id", alpha = 0.05)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(1L).getAs[Int]("p_rank") === 1)
    assert(out(1L).getAs[Double]("p_adj") === 0.005 * 4.0 / 1.0)
    assert(out(2L).getAs[Double]("p_adj") === 0.011 * 4.0 / 2.0)
    assert(out(4L).getAs[Double]("p_adj") === 0.04 * 4.0 / 4.0)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_).getAs[Boolean]("significant")))
  }

  test("bhAdjust: equal adjusted values on a flat spectrum; NULL p excluded") {
    // p = (0.01..0.04): every candidate m·p/j = 0.04 -> all adj 0.04
    val rows = Seq(("f", 1L, Some(0.01)), ("f", 2L, Some(0.02)),
      ("f", 3L, Some(0.03)), ("f", 4L, Some(0.04)), ("f", 5L, None))
    val out = Stats.bhAdjust(rows.toDF("fam", "id", "p"), Seq("fam"), "p",
        "id")
      .collect().map(r => r.getLong(1) -> r).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id).getAs[Double]("p_adj") === 0.04)  // m = 4, not 5
    }
    assert(out(5L).isNullAt(out(5L).fieldIndex("p_adj")))
    assert(out(5L).isNullAt(out(5L).fieldIndex("p_rank")))
  }

  test("wilcoxonSignedRank: hand-computed W+ and z with ties and a zero") {
    // d = 2,-1,3,-1,5,0 -> n=5 (zero drops); |d| doubled ranks:
    // ties at 1 -> 3,3; then 6, 8, 10; 2W+ = 6+8+10 = 24
    val pairs = Seq((3.0, 1.0), (1.0, 2.0), (4.0, 1.0), (2.0, 3.0),
      (6.0, 1.0), (9.0, 9.0))
    val rows = pairs.map { case (x, y) => ("g", x, y) }
    val r = Stats.wilcoxonSignedRank(rows.toDF("grp", "x", "y"), "x", "y",
      Seq("grp")).collect().head
    assert(r.getAs[Long]("n_nonzero") === 5L)
    assert(r.getAs[Double]("w_plus") === 12.0)
    val sig2 = 5.0 * (5.0 + 1.0) * (2.0 * 5.0 + 1.0) / 24.0 - 6.0 / 48.0
    assert(r.getAs[Double]("wsr_z") ===
      (12.0 - 5.0 * (5.0 + 1.0) / 4.0) / math.sqrt(sig2))
  }

  test("wilcoxonSignedRank: single pair and all-zero group") {
    // one positive d: W+ = 1, mu = 0.5, var = 0.25 -> z = 1
    val rows = Seq(("g", 2.0, 1.0), ("h", 5.0, 5.0))
    val out = Stats.wilcoxonSignedRank(rows.toDF("grp", "x", "y"), "x", "y",
      Seq("grp")).collect()
    assert(out.length === 1)  // all-zero group h vanishes (documented)
    assert(out.head.getString(0) === "g")
    assert(out.head.getAs[Double]("wsr_z") === 1.0)
  }

  test("brownForsythe: hand-computed F on median deviations") {
    // a: 1,2,3,4 (m2=5, |2x-5| = 3,1,1,3); b: 10,20,30 (m2=40 ->
    // 20,0,20); anovaF fold = 64/4 + 1600/3 on n=7, G=48, Q=820
    val rows = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "a", 4.0), ("g", "b", 10.0), ("g", "b", 20.0), ("g", "b", 30.0))
    val r = Stats.brownForsythe(rows.toDF("grp", "arm", "x"), "x", "arm",
      Seq("grp")).collect().head
    assert(r.getAs[Long]("k") === 2L && r.getAs[Long]("n") === 7L)
    val fold = (8.0 * 8.0) / 4.0 + (40.0 * 40.0) / 3.0
    val ssb = fold - 48.0 * 48.0 / 7.0
    val ssw = 820.0 - fold
    assert(r.getAs[Double]("ss_between") === ssb)
    assert(r.getAs[Double]("ss_within") === ssw)
    assert(r.getAs[Double]("f") === (ssb / 1.0) / (ssw / 5.0))
  }

  test("brownForsythe: equal spreads give F near 0; one arm yields NULL") {
    // identical shapes -> per-arm deviations 2,0,2 -> ssb = 0 -> f = 0
    val rows = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
      ("g", "b", 11.0), ("g", "b", 12.0), ("g", "b", 13.0))
    val r = Stats.brownForsythe(rows.toDF("grp", "arm", "x"), "x", "arm",
      Seq("grp")).collect().head
    assert(r.getAs[Double]("f") === 0.0)
    val solo = Seq(("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 5.0))
    val r2 = Stats.brownForsythe(solo.toDF("grp", "arm", "x"), "x", "arm",
      Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("f")))  // k < 2
  }

  test("cramerVonMises: hand-computed T on interleaved/identical/disjoint") {
    def run(rows: Seq[(String, String, Double)]) =
      Stats.cramerVonMises(rows.toDF("grp", "arm", "x"), "x", "arm",
        "a", "b", Seq("grp")).collect().head
    // interleaved 1,3 vs 2,4: U = 12, T = 12/16 - 15/24 = 0.125
    val inter = run(Seq(("g", "a", 1.0), ("g", "a", 3.0),
      ("g", "b", 2.0), ("g", "b", 4.0)))
    assert(inter.getAs[Double]("cvm_t") ===
      48.0 / (((4.0 * 2.0) * 2.0) * 4.0) -
        ((4.0 * 2.0) * 2.0 - 1.0) / (6.0 * 4.0))
    // identical arms: midranks cancel exactly -> T = 0
    val same = run(Seq(("g", "a", 1.0), ("g", "a", 2.0),
      ("g", "b", 1.0), ("g", "b", 2.0)))
    assert(same.getAs[Double]("cvm_t") === 0.0)
    // fully separated arms: the n=m=2 maximum 0.375
    val apart = run(Seq(("g", "a", 1.0), ("g", "a", 2.0),
      ("g", "b", 3.0), ("g", "b", 4.0)))
    assert(apart.getAs[Double]("cvm_t") === 0.375)
  }

  test("cramerVonMises: empty arm yields NULL; alien variant raises") {
    val solo = Seq(("g", "a", 1.0), ("g", "a", 2.0))
    val r = Stats.cramerVonMises(solo.toDF("grp", "arm", "x"), "x", "arm",
      "a", "b", Seq("grp")).collect().head
    assert(r.isNullAt(r.fieldIndex("cvm_t")))
    val bad = Seq(("g", "a", 1.0), ("g", "zzz", 2.0))
    intercept[Exception] {
      Stats.cramerVonMises(bad.toDF("grp", "arm", "x"), "x", "arm",
        "a", "b", Seq("grp")).collect()
    }
  }

  test("blandAltman: hand-computed bias and limits of agreement") {
    val rows = Seq(("g", 12.0, 10.0), ("g", 14.0, 10.0), ("g", 16.0, 10.0))
    val r = Stats.blandAltman(rows.toDF("grp", "x", "y"), "x", "y",
      Seq("grp")).collect().head
    assert(r.getAs[Double]("ba_bias") === 4.0)
    assert(r.getAs[Double]("ba_sd") === 2.0)
    assert(r.getAs[Double]("ba_lower") === 4.0 - 1.96 * 2.0)
    assert(r.getAs[Double]("ba_upper") === 4.0 + 1.96 * 2.0)
    val solo = Seq(("g", 5.0, 3.0))
    val r2 = Stats.blandAltman(solo.toDF("grp", "x", "y"), "x", "y",
      Seq("grp")).collect().head
    assert(r2.getAs[Double]("ba_bias") === 2.0)
    assert(r2.isNullAt(r2.fieldIndex("ba_sd")))
  }

  test("processCapability: hand-computed Cp/Cpk") {
    val rows = Seq(("g", 8.0), ("g", 10.0), ("g", 12.0))
    val r = Stats.processCapability(rows.toDF("grp", "v"), "v", Seq("grp"),
      lsl = 4.0, usl = 14.0).collect().head
    assert(r.getAs[Double]("cp") === 10.0 / (6.0 * 2.0))
    assert(r.getAs[Double]("cpk") === 4.0 / (3.0 * 2.0))
  }

  test("oddsRiskRatio: hand-computed OR/RR; zero cell yields NULL OR") {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A: 3 success 1 fail; B: 1 success 3 fail -> OR = 9, RR = 3
    val rows = Seq.fill(3)(("g", "A", 1L)) ++ Seq(("g", "A", 0L)) ++
      Seq(("g", "B", 1L)) ++ Seq.fill(3)(("g", "B", 0L))
    val r = Stats.oddsRiskRatio(rows.toDF("grp", "arm", "y"), "y", "arm",
      "A", "B", Seq("grp")).collect().head
    assert(r.getAs[Double]("odds_ratio") === (3.0 * 3.0) / (1.0 * 1.0))
    assert(r.getAs[Double]("log_or") === r10(math.log(9.0)))
    assert(r.getAs[Double]("se_log_or") ===
      math.sqrt(1.0 / 3.0 + 1.0 / 1.0 + 1.0 / 1.0 + 1.0 / 3.0))
    assert(r.getAs[Double]("risk_ratio") ===
      (3.0 / (3.0 + 1.0)) / (1.0 / (1.0 + 3.0)))
    // a zero cell: OR undefined, RR still defined when sb > 0
    val zc = Seq(("g", "A", 1L), ("g", "A", 1L), ("g", "B", 1L),
      ("g", "B", 0L))
    val r2 = Stats.oddsRiskRatio(zc.toDF("grp", "arm", "y"), "y", "arm",
      "A", "B", Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("odds_ratio")))  // f_a = 0
    assert(r2.getAs[Double]("risk_ratio") === 1.0 / 0.5)
  }

  test("cochranArmitage: rising rates give z = 2 on the toy ladder") {
    // doses 1,2,3 with 0/2, 1/2, 2/2 successes: num=12, var=36
    val rows = Seq(("g", 1L, 0L), ("g", 1L, 0L), ("g", 2L, 1L),
      ("g", 2L, 0L), ("g", 3L, 1L), ("g", 3L, 1L))
    val r = Stats.cochranArmitage(rows.toDF("grp", "dose", "y"), "y",
      "dose", Seq("grp")).collect().head
    assert(r.getAs[Long]("n") === 6L && r.getAs[Long]("k_doses") === 3L)
    assert(r.getAs[Double]("ca_z") === 2.0)
    // all successes: no variance; single dose: no weight variance
    val flat = Seq(("g", 1L, 1L), ("g", 2L, 1L))
    val r2 = Stats.cochranArmitage(flat.toDF("grp", "dose", "y"), "y",
      "dose", Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("ca_z")))
    val one = Seq(("g", 5L, 1L), ("g", 5L, 0L))
    val r3 = Stats.cochranArmitage(one.toDF("grp", "dose", "y"), "y",
      "dose", Seq("grp")).collect().head
    assert(r3.isNullAt(r3.fieldIndex("ca_z")))
  }

  test("twoProportionZ: hand-computed pooled z; degenerate NULL") {
    // A: 3/5 convert; B: 1/5: pooled 4/10
    val rows = (1 to 5).map(i => ("g", "A", if (i <= 3) 1L else 0L)) ++
      (1 to 5).map(i => ("g", "B", if (i <= 1) 1L else 0L))
    val r = Stats.twoProportionZ(rows.toDF("grp", "arm", "y"), "y", "arm",
      "A", "B", Seq("grp")).collect().head
    assert(r.getAs[Long]("n_a") === 5L && r.getAs[Long]("n_b") === 5L)
    assert(r.getAs[Double]("rate_a") === 3.0 / 5.0)
    assert(r.getAs[Double]("rate_b") === 1.0 / 5.0)
    val pooled = 4.0 / 10.0
    val se2 = pooled * (1.0 - pooled) * (1.0 / 5.0 + 1.0 / 5.0)
    assert(r.getAs[Double]("prop_z") ===
      (3.0 / 5.0 - 1.0 / 5.0) / math.sqrt(se2))
    // all failures: zero pooled variance
    val flat = Seq(("g", "A", 0L), ("g", "B", 0L))
    val r2 = Stats.twoProportionZ(flat.toDF("grp", "arm", "y"), "y", "arm",
      "A", "B", Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("prop_z")))
  }

  test("hhi: equal members give 1/k, a monopoly gives 1") {
    val rows = Seq(("g", "a", 25.0), ("g", "b", 25.0), ("g", "c", 25.0),
      ("g", "d", 25.0), ("m", "solo", 7.0),
      ("s", "big", 90.0), ("s", "small", 10.0))
    val out = Stats.hhi(rows.toDF("grp", "member", "v"), "v", "member",
        Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Double]("hhi") === 0.25)       // 4 equal -> 1/4
    assert(out("m").getAs[Double]("hhi") === 1.0)        // monopoly
    assert(out("s").getAs[Double]("hhi") ===
      (90.0 * 90.0 + 10.0 * 10.0) / (100.0 * 100.0))     // 0.82
    assert(out("s").getAs[Double]("total") === 100.0)
    // zero total -> NULL; negative member raises
    val z = Stats.hhi(Seq(("g", "a", 0.0)).toDF("grp", "member", "v"),
      "v", "member", Seq("grp")).collect().head
    assert(z.isNullAt(z.fieldIndex("hhi")))
    intercept[Exception] {
      Stats.hhi(Seq(("g", "a", -1.0)).toDF("grp", "member", "v"),
        "v", "member", Seq("grp")).collect()
    }
  }

  test("trimmedMean: positional trim, exact kept sum") {
    // 1..10 at 10%/side: drop 1 and 10, mean(2..9) = 5.5
    val ten = (1 to 10).map(i => ("g", i.toDouble))
    val tri = Seq(("h", 1.0), ("h", 100.0), ("h", 3.0)) // 40%/side -> median row
    val out = Stats.trimmedMean((ten ++ tri).toDF("grp", "v"), "v",
        Seq("grp"), trimPm = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Long]("n_kept") === 8L)
    assert(out("g").getAs[Double]("trimmed_mean") === (44.0 / 8.0) / 1.0)
    // h at 100 pm: t = floor(3*100/1000) = 0 -> plain mean
    assert(out("h").getAs[Double]("trimmed_mean") === (104.0 / 3.0) / 1.0)
    val med = Stats.trimmedMean(tri.toDF("grp", "v"), "v", Seq("grp"),
      trimPm = 400).collect().head
    assert(med.getAs[Long]("n_kept") === 1L)
    assert(med.getAs[Double]("trimmed_mean") === 3.0) // the middle row
  }

  test("hillTail: hand-computed H over a geometric tail") {
    def r10(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 16,8,4,2,1 with k=2: threshold 4, H = (ln4 + ln2)/2
    val rows = Seq(16.0, 8.0, 4.0, 2.0, 1.0).map(("g", _)) ++
      Seq(("s", 9.0), ("s", 3.0)) ++              // n < k+1 -> NULL
      Seq(("t", 5.0), ("t", 5.0), ("t", 5.0))     // tied top -> H = 0
    val out = Stats.hillTail(rows.toDF("grp", "v"), "v", Seq("grp"), k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val h = (0.0 + r10(math.log(16.0 / 4.0)) + r10(math.log(8.0 / 4.0))) / 2.0
    assert(out("g").getAs[Double]("hill_h") === h)
    assert(out("g").getAs[Double]("hill_alpha") === 1.0 / h)
    assert(out("s").isNullAt(out("s").fieldIndex("hill_h")))
    assert(out("t").getAs[Double]("hill_h") === 0.0)
    assert(out("t").isNullAt(out("t").fieldIndex("hill_alpha")))
  }

  test("pageTrend: perfect monotone trend hits the maximum L") {
    // A<B<C in all 3 blocks: R2 = 6,12,18, j = 1,2,3 -> L = 42 = nΣj²
    val perfect = for {
      b <- Seq("b1", "b2", "b3"); (t, x) <- Seq(("A", 1.0), ("B", 2.0), ("C", 3.0))
    } yield ("g", b, t, x)
    val r = Stats.pageTrend(perfect.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Double]("page_l") === 42.0)
    val mu = ((3.0 * 3.0) * 4.0) * 4.0 / 4.0
    val sig2 = (((3.0 * (3.0 * 3.0)) * (4.0 * 4.0)) * (3.0 - 1.0)) / 144.0
    assert(r.getAs[Double]("page_z") === (42.0 - mu) / math.sqrt(sig2))
    // reversed trend: L at its minimum, z negative
    val rev = for {
      b <- Seq("b1", "b2"); (t, x) <- Seq(("A", 3.0), ("B", 2.0), ("C", 1.0))
    } yield ("g", b, t, x)
    val r2 = Stats.pageTrend(rev.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r2.getAs[Double]("page_l") === 2.0 * (3.0 + 4.0 + 3.0))
    assert(r2.getAs[Double]("page_z") < 0.0)
  }

  test("friedman: hand-computed Q with ties and an incomplete block") {
    // b1, b2: A<B<C (ranks 1,2,3); b3: all tied (2r = 4 each);
    // b4 incomplete -> dropped. Doubled: num = 32, den = 16, Q = 4
    val rows = Seq(
      ("g", "b1", "A", 1.0), ("g", "b1", "B", 2.0), ("g", "b1", "C", 3.0),
      ("g", "b2", "A", 10.0), ("g", "b2", "B", 20.0), ("g", "b2", "C", 30.0),
      ("g", "b3", "A", 5.0), ("g", "b3", "B", 5.0), ("g", "b3", "C", 5.0),
      ("g", "b4", "A", 1.0), ("g", "b4", "B", 2.0))
    val r = Stats.friedman(rows.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Double]("friedman_q") === 4.0)
  }

  test("kendallW: unanimous ranking gives W = 1; partial ties scale Q") {
    val perfect = for {
      b <- Seq("b1", "b2", "b3"); (t, x) <- Seq(("A", 1.0), ("B", 2.0), ("C", 3.0))
    } yield ("g", b, t, x)
    val r = Stats.kendallW(perfect.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r.getAs[Double]("kendall_w") === 6.0 / (3.0 * 2.0)) // = 1
    // the friedman tied-block case: Q = 4, n = 3 -> W = 4/6
    val rows = Seq(
      ("g", "b1", "A", 1.0), ("g", "b1", "B", 2.0), ("g", "b1", "C", 3.0),
      ("g", "b2", "A", 10.0), ("g", "b2", "B", 20.0), ("g", "b2", "C", 30.0),
      ("g", "b3", "A", 5.0), ("g", "b3", "B", 5.0), ("g", "b3", "C", 5.0))
    val r2 = Stats.kendallW(rows.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r2.getAs[Double]("kendall_w") === 4.0 / (3.0 * 2.0))
  }

  test("friedman: perfect consistency hits n(k-1); all-tied yields NULL") {
    val perfect = for {
      b <- Seq("b1", "b2", "b3"); (t, x) <- Seq(("A", 1.0), ("B", 2.0), ("C", 3.0))
    } yield ("g", b, t, x)
    val r = Stats.friedman(perfect.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r.getAs[Double]("friedman_q") === 6.0)  // n(k-1) = 3*2
    val tied = for {
      b <- Seq("b1", "b2"); t <- Seq("A", "B", "C")
    } yield ("g", b, t, 7.0)
    val r2 = Stats.friedman(tied.toDF("grp", "blk", "treat", "x"), "x",
      "blk", "treat", k = 3, Seq("grp")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("friedman_q")))
  }

  test("durbinWatson: trend hugs 0, alternation hugs 4, constant NULL") {
    def run(xs: Seq[Double]) = Stats.durbinWatson(
      xs.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }
        .toDF("key", "t", "v"), "v", Seq("key"), Seq("t")).collect().head
    val trend = run(Seq(1.0, 2.0, 3.0, 4.0))
    assert(trend.getAs[Double]("dw") === (4.0 * 3.0) / (4.0 * 30.0 - 100.0))
    val alt = run(Seq(1.0, 3.0, 1.0, 3.0))
    assert(alt.getAs[Double]("dw") === (4.0 * 12.0) / (4.0 * 20.0 - 64.0))
    val const = run(Seq(5.0, 5.0, 5.0))
    assert(const.isNullAt(const.fieldIndex("dw")))
  }

  test("rollSpread: pure bid-ask bounce recovers a spread; trend is NULL") {
    // 10,11,10,11,10 -> diffs +1,-1,+1,-1, cov numerator c = -8 on n=3
    val bounce = Seq(10.0, 11.0, 10.0, 11.0, 10.0).zipWithIndex
      .map { case (p, t) => ("g", t.toLong, p) }
    val r = Stats.rollSpread(bounce.toDF("key", "t", "p"), "p", Seq("key"),
      Seq("t")).collect().head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("roll_spread") ===
      2.0 * math.sqrt(-((-8.0) / (3.0 * 3.0))) / 1.0)
    // monotone trend: diffs constant, cov 0 -> undefined
    val trend = (1 to 5).map(i => ("g", i.toLong, i.toDouble))
    val r2 = Stats.rollSpread(trend.toDF("key", "t", "p"), "p", Seq("key"),
      Seq("t")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("roll_spread")))
  }

  test("archLm: hand-computed squared-residual regression") {
    // u = 1,2,1,3,2 -> s = 1,4,1,9,4; pairs (x=lag s, y=s):
    // Cxx = 171, Cyy = 132, Cxy = -58 on n = 4
    val rows = Seq(1.0, 2.0, 1.0, 3.0, 2.0).zipWithIndex
      .map { case (v, t) => ("k", t.toLong, v) }
    val r = Stats.archLm(rows.toDF("key", "t", "v"), "v", Seq("key"),
      Seq("t")).collect().head
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Double]("arch_beta") === -58.0 / 171.0)
    assert(r.getAs[Double]("arch_lm") ===
      4.0 * ((-58.0 * -58.0) / (171.0 * 132.0)))
  }

  test("archLm: constant |u| and short series yield NULLs") {
    val flat = (0 to 4).map(t => ("k", t.toLong, 5.0))
    val r1 = Stats.archLm(flat.toDF("key", "t", "v"), "v", Seq("key"),
      Seq("t")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("arch_lm")))  // Cxx = 0
    val short = Seq(("k", 0L, 1.0), ("k", 1L, 2.0), ("k", 2L, 3.0))
    val r2 = Stats.archLm(short.toDF("key", "t", "v"), "v", Seq("key"),
      Seq("t")).collect().head
    assert(r2.getAs[Long]("n_pairs") === 2L)
    assert(r2.isNullAt(r2.fieldIndex("arch_lm")))  // n < 3
  }

  test("chowTest: hand-computed F at a known break") {
    // pre (t=0,1,2): y = 1,2,4; post (t=3,4,5): y = 10,11,13 — both
    // segments SSR = (14 − 81/6)/3; pooled Ctt=105, Cty=279, Cyy=785
    def d(day: Int) = java.sql.Date.valueOf(f"2024-01-0${day}%d")
    val ys = Seq(1.0, 2.0, 4.0, 10.0, 11.0, 13.0)
    val rows = ys.zipWithIndex.map { case (y, i) => ("k", d(i + 1), y) }
    val r = Stats.chowTest(rows.toDF("key", "ts", "y"), "y", "ts",
      Seq("key"), breakDate = "2024-01-04").collect().head
    assert(r.getAs[Long]("n_pre") === 3L && r.getAs[Long]("n_post") === 3L)
    val ssrSeg = (14.0 - 9.0 * 9.0 / 6.0) / 3.0
    val ssrP = (785.0 - 279.0 * 279.0 / 105.0) / 6.0
    val f = ((ssrP - ssrSeg - ssrSeg) / 2.0) / ((ssrSeg + ssrSeg) / 2.0)
    assert(r.getAs[Double]("chow_f") === f)
  }

  test("chowTest: a sub-3-row segment yields NULL F") {
    def d(day: Int) = java.sql.Date.valueOf(f"2024-01-0${day}%d")
    val rows = Seq(1.0, 2.0, 4.0, 10.0, 11.0).zipWithIndex
      .map { case (y, i) => ("k", d(i + 1), y) }
    val r = Stats.chowTest(rows.toDF("key", "ts", "y"), "y", "ts",
      Seq("key"), breakDate = "2024-01-04").collect().head
    assert(r.getAs[Long]("n_post") === 2L)
    assert(r.isNullAt(r.fieldIndex("chow_f")))
  }
}
