package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the session-5 statistics on seeded random
  * data — the bounds and monotonicity every textbook derivation
  * guarantees, asserted over jagged LCG walks (no Math.random,
  * reproducible). A violation is a formula transcription bug the
  * hand-computed unit cases might miss. */
class StatsInvariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  /** (group, x, y) triples over `g` groups of `n` rows. */
  private def xy(seed: Long, g: Int, n: Int): Seq[(String, Double, Double)] = {
    val it = lcg(seed).drop(1)
    (0 until g).flatMap { gi =>
      (0 until n).map { _ =>
        (s"g$gi", (it.next() >>> 44).toDouble, (it.next() >>> 44).toDouble)
      }
    }
  }

  test("kendallTau: |tau| <= 1, self-correlation 1, y-negation flips sign") {
    val df = xy(11L, 4, 40).toDF("grp", "x", "y")
    val taus = Stats.kendallTau(df, Seq("grp"), "x", "y")
      .collect().map(_.getAs[Double]("tau"))
    assert(taus.forall(t => math.abs(t) <= 1.0))
    val self = Stats.kendallTau(df.withColumn("y2", $"x"), Seq("grp"),
      "x", "y2").collect().map(_.getAs[Double]("tau"))
    assert(self.forall(_ === 1.0))
    // negating y swaps concordant/discordant exactly (integer counts)
    val neg = Stats.kendallTau(df.withColumn("yn", -$"y"), Seq("grp"),
        "x", "yn")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("tau")).toMap
    val pos = Stats.kendallTau(df, Seq("grp"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("tau")).toMap
    pos.foreach { case (g, t) => assert(neg(g) === -t) }
  }

  test("bhAdjust: adjusted p is >= raw p, <= 1, and monotone in rank") {
    val it = lcg(23L).drop(1)
    val rows = (0 until 200).map(i =>
      ("f" + (i % 3), i.toLong, (it.next() >>> 12).toDouble / (1L << 52).toDouble))
    val out = Stats.bhAdjust(rows.toDF("fam", "id", "p"), Seq("fam"), "p",
        "id")
      .collect()
      .map(r => (r.getString(0), r.getAs[Int]("p_rank").toLong,
        r.getAs[Double]("p"), r.getAs[Double]("p_adj")))
    out.foreach { case (_, _, p, adj) =>
      assert(adj >= p && adj <= 1.0, s"adj $adj vs p $p")
    }
    out.groupBy(_._1).values.foreach { fam =>
      val byRank = fam.toSeq.sortBy(_._2).map(_._4)
      byRank.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b, "adjusted p must be monotone")
        case _ =>
      }
    }
  }

  test("kaplanMeier: survival starts <= 1, never increases, stays >= 0") {
    val it = lcg(37L).drop(1)
    val rows = (0 until 300).map { _ =>
      ("c" + (it.next() >>> 62), (it.next() >>> 58).toLong,
        (it.next() >>> 63).toLong)
    }
    val out = Eval.kaplanMeier(rows.toDF("grp", "dur", "ev"), "dur", "ev",
        Seq("grp"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("t"),
        r.getAs[Double]("survival")))
    assert(out.forall { case (_, _, s) => s >= 0.0 && s <= 1.0 })
    out.groupBy(_._1).values.foreach { g =>
      g.toSeq.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(b <= a, "survival must be non-increasing")
        case _ =>
      }
    }
  }

  test("rocCurve: rates are monotone along the sweep and end at (1,1)") {
    val it = lcg(53L).drop(1)
    val rows = (0 until 400).map { _ =>
      ("g", (it.next() >>> 54).toDouble, (it.next() >>> 63))
    }
    val out = Eval.rocCurve(rows.toDF("grp", "s", "y"), "s", "y", Seq("grp"))
      .collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Double]("tpr"),
        r.getAs[Double]("fpr")))
      .sortBy(-_._1)
    out.toSeq.sliding(2).foreach {
      case Seq((_, t1, f1), (_, t2, f2)) =>
        assert(t2 >= t1 && f2 >= f1, "sweep must be monotone")
      case _ =>
    }
    assert(out.last._2 === 1.0 && out.last._3 === 1.0)
  }

  test("cramersV in [0,1]; ljungBox Q >= 0; pacf_1 within [-1,1] + ulp") {
    val it = lcg(71L).drop(1)
    val cat = (0 until 500).map { _ =>
      ("g" + (it.next() >>> 63), "a" + (it.next() >>> 62),
        "b" + (it.next() >>> 62))
    }
    Stats.cramersV(cat.toDF("grp", "a", "b"), "a", "b", Seq("grp"))
      .collect().foreach { r =>
        val v = r.getAs[Double]("cramers_v")
        assert(v >= 0.0 && v <= 1.0 + 1e-12, s"V out of range: $v")
      }
    val series = (0 until 4).flatMap { k =>
      (0 until 80).map(i => (s"k$k", i.toLong,
        (it.next() >>> 44).toDouble / 1e3))
    }
    Stats.ljungBox(series.toDF("key", "t", "x"), "x", Seq("key"), Seq("t"),
        m = 5, scale = 3)
      .collect().foreach { r =>
        assert(r.getAs[Double]("q_stat") >= 0.0)
      }
    Stats.pacf(series.toDF("key", "t", "x"), "x", Seq("key"), Seq("t"),
        scale = 3)
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("pacf_1")) <= 1.0 + 1e-9)
      }
  }

  test("effectSizes: Cliff's delta within [-1,1]; hurst R/S positive") {
    val it = lcg(97L).drop(1)
    val arms = (0 until 200).map { _ =>
      ("g", if ((it.next() >>> 63) == 0L) "a" else "b",
        (it.next() >>> 48).toDouble)
    }
    Stats.effectSizes(arms.toDF("grp", "arm", "x"), "x", "arm", "a", "b",
        Seq("grp"))
      .collect().foreach { r =>
        val d = r.getAs[Double]("cliffs_delta")
        assert(d >= -1.0 && d <= 1.0)
      }
    val walk = {
      var v = 0.0
      (0 until 128).map { i =>
        v += ((it.next() >>> 62).toDouble - 1.5); ("k", i.toLong, v)
      }
    }
    val h = Rolling.hurst(walk.toDF("key", "t", "x"), "x", Seq("key"),
      Seq("t"), Seq(8, 16, 32)).collect().head
    Seq(8, 16, 32).foreach { b =>
      assert(h.getAs[Double](s"rs_$b") > 0.0)
    }
  }
}
