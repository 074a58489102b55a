package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DivergenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("uniform group hits ln(k) entropy; a point-mass group hits 0") {
    // 'u' uses 4 tokens once each; 'p' repeats one token 4 times
    val df = Seq(("u", "aa bb cc dd"), ("p", "aa aa aa aa")).toDF("src", "text")
    val out = Divergence.tokenEntropy(df, "src", "text", topK = 4)
      .collect().map(r => r.getAs[String]("src") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("entropy"))).toMap
    assert(out("u")._1 === 4L)
    assert(math.abs(out("u")._2 - math.log(4.0)) < 1e-9) // 10-dp rounding
    assert(out("p")._2 === 0.0)
  }

  test("a group matching the corpus mix has ~zero KL; a skewed one does not") {
    // both sources share the same 2-token uniform mix → per-source
    // distribution equals the global one exactly
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("src", "text")
    val klSame = Divergence.tokenEntropy(same, "src", "text", topK = 2)
      .collect().map(_.getAs[Double]("kl"))
    klSame.foreach(k => assert(math.abs(k) < 1e-9)) // 10-dp rounding
    // 'skew' only ever says x while the corpus is x-heavy-but-mixed
    val skewed = Seq(("skew", "x x x x"), ("mix", "x y y y")).toDF("src", "text")
    val kl = Divergence.tokenEntropy(skewed, "src", "text", topK = 2)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Double]("kl")).toMap
    assert(kl("skew") > 0.1)
    assert(kl("mix") > 0.0)
  }

  test("restricting to the top-K vocabulary drops tail tokens from the support") {
    // 'z' appears once — below topK=1's cut (only 'x' survives)
    val df = Seq(("a", "x x z"), ("b", "x")).toDF("src", "text")
    val out = Divergence.tokenEntropy(df, "src", "text", topK = 2)
      .filter(col("src") === "a").collect()(0)
    // support for 'a' = {x:2, z:1} with topK=2 → n_tokens 3
    assert(out.getAs[Long]("n_tokens") === 3L)
  }

  test("psi: identical snapshots score zero in every bin; all bins emit") {
    val a = (0 until 100).map(i => Tuple1((i % 10).toDouble)).toDF("v")
    val out = Divergence.psi(a, a, "v", nBins = 5, lo = 0.0, hi = 10.0)
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("psi_term")).toMap
    assert(out.keySet === (0 until 5).toSet)
    assert(out.values.forall(_ == 0.0))
  }

  test("psi: a shifted distribution crosses the 0.25 drift threshold") {
    val ref = (0 until 500).map(i => Tuple1((i % 10).toDouble)).toDF("v")
    val cur = (0 until 500).map(i => Tuple1(5.0 + (i % 5).toDouble)).toDF("v")
    val terms = Divergence.psi(ref, cur, "v", nBins = 10, lo = 0.0, hi = 10.0)
      .collect().map(_.getAs[Double]("psi_term"))
    assert(terms.length === 10)
    assert(terms.sum > 0.25, s"shift must read as drift, got ${terms.sum}")
    assert(terms.forall(_ >= 0.0), "each PSI term is nonnegative")
  }

  test("psi: empty bins emit with zero counts and smoothed probabilities") {
    val ref = Seq(Tuple1(0.5)).toDF("v")
    val cur = Seq(Tuple1(3.5)).toDF("v")
    val out = Divergence.psi(ref, cur, "v", nBins = 4, lo = 0.0, hi = 4.0)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("p_ref"))).toMap
    assert(out.keySet === Set(0, 1, 2, 3))
    assert(out(1) === ((0L, 0L, 1.0 / 5.0))) // (0+1)/(1+4)
    assert(out(0)._1 === 1L && out(3)._2 === 1L)
  }

  test("psi: null values fail loudly") {
    val bad = Seq(Some(1.0), None).map(Tuple1(_)).toDF("v")
    val good = Seq(Tuple1(1.0)).toDF("v")
    val e = intercept[Exception] {
      Divergence.psi(bad, good, "v", 4, 0.0, 4.0).collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("jsd: identical corpora score exactly zero") {
    val a = Seq("alpha beta beta", "gamma alpha").map(Tuple1(_)).toDF("text")
    val out = Divergence.jsDivergence(a, a, "text", topK = 10).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("jsd") === 0.0)
    assert(out.head.getAs[Long]("n_tokens_a") === 5L)
    assert(out.head.getAs[Long]("n_tokens_b") === 5L)
  }

  test("jsd: disjoint vocabularies hit the ln(2) ceiling") {
    val a = Seq("aa aa bb").map(Tuple1(_)).toDF("text")
    val b = Seq("cc dd dd").map(Tuple1(_)).toDF("text")
    val jsd = Divergence.jsDivergence(a, b, "text", topK = 10)
      .collect().head.getAs[Double]("jsd")
    assert(math.abs(jsd - math.log(2.0)) < 1e-9, s"got $jsd")
  }

  test("jsd: symmetric in its arguments and bounded in (0, ln 2) when mixed") {
    val a = Seq("x x y z").map(Tuple1(_)).toDF("text")
    val b = Seq("x y y w").map(Tuple1(_)).toDF("text")
    val ab = Divergence.jsDivergence(a, b, "text", topK = 10)
      .collect().head.getAs[Double]("jsd")
    val ba = Divergence.jsDivergence(b, a, "text", topK = 10)
      .collect().head.getAs[Double]("jsd")
    assert(ab === ba)
    assert(ab > 0.0 && ab < math.log(2.0))
  }

  test("jsd: top-K restriction measures only the shared head vocabulary") {
    // head tokens 'h1 h1 h1' on both sides identical; tails differ but
    // fall outside topK=1 → JSD sees only the head and scores 0
    val a = Seq("h1 h1 h1 taila").map(Tuple1(_)).toDF("text")
    val b = Seq("h1 h1 h1 tailb").map(Tuple1(_)).toDF("text")
    val out = Divergence.jsDivergence(a, b, "text", topK = 2).collect().head
    // topK=2 picks h1 plus one tail token (tie broken by token asc: taila)
    assert(out.getAs[Long]("n_tokens_a") === 4L) // h1×3 + taila
    assert(out.getAs[Long]("n_tokens_b") === 3L) // h1×3 only
    assert(out.getAs[Double]("jsd") > 0.0)
  }

  test("ks: identical samples score exactly zero") {
    val a = Seq(1.0, 2.0, 3.0, 3.0).map(Tuple1(_)).toDF("v")
    val out = Divergence.ksTest(a, a, "v").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("ks_d") === 0.0)
    assert(out.head.getAs[Long]("n_a") === 4L)
  }

  test("ks: fully separated samples hit D = 1") {
    val a = Seq(1.0, 2.0).map(Tuple1(_)).toDF("v")
    val b = Seq(10.0, 11.0).map(Tuple1(_)).toDF("v")
    assert(Divergence.ksTest(a, b, "v").collect().head
      .getAs[Double]("ks_d") === 1.0)
  }

  test("ks: hand-computed D on a small mixed sample") {
    // F_a steps at 1,2,3 (1/3 each); F_b steps at 2,4 (1/2 each)
    // at x=1: |1/3-0|=1/3; x=2: |2/3-1/2|=1/6; x=3: |1-1/2|=1/2 ← max
    val a = Seq(1.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val b = Seq(2.0, 4.0).map(Tuple1(_)).toDF("v")
    val d = Divergence.ksTest(a, b, "v").collect().head.getAs[Double]("ks_d")
    assert(d === (1.0 - 1.0 / 2.0))
  }

  test("ks: invariant to input layout and bucket count") {
    val a = (1 to 200).map(i => Tuple1((i % 37).toDouble)).toDF("v")
    val b = (1 to 150).map(i => Tuple1((i % 23 + 5).toDouble)).toDF("v")
    val base = Divergence.ksTest(a, b, "v").collect().head
    for (nb <- Seq(1, 3, 64);
         (ra, rb) <- Seq((a.repartition(7), b.repartition(3)),
                         (a.coalesce(1), b))) {
      val r = Divergence.ksTest(ra, rb, "v", nBuckets = nb).collect().head
      assert(r === base, s"nBuckets=$nb must reproduce the global cumsum")
    }
  }

  test("ks: nulls and empty sides fail loudly") {
    val good = Seq(Tuple1(1.0)).toDF("v")
    val withNull = Seq(Some(1.0), None).map(Tuple1(_)).toDF("v")
    val e1 = intercept[Exception] {
      Divergence.ksTest(withNull, good, "v").collect()
    }
    assert(e1.getMessage.contains("non-null") ||
      Option(e1.getCause).exists(_.getMessage.contains("non-null")))
    val empty = good.filter(col("v") < 0.0)
    val e2 = intercept[Exception] {
      Divergence.ksTest(good, empty, "v").collect()
    }
    assert(e2.getMessage.contains("non-empty") ||
      Option(e2.getCause).exists(_.getMessage.contains("non-empty")))
  }

test("wasserstein1: identical samples score exactly zero") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val r = Divergence.wasserstein1(a, a, "v").collect().head
    assert(r.getAs[Double]("w1") === 0.0)
  }

  test("wasserstein1: hand-computed distance and pure-shift identity") {
    // A={0,1}, B={1,2}: |F_a-F_b| is 1/2 on [0,1) and [1,2) -> W1 = 1
    val a = Seq(0.0, 1.0).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    assert(Divergence.wasserstein1(a, b, "v").collect().head
      .getAs[Double]("w1") === 1.0)
    // shifting a distribution by delta moves W1 by exactly delta
    val base = Seq(3.0, 7.0, 9.0, 20.0).toDF("v")
    val shifted = base.select((col("v") + 5.0).as("v"))
    assert(Divergence.wasserstein1(base, shifted, "v").collect().head
      .getAs[Double]("w1") === 5.0)
  }

  test("wasserstein1: scale quantization and unequal sizes") {
    // A={0.25}, B={0.75}: at scale=2 -> 0.5 exactly, any n_a/n_b
    val a = Seq(0.25).toDF("v")
    val b = Seq(0.75, 0.75, 0.75).toDF("v")
    val r = Divergence.wasserstein1(a, b, "v", scale = 2).collect().head
    assert(r.getAs[Long]("n_a") === 1L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("w1") === 0.5)
  }

  test("wasserstein1: invariant to layout and bucket count") {
    val a = (1 to 40).map(i => (i * 37 % 19).toDouble).toDF("v")
    val b = (1 to 50).map(i => (i * 13 % 23).toDouble).toDF("v")
    val w64 = Divergence.wasserstein1(a, b, "v").collect().head.getAs[Double]("w1")
    val w1b = Divergence.wasserstein1(a.repartition(7), b.coalesce(1), "v",
      nBuckets = 1).collect().head.getAs[Double]("w1")
    val w3b = Divergence.wasserstein1(a, b, "v", nBuckets = 3)
      .collect().head.getAs[Double]("w1")
    assert(w64 === w1b && w64 === w3b)
  }

  test("wasserstein1: nulls and empty sides fail loudly") {
    val ok = Seq(1.0).toDF("v")
    val withNull = Seq(Some(1.0), None).toDF("v")
    assert(intercept[Exception] {
      Divergence.wasserstein1(ok, withNull, "v").collect()
    }.getMessage.contains("wasserstein1"))
    assert(intercept[Exception] {
      Divergence.wasserstein1(ok, ok.filter(col("v") < 0), "v").collect()
    }.getMessage.contains("non-empty"))
  }

  test("ksUniform: hand-computed D; midpoint grid hits the 1/2n floor") {
    val rows = Seq(("g", 0.1), ("g", 0.4), ("g", 0.7))
    val r = Divergence.ksUniform(rows.toDF("grp", "u"), "u", Seq("grp"))
      .collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("ks_d") === 3.0 / 3.0 - 0.7)  // the i=3 gap
    assert(r.getAs[Double]("ks_stat") ===
      math.sqrt(3.0) * (3.0 / 3.0 - 0.7))
    // perfectly spread midpoints (2i-1)/2n: D = 1/2n, the minimum
    val grid = Seq(("g", 1.0 / 6.0), ("g", 3.0 / 6.0), ("g", 5.0 / 6.0))
    val r2 = Divergence.ksUniform(grid.toDF("grp", "u"), "u", Seq("grp"))
      .collect().head
    // all three terms tie at 1/6 mathematically but differ in ulps —
    // assert the value, not the bit pattern
    assert(math.abs(r2.getAs[Double]("ks_d") - 1.0 / 6.0) < 1e-15)
    // out-of-range raises
    intercept[Exception] {
      Divergence.ksUniform(Seq(("g", 1.5)).toDF("grp", "u"), "u",
        Seq("grp")).collect()
    }
  }
}
