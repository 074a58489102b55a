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
}
