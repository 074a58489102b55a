package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two tight clusters + a degenerate constant dimension (index 3)
  private def corpus() = Seq(
    (0L, Array(0.0f, 0.1f, 0.0f, 7.0f)),
    (1L, Array(0.1f, 0.0f, 0.1f, 7.0f)),
    (2L, Array(0.05f, 0.05f, 0.05f, 7.0f)),
    (3L, Array(9.0f, 9.1f, 9.0f, 7.0f)),
    (4L, Array(9.1f, 9.0f, 9.1f, 7.0f))
  ).toDF("vec_id", "embedding")

  test("bounds are exact per-dimension extremes; degenerate dim allowed") {
    val b = Sq.trainBounds(corpus(), dim = 4)
    assert(b.los(0) === 0.0 && math.abs(b.his(0) - 9.1) < 1e-6)
    assert(b.los(3) === 7.0 && b.his(3) === 7.0)
  }

  test("codes are ints in [0,255]; extremes hit the rails; degenerate dim codes 0") {
    val b = Sq.trainBounds(corpus(), dim = 4)
    val codes = Sq.encode(corpus(), b).orderBy("vec_id").collect()
      .map(r => r.getSeq[Int](r.fieldIndex("codes")))
    assert(codes.flatten.forall(c => c >= 0 && c <= 255))
    assert(codes(0)(0) === 0)   // corpus min → 0
    assert(codes(4)(0) === 255) // corpus max → 255
    assert(codes.forall(_(3) === 0)) // degenerate dim
  }

  test("reconstruction error is within half a quantization step per dim") {
    val b = Sq.trainBounds(corpus(), dim = 4)
    val recon = Sq.reconstruct(Sq.encode(corpus(), b), b)
      .join(corpus(), "vec_id").collect()
    recon.foreach { r =>
      val rec = r.getSeq[Double](r.fieldIndex("recon"))
      val raw = r.getSeq[Float](r.fieldIndex("embedding"))
      (0 until 4).foreach { i =>
        val step = (b.his(i) - b.los(i)) / 255.0
        assert(math.abs(rec(i) - raw(i)) <= step / 2.0 + 1e-12,
          s"dim $i: ${rec(i)} vs ${raw(i)}")
      }
    }
  }

  test("sq8Knn finds the true cluster neighbors at this separation") {
    val out = Sq.sq8Knn(corpus(), corpus().filter(col("vec_id") === 0), topK = 2,
        dim = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet === Set(1L, 2L))
  }

  test("ranking is the bounded heap, not a per-query sort window") {
    val plan = Sq.sq8Knn(corpus(), corpus().filter(col("vec_id") === 0),
        topK = 2, dim = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("row_number"),
      s"expected heap ranking:\n$plan")
    assert(plan.contains("partial_topk_by") || plan.contains("topk_by"),
      s"expected the topk_by aggregate:\n$plan")
  }

  test("empty corpus fails loudly at bounds training") {
    intercept[IllegalArgumentException] {
      Sq.trainBounds(corpus().filter(lit(false)), dim = 4)
    }
  }
}
