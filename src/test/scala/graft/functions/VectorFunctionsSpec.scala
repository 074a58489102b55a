package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vec_dot is bit-identical to the aggregate(zip_with(...)) fold it replaces") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      val d = 1 + rnd.nextInt(96)
      (i.toLong, Array.fill(d)(rnd.nextFloat() * 2 - 1), Array.fill(d)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val out = df.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot null contract: null arrays, null elements, length mismatch") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f))
    ).toDF("id", "a", "b")
    val r = df.select(col("id"), VectorFunctions.vecDot(col("a"), col("b"))).orderBy("id").collect()
    assert(r(0).getDouble(1) === 11.0)
    assert(r(1).isNullAt(1))
    // length mismatch -> NULL (zip_with would null-pad and poison the sum)
    val mm = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(VectorFunctions.vecDot(col("a"), col("b"))).head()
    assert(mm.isNullAt(0))
    // null element -> NULL
    val ne = spark.sql("SELECT vec_dot(array(1.0D, NULL), array(1.0D, 2.0D))").head()
    assert(ne.isNullAt(0))
  }

  test("vec_dot works in SQL and rejects non-array inputs at analysis") {
    assert(spark.sql("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D))").head().getDouble(0) === 11.0)
    val e = intercept[Exception] { spark.sql("SELECT vec_dot(1.0, 2.0)").collect() }
    assert(e.getMessage.contains("requires two numeric arrays"))
  }
}
