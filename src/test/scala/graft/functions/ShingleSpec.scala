package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the codegen'd WordShingles kernel against the declarative
  * HOF chain it replaced (tokens -> shingleArray -> array_distinct), which
  * is what every established dedup/fingerprint oracle mirrors. */
class ShingleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def declarative(textCol: String, n: Int, distinct: Boolean) = {
    val toksB = graft.operators.TextOps.tokens(col(textCol)).as("__toks")
    val sh = graft.operators.TextOps.shingleArray(col("__toks"), n)
    (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("id"), toksB)
        .select(col("id"), (if (distinct) array_distinct(sh) else sh).as("sh"))
  }

  private val fixtures = Seq(
    "The quick brown fox jumps over the lazy dog",
    "a b a b a b a",                       // repeats -> distinct differs from raw
    "  leading and trailing   spaces  ",
    "punct!@#between$$words--and123digits",
    "UPPER lower MiXeD 42x 7y",
    "unicode: café naïve 東京 emoji 😀 done",
    "ALLCAPS",                              // single token, shorter than n
    "",                                     // empty
    "!!!???",                               // separators only
    "one two",                              // exactly n-1 for n=3
    "tabs\tand\nnewlines are separators too"
  )

  test("kernel matches the declarative chain on fixtures and random strings, all n") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcXYZ012 ._-!?é漢\t\n"
    val randoms = Seq.fill(200)(
      (1 to rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (fixtures ++ randoms).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 8); distinct <- Seq(true, false)) {
      val want = declarative("text", n, distinct)(df)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val got = df.select(col("id"),
          ShingleFunctions.wordShingles(col("text"), n, distinct).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want, s"n=$n distinct=$distinct")
    }
  }

  test("interpreted kernel path equals codegen path semantics (direct eval)") {
    for (t <- fixtures; n <- Seq(1, 3, 8)) {
      val direct = ShingleKernel.eval(UTF8String.fromString(t), n, true)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val viaDf = Seq((1L, t)).toDF("id", "text")
        .select(ShingleFunctions.wordShingles(col("text"), n).as("sh"))
        .head().getSeq[String](0)
      assert(direct === viaDf, s"text=$t n=$n")
    }
  }

  test("NULL text yields an empty array, like the declarative chain") {
    val df = Seq((1L, Option("a b c d")), (2L, Option.empty[String])).toDF("id", "text")
    val got = df.select(col("id"), ShingleFunctions.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(2L) === Seq.empty)
    assert(got(1L) === Seq("a b c", "b c d"))
    val decl = declarative("text", 3, distinct = true)(df)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got === decl)
  }

  test("word_shingles resolves through the SQL registry") {
    FinancialFunctions.registerAll(spark)
    val got = spark.sql("SELECT word_shingles('A b! c d', 3) AS sh")
      .head().getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('x', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("rejects non-string input at analysis time") {
    val e = intercept[Exception] {
      Seq(1).toDF("x").select(ShingleFunctions.wordShingles(col("x"), 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
