package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stats(text: String) =
    Pii.piiStats(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head

  private def redacted(text: String) =
    Seq(text).toDF("text").select(Pii.redact(col("text")).as("r"))
      .collect().head.getString(0)

  test("detects emails, SSNs, both phone formats, and IPs") {
    val r = stats("mail a@b.co and c.d+e@f-g.org, ssn 123-45-6789, " +
      "call (555) 123-4567 or 555-987-6543, host 10.0.0.1")
    assert(r.getAs[Int]("n_emails") === 2)
    assert(r.getAs[Int]("n_ssns") === 1)
    assert(r.getAs[Int]("n_phones") === 2)
    assert(r.getAs[Int]("n_ips") === 1)
    assert(r.getAs[Boolean]("has_pii"))
  }

  test("clean text has zero hits and has_pii=false") {
    val r = stats("just ordinary prose with numbers 12 and 3456")
    assert(r.getAs[Int]("n_emails") + r.getAs[Int]("n_ssns") +
      r.getAs[Int]("n_phones") + r.getAs[Int]("n_ips") === 0)
    assert(!r.getAs[Boolean]("has_pii"))
  }

  test("a phone number is not also counted as an SSN (disjoint shapes)") {
    val r = stats("call 555-123-4567")
    assert(r.getAs[Int]("n_phones") === 1)
    assert(r.getAs[Int]("n_ssns") === 0)
  }

  test("boundary guards reject longer digit runs") {
    // 123-45-67890 is not an SSN; 1234.5.6.78 is not a clean dotted quad hit
    val r = stats("ref 123-45-67890 and 1123-45-6789")
    assert(r.getAs[Int]("n_ssns") === 0)
  }

  test("redaction replaces every hit with its placeholder, in order") {
    val out = redacted("mail a@b.co ssn 123-45-6789 call (555) 123-4567 ip 10.0.0.1")
    assert(out === "mail <EMAIL> ssn <SSN> call <PHONE> ip <IP>")
  }

  test("redaction leaves clean text unchanged") {
    val s = "nothing sensitive here, order 42 shipped 2024-01-02"
    assert(redacted(s) === s)
  }

  test("bm25: textbook value on a 2-doc corpus, rarer term outranks common") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val rows = TextOps.bm25(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // n=2, avgdl=2.5; x@d1: tf=2 dl=3 df=2 -> idf=1.2,
    // score = 1.2 * (2*2.2) / (2 + 1.2*(0.25 + 0.75*(3/2.5)))
    assert(math.abs(rows((1L, "x")) - 1.2 * 4.4 / 3.38) < 1e-12)
    // y (df=1) outranks x (df=2) within d1 at equal tf=... (y tf=1 < x tf=2
    // but idf dominates: y idf = (2-1+0.5)/1.5+1 = 2)
    assert(rows((1L, "y")) > 0.0)
    val logScores = TextOps.bm25(docs, "doc_id", "text", logIdf = true)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // ln(idf) < idf for idf > 1, so log variant scores strictly lower
    assert(logScores((1L, "x")) < rows((1L, "x")))
  }
}
