package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table byte-pair encoding (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — public algorithm) for
  * token counting/budgeting in training-data pipelines.
  *
  * Algorithm contract (both learn and apply sides, and mirrored exactly by
  * the DuckDB oracle for the `q_bpe_tokens` gate):
  *  - text is pre-tokenized into segments by [[graft.operators.TextOps.BpeSplitRe]]
  *    (GPT-2-style pre-tokenizer, Java-regex/RE2 agreeing subset);
  *  - each segment starts as its sequence of Unicode code points;
  *  - merges apply IN TABLE ORDER; each merge rewrites every adjacent
  *    occurrence of its pair left-to-right, non-overlapping (the semantics of
  *    `String.replace` on a delimiter-framed rendering — which is exactly how
  *    the SQL oracle evaluates it);
  *  - token count = surviving symbols summed over segments.
  *
  * The merge table is data, not code: [[learnMerges]] trains one from any
  * corpus (the standard frequency-histogram formulation — pair counts are
  * taken over the DISTINCT-segment histogram, so training cost scales with
  * vocabulary, not corpus bytes; on a 100 TB corpus the histogram is the only
  * distributed step, one shuffle). [[DefaultMerges]] is a 100-merge table
  * trained by that procedure on the synthetic test corpus; production users
  * would train on their own corpus or load a published merge list.
  */
object Bpe {

  private val splitPattern = Pattern.compile(graft.operators.TextOps.BpeSplitRe)

  /** GPT-2-style pre-tokenization — identical matches to Spark's
    * `regexp_extract_all(text, BpeSplitRe, 0)` (both are Java regex). */
  def preTokenize(text: String): List[String] = {
    val m = splitPattern.matcher(text)
    val out = List.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Split into code points (not UTF-16 units) — matches DuckDB/RE2's
    * per-character semantics on supplementary-plane input. */
  private def codePointSymbols(seg: String): Array[String] = {
    val out = new Array[String](seg.codePointCount(0, seg.length))
    var i = 0
    var w = 0
    while (i < seg.length) {
      val cp = seg.codePointAt(i)
      val n = Character.charCount(cp)
      out(w) = seg.substring(i, i + n)
      i += n
      w += 1
    }
    out
  }

  /** One left-to-right, non-overlapping merge pass over `syms[0, n)`;
    * compacts in place and returns the new length. After a merge the scan
    * resumes AFTER the merged symbol (it cannot be the left element of
    * another match in the same pass) — `String.replace` semantics. */
  private def mergePass(syms: Array[String], n: Int, a: String, b: String): Int = {
    var r = 0
    var w = 0
    while (r < n) {
      if (r + 1 < n && syms(r) == a && syms(r + 1) == b) {
        syms(w) = syms(r) + syms(r + 1)
        r += 2
      } else {
        syms(w) = syms(r)
        r += 1
      }
      w += 1
    }
    w
  }

  /** Token count of one pre-tokenized segment under a merge table. */
  def countSegment(seg: String, merges: IndexedSeq[(String, String)]): Int = {
    val syms = codePointSymbols(seg)
    var n = syms.length
    var i = 0
    while (i < merges.length && n > 1) {
      val (a, b) = merges(i)
      n = mergePass(syms, n, a, b)
      i += 1
    }
    n
  }

  /** BPE token count of a document: segments summed. Empty text → 0. */
  def countTokens(text: String, merges: IndexedSeq[(String, String)]): Int = {
    var total = 0
    val m = splitPattern.matcher(text)
    while (m.find()) total += countSegment(m.group(), merges)
    total
  }

  /** Entry point for generated code / the SQL function (fixed default table). */
  def countTokensDefault(text: String): Int = countTokens(text, DefaultMerges)

  // ---- training ------------------------------------------------------------

  /** Learn `numMerges` merges from a (distinct segment → frequency)
    * histogram. Pure, deterministic: each round counts adjacent pairs over
    * the current symbolization weighted by segment frequency, then merges the
    * pair with the highest count (ties broken by lexicographic pair order).
    * Stops early when no pair occurs twice. */
  def learnMerges(segmentCounts: Map[String, Long], numMerges: Int): Vector[(String, String)] = {
    // vocab: current symbolization of each distinct segment
    var vocab: Vector[(Array[String], Long)] =
      segmentCounts.toVector.sortBy(_._1).map { case (seg, c) => (codePointSymbols(seg), c) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, best) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (best < 2) done = true
        else {
          merges += pair
          vocab = vocab.map { case (syms, c) =>
            val n = mergePass(syms, syms.length, pair._1, pair._2)
            (java.util.Arrays.copyOf(syms.asInstanceOf[Array[AnyRef]], n)
              .asInstanceOf[Array[String]], c)
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Distributed histogram + driver-side training: ONE shuffle builds the
    * distinct-pre-token histogram (bounded by vocabulary size, not corpus
    * size); `maxVocab` caps it by frequency (ties by segment) so a 100 TB
    * corpus with unbounded rare segments still trains on a fixed-size
    * driver-side table — the standard practice for subword training. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxVocab: Int = 1 << 16): Vector[(String, String)] = {
    import org.apache.spark.sql.functions._
    val hist = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(graft.operators.TextOps.BpeSplitRe), lit(0))).as("seg"))
      .groupBy("seg").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("seg"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    learnMerges(hist, numMerges)
  }

  /** Fixed 100-merge table learned with [[learnMerges]] (numMerges=100) from
    * the synthetic documents corpus (`/root/testdata/sf0.01/documents.parquet`)
    * — regenerate with `graft.tools.BpeTrain` after corpus changes. */
  val DefaultMerges: Vector[(String, String)] = Vector(
    (" ", "s"), ("e", "r"), ("i", "n"), ("o", "w"),
    ("o", "r"), ("m", "er"), ("a", "t"), ("l", "u"),
    (" ", "c"), ("a", "s"), (" ", "b"), (" ", "v"),
    ("a", "r"), ("p", "ar"), (" ", "f"), (" ", "a"),
    (" ", "t"), ("j", "o"), ("jo", "in"), ("as", "h"),
    ("h", "ash"), (" ", "join"), ("s", "t"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("a", "n"), ("c", "an"),
    ("lu", "m"), ("lum", "n"), ("o", "lumn"), ("o", "mer"),
    ("st", "omer"), ("u", "stomer"), ("i", "l"), ("il", "t"),
    ("ilt", "er"), (" ", "hash"), ("a", "l"), ("al", "l"),
    ("m", "all"), (" ", "row"), (" s", "can"), (" ", "d"),
    (" s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    (" b", "atch"), (" c", "olumn"), (" f", "ilter"), ("c", "t"),
    ("ct", "or"), ("d", "er"), ("e", "ctor"), ("or", "der"),
    (" c", "ustomer"), ("in", "e"), ("l", "ine"), ("a", "b"),
    ("ab", "l"), ("abl", "e"), ("at", "a"), ("u", "p"),
    (" s", "low"), ("g", "g"), (" ", "order"), (" v", "ector"),
    (" ", "merge"), ("a", "lu"), ("alu", "e"), ("e", "y"),
    ("k", "ey"), (" ", "line"), (" d", "ata"), (" a", "gg"),
    ("a", "m"), ("e", "am"), ("r", "eam"), (" t", "able"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), (" v", "alue"),
    ("par", "k"), ("g", "r"), ("gr", "o"), ("gro", "up"),
    ("par", "t"), (" s", "t"), (" st", "ream"), ("i", "g"),
    ("or", "t"), (" b", "ig"), ("er", "y"), ("q", "u"),
    ("qu", "ery"), (" ", "key"), (" s", "park"), (" ", "window")
  )
}

/** `bpe_count(text)` — merge-table BPE token count under [[Bpe.DefaultMerges]].
  * Codegen emits a single static call, so the expression stays inside
  * whole-stage codegen (no UDF, no CodegenFallback). NULL text → NULL. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bpe_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokensDefault(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokensDefault($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeFunctions {
  /** Column API — usable without SQL registration. */
  def bpeCount(text: Column): Column =
    ExpressionUtils.column(BpeCount(ExpressionUtils.expression(text)))
}
