package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle kernel shared by the interpreted and generated
  * code paths of [[WordShingles]].
  *
  * Exactly mirrors the declarative chain it replaces —
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * element_at(tokens, ...))))` over `filter(split(lower(text),
  * '[^a-z0-9]+'), w -> w <> '')` — including the empty-array result for
  * NULL/short inputs and array_distinct's first-occurrence order. Tokens
  * are the maximal `[a-z0-9]` runs of the (UTF8String-)lowered text, which
  * is precisely the non-empty split-by-`[^a-z0-9]+` substrings. */
object ShingleKernel {

  private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  def eval(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[AnyRef])
    val s = text.toLowerCase.toString
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (isTokenChar(s.charAt(i))) {
        var j = i + 1
        while (j < len && isTokenChar(s.charAt(j))) j += 1
        tokens.add(s.substring(i, j))
        i = j
      } else i += 1
    }
    val m = tokens.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new java.util.ArrayList[AnyRef](m)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var k = 0
    while (k < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.get(k + j))
        j += 1
      }
      val sh = sb.toString
      if (seen == null || seen.add(sh)) out.add(UTF8String.fromString(sh))
      k += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `word_shingles(text, n [, distinct])` — the word n-gram array of a text
  * column in ONE codegen'd pass (tokenize + slide + join + optional
  * distinct), replacing a five-deep interpreted HOF chain (split, filter,
  * sequence, transform-with-element_at, array_distinct) that dispatched a
  * closure per element and re-walked the token array per shingle. The
  * shingle substrate of every dedup operator, so its per-row cost IS the
  * corpus-scan cost at 100 TB.
  *
  * NULL text yields an empty array (the declarative chain's `when`
  * fell through to its `otherwise(array())` on NULL sizes — kept for
  * bit-parity with the established oracles). */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"word_shingles n must be >= 1, got $n")

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    ShingleKernel.eval(child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  graft.functions.ShingleKernel.eval(
           |    ${c.isNull} ? null : ${c.value}, $n, $distinct);
           |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Column API — usable without SQL registration. */
  def wordShingles(text: Column, n: Int, distinct: Boolean = true): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n, distinct))
}
