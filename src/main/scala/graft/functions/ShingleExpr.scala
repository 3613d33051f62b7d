package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text in ONE pass: lowercase,
  * whitespace-split, join each n consecutive tokens with a single space,
  * first-occurrence-order dedupe. Semantics match
  * `array_distinct(transform(seq, i -> concat_ws(' ', tok[i..i+n-1])))`
  * over `filter(split(lower(text), "\\s+"), _ != "")` — but the HOF
  * chain is interpreted per element (and re-interpreted per reference),
  * which measured ~9× slower than this kernel in the dedup pipelines.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"shingles$n"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesExpr$$.MODULE$$.kernel($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShinglesExpr {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def kernel(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    // whitespace tokenization without regex
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(k + j))
        j += 1
      }
      seen.add(sb.toString)
      k += 1
    }
    val out = new Array[Any](seen.size)
    var idx = 0
    val it = seen.iterator()
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }
}
