package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Casefolded whitespace tokens of a text in ONE pass — semantics equal
  * `filter(split(lower(text), "\\s+"), _ != "")` (Java `\s` =
  * [ \t\n\x0B\f\r], leading/trailing/repeated whitespace yields no empty
  * tokens) but without the interpreted HOF chain: the token array feeds
  * language-ID, quality scoring, n-gram repetition and the LLM-prep
  * compositions, so it is one of the hottest subtrees in the text
  * pipelines. Same kernel style as ShinglesExpr (one static call inside
  * whole-stage codegen).
  */
case class TokensExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokensExpr.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokensExpr$$.MODULE$$.kernel($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokensExpr {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def kernel(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(UTF8String.fromString(s.substring(start, i)))
    }
    new GenericArrayData(toks.toArray)
  }
}

/** All consecutive n-grams of a token array, joined with a single space —
  * semantics equal the zip-shift construction
  * `filter(zip_with(toks, slice(toks, k+1, …), concat(_, " ", _)), _.isNotNull)`
  * chained over k < n (grams touching a null element are dropped, trailing
  * partial grams never form), in one kernel pass.
  */
case class NgramJoinExpr(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "n-gram size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"ngrams$n"

  override protected def nullSafeEval(input: Any): Any =
    NgramJoinExpr.kernel(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramJoinExpr$$.MODULE$$.kernel($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Marker-argmax language ID over a token array — the native form of the
  * `aggregate(toks, zero, zip_with-add, argmax)` HOF chain (semantics
  * identical: counts of per-language marker hits, argmax with
  * declaration-order tie-break, no hit at all → "und").
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray

  @transient private lazy val mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case ((_, ms), i) =>
      ms.foreach { mk =>
        val k = UTF8String.fromString(mk)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def kernel(toks: ArrayData): UTF8String = {
    val counts = new Array[Int](langs.length)
    var i = 0
    val len = toks.numElements()
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val bits = mask.get(toks.getUTF8String(i))
        if (bits != null) {
          var b = bits.intValue()
          var l = 0
          while (b != 0) {
            if ((b & 1) != 0) counts(l) += 1
            b >>>= 1
            l += 1
          }
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) { best = counts(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) LangIdExpr.UND else langs(bestIdx)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this,
      "graft.functions.LangIdExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangIdExpr {
  val UND: UTF8String = UTF8String.fromString("und")
}

object NgramJoinExpr {
  def kernel(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](m)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var j = 0
      var ok = true
      while (ok && j < n) {
        if (toks.isNullAt(k + j)) ok = false
        else {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(k + j).toString)
          j += 1
        }
      }
      if (ok) out.add(UTF8String.fromString(sb.toString))
      k += 1
    }
    new GenericArrayData(out.toArray)
  }
}
