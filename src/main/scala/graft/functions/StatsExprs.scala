package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Prometheus metric-name encoding (runtime/statsobj.c:558-663): a
  * legacy-safe name (leading [A-Za-z_:], rest [A-Za-z0-9_:], not starting
  * with the reserved "U__" prefix) passes through unchanged; anything
  * else gets the reversible U__ encoding — [A-Za-z0-9:] kept, `_`
  * doubled, any other valid UTF-8 codepoint as `_%X_` (uppercase hex),
  * invalid bytes as `_x%02X_`.
  */
object StatsNameUtil {

  private def legacySafe(b: Array[Byte]): Boolean = {
    if (b.isEmpty) return false
    val c0 = (b(0) & 0xff).toChar
    val lead = (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z') ||
      c0 == '_' || c0 == ':'
    if (!lead) return false
    if (b.length >= 3 && b(0) == 'U' && b(1) == '_' && b(2) == '_')
      return false
    var i = 1
    while (i < b.length) {
      val c = (b(i) & 0xff).toChar
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == ':'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Walk the RAW UTF-8 bytes like decodeUtf8Codepoint (statsobj.c:580):
    * well-formed sequences encode their codepoint, malformed bytes take
    * the `_x%02X_` byte form and advance by one. (Raw bytes, not a
    * Java-String round trip — that would launder invalid bytes into
    * U+FFFD and lose the byte form.) */
  def promNameKernel(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bytes = s.getBytes
    if (legacySafe(bytes)) return s
    val sb = new java.lang.StringBuilder(bytes.length * 4 + 4)
    sb.append("U__")
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = -1
      var consumed = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 >= 0xc2 && b0 <= 0xdf && i + 1 < bytes.length &&
        (bytes(i + 1) & 0xc0) == 0x80) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); consumed = 2
      } else if (b0 >= 0xe0 && b0 <= 0xef && i + 2 < bytes.length &&
        (bytes(i + 1) & 0xc0) == 0x80 && (bytes(i + 2) & 0xc0) == 0x80) {
        val c = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        if (c >= 0x800 && !(c >= 0xd800 && c <= 0xdfff)) { cp = c; consumed = 3 }
      } else if (b0 >= 0xf0 && b0 <= 0xf4 && i + 3 < bytes.length &&
        (bytes(i + 1) & 0xc0) == 0x80 && (bytes(i + 2) & 0xc0) == 0x80 &&
        (bytes(i + 3) & 0xc0) == 0x80) {
        val c = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        if (c >= 0x10000 && c <= 0x10ffff) { cp = c; consumed = 4 }
      }
      if (cp >= 0 && ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == ':'))
        sb.append(cp.toChar)
      else if (cp == '_') sb.append("__")
      else if (cp >= 0) sb.append("_%X_".format(cp))
      else sb.append("_x%02X_".format(b0))
      i += consumed
    }
    UTF8String.fromString(sb.toString)
  }

  /** HELP-string escaping (escapePrometheusHelp, statsobj.c:664-699):
    * backslash and quote get a backslash, newline becomes \n. */
  def promHelpKernel(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 4)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '\\' || c == '"') { sb.append('\\'); sb.append(c) }
      else if (c == '\n') sb.append("\\n")
      else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** prom_name(s): Prometheus metric-name encoding per
  * encodePrometheusMetricName (runtime/statsobj.c:612-663). */
case class PromNameExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "prom_name"

  override protected def nullSafeEval(input: Any): Any =
    StatsNameUtil.promNameKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.StatsNameUtil$$.MODULE$$.promNameKernel($s);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PromNameExpr {
  def encode(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      PromNameExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** prom_help(s): Prometheus HELP-string escaping per
  * escapePrometheusHelp (runtime/statsobj.c:664-699). */
case class PromHelpExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "prom_help"

  override protected def nullSafeEval(input: Any): Any =
    StatsNameUtil.promHelpKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.StatsNameUtil$$.MODULE$$.promHelpKernel($s);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PromHelpExpr {
  def escape(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      PromHelpExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}
