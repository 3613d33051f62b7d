package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.net.InetAddress

/** CIDR membership test — rsyslog `is_in_subnet(ip, "10.0.0.0/8")`
  * (reference: grammar/rainerscript.c:3514). Supports IPv4 and IPv6;
  * malformed input → false (mirrors rsyslog's 0-on-error). Generates
  * inline code (a CodegenFallback here would break whole-stage codegen
  * for every projection it appears in).
  */
case class IsInSubnetExpr(ip: Expression, cidr: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def left: Expression = ip
  override def right: Expression = cidr
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "is_in_subnet"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ipEv = ip.eval(input)
    val cEv = cidr.eval(input)
    if (ipEv == null || cEv == null) return false
    IsInSubnetExpr.check(ipEv.toString, cEv.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ip.genCode(ctx)
    val r = cidr.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        boolean ${ev.value} = false;
        if (!(${l.isNull}) && !(${r.isNull})) {
          ${ev.value} = graft.functions.IsInSubnetExpr$$.MODULE$$.check(
            ${l.value}.toString(), ${r.value}.toString());
        }""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(ip = l, cidr = r)
}

object IsInSubnetExpr {
  /** Parse dotted-quad IPv4 without java.net (no exception overhead, no
    * hostname fallback); returns -1 if not a valid IPv4 literal. */
  def parseIpv4(s: String): Long = {
    var value = 0L
    var octet = 0L
    var digits = 0
    var dots = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        octet = octet * 10 + (c - '0')
        digits += 1
        if (digits > 3 || octet > 255) return -1L
      } else if (c == '.') {
        if (digits == 0 || dots == 3) return -1L
        value = (value << 8) | octet
        octet = 0; digits = 0; dots += 1
      } else return -1L
      i += 1
    }
    if (dots != 3 || digits == 0) return -1L
    (value << 8) | octet
  }

  def check(ip: String, cidr: String): Boolean = {
    // IPv4 fast path: pure integer arithmetic, no java.net parsing
    val ipV4 = parseIpv4(ip)
    if (ipV4 >= 0) {
      val slash = cidr.indexOf('/')
      val netStr = if (slash < 0) cidr else cidr.substring(0, slash)
      val netV4 = parseIpv4(netStr)
      if (netV4 >= 0) {
        val bits = if (slash < 0) 32
                   else try cidr.substring(slash + 1).toInt catch { case _: Exception => return false }
        if (bits < 0 || bits > 32) return false
        val mask = if (bits == 0) 0L else (0xFFFFFFFFL << (32 - bits)) & 0xFFFFFFFFL
        return (ipV4 & mask) == (netV4 & mask)
      }
      return false
    }
    checkGeneric(ip, cidr)
  }

  private def checkGeneric(ip: String, cidr: String): Boolean = {
    try {
      val slash = cidr.indexOf('/')
      val (netStr, bits) =
        if (slash < 0) (cidr, -1)
        else (cidr.substring(0, slash), cidr.substring(slash + 1).toInt)
      val ipB = InetAddress.getByName(ip).getAddress
      val netB = InetAddress.getByName(netStr).getAddress
      if (ipB.length != netB.length) return false
      val prefix = if (bits < 0) netB.length * 8 else bits
      if (prefix > netB.length * 8) return false
      var i = 0
      var remaining = prefix
      while (remaining >= 8) {
        if (ipB(i) != netB(i)) return false
        i += 1; remaining -= 8
      }
      if (remaining > 0) {
        val mask = (0xFF << (8 - remaining)) & 0xFF
        if ((ipB(i) & mask) != (netB(i) & mask)) return false
      }
      true
    } catch { case _: Exception => false }
  }
}

/** mmanon zero-mode over MESSAGE TEXT: scan for embedded IPv4 addresses
  * and zero the low `bits` bits, re-rendering canonically
  * (plugins/mmanon/mmanon.c: recognizer syntax_ipv4/isPosByte :578-672 —
  * four dot-separated runs of 1-3 digits each ≤ 255, tried at EVERY
  * position so a longer digit run's tail can still match, exactly like
  * the reference's per-char scan; masking code_ipv4_int :892-915 ZERO
  * arm; canonical re-render num2ipv4 :1024-1040). The stateful
  * random/random-consistent modes need cross-row coordination and stay
  * query-level; zero is the reference default. */
case class AnonIpv4MsgExpr(child: Expression, bits: Int = 16)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "anon_ipv4_msg"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(AnonIpv4MsgExpr.anon(input.toString, bits))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.AnonIpv4MsgExpr$$.MODULE$$.anon($c.toString(), $bits));")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AnonIpv4MsgExpr {
  /** 1-3 digit octet ≤255 at `i`; returns chars consumed, or -1. A run
    * of 4+ digits disqualifies (isPosByte counts the WHOLE run). */
  private def octet(s: String, i: Int): Int = {
    var j = i
    var v = 0
    while (j < s.length && s.charAt(j).isDigit) {
      if (j - i < 4) v = v * 10 + (s.charAt(j) - '0')
      j += 1
    }
    val len = j - i
    if (len >= 1 && len <= 3 && v <= 255) len else -1
  }

  /** chars consumed by an IPv4 at `i`, or -1. */
  private def matchIp(s: String, i: Int): Int = {
    var p = i
    var k = 0
    while (k < 4) {
      val l = octet(s, p)
      if (l < 0) return -1
      p += l
      if (k < 3) {
        if (p >= s.length || s.charAt(p) != '.') return -1
        p += 1
      }
      k += 1
    }
    p - i
  }

  def anon(msg: String, bits: Int): String = {
    val sb = new java.lang.StringBuilder(msg.length)
    var i = 0
    while (i < msg.length) {
      val len = if (msg.charAt(i).isDigit) matchIp(msg, i) else -1
      if (len > 0) {
        val parts = msg.substring(i, i + len).split('.')
        val num = parts.foldLeft(0L)((a, o) => a * 256 + o.toInt)
        val masked = if (bits >= 32) 0L else (num >>> bits) << bits
        sb.append((masked >> 24) & 0xFF).append('.')
          .append((masked >> 16) & 0xFF).append('.')
          .append((masked >> 8) & 0xFF).append('.')
          .append(masked & 0xFF)
        i += len
      } else { sb.append(msg.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
