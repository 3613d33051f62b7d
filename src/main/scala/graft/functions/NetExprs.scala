package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
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
