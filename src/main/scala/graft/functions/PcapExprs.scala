package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** impcap packet decode kernel (contrib/impcap): Ethernet II [+ 802.1Q]
  * → IPv4/IPv6 → TCP/UDP/ICMP header extraction into the reference's
  * metadata JSON field set, with the unparsed remainder hex-encoded the
  * way packet_parse's stringToHex does (impcap.c:492-506, uppercase).
  *
  * Field names and insertion order mirror the C parsers exactly:
  *  - eth_parse (eth_parser.c:124-185): ETH_src/ETH_dst via ether_ntoa
  *    (glibc %x — NO zero padding), optional ETH_tag for 802.1Q, then
  *    ETH_type + ETH_typestr (eth_parser.c:61-108 table) for type ≥
  *    1500; LLC (< 1500) is out of this subset.
  *  - ipv4_parse (ipv4_parser.c:69-105): net_dst_ip, net_src_ip,
  *    IP_ihl, net_ttl, IP_proto; header-length validation drops to the
  *    data remainder like RETURN_DATA_AFTER(0).
  *  - ipv6_parse (ipv6_parser.c:268-330): net_dst_ip, net_src_ip
  *    (inet_ntop compressed form, RFC 5952), net_ttl = hop limit;
  *    direct TCP/UDP next headers only — extension-header chains stop
  *    the walk here (subset; the remainder lands in data).
  *  - tcp_parse (tcp_parser.c:70-122): net_src_port, net_dst_port,
  *    TCP_seq_number, TCP_ack_number, net_flags ("FSRPAUEC" bits; the
  *    reference's NS flag appends flagCodes[9] which is the literal
  *    string's NUL — invisible — reproduced by omitting it). The
  *    SMB/FTP/HTTP port dispatch is app-layer, out of this subset.
  *  - udp_parse (udp_parser.c:63-90): net_src_port, net_dst_port,
  *    UDP_Length, UDP_Checksum (DNS dispatch likewise out of subset).
  *  - icmp_parse (icmp_parser.c): net_icmp_type, net_icmp_code,
  *    icmp_checksum.
  *
  * Returns `fragment<SP>dataHex` (single-space separator; neither part contains one) — the fragment is the
  * comma-prefixed JSON members to splice after the per-message head
  * (ID/timestamp/net_bytes_total, added by Sources.impcapDecode the way
  * packet_parse adds them before eth_parse runs). */
object PcapUtil {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
    ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** glibc ether_ntoa: %x:%x:... — no zero padding. */
  private def mac(b: Array[Byte], i: Int): String =
    (0 until 6).map(k => Integer.toHexString(b(i + k) & 0xff)).mkString(":")

  private def ip4(b: Array[Byte], i: Int): String =
    s"${u8(b, i)}.${u8(b, i + 1)}.${u8(b, i + 2)}.${u8(b, i + 3)}"

  /** inet_ntop(AF_INET6) compression: longest run (≥2) of zero groups →
    * "::", lowercase hex, no leading zeros (RFC 5952). */
  private[functions] def ip6(b: Array[Byte], off: Int): String = {
    val g = new Array[Int](8)
    var i = 0
    while (i < 8) { g(i) = u16(b, off + 2 * i); i += 1 }
    var bestStart = -1; var bestLen = 0
    var s = -1
    i = 0
    while (i <= 8) {
      if (i < 8 && g(i) == 0) { if (s < 0) s = i }
      else {
        if (s >= 0 && i - s > bestLen) { bestStart = s; bestLen = i - s }
        s = -1
      }
      i += 1
    }
    if (bestLen < 2) bestStart = -1 // single zero group is not compressed
    def h(x: Int): String = Integer.toHexString(x)
    if (bestStart < 0) g.map(h).mkString(":")
    else {
      val left = g.take(bestStart).map(h).mkString(":")
      val right = g.drop(bestStart + bestLen).map(h).mkString(":")
      left + "::" + right
    }
  }

  private val HEX = "0123456789ABCDEF".toCharArray

  private def hex(b: Array[Byte], from: Int): String = {
    val sb = new StringBuilder((b.length - from) * 2)
    var i = from
    while (i < b.length) {
      sb.append(HEX((b(i) >> 4) & 0xf)); sb.append(HEX(b(i) & 0xf)); i += 1
    }
    sb.toString
  }

  private def ethTypeStr(t: Int): String = t match {
    case 0x00bb => "EDP";        case 0x0200 => "PUP"
    case 0x0800 => "IP";         case 0x0806 => "ARP"
    case 0x88a2 => "AOE";        case 0x2000 => "CDP"
    case 0x2004 => "DTP";        case 0x8035 => "REVARP"
    case 0x8100 => "802.1Q";     case 0x88a8 => "802.1AD"
    case 0x9100 => "QINQ1";      case 0x9200 => "QINQ2"
    case 0x8137 => "IPX";        case 0x86dd => "IPv6"
    case 0x880b => "PPP";        case 0x8847 => "MPLS"
    case 0x8848 => "MPLS_MCAST"; case 0x8863 => "PPPoE_DISC"
    case 0x8864 => "PPPoE";      case 0x88cc => "LLDP"
    case 0x6558 => "TEB";        case _ => "UNKNOWN"
  }

  private val tcpFlagCodes = "FSRPAUEC" // bit 0..7; NS omitted (see doc)

  def decodeBytes(b: Array[Byte]): UTF8String = decode(b)

  private def decode(b: Array[Byte]): UTF8String = {
    val sb = new StringBuilder(256)
    var dataFrom = 0
    if (b.length >= 14) {
      sb.append(",\"ETH_src\":\"").append(mac(b, 6))
        .append("\",\"ETH_dst\":\"").append(mac(b, 0)).append('"')
      var ethType = u16(b, 12)
      var hdrLen = 14
      if (ethType == 0x8100 && b.length >= 18) {
        sb.append(",\"ETH_tag\":").append(u16(b, 14))
        ethType = u16(b, 16)
        hdrLen += 4
      }
      if (ethType >= 1500) {
        sb.append(",\"ETH_type\":").append(ethType)
          .append(",\"ETH_typestr\":\"").append(ethTypeStr(ethType)).append('"')
        dataFrom = ethType match {
          case 0x0800 => ipv4(b, hdrLen, sb)
          case 0x86dd => ipv6p(b, hdrLen, sb)
          case _ => hdrLen // dont_parse
        }
      } else dataFrom = hdrLen // LLC subset boundary: remainder is data
    }
    val dataHex = hex(b, dataFrom)
    sb.append(",\"net_bytes_data\":").append(b.length - dataFrom)
    UTF8String.fromString(sb.toString + " " + dataHex)
  }

  /** returns the offset where unparsed data starts */
  private def ipv4(b: Array[Byte], off: Int, sb: StringBuilder): Int = {
    if (b.length - off < 20) return off
    val ihl = b(off) & 0x0f
    val hdrLen = 4 * ihl
    if (ihl < 5 || off + hdrLen > b.length) return off
    sb.append(",\"net_dst_ip\":\"").append(ip4(b, off + 16))
      .append("\",\"net_src_ip\":\"").append(ip4(b, off + 12))
      .append("\",\"IP_ihl\":").append(ihl)
      .append(",\"net_ttl\":").append(u8(b, off + 8))
      .append(",\"IP_proto\":").append(u8(b, off + 9))
    ipProto(u8(b, off + 9), b, off + hdrLen, sb)
  }

  private def ipv6p(b: Array[Byte], off: Int, sb: StringBuilder): Int = {
    if (b.length - off < 40) return off
    sb.append(",\"net_dst_ip\":\"").append(ip6(b, off + 24))
      .append("\",\"net_src_ip\":\"").append(ip6(b, off + 8))
      .append("\",\"net_ttl\":").append(u8(b, off + 7))
    // direct next header only (ext-header chains: subset boundary)
    ipProto(u8(b, off + 6), b, off + 40, sb)
  }

  private def ipProto(proto: Int, b: Array[Byte], off: Int, sb: StringBuilder): Int =
    proto match {
      case 6 => tcp(b, off, sb)
      case 17 => udp(b, off, sb)
      case 1 => icmp(b, off, sb)
      case _ => off // dont_parse
    }

  private def tcp(b: Array[Byte], off: Int, sb: StringBuilder): Int = {
    if (b.length - off < 20) return off
    val dor = u8(b, off + 12)
    val hdrLen = (dor & 0xf0) >> 2
    if (hdrLen < 20 || off + hdrLen > b.length) return off
    val flagBits = u8(b, off + 13)
    val flags = new StringBuilder(8)
    var i = 0
    while (i < 8) { if ((flagBits & (1 << i)) != 0) flags.append(tcpFlagCodes(i)); i += 1 }
    sb.append(",\"net_src_port\":").append(u16(b, off))
      .append(",\"net_dst_port\":").append(u16(b, off + 2))
      .append(",\"TCP_seq_number\":").append(u32(b, off + 4))
      .append(",\"TCP_ack_number\":").append(u32(b, off + 8))
      .append(",\"net_flags\":\"").append(flags).append('"')
    off + hdrLen
  }

  private def udp(b: Array[Byte], off: Int, sb: StringBuilder): Int = {
    if (b.length - off < 8) return off
    sb.append(",\"net_src_port\":").append(u16(b, off))
      .append(",\"net_dst_port\":").append(u16(b, off + 2))
      .append(",\"UDP_Length\":").append(u16(b, off + 4))
      .append(",\"UDP_Checksum\":").append(u16(b, off + 6))
    off + 8
  }

  private def icmp(b: Array[Byte], off: Int, sb: StringBuilder): Int = {
    if (b.length - off < 8) return off
    sb.append(",\"net_icmp_type\":").append(u8(b, off))
      .append(",\"net_icmp_code\":").append(u8(b, off + 1))
      .append(",\"icmp_checksum\":").append(u16(b, off + 2))
    off + 8
  }
}

/** Catalyst face of PcapUtil.decode: BINARY packet → `fragment<SP>hex`
  * (see PcapUtil doc). Codegen is a static-kernel call, the same shape
  * as JsonSetExpr → JsonPathUtil. */
case class PcapPacketExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pcap_decode"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PcapUtil.decodeBytes(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      UTF8String ${ev.value} = ${c.isNull} ? null :
        graft.functions.PcapUtil$$.MODULE$$.decodeBytes((byte[]) ${c.value});
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(n: Expression): Expression = copy(child = n)
}
