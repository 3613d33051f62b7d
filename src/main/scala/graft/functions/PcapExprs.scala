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
    // fragment/hex separator is '\n': it cannot occur in the fragment —
    // numeric/hex/MAC renderings never produce one and every
    // packet-lifted string value goes through jstr, which escapes
    // control chars (a ' ' separator broke on app-layer values like
    // HTTP_reason "Not Found")
    UTF8String.fromString(sb.toString + "\n" + dataHex)
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
    val sp = u16(b, off)
    val dp = u16(b, off + 2)
    sb.append(",\"net_src_port\":").append(sp)
      .append(",\"net_dst_port\":").append(dp)
      .append(",\"TCP_seq_number\":").append(u32(b, off + 4))
      .append(",\"TCP_ack_number\":").append(u32(b, off + 8))
      .append(",\"net_flags\":\"").append(flags).append('"')
    // app-layer dispatch by well-known port (tcp_parser.c:110-119;
    // parsers.h port constants). The app parsers only ADD fields — the
    // unparsed remainder stays the whole app payload, exactly the
    // reference's RETURN_DATA_AFTER(0) on the payload pointer.
    val pay = off + hdrLen
    if (sp == 445 || dp == 445) smbApp(b, pay, sb)
    else if (sp == 21 || dp == 21 || sp == 20 || dp == 20) ftpApp(b, pay, sb)
    else if (sp == 80 || dp == 80 || sp == 8080 || dp == 8080) httpApp(b, pay, sb)
    pay
  }

  private def udp(b: Array[Byte], off: Int, sb: StringBuilder): Int = {
    if (b.length - off < 8) return off
    val sp = u16(b, off)
    val dp = u16(b, off + 2)
    sb.append(",\"net_src_port\":").append(sp)
      .append(",\"net_dst_port\":").append(dp)
      .append(",\"UDP_Length\":").append(u16(b, off + 4))
      .append(",\"UDP_Checksum\":").append(u16(b, off + 6))
    if (sp == 53 || dp == 53) dnsApp(b, off + 8, sb) // udp_parser.c:85-87
    off + 8
  }

  // ---- app-layer parsers (contrib/impcap/{dns,http,ftp,smb}_parser.c)

  /** json-c string escape for values lifted out of packet bytes. */
  private def jstr(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case x if x < 0x20 => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private val dnsRcodes = Array("NoError", "FormErr", "ServFail", "NXDomain",
    "NotImp", "Refused", "YXDomain", "YXRRSet", "NXRRSet", "NotAuth",
    "NotZone", "", "", "", "", "")
  private val dnsTypes = Map(1 -> "A", 2 -> "NS", 5 -> "CNAME", 6 -> "SOA",
    12 -> "PTR", 15 -> "MX", 16 -> "TXT", 28 -> "AAAA", 33 -> "SRV",
    35 -> "NAPTR", 41 -> "OPT", 43 -> "DS", 46 -> "RRSIG", 47 -> "NSEC",
    48 -> "DNSKEY", 52 -> "SMIMEA", 99 -> "SPF", 255 -> "*", 257 -> "CAA")
  private def dnsClass(x: Int): String = x match {
    case 1 => "IN"; case 3 => "CH"; case 4 => "HS"
    case 254 => "QCLASS NONE"; case 255 => "QCLASS *"
    case _ => "UNKNOWN"
  }

  /** dns_parser.c dns_parse: header + question-section walk. Answers are
    * deliberately not processed (dns_parser.c:352 "do not process
    * them"); a set Z (reserved) bit aborts, oversized / truncated
    * queries stop the walk but keep the header fields. */
  private def dnsApp(b: Array[Byte], off: Int, sb: StringBuilder): Unit = {
    val size = b.length - off
    if (size < 12) return
    val txid = u16(b, off)
    val flags = u16(b, off + 2)
    if (((flags >> 6) & 1) != 0) return // reserved Z bit MUST be 0
    val rcode = flags & 0xf
    val qd = u16(b, off + 4)
    val names = new StringBuilder(64)
    names.append('[')
    var p = off + 12
    var q = 0
    var first = true
    var ok = true
    while (ok && q < qd && p < b.length) {
      // strnlen to the first 0 byte (name length incl. label bytes)
      var z = p
      while (z < b.length && b(z) != 0) z += 1
      val qs = z - p
      if (qs >= 256 || qs + 5 > b.length - p) ok = false
      else {
        val dom = new StringBuilder(qs)
        var nb = u8(b, p); p += 1
        var cpt = 0
        while (cpt + 1 < qs) {
          if (nb == 0) { nb = u8(b, p); dom.append('.') }
          else { dom.append((b(p) & 0xff).toChar); nb -= 1 }
          cpt += 1; p += 1
        }
        if (cpt > 0) p += 1 // pass the terminating 0
        val qtype = u16(b, p); p += 2
        val qclass = u16(b, p); p += 2
        if (!first) names.append(',')
        first = false
        names.append("{\"qname\":"); jstr(dom.toString, names)
        names.append(",\"qtype\":").append(qtype).append(",\"type\":")
        jstr(dnsTypes.getOrElse(qtype, "UNKNOWN"), names)
        names.append(",\"qclass\":").append(qclass).append(",\"class\":")
        jstr(dnsClass(qclass), names)
        names.append('}')
        q += 1
      }
    }
    names.append(']')
    sb.append(",\"DNS_transaction_id\":").append(txid)
      .append(",\"DNS_response_flag\":").append(((flags >> 15) & 1) == 1)
      .append(",\"DNS_opcode\":").append((flags >> 11) & 0xf)
      .append(",\"DNS_rcode\":").append(rcode)
      .append(",\"DNS_error\":")
    jstr(dnsRcodes(rcode), sb)
    sb.append(",\"DNS_QDCOUNT\":").append(qd)
      .append(",\"DNS_ANCOUNT\":").append(u16(b, off + 6))
      .append(",\"DNS_NSCOUNT\":").append(u16(b, off + 8))
      .append(",\"DNS_ARCOUNT\":").append(u16(b, off + 10))
      .append(",\"DNS_Names\":").append(names)
  }

  private val httpKeywords = Array("OPTIONS", "GET", "HEAD", "POST", "PUT",
    "DELETE", "TRACE", "CONNECT", "HTTP")

  /** http_parser.c http_parse: status line + header fields of either a
    * request or a response; body (after CRLFCRLF) ignored. Gate = any
    * method/HTTP keyword appearing within the first 20 bytes. */
  private def httpApp(b: Array[Byte], off: Int, sb: StringBuilder): Unit = {
    val size = b.length - off
    if (size < 6) return
    val s = new String(b, off, size, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!httpKeywords.exists { k => val i = s.indexOf(k); i >= 0 && i < 20 })
      return
    val header = { val i = s.indexOf("\r\n\r\n"); if (i < 0) s else s.substring(0, i) }
    val lines = header.split("\r\n", -1)
    val status = lines(0)
    val sp1 = status.indexOf(' ')
    val sp2 = if (sp1 < 0) -1 else status.indexOf(' ', sp1 + 1)
    if (sp1 > 0 && sp2 > sp1) {
      val a = status.substring(0, sp1)
      val c = status.substring(sp1 + 1, sp2)
      val d = status.substring(sp2 + 1)
      if (a.contains("HTTP")) {
        sb.append(",\"HTTP_version\":"); jstr(a, sb)
        sb.append(",\"HTTP_status_code\":"); jstr(c, sb)
        sb.append(",\"HTTP_reason\":"); jstr(d, sb)
      } else {
        sb.append(",\"HTTP_method\":"); jstr(a, sb)
        sb.append(",\"HTTP_request_URI\":"); jstr(c, sb)
        sb.append(",\"HTTP_version\":"); jstr(d, sb)
      }
    }
    sb.append(",\"HTTP_header_fields\":{")
    var first = true
    var i = 1
    while (i < lines.length) {
      val fv = lines(i)
      val colonAt = fv.indexOf(':')
      if (colonAt >= 0) {
        var v = colonAt + 1
        while (v < fv.length && fv.charAt(v) == ' ') v += 1
        if (!first) sb.append(',')
        first = false
        jstr(fv.substring(0, colonAt), sb)
        sb.append(':')
        jstr(fv.substring(v), sb)
      }
      i += 1
    }
    sb.append('}')
  }

  private val ftpCodes = Set(100, 110, 120, 125, 150, 200, 202, 211, 212,
    213, 214, 215, 220, 221, 225, 226, 227, 228, 229, 230, 231, 232, 250,
    257, 300, 331, 332, 350, 400, 421, 425, 426, 430, 434, 450, 451, 452,
    500, 501, 502, 503, 504, 530, 532, 550, 551, 552, 553, 600, 631, 632,
    633, 10000, 100054, 10060, 10061, 10066, 10068)
  private val ftpCmds = Array("STOR", "TYPE", "ABOR", "ACCT", "ALLO", "APPE",
    "CDUP", "CWD", "DELE", "HELP", "LIST", "MKD", "MODE", "NLST", "NOOP",
    "PASS", "PASV", "PORT", "PWD", "QUIT", "REIN", "REST", "RETR", "RMD",
    "RNFR", "RNTO", "SITE", "SMNT", "STAT", "STOU", "STRU", "SYST", "USER")

  /** ftp_parser.c ftp_parse: the first space-token is either a known
    * reply code (strtol leading-digits) or a command; a non-numeric
    * unknown token reports FTP_request "UNKNOWN" — the reference's own
    * fallthrough. */
  private def ftpApp(b: Array[Byte], off: Int, sb: StringBuilder): Unit = {
    val size = b.length - off
    if (size < 5) return
    val s = new String(b, off, size, java.nio.charset.StandardCharsets.ISO_8859_1)
    // strtok(" "): skip leading delimiters, token to the next one
    var st = 0
    while (st < s.length && s.charAt(st) == ' ') st += 1
    var en = st
    while (en < s.length && s.charAt(en) != ' ') en += 1
    if (en == st) return
    val tok = s.substring(st, en)
    // strtol: leading optional sign + digits
    var dg = 0
    while (dg < tok.length && tok.charAt(dg).isDigit) dg += 1
    val code = if (dg == 0) 0L else
      try tok.substring(0, dg).toLong catch { case _: Exception => 0L }
    if (code != 0 && ftpCodes(code.toInt))
      sb.append(",\"FTP_response\":").append(code)
    else {
      val cmd = ftpCmds.find(_ == tok).getOrElse("UNKNOWN")
      sb.append(",\"FTP_request\":"); jstr(cmd, sb)
    }
  }

  /** smb_parser.c smb_parse: scan to the 'SMB' magic, read the 64-byte
    * SMB2 header (little-endian struct fields, no byte swap in the
    * reference either). Faithful quirks kept with cites: the version
    * test compares the whole uint32 magic to 0xFF (smb_parser.c:124 —
    * never true once the scan demanded 'SMB' at bytes 1-3, so version
    * reports 2), and the 64-bit sequence/user ids combine their halves
    * with `<< 16` in uint32 arithmetic (smb_parser.c:126-127). */
  private def smbApp(b: Array[Byte], off: Int, sb: StringBuilder): Unit = {
    var p = off
    while (b.length - p >= 4 &&
           !(b(p + 1) == 'S'.toByte && b(p + 2) == 'M'.toByte &&
             b(p + 3) == 'B'.toByte)) p += 1
    if (b.length - p < 64) return
    val version = if (leU32(b, p) == 0xffL) 1 else 2
    val ntStatus = leU32(b, p + 8)
    val opCode = leU16(b, p + 12)
    val flags32 = leU32(b, p + 16)
    val seqNum = (leU32(b, p + 24) | ((leU32(b, p + 28) << 16) & 0xffffffffL)) & 0xffffffffL
    val processId = leU32(b, p + 32)
    val treeId = leU32(b, p + 36)
    val userId = (leU32(b, p + 40) | ((leU32(b, p + 44) << 16) & 0xffffffffL)) & 0xffffffffL
    val flagCodes = "RPCS"
    val flags = new StringBuilder(4)
    var i = 0
    while (i < 4) { if ((flags32 & (1L << i)) != 0) flags.append(flagCodes.charAt(i)); i += 1 }
    sb.append(",\"SMB_version\":").append(version)
      .append(",\"SMB_NTstatus\":").append(ntStatus)
      .append(",\"SMB_operation\":").append(opCode)
      .append(",\"SMB_flags\":\"").append(flags).append('"')
      .append(",\"SMB_seqNumber\":").append(seqNum)
      .append(",\"SMB_processID\":").append(processId)
      .append(",\"SMB_treeID\":").append(treeId)
      .append(",\"SMB_userID\":").append(userId)
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
