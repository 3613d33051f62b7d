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

/** Full mmanon configuration (plugins/mmanon/mmanon.c
  * setInstParamDefaults :278-312): IPv4 + IPv6 + embedded-IPv4-in-IPv6
  * scanning, each independently switchable with its own bits/mode.
  * Modes: 0=zero 1=random 2=random-consistent 3=simple (v4 only). */
case class AnonIpCfg(
    v4On: Boolean = true, v4Bits: Int = 16, v4Mode: Int = 0, v4Char: Char = 'x',
    v6On: Boolean = true, v6Bits: Int = 96, v6Mode: Int = 0,
    embOn: Boolean = true, embBits: Int = 96, embMode: Int = 0,
    seed: Long = 0L)

/** mmanon over MESSAGE TEXT, all three address families — faithful port
  * of the reference's recognizers (syntax_ipv4 :621, syntax_ipv6 :757,
  * syntax_embedded :1738 incl. the 5-hex-digit port-tail back-out),
  * parsers (ipv62num :1316, embedded2num :1825), masking (code_ipv4_int
  * :892, code_ipv6_int :1217), renders (num2ipv4 :1024 dotted quad,
  * num2ipv6 :1376 uncompressed lowercase %x groups, num2embedded :1453),
  * and the doAction scan loop (:1966-1976: embedded → v4 → v6 tried at
  * each index; the per-iteration i++ means the char straight after a
  * replacement is never a candidate start — preserved).
  *
  * Documented divergences: the random modes draw from a seeded splitmix64
  * keyed hash instead of per-worker rand_r — random-consistent maps each
  * distinct source address to a stable replacement cluster-wide and
  * across runs (the reference is only consistent within one process,
  * via a mutex-guarded table a 1000-executor engine cannot share), and
  * plain random keys on (address, scan position) as a deterministic
  * stand-in. simple mode does not replicate the reference's buffer
  * underrun (simpleAnon :1148-1160 can read digits BEFORE the match). */
case class AnonIpMsgExpr(child: Expression, cfg: AnonIpCfg)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "anon_ip_msg"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(AnonIpMsgExpr.anon(input.toString, cfg))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cfgRef = ctx.addReferenceObj("anonCfg", cfg, "graft.functions.AnonIpCfg")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
      s"graft.functions.AnonIpMsgExpr$$.MODULE$$.anon($c.toString(), $cfgRef));")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AnonIpMsgExpr {
  final val ZERO = 0; final val RANDOM = 1; final val RAND_CONSIS = 2
  final val SIMPLE = 3

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b5L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** isValidHexNum (:690-742): consumes a hex-digit run (capped at 5) OR
    * one leading ':' (→ -1) or, with handleDot, one '.' (→ -2). Returns
    * (code, newPos) — the C advances nprocessed in place. */
  private def hexRun(s: String, pos: Int, n: Int, handleDot: Boolean): Long = {
    var np = pos
    var cyc = 0
    var done = false
    while (!done && np < n) {
      val c = s.charAt(np)
      if (isHexDigit(c)) {
        cyc += 1; np += 1
        if (cyc == 5) done = true
      } else if (c == ':') {
        if (cyc == 0) { np += 1; cyc = -1 }
        done = true
      } else if (c == '.' && handleDot && cyc == 0) {
        np += 1; cyc = -2; done = true
      } else done = true
    }
    (cyc.toLong << 32) | (np.toLong & 0xFFFFFFFFL)
  }

  /** syntax_ipv6 (:757-839): chars consumed by an IPv6 at `start`, or -1. */
  def matchIpv6(s: String, start: Int, n: Int): Int = {
    var np = start
    var lastSep = false; var hadAbbrev = false; var lastAbbrev = false
    var ipParts = 0
    var isIP = false
    var done = false
    while (!done && np < n) {
      val r = hexRun(s, np, n, handleDot = false)
      val numLen = (r >> 32).toInt
      np = (r & 0xFFFFFFFFL).toInt
      if (numLen > 0 && numLen < 5) {
        if ((ipParts == 7 && hadAbbrev) || ipParts > 7) { isIP = false; done = true }
        else if (ipParts == 0 && lastSep && !hadAbbrev) { isIP = false; done = true }
        else { lastSep = false; lastAbbrev = false; ipParts += 1 }
      } else if (numLen < 0) { // ':'
        if (lastSep) {
          if (hadAbbrev) { isIP = false; done = true }
          else { hadAbbrev = true; lastAbbrev = true }
        }
        if (!done) lastSep = true
      } else if (numLen == 5) { // possible port tail (":12345")
        if (hadAbbrev && ipParts >= 2) { isIP = true; np -= 6 } else isIP = false
        done = true
      } else { // no valid num
        if (lastSep) isIP = lastAbbrev && ipParts < 8
        else isIP = (ipParts == 8 && !hadAbbrev) || (ipParts < 8 && hadAbbrev)
        done = true
      }
      if (!done && ipParts == 8 && !hadAbbrev) { isIP = true; done = true }
    }
    if (!done) // buffer exhausted (:833-835)
      isIP = (!lastSep && ipParts == 8 && !hadAbbrev) || (ipParts < 8 && hadAbbrev)
    if (isIP) np - start else -1
  }

  /** syntax_embedded (:1738-1812): (consumed << 32) | v4StartRel, or -1. */
  def matchEmbedded(s: String, start: Int, n: Int): Long = {
    var np = start
    var lastSep = false; var hadAbbrev = false
    var ipParts = 0
    while (np < n) {
      val r = hexRun(s, np, n, handleDot = true)
      val numLen = (r >> 32).toInt
      np = (r & 0xFFFFFFFFL).toInt
      if (numLen > 0) {
        if ((ipParts == 6 && hadAbbrev) || ipParts > 6) return -1L
        if (ipParts == 0 && lastSep && !hadAbbrev) return -1L
        lastSep = false; ipParts += 1
      } else if (numLen == -1) { // ':'
        if (lastSep) {
          if (hadAbbrev) return -1L
          hadAbbrev = true
        }
        lastSep = true
      } else if (numLen == -2) { // '.' — potential v4 tail
        if (lastSep || (ipParts == 0 && hadAbbrev) ||
            (ipParts <= 6 && !hadAbbrev)) return -1L
        // findV4Start (:1712-1730): back from the dot to the previous ':'
        var j = np - 1
        var v4s = start
        var found = false
        while (!found && j > start) {
          if (s.charAt(j) == ':') { v4s = j + 1; found = true }
          j -= 1
        }
        if (v4s >= n) return -1L
        val ipv4Len = matchIpv4(s, v4s, n)
        if (ipv4Len < 0) return -1L
        val scanned = np - v4s
        if (ipv4Len < scanned) return -1L
        np = v4s + ipv4Len
        return ((np - start).toLong << 32) | ((v4s - start).toLong & 0xFFFFFFFFL)
      } else return -1L
    }
    -1L // embedded must end in a v4 tail; buffer exhausted first (:1807)
  }

  /** syntax_ipv4 (:621-672 via isPosByte): chars consumed, or -1. */
  def matchIpv4(s: String, start: Int, n: Int): Int = {
    var p = start
    var k = 0
    while (k < 4) {
      // isPosByte: the WHOLE digit run must be 1-3 digits and ≤ 255
      var j = p
      var v = 0
      while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
        if (j - p < 4) v = v * 10 + (s.charAt(j) - '0')
        j += 1
      }
      val len = j - p
      if (len < 1 || len > 3 || v > 255) return -1
      p = j
      if (k < 3) {
        if (p >= n || s.charAt(p) != '.') return -1
        p += 1
      }
      k += 1
    }
    p - start
  }

  /** ipv62num (:1316-1374): quirk-faithful forward + backward parse. */
  private def ipv6ToNum(a: String): Array[Int] = {
    val num = new Array[Int](8)
    val len = a.length
    var cyc = 0; var dots = 0; var i = 0
    while (i < len && dots < 2) {
      val v = hexVal(a.charAt(i))
      if (v == -1) { dots += 1; if (dots < 2) cyc += 1 }
      else { num(cyc) = num(cyc) * 16 + v; dots = 0 }
      i += 1
    }
    if (dots == 2 && i < len - 1) {
      var shift = 0; cyc = 7
      var j = len - 1
      while (j >= i) {
        val v = hexVal(a.charAt(j))
        if (v == -1) { cyc -= 1; shift = 0 }
        else { num(cyc) += v << shift; shift += 4 }
        j -= 1
      }
    }
    num
  }

  /** embedded2num (:1825-1881): hex prefix into groups 0-5 (cyc capped
    * at 5 on the backward pass), v4 tail into groups 6-7. */
  private def embeddedToNum(a: String, v4Start: Int): Array[Int] = {
    val num = new Array[Int](8)
    val v4 = IsInSubnetExpr.parseIpv4(a.substring(v4Start))
    num(7) = (v4 & 0xFFFF).toInt
    num(6) = ((v4 >> 16) & 0xFFFF).toInt
    var cyc = 0; var dots = 0; var i = 0
    while (i < v4Start && dots < 2) {
      val v = hexVal(a.charAt(i))
      if (v == -1) { dots += 1; if (dots < 2) cyc += 1 }
      else { num(cyc) = num(cyc) * 16 + v; dots = 0 }
      i += 1
    }
    if (dots == 2 && i < v4Start) {
      var shift = 0; cyc = 5
      var j = v4Start - 1
      while (j >= i) {
        val v = hexVal(a.charAt(j))
        if (v == -1) { cyc -= 1; shift = 0 }
        else { num(cyc) += v << shift; shift += 4 }
        j -= 1
      }
    }
    num
  }

  private def groupsToHighLow(num: Array[Int]): (Long, Long) = {
    var high = 0L; var low = 0L
    var i = 0
    while (i < 4) { high = (high << 16) | (num(i) & 0xFFFFL); i += 1 }
    while (i < 8) { low = (low << 16) | (num(i) & 0xFFFFL); i += 1 }
    (high, low)
  }

  /** code_ipv6_int (:1217-1302) with hash-derived randomness. */
  private def codeV6(high0: Long, low0: Long, bits: Int, mode: Int,
                     seed: Long, pos: Int): (Long, Long) = {
    var high = high0; var low = low0
    if (bits == 128) { high = 0L; low = 0L }
    else if (bits > 64) { low = 0L; high = (high >>> (bits - 64)) << (bits - 64) }
    else if (bits == 64) low = 0L
    else low = (low >>> bits) << bits
    if (mode == RANDOM || mode == RAND_CONSIS) {
      val k = mix(mix(seed) ^ high0) ^ mix(low0) ^
        (if (mode == RANDOM) mix(0x51cedeadL ^ pos) else 0L)
      val r1 = mix(k)
      val r2 = mix(k ^ 0x5851f42d4c957f2dL)
      if (bits == 128) { high = r1; low = r2 }
      else if (bits > 64) { low = r2; high |= r1 & ((1L << (bits - 64)) - 1) }
      else if (bits == 64) low = r2
      else if (bits > 0) low |= r2 & ((1L << bits) - 1)
    }
    (high, low)
  }

  /** num2ipv6 (:1376-1398): uncompressed lowercase, no zero padding. */
  private def renderV6(high: Long, low: Long, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < 8) {
      if (i > 0) sb.append(':')
      val g = if (i < 4) (high >>> ((3 - i) * 16)) & 0xFFFF
              else (low >>> ((7 - i) * 16)) & 0xFFFF
      sb.append(java.lang.Long.toHexString(g))
      i += 1
    }
  }

  /** num2embedded (:1453-1469): 6 hex groups + dotted-quad tail. */
  private def renderEmbedded(high: Long, low: Long, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < 6) {
      if (i > 0) sb.append(':')
      val g = if (i < 4) (high >>> ((3 - i) * 16)) & 0xFFFF
              else (low >>> ((7 - i) * 16)) & 0xFFFF
      sb.append(java.lang.Long.toHexString(g))
      i += 1
    }
    val g6 = (low >>> 16) & 0xFFFF
    val g7 = low & 0xFFFF
    sb.append(':').append((g6 >> 8) & 0xFF).append('.').append(g6 & 0xFF)
      .append('.').append((g7 >> 8) & 0xFF).append('.').append(g7 & 0xFF)
  }

  /** code_ipv4_int (:892-915). */
  private def codeV4(num: Long, bits: Int, mode: Int, seed: Long, pos: Int): Long = {
    val masked = if (bits >= 32) 0L else (num >>> bits) << bits
    if (mode == RANDOM || mode == RAND_CONSIS) {
      val k = mix(mix(seed) ^ num) ^
        (if (mode == RANDOM) mix(0x51cedeadL ^ pos) else 0L)
      val m = if (bits >= 32) 0xFFFFFFFFL else (1L << bits) - 1
      masked + (mix(k) & m)
    } else masked
  }

  private def renderV4(num: Long, sb: java.lang.StringBuilder): Unit =
    sb.append((num >> 24) & 0xFF).append('.').append((num >> 16) & 0xFF)
      .append('.').append((num >> 8) & 0xFF).append('.').append(num & 0xFF)

  /** simpleAnon (:1127-1147): overwrite the digits of the last bits/8
    * octets (scanning backward, delimiters untouched) with replaceChar.
    * The backward walk deliberately continues PAST the match start into
    * preceding message text — the reference replaces msg[idx-1], … while
    * digits continue (mmanon_simple_33_ipv4.sh: "1111.1.1.8.1" →
    * "****.*.*.*.1"), so it operates on the emitted output buffer here,
    * bounded at the message start where the reference would underrun
    * into heap bytes. */
  private def simpleV4(out: java.lang.StringBuilder, span: String,
                       bits: Int, rc: Char): Unit = {
    out.append(span)
    val maxidx = out.length - 1
    var j = -1
    var k = bits / 8
    while (k > 0) {
      j += 1
      while (maxidx - j >= 0 && {
          val c = out.charAt(maxidx - j); c >= '0' && c <= '9' }) {
        out.setCharAt(maxidx - j, rc)
        j += 1
      }
      k -= 1
    }
  }

  /** The doAction scan loop (:1966-1976). */
  def anon(msg: String, cfg: AnonIpCfg): String = {
    val n = msg.length
    val out = new java.lang.StringBuilder(n + 16)
    var i = 0
    while (n - i >= 2) {
      if (cfg.embOn) {
        val m = matchEmbedded(msg, i, n)
        if (m >= 0) {
          val len = (m >> 32).toInt
          val v4Rel = (m & 0xFFFFFFFFL).toInt
          val span = msg.substring(i, i + len)
          val num = embeddedToNum(span, v4Rel)
          val (h0, l0) = groupsToHighLow(num)
          val (h, l) = codeV6(h0, l0, cfg.embBits, cfg.embMode, cfg.seed, i)
          renderEmbedded(h, l, out)
          i += len
        }
      }
      if (cfg.v4On && i < n) {
        val len = matchIpv4(msg, i, n)
        if (len > 0) {
          val span = msg.substring(i, i + len)
          if (cfg.v4Mode == SIMPLE) simpleV4(out, span, cfg.v4Bits, cfg.v4Char)
          else {
            val num = IsInSubnetExpr.parseIpv4(span)
            renderV4(codeV4(num, cfg.v4Bits, cfg.v4Mode, cfg.seed, i), out)
          }
          i += len
        }
      }
      if (cfg.v6On && i < n) {
        val len = matchIpv6(msg, i, n)
        if (len > 0) {
          val span = msg.substring(i, i + len)
          val num = ipv6ToNum(span)
          val (h0, l0) = groupsToHighLow(num)
          val (h, l) = codeV6(h0, l0, cfg.v6Bits, cfg.v6Mode, cfg.seed, i)
          renderV6(h, l, out)
          i += len
        }
      }
      if (i < n) { out.append(msg.charAt(i)); i += 1 }
    }
    if (i < n) out.append(msg, i, n)
    out.toString
  }
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
