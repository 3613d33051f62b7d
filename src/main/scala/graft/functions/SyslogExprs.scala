package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.time.{LocalDateTime, ZoneOffset, OffsetDateTime}

/** Single-pass syslog header parser covering RFC5424 and RFC3164 with
  * rsyslog's heuristics. One custom Catalyst expression replaces rsyslog's
  * parser chain (reference: tools/pmrfc5424.c:204, tools/pmrfc3164.c:65-71,
  * runtime/parser.c:613-686): protocol is auto-detected the way rsyslog
  * does — a '1' digit + space right after the PRI means RFC5424.
  *
  * Returns a struct; `parsesuccess=false` rows carry the raw message in
  * `msg` and nulls elsewhere (rsyslog's COULD_NOT_PARSE → next parser →
  * fallback semantics collapsed into one expression).
  */
case class SyslogParseExpr(child: Expression, defaultYear: Int = 2024)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = SyslogParseExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_syslog"

  override protected def nullSafeEval(input: Any): Any =
    SyslogParseExpr.parse(input.toString, defaultYear)

  // real codegen (not CodegenFallback): children stay codegen'd and the
  // kernel is one static call — keeps the scan→parse→filter pipeline
  // inside a single WholeStageCodegen stage
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SyslogParseExpr$$.MODULE$$.parse($c.toString(), $defaultYear);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SyslogParseExpr {
  val schema: StructType = StructType(Seq(
    StructField("protocol_version", IntegerType),
    StructField("pri", IntegerType),
    StructField("facility", IntegerType),
    StructField("severity", IntegerType),
    StructField("ts", TimestampType),
    StructField("hostname", StringType),
    StructField("app_name", StringType),
    StructField("procid", StringType),
    StructField("msgid", StringType),
    StructField("structured_data", StringType),
    StructField("syslogtag", StringType),
    StructField("programname", StringType),
    StructField("msg", StringType),
    StructField("parsesuccess", BooleanType)
  ))

  private val months = Map(
    "Jan" -> 1, "Feb" -> 2, "Mar" -> 3, "Apr" -> 4, "May" -> 5, "Jun" -> 6,
    "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Oct" -> 10, "Nov" -> 11, "Dec" -> 12)

  private def utf8(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)

  /** program name = tag up to first char not in [A-Za-z0-9_/.-] (rsyslog
    * msg.c programname derivation). */
  def programName(tag: String): String = {
    if (tag == null) return null
    var i = 0
    while (i < tag.length && (tag(i).isLetterOrDigit ||
           tag(i) == '_' || tag(i) == '/' || tag(i) == '.' || tag(i) == '-')) i += 1
    tag.substring(0, i)
  }

  def parse(raw: String, defaultYear: Int): InternalRow = {
    try parseImpl(raw, defaultYear)
    catch { case _: Exception => fallback(raw) }
  }

  private def fallback(raw: String): InternalRow =
    InternalRow(1, null, null, null, null, null, null, null, null, null,
      null, null, utf8(raw), false)

  private def parseImpl(raw: String, defaultYear: Int): InternalRow = {
    var i = 0
    val n = raw.length
    // ---- PRI ----
    var pri = 13 // user.notice default when no PRI (RFC3164 §4.3.3)
    if (i < n && raw(i) == '<') {
      val close = raw.indexOf('>', i)
      if (close > i && close <= i + 4) {
        val p = raw.substring(i + 1, close)
        if (p.nonEmpty && p.forall(_.isDigit)) {
          pri = p.toInt
          if (pri > 191) pri = 13
          i = close + 1
        }
      }
    }
    val facility = pri >> 3
    val severity = pri & 7

    // ---- protocol detect: "1 " right after PRI → RFC5424 ----
    if (i + 1 < n && raw(i) == '1' && raw(i + 1) == ' ') {
      parse5424(raw, i + 2, pri, facility, severity)
    } else {
      parse3164(raw, i, pri, facility, severity, defaultYear)
    }
  }

  private def nilNull(s: String): String = if (s == "-") null else s

  private def token(raw: String, start: Int): (String, Int) = {
    var i = start
    val n = raw.length
    while (i < n && raw(i) == ' ') i += 1
    val s = i
    while (i < n && raw(i) != ' ') i += 1
    (raw.substring(s, i), i)
  }

  private def parse5424(raw: String, start: Int, pri: Int, fac: Int, sev: Int): InternalRow = {
    var i = start
    val n = raw.length
    val (tsStr, i1) = token(raw, i)
    val (host, i2) = token(raw, i1)
    val (app, i3) = token(raw, i2)
    val (procid, i4) = token(raw, i3)
    val (msgid, i5) = token(raw, i4)
    i = i5
    while (i < n && raw(i) == ' ') i += 1
    // STRUCTURED-DATA: '-' or one-or-more [..] blocks (escaped \] inside)
    var sd: String = null
    if (i < n && raw(i) == '-') { i += 1 }
    else if (i < n && raw(i) == '[') {
      val sdStart = i
      while (i < n && raw(i) == '[') {
        i += 1
        var esc = false
        while (i < n && (raw(i) != ']' || esc)) {
          esc = raw(i) == '\\' && !esc
          i += 1
        }
        if (i < n) i += 1 // consume ']'
      }
      sd = raw.substring(sdStart, i)
    }
    if (i < n && raw(i) == ' ') i += 1
    val msg = if (i < n) raw.substring(i) else ""
    val tsMicros: java.lang.Long =
      if (tsStr == "-") null
      else try {
        val odt = OffsetDateTime.parse(tsStr)
        java.lang.Long.valueOf(odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L)
      } catch { case _: Exception => null }
    val appN = nilNull(app)
    val tag = if (appN == null) null else appN + (if (nilNull(procid) != null) "[" + procid + "]" else "") + ":"
    InternalRow(1, pri, fac, sev,
      if (tsMicros == null) null else tsMicros.longValue(),
      utf8(nilNull(host)), utf8(appN), utf8(nilNull(procid)), utf8(nilNull(msgid)),
      utf8(sd), utf8(tag), utf8(programName(appN)), utf8(msg), true)
  }

  private def parse3164(raw: String, start: Int, pri: Int, fac: Int, sev: Int,
                        defaultYear: Int): InternalRow = {
    var i = start
    val n = raw.length
    // TIMESTAMP "Mmm dd hh:mm:ss" (day may be space-padded: "Mar  1");
    // rsyslog's rfc3164 parser FIRST tries an RFC3339 timestamp in the
    // TIMESTAMP slot (runtime/parser.c ParseTIMESTAMP3339 before
    // TIMESTAMP3164 — pinned by prop-programname-with-slashes.sh's
    // "<133>2011-03-01T11:22:12Z host tag..." wire format)
    var tsMicros: java.lang.Long = null
    var ok = false
    if (i + 19 <= n && raw(i + 4) == '-' && raw(i + 7) == '-' &&
        (raw(i + 10) == 'T' || raw(i + 10) == 't')) {
      val sp = raw.indexOf(' ', i)
      val end = if (sp < 0) n else sp
      try {
        val odt = OffsetDateTime.parse(raw.substring(i, end))
        tsMicros = java.lang.Long.valueOf(
          odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L)
        i = end
        ok = true
      } catch { case _: Exception => }
    }
    if (!ok && i + 15 <= n) {
      val mon = months.get(raw.substring(i, i + 3))
      if (mon.isDefined && raw(i + 3) == ' ') {
        val dayStr = raw.substring(i + 4, i + 6).trim
        if (dayStr.nonEmpty && dayStr.forall(_.isDigit) && raw(i + 6) == ' ') {
          val t = raw.substring(i + 7, i + 15)
          if (t(2) == ':' && t(5) == ':') {
            val hh = t.substring(0, 2).toInt
            val mm = t.substring(3, 5).toInt
            val ss = t.substring(6, 8).toInt
            var year = defaultYear
            var j = i + 15
            // rsyslog heuristic: optional " YYYY" after the time
            // (tools/pmrfc3164.c year-after-timestamp detection)
            if (j + 5 <= n && raw(j) == ' ' && j + 5 <= n &&
                raw.substring(j + 1, j + 5).forall(_.isDigit)) {
              val y = raw.substring(j + 1, j + 5).toInt
              if (y >= 1970 && y <= 2100) { year = y; j += 5 }
            }
            val ldt = LocalDateTime.of(year, mon.get, dayStr.toInt, hh, mm, ss)
            tsMicros = java.lang.Long.valueOf(ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L)
            i = j
            ok = true
          }
        }
      }
    }
    if (!ok) {
      // headerless (rsyslog: whole rest is MSG, hostname unknown)
      val msg = raw.substring(start)
      return InternalRow(0, pri, fac, sev, null, null, null, null, null, null,
        null, null, utf8(msg), true)
    }
    while (i < n && raw(i) == ' ') i += 1
    // HOSTNAME then TAG; rsyslog treats first token w/o ':'-terminated tag
    // shape ambiguity by: token1 = hostname, token2.. = TAG if it contains ':'
    val (host, i2) = token(raw, i)
    i = i2
    while (i < n && raw(i) == ' ') i += 1
    // TAG: up to 32 chars ending at ':' or '[' or ' '
    var tag: String = null
    var procid: String = null
    val tagStart = i
    var j = i
    while (j < n && raw(j) != ':' && raw(j) != ' ' && raw(j) != '[' && j - tagStart < 32) j += 1
    if (j < n && raw(j) == '[') {
      val pEnd = raw.indexOf(']', j)
      if (pEnd > 0) {
        procid = raw.substring(j + 1, pEnd)
        var k = pEnd + 1
        if (k < n && raw(k) == ':') k += 1
        tag = raw.substring(tagStart, pEnd + 1) + ":"
        i = k
      } else { tag = raw.substring(tagStart, j); i = j }
    } else if (j < n && raw(j) == ':') {
      tag = raw.substring(tagStart, j + 1)
      i = j + 1
    } else if (j < n && raw(j) == ' ' && j > tagStart) {
      // space-terminated TAG (tcpflood "tag msgnum:..." shape — rsyslog
      // accepts it; the classic 3164 TAG/MSG ambiguity resolved tag-first)
      tag = raw.substring(tagStart, j)
      i = j + 1
    } else {
      // no tag terminator → message has no TAG; rest after hostname is MSG
      tag = null
      i = tagStart
    }
    if (i < n && raw(i) == ' ') i += 1
    val msg = if (i < n) raw.substring(i) else ""
    val tagNoColon = if (tag == null) null else tag.stripSuffix(":")
    val appFromTag = if (tagNoColon == null) null else {
      val b = tagNoColon.indexOf('[')
      if (b >= 0) tagNoColon.substring(0, b) else tagNoColon
    }
    InternalRow(0, pri, fac, sev,
      if (tsMicros == null) null else tsMicros.longValue(),
      utf8(host), utf8(appFromTag), utf8(procid), null, null,
      utf8(tag), utf8(programName(appFromTag)), utf8(msg), true)
  }
}

/** RFC5424 STRUCTURED-DATA string → JSON (reference: mmpstrucdata,
  * plugins/mmpstrucdata/mmpstrucdata.c). `[id@ent k="v" k2="v2"][id2 ...]`
  * → {"id@ent":{"k":"v","k2":"v2"},"id2":{}}. Escapes \" \\ \] honored.
  */
case class ParseStructuredDataExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_structured_data"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val root = JsonPathUtil.mapper.createObjectNode()
    var i = 0
    val n = s.length
    try {
      while (i < n) {
        while (i < n && s(i) != '[') i += 1
        if (i >= n) return UTF8String.fromString(JsonPathUtil.mapper.writeValueAsString(root))
        i += 1
        val idStart = i
        while (i < n && s(i) != ' ' && s(i) != ']') i += 1
        val sdid = s.substring(idStart, i)
        val elem = JsonPathUtil.mapper.createObjectNode()
        root.set(sdid, elem)
        while (i < n && s(i) != ']') {
          while (i < n && s(i) == ' ') i += 1
          if (i < n && s(i) == ']') { /* done */ }
          else {
            val kStart = i
            while (i < n && s(i) != '=') i += 1
            val key = s.substring(kStart, i)
            i += 1 // '='
            if (i < n && s(i) == '"') {
              i += 1
              val sb = new StringBuilder
              while (i < n && s(i) != '"') {
                if (s(i) == '\\' && i + 1 < n &&
                    (s(i + 1) == '"' || s(i + 1) == '\\' || s(i + 1) == ']')) {
                  sb.append(s(i + 1)); i += 2
                } else { sb.append(s(i)); i += 1 }
              }
              i += 1 // closing quote
              elem.put(key, sb.toString)
            }
          }
        }
        if (i < n) i += 1 // ']'
      }
      UTF8String.fromString(JsonPathUtil.mapper.writeValueAsString(root))
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
