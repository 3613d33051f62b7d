package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass systemd-journal export-format entry decoder — the kernel
  * behind `Sources.imjournalDecode` (field mapping per
  * plugins/imjournal/imjournal.c readjournal: PRIORITY / SYSLOG_FACILITY
  * bounds-checked with defaults, identifier/pid tag assembly
  * imjournal.c:681-717, every data field into the $! tree with
  * duplicate-key last-wins, "__"-prefixed address fields excluded).
  *
  * One scan over the entry replaces the previous seven regexp passes
  * plus an interpreted higher-order-function dedup chain (the
  * TokensExpr/SyslogParseExpr kernel precedent) — that composition was
  * the slowest query of the sf1 rehearsal at ~86 s; field counts are
  * small, so the per-entry work is a handful of index scans.
  */
case class JournalEntryExpr(child: Expression, dfltTag: String = "journal",
                            dfltFacility: Int = 1, dfltSeverity: Int = 5)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = JournalEntryExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "journal_entry_decode"

  override protected def nullSafeEval(input: Any): Any =
    JournalEntryExpr.decode(input.toString, dfltTag, dfltFacility, dfltSeverity)

  // real codegen: the kernel is one static call, children stay inside
  // the WholeStageCodegen stage
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // dfltTag goes through a reference object — a quote/backslash in a
    // caller-supplied tag spliced verbatim would break the generated Java
    val tagRef = ctx.addReferenceObj("dfltTag", dfltTag, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.JournalEntryExpr$$.MODULE$$.decode($c.toString(), $tagRef, $dfltFacility, $dfltSeverity);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object JournalEntryExpr {
  val schema: StructType = StructType(Seq(
    StructField("facility", IntegerType),
    StructField("severity", IntegerType),
    StructField("ts", TimestampType),
    StructField("app_name", StringType),
    StructField("procid", StringType),
    StructField("syslogtag", StringType),
    StructField("msg", StringType),
    StructField("vars_msg", StringType)))

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** Jackson-compatible JSON string escaping (what to_json emitted for
    * the previous composition): short escapes for the common controls,
    * \u00XX uppercase hex for the rest below 0x20. */
  private def jsonEscape(sb: java.lang.StringBuilder, s: String): Unit = {
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
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04X")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  def decode(raw: String, dfltTag: String, dfltFac: Int, dfltSev: Int): InternalRow = {
    // specials: FIRST occurrence wins (the previous regexp_extract
    // semantics; an empty first value pins the special to null)
    var msg: String = null; var msgSeen = false
    var prio: String = null; var prioSeen = false
    var fac: String = null; var facSeen = false
    var iden: String = null; var idenSeen = false
    var comm: String = null; var commSeen = false
    var spid: String = null; var spidSeen = false
    var upid: String = null; var upidSeen = false
    var rts: String = null; var rtsSeen = false
    // $! tree: insertion order with duplicate-key last-wins — remove +
    // re-insert keeps the LAST occurrence's position, matching the
    // fjson object_add replace composition it replaces
    val tree = new java.util.LinkedHashMap[String, String]()

    var i = 0
    val n = raw.length
    while (i < n) {
      var eol = raw.indexOf('\n', i)
      if (eol < 0) eol = n
      val eq = raw.indexOf('=', i)
      if (eq >= i && eq < eol) {
        val k = raw.substring(i, eq)
        val v = raw.substring(eq + 1, eol)
        def first(seen: Boolean): Boolean = !seen
        k match {
          case "MESSAGE" if first(msgSeen) =>
            msgSeen = true; msg = if (v.isEmpty) null else v
          case "PRIORITY" if first(prioSeen) =>
            prioSeen = true; prio = if (v.isEmpty) null else v
          case "SYSLOG_FACILITY" if first(facSeen) =>
            facSeen = true; fac = if (v.isEmpty) null else v
          case "SYSLOG_IDENTIFIER" if first(idenSeen) =>
            idenSeen = true; iden = if (v.isEmpty) null else v
          case "_COMM" if first(commSeen) =>
            commSeen = true; comm = if (v.isEmpty) null else v
          case "SYSLOG_PID" if first(spidSeen) =>
            spidSeen = true; spid = if (v.isEmpty) null else v
          case "_PID" if first(upidSeen) =>
            upidSeen = true; upid = if (v.isEmpty) null else v
          case "__REALTIME_TIMESTAMP" if first(rtsSeen) =>
            rtsSeen = true; rts = if (v.isEmpty) null else v
          case _ => ()
        }
        if (!k.startsWith("__")) {
          tree.remove(k)
          tree.put(k, v)
        }
      }
      i = eol + 1
    }

    // PRIORITY: leading optional-sign digits, 0-7 accepted else default
    var severity = dfltSev
    if (prio != null) {
      var j = 0
      var neg = false
      if (j < prio.length && prio.charAt(j) == '-') { neg = true; j += 1 }
      var d = 0L
      var any = false
      while (j < prio.length && prio.charAt(j) >= '0' && prio.charAt(j) <= '9' && d < 1000) {
        d = d * 10 + (prio.charAt(j) - '0'); j += 1; any = true
      }
      if (any && !neg && d <= 7) severity = d.toInt
    }
    // SYSLOG_FACILITY: entirely 1-2 digits and <= 23, else default
    var facility = dfltFac
    if (fac != null && fac.length >= 1 && fac.length <= 2 &&
        fac.forall(c => c >= '0' && c <= '9')) {
      val f = Integer.parseInt(fac)
      if (f <= 23) facility = f
    }
    val iden2 = if (iden != null) iden else if (comm != null) comm else dfltTag
    val pid = if (spid != null) spid else upid
    val tag = iden2 + (if (pid != null) "[" + pid + "]" else "") + ":"
    val tsMicros: java.lang.Long =
      if (rts == null) null
      else try java.lang.Long.valueOf(rts.trim.toLong)
      catch { case _: NumberFormatException => null }

    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    val it = tree.entrySet().iterator()
    var firstEntry = true
    while (it.hasNext) {
      val e = it.next()
      if (!firstEntry) sb.append(',')
      firstEntry = false
      sb.append('"'); jsonEscape(sb, e.getKey); sb.append("\":\"")
      jsonEscape(sb, e.getValue); sb.append('"')
    }
    sb.append('}')

    InternalRow(facility, severity, tsMicros, utf8(iden2), utf8(pid),
      utf8(tag), utf8(if (msg == null) "" else msg), utf8(sb.toString))
  }
}
