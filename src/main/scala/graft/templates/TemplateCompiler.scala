package graft.templates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler from rsyslog template strings to a single Spark `Column`
  * projection (reference: the property replacer pipeline in
  * runtime/msg.c:3696-4730 and template options in runtime/template.h).
  *
  * A template like
  *   "%timereported:::date-rfc3339% %hostname% %syslogtag%%msg:::drop-last-lf%\n"
  * becomes one `concat(...)` expression — the whole 10-stage per-property
  * pipeline (field select, regex, substring, case conversion, date
  * rendering, escaping) collapses into nested Column functions that
  * Catalyst fuses into one whole-stage-codegen'd projection. This is the
  * "strgen" compiled-template trick (tools/smfile.c) for free.
  *
  * Property text syntax: %name:fromChar:toChar:options% with
  *  - numeric from/to → substring [from..to] (1-based, inclusive)
  *  - from = "F,<ch>" → field extraction, to = field number (1-based),
  *    <ch> = decimal char code of the delimiter (template.h:125-140 style)
  *  - from = "R,<regex>,<submatch>" → regex extraction
  * Options (comma lists): lowercase uppercase date-rfc3339 date-rfc3164
  * date-unixtimestamp date-year date-month date-day date-hour date-minute
  * date-second csv json jsonf drop-last-lf compressed-sp sp-if-no-1st-sp
  */
object TemplateCompiler {

  sealed trait Part
  case class Constant(text: String) extends Part
  case class Property(name: String, from: String, to: String, options: Seq[String]) extends Part

  /** Parse the %...% / constant structure of a template string.
    * Escapes: \\% for literal percent, \\n \\t \\\\ in constants. */
  def parse(tpl: String): Seq[Part] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    val sb = new StringBuilder
    var i = 0
    val n = tpl.length
    def flush(): Unit = { if (sb.nonEmpty) { parts += Constant(sb.toString); sb.clear() } }
    while (i < n) {
      tpl(i) match {
        case '\\' if i + 1 < n =>
          tpl(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case '%' => sb.append('%'); case '\\' => sb.append('\\')
            case c => sb.append(c)
          }
          i += 2
        case '%' =>
          var end = tpl.indexOf('%', i + 1)
          require(end > i, s"unterminated property at offset $i in: $tpl")
          // official regex form `%prop:R…:regex--end%`: the regex runs
          // to the literal "--end" and may contain ':' or '%'
          // (template.c:1774-1826 scans for "--end" before the closing
          // '%'), so the property body extends to the '%' after it
          val c1 = tpl.indexOf(':', i + 1)
          if (c1 >= 0 && c1 < end && c1 + 1 < n && tpl(c1 + 1) == 'R' &&
              c1 + 2 < n && (tpl(c1 + 2) == ',' || tpl(c1 + 2) == ':')) {
            val eMark = tpl.indexOf("--end", c1)
            if (eMark > 0) {
              val realEnd = tpl.indexOf('%', eMark)
              require(realEnd > 0,
                s"unterminated regex property at offset $i in: $tpl")
              end = realEnd
            }
          }
          flush()
          val body = tpl.substring(i + 1, end)
          val eMark = body.indexOf("--end")
          val firstColon = body.indexOf(':')
          if (eMark > 0 && firstColon > 0 && firstColon + 1 < body.length &&
              body(firstColon + 1) == 'R') {
            // official regex form: name : R[,type][,submatch][,nomatch]
            // [,match] : regex--end — the R-spec holds no ':', the regex
            // may hold anything up to "--end"
            val specEnd = body.indexOf(':', firstColon + 1)
            require(specEnd > 0 && specEnd < eMark,
              s"malformed regex property: $body")
            parts += Property(body.substring(0, firstColon),
              body.substring(firstColon + 1, specEnd),
              body.substring(specEnd + 1, eMark), Seq.empty)
          } else {
            // split into name:from:to:options — but F,<ch> / R,<re>
            // segments may contain ':' only in regexes; common case
            val segs = body.split(":", 4)
            val name = segs(0)
            val from = if (segs.length > 1) segs(1) else ""
            val to = if (segs.length > 2) segs(2) else ""
            val opts = if (segs.length > 3 && segs(3).nonEmpty)
              segs(3).split(",").map(_.trim.toLowerCase).toSeq else Seq.empty
            parts += Property(name, from, to, opts)
          }
          i = end + 1
        case c => sb.append(c); i += 1
      }
    }
    flush()
    parts.toSeq
  }

  private val sevNames = Seq("emerg", "alert", "crit", "err", "warning",
    "notice", "info", "debug")
  // RFC5424 facility table (runtime/msg.c:212-218, non-AIX build);
  // out-of-range values render "invld" (getFacilityStr, msg.c:2033+)
  private val facNames = Seq("kern", "user", "mail", "daemon", "auth",
    "syslog", "lpr", "news", "uucp", "cron", "authpriv", "ftp", "ntp",
    "audit", "alert", "clock", "local0", "local1", "local2",
    "local3", "local4", "local5", "local6", "local7")

  /** Resolve a property name to its base Column. `props` maps schema
    * fields; derived text properties (severity/facility names, $!path)
    * are synthesized here (runtime/msg.c:3727-3990 property switch).
    * Names are case-insensitive like the reference's propNameToID
    * (%TIMESTAMP% ≡ %timestamp%); hyphenated wire names map onto the
    * frame's underscore columns. Unknown names fall through to `props`
    * verbatim — ad-hoc frame columns keep working. */
  def resolve(name: String, props: String => Column): Column = {
    def sevText = when(props("severity").cast("int").between(0, 7),
      element_at(array(sevNames.map(lit): _*),
        props("severity").cast("int") + 1)).otherwise(lit("invld"))
    def facText = when(props("facility").cast("int").between(0, 23),
      element_at(array(facNames.map(lit): _*),
        props("facility").cast("int") + 1)).otherwise(lit("invld"))
    // Tree renders go through the reference's jsonToString: objects and
    // arrays in json-c SPACED form, bare strings/scalars raw
    // (runtime/msg.c:3950-4010; JsonRenderExpr has the format cite).
    // $!all-json is SPACED with a "{}" fallback for a missing tree;
    // $!all-json-plain is JSON_C_TO_STRING_PLAIN = the stored compact
    // form (msg.c:3991-4010).
    def render(vc: String, path: String): Column =
      org.apache.spark.sql.GraftBridge.column(graft.functions.JsonRenderExpr(
        org.apache.spark.sql.GraftBridge.expression(props(vc)), path,
        graft.rainerscript.EnvSource.varsCaseInsensitive))
    // Bare tree roots: a never-written tree is a NULL root in the
    // reference and getJSONPropVal renders it EMPTY (runtime/msg.c:
    // 3155-3178 "*jroot == NULL → FINALIZE → ''"); our columns hold "{}"
    // for that state, so map it to "" here (tests/
    // rscript_bare_var_root-empty.sh pins "empty--"). $!all-json keeps
    // its explicit "{}" fallback — that property renders the missing
    // tree as "{}" by design (msg.c:3991-4010).
    def renderRoot(vc: String): Column =
      when(props(vc).isNull || props(vc) === "{}", lit(""))
        .otherwise(render(vc, ""))
    if (name == "$!") renderRoot("vars_msg")
    else if (name == "$.") renderRoot("vars_local")
    else if (name == "$/") renderRoot("vars_global")
    else if (name.equalsIgnoreCase("$!all-json"))
      coalesce(render("vars_msg", ""), lit("{}"))
    else if (name.equalsIgnoreCase("$!all-json-plain"))
      coalesce(props("vars_msg"), lit("{}"))
    else if (name.startsWith("$!")) render("vars_msg", name.drop(2))
    else if (name.startsWith("$.")) render("vars_local", name.drop(2))
    else if (name.startsWith("$/")) render("vars_global", name.drop(2))
    else if (isSystemProp(name)) systemProp(name.toLowerCase.stripPrefix("$"), props)
    else name.toLowerCase match {
      case "pri" => props("facility") * 8 + props("severity")
      // textpri "facility.severity" (msg.c:2889-2900)
      case "pri-text" => concat(facText, lit("."), sevText)
      // syslogpriority is the reference's historical alias for SEVERITY
      case "syslogseverity" | "syslogpriority" => props("severity")
      case "syslogseverity-text" | "syslogpriority-text" => sevText
      case "syslogfacility" => props("facility")
      case "syslogfacility-text" => facText
      case "timereported" | "timestamp" => props("ts")
      case "timegenerated" => props("ts")
      case "source" => props("hostname")
      case "app-name" => props("app_name")
      case "structured-data" => props("structured_data")
      case "protocol-version" => props("protocol_version")
      // no per-connection IP in a replayed frame — the recorded
      // fromhost provenance is the closest stable value
      case "fromhost-ip" => props("fromhost")
      // InfoUnitID: constant 1 for syslog messages (msg.c getInfoUnit)
      case "iut" => lit(1)
      case _ => props(name)
    }
  }

  private val sysTimeProps = Set("now", "year", "month", "day", "hour",
    "hhour", "qhour", "minute", "wday")

  /** `$NOW`-family / `$MYHOSTNAME` / `$BOM` system properties
    * (msg.c:473-533). Both spellings arrive here: templates keep the
    * `$` (`%$now%` → "$now"), script reads strip it ($$now →
    * resolveProp → "now"). */
  private[graft] def isSystemProp(name: String): Boolean = {
    val n = name.toLowerCase.stripPrefix("$")
    sysTimeProps.contains(n.stripSuffix("-utc")) ||
      n == "now-unixtimestamp" || n == "bom" || n == "myhostname"
  }

  /** Render one system property (getNOW, msg.c:2922-2977). The clock is
    * the message's reception time (`timegenerated` ≡ ts): that is the
    * daemon's render-time wall clock in replay semantics, and exactly
    * what the reference's own faketime tests pin (tests/now-utc.sh,
    * now_family_utc.sh, now-unixtimestamp.sh). Local variants render in
    * the session timezone; `-utc` converts explicitly (identical under
    * the default UTC session). Zero-padding per getNOW's two_digits
    * table; `$wday` is one digit, 0 = Sunday. `$uptime` (daemon uptime
    * seconds) stays unresolved — no replay analogue, no reference test.
    */
  private def systemProp(sys: String, props: String => Column): Column = {
    val local = props("ts")
    val c =
      if (sys.endsWith("-utc"))
        to_utc_timestamp(local, expr("current_timezone()"))
      else local
    sys.stripSuffix("-utc") match {
      case "now" => date_format(c, "yyyy-MM-dd")
      case "year" => date_format(c, "yyyy")
      case "month" => date_format(c, "MM")
      case "day" => date_format(c, "dd")
      case "hour" => date_format(c, "HH")
      case "hhour" => lpad((minute(c) / 30).cast("int").cast("string"), 2, "0")
      case "qhour" => lpad((minute(c) / 15).cast("int").cast("string"), 2, "0")
      case "minute" => date_format(c, "mm")
      case "wday" => (dayofweek(c) - 1).cast("string")
      case "now-unixtimestamp" => unix_timestamp(local)
      case "bom" => lit("\uFEFF")
      case "myhostname" => lit(graft.rainerscript.EnvSource.localHostname
        .getOrElse(java.net.InetAddress.getLocalHost.getHostName))
    }
  }

  /** Apply the property-replacer stages to a base column. */
  def compileProperty(p: Property, props: String => Column): Column = {
    var c = resolve(p.name, props)

    // stage: date formats (applied to timestamp-typed props)
    val dateOpt = p.options.find(_.startsWith("date-"))
    dateOpt match {
      case Some("date-rfc3339") =>
        c = concat(date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), lit("+00:00"))
      case Some("date-rfc3164") =>
        c = concat(date_format(c, "MMM "), lpad(date_format(c, "d"), 2, " "),
          date_format(c, " HH:mm:ss"))
      case Some("date-unixtimestamp") => c = unix_timestamp(c)
      case Some("date-year") => c = date_format(c, "yyyy")
      case Some("date-month") => c = date_format(c, "MM")
      case Some("date-day") => c = date_format(c, "dd")
      case Some("date-hour") => c = date_format(c, "HH")
      case Some("date-minute") => c = date_format(c, "mm")
      case Some("date-second") => c = date_format(c, "ss")
      case Some("date-wday") => c = dayofweek(c) - 1
      case Some("date-week") => c = weekofyear(c)
      // remaining tplFmt* variants (runtime/template.h:72-96,
      // runtime/datetime.c:769-835): mysql is the bare 14-digit form,
      // pgsql the spaced ISO form, subseconds the fractional-digits field;
      // rfc3164-buggyday zero-pads the day (the historical syslogd bug the
      // option name preserves); tz offsets render against the session TZ
      // (UTC here — parsed offsets normalize at decode, §1.1 tz_offset)
      case Some("date-mysql") => c = date_format(c, "yyyyMMddHHmmss")
      case Some("date-pgsql") => c = date_format(c, "yyyy-MM-dd HH:mm:ss")
      case Some("date-subseconds") => c = date_format(c, "SSSSSS")
      case Some("date-rfc3164-buggyday") =>
        c = date_format(c, "MMM dd HH:mm:ss")
      case Some("date-wdayname") => c = date_format(c, "EEE")
      case Some("date-ordinal") => c = date_format(c, "D")
      case Some("date-isoweek") => c = weekofyear(c)
      case Some("date-isoweekyear") =>
        // year of the ISO week = year of that week's Thursday (Spark 3+
        // rejects the week-based 'YYYY' pattern)
        c = year(date_add(c, lit(4) - (((dayofweek(c) + 5) % 7) + 1)))
      case Some("date-tzoffshour") => c = lit("00")
      case Some("date-tzoffsmin") => c = lit("00")
      case Some("date-tzoffsdirection") => c = lit("+")
      case _ =>
    }
    c = c.cast("string")

    // stage: field extraction (from = F,<charcode>, to = field index)
    if (p.from.startsWith("F")) {
      val delim = p.from.split(",").lift(1).map(_.trim.toInt).getOrElse(9)
      val fieldNo = if (p.to.nonEmpty) p.to.toInt else 1
      c = coalesce(
        try_element_at(split(c, java.util.regex.Pattern.quote(delim.toChar.toString)), lit(fieldNo)),
        // the TEMPLATE sentinel has two stars (msg.c:4153-4154);
        // script-level field() uses three (rainerscript.c:2655)
        lit("**FIELD NOT FOUND**"))
    } else if (p.from.startsWith("R") && p.to.nonEmpty) {
      // official regex form — from = R[,type][,submatch][,nomatch][,match],
      // to = the POSIX regex (template.c:1581-1680; evaluation
      // msg.c:4150-4240): take capture <submatch> of the <match>-th
      // successive occurrence; on no match DFLT → "**NO MATCH**",
      // BLANK → "", ZERO → "0", FIELD → the whole property value
      val spec = p.from.split(",").toSeq
      // an omitted type means BRE in the reference (template.c:1592-1604)
      val typ = spec.lift(1).filter(_.nonEmpty).getOrElse("BRE")
      val sub = spec.lift(2).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
      val nomatch = spec.lift(3).filter(_.nonEmpty).getOrElse("DFLT")
      val matchNo = spec.lift(4).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
      val re = typ match {
        case "ERE" => graft.functions.PosixRegex.translate(p.to)
        case "BRE" => graft.functions.PosixRegex.translateBre(p.to)
        case other => throw new IllegalArgumentException(
          s"regex type $other unsupported (BRE/ERE)")
      }
      val all = regexp_extract_all(c, lit(re), lit(sub))
      val hit = size(all) > matchNo
      val v = element_at(all, lit(matchNo + 1))
      c = nomatch match {
        case "FIELD" => when(hit, v).otherwise(c)
        case "BLANK" => when(hit, v).otherwise(lit(""))
        case "ZERO" => when(hit, v).otherwise(lit("0"))
        case _ => when(hit, v).otherwise(lit("**NO MATCH**"))
      }
    } else if (p.from.startsWith("R")) {
      // simplified legacy form — from = R,<regex>[,<submatch>]
      val bits = p.from.split(",", 3)
      val re = bits.lift(1).getOrElse("")
      val sub = bits.lift(2).map(_.toInt).getOrElse(0)
      c = when(c.rlike(re), regexp_extract(c, re, sub)).otherwise(lit(""))
    } else if (p.from.nonEmpty && p.from.forall(_.isDigit) && p.to.nonEmpty &&
               (p.to.forall(_.isDigit) ||
                (p.to.startsWith("-") && p.to.drop(1).forall(_.isDigit)))) {
      // substring, 1-based from..to inclusive (template.h:122-123);
      // reversed pairs swap at parse time (template.c:1879-1891): the
      // normal form swaps when to < from (%$!word:4:2% = chars 2..4),
      // the end-relative form swaps when to > from (from stays the one
      // farther from the end); negative to only arrives via the object
      // form, which has no swap
      var fromPos = p.from.toInt
      var toPos = p.to.toInt
      val relEnd = p.options.contains("relativetoend") ||
        p.options.contains("pos-end-relative")
      if (relEnd) {
        if (toPos > fromPos) { val t = fromPos; fromPos = toPos; toPos = t }
      } else if (toPos >= 0 && toPos < fromPos) {
        val t = fromPos; fromPos = toPos; toPos = t
      }
      if (relEnd) {
        // position.relativeToEnd: both positions measured from the END
        // (msg.c:4284-4289): 0-based iFrom = max(len-from, 0),
        // iTo = max(len-to, 0), copy [iFrom..iTo]
        val len = length(c)
        val iFrom = greatest(len - lit(fromPos), lit(0))
        val iTo = greatest(len - lit(toPos), lit(0))
        c = when(iFrom >= len, lit(""))
          .otherwise(substring(c, iFrom + 1, greatest(iTo - iFrom + 1, lit(0))))
      } else if (toPos >= 0) {
        val width = toPos - fromPos + 1
        c =
          if (p.options.contains("fixedwidth") || p.options.contains("fixed-width"))
            // fixedWidth pads the copy window with spaces when the value
            // is shorter (msg.c:4335-4341); a from past the value still
            // yields "" (the iFrom >= bufLen check runs first)
            when(lit(fromPos) > length(c), lit(""))
              .otherwise(rpad(substring(c, fromPos, width), width, " "))
          else substring(c, fromPos, width)
      } else {
        // negative to is end-relative with an underflow clamp to the
        // FIRST char: 0-based iTo = len - 1 + to, iTo < 0 → 0
        // (msg.c:4292-4297); a from beyond the value yields ""
        val endPos = greatest(length(c) + toPos, lit(1)) // 1-based end
        c = when(lit(fromPos) > length(c), lit(""))
          .otherwise(substring(c, lit(fromPos),
            greatest(endPos - lit(fromPos) + 1, lit(0))))
      }
    }

    // stage: case conversion
    if (p.options.contains("lowercase")) c = lower(c)
    if (p.options.contains("uppercase")) c = upper(c)

    // stage: control-char handling (msg.c:4420-4512)
    def cc(mode: Int): Column = org.apache.spark.sql.GraftBridge.column(
      graft.functions.ControlCharExpr(
        org.apache.spark.sql.GraftBridge.expression(c), mode))
    if (p.options.contains("drop-cc")) c = cc(0)
    if (p.options.contains("space-cc")) c = cc(1)
    if (p.options.contains("escape-cc")) c = cc(2)
    if (p.options.contains("escape-cc-octal")) c = cc(3)

    // stage: secpath — make the value safe as a path component
    // (msg.c bSecPathDrop/bSecPathReplace, used for dynafile names)
    if (p.options.contains("secpath-drop") ||
        p.options.contains("secpath-replace")) {
      c = if (p.options.contains("secpath-drop")) regexp_replace(c, "/", "")
          else regexp_replace(c, "/", "_")
      // post-checks (msg.c:4586-4601): empty → "_", "." → "_", ".." → "_."
      c = when(c === "", "_").when(c === ".", "_").when(c === "..", "_.")
        .otherwise(c)
    }

    // stage: misc text ops
    if (p.options.contains("drop-last-lf")) c = regexp_replace(c, "\n$", "")
    if (p.options.contains("compressed-sp")) c = regexp_replace(c, "\\s+", " ")
    if (p.options.contains("sp-if-no-1st-sp"))
      // emits ONLY the conditional separator, never the value: "" when
      // the value is empty or starts with a space, else one " "
      // (msg.c:4353-4360 — the idiom is the property PAIR
      // %msg:::sp-if-no-1st-sp%%msg%)
      c = when(length(c) === 0 || c.startsWith(" "), lit(""))
        .otherwise(lit(" "))

    // stage: sink-dialect escaping (template.h:50-55)
    if (p.options.contains("csv"))
      c = concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\""))
    def jsonEsc(x: Column, all: Boolean): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.JsonPropEscapeExpr(
          org.apache.spark.sql.GraftBridge.expression(x), all))
    if (p.options.contains("json")) c = jsonEsc(c, true)
    if (p.options.contains("jsonr")) c = jsonEsc(c, false)
    if (p.options.contains("jsonf") || p.options.contains("jsonfr")) {
      // jsonField (msg.c:3511-3596): the `"name":value` fragment with
      // the jsonf dataType/onEmpty/omitIfZero machinery; field name =
      // outname when the object form provided one (threaded as an
      // option token), else the property name
      val relaxed = p.options.contains("jsonfr")
      // default field name strips the "$!"/"$." namespace indicator
      // (template.c:1904-1910)
      val fname = p.options.collectFirst {
        case o if o.startsWith("outname=") => o.drop(8) }.getOrElse(
        if (p.name.startsWith("$!") || p.name.startsWith("$.")) p.name.drop(2)
        else p.name)
      val dt = p.options.collectFirst {
        case o if o.startsWith("datatype=") => o.drop(9) }.getOrElse("string")
      val onEmpty = p.options.collectFirst {
        case o if o.startsWith("onempty=") => o.drop(8) }.getOrElse("keep")
      val omitZero = p.options.contains("omitifzero")
      val base = coalesce(c.cast("string"), lit(""))
      val isEmpty = base === ""
      val numTrim = regexp_replace(base, "^\\s+|\\s+$", "")
      val quoted = concat(lit("\"" + fname + "\":\""),
        jsonEsc(base, !relaxed), lit("\""))
      val body: Column = dt match {
        case "number" =>
          when(isEmpty, lit("\"" + fname + "\":0"))
            .when(numTrim.rlike("^-?\\d+(\\.\\d+)?$"),
              concat(lit("\"" + fname + "\":"), numTrim))
            .otherwise(quoted)
        case "bool" =>
          when(base === "0", lit("\"" + fname + "\":false"))
            .otherwise(lit("\"" + fname + "\":true"))
        case "auto" =>
          when(base.rlike("^[0-9]+$"),
            concat(lit("\"" + fname + "\":"), base)).otherwise(quoted)
        case _ => quoted
      }
      val withEmpty = onEmpty match {
        case "skip" => when(isEmpty, lit("")).otherwise(body)
        case "null" => when(isEmpty, lit("\"" + fname + "\":null")).otherwise(body)
        case _ => body
      }
      c =
        if (omitZero && dt == "number")
          when(!isEmpty && numTrim === "0", lit("")).otherwise(withEmpty)
        else withEmpty
    }
    // sql = MySQL dialect (quote ' and \), stdsql = standard '' doubling
    if (p.options.contains("sql"))
      c = regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "'", "\\\\'")
    if (p.options.contains("stdsql"))
      c = regexp_replace(c, "'", "''")

    coalesce(c, lit(""))
  }

  /** Template-level escape option (template.c:946-951: applied to every
    * PROPERTY value after evaluation, never to constants): "sql" =
    * MySQL dialect (' → \' and \ → \\), "stdsql" = '' doubling, "json"
    * (doEscape SQL_ESCAPE/STDSQL_ESCAPE/JSON_ESCAPE, template.c:
    * 1140-1190). Set by the SQL/STDSQL/json suffix of legacy
    * $template lines, option.sql/stdsql/json on template() objects,
    * and the built-in DB templates. */
  def applyFormatEscape(c0: Column, mode: String): Column = {
    val c = c0.cast("string")
    mode match {
      case "sql" =>
        regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "'", "\\\\'")
      case "stdsql" => regexp_replace(c, "'", "''")
      case "json" =>
        regexp_replace(regexp_replace(regexp_replace(c,
          "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n")
      case other =>
        throw new IllegalArgumentException(s"template escape mode $other")
    }
  }

  /** Compile a full template string into one Column. */
  def compile(tpl: String, props: String => Column,
              formatEscape: Option[String] = None): Column = {
    val cols = parse(tpl).map {
      case Constant(t) => lit(t)
      case p: Property =>
        val v = compileProperty(p, props)
        formatEscape.map(applyFormatEscape(v, _)).getOrElse(v)
    }
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }

  /** jsonf list-template: render properties as a JSON object with
    * outname keys (template.h:170-178 dataType/onEmpty collapsed to
    * string/auto). */
  /** One jsonf field: outname key, source property, dataType
    * string|number|bool|auto, onEmpty keep|skip|null
    * (runtime/template.h:170-178, runtime/msg.c:3485-3540). */
  case class JsonfField(outname: String, prop: String,
                        dataType: String = "string", onEmpty: String = "keep",
                        omitIfZero: Boolean = false,
                        constValue: Option[String] = None)

  private def jsonQuote(c: Column): Column = concat(lit("\""),
    regexp_replace(regexp_replace(regexp_replace(c,
      "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), lit("\""))

  /** jsonf emission with dataType/onEmpty semantics, matching the
    * reference's jsonField exactly (runtime/msg.c:3521-3596): empty+skip
    * omits the field; empty+null emits a literal null; otherwise number
    * renders empty as 0 (and falls back to a quoted string for
    * non-numeric data — the reference emits it verbatim, which would be
    * invalid JSON); bool is false ONLY for "0", true for everything else
    * including empty; auto is numeric iff all-digits (no sign/decimal),
    * else a quoted string. Values whose rendering varies per row ride a
    * VARIANT — a variant null renders as `null` while a null struct field
    * is omitted, which is exactly the null/skip distinction. */
  def compileJsonf(fields: Seq[JsonfField], props: String => Column,
                   tree: Boolean = false): Column =
    if (tree) compileJsonfTree(fields, props)
    else to_json(struct(fields.map(f => fieldCol(f, props).as(f.outname)): _*))

  /** option.jsonftree (template.c:2106; tests/template-jsonf-nested.sh):
    * dot-segmented outnames build a nested object tree; an object whose
    * fields all omitted is itself omitted (tplJsonRenderObject "skips
    * empty objects"); conflicting keys ('a' and 'a.b') are a config
    * error like template.c:404. */
  private def compileJsonfTree(fields: Seq[JsonfField],
                               props: String => Column): Column = {
    // (value, present): present = the field/object would emit output
    def build(fs: Seq[(List[String], JsonfField)]): Seq[(String, Column, Column)] = {
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(List[String], JsonfField)]]
      fs.foreach { case (path, f) =>
        order.getOrElseUpdate(path.head,
          scala.collection.mutable.ArrayBuffer.empty) += ((path.tail, f))
      }
      order.toSeq.map { case (key, members) =>
        val (leaves, nested) = members.partition(_._1.isEmpty)
        require(leaves.isEmpty || nested.isEmpty,
          s"template with option jsonftree has conflicting keys at '$key'")
        if (nested.isEmpty) {
          require(leaves.size == 1,
            s"template with option jsonftree has duplicate key '$key'")
          val c = fieldCol(leaves.head._2, props)
          (key, c, c.isNotNull)
        } else {
          val children = build(nested.toSeq)
          val present = children.map(_._3).reduce(_ || _)
          val obj = when(present,
            struct(children.map { case (n, v, _) => v.as(n) }: _*))
          (key, obj, present)
        }
      }
    }
    val roots = build(fields.map(f => (f.outname.split('.').toList, f)))
    to_json(struct(roots.map { case (n, v, _) => v.as(n) }: _*))
  }

  /** One jsonf field's VARIANT/string value with the full
    * dataType/onEmpty/omitIfZero pipeline; SQL NULL = field omitted. */
  private def fieldCol(f: JsonfField, props: String => Column): Column = {
      // null property reads normalize to "" (the reference's property
      // fetch always yields a string), so keep/skip/null see one case;
      // constants (constant(outname= format="jsonf")) ride the same
      // pipeline with a literal base (template.c constant jsonf path)
      val base = f.constValue.map(lit).getOrElse(
        coalesce(resolve(f.prop, props).cast("string"), lit("")))
      val isEmpty = base === ""
      // number dataType trims surrounding whitespace for its numeric
      // checks and emits the trimmed digits (msg.c:3541-3546)
      val numTrim = regexp_replace(base, "^\\s+|\\s+$", "")
      val typed: Column = f.dataType match {
        case "number" =>
          coalesce(
            try_parse_json(when(isEmpty, "0")
              .when(numTrim.rlike("^-?\\d+(\\.\\d+)?$"), numTrim)),
            try_parse_json(jsonQuote(base)))
        case "bool" =>
          // msg.c:3589: only the single char '0' is false
          when(base === "0", lit(false)).otherwise(lit(true))
        case "auto" =>
          // msg.c:3565: numeric iff every char is a digit
          coalesce(try_parse_json(when(base.rlike("^[0-9]+$"), base)),
            try_parse_json(jsonQuote(base)))
        case _ => // string
          if (f.onEmpty == "null") try_parse_json(jsonQuote(base)) else base
      }
      val withEmpty = f.onEmpty match {
        case "skip" => when(isEmpty, lit(null)).otherwise(typed)
        case "null" =>
          when(isEmpty, parse_json(lit("null")))
            .otherwise(f.dataType match {
              case "bool" => try_parse_json(when(base === "0", "false")
                .otherwise("true"))
              case _ => typed
            })
        case _ => typed // keep
      }
      // omitIfZero: a NUMBER field whose (trimmed) value is exactly "0"
      // is dropped entirely (msg.c:3548-3551; checked only for non-empty
      // values — the empty case is onEmpty's business). A null struct
      // field is omitted by to_json, same mechanism as onEmpty=skip.
      if (f.omitIfZero && f.dataType == "number")
        when(!isEmpty && numTrim === "0", lit(null)).otherwise(withEmpty)
      else withEmpty
  }
}
