package graft

import org.apache.spark.sql.functions._
import graft.templates.TemplateCompiler

class TemplateSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (3, 2, "host1", "app[7]:", " body msg\n", "2024-03-01T01:02:03Z")
  ).toDF("severity", "facility", "hostname", "syslogtag", "msg", "tss")
    .withColumn("ts", to_timestamp(col("tss")))

  private def render(tpl: String): String =
    fixture.select(TemplateCompiler.compile(tpl, col).as("r"))
      .collect()(0).getString(0)

  test("RSYSLOG_TraditionalFileFormat shape") {
    val tpl = "%timereported:::date-rfc3164% %hostname% %syslogtag%%msg:::sp-if-no-1st-sp%%msg:::drop-last-lf%\n"
    assert(render(tpl) == "Mar  1 01:02:03 host1 app[7]: body msg\n")
  }

  test("rfc3339 + severity/facility text") {
    val tpl = "%timereported:::date-rfc3339% [%syslogseverity-text%/%syslogfacility-text%]"
    assert(render(tpl) == "2024-03-01T01:02:03+00:00 [err/mail]")
  }

  test("substring and case options") {
    assert(render("%hostname:1:4:uppercase%") == "HOST")
    assert(render("%msg:2:5%") == "body")
  }

  test("from:to past the value renders empty (template-pos-from-to-oversize.sh)") {
    assert(render("-%msg:109:116:%-") == "--")
    assert(render("-%msg:109:116:lowercase%-") == "--")
  }

  test("field extraction with char-code delimiter") {
    // delimiter 32 = space; field 3 of " body msg\n" is "msg\n"
    assert(render("%msg:F,32:3:drop-last-lf%") == "msg")
  }

  test("regex extraction") {
    assert(render("%msg:R,b(o)dy,1:%") == "o")
  }

  test("csv and json escaping") {
    val df = Seq(Tuple1("say \"hi\"\nx")).toDF("msg")
    val csv = df.select(TemplateCompiler.compile("%msg:::csv%", col).as("r"))
      .collect()(0).getString(0)
    assert(csv == "\"say \"\"hi\"\"\nx\"")
    val json = df.select(TemplateCompiler.compile("%msg:::json%", col).as("r"))
      .collect()(0).getString(0)
    assert(json == "say \\\"hi\\\"\\nx")
  }

  test("date part options and unixtimestamp") {
    assert(render("%timereported:::date-year%-%timereported:::date-month%-%timereported:::date-day%")
      == "2024-03-01")
    assert(render("%timereported:::date-unixtimestamp%") == "1709254923")
  }

  test("full date-format table (mysql/pgsql/subseconds/wday/ordinal/tz)") {
    assert(render("%timereported:::date-mysql%") == "20240301010203")
    assert(render("%timereported:::date-pgsql%") == "2024-03-01 01:02:03")
    assert(render("%timereported:::date-subseconds%") == "000000")
    assert(render("%timereported:::date-rfc3164-buggyday%") == "Mar 01 01:02:03")
    assert(render("%timereported:::date-wdayname%") == "Fri")
    assert(render("%timereported:::date-wday%") == "5") // 0=Sunday
    assert(render("%timereported:::date-ordinal%") == "61") // Mar 1 in a leap year
    assert(render("%timereported:::date-isoweek%") == "9")
    assert(render("%timereported:::date-isoweekyear%") == "2024")
    assert(render("%timereported:::date-tzoffshour%:%timereported:::date-tzoffsmin%" +
      " %timereported:::date-tzoffsdirection%") == "00:00 +")
  }

  test("control-char, secpath, and SQL escaping options") {
    val dirty = Seq(("a\tb\u0001c/d'e\\f", 0)).toDF("msg", "x")
    def r(tpl: String): String =
      dirty.select(TemplateCompiler.compile(tpl, col).as("r")).collect()(0).getString(0)
    assert(r("%msg:::drop-cc%") == "abc/d'e\\f")
    assert(r("%msg:::space-cc%") == "a b c/d'e\\f")
    assert(r("%msg:::escape-cc%") == "a#009b#001c/d'e\\f")
    assert(r("%msg:::escape-cc-octal%") == "a#011b#001c/d'e\\f")
    assert(r("%msg:::drop-cc,secpath-drop%") == "abcd'e\\f")
    assert(r("%msg:::drop-cc,secpath-replace%") == "abc_d'e\\f")
    assert(r("%msg:::drop-cc,sql%") == "abc/d\\'e\\\\f")
    assert(r("%msg:::drop-cc,stdsql%") == "abc/d''e\\f")
  }

  test("parse_time_localtz honors the zone only for offset-less input") {
    import graft.functions.rainer
    val r = fixture.select(
      rainer.parse_time_localtz(lit("2024-03-01T01:02:03"), "America/New_York").as("bare"),
      rainer.parse_time_localtz(lit("2024-03-01T01:02:03+00:00"), "America/New_York").as("offs"),
      rainer.parse_time(lit("2024-03-01T01:02:03")).as("utc")).collect()(0)
    assert(r.getAs[Long]("bare") - r.getAs[Long]("utc") == 5 * 3600) // EST = UTC-5
    assert(r.getAs[Long]("offs") == r.getAs[Long]("utc"))
  }

  test("escapes in constants") {
    assert(render("""a\%b\nc""") == "a%b\nc")
  }

  test("jsonf template") {
    val j = fixture.select(
      TemplateCompiler.compileJsonf(
        Seq(TemplateCompiler.JsonfField("host", "hostname"),
          TemplateCompiler.JsonfField("sev", "syslogseverity", "number")),
        col).as("r"))
      .collect()(0).getString(0)
    assert(j == """{"host":"host1","sev":3}""")
  }

  test("official regex property form: R,ERE,sub,nomatch,match:re--end") {
    // msg " body msg\n": capture 1 of the 0th match; nomatch modes;
    // match-number selects the Nth successive occurrence; regex may
    // contain ':' and '%'
    assert(render("%msg:R,ERE,1,DFLT,0:b(o)dy--end%") == "o")
    assert(render("%msg:R,ERE,0,DFLT,0:nope--end%") == "**NO MATCH**")
    assert(render("%msg:R,ERE,0,BLANK,0:nope--end%") == "")
    assert(render("%msg:R,ERE,0,ZERO,0:nope--end%") == "0")
    assert(render("%msg:R,ERE,0,FIELD,0:nope--end%") == " body msg\n")
    val multi = Seq(Tuple1("a=1 b=2 c=3")).toDF("msg")
    def r(t: String): String =
      multi.select(TemplateCompiler.compile(t, col).as("r"))
        .collect()(0).getString(0)
    assert(r("%msg:R,ERE,1,DFLT,1:([a-z])=--end%") == "b")
    assert(r("%msg:R,ERE,1,DFLT,2:([a-z])=--end%") == "c")
    assert(r("%msg:R,ERE,1,DFLT,0:(\\w+):?--end%") == "a") // ':' in regex
  }

  test("BRE regex form: the reference's default dialect translates") {
    // an omitted type segment means BRE (template.c:1592-1604): groups
    // are \(..\), intervals \{m,n\}, bare ( ) { } + ? | are literals
    assert(render("%msg:R,BRE,1,DFLT,0:b\\(o\\)dy--end%") == "o")
    // omitted type = BRE; no submatch segment = whole match (sub 0)
    assert(render("%msg:R:b\\(o\\)dy--end%") == "body")
    assert(render("%msg:R,,1,DFLT,0:b\\(o\\)dy--end%") == "o")
    val lit = Seq(Tuple1("f(x)=a+b? c|d {2}")).toDF("msg")
    def r(t: String): String =
      lit.select(TemplateCompiler.compile(t, col).as("r"))
        .collect()(0).getString(0)
    // bare metas match literally in BRE
    assert(r("%msg:R,BRE,0,DFLT,0:f(x)--end%") == "f(x)")
    assert(r("%msg:R,BRE,0,DFLT,0:a+b?--end%") == "a+b?")
    assert(r("%msg:R,BRE,0,DFLT,0:c|d--end%") == "c|d")
    assert(r("%msg:R,BRE,0,DFLT,0:{2}--end%") == "{2}")
    // \{m,n\} interval + GNU \+ operator + bracket class
    val num = Seq(Tuple1("id=40049 rest")).toDF("msg")
    def rn(t: String): String =
      num.select(TemplateCompiler.compile(t, col).as("r"))
        .collect()(0).getString(0)
    assert(rn("%msg:R,BRE,0,DFLT,0:[0-9]\\{5\\}--end%") == "40049")
    assert(rn("%msg:R,BRE,1,DFLT,0:id=\\([[:digit:]]\\+\\)--end%") == "40049")
    // back-reference \1 carries over (BRE supports backrefs)
    val dup = Seq(Tuple1("go abab end")).toDF("msg")
    assert(dup.select(TemplateCompiler.compile(
      "%msg:R,BRE,1,DFLT,0:\\(ab\\)\\1--end%", col).as("r"))
      .collect()(0).getString(0) == "ab")
    // a leading * is a literal in BRE; mid-pattern ^ and $ are literal
    val star = Seq(Tuple1("*note a^b x$y")).toDF("msg")
    def rs(t: String): String =
      star.select(TemplateCompiler.compile(t, col).as("r"))
        .collect()(0).getString(0)
    assert(rs("%msg:R,BRE,0,DFLT,0:*note--end%") == "*note")
    assert(rs("%msg:R,BRE,0,DFLT,0:a^b--end%") == "a^b")
    assert(rs("%msg:R,BRE,0,DFLT,0:x$y--end%") == "x$y")
    // unknown dialect token still rejected
    intercept[IllegalArgumentException](
      render("%msg:R,PCRE,1,DFLT,0:b(o)dy--end%"))
  }

  test("template-level SQL/STDSQL escape hits properties, not constants") {
    // template.c:946-951: optFormatEscape applies to every evaluated
    // property; constants (including the surrounding quotes) pass as-is
    val df = Seq(Tuple1("it's a b\\s")).toDF("msg")
    def esc(mode: String): String =
      df.select(TemplateCompiler.compile("v='%msg%'", col,
        Some(mode)).as("r")).collect()(0).getString(0)
    assert(esc("sql") == "v='it\\'s a b\\\\s'")
    assert(esc("stdsql") == "v='it''s a b\\s'")
    assert(esc("json") == "v='it's a b\\\\s'")
  }

  test("case-insensitive + aliased property names (propNameToID)") {
    assert(render("%HOSTNAME% %PRI% %TIMESTAMP:::date-mysql%")
      == "host1 19 20240301010203")
    assert(render("%syslogpriority%/%syslogpriority-text%") == "3/err")
    assert(render("%pri-text%") == "mail.err")
    assert(render("%iut%") == "1")
  }

  test("reference facility table: audit/alert/clock at 13-15 (msg.c:212)") {
    val r = Seq((13, 0), (15, 7), (24, 0)).toDF("facility", "severity")
      .select(TemplateCompiler.compile(
        "%syslogfacility-text%.%syslogseverity-text%", col).as("r"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("audit.emerg", "clock.debug", "invld.emerg"))
  }

  test("builtin StdDBFmt renders a valid escaped MySQL INSERT") {
    val cfg = graft.rainerscript.RsyslogConfig.parse("")
    val row = fixture.withColumn("msg", lit("it's fine"))
      .select(cfg.renderTemplate(" StdDBFmt", col).as("r"))
      .collect()(0).getString(0)
    assert(row == "insert into SystemEvents (Message, Facility, FromHost, " +
      "Priority, DeviceReportedTime, ReceivedAt, InfoUnitID, SysLogTag) " +
      "values ('it\\'s fine', 2, 'host1', 3, '20240301010203', " +
      "'20240301010203', 1, 'app[7]:')")
  }

  test("legacy $template SQL suffix sets the template escape") {
    val cfg = graft.rainerscript.RsyslogConfig.parse(
      "$template dbq,\"ins '%msg%'\",SQL\n" +
      "$template plain,\"p %msg%\"\n")
    assert(cfg.templateEscapes.get("dbq").contains("sql"))
    assert(!cfg.templateEscapes.contains("plain"))
    val df = Seq(Tuple1("o'clock")).toDF("msg")
    assert(df.select(cfg.renderTemplate("dbq", col).as("r"))
      .collect()(0).getString(0) == "ins 'o\\'clock'")
  }

  test("template() object option.stdsql escapes exec_template output") {
    val cfg = graft.rainerscript.RsyslogConfig.parse(
      """template(name="t" type="string" string="q='%msg%'" option.stdsql="on")
        |set $.out = exec_template("t");
        |""".stripMargin)
    val out = cfg.run(Seq(Tuple1("don't")).toDF("msg")).output
      .select(get_json_object(col("vars_local"), "$.out")).collect()(0).getString(0)
    assert(out == "q='don''t'")
  }

  test("$NOW-family system properties render from reception time (getNOW, msg.c:2922)") {
    // fixture ts = 2024-03-01T01:02:03Z; UTC session → local ≡ utc
    assert(render("%$now%") == "2024-03-01")
    assert(render("%$YEAR%-%$MONTH%-%$DAY%") == "2024-03-01")
    assert(render("%$hour%:%$minute%") == "01:02")
    assert(render("%$hhour%/%$qhour%") == "00/00")
    assert(render("%$wday%") == "5") // 2024-03-01 is a Friday; 0=Sunday
    assert(render("%$now-utc%") == "2024-03-01")
    assert(render("%$now-unixtimestamp%") == "1709254923")
    assert(render("%$bom%") == "﻿")
  }

  test("$hhour/$qhour bucket the minute (two_digits table)") {
    val df = Seq(Tuple1("2024-03-01T13:47:03Z")).toDF("tss")
      .withColumn("ts", to_timestamp(col("tss")))
    def r(tpl: String) =
      df.select(TemplateCompiler.compile(tpl, col).as("r")).collect()(0).getString(0)
    assert(r("%$hhour%") == "01")    // 47/30
    assert(r("%$qhour%") == "03")    // 47/15
    assert(r("%$hour-utc%") == "13")
  }

  test("$myhostname honors global(localHostname=) override") {
    graft.rainerscript.EnvSource.localHostname = Some("graft-host")
    try assert(render("%$myhostname%") == "graft-host")
    finally graft.rainerscript.EnvSource.localHostname = None
  }
}
