package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RsyslogConfig

class ConfigSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (3, 2, "host1", "app:", "disk failing", "2024-03-01T01:02:03Z"),
    (6, 16, "host2", "cron:", "job ok", "2024-03-01T02:00:00Z"),
    (2, 0, "host3", "kern:", "panic imminent", "2024-03-01T03:00:00Z")
  ).toDF("severity", "facility", "hostname", "syslogtag", "msg", "tss")
    .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("full config: objects + rulesets + call + templates") {
    val tblFile = java.io.File.createTempFile("lktable", ".json")
    java.nio.file.Files.writeString(tblFile.toPath,
      """{"version":1,"nomatch":"UNK","type":"string","table":[
        |{"index":"host1","value":"dc-east"},{"index":"host3","value":"dc-west"}]}""".stripMargin)

    val cfg = RsyslogConfig.parse(
      s"""# graft test config
         |template(name="shortmsg" type="string"
         |         string="%hostname% [%syslogseverity-text%] %msg:1:10%")
         |lookup_table(name="dc" file="${tblFile.getAbsolutePath}")
         |
         |ruleset(name="enrich") {
         |  set $$!dc = lookup("dc", $$hostname);
         |}
         |
         |set $$!sev = $$severity;
         |call enrich
         |if $$severity <= 3 then {
         |  action(type="omfile" name="critical")
         |} else {
         |  stop
         |}
         |action(type="omfile" name="all-crit")
         |""".stripMargin)

    assert(cfg.templates.contains("shortmsg"))
    assert(cfg.templates.contains("RSYSLOG_TraditionalFileFormat"))
    assert(cfg.rulesets.contains("enrich"))

    val res = cfg.run(fixture)
    val out = res.output
      .withColumn("dc", get_json_object(col("vars_msg"), "$.dc"))
      .select("hostname", "dc").collect()
    // severity 6 row stopped in else-branch
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("host1", "dc-east"), ("host3", "dc-west")))
    // both actions see the two surviving rows
    assert(res.actionFrame(0).count() == 2)
    assert(res.actionFrame(1).count() == 2)

    // named template rendering over the result
    val lines = res.output
      .withColumn("line", cfg.renderTemplate("shortmsg", col))
      .select("line").collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("host1 [err] disk faili", "host3 [crit] panic immi"))
    tblFile.delete()
  }

  test("call_indirect dispatches by computed ruleset name, unknown = NOP") {
    val cfg = RsyslogConfig.parse(
      """ruleset(name="by_app") { set $!route = "app-path"; }
        |ruleset(name="by_cron") { set $!route = "cron-path"; }
        |call_indirect "by_" & $syslogtag;
        |action(type="omfile" template="%hostname%")
        |""".stripMargin)
    // syslogtag values: "app:", "cron:", "kern:" → strip ':' to route
    val in = fixture.withColumn("syslogtag",
      regexp_replace(col("syslogtag"), ":", ""))
    val res = cfg.run(in)
    val out = res.frame
      .select(col("hostname"),
        get_json_object(col("vars_msg"), "$.route").as("route"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("host1") == "app-path")   // by_app
    assert(out("host2") == "cron-path")  // by_cron
    assert(out("host3") == null)         // by_kern unknown → NOP
  }

  test("list template compiles to concatenated string") {
    val cfg = RsyslogConfig.parse(
      """template(name="lst" type="list") {
        |  constant(value="H=")
        |  property(name="hostname")
        |  constant(value=" S=")
        |  property(name="syslogseverity")
        |}
        |""".stripMargin)
    val line = fixture.limit(1)
      .select(cfg.renderTemplate("lst", col).as("l")).collect()(0).getString(0)
    assert(line == "H=host1 S=3")
  }

  test("jsonf template: dataType and onEmpty semantics (msg.c:3521-3596)") {
    val cfg = RsyslogConfig.parse(
      """template(name="j" type="list" option.jsonf="on") {
        |  property(outname="host" name="hostname")
        |  property(outname="sev" name="severity" datatype="number")
        |  property(outname="maybe" name="msg" onEmpty="skip")
        |  property(outname="always" name="msg" onEmpty="null")
        |  property(outname="anum" name="msg" datatype="auto")
        |  property(outname="nempty" name="msg" datatype="number")
        |  property(outname="flag" name="msg" datatype="bool")
        |}""".stripMargin)
    val frame = Seq(
      ("h1", "3", "42"), // msg numeric → auto/number render numbers, bool→true
      ("h2", "5", ""),   // msg empty → skip omits, null→null, number→0, bool→true
      ("h3", "7", "0")   // bool: only the single char '0' is false
    ).toDF("hostname", "severity", "msg")
    val out = frame.select(cfg.renderTemplate("j", col).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == """{"host":"h1","sev":3,"maybe":"42","always":"42","anum":42,"nempty":42,"flag":true}""")
    assert(out(1) == """{"host":"h2","sev":5,"always":null,"anum":"","nempty":0,"flag":true}""")
    assert(out(2) == """{"host":"h3","sev":7,"maybe":"0","always":"0","anum":0,"nempty":0,"flag":false}""")
  }

  test("dyn_stats / perctile_stats / ratelimit / timezone objects parse into registries") {
    val cfg = RsyslogConfig.parse(
      """dyn_stats(name="msg_per_host" resettable="on" maxCardinality="3000")
        |percentile_stats(name="rt" percentiles="50,95,99" windowsize="1000")
        |ratelimit(name="per_peer" interval="60" burst="1000")
        |timezone(id="CET" offset="+01:00")
        |action(type="omfile")
        |""".stripMargin)
    assert(cfg.obj("dyn_stats", "msg_per_host")
      .exists(_("maxcardinality") == "3000"))
    assert(cfg.obj("perctile_stats", "rt").exists(_("windowsize") == "1000"))
    assert(cfg.obj("ratelimit", "per_peer").exists(p =>
      p("interval") == "60" && p("burst") == "1000"))
    // timezone objects are identified by id=, not name=
    assert(cfg.obj("timezone", "CET").exists(_("offset") == "+01:00"))
    assert(cfg.obj("ratelimit", "nope").isEmpty)
  }

  test("stock distro rsyslog.conf parses: modules, inputs, globals, legacy lines") {
    // a Debian/Ubuntu-style default config, unmodified shapes: module()/
    // input()/global()/main_queue() objects, $-directives, selector lines
    // with file/fwd/usrmsg targets, '&' continuation, $IncludeConfig glob
    val incDir = java.nio.file.Files.createTempDirectory("rsyslog.d").toFile
    java.nio.file.Files.writeString(
      new java.io.File(incDir, "20-extra.conf").toPath,
      """# dropped-in fragment
        |:programname, isequal, "cron-apt" /var/log/cron-apt.log
        |& stop
        |local7.*    -/var/log/boot.log
        |""".stripMargin)
    val cfg = RsyslogConfig.parse(
      s"""#  /etc/rsyslog.conf    Configuration file for rsyslog.
         |#
         |#################
         |#### MODULES ####
         |#################
         |module(load="imuxsock") # provides support for local system logging
         |module(load="imklog" permitnonkernelfacility="on")
         |#module(load="immark")  # provides --MARK-- message capability
         |$$ModLoad immark
         |
         |# provides UDP syslog reception
         |module(load="imudp")
         |input(type="imudp" port="514")
         |$$InputTCPServerRun 10514
         |
         |###########################
         |#### GLOBAL DIRECTIVES ####
         |###########################
         |global(workDirectory="/var/spool/rsyslog")
         |main_queue(queue.size="100000" queue.dequeuebatchsize="1000")
         |
         |$$ActionFileDefaultTemplate RSYSLOG_TraditionalFileFormat
         |$$RepeatedMsgReduction on
         |
         |$$FileOwner root
         |$$FileGroup adm
         |$$FileCreateMode 0640
         |$$DirCreateMode 0755
         |$$Umask 0022
         |$$PrivDropToUser syslog
         |$$PrivDropToGroup syslog
         |
         |$$template precise,"%syslogseverity% %hostname% %msg%\\n"
         |
         |$$IncludeConfig ${incDir.getAbsolutePath}/*.conf
         |$$IncludeConfig /etc/nonexistent.d/*.conf
         |
         |###############
         |#### RULES ####
         |###############
         |auth,authpriv.*\t\t\t/var/log/auth.log
         |*.*;auth,authpriv.none\t\t-/var/log/syslog
         |cron.*\t\t\t\t/var/log/cron.log
         |daemon.*\t\t\t-/var/log/daemon.log
         |kern.*\t\t\t\t-/var/log/kern.log
         |mail.*\t\t\t\t-/var/log/mail.log;precise
         |mail.err\t\t\t/var/log/mail.err
         |*.emerg\t\t\t\t:omusrmsg:*
         |news.crit\t\t\t@loghost.example.net
         |& ~
         |""".stripMargin)

    assert(cfg.hasModule("imuxsock") && cfg.hasModule("imklog") &&
      cfg.hasModule("immark") && cfg.hasModule("imudp"))
    assert(!cfg.hasModule("imrelp"))
    assert(cfg.inputs.exists(i =>
      i.get("type").contains("imudp") && i.get("port").contains("514")))
    assert(cfg.inputs.exists(i =>
      i.get("type").contains("imtcp") && i.get("port").contains("10514")))
    assert(cfg.globals("workdirectory") == "/var/spool/rsyslog")
    assert(cfg.globals("main_queue.queue.size") == "100000")
    assert(cfg.globals("repeatedmsgreduction") == "on") // warn-skip ledger
    assert(cfg.globals("fileowner") == "root")
    assert(cfg.templates("precise") == "%syslogseverity% %hostname% %msg%\\n")

    // $IncludeConfig spliced the fragment's rules in; missing glob skipped
    val filts = cfg.mainStmts.collect { case f: graft.rainerscript.RPriFilt => f }
    val props = cfg.mainStmts.collect { case f: graft.rainerscript.RPropFilt => f }
    assert(props.exists(p => p.prop == "programname" && p.value == "cron-apt" &&
      p.body.exists(_ == graft.rainerscript.RStop))) // '& stop' folded in
    assert(filts.exists(_.selector == "local7.*"))

    // selector targets → actions with the right params; default template
    // injected into file actions, explicit ;template respected
    val acts = cfg.mainStmts.collect {
      case graft.rainerscript.RPriFilt(_, b) => b
    }.flatten.collect { case a: graft.rainerscript.RAction => a.params }
    assert(acts.exists(p => p.get("file").contains("/var/log/auth.log") &&
      p.get("sync").contains("on") &&
      p.get("template").contains("RSYSLOG_TraditionalFileFormat")))
    assert(acts.exists(p => p.get("file").contains("/var/log/syslog") &&
      p.get("sync").contains("off")))
    assert(acts.exists(p => p.get("file").contains("/var/log/mail.log") &&
      p.get("template").contains("precise")))
    assert(acts.exists(p => p.get("type").contains("omusrmsg") &&
      p.get("target").contains("*")))
    assert(acts.exists(p => p.get("type").contains("omfwd") &&
      p.get("target").contains("loghost.example.net") &&
      p.get("protocol").contains("udp")))
    // '& ~' after the fwd line = discard continuation on the same filter
    assert(filts.exists(f => f.selector == "news.crit" &&
      f.body.exists(_ == graft.rainerscript.RStop)))

    // and the parsed config actually RUNS as a pipeline
    val res = cfg.run(fixture.withColumn("programname",
      regexp_replace(col("syslogtag"), ":$", "")))
    // fixture: (sev=3,fac=2 mail.err+mail.*), (6,16 local0), (2,0 kern)
    val mailErrIdx = cfg.mainStmts.indexWhere {
      case graft.rainerscript.RPriFilt(sel, _) => sel == "mail.err"
      case _ => false
    }
    assert(mailErrIdx >= 0)
    // +1: the included propfilt's cron-apt action (not an RPriFilt body)
    assert(res.actions.length == acts.length + 1)
    // action 0 = included cron-apt file (no matching programname rows),
    // action 1 = included local7 boot.log (no local7 rows in fixture)
    assert(res.actionFrame(0).count() == 0)
    assert(res.actionFrame(1).count() == 0)
    val authAct = res.actions.find(_.params.get("file").contains("/var/log/auth.log")).get
    val syslogAct = res.actions.find(_.params.get("file").contains("/var/log/syslog")).get
    // no auth-facility rows in the fixture; catch-all sees all 3
    assert(res.actionFrame(authAct.index).count() == 0)
    assert(res.actionFrame(syslogAct.index).count() == 3)
  }

  test("timezone() objects thread into parse_time_localtz") {
    val cfg = RsyslogConfig.parse(
      """timezone(id="MYZ" offset="+02:00")
        |set $.a = parse_time_localtz("2024-03-01T12:00:00", "MYZ");
        |set $.b = parse_time_localtz("2024-03-01T12:00:00", "UTC");
        |""".stripMargin)
    assert(cfg.timezones == Map("MYZ" -> "+02:00"))
    val r = cfg.run(fixture).output.limit(1).select(
      get_json_object(col("vars_local"), "$.a").cast("long"),
      get_json_object(col("vars_local"), "$.b").cast("long")).collect()(0)
    // the configured +02:00 offset shifts the parsed instant two hours
    // earlier than the UTC interpretation of the same wall-clock text
    assert(r.getLong(1) - r.getLong(0) == 7200L)
  }

  test("activate(): imfile input binds to real files with ruleset routing") {
    // write two real log files, bind them through input() objects with
    // DIFFERENT rulesets, and check routing + imfile message shaping
    // (msg = the file line, tag/PRI from params, hostname = receiver —
    // plugins/imfile defaults iSeverity=5 iFacility=128=local0<<3)
    val dirA = graft.Tmp.dir("graft_imfile_a_")
    val dirB = graft.Tmp.dir("graft_imfile_b_")
    java.nio.file.Files.writeString(dirA.resolve("app.log"),
      "line one\nline two\nERROR line three\n")
    java.nio.file.Files.writeString(dirB.resolve("other.log"),
      "<13>Mar  1 01:02:03 hostX su[7]: parsed body\n")
    val conf =
      s"""module(load="imfile")
        |input(type="imfile" file="${dirA.toString}/*.log" tag="appfile:"
        |      severity="err" facility="local3" ruleset="ra")
        |input(type="imfile" file="${dirB.toString}/*.log" tag="x:"
        |      needparse="on" ruleset="rb")
        |ruleset(name="ra") { if $$msg contains "ERROR" then { action(type="omfile" file="/err.log") } }
        |ruleset(name="rb") { action(type="omfile" file="/all.log") }
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    assert(res.keySet == Set("ra", "rb"))
    // ruleset ra: imfile default shaping — 3 lines, tag/PRI from params
    val ra = res("ra").frame.select("facility", "severity", "syslogtag",
      "msg", "inputname").collect()
    assert(ra.length == 3)
    assert(ra.forall(r => r.getInt(0) == 19 && r.getInt(1) == 3 &&
      r.getString(2) == "appfile:" && r.getString(4) == "imfile"))
    assert(res("ra").actionFrame(0).count() == 1) // only the ERROR line
    // ruleset rb: needparse="on" runs the parser chain on the line
    val rb = res("rb").frame
      .select("facility", "severity", "hostname", "syslogtag", "msg").collect()
    assert(rb.length == 1)
    assert(rb(0).getInt(0) == 1 && rb(0).getInt(1) == 5)
    assert(rb(0).getString(2) == "hostX")
    assert(rb(0).getString(3) == "su[7]:")
    assert(rb(0).getString(4) == " parsed body")
  }

  test("activate(): feed-bound network input ($UDPServerRun fold) decodes and routes") {
    // the legacy directive folds into inputs as type=imudp port=514; a
    // transport feed keyed "imudp:514" binds it; messages run the full
    // decode chain and the main ruleset
    val conf =
      """$ModLoad imudp
        |$UDPServerRun 514
        |mail.err    /var/log/mail.err
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val feed = Seq(
      "<19>Mar  1 01:02:03 h1 mailer: bounce",   // mail.err (fac 2 sev 3)
      "<22>Mar  1 01:02:04 h2 mailer: ok",       // mail.info — filtered
      "163 <19>Mar  1 01:02:05 h3 mailer: dead"  // octet-counted? (imudp: no deframe)
    ).toDF("value")
    val res = cfg.activate(spark, feeds = Map("imudp:514" -> feed),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    val main = res("")
    assert(main.frame.count() == 3)
    // the mail.err action matches only the severity<=3 mail row; the
    // "163 <19>..." line does NOT deframe on imudp (framing is imtcp's),
    // so its PRI never parses and it lands in the user.notice default
    assert(main.actionFrame(0).select("hostname").collect()
      .map(_.getString(0)).toSeq == Seq("h1"))
    // an input with no feed stays an idle listener (activate still runs)
    val cfg2 = RsyslogConfig.parse(
      "$ModLoad imudp\n$UDPServerRun 515\nmail.* /var/log/m\n")
    assert(cfg2.activate(spark).isEmpty)
  }

  test("bindStreamImfile threads multiline params through the state machine") {
    val dir = graft.Tmp.dir("graft_imfile_ml_")
    java.nio.file.Files.writeString(dir.resolve("t.log"),
      "START a\n cont 1\n cont 2\nSTART b\n tail\n")
    val out = graft.rainerscript.InputBinding.bindStreamImfile(spark,
      Map("file" -> s"${dir.toString}/*.log",
        "startmsg.regex" -> "^START"))
    val got = graft.streaming.StreamGate.run(out)
      .select("record").collect().map(_.getString(0)).toSet
    // the state machine assembles on startmsg.regex; the final pending
    // record drains via the shutdown flush (readtimeout=0 → watermark
    // timeout at end-of-available-data in the bounded gate)
    assert(got == Set("START a\\n cont 1\\n cont 2", "START b\\n tail"))
  }

  test("builtin TraditionalFileFormat renders") {
    val cfg = RsyslogConfig.parse("")
    val line = fixture.limit(1)
      .withColumn("l", cfg.renderTemplate("RSYSLOG_TraditionalFileFormat", col))
      .select("l").collect()(0).getString(0)
    assert(line == "Mar  1 01:02:03 host1 app: disk failing\n")
  }

  test("backtick params: echo env expansion, cat splice, invalid → empty") {
    // tests/rscript_backticks_braces_envvar.sh / _empty_envvar.sh /
    // _static_text.sh: `echo foo${MYVAR}bar` in an expression, missing
    // vars splice empty, `cat FILE` splices bytes, non-echo/cat → ""
    graft.rainerscript.EnvSource.overrides = Map("MYVAR" -> "42")
    try {
      val cfg = RsyslogConfig.parse(
        """if `echo foo${MYVAR}bar` == "foo42bar" and $msg contains "msgnum" then
          |    action(type="omfile" file=`echo /log/${MYVAR}/x` template="RSYSLOG_ForwardFormat")
          |""".stripMargin)
      // the action's file param expanded at parse time
      val act = cfg.mainStmts.collectFirst {
        case graft.rainerscript.RIf(_, Seq(graft.rainerscript.RAction(p)), _) => p }
      assert(act.get("file") == "/log/42/x")
      val df = Seq((" msgnum:00", 3, 2, "h", "t:", new java.sql.Timestamp(0)))
        .toDF("msg", "severity", "facility", "hostname", "syslogtag", "ts")
      assert(cfg.run(df).actionFrame(0).count() == 1)
      // missing var → empty; static text passes through
      assert(RsyslogConfig.parse(
        """set $.v = `echo a${NOPE_UNSET_VAR}b`;""").mainStmts.nonEmpty)
      val f = graft.Tmp.register(java.nio.file.Files.createTempFile("graft_bt", ".txt"))
      java.nio.file.Files.writeString(f, "from-file")
      val cfg2 = RsyslogConfig.parse(
        s"""if `cat ${f.toString}` == "from-file" then action(type="omfile" file=`pwd`)
           |""".stripMargin)
      val act2 = cfg2.mainStmts.collectFirst {
        case graft.rainerscript.RIf(_, Seq(graft.rainerscript.RAction(p)), _) => p }
      assert(act2.get("file") == "") // invalid backtick command → ""
      assert(cfg2.run(df).actionFrame(0).count() == 1)
      java.nio.file.Files.deleteIfExists(f)
    } finally graft.rainerscript.EnvSource.overrides = Map.empty
  }

  test("rscript-config_enable replay: include(text=\"stop\") gated by config.enabled") {
    // tests/rscript-config_enable-on.sh / -off-vg.sh: a statement-level
    // include splices `stop` into the inner if only when
    // config.enabled (backtick-expanded) is "on"
    val conf =
      """template(name="outfmt" type="string" string="%msg:F,58:2%\n")
        |if $msg contains "msgnum:" then {
        |  if $msg contains "msgnum:00000000" then {
        |    include(text="stop" config.enabled=`echo $DO_STOP`)
        |  }
        |  action(type="omfile" template="outfmt" file="/out.log")
        |}
        |""".stripMargin
    val msgs = (0 until 10).map(i => f" msgnum:$i%08d:").map(Tuple1(_)).toDF("msg")
    def run(doStop: String): Seq[String] = {
      graft.rainerscript.EnvSource.overrides = Map("DO_STOP" -> doStop)
      try RsyslogConfig.parse(conf).run(msgs).actionFrame(0)
        .select("__rendered").collect().map(_.getString(0)).toSeq.sorted
      finally graft.rainerscript.EnvSource.overrides = Map.empty
    }
    assert(run("on") == (1 until 10).map(i => f"$i%08d\n")) // seq_check 1 9
    assert(run("off") == (0 until 10).map(i => f"$i%08d\n"))
    // object-level: a disabled template never registers
    val cfg = RsyslogConfig.parse(
      """template(name="dead" type="string" string="x" config.enabled="off")""")
    intercept[IllegalArgumentException](cfg.renderTemplate("dead", col))
  }

  test("mmjsonparse-find-json-basic replay: cookie vs find-json action modes") {
    // tests/mmjsonparse-find-json-basic.sh: the default cookie mode must
    // NOT parse embedded JSON without the @cee: cookie (failure stores
    // {"msg": <stripped text>}), find-json mode must. %$!% renders in
    // the reference's fjson SPACED form — expectations below are the
    // EXPECTED lines of mmjsonparse-find-json-basic.sh verbatim.
    val conf =
      """template(name="outfmt" type="string" string="%msg% parsesuccess=%parsesuccess% json=%$!%\n")
        |if $msg contains "LEGACY" then {
        |  action(type="mmjsonparse")
        |  action(type="omfile" file="/o.log" template="outfmt")
        |  stop
        |}
        |if $msg contains "FINDJSON" then {
        |  action(type="mmjsonparse" mode="find-json")
        |  action(type="omfile" file="/o.log" template="outfmt")
        |  stop
        |}""".stripMargin
    val msgs = Seq(
      """ LEGACY prefix {"field":"value"}""",
      """ FINDJSON prefix {"field":"value"}""").map(Tuple1(_)).toDF("msg")
    val res = RsyslogConfig.parse(conf).run(msgs)
    val legacy = res.actionFrame(0).select("__rendered").collect()(0).getString(0)
    assert(legacy ==
      """ LEGACY prefix {"field":"value"} parsesuccess=FAIL json={ "msg": "LEGACY prefix {\"field\":\"value\"}" }""" + "\n")
    val fj = res.actionFrame(1).select("__rendered").collect()(0).getString(0)
    assert(fj ==
      """ FINDJSON prefix {"field":"value"} parsesuccess=OK json={ "field": "value" }""" + "\n")
  }

  test("mmjsonparse cookie success, trailing tolerance, and find-json decoys") {
    val msgs = Seq(
      """@cee: {"a":1} extra""",          // cookie + trailing → OK
      """   @cee:{"b":2}""",              // multi-space + no space after cookie
      """pfx {not json} {"id":7} tail""", // decoy brace → second object wins
      "no braces at all").map(Tuple1(_)).toDF("msg")
    val cfg = RsyslogConfig.parse(
      """action(type="mmjsonparse")
        |set $.cookie_ps = $parsesuccess;
        |set $.cookie_tree = $!;
        |action(type="mmjsonparse" mode="find-json")
        |set $.fj_ps = $parsesuccess;
        |set $.fj_tree = $!;
        |""".stripMargin)
    val out = cfg.run(msgs).output.select(
      get_json_object(col("vars_local"), "$.cookie_ps").as("cps"),
      get_json_object(col("vars_local"), "$.cookie_tree").as("ct"),
      get_json_object(col("vars_local"), "$.fj_ps").as("fps"),
      get_json_object(col("vars_local"), "$.fj_tree").as("ft")).collect()
    assert(out(0).getString(0) == "OK" && out(0).getString(1) == """{"a":1}""")
    assert(out(1).getString(0) == "OK" && out(1).getString(1) == """{"b":2}""")
    assert(out(2).getString(0) == "FAIL") // no cookie
    // bare-root container MERGES into the existing tree (msg.c:5078
    // jsonMerge): the cookie-mode failure's {"msg":...} survives the
    // second action, which adds the find-json fields beside it
    assert(out(2).getString(2) == "OK" &&
      out(2).getString(3) ==
        """{"msg":"pfx {not json} {\"id\":7} tail","id":7}""") // decoy skipped
    assert(out(3).getString(0) == "FAIL" && out(3).getString(2) == "FAIL")
  }

  test("inline mm* modifier actions: rm1stspace, utf8fix, mmfields, mmpstrucdata") {
    val cfg = RsyslogConfig.parse(
      """action(type="mmrm1stspace")
        |action(type="mmfields" separator="|")
        |action(type="mmpstrucdata")
        |set $.f2 = $!f_2;
        |set $.sd = $!rfc5424-sd!ex@1!k;
        |""".stripMargin)
    val df = Seq((" a|b|c", "[ex@1 k=\"v\"]"))
      .toDF("msg", "structured_data")
    val out = cfg.run(df).output.select(col("msg"),
      get_json_object(col("vars_local"), "$.f2"),
      get_json_object(col("vars_local"), "$.sd")).collect()(0)
    assert(out.getString(0) == "a|b|c") // exactly one leading blank dropped
    assert(out.getString(1) == "b")     // fields split AFTER the space drop
    assert(out.getString(2) == "v")
    // utf8fix action: valid text passes through unchanged (invalid-byte
    // repair itself is covered by the utf8fix oracle query -- a Scala
    // string cannot even carry invalid UTF-8 into encode())
    val fix = RsyslogConfig.parse("""action(type="mmutf8fix")""")
      .run(Seq(Tuple1("ok hello")).toDF("msg"))
      .output.select("msg").collect()(0).getString(0)
    assert(fix == "ok hello")
    // separator="" falls back to the ',' default instead of "".toInt
    val emptySep = RsyslogConfig.parse(
      """action(type="mmfields" separator="")
        |set $.f2 = $!f_2;
        |""".stripMargin)
      .run(Seq(Tuple1("x,y,z")).toDF("msg")).output
      .select(get_json_object(col("vars_local"), "$.f2"))
      .collect()(0).getString(0)
    assert(emptySep == "y")
  }

  test("mmjsonparse bare-root success merges, preserving earlier $! fields") {
    // msg.c:5078 jsonMerge: fields set before the action (mmfields,
    // imjournal decode, `set $!x=`) survive a bare-root mmjsonparse
    val out = RsyslogConfig.parse(
      """set $!early = "kept";
        |action(type="mmjsonparse")
        |""".stripMargin)
      .run(Seq(Tuple1("""@cee: {"late":1}""")).toDF("msg")).output
      .select(col("vars_msg")).collect()(0).getString(0)
    assert(out == """{"early":"kept","late":1}""")
  }

  test("mmanon action: zero-mode scan quirks (mmanon.c syntax_ipv4)") {
    val msgs = Seq(
      "from 10.1.12.13 ok",        // plain → 10.1.0.0
      "id 9123.4.5.6 x",           // 4-digit run: its 3-digit tail matches
      "bad 300.1.2.3 here",        // 300 rejected; its "00." tail matches
      "v 1.2.3.4.5 t",             // first 4 octets match, ".5" remains
      "port 123456 none").map(Tuple1(_)).toDF("msg")
    val out = RsyslogConfig.parse("""action(type="mmanon")""")
      .run(msgs).output.select("msg").collect().map(_.getString(0))
    assert(out(0) == "from 10.1.0.0 ok")
    assert(out(1) == "id 9123.4.0.0 x") // scan restarts mid-run like the reference
    // "300" fails (>255) but the scan restarts at the next char, where
    // "00.1.2.3" is a well-formed address (leading-zero octets pass
    // isPosByte) — canonical re-render collapses "00" to "0"
    assert(out(2) == "bad 30.1.0.0 here")
    assert(out(3) == "v 1.2.0.0.5 t")
    assert(out(4) == "port 123456 none")
    // bits=32 zeroes everything
    val all = RsyslogConfig.parse("""action(type="mmanon" ipv4.bits="32")""")
      .run(Seq(Tuple1("ip 255.255.255.255")).toDF("msg"))
      .output.select("msg").collect()(0).getString(0)
    assert(all == "ip 0.0.0.0")
  }

  test("mmnormalize + mmtaghostname inline actions") {
    val rb = graft.Tmp.register(java.nio.file.Files.createTempFile("graft_rb", ".rulebase"))
    java.nio.file.Files.writeString(rb,
      "version=2\n# comment\nrule=auth:login user %u:word% from %ip:ipv4%\n")
    val cfg = RsyslogConfig.parse(
      s"""action(type="mmtaghostname" tag="relay:" forcelocalhostname="on")
         |action(type="mmnormalize" rulebase="${rb.toString}")
         |""".stripMargin)
    val df = Seq(
      ("", "h1", "login user bob from 10.0.0.9"),
      ("app:", "h2", "something else entirely"))
      .toDF("syslogtag", "hostname", "msg")
    val out = cfg.run(df).output.select(col("syslogtag"), col("hostname"),
      get_json_object(col("vars_msg"), "$.u"),
      get_json_object(col("vars_msg"), "$.ip"),
      get_json_object(col("vars_msg"), "$['unparsed-data']")).collect()
    val local = java.net.InetAddress.getLocalHost.getHostName
    // empty tag → param tag; existing tag kept; hostname forced
    assert(out(0).getString(0) == "relay:" && out(0).getString(1) == local)
    assert(out(1).getString(0) == "app:" && out(1).getString(1) == local)
    // rulebase match extracts fields; no-match stores the liblognorm pair
    assert(out(0).getString(2) == "bob" && out(0).getString(3) == "10.0.0.9")
    assert(out(1).getString(4) == "something else entirely")
  }

  test("getenv() reads the config-time environment (rainerscript.c:2161)") {
    graft.rainerscript.EnvSource.overrides = Map("GRAFT_T" -> "hit")
    try {
      val out = RsyslogConfig.parse("""set $.e = getenv("GRAFT_T") & getenv("GRAFT_MISSING");""")
        .run(Seq(Tuple1("m")).toDF("msg")).output
        .select(get_json_object(col("vars_local"), "$.e")).collect()(0).getString(0)
      assert(out == "hit")
    } finally graft.rainerscript.EnvSource.overrides = Map.empty
  }

  test("rscript-object-string-escapes replay: \\xHH and \\OOO decode") {
    // tests/rscript-object-string-escapes.sh: hex/octal byte escapes in
    // expression strings and template constants reach the rendered
    // output as the intended bytes; an escaped backslash stays literal
    val conf =
      """set $.expr_hex_upper = "\x5A";
        |set $.expr_hex_upper_digits = "\x4A";
        |template(name="outfmt" type="list") {
        |  constant(value="hex_lower=\x41\n")
        |  constant(value="hex_upper=\x5a\n")
        |  constant(value="hex_upper_digits=\x5A\n")
        |  constant(value="expr_hex_upper=")
        |  property(name="$.expr_hex_upper")
        |  constant(value="\n")
        |  constant(value="expr_hex_upper_digits=")
        |  property(name="$.expr_hex_upper_digits")
        |  constant(value="\n")
        |  constant(value="octal=\101\n")
        |  constant(value="literal=\\\\x41\n")
        |}
        |:msg, contains, "msgnum:" action(type="omfile" template="outfmt" file="/out.log")
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.run(Seq(Tuple1(" msgnum:00000000:")).toDF("msg"))
    val out = res.actionFrame(0).select("__rendered").collect()(0).getString(0)
    assert(out == "hex_lower=A\nhex_upper=Z\nhex_upper_digits=Z\n" +
      "expr_hex_upper=Z\nexpr_hex_upper_digits=J\noctal=A\nliteral=\\x41\n")
  }

  test("proprepltest-rfctag/-nolimittag replay: tag substring cap vs full tag") {
    // tests/proprepltest-rfctag.sh + -nolimittag.sh end to end: imtcp
    // input → ":pri, contains, 167" legacy filter → outfmt template →
    // action render. Same four tcpflood messages, the rfctag variant
    // caps the tag via the :1:32 substring, nolimittag renders it whole.
    val msgs = Seq(
      "<167>Mar  6 16:57:54 172.20.245.8 TAG: Rest of message...",
      "<167>Mar  6 16:57:54 172.20.245.8 0 Rest of message...",
      "<167>Mar  6 16:57:54 172.20.245.8 01234567890123456789012345678901 Rest of message...",
      "<167>Mar  6 16:57:54 172.20.245.8 01234567890123456789012345678901-toolong Rest of message...")
    def replay(outfmt: String): Seq[String] = {
      val conf =
        s"""module(load="imtcp")
          |input(type="imtcp" address="127.0.0.1" port="514")
          |template(name="outfmt" type="string" string="$outfmt")
          |:pri, contains, "167" action(type="omfile" file="/out.log" template="outfmt")
          |""".stripMargin
      val cfg = RsyslogConfig.parse(conf)
      val res = cfg.activate(spark, feeds = Map("imtcp:514" -> msgs.toDF("value")),
        now = to_timestamp(lit("2024-06-01 12:00:00")))
      res("").actionFrame(0).select("__rendered")
        .collect().map(_.getString(0)).toSeq
    }
    assert(replay("+%syslogtag:1:32%+\\n") == Seq(
      "+TAG:+\n", "+0+\n",
      "+01234567890123456789012345678901+\n",
      "+01234567890123456789012345678901+\n"))
    assert(replay("+%syslogtag%+\\n") == Seq(
      "+TAG:+\n", "+0+\n",
      "+01234567890123456789012345678901+\n",
      "+01234567890123456789012345678901-toolong+\n"))
  }

  test("global(parser.parseHostnameAndTag=off) keeps hostname/tag text in MSG") {
    // tests/rscript_parsehostnameandtag_off.sh: tag empty, the would-be
    // hostname+tag text stays in %msg% (pmrfc3164.c:383 skip branch)
    val raw = Seq("<167>Mar 27 19:06:53 source_server sshd[123]: payload")
    def replay(globalLine: String): String = {
      val conf =
        s"""$globalLine
          |module(load="imtcp")
          |input(type="imtcp" address="127.0.0.1" port="514")
          |template(name="outfmt" type="string" string="tag=[%syslogtag%] msg=[%msg%]")
          |action(type="omfile" file="/out.log" template="outfmt")
          |""".stripMargin
      val cfg = RsyslogConfig.parse(conf)
      val res = cfg.activate(spark, feeds = Map("imtcp:514" -> raw.toDF("value")),
        now = to_timestamp(lit("2024-06-01 12:00:00")))
      res("").actionFrame(0).select("__rendered")
        .collect().map(_.getString(0)).head
    }
    assert(replay("""global(parser.parseHostnameAndTag="off")""") ==
      "tag=[] msg=[source_server sshd[123]: payload]")
    assert(replay("") ==
      "tag=[sshd[123]:] msg=[ payload]")
  }

  test("jsonf omitIfZero + onEmpty through the config template path") {
    // tests/json-omitifzero.sh, exact expected line: zero number omitted,
    // nonzero kept, zero STRING kept as "0", empty+skip omitted
    val cfg = RsyslogConfig.parse(
      """template(name="outfmt" type="list" option.jsonf="on") {
        |    property(name="$!zero" outname="zero_default" format="jsonf" dataType="number")
        |    property(name="$!zero" outname="zero_omit" format="jsonf" dataType="number" omitIfZero="on")
        |    property(name="$!nonzero" outname="nonzero_omit" format="jsonf" dataType="number" omitIfZero="on")
        |    property(name="$!zero" outname="zero_string_omit" format="jsonf" dataType="string" omitIfZero="on")
        |    property(name="$!empty" outname="empty_omit" format="jsonf" dataType="number" omitIfZero="on" onEmpty="skip")
        |}
        |set $!zero = 0;
        |set $!nonzero = 42;
        |set $!empty = "";
        |action(type="omfile" template="outfmt")
        |""".stripMargin)
    val out = cfg.run(Seq(("m")).toDF("msg")).actionFrame(0)
      .select("__rendered").collect()(0).getString(0)
    assert(out == """{"zero_default":0,"nonzero_omit":42,"zero_string_omit":"0"}""")
  }

  test("option.jsonftree nests dot outnames; const jsonf fields render") {
    // tests/template-jsonf-nested.sh: dot-segmented outnames become a
    // nested object tree; constants with outname are fixed-value fields
    val cfg = RsyslogConfig.parse(
      """template(name="nested" type="list" option.jsonftree="on") {
        |         constant(outname="host.hostname" value="testhost" format="jsonf")
        |         constant(outname="host.ip" value="127.0.0.1" format="jsonf")
        |         constant(outname="event.dataset.name" value="syslog" format="jsonf")
        |         property(outname="event.original" name="msg" format="jsonf")
        |}
        |action(type="omfile" template="nested")
        |""".stripMargin)
    val out = cfg.run(Seq((" msgnum:00000000:")).toDF("msg")).actionFrame(0)
      .select("__rendered").collect()(0).getString(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(out) == mapper.readTree(
      """{"host": {"hostname": "testhost", "ip": "127.0.0.1"},
        | "event": {"dataset": {"name": "syslog"}, "original":" msgnum:00000000:"}}""".stripMargin))
    // tests/template-const-jsonf.sh: const jsonf fragment in a STRING
    // list template renders the exact `"@version": "1"` bytes
    val cfg2 = RsyslogConfig.parse(
      """template(name="outfmt" type="list") {
        |	 constant(outname="@version" value="1" format="jsonf")
        |}
        |action(type="omfile" template="outfmt")
        |""".stripMargin)
    assert(cfg2.run(Seq(("m")).toDF("msg")).actionFrame(0)
      .select("__rendered").collect()(0).getString(0) == "\"@version\": \"1\"")
  }

  test("object-form property params: position.from/to incl. negative to") {
    // tests/template-topos-neg.sh: STRUCTURED-DATA with position.from=2
    // position.to=-1 strips the [ ] wrapper
    val cfg = RsyslogConfig.parse(
      """template(name="out" type="list") {
        |	property(name="structured_data" position.from="2" position.to="-1")
        |}
        |action(type="omfile" template="out")
        |""".stripMargin)
    val in = Seq(("""[tcpflood@32473 MSGNUM="0"]""")).toDF("structured_data")
    assert(cfg.run(in).actionFrame(0).select("__rendered")
      .collect()(0).getString(0) == """tcpflood@32473 MSGNUM="0"""")
    // field extraction via the object form (field.delimiter/field.number)
    val cfg2 = RsyslogConfig.parse(
      """template(name="f2" type="list") {
        |	property(name="msg" field.delimiter="58" field.number="2")
        |}
        |action(type="omfile" template="f2")
        |""".stripMargin)
    assert(cfg2.run(Seq(("msgnum:00000007:x")).toDF("msg")).actionFrame(0)
      .select("__rendered").collect()(0).getString(0) == "00000007")
  }

  test("global parser.* sanitize family: spaceLF, 8-bit, C-style, prefix") {
    // tests/yaml-imtcp-spacelf-escape.sh option set + the cstyle and
    // prefix variants (SanitizeMsg, runtime/parser.c:330-510)
    def replay(globalLine: String, raw: String): String =
      RsyslogConfig.parse(
        s"""$globalLine
           |module(load="imtcp")
           |input(type="imtcp" port="514")
           |template(name="outfmt" type="string" string="%rawmsg%")
           |action(type="omfile" template="outfmt")
           |""".stripMargin)
        .activate(spark, feeds = Map("imtcp:514" -> Seq(raw).toDF("value")),
          now = to_timestamp(lit("2024-06-01 12:00:00")))("")
        .actionFrame(0).select("__rendered").collect()(0).getString(0)
    // stock defaults: control chars → #octal, tab included
    assert(replay("", "a\tb\u0001c") == "a#011b#001c")
    // spaceLFonReceive has no LF to act on post-line-split, but the
    // combined yaml-test option set must keep the rest working: 8-bit
    // bytes escape per UTF-8 byte
    assert(replay(
      """global(parser.spaceLFOnReceive="on" parser.escapeControlCharactersOnReceive="on" parser.escapeControlCharacterTab="on" parser.escape8BitCharactersOnReceive="on" parser.escapeControlCharactersCStyle="off")""",
      "a\tb\u00e9") == "a#011b#303#251") // é = C3 A9
    // C-style escapes
    assert(replay(
      """global(parser.escapeControlCharactersCStyle="on")""",
      "a\tb\u0001c\u000bd") == "a\\tb\\x01c\\vd")
    // tab excluded
    assert(replay(
      """global(parser.escapeControlCharacterTab="off")""",
      "a\tb\u0001c") == "a\tb#001c")
    // custom escape prefix
    assert(replay(
      """global(parser.controlCharacterEscapePrefix="%" parser.spaceLFOnReceive="on")""",
      "a\u0001b") == "a%001b")
  }

  test("allowedSender ACL drops out-of-list senders at reception") {
    // tests/yaml-allowed-sender-modern.sh shape: input-level list beats
    // the module default; CIDR and plain-IP entries
    def replay(conf: String): Seq[String] = {
      val feed = Seq(
        ("128.66.1.1", "<13>Oct 1 h t: from-range"),
        ("127.0.0.1", "<13>Oct 1 h t: from-local"),
        ("10.9.9.9", "<13>Oct 1 h t: from-elsewhere"))
        .toDF("fromhost", "value")
      RsyslogConfig.parse(conf)
        .activate(spark, feeds = Map("imtcp:514" -> feed),
          now = to_timestamp(lit("2024-06-01 12:00:00")))("")
        .actionFrame(0).select("__rendered").collect().map(_.getString(0)).toSeq.sorted
    }
    val tpl =
      """template(name="outfmt" type="string" string="%msg%")
        |action(type="omfile" template="outfmt")
        |""".stripMargin
    // input-level: CIDR + exact IP
    assert(replay(
      """module(load="imtcp")
        |input(type="imtcp" port="514" allowedSender=["128.66.0.0/16", "127.0.0.1"])
        |""".stripMargin + tpl) == Seq(" h t: from-local", " h t: from-range"))
    // module-level default applies when the input has none
    assert(replay(
      """module(load="imtcp" allowedSender=["128.66.0.0/16"])
        |input(type="imtcp" port="514")
        |""".stripMargin + tpl) == Seq(" h t: from-range"))
    // no list → everything passes
    assert(replay(
      """module(load="imtcp")
        |input(type="imtcp" port="514")
        |""".stripMargin + tpl).size == 3)
  }

  test("imtcp framing toggles: supportOctetCountedFraming=off, maxFrameSize") {
    def replay(conf: String, msgs: Seq[String]): Seq[String] =
      RsyslogConfig.parse(conf)
        .activate(spark, feeds = Map("imtcp:514" -> msgs.toDF("value")),
          now = to_timestamp(lit("2024-06-01 12:00:00")))("")
        .actionFrame(0).select("__rendered").collect().map(_.getString(0)).toSeq
    val base =
      """module(load="imtcp"%MOD%)
        |input(type="imtcp" address="127.0.0.1" port="514"%INP%)
        |template(name="outfmt" type="string" string="%rawmsg%")
        |action(type="omfile" template="outfmt")
        |""".stripMargin
    val framed = Seq("21 <13>Oct 1 host t: m")
    // default: octet-counted frame strips its length prefix
    assert(replay(base.replace("%MOD%", "").replace("%INP%", ""), framed)
      == Seq("<13>Oct 1 host t: m"))
    // tests/imtcp_no_octet_counted.sh: framing disabled → literal line
    assert(replay(base.replace("%MOD%", "")
        .replace("%INP%", " supportOctetCountedFraming=\"off\""), framed)
      == framed)
    // tests/imtcp-maxFrameSize.sh: a frame length above the module cap
    // falls back to octet stuffing (the line stays literal)
    assert(replay(base.replace("%MOD%", " maxFrameSize=\"10\"")
        .replace("%INP%", ""), framed)
      == framed)
  }

  test("global(maxMessageSize) reception gate: truncate, split, report") {
    // tests/glbl-oversizeMsg-truncate.sh / -split.sh shapes: a 250-char
    // raw message against maxMessageSize=230
    val long = "<167>Mar  1 01:00:00 172.20.245.8 tag msgnum:00000000:240:" +
      "X" * 192 // total 250 chars
    assert(long.length == 250)
    def replay(globalLine: String): Seq[String] = {
      val conf =
        s"""$globalLine
          |module(load="imtcp")
          |input(type="imtcp" address="127.0.0.1" port="514")
          |template(name="outfmt" type="string" string="%rawmsg%")
          |action(type="omfile" template="outfmt")
          |""".stripMargin
      RsyslogConfig.parse(conf)
        .activate(spark, feeds = Map("imtcp:514" -> Seq(long).toDF("value")),
          now = to_timestamp(lit("2024-06-01 12:00:00")))("")
        .actionFrame(0).select("__rendered")
        .collect().map(_.getString(0)).toSeq.sorted
    }
    val trunc = replay("""global(maxMessageSize="230")""")
    assert(trunc.exists(_ == long.take(230)))                 // hard cut
    assert(trunc.exists(l => l.contains("message too long (250) with configured size 230") &&
      l.contains("begin of message is: " + long.take(21)))) // report msg
    val split = replay(
      """global(maxMessageSize="230" oversizemsg.input.mode="split")""")
    assert(split.exists(_ == long.take(230)))                 // first part
    assert(split.exists(_.endsWith("X" * 20)) &&
      split.exists(_ == long.drop(230)))                      // remainder
    val accept = replay(
      """global(maxMessageSize="230" oversizemsg.input.mode="accept" oversizemsg.report="off")""")
    assert(accept == Seq(long))                               // untouched
  }

  test("invld facility: bad PRI maps to slot 24 and is selectable") {
    // tests/fac_invld1.sh: PRI 1011 (>191) → LOG_PRI_INVLD = facility
    // invld(24) severity debug, PRI text NOT consumed; `invld.=debug`
    // selects it
    val msgs = Seq(
      "<1011>Mar  1 01:00:00 h tag msgnum:00000000:",  // >191 → invld
      "<13>Mar  1 01:00:00 h tag msgnum:00000001:",    // valid → user.notice
      "<1x>broken pri",                                // malformed → invld
      "no pri at all")                                 // → user.notice, not selected
    val conf =
      """module(load="imtcp")
        |input(type="imtcp" address="127.0.0.1" port="514")
        |template(name="outfmt" type="string" string="%syslogfacility%|%syslogseverity%|%rawmsg%")
        |invld.=debug action(type="omfile" template="outfmt")
        |""".stripMargin
    val out = RsyslogConfig.parse(conf)
      .activate(spark, feeds = Map("imtcp:514" -> msgs.toDF("value")),
        now = to_timestamp(lit("2024-06-01 12:00:00")))("")
      .actionFrame(0).select("__rendered").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq(
      "24|7|<1011>Mar  1 01:00:00 h tag msgnum:00000000:",
      "24|7|<1x>broken pri"))
  }

  test("global(environment=) wires getenv()") {
    // tests/glbl_setenv.sh / _2_vars.sh
    try {
      val cfg = RsyslogConfig.parse(
        """global(environment=["http_proxy=http://127.0.0.1", "second=two"])
          |set $!prx = getenv("http_proxy") & "-" & getenv("second");
          |action(type="omfile" template="%$!prx%")
          |""".stripMargin)
      assert(cfg.run(Seq(("m")).toDF("msg")).actionFrame(0)
        .select("__rendered").collect()(0).getString(0) == "http://127.0.0.1-two")
    } finally graft.rainerscript.EnvSource.overrides = Map.empty
  }

  test("bad lookup-table files stub instead of crashing; sparseArray+ipv42num") {
    // tests/lookup_table_bad_configs.sh: empty / invalid-JSON / wrong
    // version / missing table → the table stubs (all lookups nomatch)
    // and the engine keeps running
    def runWith(tbl: String): String = {
      val f = java.io.File.createTempFile("lk_bad", ".lkp_tbl")
      java.nio.file.Files.writeString(f.toPath, tbl)
      try {
        val cfg = RsyslogConfig.parse(
          s"""lookup_table(name="xlate" file="${f.getAbsolutePath}")
             |set $$.lkp = lookup("xlate", $$msg);
             |action(type="omfile" template="got[%$$.lkp%]")
             |""".stripMargin)
        cfg.run(Seq(("foo")).toDF("msg")).actionFrame(0)
          .select("__rendered").collect()(0).getString(0)
      } finally f.delete()
    }
    assert(runWith("") == "got[]")                                   // empty file
    assert(runWith("{ version\": oops") == "got[]")                  // invalid JSON
    assert(runWith("""{"version":2,"type":"string","table":[]}""") == "got[]")
    assert(runWith("""{"type":"string"}""") == "got[]")              // no table
    assert(runWith( // rows missing value are skipped, valid rows stay
      """{"version":1,"type":"string","table":[
        |{"index":"foo","value":"F"},{"index":"baz"}]}""".stripMargin) == "got[F]")
    // tests/lookup_sparse_array_ipv4.sh: floor-match over ipv42num keys
    val f2 = java.io.File.createTempFile("lk_ip", ".lkp_tbl")
    java.nio.file.Files.writeString(f2.toPath,
      """{"type":"sparseArray","table":[
        |{"index": 167772160, "value":"NetA"},
        |{"index": 167772416, "value":"Gap"},
        |{"index": 167772672, "value":"NetB"}]}""".stripMargin)
    try {
      val cfg = RsyslogConfig.parse(
        s"""lookup_table(name="ip_lookup" file="${f2.getAbsolutePath}")
           |set $$.ip_num = ipv42num($$msg);
           |set $$.lkp = lookup("ip_lookup", $$.ip_num);
           |action(type="omfile" template="%msg%: %$$.lkp%")
           |""".stripMargin)
      val ips = Seq("10.0.0.0", "10.0.0.5", "10.0.0.255", "10.0.1.0",
        "10.0.1.5", "10.0.2.0", "10.0.2.100", "9.0.0.0")
      val out = cfg.run(ips.toDF("msg")).actionFrame(0)
        .select("__rendered").collect().map(_.getString(0)).toSeq
      assert(out == Seq("10.0.0.0: NetA", "10.0.0.5: NetA", "10.0.0.255: NetA",
        "10.0.1.0: Gap", "10.0.1.5: Gap", "10.0.2.0: NetB",
        "10.0.2.100: NetB", "9.0.0.0: "))
    } finally f2.delete()
  }

  test("mmnormalize tokenized fields and variable= source") {
    // tests/mmnormalize_tokenized.sh over its exact rulebase + inputs:
    // tokenized fields render as (nested) string arrays in json-c SPACED
    // form with '/' escaped like the reference's jsonToString
    val rb = graft.Tmp.file("graft_tok", ".rulebase")
    java.nio.file.Files.writeString(rb.toPath,
      """rule=only_ips:%only_ips:tokenized:, :ipv4%
        |rule=local_ips:local ips are %local_ips:tokenized:, :ipv4%
        |rule=external_ips:%external_ips:tokenized:, :ipv4% are external ips
        |rule=paths:for %user:char-to:@%@localhost path was %fragments:tokenized:\x3a:char-sep:\x3a%
        |rule=recur_comma_colon_nos:comma separated list of colon separated numbers: %some_nos:tokenized:, :tokenized: \x3a :tokenized:#:number%
        |""".stripMargin)
    try {
      val cfg = RsyslogConfig.parse(
        s"""module(load="mmnormalize")
           |action(type="mmnormalize" rulebase="${rb.getAbsolutePath}")
           |""".stripMargin)
      val msgs = Seq(
        "10.20.30.40, 50.60.70.80, 90.100.110.120, 130.140.150.160",
        "local ips are 192.168.1.2, 192.168.1.3, 192.168.1.4",
        "for foo@localhost path was /bin:/usr/local/bin:/usr/bin",
        "comma separated list of colon separated numbers: 10, 20 : 30#40#50 : 60#70#80, 90 : 100")
      val out = cfg.run(msgs.toDF("msg")).output
        .select(col("msg"), col("vars_msg")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      def render(m: String, path: String): String =
        spark.range(1).select(graft.functions.rainer.json_render(
          lit(out(m)), path)).collect()(0).getString(0)
      assert(render(msgs(0), "only_ips") ==
        """[ "10.20.30.40", "50.60.70.80", "90.100.110.120", "130.140.150.160" ]""")
      assert(render(msgs(1), "local_ips") ==
        """[ "192.168.1.2", "192.168.1.3", "192.168.1.4" ]""")
      assert(render(msgs(2), "fragments") ==
        """[ "\/bin", "\/usr\/local\/bin", "\/usr\/bin" ]""")
      assert(render(msgs(2), "user") == "foo")
      assert(render(msgs(3), "some_nos") ==
        """[ [ [ "10" ] ], [ [ "20" ], [ "30", "40", "50" ], [ "60", "70", "80" ] ], [ [ "90" ], [ "100" ] ] ]""")
      // tests/mmnormalize_parsesuccess.sh + date-rfc3164 field type
      val cfg4 = RsyslogConfig.parse(
        """module(load="mmnormalize")
          |action(type="mmnormalize" rule=["rule=:%date:date-rfc3164% %host:word% up %days:number% days"])
          |if $parsesuccess == "OK" then
          |	action(type="omfile" template="%$!host% up %$!days% (%$!date%)")
          |""".stripMargin)
      val r4 = cfg4.run(Seq(
        ("Mar  6 16:57:54 web1 up 12 days"),
        ("no timestamp here")).toDF("msg"))
      assert(r4.actionFrame(0).select("__rendered")
        .collect().map(_.getString(0)).toSeq ==
        Seq("web1 up 12 (Mar  6 16:57:54)"))
      // tests/mmnormalize_regex.sh: %f:regex:<ere>% = whole-match value,
      // user capture groups must not shift later fields
      val cfg3 = RsyslogConfig.parse(
        """module(load="mmnormalize" allowRegex="on")
          |action(type="mmnormalize" rule=["rule=:http host ports are %hps:regex:([0-9.\x3a]+(, )?)+% etc"])
          |action(type="omfile" template="host and port list: %$!hps%")
          |""".stripMargin)
      assert(cfg3.run(Seq(
        ("http host ports are 192.168.1.2:80, 192.168.1.3, 192.168.1.4:443, 192.168.1.5 etc"))
        .toDF("msg")).actionFrame(0).select("__rendered").collect()(0).getString(0)
        == "host and port list: 192.168.1.2:80, 192.168.1.3, 192.168.1.4:443, 192.168.1.5")
      // tests/mmnormalize_variable.sh: normalize a VARIABLE instead of msg
      val cfg2 = RsyslogConfig.parse(
        """module(load="mmnormalize")
          |set $.frag = "13:20:18 GMT";
          |action(type="mmnormalize" rule=["rule=hms:%hr:number%:%min:number%:%sec:number% %zone:word%"] variable="$.frag")
          |action(type="omfile" template="h:%$!hr% m:%$!min% s:%$!sec%")
          |""".stripMargin)
      assert(cfg2.run(Seq(("date is 2016-01-01 13:20:18 GMT")).toDF("msg"))
        .actionFrame(0).select("__rendered").collect()(0).getString(0)
        == "h:13 m:20 s:18")
    } finally rb.delete()
  }

  test("per-module default templates inject like each module's cfline path") {
    val conf =
      """$ActionForwardDefaultTemplate RSYSLOG_ForwardFormat
        |*.* @@central.example.net
        |*.emerg :omusrmsg:*
        |mail.* action(type="ommysql" server="db1")
        |cron.* action(type="omelasticsearch" server="es1")
        |news.* action(type="omfwd" target="x" template="outfmt")
        |template(name="outfmt" type="string" string="x")
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    def tpl(i: Int): String = {
      val acts = cfg.mainStmts.collect { case graft.rainerscript.RPriFilt(_, b) =>
        b.collect { case graft.rainerscript.RAction(p) => p } }.flatten
      acts(i).getOrElse("template", "")
    }
    assert(tpl(0) == "RSYSLOG_ForwardFormat")   // $-directive override
    assert(tpl(1) == " WallFmt")                // omusrmsg wall
    assert(tpl(2) == " StdDBFmt")               // ommysql
    assert(tpl(3) == " StdJSONFmt")             // omelasticsearch
    assert(tpl(4) == "outfmt")                  // explicit wins
  }

  test("main_queue discard policy wires to the shed operator") {
    import org.apache.spark.sql.functions._
    val cfg = RsyslogConfig.parse(
      """main_queue(queue.size="100" queue.discardmark="3"
        |           queue.discardseverity="warning")
        |""".stripMargin)
    // 5 messages in one window, severities 0..4: mark 3 reached, so
    // severity >= 4 (warning) sheds; criticals pass
    val df = (0 until 5).map(i => (i, "2024-03-01 10:00:0" + i))
      .toDF("severity", "t")
      .withColumn("ts", to_timestamp(col("t")))
    val out = cfg.mainQueueShed(df, col("ts"), col("severity"))
      .orderBy("severity").select("shed").collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(false, false, false, false, true))

    // defaults: severity 8 = off, nothing sheds even above the mark
    val off = RsyslogConfig.parse("main_queue(queue.size=\"1\")")
    val out2 = off.mainQueueShed(df, col("ts"), col("severity"))
      .select("shed").collect().map(_.getBoolean(0))
    assert(out2.forall(_ == false))

    // legacy directives fold in
    val legacy = RsyslogConfig.parse(
      "$MainMsgQueueDiscardMark 3\n$MainMsgQueueDiscardSeverity 2\n")
    val out3 = legacy.mainQueueShed(df, col("ts"), col("severity"))
      .orderBy("severity").select("shed").collect().map(_.getBoolean(0))
    assert(out3.toSeq == Seq(false, false, true, true, true))
  }

  test("bounded ruleset recursion: guarded self-call exact, runaway truncates") {
    // rscript_ruleset_call-recursion-limit.sh: the reference recurses a
    // self-calling ruleset to its 1024 nesting guard at runtime. The
    // static plan inlines to callNestingLimit levels; a guarded
    // recursion whose data-dependent depth stays under the limit is
    // EXACT (each level carries its own frozen condition).
    val guarded = RsyslogConfig.parse(
      """ruleset(name="bump") {
        |  set $.c = $.c + 1;
        |  if $.c < $.target then call bump
        |}
        |set $.c = 0;
        |set $.target = $t;
        |call bump
        |""".stripMargin)
    val df = Seq(0L, 1L, 3L, 7L).toDF("t")
    val got = guarded.run(df).output
      .select(col("t"), get_json_object(col("vars_local"), "$.c").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c walks to the target (min 1: the first bump runs unconditionally)
    assert(got == Map(0L -> 1L, 1L -> 1L, 3L -> 3L, 7L -> 7L))

    // unconditional self-recursion: one +1 per inlined level, then the
    // loud truncation — final c = the nesting limit
    val runaway = RsyslogConfig.parse(
      """ruleset(name="recurse") { set $.c = $.c + 1; call recurse }
        |set $.c = 0;
        |call recurse
        |""".stripMargin)
    val c = runaway.run(Seq("m").toDF("msg"), callNestingLimit = 8).output
      .select(get_json_object(col("vars_local"), "$.c").cast("long"))
      .collect()(0).getLong(0)
    assert(c == 8L)

    // mutual recursion shares the same budget (a->b->a-> ... bounded)
    val mutual = RsyslogConfig.parse(
      """ruleset(name="a") { set $.c = $.c + 1; call b }
        |ruleset(name="b") { set $.c = $.c + 10; call a }
        |set $.c = 0;
        |call a
        |""".stripMargin)
    val cm = mutual.run(Seq("m").toDF("msg"), callNestingLimit = 4).output
      .select(get_json_object(col("vars_local"), "$.c").cast("long"))
      .collect()(0).getLong(0)
    assert(cm == 22L) // a,b,a,b = 1+10+1+10
  }

  test("cfgtest golden configs parse gracefully (cfg1-4, DevNull shapes)") {
    // tests/cfg*.cfgtest: config VALIDATION must survive hostile input —
    // unknown legacy directives, missing $IncludeConfig globs, inactive
    // module loads — without throwing; the reference emits diagnostics
    // and continues (or activates the emergency config).
    // cfg1.testin: selector line + invalid directive
    val c1 = RsyslogConfig.parse("*.* *\n$invaliddirective test\n")
    assert(c1.mainStmts.nonEmpty) // the *.* wall selector compiled
    // cfg2/cfg3.testin: include of a bad path warns and skips
    val c3 = RsyslogConfig.parse("$IncludeConfig /nonexistent/file-does-not-exist\n")
    assert(c3.mainStmts.isEmpty)
    // cfg4.testin active lines: modloads, UDP listener, missing globs
    val c4 = RsyslogConfig.parse(
      """$ModLoad imudp.so
        |$ModLoad omoracle.so
        |$UDPServerRun 514
        |$IncludeConfig /nonexistent/logging/rsyslog/20*conf
        |$IncludeConfig /nonexistent/logging/rsyslog/30*conf
        |""".stripMargin)
    assert(c4.hasModule("imudp.so") || c4.hasModule("imudp"))
    assert(c4.inputs.exists(i => i.get("port").contains("514") ||
      i.get("type").exists(_.contains("imudp"))))
    // DevNull shape: config with inputs but no actions is valid (the
    // reference warns "no active actions" and still runs)
    val dn = RsyslogConfig.parse("$ModLoad imudp.so\n$UDPServerRun 514\n")
    assert(dn.mainStmts.forall(!_.isInstanceOf[graft.rainerscript.RAction]))
  }
}
