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

  test("builtin TraditionalFileFormat renders") {
    val cfg = RsyslogConfig.parse("")
    val line = fixture.limit(1)
      .withColumn("l", cfg.renderTemplate("RSYSLOG_TraditionalFileFormat", col))
      .select("l").collect()(0).getString(0)
    assert(line == "Mar  1 01:02:03 host1 app: disk failing\n")
  }
}
