package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RsyslogConfig

/** Config-level parser chains: parser(name= type=) objects bound via
  * ruleset(parser=[...]) — replay of the reference's own test corpus
  * (tests/pmnull-basic.sh, pmnull-withparams.sh, pmnormalize-basic.sh,
  * pmnormalize-rule_invld-data.sh; chain dispatch
  * runtime/parser.c:613-686). */
class ParserChainSpec extends SparkSpec {
  import spark.implicits._

  private val ciscoMsg =
    "<189>16261: May 28 16:09:56.185: %SYS-5-CONFIG_I: " +
    "Configured from console by adminsepp on vty0 (10.23.214.226)"

  private def render(conf: String, msgs: Seq[String]): Seq[String] = {
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      feeds = Map("imtcp:514" -> msgs.toDF("value")),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    res("ruleset").actionFrame(0).select("__rendered")
      .collect().map(_.getString(0)).toSeq
  }

  test("pmnull default instance: msg keeps the PRI header, pri forced to 13 (pmnull-basic.sh)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmnull")
        |input(type="imtcp" port="514" ruleset="ruleset")
        |parser(name="custom.pmnull.withOrigin" type="pmnull")
        |template(name="test" type="string" string="tag: %syslogtag%, pri: %pri%, syslogfacility: %syslogfacility%, syslogseverity: %syslogseverity% msg: %msg%\\n")
        |ruleset(name="ruleset" parser=["custom.pmnull.withOrigin", "rsyslog.pmnull"]) {
        |  action(type="omfile" file="/out.log" template="test")
        |}
        |""".stripMargin
    assert(render(conf, Seq(ciscoMsg)) == Seq(
      s"tag: , pri: 13, syslogfacility: 1, syslogseverity: 5 msg: $ciscoMsg\n"))
  }

  test("pmnull with params: configured tag and PRI override (pmnull-withparams.sh)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmnull")
        |input(type="imtcp" port="514" ruleset="ruleset")
        |parser(name="custom.pmnull" type="pmnull" tag="mytag" syslogfacility="3" syslogseverity="1")
        |template(name="test" type="string" string="tag: %syslogtag%, pri: %pri%, syslogfacility: %syslogfacility%, syslogseverity: %syslogseverity% msg: %msg%\\n")
        |ruleset(name="ruleset" parser=["custom.pmnull", "rsyslog.pmnull"]) {
        |  action(type="omfile" file="/out.log" template="test")
        |}
        |""".stripMargin
    assert(render(conf, Seq(ciscoMsg)) == Seq(
      s"tag: mytag, pri: 25, syslogfacility: 3, syslogseverity: 1 msg: $ciscoMsg\n"))
  }

  test("pmnormalize with rulebase file populates properties (pmnormalize-basic.sh)") {
    val rb = java.io.File.createTempFile("pmnorm", ".rulebase")
    rb.deleteOnExit()
    // the file carries liblognorm's raw \x3a escape (unescaped only in
    // config-string rules)
    java.nio.file.Files.writeString(rb.toPath,
      "rule=:<%pri:number%> %hostname:word% %syslogtag:char-to:\\x3a%: " +
      "is no longer listening on %fromhost-ip:ipv4% %msg:rest%\n")
    val conf =
      s"""module(load="imtcp")
         |module(load="pmnormalize")
         |input(type="imtcp" port="514" ruleset="ruleset")
         |parser(name="custom.pmnormalize" type="pmnormalize" rulebase="${rb.getAbsolutePath}")
         |template(name="test" type="string" string="host: %hostname%, ip: %fromhost-ip%, tag: %syslogtag%, pri: %pri%, syslogfacility: %syslogfacility%, syslogseverity: %syslogseverity% msg: %msg%\\n")
         |ruleset(name="ruleset" parser="custom.pmnormalize") {
         |  action(type="omfile" file="/out.log" template="test")
         |}
         |""".stripMargin
    val out = render(conf, Seq(
      "<189> ubuntu tag1: is no longer listening on 127.0.0.1 test",
      "<112> debian tag2: is no longer listening on 255.255.255.255 test",
      "<177> centos tag3: is no longer listening on 192.168.0.9 test")).sorted
    assert(out == Seq(
      "host: centos, ip: 192.168.0.9, tag: tag3, pri: 177, syslogfacility: 22, syslogseverity: 1 msg: test\n",
      "host: debian, ip: 255.255.255.255, tag: tag2, pri: 112, syslogfacility: 14, syslogseverity: 0 msg: test\n",
      "host: ubuntu, ip: 127.0.0.1, tag: tag1, pri: 189, syslogfacility: 23, syslogseverity: 5 msg: test\n"))
  }

  test("pmnormalize no-match still accepts: msg = whole frame (pmnormalize-rule_invld-data.sh)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmnormalize")
        |input(type="imtcp" port="514" ruleset="ruleset")
        |parser(name="custom.pmnormalize" type="pmnormalize" undefinedPropertyError="on"
        |       rule="rule=:<%pri:number%> %fromhost-ip:ipv4% %hostname:word% %syslogtag:char-to:\\x3a%: %msg:rest%")
        |template(name="test" type="string" string="%msg%\\n")
        |ruleset(name="ruleset" parser="custom.pmnormalize") {
        |  action(type="omfile" file="/out.log" template="test")
        |}
        |""".stripMargin
    assert(render(conf, Seq("<abc> 127.0.0.1 ubuntu tag1: this is a test message")) ==
      Seq("<abc> 127.0.0.1 ubuntu tag1: this is a test message\n"))
  }

  test("pmnormalize rule= array: first matching rule wins (doc example)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmnormalize")
        |input(type="imtcp" port="514" ruleset="outp")
        |parser(name="custom.pmnormalize" type="pmnormalize" rule=[
        |    "rule=:<%pri:number%> %fromhost-ip:ipv4% %hostname:word% %syslogtag:char-to:\\x3a%: %msg:rest%",
        |    "rule=:<%pri:number%> %hostname:word% %fromhost-ip:ipv4% %syslogtag:char-to:\\x3a%: %msg:rest%"])
        |template(name="test" type="string" string="%hostname%/%fromhost-ip%: %msg%\\n")
        |ruleset(name="outp" parser="custom.pmnormalize") {
        |  action(type="omfile" file="/out.log" template="test")
        |}
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      feeds = Map("imtcp:514" -> Seq(
        "<13> 10.0.0.1 alpha web: ip first",
        "<13> beta 10.0.0.2 db: host first").toDF("value")),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    val out = res("outp").actionFrame(0).select("__rendered")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(out == Seq("alpha/10.0.0.1: ip first\n", "beta/10.0.0.2: host first\n"))
  }

  test("pmlastmsg chain with rfc5424/rfc3164 fallthrough (pmlastmsg.sh replay)") {
    val conf =
      """module(load="pmlastmsg")
        |module(load="imtcp")
        |input(type="imtcp" port="514" ruleset="ruleset1")
        |template(name="outfmt" type="string" string="%msg%\\n")
        |ruleset(name="ruleset1" parser=["rsyslog.lastline","rsyslog.rfc5424","rsyslog.rfc3164"]) {
        |  action(type="omfile" file="/out.log" template="outfmt")
        |}
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      feeds = Map("imtcp:514" -> Seq(
        "<13>last message repeated 5 times",
        "<13>last message repeated 0090909787348927349875 times",
        "<13>last message  repeated 5 times",
        "<13>last message repeated 5 times -- more data",
        "<13>last message repeated 5.2 times",
        "<167>Mar  6 16:57:54 172.20.245.8 TAG: Rest of message...",
        "<34>1 2003-11-11T22:14:15.003Z mymachine.example.com su - ID47 last message repeated 5 times")
        .toDF("value")),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    val out = res("ruleset1").actionFrame(0).select("__rendered")
      .collect().map(_.getString(0)).toSeq
    // reference EXPECTED block (tests/pmlastmsg.sh): rows 1-2 taken by
    // pmlastmsg verbatim, rows 3-5 fall through to rfc3164 (TAG "last",
    // msg from "message..."), row 6 is plain 3164, row 7 is 5424 whose
    // MSG happens to contain the repeated-text (pmlastmsg must NOT take
    // it: the version header breaks the opening-text match)
    assert(out == Seq(
      "last message repeated 5 times\n",
      "last message repeated 0090909787348927349875 times\n",
      "  repeated 5 times\n",
      " repeated 5 times -- more data\n",
      " repeated 5.2 times\n",
      " Rest of message...\n",
      "last message repeated 5 times\n"))
  }

  test("pmciscoios accepts IOS frames; unaccepted rows are discarded (ParseMsg)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmciscoios")
        |input(type="imtcp" port="514" ruleset="testing")
        |parser(name="custom.ciscoios" type="pmciscoios")
        |template(name="outfmt" type="string" string="%syslogtag%|%msg%")
        |ruleset(name="testing" parser="custom.ciscoios") {
        |  action(type="omfile" file="/out.log" template="outfmt")
        |}
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      feeds = Map("imtcp:514" -> Seq(
        s"<189>16261: May 28 16:09:56.185: %SYS-5-CONFIG_I: Configured from console",
        "<189>: May 28 16:09:56 UTC: %LINK-3-UPDOWN: Interface up",
        "<14>1: ", "<14>2: .", "<14>not cisco at all").toDF("value")),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    val out = res("testing").actionFrame(0).select("__rendered")
      .collect().map(_.getString(0)).toSeq.sorted
    // the three malformed frames are discarded — no parser accepted them
    // (runtime/parser.c:665-682 discard path)
    assert(out == Seq(
      "%LINK-3-UPDOWN:| Interface up",
      "%SYS-5-CONFIG_I:| Configured from console"))
  }

  test("pmaixforwardedfrom transformer unmangles, rfc3164 then parses (chain fallthrough)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmaixforwardedfrom")
        |input(type="imtcp" port="514" ruleset="r")
        |template(name="outfmt" type="string" string="%hostname%|%syslogtag%|%msg%")
        |ruleset(name="r" parser=["rsyslog.aixforwardedfrom","rsyslog.rfc3164"]) {
        |  action(type="omfile" file="/out.log" template="outfmt")
        |}
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      feeds = Map("imtcp:514" -> Seq(
        "<13>Oct 11 22:14:15 Message forwarded from hostaix: sshd[123]: accepted",
        "<13>Oct 11 22:14:15 From hostb: cron[7]: job done",
        "<13>Oct 11 22:14:15 plainhost app: untouched").toDF("value")),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    val out = res("r").actionFrame(0).select("__rendered")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(out == Seq(
      "hostaix|sshd[123]:| accepted",
      "hostb|cron[7]:| job done",
      "plainhost|app:| untouched"))
  }

  test("pmcisconames transformer strips the ' : ' name separator (chain fallthrough)") {
    val conf =
      """module(load="imtcp")
        |module(load="pmcisconames")
        |input(type="imtcp" port="514" ruleset="r")
        |template(name="outfmt" type="string" string="%hostname%|%syslogtag%|%msg%")
        |ruleset(name="r" parser=["rsyslog.cisconames","rsyslog.rfc3164"]) {
        |  action(type="omfile" file="/out.log" template="outfmt")
        |}
        |""".stripMargin
    val cfg = RsyslogConfig.parse(conf)
    val res = cfg.activate(spark,
      feeds = Map("imtcp:514" -> Seq(
        "<13>Oct 11 22:14:15 myswitch : %ASA-6-302013: built conn to the outside",
        "<13>Oct 11 22:14:15 otherhost tag: no mangling here at all right").toDF("value")),
      now = to_timestamp(lit("2024-06-01 12:00:00")))
    val out = res("r").actionFrame(0).select("__rendered")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(out == Seq(
      "myswitch|%ASA-6-302013:| built conn to the outside",
      "otherhost|tag:| no mangling here at all right"))
  }

  test("chain falls back to the default list when ruleset has no parser=") {
    val conf =
      """module(load="imtcp")
        |input(type="imtcp" port="514" ruleset="ruleset")
        |template(name="test" type="string" string="%hostname% %syslogtag% %msg%")
        |ruleset(name="ruleset") {
        |  action(type="omfile" file="/out.log" template="test")
        |}
        |""".stripMargin
    // msg keeps its leading space (RFC3164 MSG starts right after TAG)
    assert(render(conf, Seq("<13>Jun  1 11:00:00 myhost app[1]: hello")) ==
      Seq("myhost app[1]:  hello"))
  }
}
