package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.{RsyslogConfig, YamlLite}

/** The YAML config front-end (runtime/yamlconf.c): schema translation
  * to the RainerScript object model, script:/statements:/filter+actions
  * ruleset forms, and the YamlLite subset parser itself. Shapes replay
  * tests/compat-configformat-yaml.sh and the yamlconf.c doc examples.
  */
class YamlConfigSpec extends SparkSpec {
  import spark.implicits._

  test("YamlLite: maps, lists, inline list entries, block scalars") {
    import YamlLite._
    val n = YamlLite.parse(
      """version: 2
        |global:
        |  workDirectory: "/tmp/wd"   # trailing comment
        |mods:
        |  - load: imfile
        |  - load: omfile
        |    template: t1
        |rs:
        |  - name: main
        |    script: |
        |      set $.x = 1;
        |      action(type="omfile")
        |""".stripMargin)
    val m = n.asInstanceOf[YMap]
    assert(m.scalar("version").contains("2"))
    assert(m.get("global").get.asInstanceOf[YMap]
      .scalar("workDirectory").contains("/tmp/wd"))
    val mods = m.get("mods").get.asInstanceOf[YList].items
    assert(mods.size == 2)
    assert(mods(1).asInstanceOf[YMap].scalar("template").contains("t1"))
    val script = m.get("rs").get.asInstanceOf[YList].items.head
      .asInstanceOf[YMap].scalar("script").get
    assert(script == "set $.x = 1;\naction(type=\"omfile\")\n")
  }

  test("replay compat-configformat-yaml.sh: filter + actions ruleset") {
    val cfg = RsyslogConfig.parseYaml(
      """version: 2
        |global:
        |  workDirectory: "/tmp"
        |rulesets:
        |  - name: main
        |    filter: "mail.*"
        |    actions:
        |      - type: omfile
        |        file: "/tmp/out"
        |""".stripMargin)
    assert(cfg.rulesets.contains("main"))
    // the filter becomes a prifilt() guard around the action
    val body = cfg.rulesets("main")
    assert(body.nonEmpty)
    // run it: mail facility (2) passes, kern (0) doesn't
    val df = Seq((16, "mail msg"), (0, "kern msg")).toDF("pri", "msg")
      .withColumn("rawmsg", col("msg"))
      .withColumn("vars_msg", lit("{}")).withColumn("vars_local", lit("{}"))
      .withColumn("facility", (col("pri") / 8).cast("int"))
      .withColumn("severity", (col("pri") % 8).cast("int"))
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:00:00")))
      .withColumn("hostname", lit("h1"))
      .withColumn("syslogtag", lit("app:"))
    val res = cfg.run(df, "main")
    assert(res.actionFrame(0).count() == 1)
  }

  test("property-filter string form translates to an expression guard") {
    val cfg = RsyslogConfig.parseYaml(
      """rulesets:
        |  - name: main
        |    filter: ':msg, contains, "hello"'
        |    actions:
        |      - type: omfile
        |        file: "/tmp/out"
        |""".stripMargin)
    val df = Seq("say hello world", "nope").toDF("msg")
      .withColumn("rawmsg", col("msg"))
      .withColumn("vars_msg", lit("{}")).withColumn("vars_local", lit("{}"))
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:00:00")))
      .withColumn("hostname", lit("h1"))
      .withColumn("syslogtag", lit("app:"))
    val res = cfg.run(df, "main")
    val hit = res.actionFrame(0).select("msg").as[String].collect()
    assert(hit.toSeq == Seq("say hello world"))
  }

  test("statements: if/action/else, set, stop, call") {
    val cfg = RsyslogConfig.parseYaml(
      """rulesets:
        |  - name: aux
        |    actions:
        |      - type: omfile
        |        file: "/tmp/aux"
        |  - name: main
        |    statements:
        |      - set:
        |          var: "$.nbr"
        |          expr: 'field($msg, 58, 2)'
        |      - if: '$msg contains "msgnum:"'
        |        action:
        |          type: omfile
        |          file: "/tmp/out"
        |        else:
        |          - stop: true
        |      - call: aux
        |""".stripMargin)
    val df = Seq("msgnum:00000001: a:b", "other").toDF("msg")
      .withColumn("rawmsg", col("msg"))
      .withColumn("vars_msg", lit("{}")).withColumn("vars_local", lit("{}"))
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:00:00")))
      .withColumn("hostname", lit("h1"))
      .withColumn("syslogtag", lit("app:"))
    val res = cfg.run(df, "main")
    // the if-action fires for the msgnum row only
    assert(res.actionFrame(0).select("msg").as[String].collect().toSeq ==
      Seq("msgnum:00000001: a:b"))
    // the else-stop kills 'other' before the call: aux action sees 1 row
    assert(res.actionFrame(1).select("msg").as[String].collect().toSeq ==
      Seq("msgnum:00000001: a:b"))
    // the set ran before the branch
    val nbr = res.actionFrame(0)
      .select(get_json_object(col("vars_local"), "$.nbr")).as[String].head()
    assert(nbr == "00000001")
  }

  test("script: block carries RainerScript through verbatim") {
    val cfg = RsyslogConfig.parseYaml(
      """templates:
        |  - name: outfmt
        |    type: string
        |    string: "%msg%\n"
        |rulesets:
        |  - name: main
        |    script: |
        |      if $msg contains "x" then {
        |        action(type="omfile" template="outfmt")
        |      }
        |""".stripMargin)
    assert(cfg.templates.contains("outfmt"))
    val df = Seq("has x", "none").toDF("msg")
      .withColumn("rawmsg", col("msg"))
      .withColumn("vars_msg", lit("{}")).withColumn("vars_local", lit("{}"))
    assert(cfg.run(df, "main").actionFrame(0).count() == 1)
  }

  test("object sections: modules, inputs, lookup/ratelimit/timezone") {
    val lkFile = java.io.File.createTempFile("yamltbl", ".json")
    lkFile.deleteOnExit()
    java.nio.file.Files.write(lkFile.toPath,
      """{"version":1,"nomatch":"U","type":"string","table":[{"index":"a","value":"A"}]}"""
        .getBytes)
    val cfg = RsyslogConfig.parseYaml(
      s"""version: 2
         |modules:
         |  - load: imfile
         |inputs:
         |  - type: imfile
         |    file: "/tmp/in.log"
         |    tag: "yam:"
         |lookup_tables:
         |  - name: lk
         |    file: "${lkFile.getPath}"
         |ratelimits:
         |  - name: rl
         |    interval: 10
         |    burst: 3
         |timezones:
         |  - id: "EST"
         |    offset: "-05:00"
         |""".stripMargin)
    assert(cfg.hasModule("imfile"))
    assert(cfg.inputs.exists(_.get("type").contains("imfile")))
    assert(cfg.lookupTables.contains("lk"))
    assert(cfg.ratelimitPolicy("rl").exists(p =>
      p.intervalSec == 10L && p.burst == 3L))
    assert(cfg.timezones.get("EST").contains("-05:00"))
  }

  test("yamlToRainer: foreach / unset / call_indirect / reload forms") {
    val rs = RsyslogConfig.yamlToRainer(
      """rulesets:
        |  - name: m
        |    statements:
        |      - foreach:
        |          var: "$.item"
        |          in: "$!arr"
        |          do:
        |            - type: omfile
        |              file: "/tmp/o"
        |      - unset: "$.item"
        |      - call_indirect: "$!rs"
        |      - reload_lookup_table:
        |          table: lk
        |          stub_value: unknown
        |""".stripMargin)
    assert(rs.contains("foreach ($.item in $!arr) do {"))
    assert(rs.contains("unset $.item;"))
    assert(rs.contains("call_indirect $!rs;"))
    assert(rs.contains("""reload_lookup_table("lk", "unknown")"""))
  }

  test("includes: .conf preamble → YAML main → nested .yaml and .conf") {
    // tests/yaml-include.sh shape: a RainerScript config includes a
    // .yaml main config, which itself includes a nested .yaml (module)
    // and a .conf fragment (template)
    val dir = graft.Tmp.dir("graft_yinc")
    val sub = dir.resolve("sub.yaml")
    val inc = dir.resolve("inc.conf")
    val main = dir.resolve("main.yaml")
    java.nio.file.Files.writeString(sub,
      "modules:\n  - load: \"imtcp\"\n")
    java.nio.file.Files.writeString(inc,
      "template(name=\"confmt\" type=\"string\" string=\"%msg:F,58:2%\")\n")
    java.nio.file.Files.writeString(main,
      s"""include:
         |  - path: "${sub.toString}"
         |  - path: "${inc.toString}"
         |templates:
         |  - name: outfmt
         |    type: string
         |    string: "%msg:F,58:2%"
         |""".stripMargin)
    try {
      val cfg = graft.rainerscript.RsyslogConfig.parse(
        s"""include(file="${main.toString}")
           |action(type="omfile" template="outfmt")
           |""".stripMargin)
      assert(cfg.hasModule("imtcp"))          // nested .yaml loaded
      assert(cfg.templates.contains("confmt")) // nested .conf loaded
      assert(cfg.templates.contains("outfmt")) // YAML template section
      import spark.implicits._
      assert(cfg.run(Seq(("msgnum:00000042:")).toDF("msg"))
        .actionFrame(0).select("__rendered").collect()(0).getString(0)
        == "00000042")
    } finally {
      Seq(sub, inc, main).foreach(java.nio.file.Files.deleteIfExists)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("mmpstrucdata: container/jsonRoot params, null for nil SD") {
    // tests/yaml-mmpstrucdata-container-null.sh expected bytes
    val yaml =
      """modules:
        |  - load: "mmpstrucdata"
        |templates:
        |  - name: outfmt
        |    type: string
        |    string: "%$!structured-data%"
        |rulesets:
        |  - name: main
        |    statements:
        |      - type: mmpstrucdata
        |        jsonRoot: "$!structured-data"
        |        container: custom-yaml-sd
        |      - if: '$msg contains "MMPSTRUCDATA"'
        |        then:
        |          - type: omfile
        |            template: outfmt
        |""".stripMargin
    val cfg = graft.rainerscript.RsyslogConfig.parseYaml(yaml)
    import spark.implicits._
    val in = Seq(
      ("MMPSTRUCDATA with sd", """[test@32473 key="value"]"""),
      ("MMPSTRUCDATA without sd", null))
      .toDF("msg", "structured_data")
    val out = cfg.run(in, ruleset = "main").actionFrame(0)
      .select("__rendered").collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      """{ "custom-yaml-sd": { "test@32473": { "key": "value" } } }""",
      """{ "custom-yaml-sd": null }"""))
  }

  test("unknown top-level keys are ignored like process_top_level") {
    val cfg = RsyslogConfig.parseYaml(
      """version: 2
        |something_else:
        |  - whatever: 1
        |global:
        |  workDirectory: "/tmp"
        |""".stripMargin)
    assert(cfg.globals.get("workdirectory").contains("/tmp"))
  }
}
