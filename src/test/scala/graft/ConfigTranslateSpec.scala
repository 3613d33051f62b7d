package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rainerscript.ConfigTranslate

/** Config translator goldens — each case mirrors a reference
  * tests/config-translate-*.sh scenario byte-for-byte (the reference
  * gates with cmp_exact_file on these exact expected strings). */
class ConfigTranslateSpec extends AnyFunSuite {

  test("Debian-style legacy defaults translate into YAML statements (config-translate-legacy-debian-default.sh)") {
    val conf =
      """*.*;auth,authpriv.none		-/var/log/syslog
        |auth,authpriv.*			/var/log/auth.log
        |cron.*				-/var/log/cron.log
        |kern.*				-/var/log/kern.log
        |mail.*				-/var/log/mail.log
        |user.*				-/var/log/user.log
        |*.emerg				:omusrmsg:*
        |""".stripMargin
    val expected =
      """version: 2
        |
        |rulesets:
        |  # TRANSLATION WARNING: top-level statements normalized into explicit RSYSLOG_DefaultRuleset
        |  - name: "RSYSLOG_DefaultRuleset"
        |    statements:
        |      - if: "prifilt('*.*;auth,authpriv.none')"
        |        action:
        |          type: "omfile"
        |          file: "/var/log/syslog"
        |      - if: "prifilt('auth,authpriv.*')"
        |        action:
        |          type: "omfile"
        |          file: "/var/log/auth.log"
        |      - if: "prifilt('cron.*')"
        |        action:
        |          type: "omfile"
        |          file: "/var/log/cron.log"
        |      - if: "prifilt('kern.*')"
        |        action:
        |          type: "omfile"
        |          file: "/var/log/kern.log"
        |      - if: "prifilt('mail.*')"
        |        action:
        |          type: "omfile"
        |          file: "/var/log/mail.log"
        |      - if: "prifilt('user.*')"
        |        action:
        |          type: "omfile"
        |          file: "/var/log/user.log"
        |      - if: "prifilt('*.emerg')"
        |        action:
        |          type: "omusrmsg"
        |          users: "*"
        |""".stripMargin
    assert(ConfigTranslate.toYaml(conf) == expected)
  }

  test("single legacy file-action keeps the filter/actions form (config-translate-legacy-file-action.sh)") {
    val conf = "user.*\t\t\t\t-/var/log/user.log\n"
    val expected =
      """version: 2
        |
        |rulesets:
        |  # TRANSLATION WARNING: top-level statements normalized into explicit RSYSLOG_DefaultRuleset
        |  - name: "RSYSLOG_DefaultRuleset"
        |    filter: "user.*"
        |    actions:
        |      - type: "omfile"
        |        file: "/var/log/user.log"
        |""".stripMargin
    assert(ConfigTranslate.toYaml(conf) == expected)
  }

  test("unconvertible legacy action falls back to script text with warnings (config-translate-legacy-warning.sh)") {
    val conf =
      """module(load="omstdout")
        |*.* :omstdout:
        |""".stripMargin
    val out = ConfigTranslate.toYaml(conf)
    assert(out.contains("# TRANSLATION WARNING: top-level statements normalized into explicit RSYSLOG_DefaultRuleset"))
    assert(out.contains("# TRANSLATION WARNING: legacy action syntax preserved as script text"))
    assert(out.contains("name: \"RSYSLOG_DefaultRuleset\""))
    assert(out.contains("*.* :omstdout:"))
  }

  test("RainerScript objects translate to YAML sections (config-translate-rs-to-yaml.sh)") {
    val conf =
      """main_queue(queue.type="Direct")
        |ruleset(name="main") {
        |  action(type="omfile" file="/var/log/sample.log")
        |}
        |""".stripMargin
    val expected =
      """version: 2
        |
        |mainqueue:
        |  queue.type: "Direct"
        |
        |rulesets:
        |  - name: "main"
        |    actions:
        |      - type: "omfile"
        |        file: "/var/log/sample.log"
        |""".stripMargin
    assert(ConfigTranslate.toYaml(conf) == expected)
  }

  test("selector statements inside a ruleset become YAML statements (config-translate-rs-statements-to-yaml.sh)") {
    val conf =
      """ruleset(name="main") {
        |  mail.info action(type="omfile" file="/tmp/a.log")
        |  & action(type="omfile" file="/tmp/a2.log")
        |  authpriv.* action(type="omfile" file="/tmp/b.log")
        |}
        |""".stripMargin
    val expected =
      """version: 2
        |
        |rulesets:
        |  - name: "main"
        |    statements:
        |      - if: "prifilt('mail.info')"
        |        then:
        |          - type: "omfile"
        |            file: "/tmp/a.log"
        |          - type: "omfile"
        |            file: "/tmp/a2.log"
        |      - if: "prifilt('authpriv.*')"
        |        action:
        |          type: "omfile"
        |          file: "/tmp/b.log"
        |""".stripMargin
    assert(ConfigTranslate.toYaml(conf) == expected)
  }

  test("single selector/action ruleset keeps filter/actions (config-translate-rs-filter-actions.sh)") {
    val conf =
      """ruleset(name="main") {
        |  mail.info action(type="omfile" file="/tmp/fa.log")
        |}
        |""".stripMargin
    val expected =
      """version: 2
        |
        |rulesets:
        |  - name: "main"
        |    filter: "mail.info"
        |    actions:
        |      - type: "omfile"
        |        file: "/tmp/fa.log"
        |""".stripMargin
    assert(ConfigTranslate.toYaml(conf) == expected)
  }

  test("script expressions re-emit canonically (config-translate-rs-script-expressions.sh)") {
    val conf =
      """ruleset(name="target") {
        |  action(type="omfile" file="/tmp/t.log")
        |}
        |
        |ruleset(name="main") {
        |  set $.n = -7;
        |  set $.s = "line\nquote\"tab\tbackslash\\";
        |  set $.arr = ["one", "two"];
        |  reset $.scratch = $.arr;
        |  unset $.arr;
        |  if not exists($!missing) and (($msg contains_i "ERR") or ($msg startswith " start")) then {
        |    foreach ($.item in $!items) do {
        |      call target
        |    }
        |  } else {
        |    call_indirect "tar" & "get";
        |  }
        |}
        |""".stripMargin
    val expected =
      """ruleset(name="target") {
        |  action(type="omfile" file="/tmp/t.log")
        |}
        |
        |ruleset(name="main") {
        |  set $.n = -7;
        |  set $.s = "line\nquote\"tab\tbackslash\\";
        |  set $.arr = ["one", "two"];
        |  reset $.scratch = $.arr;
        |  unset $.arr;
        |  if (not exists($!missing) and (($msg contains_i "ERR") or ($msg startswith " start"))) then {
        |    foreach ($.item in $!items) do {
        |      call target
        |    }
        |  } else {
        |    call_indirect ("tar" & "get");
        |  }
        |}
        |
        |""".stripMargin
    assert(ConfigTranslate.translate(conf, inputIsYaml = false,
      toFormat = "rainerscript") == expected)
  }

  test("YAML config translates to RainerScript (config-translate-yaml-to-rs.sh)") {
    val yaml =
      """version: 2
        |modules:
        |  - load: "omstdout"
        |mainqueue:
        |  queue.type: "Direct"
        |rulesets:
        |  - name: "main"
        |    script: |
        |      action(type="omstdout")
        |""".stripMargin
    val expected =
      """main_queue(queue.type="Direct")
        |
        |module(load="omstdout")
        |
        |ruleset(name="main") {
        |  action(type="omstdout")
        |}
        |
        |""".stripMargin
    assert(ConfigTranslate.toRainerScript(yaml) == expected)
  }

  test("RS -> YAML -> RS -> YAML round trip is stable (config-translate-rs-roundtrip.sh shape)") {
    val conf =
      """global(defaultNetstreamDriverCAFile="/certs/ca.pem"
        |       defaultNetstreamDriverCertFile="/certs/cert.pem"
        |       defaultNetstreamDriverKeyFile="/certs/key.pem")
        |
        |module(load="imtcp"
        |       StreamDriver.Name="gtls"
        |       StreamDriver.Mode="1"
        |       StreamDriver.AuthMode="x509/name"
        |       PermittedPeer=["rsyslog-client"])
        |input(type="imtcp" address="127.0.0.1" listenPortFileName="/tmp/pf" port="0")
        |
        |template(name="outfmt" type="string" string="%msg:F,58:2%\n")
        |
        |ruleset(name="main") {
        |  action(type="omfile" file="/tmp/rt.log" template="outfmt")
        |}
        |""".stripMargin
    val expectedYaml =
      """version: 2
        |
        |global:
        |  defaultNetstreamDriverCAFile: "/certs/ca.pem"
        |  defaultNetstreamDriverCertFile: "/certs/cert.pem"
        |  defaultNetstreamDriverKeyFile: "/certs/key.pem"
        |
        |modules:
        |  - load: "imtcp"
        |    PermittedPeer: ["rsyslog-client"]
        |    StreamDriver.AuthMode: "x509/name"
        |    StreamDriver.Mode: "1"
        |    StreamDriver.Name: "gtls"
        |inputs:
        |  - type: "imtcp"
        |    address: "127.0.0.1"
        |    listenPortFileName: "/tmp/pf"
        |    port: "0"
        |templates:
        |  - name: "outfmt"
        |    type: "string"
        |    string: "%msg:F,58:2%\n"
        |rulesets:
        |  - name: "main"
        |    actions:
        |      - type: "omfile"
        |        file: "/tmp/rt.log"
        |        template: "outfmt"
        |""".stripMargin
    val y1 = ConfigTranslate.toYaml(conf)
    assert(y1 == expectedYaml)
    val rs = ConfigTranslate.toRainerScript(y1)
    val y2 = ConfigTranslate.toYaml(rs)
    assert(y2 == expectedYaml)
  }

  test("legacy $-directives and BSD blocks are fatal with the reference diagnostics (rsconf.c:835-867)") {
    val e1 = intercept[IllegalArgumentException] {
      ConfigTranslate.toYaml("$ModLoad imuxsock\n")
    }
    assert(e1.getMessage.contains(
      "legacy $-directive '$ModLoad' is not supported by the translator"))
    val e2 = intercept[IllegalArgumentException] {
      ConfigTranslate.toYaml("!prog\n*.* /tmp/x.log\n")
    }
    assert(e2.getMessage.contains("BSD-style tag block"))
  }

  test("template with list elements round-trips through both formats") {
    val conf =
      """template(name="lst" type="list") {
        |  constant(value="<")
        |  property(name="pri")
        |  constant(value=">")
        |}
        |""".stripMargin
    val yaml = ConfigTranslate.toYaml(conf)
    assert(yaml ==
      """version: 2
        |
        |templates:
        |  - name: "lst"
        |    type: "list"
        |    elements:
        |      - constant:
        |        value: "<"
        |      - property:
        |        name: "pri"
        |      - constant:
        |        value: ">"
        |""".stripMargin)
    val rs = ConfigTranslate.toRainerScript(yaml)
    assert(rs ==
      """template(name="lst" type="list") {
        |  constant(value="<")
        |  property(name="pri")
        |  constant(value=">")
        |}
        |
        |""".stripMargin)
  }
}
