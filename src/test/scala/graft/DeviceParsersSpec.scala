package graft

import org.apache.spark.sql.functions._
import graft.functions.{device, Utf8FixExpr}
import graft.operators.Normalize

class DeviceParsersSpec extends SparkSpec {
  import spark.implicits._

  private def row(c: org.apache.spark.sql.Column) =
    Seq(1).toDF("x").select(c.as("r")).collect()(0)

  test("pmciscoios: seq, unsynced marker, %tag") {
    val r = row(device.parseCiscoIos(
      lit("123: *Mar  1 18:48:50.483 UTC: %SYS-5-CONFIG_I: Configured from console"))
    ).getStruct(0)
    assert(r.getAs[Long]("seqno") == 123L)
    assert(r.getAs[String]("msg_facility") == "SYS")
    assert(r.getAs[Int]("severity") == 5)
    assert(r.getAs[String]("mnemonic") == "CONFIG_I")
    assert(r.getAs[String]("text") == "Configured from console")
    // no seq, no marker
    val r2 = row(device.parseCiscoIos(
      lit("Mar  1 18:48:50: %LINK-3-UPDOWN: Interface up"))).getStruct(0)
    assert(r2.getAs[Long]("seqno") == null.asInstanceOf[Long] || r2.isNullAt(r2.fieldIndex("seqno")))
    assert(r2.getAs[Int]("severity") == 3)
    // non-IOS → null struct
    assert(row(device.parseCiscoIos(lit("plain text"))).isNullAt(0))
  }

  test("pmaixforwardedfrom strips the AIX prefix") {
    val r = row(device.parseAixForwardedFrom(
      lit("Message forwarded from aixhost: real payload"))).getStruct(0)
    assert(r.getAs[String]("hostname") == "aixhost")
    assert(r.getAs[String]("text") == "real payload")
  }

  test("pmcisconames: name between timestamp and %tag") {
    val r = row(device.parseCiscoNames(
      lit("Mar  1 18:48:50 fw01 : %ASA-6-302013: Built outbound TCP"))).getStruct(0)
    assert(r.getAs[String]("hostname") == "fw01")
    assert(r.getAs[Int]("severity") == 6)
    assert(r.getAs[String]("text") == "Built outbound TCP")
  }

  test("mmleefparse: header + tab extension") {
    val r = row(device.parseLeef(
      lit("LEEF:2.0|IBM|QRadar|9.1|12|src=10.0.0.1\tdst=2.1.2.2\tspt=1234")))
      .getStruct(0)
    assert(r.getAs[String]("version") == "2.0")
    assert(r.getAs[String]("vendor") == "IBM")
    assert(r.getAs[String]("event_id") == "12")
    val ext = r.getAs[Map[String, String]]("ext")
    assert(ext("src") == "10.0.0.1" && ext("spt") == "1234")
    assert(row(device.parseLeef(lit("CEF:0|x|y"))).isNullAt(0))
  }

  test("mmaudit: header + k=v map") {
    val r = row(device.parseAudit(
      lit("type=SYSCALL msg=audit(1718000000.123:456): arch=c000003e syscall=59 success=yes")))
      .getStruct(0)
    assert(r.getAs[String]("audit_type") == "SYSCALL")
    assert(r.getAs[Long]("epoch") == 1718000000L)
    assert(r.getAs[Long]("serial") == 456L)
    assert(r.getAs[Map[String, String]]("kv")("syscall") == "59")
  }

  test("mmaudit: quoted values with spaces stay one entry") {
    val r = row(device.parseAudit(
      lit("""type=USER_CMD msg=audit(1718000000.123:457): pid=123 cmd="ls -la /tmp" acct="john doe"""")))
      .getStruct(0)
    val kv = r.getAs[Map[String, String]]("kv")
    assert(kv("cmd") == "ls -la /tmp")
    assert(kv("acct") == "john doe")
    assert(kv("pid") == "123")
  }

  test("mmleefparse: LEEF 2.0 declared delimiter (literal and hex form)") {
    val r = row(device.parseLeef(
      lit("LEEF:2.0|V|P|1|id7|^|src=10.0.0.1^dst=10.0.0.2"))).getStruct(0)
    val ext = r.getAs[Map[String, String]]("ext")
    assert(ext("src") == "10.0.0.1" && ext("dst") == "10.0.0.2")
    val rx = row(device.parseLeef(
      lit("LEEF:2.0|V|P|1|id8|x5E|src=1^dst=2"))).getStruct(0)
    val extx = rx.getAs[Map[String, String]]("ext")
    assert(extx("src") == "1" && extx("dst") == "2")
    // 2.0 without the optional delimiter field falls back to TAB
    val r2 = row(device.parseLeef(
      lit("LEEF:2.0|V|P|1|id9|src=3\tdst=4"))).getStruct(0)
    assert(r2.getAs[Map[String, String]]("ext")("dst") == "4")
  }

  test("pmpanngfw: rest keeps the remainder past subtype") {
    val p = row(device.parsePanNgfw(lit(
      "1,2024/01/01 12:00:00,0011,TRAFFIC,end,2024/01/01,10.0.0.1,10.0.0.2,more"))).getStruct(0)
    assert(p.getAs[String]("rest") == "2024/01/01,10.0.0.1,10.0.0.2,more")
  }

  test("mmutf8fix kernel: reference semantics per byte class") {
    def fix(bytes: Array[Byte]): String =
      Utf8FixExpr.kernel(bytes, Array(' '.toByte)).toString
    // valid ASCII + valid 2-byte stays
    assert(fix("aé".getBytes("UTF-8")) == "aé")
    // stray continuation byte
    assert(fix(Array('a'.toByte, 0x80.toByte, 'b'.toByte)) == "a b")
    // truncated 2-byte at end
    assert(fix(Array('a'.toByte, 0xC3.toByte)) == "a ")
    // 5-byte lead (forbidden)
    assert(fix(Array(0xF9.toByte, 'x'.toByte)) == " x")
    // overlong encoding of '/' (C0 AF) → both bytes replaced
    assert(fix(Array(0xC0.toByte, 0xAF.toByte)) == "  ")
    // UTF-16 surrogate D800 (ED A0 80) → three bytes replaced
    assert(fix(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte)) == "   ")
    // invalid continuation mid-sequence: lead replaced, tail re-examined
    assert(fix(Array(0xE2.toByte, 0x28.toByte, 0xA1.toByte)) == " ( ")
    // 4-byte valid (U+1F600) passes
    assert(fix(Array(0xF0.toByte, 0x9F.toByte, 0x98.toByte, 0x80.toByte)) == "😀")
  }

  test("mmutf8fix replacementSequence: each invalid byte expands") {
    // tests/yaml-mmutf8fix-replacement-sequence.sh: \xc0 becomes the
    // full U+FFFD byte sequence
    val fffd = Array(0xEF.toByte, 0xBF.toByte, 0xBD.toByte)
    val in = " has".getBytes("UTF-8") ++ Array(0xC0.toByte) ++ "invalid".getBytes("UTF-8")
    assert(Utf8FixExpr.kernel(in, fffd).toString == " has\ufffdinvalid")
    // two invalid bytes -> two sequences
    val in2 = Array(0xC0.toByte, 0xAF.toByte)
    assert(Utf8FixExpr.kernel(in2, fffd).toString == "\ufffd\ufffd")
  }

  test("hex-domain hmac is keyed and deterministic") {
    val a = row(device.hmacLikeHex(lit("hello"), "graftkey")).getString(0)
    val b = row(device.hmacLikeHex(lit("hello"), "graftkey")).getString(0)
    val c = row(device.hmacLikeHex(lit("hello"), "otherkey")).getString(0)
    val d = row(device.hmacLikeHex(lit("hellp"), "graftkey")).getString(0)
    assert(a == b && a != c && a != d && a.length == 64)
    val sd = row(device.addHmacSd(lit("m1"), "graftkey", "hmac@1",
      oracleCompat = true)).getString(0)
    assert(sd.startsWith("m1 [hmac@1 h=\"") && sd.endsWith("\"]"))
  }

  test("hmacSha256 is byte-exact RFC 2104 (javax.crypto reference)") {
    def jce(msg: String, key: String): String = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(
        key.getBytes("UTF-8"), "HmacSHA256"))
      mac.doFinal(msg.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // RFC 4231 test case 2 ("Jefe" / "what do ya want for nothing?")
    assert(row(device.hmacSha256(lit("what do ya want for nothing?"), "Jefe"))
      .getString(0) ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    for ((m, k) <- Seq(
        ("hello", "graftkey"),
        ("", "k"),
        ("msg with spaces and unicode é😀", "key"),
        // oversized key (>64 bytes) must be hashed first per RFC 2104
        ("long-key message", "K" * 131)))
      assert(row(device.hmacSha256(lit(m), k)).getString(0) == jce(m, k),
        s"mismatch for ($m, $k)")
    val sd = row(device.addHmacSd(lit("m1"), "graftkey", "hmac@1")).getString(0)
    assert(sd == "m1 [hmac@1 h=\"" + jce("m1", "graftkey") + "\"]")
  }

  test("mmsnmptrapd severity word rewrite only fires on the trigger tag") {
    def sev(tag: String, msg: String) =
      row(device.snmptrapdRewrite(lit(tag), lit(msg), lit(6))).getInt(0)
    assert(sev("snmptrapd:", "warning trap text") == 4)
    assert(sev("snmptrapd:", "unknownword trap") == 6) // unmapped → keep
    assert(sev("other:", "warning trap text") == 6)    // wrong tag → keep
  }

  test("grok compiles and extracts named fields") {
    val g = Normalize.grok(
      lit("2024-06-01 10:00:00 ERROR user u7 did purchase from 10.1.2.3"),
      "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} user %{WORD:u} did %{WORD:act} from %{IP:ip}")
    val r = row(g).getStruct(0)
    assert(r.getAs[String]("lvl") == "ERROR")
    assert(r.getAs[String]("u") == "u7")
    assert(r.getAs[String]("ip") == "10.1.2.3")
    // unnamed pattern groups are non-capturing
    val g2 = Normalize.grok(lit("x 42"), "%{WORD} %{INT:n}")
    assert(row(g2).getStruct(0).getAs[String]("n") == "42")
  }

  test("rulebase tags + annotate + discard fields (processing_tests rulebase)") {
    // the reference's WIN/ESX rules verbatim
    // (tests/testsuites/mmnormalize_processing_tests.rulebase:1-8)
    val rb = Seq(
      "rule=WIN:<%n1:number%>1 %-:date-rfc5424% %n2:word% %v_tag:word% - - - %v_svc:word% %v_ret:word% %v_os:word% %v_msg:rest%",
      "annotate=WIN:+v_analytics_prefix=\"EvntSLog: \"",
      "rule=ESX:<%-:number%>%-:date-rfc5424% %-:word% %v_tag:char-to:\\x3a%: %v_msg:rest%",
      "annotate=ESX:+v_svc=\"SER2\"",
      "annotate=ESX:+v_os=\"ESX\"")
    val compiled = Normalize.compileRulebase(rb)
    assert(compiled.size == 2)
    assert(compiled(0).tags == Seq("WIN"))
    assert(compiled(0).annotations == Seq("v_analytics_prefix" -> "EvntSLog: "))
    assert(compiled(1).annotations ==
      Seq("v_svc" -> "SER2", "v_os" -> "ESX"))
    // discard fields anchor but never capture
    assert(!compiled(1).fields.exists(_.name == "-"))
    val win = row(Normalize.normalizeRulebase(
      lit("<134>1 2024-01-05T10:20:30Z h7 WinTag - - - svcA retB osC hello world"),
      rb)).getString(0)
    assert(win.contains("\"v_svc\":\"svcA\""))
    assert(win.contains("\"v_analytics_prefix\":\"EvntSLog: \""))
    assert(win.contains("\"n1\":\"134\""))
    val esx = row(Normalize.normalizeRulebase(
      lit("<7>2024-01-05T10:20:30Z esx1 vpx.daemon: boot done"), rb))
      .getString(0)
    assert(esx.contains("\"v_tag\":\"vpx.daemon\""))
    assert(esx.contains("\"v_msg\":\"boot done\""))
    assert(esx.contains("\"v_svc\":\"SER2\"") && esx.contains("\"v_os\":\"ESX\""))
    // no rule → "{}"
    assert(row(Normalize.normalizeRulebase(lit("garbage"), rb))
      .getString(0) == "{}")
  }

  test("pmdb2diag and pmpanngfw field extraction") {
    val r = row(device.parseDb2Diag(lit(
      "2024-01-01-12.00.00.123456+000 I12345A678 LEVEL: Error PID : 1234 TID : 5678 PROC : db2sysc"
    ))).getStruct(0)
    assert(r.getAs[String]("level") == "Error")
    assert(r.getAs[Long]("pid") == 1234L)
    assert(r.getAs[String]("proc") == "db2sysc")
    val p = row(device.parsePanNgfw(lit(
      "1,2024/01/01 12:00:00,0011223344,TRAFFIC,end,rest of fields"))).getStruct(0)
    assert(p.getAs[String]("pan_type") == "TRAFFIC")
    assert(p.getAs[String]("subtype") == "end")
  }
}
