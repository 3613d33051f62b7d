package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RsyslogConfig

/** Golden replay of tests/template-property-transformations.sh — the
  * reference's deterministic MsgGetProp matrix: field extraction,
  * substring bounds (incl. negative/end-relative/fixed-width/swapped),
  * regex match/no-match modes, case conversion, compress-space,
  * drop-last-lf, sp-if-no-1st-sp, control-character modes, secure-path
  * quirks, CSV/JSON/jsonf/jsonr/jsonfr formatting, via BOTH the
  * object-form list template and the legacy string template. Expected
  * lines are the reference test's EXPECTED block verbatim. */
class PropertyTransformSpec extends SparkSpec {
  import spark.implicits._

  private def vars = Map(
    "fields" -> "one,two,,four,",
    "word" -> "alphabet",
    "short" -> "xy",
    "regexsrc" -> "abc-123 def-456 ghi-789",
    "optional" -> "abc",
    "mixed" -> "MiXeD",
    "spaces" -> "a   b  c",
    "line" -> "tail\n",
    "leading" -> " lead",
    "control" -> "a\nb\tc",
    "path" -> "a/b/c",
    "empty" -> "",
    "dot" -> ".",
    "dotdot" -> "..",
    "csvsrc" -> "a,\"b\"",
    "jsonsrc" -> "a \\ \"b\"",
    "jsonrsrc" -> "a \\n b")

  private def input = {
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()
    vars.foreach { case (k, v) => tree.put(k, v) }
    tree.put("zero", 0); tree.put("auto", 42); tree.put("false", 0)
    Seq(("trigger/path  a  b")).toDF("msg")
      .withColumn("vars_msg", lit(tree.toString))
  }

  private def render(conf: String): Seq[String] =
    RsyslogConfig.parse(conf).run(input).actionFrame(0)
      .select("__rendered").collect()(0).getString(0).split("\n", -1).toSeq

  test("object-form transformation matrix renders the reference bytes") {
    val conf =
      """template(name="outfmt" type="list") {
        |	constant(value="field2=")
        |	property(name="$!fields" field.number="2" field.delimiter="44")
        |	constant(value="\nfield_empty=<")
        |	property(name="$!fields" field.number="3" field.delimiter="44")
        |	constant(value=">\nfield_final=<")
        |	property(name="$!fields" field.number="5" field.delimiter="44")
        |	constant(value=">")
        |	constant(value="\nfield_missing=")
        |	property(name="$!fields" field.number="6" field.delimiter="44")
        |	constant(value="\nsubstr=")
        |	property(name="$!word" position.from="2" position.to="4")
        |	constant(value="\nsubstr_neg_to=")
        |	property(name="$!word" position.from="2" position.to="-2")
        |	constant(value="\nsubstr_neg_underflow=")
        |	property(name="$!word" position.from="1" position.to="-99")
        |	constant(value="\nsubstr_beyond=")
        |	property(name="$!word" position.from="99" position.to="120")
        |	constant(value="\nsubstr_superset=")
        |	property(name="$!word" position.from="1" position.to="999")
        |	constant(value="\nrelend=")
        |	property(name="$!word" position.from="3" position.to="1" position.relativetoend="on")
        |	constant(value="\nrelend_underflow=")
        |	property(name="$!short" position.from="99" position.to="50" position.relativetoend="on")
        |	constant(value="\nfixed=")
        |	property(name="$!short" position.from="1" position.to="5" fixedwidth="on")
        |	constant(value="|\nregex_second=")
        |	property(name="$!regexsrc" regex.expression="([a-z]+)-([0-9]+)" regex.type="ERE" regex.match="1" regex.submatch="2")
        |	constant(value="\nregex_third=")
        |	property(name="$!regexsrc" regex.expression="([a-z]+)-([0-9]+)" regex.type="ERE" regex.match="2" regex.submatch="2")
        |	constant(value="\nregex_default=")
        |	property(name="$!word" regex.expression="ZZZ" regex.type="ERE" regex.nomatchmode="DFLT")
        |	constant(value="\nregex_blank=<")
        |	property(name="$!word" regex.expression="ZZZ" regex.type="ERE" regex.nomatchmode="BLANK")
        |	constant(value=">")
        |	constant(value="\nregex_field=")
        |	property(name="$!word" regex.expression="ZZZ" regex.type="ERE" regex.nomatchmode="FIELD")
        |	constant(value="\nregex_zero=")
        |	property(name="$!word" regex.expression="ZZZ" regex.type="ERE" regex.nomatchmode="ZERO")
        |	constant(value="\nupper=")
        |	property(name="$!mixed" caseconversion="upper")
        |	constant(value="\nlower=")
        |	property(name="$!mixed" caseconversion="lower")
        |	constant(value="\ncompress=")
        |	property(name="$!spaces" compressspace="on")
        |	constant(value="\ncompress_msg=")
        |	property(name="msg" compressspace="on")
        |	constant(value="\ndroplastlf=")
        |	property(name="$!line" droplastlf="on")
        |	constant(value="\nspif_nonspace=<")
        |	property(name="$!word" spifno1stsp="on")
        |	constant(value=">")
        |	constant(value="\nspif_space=<")
        |	property(name="$!leading" spifno1stsp="on")
        |	constant(value=">")
        |	constant(value="\ncc_drop=")
        |	property(name="$!control" controlcharacters="drop")
        |	constant(value="\ncc_space=")
        |	property(name="$!control" controlcharacters="space")
        |	constant(value="\ncc_escape=")
        |	property(name="$!control" controlcharacters="escape")
        |	constant(value="\ncc_escape_octal=")
        |	property(name="$!control" controlcharacters="escape-octal")
        |	constant(value="\nsec_drop=")
        |	property(name="$!path" securepath="drop")
        |	constant(value="\nsec_replace=")
        |	property(name="$!path" securepath="replace")
        |	constant(value="\nsec_replace_msg=")
        |	property(name="msg" securepath="replace")
        |	constant(value="\nsec_empty=")
        |	property(name="$!empty" securepath="drop")
        |	constant(value="\nsec_dot=")
        |	property(name="$!dot" securepath="drop")
        |	constant(value="\nsec_dotdot=")
        |	property(name="$!dotdot" securepath="drop")
        |	constant(value="\ncsv=")
        |	property(name="$!csvsrc" format="csv")
        |	constant(value="\ncombo_msg=")
        |	property(name="msg" securepath="replace" compressspace="on" format="csv")
        |	constant(value="\njson=")
        |	property(name="$!jsonsrc" format="json")
        |	constant(value="\njsonf=")
        |	property(name="$!jsonsrc" outname="jsonsrc" format="jsonf")
        |	constant(value="\njsonr=")
        |	property(name="$!jsonrsrc" format="jsonr")
        |	constant(value="\njsonfr=")
        |	property(name="$!jsonrsrc" outname="jsonrsrc" format="jsonfr")
        |	constant(value="\njson_zero=<")
        |	property(name="$!zero" outname="zero" format="jsonf" datatype="number" omitIfZero="on")
        |	constant(value=">\njson_empty=<")
        |	property(name="$!empty" outname="empty" format="jsonf" onEmpty="skip")
        |	constant(value=">\njson_auto=<")
        |	property(name="$!auto" outname="auto" format="jsonf" datatype="auto")
        |	constant(value=">\njson_false=<")
        |	property(name="$!false" outname="false" format="jsonf" datatype="bool")
        |	constant(value=">")
        |}
        |action(type="omfile" template="outfmt")
        |""".stripMargin
    val expected = Seq(
      "field2=two",
      "field_empty=<>",
      "field_final=<>",
      "field_missing=**FIELD NOT FOUND**",
      "substr=lph",
      "substr_neg_to=lphab",
      "substr_neg_underflow=a",
      "substr_beyond=",
      "substr_superset=alphabet",
      "relend=bet",
      "relend_underflow=x",
      "fixed=xy   |",
      "regex_second=456",
      "regex_third=789",
      "regex_default=**NO MATCH**",
      "regex_blank=<>",
      "regex_field=alphabet",
      "regex_zero=0",
      "upper=MIXED",
      "lower=mixed",
      "compress=a b c",
      "compress_msg=trigger/path a b",
      "droplastlf=tail",
      "spif_nonspace=< >",
      "spif_space=<>",
      "cc_drop=abc",
      "cc_space=a b c",
      "cc_escape=a#010b#009c",
      "cc_escape_octal=a#012b#011c",
      "sec_drop=abc",
      "sec_replace=a_b_c",
      "sec_replace_msg=trigger_path  a  b",
      "sec_empty=_",
      "sec_dot=_",
      "sec_dotdot=_.",
      "csv=\"a,\"\"b\"\"\"",
      "combo_msg=\"trigger_path a b\"",
      "json=a \\\\ \\\"b\\\"",
      "jsonf=\"jsonsrc\":\"a \\\\ \\\"b\\\"\"",
      "jsonr=a \\n b",
      "jsonfr=\"jsonrsrc\":\"a \\n b\"",
      "json_zero=<>",
      "json_empty=<>",
      "json_auto=<\"auto\":42>",
      "json_false=<\"false\":false>")
    val got = render(conf)
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(got.lift(i).contains(e), s"line $i: got=${got.lift(i)} want=$e")
    }
    assert(got.size == expected.size)
  }

  test("legacy string-template spellings match the same matrix") {
    val conf =
      """template(name="legacyfmt" type="string"
        |	string="legacy_upper=%$!mixed:::uppercase%\nlegacy_fixed=%$!short:1:5:fixed-width%|\nlegacy_relend=%$!word:3:1:pos-end-relative%\nlegacy_swap=%$!word:4:2%\nlegacy_field=%$!fields:F,44:2%\nlegacy_escape=%$!control:::escape-cc%\nlegacy_sec_replace=%$!path:::secpath-replace%\nlegacy_jsonf=%$!jsonsrc:::jsonf%\nlegacy_jsonr=%$!jsonrsrc:::jsonr%\nlegacy_jsonfr=%$!jsonrsrc:::jsonfr%")
        |action(type="omfile" template="legacyfmt")
        |""".stripMargin
    assert(render(conf) == Seq(
      "legacy_upper=MIXED",
      "legacy_fixed=xy   |",
      "legacy_relend=bet",
      "legacy_swap=lph",
      "legacy_field=two",
      "legacy_escape=a#010b#009c",
      "legacy_sec_replace=a_b_c",
      "legacy_jsonf=\"jsonsrc\":\"a \\\\ \\\"b\\\"\"",
      "legacy_jsonr=a \\n b",
      "legacy_jsonfr=\"jsonrsrc\":\"a \\n b\""))
  }
}
