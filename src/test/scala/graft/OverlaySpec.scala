package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RainerCompiler

/** The scalar set-overlay cache (RainerCompiler.OverlayInfo) must be
  * invisible: every script here reads a variable in a way the overlay
  * could short-circuit, and asserts the value the TREE read would have
  * produced. Each case targets one hazard of the cache. */
class OverlaySpec extends SparkSpec {
  import spark.implicits._

  private def run1(script: String, cols: (String, String)*): Map[String, String] = {
    val in = Seq(1).toDF("n")
    val res = RainerCompiler.run(script, in)
    val out = res.output
    val row = out.select(cols.map { case (n, p) =>
      get_json_object(col(n), p).as(n + p) }: _*).collect().head
    cols.zipWithIndex.map { case ((n, p), i) =>
      (n + p) -> (if (row.isNullAt(i)) null else row.getString(i)) }.toMap
  }

  test("set-then-read through concat uses the set value") {
    val m = run1(
      """set $.a = "alpha";
        |set $.b = $.a & "-suffix";
        |""".stripMargin, ("vars_local", "$.b"))
    assert(m("vars_local$.b") == "alpha-suffix")
  }

  test("JSON-shaped string value falls back to the tree read") {
    // putTagged embeds '{...}' strings as subtrees; the cstr read must
    // go through the tree render, NOT the overlay's raw text — the
    // spaced render then re-embeds as a tree under $.c, so the probe
    // goes inside it
    val m = run1(
      """set $.o = "{\"k\": 1}";
        |set $.c = cstr($.o);
        |""".stripMargin, ("vars_local", "$.o.k"), ("vars_local", "$.c.k"))
    assert(m("vars_local$.o.k") == "1")
    assert(m("vars_local$.c.k") == "1")
  }

  test("conditional set: guard-false rows read the pre-set tree value") {
    val in = Seq(0, 1).toDF("n")
    val res = RainerCompiler.run(
      """set $.x = "init";
        |if $n == 1 then {
        |  set $.x = "one";
        |}
        |set $.y = $.x;
        |""".stripMargin, in)
    val out = res.output.select(col("n"),
      get_json_object(col("vars_local"), "$.y").as("y"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(0 -> "init", 1 -> "one"))
  }

  test("then/else both set: reads after the if see the branch value") {
    val in = Seq(0, 1).toDF("n")
    val res = RainerCompiler.run(
      """if $n == 1 then {
        |  set $.x = "t";
        |} else {
        |  set $.x = "e";
        |}
        |set $.y = $.x & "!";
        |""".stripMargin, in)
    val out = res.output.select(col("n"),
      get_json_object(col("vars_local"), "$.y").as("y"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(0 -> "e!", 1 -> "t!"))
  }

  test("mm action invalidates: read sees the parser's tree, not stale cache") {
    val in = Seq(1).toDF("n")
      .withColumn("msg", lit("""@cee: {"a":"fromjson"}"""))
    val res = graft.rainerscript.RsyslogConfig.parse(
      """set $!a = "before";
        |action(type="mmjsonparse")
        |set $.out = $!a;
        |""".stripMargin).run(in)
    val v = res.output
      .select(get_json_object(col("vars_local"), "$.out")).as[String]
      .collect().head
    assert(v == "fromjson")
  }

  test("prefix overlap: writing the parent invalidates the child overlay") {
    val m = run1(
      """set $.a!b = "leaf";
        |set $.a = "scalar-now";
        |set $.r = cstr($.a!b);
        |set $.s = $.a;
        |""".stripMargin, ("vars_local", "$.r"), ("vars_local", "$.s"))
    // the parent write replaced the subtree; $.a!b no longer exists
    assert(m("vars_local$.r") == null || m("vars_local$.r") == "")
    assert(m("vars_local$.s") == "scalar-now")
  }

  test("numeric set reads back as its string rendering") {
    val m = run1(
      """set $.n = 6 * 7;
        |set $.t = "v=" & $.n;
        |""".stripMargin, ("vars_local", "$.t"))
    assert(m("vars_local$.t") == "v=42")
  }

  test("foreach loop variable reads resolve per element") {
    val in = Seq(("a,b,c", 5)).toDF("s", "n")
    val res = RainerCompiler.run(
      """foreach ($.w in split($s, ",")) do {
        |  set $.last = "saw-" & $.w;
        |}
        |""".stripMargin, in)
    val v = res.output
      .select(get_json_object(col("vars_local"), "$.last")).as[String]
      .collect().head
    assert(v == "saw-c") // last element wins in the collapse
  }

  test("nested $! var reads hit the overlay key (dot-normalized)") {
    val m = run1(
      """set $!a!b = "leaf";
        |set $.out = $!a!b & "!";
        |""".stripMargin, ("vars_local", "$.out"))
    assert(m("vars_local$.out") == "leaf!")
  }

  test("null-valued set reads back as empty string in concat") {
    // cbool of a missing var is null; var2String renders null as ""
    val m = run1(
      """set $.f = cbool($!nope);
        |set $.out = "x" & $.f;
        |""".stripMargin, ("vars_local", "$.out"))
    assert(m("vars_local$.out") == "x")
  }

  test("unset invalidates the overlay") {
    val m = run1(
      """set $.x = "gone";
        |unset $.x;
        |set $.y = cstr($.x) & "|";
        |""".stripMargin, ("vars_local", "$.y"))
    assert(m("vars_local$.y") == "|")
  }
}
