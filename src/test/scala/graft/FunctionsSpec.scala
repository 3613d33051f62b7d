package graft

import org.apache.spark.sql.functions._
import graft.functions.{rainer, PriFilt, PosixRegex}
import graft.operators._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  test("field() returns sentinel out of range") {
    assert(one[String](rainer.field(lit("a,b,c"), ",", 2)) == "b")
    assert(one[String](rainer.field(lit("a,b,c"), ",", 9)) == rainer.FieldNotFound)
  }

  test("num2ipv4 bounds and roundtrip") {
    assert(one[String](rainer.num2ipv4(lit(0L))) == "0.0.0.0")
    assert(one[String](rainer.num2ipv4(lit(4294967295L))) == "255.255.255.255")
    assert(one[String](rainer.num2ipv4(lit(4294967296L))) == "-1")
    assert(one[String](rainer.num2ipv4(lit(-5L))) == "-1")
    assert(one[Long](rainer.ipv42num(lit("10.1.2.3"))) == 167838211L)
  }

  test("is_in_subnet v4 and v6") {
    assert(one[Boolean](rainer.is_in_subnet(lit("10.1.2.3"), "10.0.0.0/8")))
    assert(!one[Boolean](rainer.is_in_subnet(lit("11.1.2.3"), "10.0.0.0/8")))
    assert(one[Boolean](rainer.is_in_subnet(lit("192.168.1.7"), "192.168.1.0/29")))
    assert(!one[Boolean](rainer.is_in_subnet(lit("192.168.1.9"), "192.168.1.0/29")))
    assert(one[Boolean](rainer.is_in_subnet(lit("2001:db8::1"), "2001:db8::/32")))
    assert(!one[Boolean](rainer.is_in_subnet(lit("2001:db9::1"), "2001:db8::/32")))
    assert(!one[Boolean](rainer.is_in_subnet(lit("garbage"), "10.0.0.0/8")))
  }

  test("json_set/unset/exists/merge/unflatten") {
    assert(one[String](rainer.json_set(lit("{}"), "a!b", lit(5L)))
      == """{"a":{"b":5}}""")
    assert(one[String](rainer.json_set(lit("""{"a":{"b":1}}"""), "a!c", lit("x")))
      == """{"a":{"b":1,"c":"x"}}""")
    assert(one[String](rainer.json_unset(lit("""{"a":{"b":1,"c":2}}"""), "a!b"))
      == """{"a":{"c":2}}""")
    assert(one[Boolean](rainer.json_exists(lit("""{"a":{"b":null}}"""), "a!b")))
    assert(!one[Boolean](rainer.json_exists(lit("""{"a":1}"""), "b")))
    assert(one[String](rainer.json_merge(lit("""{"a":{"x":1},"k":0}"""),
      lit("""{"a":{"y":2}}"""))) == """{"a":{"x":1,"y":2},"k":0}""")
    assert(one[String](rainer.unflatten(lit("""{"a.b":1,"a.c":"z","d":2}"""), "."))
      == """{"a":{"b":1,"c":"z"},"d":2}""")
    // embedding a JSON-object string value as subtree
    assert(one[String](rainer.json_set(lit("{}"), "j", lit("""{"k":1}""")))
      == """{"j":{"k":1}}""")
  }

  test("json_render: json-c SPACED form, scalars raw, nulls") {
    val t = """{"a":1,"s":"x\"y","o":{"b":[1,{"c":2}],"e":{},"ar":[]},"n":null,"f":1.5,"t":true}"""
    assert(one[String](rainer.json_render(lit(t), "")) ==
      """{ "a": 1, "s": "x\"y", "o": { "b": [ 1, { "c": 2 } ], "e": {}, "ar": [] }, "n": null, "f": 1.5, "t": true }""")
    assert(one[String](rainer.json_render(lit(t), "o!b")) == """[ 1, { "c": 2 } ]""")
    assert(one[String](rainer.json_render(lit(t), "s")) == "x\"y")   // string: bare
    assert(one[String](rainer.json_render(lit(t), "a")) == "1")
    assert(one[String](rainer.json_render(lit(t), "t")) == "true")
    assert(one[String](rainer.json_render(lit(t), "n")) == null)     // JSON null → SQL null
    assert(one[String](rainer.json_render(lit(t), "zz")) == null)    // missing → SQL null
    assert(one[String](rainer.json_render(lit("{}"), "")) == "{}")
    // control chars: json-c short forms + lowercase \u00xx
    assert(one[String](rainer.json_render(lit("{\"c\":\"a\\u0001\\nb\"}"), "")) ==
      "{ \"c\": \"a\\u0001\\nb\" }")
  }

  test("prifilt mask compilation") {
    val m = PriFilt.compile("mail.info")
    assert(m(2) == 0x7F) // info and more severe = sev 0..6
    assert(m(0) == 0)
    assert(PriFilt.compile("*.=err")(5) == 8)
    assert(PriFilt.compile("mail.*;mail.!=info")(2) == (0xFF & ~(1 << 6)))
    assert(PriFilt.compile("*.err;mail.none")(2) == 0)
    assert(PriFilt.compile("mail,news.=warning")(7) == 16)
  }

  test("prifilt standalone negated selector starts from ALLPRI (issue #1030)") {
    // tests/rscript_prifilt_negated_exact.sh: a STANDALONE local4.!=debug
    // means "all local4 except debug" (DecodePRIFilter pre-fills an empty
    // facility mask before clearing, runtime/conf.c:430-470)…
    val standalone = PriFilt.compile("local4.!=debug")
    assert(standalone(20) == (0xFF & ~(1 << 7)))
    assert(standalone(2) == 0) // other facilities untouched
    // …but in a compound line the second exclusion must NOT reset what the
    // first built: local4.!=info;local4.!=debug blocks info AND debug.
    val compound = PriFilt.compile("local4.!=info;local4.!=debug")
    assert(compound(20) == (0xFF & ~(1 << 6) & ~(1 << 7)))
    // negated RANGE likewise pre-fills: !err clears err-and-more-severe
    assert(PriFilt.compile("local4.!err")(20) == (0xFF & ~0x0F))
    // !none = ALLPRI reset; none = NOPRI reset (DecodePRIFilter INTERNAL_NOPRI arm)
    assert(PriFilt.compile("mail.!none")(2) == 0xFF)
    assert(PriFilt.compile("mail.err;mail.none")(2) == 0)
  }

  test("rs comparison coercion") {
    assert(one[Boolean](rainer.rs_eq(lit("010"), lit(10L))))  // numeric
    assert(!one[Boolean](rainer.rs_eq(lit("abc"), lit("10"))))
    assert(one[Boolean](rainer.rs_gt(lit("87"), lit("9"))))   // numeric, not lexicographic
    assert(one[Boolean](rainer.rs_lt(lit("a87"), lit("a9")))) // strcmp fallback
  }

  test("POSIX ERE classes translate and match") {
    assert(PosixRegex.translate("[[:digit:]]+") == "[\\d]+")
    assert(PosixRegex.translate("^[[:alpha:]_][[:alnum:]_]*$")
      == "^[\\p{Alpha}_][\\p{Alnum}_]*$")
    assert(PosixRegex.translate("[^[:space:]]") == "[^\\s]")
    assert(PosixRegex.translate("[]a]") == "[]a]") // literal ] first
    assert(PosixRegex.translate("plain(a|b){2,3}") == "plain(a|b){2,3}")
    assert(one[Boolean](rainer.re_match(lit("abc123"), "[[:alpha:]]+[[:digit:]]+")))
    assert(!one[Boolean](rainer.re_match(lit("!!"), "[[:alnum:]]+")))
    assert(one[String](rainer.re_extract(lit("v=42;"), "v=([[:digit:]]+)", 1, "NA")) == "42")
    assert(one[String](rainer.re_extract(lit("nope"), "v=([[:digit:]]+)", 1, "NA")) == "NA")
    // occurrence selection (rsyslog's `match` arg): 0-based Nth match
    assert(one[String](rainer.re_extract(lit("a=1 b=2 c=3"),
      "[[:alpha:]]=([[:digit:]])", 1, 1, "NA")) == "2")
    assert(one[String](rainer.re_extract(lit("a=1 b=2 c=3"),
      "[[:alpha:]]=([[:digit:]])", 2, 1, "NA")) == "3")
    assert(one[String](rainer.re_extract(lit("a=1"),
      "[[:alpha:]]=([[:digit:]])", 5, 1, "NA")) == "NA")
  }

  test("wrap/ltrim/substring 0-based") {
    assert(one[String](rainer.wrap(lit("v"), "'")) == "'v'")
    assert(one[String](rainer.wrap(lit("a'b"), "'", "_")) == "'a_b'")
    assert(one[String](rainer.rs_substring(lit("hello"), 1, 3)) == "ell")
  }

  test("format_time / parse_time roundtrip") {
    assert(one[String](rainer.format_time(lit(1709254923L), "date-rfc3339"))
      == "2024-03-01T01:02:03+00:00")
    assert(one[String](rainer.format_time(lit(1709254923L), "date-rfc3164"))
      == "Mar  1 01:02:03")
    assert(one[Long](rainer.parse_time(lit("2024-03-01T01:02:03+00:00"))) == 1709254923L)
    assert(one[Long](rainer.parse_time(lit("Mar  1 01:02:03"), 2024)) == 1709254923L)
    // non-zero offsets honored (parseTIMESTAMP3339): same instant, +05:00 wall time
    assert(one[Long](rainer.parse_time(lit("2024-03-01T06:02:03+05:00"))) == 1709254923L)
    assert(one[Long](rainer.parse_time(lit("2024-02-29T20:02:03-05:00"))) == 1709254923L)
    assert(one[Long](rainer.parse_time(lit("2024-03-01T01:02:03Z"))) == 1709254923L)
    // fractional seconds accepted, truncated to whole epoch seconds
    assert(one[Long](rainer.parse_time(lit("2024-03-01T01:02:03.123456+00:00"))) == 1709254923L)
    assert(one[Long](rainer.parse_time(lit("2024-03-01T06:02:03.5+05:00"))) == 1709254923L)
  }

  test("simhash64 similar inputs have small hamming distance") {
    val h = Seq(
      ("a b c d e f g h i j k l m n o p"),
      ("a b c d e f g h i j k l m n o q"),  // one token differs
      ("z y x w v u t s r q p o n m l k")   // all differ
    ).toDF("t")
      .select(rainer.simhash64(split(col("t"), " ")).as("h"))
      .collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) < 16)
    assert(ham(h(0), h(2)) > ham(h(0), h(1)))
  }

  test("winnow fingerprint overlap detects shared content") {
    val fps = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "the quick brown fox jumps over the lazy dog near the mountain top now",
      "completely different content with zero overlap whatsoever in any form"
    ).toDF("t").select(rainer.winnow_fingerprint(col("t"), 5, 4).as("fp"))
      .collect().map(_.getSeq[Long](0).toSet)
    val overlapSimilar = fps(0).intersect(fps(1)).size.toDouble / fps(0).union(fps(1)).size
    val overlapDifferent = fps(0).intersect(fps(2)).size.toDouble / fps(0).union(fps(2)).size
    assert(overlapSimilar > 0.3)
    assert(overlapDifferent < 0.05)
    // deterministic across invocations
    val again = Seq("the quick brown fox jumps over the lazy dog near the river bank today")
      .toDF("t").select(rainer.winnow_fingerprint(col("t"), 5, 4).as("fp"))
      .collect()(0).getSeq[Long](0).toSet
    assert(again == fps(0))
  }

  test("lookup table types") {
    val sj = """{"version":1,"nomatch":"NA","type":"string","table":[
      {"index":"a","value":"1"},{"index":"b","value":"2"}]}"""
    val t1 = LookupTable.loadString(sj)
    assert(one[String](t1.probe(lit("a"))) == "1")
    assert(one[String](t1.probe(lit("zz"))) == "NA")

    val t2 = LookupTable.loadString("""{"nomatch":"NX","type":"sparseArray","table":[
      {"index":0,"value":"low"},{"index":100,"value":"high"}]}""")
    assert(one[String](t2.probe(lit(5L))) == "low")
    assert(one[String](t2.probe(lit(100L))) == "high")
    assert(one[String](t2.probe(lit(-1L))) == "NX")

    val t3 = LookupTable.loadString("""{"nomatch":"-","type":"regex","table":[
      {"index":"^a.*","value":"A"},{"index":".*b$","value":"B"}]}""")
    assert(one[String](t3.probe(lit("ab"))) == "A") // first match wins
    assert(one[String](t3.probe(lit("cb"))) == "B")
    assert(one[String](t3.probe(lit("xx"))) == "-")

    val t4 = LookupTable.loadString("""{"nomatch":"n","type":"array","table":[
      {"index":10,"value":"x"},{"index":11,"value":"y"}]}""")
    assert(one[String](t4.probe(lit(11L))) == "y")
    assert(one[String](t4.probe(lit(12L))) == "n")
  }
}
