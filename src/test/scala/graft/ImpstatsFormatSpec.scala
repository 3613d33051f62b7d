package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.StatsNameUtil
import graft.sources.Impstats

/** impstats output-format family (runtime/statsobj.c renderers +
  * plugins/impstats/impstats.c zabbix grouping): the U__ Prometheus
  * metric-name encoding, HELP escaping, json-c SPACED stat lines with
  * the ES dot→bang rename, and the zabbix group-key ladder.
  */
class ImpstatsFormatSpec extends SparkSpec {
  import spark.implicits._

  private def enc(s: String): String =
    StatsNameUtil.promNameKernel(UTF8String.fromString(s)).toString

  test("prom name: legacy-safe passes through; U__ prefix is reserved") {
    assert(enc("imuxsock_submitted_total") == "imuxsock_submitted_total")
    assert(enc("A:b_9") == "A:b_9")
    // a name that ALREADY starts U__ must be re-encoded (reserved prefix)
    assert(enc("U__x") == "U__U____x")
    // leading digit is not legacy-safe
    assert(enc("9lives") == "U__9lives")
  }

  test("prom name: U__ encoding — underscores doubled, others hex") {
    assert(enc("events.page_view_submitted_total") ==
      "U__events_2E_page__view__submitted__total")
    assert(enc("resource-usage_utime_total") ==
      "U__resource_2D_usage__utime__total")
    // multi-byte codepoint: 'é' = U+E9
    assert(enc("café_total") == "U__caf_E9___total") // _E9_ then doubled _
    // invalid UTF-8 byte takes the _x%02X_ byte form
    val bad = UTF8String.fromBytes(Array[Byte]('a', 0xff.toByte, '.', 'b'))
    assert(StatsNameUtil.promNameKernel(bad).toString == "U__a_xFF__2E_b")
  }

  test("prom HELP escaping: backslash, quote, newline") {
    val esc = (s: String) =>
      StatsNameUtil.promHelpKernel(UTF8String.fromString(s)).toString
    assert(esc("a\"b\\c\nd") == "a\\\"b\\\\c\\nd")
    assert(esc("plain") == "plain")
  }

  test("stat lines: SPACED json, ES rename only touches counter names") {
    val df = Seq(("events.click", 5L, 2L)).toDF("name", "sub", "dis")
    val ctrs = Seq("submitted" -> col("sub"), "ratelimit.discarded" -> col("dis"))
    val r = df.select(
      Impstats.legacyLine(col("name"), "imfile", ctrs).as("legacy"),
      Impstats.jsonLine(col("name"), "imfile", ctrs).as("json"),
      Impstats.jsonLine(col("name"), "imfile", ctrs, esNames = true).as("es"),
      Impstats.ceeLine(col("name"), "imfile", ctrs).as("cee")).head()
    assert(r.getString(0) ==
      "events.click: origin=imfile submitted=5 ratelimit.discarded=2 ")
    assert(r.getString(1) ==
      "{ \"name\": \"events.click\", \"origin\": \"imfile\", \"submitted\": 5, \"ratelimit.discarded\": 2 }")
    assert(r.getString(2).contains("\"ratelimit!discarded\": 2"))
    assert(r.getString(2).contains("\"name\": \"events.click\"")) // untouched
    assert(r.getString(3).startsWith("@cee: { \"name\""))
  }

  test("prometheus block: HELP/TYPE/sample lines, encoded metric") {
    val df = Seq(("events.click", 7L)).toDF("name", "v")
    val b = df.select(Impstats.prometheusBlock(col("name"), "imfile",
      "submitted", col("v"))).as[String].head()
    val m = "U__events_2E_click__submitted__total"
    assert(b ==
      s"# HELP $m rsyslog stats: origin=\"imfile\" object=\"events.click\", counter=\"submitted\"\n" +
      s"# TYPE $m counter\n" + s"$m 7\n")
  }

  test("zabbix key ladder: remap, dual-origin split, sanitize") {
    val df = Seq(
      ("core.action", "action 8 omkafka"),   // remap
      ("omkafka", "omkafka"),                // dual global
      ("omkafka", "topic-a"),                // dual local
      ("imtcp", "imtcp"),                    // dual global
      ("core.queue", "main Q"),              // sanitize '.'
      ("imfile", "file1")                    // plain
    ).toDF("origin", "name")
    val keys = df.select(Impstats.zabbixKey(col("origin"), col("name")))
      .as[String].collect().toSeq
    assert(keys == Seq("stats_omkafka_local", "stats_omkafka_global",
      "stats_omkafka_local", "stats_imtcp_global", "stats_core_queue",
      "stats_imfile"))
  }

  test("zabbix snapshot: group first-seen order, lines in walk order") {
    val df = Seq(
      (0L, "imfile", "f1", "{ \"name\": \"f1\" }"),
      (1L, "omkafka", "omkafka", "{ \"name\": \"omkafka\" }"),
      (2L, "imfile", "f2", "{ \"name\": \"f2\" }"),
      (3L, "omkafka", "t1", "{ \"name\": \"t1\" }")
    ).toDF("ord", "origin", "name", "line")
      .withColumn("td", to_timestamp(lit("2024-03-01 12:00:00")))
    val snap = Impstats.zabbixSnapshot(df, col("line"), col("origin"),
      col("name"), col("ord"), col("td")).as[String].head()
    val td = java.time.format.DateTimeFormatter
      .ofPattern("EEE MMM dd HH:mm:ss yyyy")
      .format(java.time.LocalDateTime.parse("2024-03-01T12:00:00"))
    assert(snap ==
      s"""{ "timedate": "$td", "stats_imfile": [{ "name": "f1" },{ "name": "f2" }], "stats_omkafka_global": [{ "name": "omkafka" }], "stats_omkafka_local": [{ "name": "t1" }]}""")
  }
}
