package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** omotel OTLP JSON export shaping vs plugins/omotel/otlp_json.c
  * (omotel_json_build_export) — payload structure, attribute skipping,
  * resource-level host.name lift, batch capping. */
class OmotelSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("event_id", "host", "app", "body")
      .withColumn("batch_id", lit(1))
      .withColumn("procid", lit(null).cast("string"))
      .withColumn("msgid", lit(null).cast("string"))
      .withColumn("facility", lit(4))
      .withColumn("severity", lit(3))
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))

  test("single-host payload lifts host.name to resource level; empty attrs skipped") {
    val df = src(Seq((1L, "h1", "app", "hello"), (2L, "h1", "", "world")))
    val out = Sources.omotelExport(df, "body", "host", "app", "procid",
      "msgid", "facility", "severity", "ts", None, "batch_id", "event_id")
      .collect()
    assert(out.length == 1)
    val payload = out(0).getAs[String]("payload")
    // resource-level host.name present (both records h1)
    assert(payload.contains(
      "{ \"key\": \"host.name\", \"value\": { \"stringValue\": \"h1\" } }"))
    // empty appname on record 2 skipped (add_string_attribute returns
    // early on empty, otlp_json.c:125-127); facility always present
    assert(payload.split("log.syslog.appname").length == 2)
    assert(payload.split("log.syslog.facility").length == 3)
    // procid/msgid null → absent entirely
    assert(!payload.contains("log.syslog.procid"))
    // severity 3 → ERROR/17 (severity_lookup omotel.c:498-500)
    assert(payload.contains("\"severityNumber\": 17"))
    assert(payload.contains("\"severityText\": \"ERROR\""))
    // proto3 JSON: fixed64 timestamps are STRINGS
    assert(payload.contains("\"timeUnixNano\": \"1704067200000000000\""))
    assert(!payload.contains("observedTimeUnixNano"))
  }

  test("mixed-host payload keeps hostname per-record only") {
    val df = src(Seq((1L, "h1", "a", "x"), (2L, "h2", "a", "y")))
    val payload = Sources.omotelExport(df, "body", "host", "app", "procid",
      "msgid", "facility", "severity", "ts", None, "batch_id", "event_id")
      .collect()(0).getAs[String]("payload")
    assert(!payload.contains("host.name"))
    assert(payload.contains(
      "{ \"key\": \"log.syslog.hostname\", \"value\": { \"stringValue\": \"h1\" } }"))
    assert(payload.contains(
      "{ \"key\": \"log.syslog.hostname\", \"value\": { \"stringValue\": \"h2\" } }"))
  }

  test("observedTimeUnixNano emitted when a received-time column is given") {
    val df = src(Seq((1L, "h1", "a", "x")))
      .withColumn("rcvd", to_timestamp(lit("2024-01-01 00:00:01")))
    val payload = Sources.omotelExport(df, "body", "host", "app", "procid",
      "msgid", "facility", "severity", "ts", Some("rcvd"), "batch_id",
      "event_id").collect()(0).getAs[String]("payload")
    assert(payload.contains(
      "\"observedTimeUnixNano\": \"1704067201000000000\""))
  }

  test("batch.max_items caps payloads; records stay in order") {
    val df = src((1L to 7L).map(i => (i, "h1", "a", s"m$i")))
    val out = Sources.omotelExport(df, "body", "host", "app", "procid",
      "msgid", "facility", "severity", "ts", None, "batch_id", "event_id",
      maxItems = 3).orderBy("chunk").collect()
    assert(out.map(_.getAs[Long]("n_records")).toSeq == Seq(3L, 3L, 1L))
    val p0 = out(0).getAs[String]("payload")
    assert(p0.indexOf("m1") < p0.indexOf("m2") &&
      p0.indexOf("m2") < p0.indexOf("m3"))
    // every payload is a whole well-formed document
    out.foreach(r => assert(r.getAs[String]("payload")
      .startsWith("{ \"resourceLogs\": [ ")))
  }

  test("json-c escaping in body and payload parses as valid JSON") {
    val df = src(Seq((1L, "h1", "a", "quote \" backslash \\ tab\tend")))
    val payload = Sources.omotelExport(df, "body", "host", "app", "procid",
      "msgid", "facility", "severity", "ts", None, "batch_id", "event_id")
      .collect()(0).getAs[String]("payload")
    assert(payload.contains("quote \\\" backslash \\\\ tab\\tend"))
    val tree = graft.functions.JsonPathUtil.mapper.readTree(payload)
    assert(tree.path("resourceLogs").get(0).path("scopeLogs").get(0)
      .path("logRecords").get(0).path("body").path("stringValue")
      .asText() == "quote \" backslash \\ tab\tend")
  }
}
