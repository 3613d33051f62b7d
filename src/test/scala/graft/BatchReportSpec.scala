package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** imbatchreport whole-file shaping vs contrib/imbatchreport/
  * imbatchreport.c readAndSendFile (:240-370): trailing-ws trim, the
  * 150-byte backward SD scan, timestampkey/programkey extraction,
  * dedupspace body rewrite, \n → literal \\n, too-large replacement,
  * and the input(type="imbatchreport") config binding.
  */
class BatchReportSpec extends SparkSpec {
  import spark.implicits._

  private def decode(text: String, dedup: Boolean = true,
                     maxMsg: Int = 8096) = {
    val df = Seq(("/spool/r1.rpt", text)).toDF("path", "value")
    Sources.imbatchreportDecode(df, tag = "batch:",
      programKey = "program=\"", timestampKey = "ts=\"",
      maxMsgSize = maxMsg, dedupSpace = dedup,
      now = to_timestamp(lit("2024-01-01 00:00:00")))
      .select("msg", "structured_data", "ts_epoch", "app_name", "too_large")
      .collect()(0)
  }

  test("SD extracted from the file tail; program and timestamp keys") {
    val r = decode("job output line\n[x@1 program=\"pay\" ts=\"1700000099\"]\n\n")
    assert(r.getString(0) == "job output line")
    assert(r.getString(1) == "[x@1 program=\"pay\" ts=\"1700000099\"]")
    assert(r.getLong(2) == 1700000099L)
    assert(r.getString(3) == "pay")
    assert(!r.getBoolean(4))
  }

  test("no ] at trimmed end: whole body, SD '-', app name from the tag") {
    val r = decode("plain report  body\n")
    assert(r.getString(0) == "plain report body") // dedupspace collapse
    assert(r.getString(1) == "-")
    assert(r.isNullAt(2))
    assert(r.getString(3) == "batch") // programName("batch:")
  }

  test("embedded LF inside SD is removed (imbatchreport.c:268-273)") {
    val r = decode("body\n[k@1 a=\"1\"\n b=\"2\"]")
    assert(r.getString(1) == "[k@1 a=\"1\" b=\"2\"]")
    assert(r.getString(0) == "body")
  }

  test("newlines in body become the two chars \\n; pending space dropped") {
    val r = decode("line one \nline two\n")
    assert(r.getString(0) == "line one\\nline two")
  }

  test("dedupspace off keeps runs; tabs still map to spaces") {
    val r = decode("a  b\tc", dedup = false)
    assert(r.getString(0) == "a  b c")
  }

  test("[ beyond the 150-byte tail window is NOT structured data") {
    // ']' at the end but its '[' sits > 150 bytes back → no SD
    val r = decode("[" + ("y" * 200) + "]")
    assert(r.getString(1) == "-")
    assert(r.getString(0).startsWith("[yyy"))
  }

  test("over-cap body is replaced by the too-large message, SD kept") {
    val r = decode(("z" * 100) + "\n[k@1 ts=\"17\"]", maxMsg = 64)
    assert(r.getString(0) == "File too large : /spool/r1.rpt")
    assert(r.getString(1) == "[k@1 ts=\"17\"]")
    assert(r.getLong(2) == 17L)
    assert(r.getBoolean(4))
  }

  test("input(type=\"imbatchreport\") binds a feed and routes its ruleset") {
    val feed = Seq(
      (1L, "/spool/a.rpt", "ok run  done\n[r@1 program=\"etl\" ts=\"1700000001\"]\n"),
      (2L, "/spool/b.rpt", "failed\n"))
      .toDF("id", "path", "value")
    val conf =
      """module(load="imbatchreport")
        |ruleset(name="br") {
        |  if $app-name == "etl" then { action(type="omfile" file="/etl.log") }
        |}
        |input(type="imbatchreport" tag="batch:" programkey="program=\""
        |      timestampkey="ts=\"" ruleset="br")
        |""".stripMargin
    val cfg = graft.rainerscript.RsyslogConfig.parse(conf)
    val res = cfg.activate(spark, feeds = Map("imbatchreport" -> feed),
      now = to_timestamp(lit("2024-01-01 00:00:00")))("br")
    val rows = res.output.orderBy("id")
      .select("id", "msg", "structured_data", "app_name", "syslogtag")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "ok run done")
    assert(rows(0).getString(2) == "[r@1 program=\"etl\" ts=\"1700000001\"]")
    assert(rows(0).getString(3) == "etl")
    assert(rows(1).getString(1) == "failed")
    assert(rows(1).getString(2) == "-")
    assert(rows.forall(_.getString(4) == "batch:"))
    // the SD timestamp override reached the message's ts
    val ts = res.output.filter(col("id") === 1)
      .select(unix_timestamp(col("ts"))).as[Long].head()
    assert(ts == 1700000001L)
  }
}
