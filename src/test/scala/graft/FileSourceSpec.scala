package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** imfile-lite / omfile round trip through real files — the file-source
  * analogue of the reference's startup→inject→assert testbench pattern.
  */
class FileSourceSpec extends SparkSpec {
  import spark.implicits._

  test("imfile addMetadata: $!metadata!filename and line_number") {
    // tests/imfile-metadata-line-number.sh: each line carries its file
    // and 1-based line number under $!metadata
    val dir = graft.Tmp.dir("graft_imfile_meta")
    val f = dir.resolve("in.log")
    Files.writeString(f, "msgnum:00000000:\nmsgnum:00000001:\nmsgnum:00000002:\n")
    try {
      val cfg = graft.rainerscript.RsyslogConfig.parse(
        s"""module(load="imfile")
           |input(type="imfile" tag="file:" file="${f.toString}" addMetadata="on")
           |template(name="outfmt" type="string" string="%msg:F,58:2% line:%$$!metadata!line_number%")
           |if $$msg contains "msgnum:" then
           |	action(type="omfile" template="outfmt")
           |""".stripMargin)
      val out = cfg.activate(spark)("").actionFrame(0)
        .select("__rendered").collect().map(_.getString(0)).sorted
      assert(out.toSeq == Seq("00000000 line:1", "00000001 line:2", "00000002 line:3"))
      // filename metadata rides too
      val fn = cfg.activate(spark)("").frame
        .select(get_json_object(col("vars_msg"), "$.metadata.filename"))
        .collect().head.getString(0)
      assert(fn != null && fn.endsWith("in.log"))
    } finally {
      Files.deleteIfExists(f); Files.deleteIfExists(dir)
    }
  }

  test("imjournal decode: field mapping, fallbacks, dup-key last-wins") {
    val full = "__REALTIME_TIMESTAMP=1700000000000000\nMESSAGE=hello world\n" +
      "PRIORITY=3\nSYSLOG_FACILITY=10\nSYSLOG_IDENTIFIER=sshd\n" +
      "SYSLOG_PID=42\n_PID=999\n_HOSTNAME=web1\nFOO=first\nFOO=second"
    val fallback = "MESSAGE=from comm\n_COMM=kworker\n_PID=7\nPRIORITY=99\n" +
      "SYSLOG_FACILITY=24"
    val bare = "_TRANSPORT=kernel" // no MESSAGE/iden/pid at all
    val out = Sources.imjournalDecode(Seq(full, fallback, bare).toDF("value"))
      .select("severity", "facility", "syslogtag", "msg", "procid",
        "vars_msg", "ts").collect()
    // full: every explicit field honored, SYSLOG_PID wins over _PID
    assert(out(0).getInt(0) == 3 && out(0).getInt(1) == 10)
    assert(out(0).getString(2) == "sshd[42]:")
    assert(out(0).getString(3) == "hello world")
    assert(out(0).getString(4) == "42")
    assert(out(0).getAs[java.sql.Timestamp]("ts").toInstant.toString
      == "2023-11-14T22:13:20Z")
    // dup key: LAST occurrence wins (fjson object_add replace)
    assert(get_json(out(0).getString(5), "$.FOO") == "second")
    // meta fields stay out of the $! tree; data fields are all in
    assert(get_json(out(0).getString(5), "$.__REALTIME_TIMESTAMP") == null)
    assert(get_json(out(0).getString(5), "$.MESSAGE") == "hello world")
    // fallback: _COMM identifier, _PID pid, out-of-bounds PRIORITY (99)
    // and SYSLOG_FACILITY (24) reset to the notice/user defaults
    assert(out(1).getInt(0) == 5 && out(1).getInt(1) == 1)
    assert(out(1).getString(2) == "kworker[7]:")
    // bare: default "journal" tag without pid, empty message, null ts
    assert(out(2).getString(2) == "journal:")
    assert(out(2).getString(3) == "")
    assert(out(2).get(6) == null)
  }

  test("octet-counted framing round-trips, byte-length for unicode") {
    val msgs = Seq("<13>Mar  1 01:00:00 h t: hi", "plain", "ünïcödé msg")
    val df = msgs.toDF("m")
    val framed = df.select(Sources.frameOctetCounted(col("m")).as("value"))
    val back = Sources.deframeOctetCounted(framed)
      .collect().map(_.getString(0))
    assert(back.toSeq == msgs)
    // the length prefix counts BYTES (RFC6587), not chars
    val uf = framed.collect().map(_.getString(0)).find(_.contains("ünïcödé")).get
    assert(uf.startsWith("ünïcödé msg".getBytes("UTF-8").length + " "))
  }

  test("esBulkFrame: action+doc NDJSON pairs, escaping, create verb") {
    val df = Seq(("idx\"odd", "k1", """{"a":1}"""), ("plain", "k2", """{"b":2}"""))
      .toDF("idx", "id", "doc")
    val bulk = Sources.esBulkFrame(df, "idx", "doc", idCol = Some("id"))
      .collect().map(_.getString(0))
    // index value with a quote is JSON-escaped, not mangled
    assert(bulk(0) == "{\"index\":{\"_index\":\"idx\\\"odd\",\"_id\":\"k1\"}}\n{\"a\":1}")
    assert(bulk(1) == "{\"index\":{\"_index\":\"plain\",\"_id\":\"k2\"}}\n{\"b\":2}")
    val create = Sources.esBulkFrame(df.limit(1), "idx", "doc", create = true)
      .collect()(0).getString(0)
    assert(create.startsWith("{\"create\":{\"_index\":"))
    assert(!create.contains("_id")) // no id column → ES assigns
    // null index/id must not collapse to_json's struct to "{}" (which
    // would splice an empty value into the action line): null index
    // falls back to the ES default index name, null id to ""
    val nulls = Seq((null: String, null: String, """{"c":3}"""))
      .toDF("idx", "id", "doc")
    val nb = Sources.esBulkFrame(nulls, "idx", "doc", idCol = Some("id"))
      .collect()(0).getString(0)
    assert(nb == "{\"index\":{\"_index\":\"system\",\"_id\":\"\"}}\n{\"c\":3}")
  }

  test("imjournal dfltTag with quote/backslash survives codegen") {
    // JournalEntryExpr routes dfltTag through a codegen reference object
    // — a verbatim splice of this tag would produce uncompilable Java
    val out = Sources.imjournalDecode(
      Seq("MESSAGE=hi").toDF("value"), dfltTag = "we\"ird\\tag")
      .select("syslogtag", "msg").collect()(0)
    assert(out.getString(0) == "we\"ird\\tag:")
    assert(out.getString(1) == "hi")
  }

  private def get_json(j: String, path: String): String = {
    val r = Seq(j).toDF("j")
      .select(get_json_object(col("j"), path)).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("file source → decode → template → file sink round trip") {
    val inDir = graft.Tmp.dir("graft_in").toFile
    val outDir = new java.io.File(
      graft.Tmp.dir("graft_out").toFile, "out")
    val lines = (0 until 100).map(i =>
      f"<${8 * (i % 24) + i % 8}%d>Mar  1 01:00:00 host$i%d app[$i%d]: msgnum:$i%08d:")
    Files.write(new java.io.File(inDir, "a.log").toPath,
      String.join("\n", lines: _*).getBytes)

    val decoded = Sources.decodeSyslog(Sources.fileLines(spark, inDir.getAbsolutePath))
    assert(decoded.count() == 100)
    assert(decoded.filter(col("parsesuccess")).count() == 100)
    assert(decoded.filter(col("hostname").startsWith("host")).count() == 100)

    val rendered = decoded.withColumn("line",
      graft.templates.TemplateCompiler.compile(
        "%hostname% %syslogtag%%msg%", col))
    Sources.omfileText(rendered, "line", outDir.getAbsolutePath)
    val back = spark.read.text(outDir.getAbsolutePath)
    assert(back.count() == 100)
    // msg keeps its leading space (reference semantics) -> "]: msgnum"
    assert(back.filter(col("value").rlike("^host\\d+ app\\[\\d+\\]: msgnum:")).count() == 100)
  }

  test("reception sanitize: CR-drop option, control-char octal escaping default") {
    import spark.implicits._
    val lines = Seq("<13>Mar  1 01:00:00 h a: m\r").toDF("value")
    // default: CR kept (drop is opt-in) and escaped #015 (EscapeCCOnRcv=1)
    val kept = Sources.decodeSyslog(lines).collect()(0)
    assert(kept.getAs[String]("msg") == " m#015")
    val dropped = Sources.decodeSyslog(lines, dropTrailingCr = true).collect()(0)
    assert(dropped.getAs[String]("msg") == " m")
    // tab escapes as #011 (snare's wire format under default settings);
    // 8-bit chars pass through (Escape8BitCharacters default off)
    val tab = Seq("<13>Mar  1 01:00:00 h a: x\ty ü").toDF("value")
    val t = Sources.decodeSyslog(tab).collect()(0)
    assert(t.getAs[String]("msg") == " x#011y ü")
    val ccoff = Sources.decodeSyslog(tab, escapeControlCharacters = false).collect()(0)
    assert(ccoff.getAs[String]("msg") == " x\ty ü")
  }

  test("dynafile ≡ partitioned write by computed columns") {
    val outDir = new java.io.File(
      graft.Tmp.dir("graft_dyna").toFile, "part")
    import spark.implicits._
    val df = Seq((0, "err", "m0"), (1, "info", "m1"), (2, "err", "m2"))
      .toDF("id", "sev", "msg")
    Sources.omfilePartitioned(df, outDir.getAbsolutePath, Seq("sev"))
    val dirs = outDir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("sev=err", "sev=info"))
    assert(spark.read.parquet(outDir.getAbsolutePath).count() == 3)
  }

  test("streaming fileTail processes appended files") {
    val inDir = graft.Tmp.dir("graft_stream").toFile
    Files.write(new java.io.File(inDir, "one.log").toPath,
      "<13>Mar  1 01:00:00 h1 a: first\n<13>Mar  1 01:00:00 h2 b: second".getBytes)
    val q = Sources.decodeSyslog(Sources.fileTail(spark, inDir.getAbsolutePath))
      .writeStream.format("memory").queryName("tail_out").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tail_out")
    assert(out.count() == 2)
    assert(out.filter(col("msg") === " first").count() == 1)
  }

  test("omhttp batch shaping: all four formats, parse-drop, order") {
    // three valid messages + one malformed in a single batch, arriving
    // out of id order — the serializers must drop the malformed one for
    // the JSON formats, keep it for newline, and sort by the order col
    val rows = Seq(
      (0L, 3L, """{"n":3}"""),
      (0L, 1L, """{"n":1}"""),
      (0L, 2L, "not json"),
      (0L, 4L, """{"n":4}""")).toDF("b", "id", "m")
    def run(fmt: String): String =
      Sources.omhttpBatch(rows, "m", "b", "id", fmt).collect()(0).getString(1)
    assert(run("newline") == "{\"n\":1}\nnot json\n{\"n\":3}\n{\"n\":4}")
    assert(run("jsonarray") == """[{"n":1},{"n":3},{"n":4}]""")
    assert(run("kafkarest") ==
      """{"records":[{"value":{"n":1}},{"value":{"n":3}},{"value":{"n":4}}]}""")
    assert(run("lokirest") == """{"streams":[{"n":1},{"n":3},{"n":4}]}""")
  }

  test("omjournal frame: field set + decode round trip (PRIORITY quirk)") {
    // kern (facility 0) survives the PRIORITY=(fac*8|sev) quirk intact;
    // a nonzero facility pushes PRIORITY out of 0-7 and imjournal's
    // bounds check then applies its default severity (notice) — exactly
    // what the reference pair does to itself
    val src = Seq((0, 3, "ker: boom", "ktag"), (10, 3, "sec msg", "stag"))
      .toDF("facility", "severity", "msg", "syslogtag")
    val entries = Sources.omjournalFrame(src)
      .select(col("journal_entry").as("value"))
    assert(entries.collect()(0).getString(0) ==
      "MESSAGE=ker: boom\nPRIORITY=3\nSYSLOG_FACILITY=0\nSYSLOG_IDENTIFIER=ktag")
    val rt = Sources.imjournalDecode(entries)
      .select("facility", "severity", "msg", "syslogtag").collect()
    assert(rt(0).getInt(0) == 0 && rt(0).getInt(1) == 3)
    assert(rt(0).getString(2) == "ker: boom")
    assert(rt(0).getString(3) == "ktag:")
    // facility 10 round-trips; PRIORITY=83 is out of bounds → notice
    assert(rt(1).getInt(0) == 10 && rt(1).getInt(1) == 5)
  }

  test("imfile ignoreOlderThan skips stale files (imfile-ignore-old-file.sh)") {
    val dir = graft.Tmp.dir("graft_imfile_old")
    val fresh = dir.resolve("fresh.log")
    val old = dir.resolve("old.log")
    Files.writeString(fresh, "msgnum:new:\n")
    Files.writeString(old, "msgnum:old:\n")
    Files.setLastModifiedTime(old, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600 * 1000L))
    try {
      val cfg = graft.rainerscript.RsyslogConfig.parse(
        s"""module(load="imfile")
           |input(type="imfile" tag="file:" file="${dir.toString}/*.log" ignoreOlderThan="600")
           |action(type="omfile")
           |""".stripMargin)
      val msgs = cfg.activate(spark)("").frame
        .select("msg").collect().map(_.getString(0)).toSeq
      assert(msgs == Seq("msgnum:new:"), msgs.toString)
      // without the param both files read
      val cfg2 = graft.rainerscript.RsyslogConfig.parse(
        s"""module(load="imfile")
           |input(type="imfile" tag="file:" file="${dir.toString}/*.log")
           |action(type="omfile")
           |""".stripMargin)
      assert(cfg2.activate(spark)("").frame.count() == 2)
    } finally {
      Files.deleteIfExists(fresh); Files.deleteIfExists(old)
      Files.deleteIfExists(dir)
    }
  }
}
