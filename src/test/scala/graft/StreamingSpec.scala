package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Stateful
import graft.streaming.Stateful._

/** Structured-Streaming stateful operators driven by MemoryStream —
  * the tcpflood/chkseq e2e pattern from the reference testbench
  * (FIXTURES.md §1): inject sequenced messages, assert exact delivery.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def runToCompletion[T](q: org.apache.spark.sql.streaming.DataStreamWriter[T],
                                 name: String): Unit = {
    val query = q.queryName(name).outputMode(OutputMode.Append)
      .format("memory").start()
    query.processAllAvailable()
    query.stop()
  }

  test("token-bucket ratelimit: burst passes, rest dropped, window resets") {
    val in = MemoryStream[RlInput]
    // 5 msgs in window 0, 2 msgs in window 1 (interval 1000ms, burst 2)
    in.addData(
      RlInput("k1", 100, "a"), RlInput("k1", 200, "b"), RlInput("k1", 300, "c"),
      RlInput("k1", 400, "d"), RlInput("k1", 500, "e"),
      RlInput("k1", 1100, "f"), RlInput("k1", 1200, "g"),
      RlInput("k2", 150, "z"))
    runToCompletion(
      Stateful.rateLimit(in.toDS(), intervalMillis = 1000, burst = 2).writeStream,
      "rl_out")
    val out = spark.table("rl_out").as[RlOutput].collect()
    assert(out.filter(_.key == "k1").map(_.payload).sorted.toSeq ==
      Seq("a", "b", "f", "g"))
    assert(out.filter(_.key == "k2").map(_.payload).toSeq == Seq("z"))
  }

  test("ratelimit state persists across micro-batches") {
    val in = MemoryStream[RlInput]
    in.addData(RlInput("k", 100, "a"))
    val query = Stateful.rateLimit(in.toDS(), 1000, 2).writeStream
      .queryName("rl_mb").outputMode(OutputMode.Append).format("memory").start()
    query.processAllAvailable()
    in.addData(RlInput("k", 200, "b"), RlInput("k", 300, "c")) // same window
    query.processAllAvailable()
    query.stop()
    // burst=2 across batches: a (batch1), b (batch2), c dropped
    assert(spark.table("rl_mb").as[RlOutput].collect().map(_.payload).sorted.toSeq
      == Seq("a", "b"))
  }

  test("ratelimit: out-of-order timestamps cannot refill the bucket") {
    val in = MemoryStream[RlInput]
    // batch 1 exhausts window 1's budget (interval 1000, burst 2)
    in.addData(RlInput("k", 1100, "a"), RlInput("k", 1200, "b"), RlInput("k", 1300, "c"))
    val query = Stateful.rateLimit(in.toDS(), 1000, 2).writeStream
      .queryName("rl_ooo").outputMode(OutputMode.Append).format("memory").start()
    query.processAllAvailable()
    // batch 2 regresses to window 0, then returns to window 1: neither the
    // backwards move nor the return may reset the window-1 bucket
    in.addData(RlInput("k", 100, "late"), RlInput("k", 1400, "d"))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("rl_ooo").as[RlOutput].collect().map(_.payload).toSet
    assert(out == Set("a", "b")) // c over budget; late + d count against stored window
  }

  test("dynstats maxCardinality and overflow") {
    val in = MemoryStream[DynInput]
    in.addData(
      DynInput("b", "k1", 1000), DynInput("b", "k1", 1001),
      DynInput("b", "k2", 1002), DynInput("b", "k3", 1003),
      DynInput("b", "k4", 1004)) // cap 3 → k4 overflows
    runToCompletion(
      Stateful.dynStats(in.toDS(), maxCardinality = 3,
        unusedMetricLifeMillis = 1000000).writeStream, "dyn_out")
    val out = spark.table("dyn_out").as[DynSnapshot].collect()
      .map(s => s.metric -> s.value).toMap
    assert(out("k1") == 2 && out("k2") == 1 && out("k3") == 1)
    assert(out("ops_overflow") == 1)
    assert(!out.contains("k4"))
  }

  test("dynstats digests one bucket's input with full task parallelism") {
    import spark.implicits._
    // 10k rows of ONE bucket spread over 8 partitions: the map-side
    // digest (the stage that replaced the raw-row funnel into the single
    // state task) must run per-partition — i.e. each of the 8 tasks
    // contributes its own partial for the hot key, and only those 8
    // digest rows reach the per-bucket state task.
    val rows = (0 until 10000).map(i =>
      DynInput("hot", s"k${i % 4}", 1000L + i))
    val partials = spark.createDataset(rows).repartition(8)
      .mapPartitions(Stateful.digestPartition _)
      .collect()
    val hotKey = partials.filter(p => p.bucket == "hot" && p.key == "k0")
    assert(hotKey.length > 1, "expected >1 task to digest the hot bucket")
    assert(hotKey.length <= 8)
    // partials merge back to exact row-level counts and arrival bounds
    assert(hotKey.map(_.n).sum == 2500)
    assert(hotKey.map(_.firstTs).min == 1000L)
    assert(partials.filter(_.key == "k3").map(_.lastTs).max == 1000L + 9999)
    assert(partials.map(_.n).sum == 10000)
  }

  test("perctile ring buffer window") {
    val in = MemoryStream[PctInput]
    in.addData((1 to 10).map(i => PctInput("b", "lat", i * 10L)): _*)
    runToCompletion(
      Stateful.perctileStats(in.toDS(), windowSize = 5).writeStream, "pct_out")
    val out = spark.table("pct_out").as[PctSnapshot].collect()
    val last = out.last
    // ring keeps last 5 observations: 60..100
    assert(last.window_count == 5)
    assert(last.window_min == 60 && last.window_max == 100)
    assert(last.window_sum == 60 + 70 + 80 + 90 + 100)
    assert(last.p50 == 80)
  }

  private def ml(key: String, seq: Long, line: String) =
    MlInput(key, seq, line, new java.sql.Timestamp((100 + seq) * 1000L))

  test("multiline assembly via startmsg regex") {
    val in = MemoryStream[MlInput]
    in.addData(
      ml("f", 0, "2024-01-01 start of record one"),
      ml("f", 1, "  continuation A"),
      ml("f", 2, "  continuation B"),
      ml("f", 3, "2024-01-02 record two"),
      ml("f", 4, "  tail"),
      ml("f", 5, "2024-01-03 record three (pending, not emitted)"))
    runToCompletion(
      Stateful.multiline(in.toDS(), "^\\d{4}-\\d{2}-\\d{2} ").writeStream, "ml_out")
    val out = spark.table("ml_out").as[MlOutput].collect().sortBy(_.startSeq)
    assert(out.length == 2)
    assert(out(0).record ==
      "2024-01-01 start of record one\n  continuation A\n  continuation B")
    assert(out(1).record == "2024-01-02 record two\n  tail")
  }

  test("multiline endmsg.regex completes a record including the end line") {
    val in = MemoryStream[MlInput]
    in.addData(
      ml("f", 0, "{"), ml("f", 1, "  \"a\": 1,"), ml("f", 2, "}"),
      ml("f", 3, "{"), ml("f", 4, "}"),
      ml("f", 5, "orphan pending"))
    runToCompletion(
      Stateful.imfileMultiline(in.toDS(), None, Some("^\\}"),
        escapeLF = false).writeStream, "ml_end")
    val out = spark.table("ml_end").as[MlOutput].collect().sortBy(_.startSeq)
    assert(out.map(_.record).toSeq == Seq("{\n  \"a\": 1,\n}", "{\n}"))
  }

  test("multiline maxMsgSize splits oversize records; discard drops remainder") {
    val in = MemoryStream[MlInput]
    in.addData(
      ml("f", 0, "START " + "x" * 20),
      ml("f", 1, "y" * 30), // crosses maxMsgSize=32 → truncated emit
      ml("f", 2, "START next"))
    runToCompletion(
      Stateful.imfileMultiline(in.toDS(), Some("^START"), None,
        maxMsgSize = 32).writeStream, "ml_trunc")
    val out = spark.table("ml_trunc").as[MlOutput].collect().sortBy(_.startSeq)
    // record 1 = 26 chars + sep(2) = 28, keep 32-28=4 chars of the y-line;
    // remainder (26 y's) becomes its own pending record, flushed by START
    assert(out.length == 2)
    assert(out(0).record == "START " + "x" * 20 + "\\n" + "y" * 4)
    assert(out(1).record == "y" * 26)
    // discardTruncatedMsg: remainder is dropped instead
    val in2 = MemoryStream[MlInput]
    in2.addData(
      ml("f", 0, "START " + "x" * 20),
      ml("f", 1, "y" * 30),
      ml("f", 2, "START next"))
    runToCompletion(
      Stateful.imfileMultiline(in2.toDS(), Some("^START"), None,
        maxMsgSize = 32, discardTruncatedMsg = true).writeStream, "ml_disc")
    val out2 = spark.table("ml_disc").as[MlOutput].collect().sortBy(_.startSeq)
    assert(out2.length == 1)
    assert(out2(0).record == "START " + "x" * 20 + "\\n" + "y" * 4)
  }

  test("multiline maxMsgSize clamps a single oversize line and the keep=0 join") {
    // a SINGLE line longer than maxMsgSize is truncated at construction
    // (imfile caps every record), not stored and emitted whole
    val in = MemoryStream[MlInput]
    in.addData(
      ml("f", 0, "START " + "x" * 40), // 46 chars > 32
      ml("f", 1, "START next"))
    runToCompletion(
      Stateful.imfileMultiline(in.toDS(), Some("^START"), None,
        maxMsgSize = 32).writeStream, "ml_clamp1")
    val out = spark.table("ml_clamp1").as[MlOutput].collect().sortBy(_.startSeq)
    // 32-char head emits immediately; 14-char tail pends, flushed by START
    assert(out.map(_.record).toSeq == Seq("START " + "x" * 26, "x" * 14))
    // keep=0 join: pending(31) + sep(2) = 33 > 32 — the emitted record is
    // capped at maxMsgSize instead of overflowing by the separator length
    val in2 = MemoryStream[MlInput]
    in2.addData(
      ml("g", 0, "START " + "x" * 25),
      ml("g", 1, "zzz"),
      ml("g", 2, "START next"))
    runToCompletion(
      Stateful.imfileMultiline(in2.toDS(), Some("^START"), None,
        maxMsgSize = 32).writeStream, "ml_clamp2")
    val out2 = spark.table("ml_clamp2").as[MlOutput].collect().sortBy(_.startSeq)
    assert(out2.map(_.record).toSeq ==
      Seq(("START " + "x" * 25 + "\\n").take(32), "zzz"))
    assert(out2(0).record.length == 32)
  }

  test("multiline event-time timer flush drains a quiet file's pending record") {
    val in = MemoryStream[MlInput]
    in.addData(ml("f", 0, "2024-01-01 lone pending record"), ml("f", 1, "  tail"))
    val query = Stateful.imfileMultiline(in.toDS(),
        Some("^\\d{4}-\\d{2}-\\d{2} "), None, escapeLF = false,
        flushAfterMs = 30000L)
      .writeStream.queryName("ml_flush").outputMode(OutputMode.Append)
      .format("memory").start()
    query.processAllAvailable()
    in.addData(ml("other", 100, "2024-01-01 noise")) // watermark past 1s+30s
    query.processAllAvailable()
    query.stop()
    val f = spark.table("ml_flush").as[MlOutput].collect().filter(_.key == "f")
    assert(f.map(_.record).toSeq ==
      Seq("2024-01-01 lone pending record\n  tail"))
  }

  test("multiline seq regression (file truncation) flushes and resets") {
    // arrival (read) time advances while the file OFFSET regresses
    def at(seq: Long, arrival: Long, line: String) =
      MlInput("f", seq, line, new java.sql.Timestamp((100 + arrival) * 1000L))
    val in = MemoryStream[MlInput]
    in.addData(
      at(10, 0, "2024-01-01 before truncate"),
      at(11, 1, "  tail"),
      // file truncated + rewritten: offsets restart at 0
      at(0, 2, "2024-02-02 after truncate"),
      at(1, 3, "  tail2"),
      at(2, 4, "2024-03-03 breaker"))
    runToCompletion(
      Stateful.imfileMultiline(in.toDS(), Some("^\\d{4}-\\d{2}-\\d{2} "), None,
        escapeLF = false).writeStream, "ml_reset")
    val out = spark.table("ml_reset").as[MlOutput].collect().sortBy(_.record)
    assert(out.map(_.record).toSeq == Seq(
      "2024-01-01 before truncate\n  tail",
      "2024-02-02 after truncate\n  tail2"))
  }

  test("readMode 1 (paragraph) and readMode 2 (indented) assembly") {
    val in1 = MemoryStream[MlInput]
    in1.addData(
      ml("f", 0, "para one line 1"), ml("f", 1, "para one line 2"),
      ml("f", 2, ""), // blank separates
      ml("f", 3, "para two"), ml("f", 4, ""),
      ml("f", 5, "pending until blank or timeout"))
    runToCompletion(
      Stateful.imfileReadMode(in1.toDS(), readMode = 1).writeStream, "rm1")
    val p = spark.table("rm1").as[MlOutput].collect().sortBy(_.startSeq)
    assert(p.map(_.record).toSeq ==
      Seq("para one line 1#012para one line 2", "para two"))

    val in2 = MemoryStream[MlInput]
    in2.addData(
      ml("f", 0, "java.lang.RuntimeException: boom"),
      ml("f", 1, "\tat com.example.Main(Main.java:1)"),
      ml("f", 2, "  at com.example.Other(Other.java:2)"),
      ml("f", 3, "next message"),
      ml("f", 4, ""))
    runToCompletion(
      Stateful.imfileReadMode(in2.toDS(), readMode = 2,
        escapeLF = false).writeStream, "rm2")
    val s = spark.table("rm2").as[MlOutput].collect().sortBy(_.startSeq)
    assert(s.map(_.record).toSeq == Seq(
      "java.lang.RuntimeException: boom\n\tat com.example.Main(Main.java:1)\n  at com.example.Other(Other.java:2)",
      "next message"))
  }

  test("event-time window aggregation with watermark over a decoded stream") {
    import org.apache.spark.sql.functions._
    val in = MemoryStream[String]
    in.addData(
      "<13>Mar  1 01:00:10 h1 app: a",
      "<13>Mar  1 01:00:40 h1 app: b",
      "<13>Mar  1 01:01:10 h2 app: c",
      "<11>Mar  1 01:01:20 h1 app: d")
    val decoded = graft.sources.Sources.decodeSyslog(in.toDF())
    val agg = decoded
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("hostname"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("win_out").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("win_out")
      .select(col("window.start").cast("long").as("w"), col("hostname"), col("n"))
      .collect().map(r => (r.getLong(0) % 3600, r.getString(1), r.getLong(2))).toSet
    assert(out == Set((0L, "h1", 2L), (60L, "h2", 1L), (60L, "h1", 1L)))
  }

  test("chkseq: exact gapless delivery through decode pipeline") {
    // tcpflood pattern: sequenced msgs through frame-decode + parse;
    // assert gapless 0..N-1 (tests/chkseq.c logic)
    val n = 500
    val lines = (0 until n).map(i =>
      f"${52 + f"<167>Mar  1 01:00:00 h t msgnum:$i%08d:".length}%d <167>Mar  1 01:00:00 h t msgnum:$i%08d:")
    val df = lines.toDF("value")
    val decoded = graft.sources.Sources.decodeSyslog(
      graft.sources.Sources.deframeOctetCounted(df))
    val seqs = decoded
      .select(org.apache.spark.sql.functions.regexp_extract(
        org.apache.spark.sql.functions.col("msg"), "msgnum:(\\d+):", 1)
        .cast("long").as("s"))
      .collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq == (0L until n.toLong))
  }

  // offset away from the epoch: a row whose event time equals the initial
  // watermark (0) is filtered as late before reaching the state operator
  private def rrTs(sec: Long) = new java.sql.Timestamp((100 + sec) * 1000L)

  test("repeated-msg squash collapses runs across micro-batches") {
    val in = MemoryStream[RrInput]
    in.addData(RrInput("h", 0, "up", rrTs(0)), RrInput("h", 1, "up", rrTs(1)),
      RrInput("h", 2, "up", rrTs(2)))
    val query = Stateful.repeatedMsgSquash(in.toDS()).writeStream
      .queryName("rr_out").outputMode(OutputMode.Append).format("memory").start()
    query.processAllAvailable()
    // run continues, then breaks
    in.addData(RrInput("h", 3, "up", rrTs(3)), RrInput("h", 4, "down", rrTs(4)))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("rr_out").as[RrOutput].collect().sortBy(_.seq)
    assert(out.map(_.msg).toSeq ==
      Seq("up", "last message repeated 3 times", "down"))
    assert(out.map(_.synthetic).toSeq == Seq(false, true, false))
  }

  test("repeated-msg squash flushes a quiet key via event-time timeout") {
    val in = MemoryStream[RrInput]
    // key h runs quiet after t=2s with 2 suppressed repeats pending
    in.addData(RrInput("h", 0, "up", rrTs(0)), RrInput("h", 1, "up", rrTs(1)),
      RrInput("h", 2, "up", rrTs(2)))
    val query = Stateful.repeatedMsgSquash(in.toDS(), flushAfterMs = 30000L)
      .writeStream.queryName("rr_flush").outputMode(OutputMode.Append)
      .format("memory").start()
    query.processAllAvailable()
    // other-key traffic advances the watermark past 2s + 30s → timer fires
    in.addData(RrInput("x", 10, "noise", rrTs(120)))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("rr_flush").as[RrOutput].collect()
    val h = out.filter(_.key == "h").sortBy(_.seq)
    assert(h.map(_.msg).toSeq == Seq("up", "last message repeated 2 times"))
    assert(h.map(_.synthetic).toSeq == Seq(false, true))
  }

  test("omsendertrack accumulates per-sender state across batches") {
    val in = MemoryStream[StInput]
    in.addData(StInput("s1", 1000, 10), StInput("s1", 2000, 20))
    val query = Stateful.senderTrack(in.toDS()).writeStream
      .queryName("st_out").outputMode(OutputMode.Append).format("memory").start()
    query.processAllAvailable()
    in.addData(StInput("s1", 500, 5), StInput("s2", 3000, 30))
    query.processAllAvailable()
    query.stop()
    val snaps = spark.table("st_out").as[StSnapshot].collect()
    // latest s1 snapshot reflects all three msgs incl. the early-ts one
    val s1 = snaps.filter(_.sender == "s1").maxBy(_.n_msgs)
    assert(s1.first_seen == 500 && s1.last_seen == 2000 &&
      s1.n_msgs == 3 && s1.n_bytes == 35)
    assert(snaps.exists(s => s.sender == "s2" && s.n_msgs == 1))
  }

  test("streaming exact dedup drops repeats across micro-batches") {
    val in = MemoryStream[(String, java.sql.Timestamp)]
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    in.addData(("doc one", ts(1)), ("doc two", ts(2)), ("doc one", ts(3)))
    val query = Stateful.dedupExact(in.toDF().toDF("text", "ts"), "text", "ts", "1 hour")
      .writeStream.queryName("dd_out").outputMode(OutputMode.Append)
      .format("memory").start()
    query.processAllAvailable()
    in.addData(("doc one", ts(4)), ("doc three", ts(5))) // dup across batches
    query.processAllAvailable()
    query.stop()
    val texts = spark.table("dd_out").select("text").collect().map(_.getString(0)).sorted
    assert(texts.toSeq == Seq("doc one", "doc three", "doc two"))
  }

  test("lookup table hot reload: per-epoch rebuild changes enrichment") {
    // reload_lookup_table semantics (runtime/lookup.c:975-1011): each
    // epoch re-reads the table file and re-broadcasts — simulated as two
    // foreachBatch epochs against a table file rewritten in between
    val tblFile = java.io.File.createTempFile("lkreload", ".json")
    def write(v: String): Unit = java.nio.file.Files.writeString(tblFile.toPath,
      s"""{"version":1,"nomatch":"UNK","type":"string","table":[
         |{"index":"h1","value":"$v"}]}""".stripMargin)
    def probe(): String = {
      val tbl = graft.operators.LookupTable.load(tblFile.getAbsolutePath)
      Seq("h1").toDF("host").select(tbl.probe($"host").as("r"))
        .collect()(0).getString(0)
    }
    write("dc-east")
    assert(probe() == "dc-east")
    write("dc-west") // HUP / reload_lookup_table()
    assert(probe() == "dc-west")
  }

  test("mmdblookup on a stream: static range table joins a streaming frame") {
    import org.apache.spark.sql.functions._
    val ranges = Seq((0L, 100L, "lo"), (101L, 200L, "hi")).toDF("lo", "hi", "geo")
    val in = MemoryStream[Long]
    in.addData(5L, 150L, 999L)
    val query = in.toDF().toDF("ipn")
      .join(broadcast(ranges), col("ipn") >= col("lo") && col("ipn") <= col("hi"), "left")
      .select(col("ipn"), coalesce(col("geo"), lit("unknown")).as("geo"))
      .writeStream.queryName("geo_out").outputMode(OutputMode.Append)
      .format("memory").start()
    query.processAllAvailable()
    query.stop()
    val out = spark.table("geo_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(5L -> "lo", 150L -> "hi", 999L -> "unknown"))
  }

  test("compiled RainerScript pipeline runs unchanged on a streaming frame") {
    // the compiled config is pure Column ops (filters/projections), so the
    // same RsyslogConfig.run works on a readStream DataFrame — batch/
    // streaming parity for the script surface
    val in = MemoryStream[String]
    in.addData(
      "<11>Mar  1 01:00:00 h1 app: critical failure",
      "<30>Mar  1 01:00:01 h2 app: routine note",
      "<191>Mar  1 01:00:02 h3 app: debug spam")
    val decoded = graft.sources.Sources.decodeSyslog(in.toDF())
    val cfg = graft.rainerscript.RsyslogConfig.parse(
      """if $severity == 7 then stop
        |if prifilt("*.err") then set $!class = "high";
        |action(type="omfile" template="%hostname% %msg%")
        |""".stripMargin)
    val res = cfg.run(decoded)
    val query = res.actionFrame(0)
      .select(org.apache.spark.sql.functions.col("__rendered"))
      .writeStream.queryName("rs_stream").outputMode(OutputMode.Append)
      .format("memory").start()
    query.processAllAvailable()
    query.stop()
    val lines = spark.table("rs_stream").collect().map(_.getString(0)).sorted
    assert(lines.length == 2) // debug row stopped
    assert(lines.exists(_.contains("critical failure")))
    assert(!lines.exists(_.contains("debug spam")))
  }
}
