package graft

import org.apache.spark.sql.functions._
import graft.sources.CloudSinks

/** Cloud sink shaping: omawslogshlc HLC events + greedy request packing
  * (plugins/omawslogshlc/omawslogshlc.c), omazuredce record validation /
  * compaction / array batching (plugins/omazuredce/omazuredce.c),
  * omazureeventhubs AMQP message shaping (plugins/omazureeventhubs/
  * omazureeventhubs.c proton_encode_message), omhttpfs WebHDFS URLs
  * (contrib/omhttpfs/omhttpfs.c httpfs_build_url). The oracle queries
  * cover the count-cap packing face; this spec drives the byte-cap and
  * drop edges the SQL oracle can't express.
  */
class CloudSinkSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, String)],
                   maxEvents: Int = Int.MaxValue,
                   maxBytes: Long = Long.MaxValue,
                   perEventMax: Long = Long.MaxValue,
                   sep: String = "", prefix: String = "", suffix: String = "",
                   overhead: Long = 0L) =
    CloudSinks.greedyPack(rows.toDF("k", "o", "e"), "k", "o", "e",
      maxEvents, maxBytes, perEventMax, sep, prefix, suffix, overhead)
      .orderBy("k", "batch_idx")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("greedyPack: byte cap flushes BEFORE the event that would overflow") {
    // events of 4 bytes, cap 10 → batches of 2 (4+4=8 fits, +4=12 > 10)
    val rows = (0L until 5L).map(i => ("a", i, "e" + i + "xx"))
    val out = pack(rows, maxBytes = 10)
    assert(out.map(_._4).toSeq == Seq(2L, 2L, 1L))
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(out.head._3 == "e0xxe1xx")
  }

  test("greedyPack: count cap flushes after append (omawslogshlc.c:523)") {
    val rows = (0L until 7L).map(i => ("a", i, "x"))
    val out = pack(rows, maxEvents = 3)
    assert(out.map(_._4).toSeq == Seq(3L, 3L, 1L))
  }

  test("greedyPack: oversize event flushes current batch, then is dropped") {
    val rows = Seq(("a", 0L, "ok1"), ("a", 1L, "waytoobigevent"),
      ("a", 2L, "ok2"))
    val out = pack(rows, perEventMax = 5)
    // batch 0 = [ok1] (flushed by the oversize arrival), batch 1 carries
    // ok2 and reports the drop
    assert(out.length == 2)
    assert(out(0)._3 == "ok1" && out(0)._6 == 0L)
    assert(out(1)._3 == "ok2" && out(1)._6 == 1L)
  }

  test("greedyPack: sep/prefix/suffix accounting (DCE array form)") {
    // recs of 3 bytes; '[' + r + ',' + r + ']' = 9 ≤ 9 → two per batch
    val rows = (0L until 4L).map(i => ("a", i, "r_" + i))
    val out = pack(rows, maxBytes = 9, sep = ",", prefix = "[", suffix = "]")
    assert(out.map(_._3).toSeq == Seq("[r_0,r_1]", "[r_2,r_3]"))
    assert(out.head._5 == 9L)
  }

  test("greedyPack: key boundary restarts batch numbering") {
    val rows = Seq(("a", 0L, "x"), ("a", 1L, "y"), ("b", 0L, "z"))
    val out = pack(rows, maxEvents = 1)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq(("a", 0L), ("a", 1L), ("b", 0L)))
  }

  test("awsHlcEvent: escape table, %.6f time, (empty) fallback") {
    val ctl = 1.toChar  // C0 control char (the \\u%04x branch)
    val df = Seq(
      ("he said \"hi\"" + ctl + "\n", "2024-03-01 12:00:00.123456", "h1"),
      ("", "2024-03-01 12:00:00.000001", "h2")
    ).toDF("m", "t", "h")
      .withColumn("ts", to_timestamp(col("t")))
    val out = df.select(CloudSinks.awsHlcEvent(col("m"), col("ts"),
      col("h")).as("e")).as[String].collect()
    // expected time from the parsed ts (session-tz independent)
    val us = df.select(unix_micros(col("ts"))).as[Long].collect()
    def timeStr(u: Long) = s"${u / 1000000}.${"%06d".format(u % 1000000)}"
    assert(out(0) ==
      "{\"event\":\"he said \\\"hi\\\"\\u0001\\n\",\"time\":" + timeStr(us(0)) +
        ",\"host\":\"h1\",\"source\":\"rsyslog\"}")
    assert(out(1) ==
      "{\"event\":\"(empty)\",\"time\":" + timeStr(us(1)) +
        ",\"host\":\"h2\",\"source\":\"rsyslog\"}")
  }

  test("replay omawslogshlc-batch.sh: 50 injectmsg frames, max_batch_size=10") {
    // tests/omawslogshlc-batch.sh: NUMMESSAGES=50 through max_batch_size
    // "10" must produce complete coverage across multiple batches with no
    // local rejection (seq_check 0 49)
    val frames = (0L until 50L).map(i =>
      ("g", i, s"""{"event":"msgnum:$i","time":1.0,"host":"h","source":"rsyslog"}"""))
    val out = pack(frames, maxEvents = 10,
      maxBytes = 1024L * 1024L, perEventMax = 256L * 1024L)
    assert(out.length == 5)
    assert(out.forall(_._4 == 10L))
    assert(out.map(_._6).sum == 0L)       // nothing dropped
    // seq_check: every msgnum appears exactly once across the payloads
    val all = out.map(_._3).mkString
    (0L until 50L).foreach(i =>
      assert(all.contains(s""""msgnum:$i"""")))
  }

  test("awsHlcUrl encodes group/stream into the query string") {
    assert(CloudSinks.awsHlcUrl("us-east-1", "/my group", "app/stream") ==
      "https://logs.us-east-1.amazonaws.com/services/collector/event" +
        "?logGroup=%2Fmy%20group&logStream=app%2Fstream")
  }

  test("azureDceRecord: validate + PLAIN compaction (buildRecordJson)") {
    val cases = Seq(
      ("""  { "a": 1, "b": [ true, null ], "s": "x y" }  """,
        """{"a":1,"b":[true,null],"s":"x y"}"""),      // spaced → compact
      ("""{"nested":{"k":"v"}}""", """{"nested":{"k":"v"}}"""),
      ("""{"q":"br{ace \" in str"}""", """{"q":"br{ace \" in str"}"""),
      ("""{"a":1} trailing""", null),                   // trailing garbage
      ("""[1,2]""", null),                              // non-object
      ("""not json""", null),
      ("""{"a":1}{"b":2}""", null))                     // second object
    val df = cases.map(_._1).toDF("m")
    val out = df.select(
      CloudSinks.azureDceRecord(col("m")).as("r")).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (exp, got) =>
      assert(got == exp, s"expected $exp got $got")
    }
  }

  test("azureDceBatches: byte-cap array packing, unfittable record drops") {
    val recs = Seq(
      ("a", 0L, """{"i":0}"""), ("a", 1L, """{"i":1}"""),
      ("a", 2L, """{"i":2,"pad":"xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"}"""),
      ("a", 3L, """{"i":3}""")).toDF("k", "o", "r")
    // [r0,r1] = 1+7+1+7+1 = 17 ≤ 20; r2 alone is 44+2 > 20 → dropped
    val out = CloudSinks.azureDceBatches(recs, "k", "o", "r",
      maxBatchBytes = 20).orderBy("batch_idx").collect()
    assert(out.map(_.getString(2)).toSeq ==
      Seq("""[{"i":0},{"i":1}]""", """[{"i":3}]"""))
    assert(out(1).getLong(5) == 1L) // the dropped over-sized record
  }

  test("azureDceUrl grammar incl. trailing-slash splice") {
    assert(CloudSinks.azureDceUrl("https://e.ingest.monitor.azure.com",
      "dcr-1", "T_CL") ==
      "https://e.ingest.monitor.azure.com/dataCollectionRules/dcr-1/streams/T_CL?api-version=2023-01-01")
    assert(CloudSinks.azureDceUrl("https://e.ingest.monitor.azure.com/",
      "dcr-1", "T_CL") ==
      "https://e.ingest.monitor.azure.com/dataCollectionRules/dcr-1/streams/T_CL?api-version=2023-01-01")
  }

  test("eventHubsMessage: AMQP shaping with properties map and ms time") {
    val df = Seq(("payload-1", 7L, "2024-03-01 12:00:00.123456"))
      .toDF("p", "seq", "t").withColumn("ts", to_timestamp(col("t")))
    val ms = df.select(floor(unix_micros(col("ts")) / 1000L)).as[Long].head()
    val out = CloudSinks.eventHubsMessage(df, col("p"), col("seq"),
      col("ts"), "amqps://ns/hub", Seq("Table" -> "syslog"))
      .select("amqp_message").as[String].head()
    assert(out ==
      s"""{"address":"amqps://ns/hub","message_id":"7","content_type":"application/octet-stream","inferred":true,"creation_time":$ms,"properties":{"Table":"syslog"},"body":"payload-1"}""")
  }

  test("eventHubsMessage: empty eventproperties omits the map") {
    val df = Seq(("x", 0L, "2024-03-01 00:00:00")).toDF("p", "seq", "t")
      .withColumn("ts", to_timestamp(col("t")))
    val out = CloudSinks.eventHubsMessage(df, col("p"), col("seq"),
      col("ts"), "amqps://ns/hub").select("amqp_message").as[String].head()
    assert(!out.contains("\"properties\""))
  }

  test("httpfsRequests: URL grammar, absolute-path splice, https scheme") {
    val df = Seq(("var/log/a.log", "line1"), ("/abs/b.log", "line2"))
      .toDF("f", "m")
    val out = CloudSinks.httpfsRequests(df, col("f"), col("m"),
      host = "h1", port = 14000, https = false, user = "hdfs")
      .select("url_append", "url_create", "hdfs_body").collect()
    assert(out(0).getString(0) ==
      "http://h1:14000/webhdfs/v1/var/log/a.log?user.name=hdfs&op=append&data=true")
    assert(out(1).getString(0) ==
      "http://h1:14000/webhdfs/v1/abs/b.log?user.name=hdfs&op=append&data=true")
    assert(out(0).getString(1).endsWith("&op=create&overwrite=false&data=true"))
    assert(out(0).getString(2) == "line1")
    val ssl = CloudSinks.httpfsRequests(df, col("f"), col("m"),
      host = "h1", port = 443, https = true)
      .select("url_append").as[String].head()
    assert(ssl.startsWith("https://h1:443/webhdfs/v1/"))
  }
}
