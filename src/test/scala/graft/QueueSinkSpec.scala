package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Contrib queue-sink shaping: omhiredis command text
  * (contrib/omhiredis/omhiredis.c writeHiredis), omrabbitmq AMQP
  * publish content (contrib/omrabbitmq/omrabbitmq.c doAction), omczmq
  * PUB topic fan-out (contrib/omczmq/omczmq.c outputCZMQ), and the
  * mmaitag classification fold (plugins/mmaitag/mmaitag.c doAction +
  * ai_provider_gemini_mock.c).
  */
class QueueSinkSpec extends SparkSpec {
  import spark.implicits._

  test("omhiredis: every mode renders its redisAppendCommand shape") {
    val df = Seq(("k1", "hello world")).toDF("k", "m")
    val row = df.select(
      Sources.hiredisCommand(col("m"), "template").as("tpl"),
      Sources.hiredisCommand(col("m"), "queue", col("k")).as("lpush"),
      Sources.hiredisCommand(col("m"), "queue", col("k"),
        useRPush = true).as("rpush"),
      Sources.hiredisCommand(col("m"), "publish", col("k")).as("pub"),
      Sources.hiredisCommand(col("m"), "set", col("k")).as("set"),
      Sources.hiredisCommand(col("m"), "set", col("k"),
        expiration = 60).as("setex"),
      Sources.hiredisCommand(col("m"), "stream", col("k")).as("xadd"),
      Sources.hiredisCommand(col("m"), "stream", col("k"),
        streamOutField = "body", streamCapacityLimit = 5000).as("xaddcap")
    ).head()
    assert(row.getString(0) == "hello world")
    assert(row.getString(1) == "LPUSH k1 hello world")
    assert(row.getString(2) == "RPUSH k1 hello world")
    assert(row.getString(3) == "PUBLISH k1 hello world")
    assert(row.getString(4) == "SET k1 hello world")
    assert(row.getString(5) == "SETEX k1 60 hello world")
    assert(row.getString(6) == "XADD k1 * msg hello world")
    assert(row.getString(7) == "XADD k1 MAXLEN ~ 5000 * body hello world")
  }

  test("omhiredis: unknown mode rejected") {
    intercept[IllegalArgumentException] {
      Sources.hiredisCommand(lit("m"), "hash", lit("k"))
    }
  }

  test("omrabbitmq: populated properties carry timestamp/app_id/headers") {
    val df = Seq((java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
      "su[1]", "web1", "auth", "err", "body text"))
      .toDF("ts", "syslogtag", "hostname", "fac_t", "sev_t", "m")
    val out = Sources.rabbitPublishFrame(df, exchange = "in",
      routingKey = concat(col("fac_t"), lit("."), col("sev_t")),
      bodyCol = col("m"), contentType = "text/plain",
      populateProperties = true,
      facilityTextCol = col("fac_t"), severityTextCol = col("sev_t"),
      hostnameCol = col("hostname"), fromhostCol = col("hostname"))
      .select("amqp_publish").as[String].head()
    assert(out == """{"exchange":"in","routing_key":"auth.err",""" +
      """"properties":{"content_type":"text/plain","delivery_mode":2,""" +
      """"timestamp":1709287200,"app_id":"su[1]","headers":{""" +
      """"facility":"auth","severity":"err","hostname":"web1",""" +
      """"fromhost":"web1"}},"body":"body text"}""")
  }

  test("omrabbitmq: empty property values are dropped like the reference") {
    // `if (val[i] && *val[i])` — empty string ⇒ no header, no app_id
    val df = Seq((java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
      "", "web1", "body"))
      .toDF("ts", "syslogtag", "hostname", "m")
    val out = Sources.rabbitPublishFrame(df, exchange = "in",
      routingKey = lit("rk"), bodyCol = col("m"),
      populateProperties = true,
      hostnameCol = col("hostname"))
      .select("amqp_publish").as[String].head()
    assert(!out.contains("app_id"))
    assert(!out.contains("facility"))
    assert(out.contains(""""hostname":"web1""""))
  }

  test("omczmq: topic fan-out emits one frame-set per topic in order") {
    val df = Seq((1L, "msg one")).toDF("id", "m")
    val rows = Sources.czmqFrames(df, col("m"),
      Seq(lit("t.a"), lit("t.b")), topicFrame = true)
      .select("frames").as[Seq[String]].collect()
    assert(rows.toSeq == Seq(Seq("t.a", "msg one"), Seq("t.b", "msg one")))
  }

  test("omczmq: topicFrame=off concatenates topic and message (zstr_sendf)") {
    val df = Seq((1L, "msg one")).toDF("id", "m")
    val rows = Sources.czmqFrames(df, col("m"),
      Seq(lit("pfx.")), topicFrame = false)
      .select("frames").as[Seq[String]].collect()
    assert(rows.toSeq == Seq(Seq("pfx.msg one")))
  }

  test("omczmq: no topics = plain zstr_send of the rendered message") {
    val df = Seq((1L, "just this")).toDF("id", "m")
    val rows = Sources.czmqFrames(df, col("m"), Nil)
      .select("frames").as[Seq[String]].collect()
    assert(rows.toSeq == Seq(Seq("just this")))
  }

  test("mmaitag: mock labels are sequential with REGULAR fallback") {
    val df = Seq(10L, 20L, 30L, 40L).toDF("event_id")
      .withColumn("vars_local", lit("{}"))
    val labels = Sources.mmaitagMockLabels("NOISE,CRITICAL", col("event_id"))
    val out = Sources.mmaitagFold(df, labels)
      .orderBy("event_id")
      .select(get_json_object(col("vars_local"), "$.aitag")).as[String]
      .collect()
    assert(out.toSeq == Seq("NOISE", "CRITICAL", "REGULAR", "REGULAR"))
  }

  test("mmaitag: tag targets the message tree when it starts with '!'") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("vars_msg", lit("""{"x":1}"""))
    val out = Sources.mmaitagFold(df, lit("IMPORTANT"), tag = "$!ai!tag")
      .select(get_json_object(col("vars_msg"), "$.ai.tag")).as[String]
      .head()
    assert(out == "IMPORTANT")
  }

  test("mmaitag: null label leaves the tree untouched (provider error path)") {
    val df = Seq(1L).toDF("event_id").withColumn("vars_local", lit("{}"))
    val out = Sources.mmaitagFold(df, lit(null).cast("string"))
      .select("vars_local").as[String].head()
    assert(out == "{}")
  }

  test("omsendertrack: state-file image format and empty-table render") {
    val st = Seq(("h2", 3L, 10L, 20L), ("h1", 5L, 1L, 9L))
      .toDF("sender", "messages", "firstseen", "lastseen")
    val entries = st.select(col("sender"),
      Sources.senderTrackEntry(col("sender"), col("messages"),
        col("firstseen"), col("lastseen")).as("entry"))
    val file = Sources.senderTrackFile(entries, col("entry"), col("sender"))
      .as[String].head()
    // writeSenderStats: "[\n" + entries ",\n"-joined + "\n]\n",
    // entries sorted by sender here (hashtable order is non-semantic)
    assert(file ==
      "[\n{\"sender\":\"h1\",\"messages\":5,\"firstseen\":1,\"lastseen\":9},\n" +
      "{\"sender\":\"h2\",\"messages\":3,\"firstseen\":10,\"lastseen\":20}\n]\n")
    val empty = Sources.senderTrackFile(
      entries.filter(col("sender") === "none"), col("entry"), col("sender"))
      .as[String].head()
    assert(empty == "[\n]\n")
  }
}
