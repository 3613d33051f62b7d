package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** imdocker multiplexed-stream decode (contrib/imdocker/imdocker.c
  * curl callback frame walk) and omrelp send framing
  * (plugins/omrelp/omrelp.c:733 → librelp envelope).
  */
class ImdockerSpec extends SparkSpec {
  import spark.implicits._

  private def frame(streamType: Int, payload: String): Array[Byte] = {
    val p = payload.getBytes("UTF-8")
    val h = Array[Byte](streamType.toByte, 0, 0, 0,
      ((p.length >> 24) & 0xff).toByte, ((p.length >> 16) & 0xff).toByte,
      ((p.length >> 8) & 0xff).toByte, (p.length & 0xff).toByte)
    h ++ p
  }

  private def decode(bytes: Array[Byte]) = {
    val df = Seq(Tuple1(bytes)).toDF("stream")
      .withColumn("container_id", lit("c1"))
      .withColumn("name", lit("/app"))
      .withColumn("image", lit("img"))
      .withColumn("image_id", lit("sha256:1"))
      .withColumn("labels_json", lit("{}"))
    Sources.imdockerDecode(df)
  }

  test("multiplexed frames: one message per frame, stderr maps to err") {
    val bytes = frame(1, "out line\n") ++ frame(2, "err line\n") ++
      frame(0, "stdin echo\n")
    val rows = decode(bytes)
      .select("stream_type", "msg", "severity", "syslogtag").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "out line", 6), (2, "err line", 3), (0, "stdin echo", 6)))
    assert(rows.forall(_.getString(3) == "docker:"))
  }

  test("TTY (non-multiplexed) stream falls through as one stdout payload") {
    val bytes = "plain tty output, no header".getBytes("UTF-8")
    val rows = decode(bytes).select("stream_type", "msg").collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(0) == 1)
    assert(rows(0).getString(1) == "plain tty output, no header")
  }

  test("truncated final frame yields its available bytes") {
    val full = frame(1, "complete\n")
    val cut = frame(2, "this got cut off").dropRight(6)
    val rows = decode(full ++ cut).select("stream_type", "msg").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "complete"), (2, "this got c")))
  }

  test("container metadata lands under $!metadata with null→empty") {
    val df = Seq(Tuple1(frame(1, "x\n"))).toDF("stream")
      .withColumn("container_id", lit("abc123"))
      .withColumn("name", lit(null).cast("string"))
      .withColumn("image", lit("nginx:1.25"))
      .withColumn("image_id", lit("sha256:9"))
      .withColumn("labels_json", lit("""{"team":"infra"}"""))
    val v = Sources.imdockerDecode(df).select("vars_msg").as[String].head()
    assert(get(v, "$.metadata.Id") == "abc123")
    assert(get(v, "$.metadata.Names") == "")
    assert(get(v, "$.metadata.Image") == "nginx:1.25")
    assert(get(v, "$.metadata.Labels.team") == "infra")
  }

  private def get(json: String, path: String): String = {
    val df = Seq(json).toDF("j")
    df.select(get_json_object(col("j"), path)).as[String].head()
  }

  test("control characters in payload escape per reception sanitize") {
    val v = decode(frame(1, "tab\there\n")).select("msg").as[String].head()
    assert(v == "tab#011here")
  }

  test("omrelp frame round-trips through deframeRelp") {
    val df = Seq((5L, "msgnum:00000005"), (6L, "with spaces inside"))
      .toDF("txnr", "m")
    val framed = df.select(col("txnr"),
      Sources.frameRelp(col("m"), col("txnr")).as("value"))
    assert(framed.orderBy("txnr").select("value").as[String].collect().toSeq ==
      Seq("5 syslog 15 msgnum:00000005", "6 syslog 18 with spaces inside"))
    val back = Sources.deframeRelp(framed).orderBy("txnr")
      .select("value").as[String].collect()
    assert(back.toSeq == Seq("msgnum:00000005", "with spaces inside"))
  }
}
