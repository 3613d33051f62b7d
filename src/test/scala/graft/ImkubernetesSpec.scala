package graft

import org.apache.spark.sql.functions._
import graft.rainerscript.RsyslogConfig

/** imkubernetes pod-log decode (contrib/imkubernetes/imkubernetes.c):
  * path metadata layouts, CRI + docker-json + raw record formats, and
  * the CRI partial-fragment accumulator. */
class ImkubernetesSpec extends SparkSpec {
  import spark.implicits._

  private val podsPath = "/var/log/pods/prod_web-5c4_abc-123/nginx/3.log"
  private val contPath = "/var/log/containers/web-5c4_prod_nginx-deadbeef42.log"
  private val t0 = to_timestamp(lit("2024-06-01 12:00:00"))

  private def decode(rows: Seq[(String, Long, String)]) =
    RsyslogConfig.parse("input(type=\"imkubernetes\")\n*.* /dev/null\n")
      .activate(spark,
        feeds = Map("imkubernetes" -> rows.toDF("path", "seq", "value")),
        now = t0)("").frame

  test("pods path layout + CRI record") {
    val out = decode(Seq((podsPath, 1L,
      "2024-03-01T10:00:00.5Z stdout F hello from nginx")))
      .select("msg", "severity", "facility", "syslogtag", "vars_msg")
      .collect().head
    assert(out.getString(0) == "hello from nginx")
    assert(out.getInt(1) == 6 && out.getInt(2) == 1)
    assert(out.getString(3) == "kubernetes:")
    assert(out.getString(4) ==
      """{"kubernetes":{"namespace_name":"prod","pod_name":"web-5c4",""" +
      """"pod_uid":"abc-123","container_name":"nginx","restart_count":3,""" +
      s""""log_file":"$podsPath","stream":"stdout","log_format":"cri"},""" +
      """"docker":{}}""")
  }

  test("containers path layout + docker-json record + stderr severity") {
    val out = decode(Seq((contPath, 1L,
      """{"log":"boom\n","stream":"stderr","time":"2024-03-01T10:00:01Z"}""")))
      .select("msg", "severity", "vars_msg").collect().head
    assert(out.getString(0) == "boom")
    assert(out.getInt(1) == 3) // stderr -> err
    assert(out.getString(2).contains(
      """"namespace_name":"prod","pod_name":"web-5c4","container_name":"nginx""""))
    assert(out.getString(2).contains(""""log_format":"docker_json""""))
    assert(out.getString(2).contains(""""docker":{"container_id":"deadbeef42"}"""))
  }

  test("raw fallback sets parse_error") {
    val out = decode(Seq((podsPath, 1L, "not a known format")))
      .select("msg", "vars_msg").collect().head
    assert(out.getString(0) == "not a known format")
    assert(out.getString(1).contains(""""log_format":"raw","parse_error":true"""))
  }

  test("CRI partial fragments accumulate to the closing F; unclosed run pends") {
    val out = decode(Seq(
      (podsPath, 1L, "2024-03-01T10:00:00Z stdout P part-one "),
      (podsPath, 2L, "2024-03-01T10:00:01Z stdout P part-two "),
      (podsPath, 3L, "2024-03-01T10:00:02Z stdout F closing"),
      (podsPath, 4L, "2024-03-01T10:00:03Z stdout F standalone"),
      (podsPath, 5L, "2024-03-01T10:00:04Z stdout P never-closed")))
      .select("msg", "ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).toString).sortBy(_._1)
    assert(out.map(_._1).toSeq ==
      Seq("part-one part-two closing", "standalone"))
    // combined record carries the FIRST fragment's time
    assert(out.head._2.startsWith("2024-03-01 10:00:00"))
  }
}
