package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** imbeats Lumberjack v2 decode vs plugins/imbeats (lj_parser.c frame
  * grammar, seqnum.h sequence rule, imbeats.c event mapping). */
class ImbeatsSpec extends SparkSpec {
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def wFrame(window: Int): Array[Byte] =
    Array('2'.toByte, 'W'.toByte) ++ be32(window)
  private def jFrame(seq: Long, payload: String): Array[Byte] =
    Array('2'.toByte, 'J'.toByte) ++ be32(seq) ++
      be32(payload.getBytes("UTF-8").length) ++ payload.getBytes("UTF-8")
  private def cFrame(inner: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(inner); d.finish()
    val buf = new Array[Byte](inner.length + 64)
    val n = d.deflate(buf); d.end()
    val z = buf.take(n)
    Array('2'.toByte, 'C'.toByte) ++ be32(z.length) ++ z
  }

  private def decode(streams: Seq[Array[Byte]]) =
    Sources.imbeatsDecode(
      streams.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("sid", "value").withColumn("fromhost", lit("peer1")))

  test("plain window + JSON frames decode in order with $! merge and metadata") {
    val stream = wFrame(4) ++
      jFrame(1, """{"message":"hello","beat":"filebeat"}""") ++
      jFrame(2, """{"message":"world"}""")
    val rows = decode(Seq(stream)).orderBy("seq").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("seq")).toSeq == Seq(1L, 2L))
    assert(rows(0).getAs[String]("msg") ==
      """{"message":"hello","beat":"filebeat"}""")
    val v = rows(0).getAs[String]("vars_msg")
    assert(get_json(v, "$.message") == "hello")
    assert(get_json(v, "$.metadata.imbeats.protocol") == "lumberjack-v2")
    assert(get_json(v, "$.metadata.imbeats.sequence") == "1")
    assert(get_json(v, "$.metadata.imbeats.peer_hostname") == "peer1")
    assert(rows(0).getAs[Int]("pri") == 13)
    assert(rows(0).getAs[String]("hostname") == "peer1")
  }

  test("compressed frame inflates to JSON frames (nested 2C rejected)") {
    val inner = jFrame(1, """{"a":1}""") ++ jFrame(2, """{"a":2}""")
    val stream = wFrame(8) ++ cFrame(inner)
    val rows = decode(Seq(stream)).orderBy("seq").collect()
    assert(rows.map(_.getAs[Long]("seq")).toSeq == Seq(1L, 2L))
    // nested compression is a whole-session reject
    val nested = wFrame(8) ++ cFrame(cFrame(jFrame(1, """{"a":1}""")))
    val r2 = decode(Seq(nested)).collect()
    assert(r2.length == 1 && !r2(0).getAs[Boolean]("beats_valid") &&
      r2(0).isNullAt(r2(0).fieldIndex("seq")))
  }

  test("whole-batch rejection: bad sequence, over-window, invalid JSON, no window") {
    val badSeq = wFrame(4) ++ jFrame(1, """{"a":1}""") ++ jFrame(3, """{"a":2}""")
    val overWin = wFrame(1) ++ jFrame(1, """{"a":1}""") ++ jFrame(2, """{"a":2}""")
    val badJson = wFrame(4) ++ jFrame(1, """{"a":1}""") ++ jFrame(2, "{nope")
    val noWin = jFrame(1, """{"a":1}""")
    val ok = wFrame(4) ++ jFrame(1, """{"ok":true}""")
    val rows = decode(Seq(badSeq, overWin, badJson, noWin, ok))
      .select("sid", "beats_valid", "seq").collect()
      .map(r => (r.getAs[Long]("sid"), r.getAs[Boolean]("beats_valid")))
    assert(rows.count(_._2) == 1 && rows.filter(_._2).head._1 == 4L)
    assert(rows.count(!_._2) == 4) // one null-event row per rejected session
  }

  private def get_json(j: String, p: String): String = {
    val n = p.split("[.$]").filter(_.nonEmpty)
      .foldLeft(graft.functions.JsonPathUtil.mapper.readTree(j))((a, k) => a.path(k))
    if (n.isMissingNode) null else n.asText()
  }
}
