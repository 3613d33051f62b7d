package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Parity pin for the r16 single-parse JSON sweep (VERDICT r15 #6):
  * replacing N `get_json_object(doc, "$.a.b")` full-document parses with
  * ONE `json_tuple(doc, "a", ...)` parse plus small-subtree extracts must
  * be value-identical for every path shape the six rewritten queries use
  * (imbeats/imdocker/imkubernetes/impcap decode, mm_actions,
  * json_var_case). The contract being pinned: json_tuple and
  * get_json_object return identical raw-token strings for scalar values,
  * identical compact JSON text for object/array values, and null for
  * missing keys / null docs / malformed docs.
  */
class JsonSingleParseParitySpec extends SparkSpec {
  import spark.implicits._

  /** Staged extraction: json_tuple pulls the top-level subtrees in one
    * parse (the Generate node pins the single evaluation below the
    * downstream Project), then each path re-parses only its subtree. */
  private def staged(df: DataFrame, roots: Seq[String],
                     paths: Seq[(String, String)]): Seq[Seq[Any]] =
    df.select(Seq(col("id")) :+ json_tuple(col("doc"), roots: _*): _*)
      .toDF("id" +: roots.map("__" + _): _*)
      .select(col("id") +: paths.map { case (r, rest) =>
        val c: Column =
          if (rest.isEmpty) col("__" + r)
          else get_json_object(col("__" + r), "$." + rest)
        c.as(r + "." + rest)
      }: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq

  /** Direct reference: the pre-sweep formulation. */
  private def direct(df: DataFrame,
                     paths: Seq[(String, String)]): Seq[Seq[Any]] =
    df.select(col("id") +: paths.map { case (r, rest) =>
      val p = if (rest.isEmpty) "$." + r else "$." + r + "." + rest
      get_json_object(col("doc"), p).as(r + "." + rest)
    }: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq

  private def check(docs: Seq[String], roots: Seq[String],
                    paths: Seq[(String, String)]): Unit = {
    val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "doc")
    assert(staged(df, roots, paths) == direct(df, paths))
  }

  // one fuzz pool shared by the per-query path sets: every key present,
  // absent, null, wrong-typed, escape-laden, or the whole doc malformed
  private val fuzzDocs: Seq[String] = {
    val rnd = new scala.util.Random(0x16A5EED)
    val vals = Seq("\"s\"", "7", "-3.25", "true", "null", "\"\"",
      "\"q\\\"uote\\\\back\\nnl\\u00e9\"", "[1,\"a\"]", "{\"x\":1}",
      "{\"deep\":{\"er\":\"v\"}}")
    val keys = Seq("n", "metadata", "imbeats", "sequence", "peer_hostname",
      "Id", "Names", "Labels", "app", "kubernetes", "docker",
      "namespace_name", "container_id", "restart_count", "impcap", "data",
      "net_src_ip", "net_flags", "content", "net_bytes_total", "header",
      "fields", "audit", "g", "vendor", "src", "hdr", "auditid", "uid",
      "verb", "code", "MixedCase", "out", "Inner", "read_ci",
      "exists_gone", "tmp_obj")
    (0 until 160).map { i =>
      if (i % 40 == 39) Seq("", "not json", "{", "[1,2",
        "\"bare string\"")(rnd.nextInt(5))
      else {
        val picked = rnd.shuffle(keys).take(1 + rnd.nextInt(6))
        picked.map { k =>
          val v =
            if (rnd.nextInt(4) == 0)
              // nested object reusing the path tails so multi-level
              // paths resolve sometimes
              s"""{"${keys(rnd.nextInt(keys.length))}":${vals(rnd.nextInt(vals.length))},"${keys(rnd.nextInt(keys.length))}":${vals(rnd.nextInt(vals.length))}}"""
            else vals(rnd.nextInt(vals.length))
          s""""$k":$v"""
        }.mkString("{", ",", "}")
      }
    } ++ Seq(null)
  }

  test("imbeats_decode paths: n + metadata.imbeats.{sequence,peer_hostname}") {
    check(fuzzDocs, Seq("n", "metadata"),
      Seq(("n", ""), ("metadata", "imbeats.sequence"),
        ("metadata", "imbeats.peer_hostname")))
  }

  test("imdocker_decode paths: metadata.{Id,Names,Labels.app}") {
    check(fuzzDocs, Seq("metadata"),
      Seq(("metadata", "Id"), ("metadata", "Names"),
        ("metadata", "Labels.app")))
  }

  test("imkubernetes_decode paths: kubernetes.*, docker.container_id") {
    check(fuzzDocs, Seq("kubernetes", "docker"),
      Seq(("kubernetes", "namespace_name"), ("docker", "container_id"),
        ("kubernetes", "restart_count")))
  }

  test("impcap_decode paths: impcap.*, data.content") {
    check(fuzzDocs, Seq("impcap", "data"),
      Seq(("impcap", "net_src_ip"), ("impcap", "net_flags"),
        ("data", "content"), ("impcap", "net_bytes_total")))
  }

  test("mm_actions paths: header/fields/audit/g subtrees") {
    check(fuzzDocs, Seq("header", "fields", "audit", "g"),
      Seq(("header", "vendor"), ("fields", "src"), ("audit", "hdr.auditid"),
        ("audit", "uid"), ("g", "verb"), ("g", "code")))
  }

  test("json_var_case paths: MixedCase.Inner, out.* (case-sensitive keys)") {
    // add case-collision docs: json_tuple must match key case exactly as
    // get_json_object's path step does
    val caseDocs = fuzzDocs ++ Seq(
      """{"mixedcase":{"Inner":1},"MixedCase":{"Inner":2},"OUT":{"read_ci":9}}""",
      """{"MIXEDCASE":{"INNER":3},"out":{"read_ci":4,"tmp_obj":false}}""")
    check(caseDocs, Seq("MixedCase", "out"),
      Seq(("MixedCase", "Inner"), ("out", "read_ci"),
        ("out", "exists_gone"), ("out", "tmp_obj")))
  }

  test("real decode feed parity: imbeats vars_msg through both forms") {
    // end-to-end over the real decoder output (not just synthetic JSON):
    // the staged select in SparkEntry must read identically to the
    // direct form on actual imbeats vars_msg documents
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def jFrame(seq: Long, payload: String): Array[Byte] =
      Array('2'.toByte, 'J'.toByte) ++ be32(seq) ++
        be32(payload.getBytes("UTF-8").length) ++ payload.getBytes("UTF-8")
    val stream = (Array('2'.toByte, 'W'.toByte) ++ be32(4)) ++
      jFrame(1, """{"message":"hello","beat":"filebeat","n":3}""") ++
      jFrame(2, """{"message":"w"}""")
    val dec = graft.sources.Sources.imbeatsDecode(
      Seq((1L, stream)).toDF("sid", "value")
        .withColumn("fromhost", lit("peerX")))
      .select(col("seq").as("id"), col("vars_msg").as("doc"))
    val paths = Seq(("n", ""), ("metadata", "imbeats.sequence"),
      ("metadata", "imbeats.peer_hostname"))
    assert(staged(dec, Seq("n", "metadata"), paths) == direct(dec, paths))
  }
}
