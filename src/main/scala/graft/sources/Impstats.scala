package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** impstats as a MESSAGE STREAM (plugins/impstats/impstats.c:269-347,
  * runtime/statsobj.c:390-513): periodic counter snapshots rendered as
  * syslog-shaped rows — legacy ("name: origin=o k1=v1 k2=v2 ", trailing
  * spaces as the reference emits them) and CEE ("@cee: " cookie + JSON) —
  * under tag "rsyslogd-pstats:" with the module's default facility 5 /
  * severity 6 (PRI 46), ready to union into the pipeline like any other
  * input.
  *
  * Spark re-expression of the interval timer: one stats object per
  * (event-time window, object name); the snapshot fires when the
  * watermark closes the window. That is a single map-side-combinable
  * shuffle agg with watermark-bounded state — the 100 TB shape — instead
  * of a wall-clock thread walking a global object list under a mutex.
  */
object Impstats {
  val Tag = "rsyslogd-pstats:"
  /** facility syslog(5) * 8 + severity info(6) — impstats defaults. */
  val DefaultPri = 46

  /** legacy stats line (runtime/statsobj.c:471-513): counters in declared
    * order, each followed by one space. */
  def legacyLine(name: Column, origin: String, ctrs: Seq[(String, Column)]): Column =
    concat(name +: lit(": origin=" + origin + " ") +:
      ctrs.map { case (k, v) => concat(lit(k + "="), v.cast("string"), lit(" ")) }: _*)

  /** JSON stats line (runtime/statsobj.c getStatsLineCEE:391-446): the
    * name/origin context then counters, rendered by
    * `json_object_to_json_string(root)` — json-c's DEFAULT flags, i.e.
    * the SPACED form (`{ "name": "x", "origin": "o", "submitted": 5 }`),
    * not compact. jsonEs replaces '.' with '!' in COUNTER names only
    * (the Elasticsearch 2.0 dot workaround, :424-437); context keys are
    * untouched. */
  def jsonLine(name: Column, origin: String, ctrs: Seq[(String, Column)],
               esNames: Boolean = false): Column = {
    val body = ctrs.map { case (k, v) =>
      val key = if (esNames) k.replace('.', '!') else k
      concat(lit(", \"" + key + "\": "), v.cast("string"))
    }
    concat(lit("{ \"name\": \"") +: name +:
      lit("\", \"origin\": \"" + origin + "\"") +:
      body :+ lit(" }"): _*)
  }

  /** CEE stats line: the "@cee: " cookie + the same SPACED JSON
    * (CONST_CEE_COOKIE prepend at statsobj.c:403-404). */
  def ceeLine(name: Column, origin: String, ctrs: Seq[(String, Column)]): Column =
    concat(lit("@cee: "), jsonLine(name, origin, ctrs))

  /** Prometheus exposition block for ONE counter
    * (emitPrometheusForObject, statsobj.c:714-805): metric =
    * encode(`<object>_<counter>_total`) with the U__ reversible encoding
    * for non-legacy-safe names, a HELP line carrying escaped
    * origin/object/counter, a TYPE line, and the sample — each block
    * newline-terminated exactly as the cb receives it. */
  def prometheusBlock(name: Column, origin: String, ctr: String,
                      value: Column): Column = {
    val metric = graft.functions.PromNameExpr.encode(
      concat(name, lit("_" + ctr + "_total")))
    val escObject = graft.functions.PromHelpExpr.escape(name)
    concat(
      lit("# HELP "), metric,
      lit(" rsyslog stats: origin=\"" +
        StatsNameHelp.escape(origin) + "\" object=\""), escObject,
      lit("\", counter=\"" + StatsNameHelp.escape(ctr) + "\"\n"),
      lit("# TYPE "), metric, lit(" counter\n"),
      metric, lit(" "), value.cast("string"), lit("\n"))
  }

  /** Zabbix grouping key (impstats.c collectStats_zbx:990-1027):
    * core.action lines whose name mentions omkafka remap to
    * stats_omkafka_local; the dual-origin modules (imkafka/omkafka/
    * imtcp/imudp, :895-898) split _global (name == origin) vs _local;
    * everything else is stats_<origin> with '.' sanitized to '_'. */
  def zabbixKey(origin: Column, name: Column): Column =
    when(origin === "core.action" && name.contains("omkafka"),
      lit("stats_omkafka_local"))
    .when(origin.isin("imkafka", "omkafka", "imtcp", "imudp"),
      concat(lit("stats_"), translate(origin, ".", "_"),
        when(origin === name, lit("_global")).otherwise(lit("_local"))))
    .otherwise(concat(lit("stats_"), translate(origin, ".", "_")))

  /** The Zabbix grouped snapshot (impstats.c generateZabbixStats:
    * 1031-1106): ONE line per interval —
    * `{ "timedate": "<%a %b %d %H:%M:%S %Y>", "<key>": [line, ...], … }`
    * — JSON stat lines grouped by zabbixKey, groups in first-seen walk
    * order, lines in walk order within each group. `ordCol` supplies the
    * deterministic walk order (the reference walks its registration
    * list); `timedateCol` the snapshot timestamp (wall-clock in the
    * reference — same determinism seam as the other sinks).
    * Two bounded aggs: #groups ≤ #origins, so the final single-row
    * assembly holds one snapshot line, not the corpus. */
  def zabbixSnapshot(lines: DataFrame, lineCol: Column, originCol: Column,
                     nameCol: Column, ordCol: Column,
                     timedateCol: Column): DataFrame = {
    val grouped = lines
      .select(zabbixKey(originCol, nameCol).as("zkey"), lineCol.as("line"),
        ordCol.as("ord"), timedateCol.as("td"))
      .groupBy(col("zkey"))
      .agg(min(col("ord")).as("first_seen"), min(col("td")).as("td"),
        concat(lit("["),
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("ord"), col("line")))),
            x => x.getField("line"))),
          lit("]")).as("arr"))
    grouped.groupBy()
      .agg(min(col("td")).as("td"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("first_seen"), col("zkey"),
            col("arr")))),
          g => concat(lit(", \""), g.getField("zkey"), lit("\": "),
            g.getField("arr")))).as("groups"))
      .select(concat(lit("{ \"timedate\": \""),
        date_format(col("td"), "EEE MMM dd HH:mm:ss yyyy"),
        lit("\""), col("groups"), lit("}")).as("snapshot"))
  }

  /** Periodic snapshot over a (possibly streaming) frame: `submitted`
    * counts per (window(interval), nameCol), one legacy + one CEE message
    * row per closed window per stats object. Emission happens when the
    * watermark passes the window end — the streaming face of the
    * reference's interval timer. */
  def statsMessageStream(df: DataFrame, tsCol: String, nameCol: Column,
                         origin: String, interval: String): DataFrame = {
    val ctrs = Seq("submitted" -> col("submitted"))
    df.withWatermark(tsCol, "0 seconds")
      .groupBy(window(col(tsCol), interval), nameCol.as("name"))
      .agg(count(lit(1)).as("submitted"))
      .select(
        col("window.end").as("reported_at"),
        col("name"),
        explode(map(
          lit("legacy"), legacyLine(col("name"), origin, ctrs),
          lit("cee"), ceeLine(col("name"), origin, ctrs))).as(Seq("fmt", "msg")))
      .withColumn("pri", lit(DefaultPri))
      .withColumn("tag", lit(Tag))
  }

  /** Render a message row as a full syslog line (`<PRI>` + tag + text) so
    * pstats messages can union with any raw-line input, exactly as the
    * reference submits them to the ruleset (impstats.c doSubmitMsg). */
  def asSyslogLine(msgs: DataFrame): DataFrame =
    msgs.select(concat(lit("<"), col("pri"), lit(">"),
      date_format(col("reported_at"), "MMM ppd HH:mm:ss"),
      lit(" graft "), col("tag"), lit(" "), col("msg")).as("value"))
}

/** Driver-side HELP escaping for literal (constant) origin/counter names
  * — same table as PromHelpExpr, applied at plan-build time. */
object StatsNameHelp {
  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case c @ ('\\' | '"') => sb.append('\\').append(c)
      case '\n' => sb.append("\\n")
      case c => sb.append(c)
    }
    sb.toString
  }
}
