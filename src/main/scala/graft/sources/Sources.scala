package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.functions.rainer

/** Source/sink surface -- the Spark re-expression of rsyslog's input and
  * output module families (SURVEY S2.5/S2.10). Network listeners (imudp/imtcp)
  * are transport, which the platform owns (Kafka/files/sockets); what the
  * engine owns is the *decode* step -- framing + syslog parse -- and the
  * sink-side template/partition logic.
  */
object Sources {

  /** imfile-lite batch: read text files, one row per line, with the
    * provenance columns rsyslog attaches (inputname, fromhost). */
  def fileLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("inputname", lit("imfile"))
      .withColumn("fromhost", lit(java.net.InetAddress.getLocalHost.getHostName))

  /** imfile-lite streaming: tail a directory of log files. */
  def fileTail(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path)
      .withColumn("inputname", lit("imfile"))

  /** imtcp octet-counted framing decode: "NNN <frame>" per RFC6587 --
    * strips the length prefix; LF framing is the line split the text
    * source already did. (Framing logic from runtime/tcpsrv.c.) */
  def deframeOctetCounted(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines.withColumn(valueCol,
      when(col(valueCol).rlike("^\\d+ "),
        expr(s"substring($valueCol, instr($valueCol, ' ') + 1)"))
      .otherwise(col(valueCol)))

  /** The standard decode pipeline: framed lines -> parsed LogEvent columns
    * (parser chain ~= one expression, SURVEY S2.9). Reception sanitize
    * mirrors runtime/parser.c SanitizeMsg in the reference's default
    * order: trailing-LF drop is inherent to the line sources;
    * `dropTrailingCr` mirrors the opt-in
    * parser.dropTrailingCrOnReception (parser.c:372, default off per
    * glbl.c:1185 — tests/parser-drop-trailing-cr.sh); then control
    * characters < 32 escape as '#'+octal (`escapeControlCharacters`,
    * reference default ON per glbl.c:1186 — tab included, DEL and
    * 8-bit chars untouched). */
  /** Reception sanitize as a column transform (parser.c SanitizeMsg):
    * optional trailing-CR drop, then control-char '#'+octal escaping
    * (reference default on). Reused by decodeSyslog and by input
    * bindings whose messages skip the parser chain (imfile default). */
  def sanitize(c: org.apache.spark.sql.Column,
               dropTrailingCr: Boolean = false,
               escapeControlCharacters: Boolean = true): org.apache.spark.sql.Column = {
    val trimmed =
      if (dropTrailingCr) regexp_replace(c, "\r$", "") else c
    if (escapeControlCharacters)
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.ControlCharExpr(
          org.apache.spark.sql.GraftBridge.expression(trimmed), 4))
    else trimmed
  }

  def decodeSyslog(lines: DataFrame, valueCol: String = "value",
                   defaultYear: Int = 2024,
                   dropTrailingCr: Boolean = false,
                   escapeControlCharacters: Boolean = true): DataFrame = {
    val sanitized = sanitize(col(valueCol), dropTrailingCr, escapeControlCharacters)
    lines
      .withColumn("rawmsg", sanitized)
      .withColumn("p", rainer.parse_syslog(col("rawmsg"), defaultYear))
      .select((lines.columns.filter(_ != valueCol).map(col) :+ col("rawmsg")) ++
        Seq("protocol_version", "pri", "facility", "severity", "ts", "hostname",
          "app_name", "procid", "msgid", "structured_data", "syslogtag",
          "programname", "msg", "parsesuccess").map(f => col(s"p.$f").as(f)): _*)
      .withColumn("vars_msg", lit("{}"))
      .withColumn("vars_local", lit("{}"))
  }

  /** omfile with dynafile semantics: the dynafile path template becomes
    * partition columns -- rsyslog's template-computed file path + LRU fd
    * cache (tools/omfile.c:276-319) IS partitioned-write in Spark. */
  def omfilePartitioned(df: DataFrame, outPath: String,
                        partitionCols: Seq[String], format: String = "parquet"): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*)
      .format(format).save(outPath)

  /** omfile static-file batch sink: render a template column to text. */
  def omfileText(df: DataFrame, lineCol: String, outPath: String): Unit =
    df.select(col(lineCol)).write.mode("overwrite").text(outPath)

  /** Shape a frame to the Spark Kafka SINK contract (topic/key/value) —
    * the pure, broker-free half of omkafka. dynatopic == the `topic`
    * column (plugins/omkafka dynatopic param); `keyCol` is omkafka's
    * partitioning key (`key` param), None = sticky partitioner. Split out
    * from the writer so the protocol shaping is testable in a sandbox
    * with no broker and no kafka connector jar.
    */
  def kafkaSinkFrame(ds: DataFrame, topicCol: String, valueCol: String,
                     keyCol: Option[String] = None): DataFrame = {
    val base = Seq(col(topicCol).cast("string").as("topic"),
      col(valueCol).cast("string").as("value"))
    ds.select(keyCol.map(k => base :+ col(k).cast("string").as("key"))
      .getOrElse(base): _*)
  }

  /** omkafka config builder (native Kafka sink). */
  def omkafka(ds: DataFrame, brokers: String, topicCol: String,
              valueCol: String): DataStreamWriter[Row] =
    kafkaSinkFrame(ds, topicCol, valueCol)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)

  /** imkafka decode: a Kafka-SOURCE-shaped frame (the Spark kafka source
    * contract: key/value binary + topic/partition/offset/timestamp) to
    * decoded pipeline rows with imkafka's provenance (inputname=imkafka,
    * plugins/imkafka/imkafka.c msgConsume; offset/partition kept the way
    * imfile keeps file/line provenance). Works identically on the real
    * `readStream.format("kafka")` output and on a synthesized frame — the
    * connector only changes who PRODUCES the contract columns.
    */
  def imkafkaDecode(kafka: DataFrame, defaultYear: Int = 2024): DataFrame = {
    val lines = kafka.select(
      col("value").cast("string").as("value"),
      lit("imkafka").as("inputname"),
      col("topic").cast("string").as("topic"),
      col("partition").cast("int").as("partition"),
      col("offset").cast("long").as("offset"))
    decodeSyslog(lines, defaultYear = defaultYear)
  }

  /** immark heartbeat with action-side mark suppression (plugins/immark
    * emits "-- MARK --" every interval; an action with
    * writeAllMarkMessages="off" writes a mark only if nothing else was
    * written in the preceding interval — tools/rsyslogd.c mark handling).
    *
    * Set re-expression: the mark lattice = per-host interval boundaries
    * across the frame's time span; suppression = anti-join against the
    * set of boundaries whose preceding interval saw a real message. All
    * declarative — the lattice is hosts x intervals (tiny next to the
    * event volume at any scale) and both joins shuffle only lattice-sized
    * frames.
    */
  def immarkMarks(ev: DataFrame, hostCol: org.apache.spark.sql.Column,
                  tsCol: org.apache.spark.sql.Column): DataFrame = {
    // hour-aligned lattice; other MarkIntervals need their own alignment
    val step = expr("INTERVAL 1 HOUR")
    val named = ev.select(hostCol.as("host"), tsCol.as("t"))
    val span = named.agg(
      date_trunc("hour", min(col("t"))).as("t0"),
      date_trunc("hour", max(col("t"))).as("t1"))
    val marks = span.select(explode(
      sequence(col("t0") + step, col("t1") + step, step)).as("mark_ts"))
    val hosts = named.select(col("host")).distinct()
    val activity = named.select(col("host"),
      (date_trunc("hour", col("t")) + step).as("mark_ts")).distinct()
    hosts.crossJoin(broadcast(marks))
      .join(activity, Seq("host", "mark_ts"), "left_anti")
      .select(col("host"), col("mark_ts"), lit("-- MARK --").as("msg"))
  }

  /** impstats-style engine self-metrics: per-query observed counters via
    * the observe API (statsobj/impstats -> StreamingQueryListener in
    * streaming; observe() in batch). */
  def withStats(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("n_processed"),
      sum(when(col("parsesuccess") === false, 1).otherwise(0)).as("n_parse_fail"))
}
