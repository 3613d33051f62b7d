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

  /** CEE stats line (runtime/statsobj.c:390-446): "@cee: " cookie + the
    * JSON object with name/origin context then counters, compact JSON. */
  def ceeLine(name: Column, origin: String, ctrs: Seq[(String, Column)]): Column =
    concat(lit("@cee: {\"name\":\""), name,
      lit("\",\"origin\":\"" + origin + "\""),
      concat(ctrs.map { case (k, v) =>
        concat(lit(",\"" + k + "\":"), v.cast("string")) }: _*),
      lit("}"))

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
