package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.JsonEscapeExpr

/** Cloud/telemetry sink shaping (SURVEY §2.10): omawslogshlc, omazuredce,
  * omazureeventhubs, omhttpfs. As with the other sink families, the engine
  * owns the deterministic payload/batch construction; the HTTP/AMQP
  * transport (curl, qpid-proton, OAuth token refresh) is the foreachBatch
  * boundary the platform provides.
  *
  * Batching discipline: both HTTP collectors batch greedily in arrival
  * order with byte caps (and, for HLC, an event-count cap). That is a
  * sequential fold, so it runs as ONE pass over key-sorted partitions
  * (repartition by stream key + sortWithinPartitions + mapPartitions with
  * O(batch) memory — the same buffer bound the C worker holds). No
  * driver-side state, no per-batch shuffle.
  */
object CloudSinks {

  // ---------------------------------------------------------------------
  // Greedy batch packer (shared by omawslogshlc / omazuredce)
  // ---------------------------------------------------------------------

  /** One packed request payload. `n_dropped` counts events rejected by the
    * per-event size cap (the reference LogError-and-fail path). */
  case class Packed(key: String, batch_idx: Long,
                    payload: String, n_events: Long,
                    payload_bytes: Long, n_dropped: Long,
                    first_ord: Long, last_ord: Long)

  /** Greedy, order-preserving batch packing with the reference's flush
    * rules (omawslogshlc.c appendEvent:229-253 + doAction:523;
    * omazuredce.c addMessageToBatchUnlocked:861-899):
    *
    *  - an event whose own bytes exceed `perEventMaxBytes` flushes the
    *    current batch, then is DROPPED (counted in `n_dropped` of the
    *    following batch row, or a trailing all-dropped row);
    *  - if appending would push `prefix + events + seps + suffix +
    *    overheadBytes` past `maxPayloadBytes`, the batch flushes first;
    *  - after appending, reaching `maxEvents` flushes (HLC's
    *    max_batch_size, checked post-append like omawslogshlc.c:523).
    *
    * Payload text is `prefix + mkString(sep) + suffix` — "" / "" / "" for
    * HLC's concatenated objects, "[" / "," / "]" for DCE's JSON array.
    * Byte accounting is UTF-8, like the C strlen over utf-8 renders.
    *
    * Input must carry (key: String, ord: Long, event: String); rows are
    * re-sorted (key, ord) within hash-partitioned groups, so the packing
    * is deterministic under any cluster layout. Memory per task is one
    * batch buffer (≤ maxPayloadBytes), exactly the C worker's bound.
    */
  def greedyPack(ds: DataFrame, keyCol: String, ordCol: String,
                 eventCol: String, maxEvents: Int = Int.MaxValue,
                 maxPayloadBytes: Long = Long.MaxValue,
                 perEventMaxBytes: Long = Long.MaxValue,
                 sep: String = "", prefix: String = "", suffix: String = "",
                 overheadBytes: Long = 0L): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val in = ds.select(col(keyCol).cast("string").as("k"),
        col(ordCol).cast("long").as("o"), col(eventCol).as("e"))
      .as[(String, Long, String)]
    val packed = in
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"))
      .mapPartitions(rows => packIterator(rows, maxEvents, maxPayloadBytes,
        perEventMaxBytes, sep, prefix, suffix, overheadBytes))
    packed.toDF().withColumnRenamed("key", keyCol)
  }

  /** The pure packing state machine `greedyPack` runs per partition —
    * factored out so the flush rules are property-testable without a
    * Spark session. Input must arrive sorted by (key, ord).
    *
    * Streaming pack: memory = one batch buffer (≤ maxPayloadBytes)
    * plus ≤2 queued emissions — the C worker's own bound. The input
    * iterator is consumed lazily; batches of one partition are never
    * all materialized at once.
    */
  private[graft] def packIterator(rows: Iterator[(String, Long, String)],
                                  maxEvents: Int, maxPayloadBytes: Long,
                                  perEventMaxBytes: Long, sep: String,
                                  prefix: String, suffix: String,
                                  overheadBytes: Long): Iterator[Packed] = {
    val fixed = prefix.getBytes("UTF-8").length.toLong +
      suffix.getBytes("UTF-8").length.toLong + overheadBytes
    val sepLen = sep.getBytes("UTF-8").length.toLong
    new Iterator[Packed] {
          private val out = scala.collection.mutable.Queue.empty[Packed]
          private var curKey: String = null
          private var batchIdx = 0L
          private val buf = new StringBuilder
          private var bufBytes = 0L
          private var nEvents = 0L
          private var nDropped = 0L
          private var firstOrd = 0L
          private var lastOrd = 0L
          private var finished = false

          private def emit(): Unit =
            if (nEvents > 0 || nDropped > 0) {
              out.enqueue(Packed(curKey, batchIdx,
                prefix + buf.result() + suffix, nEvents,
                fixed - overheadBytes + bufBytes, nDropped, firstOrd, lastOrd))
              batchIdx += 1
              buf.clear(); bufBytes = 0L; nEvents = 0L; nDropped = 0L
            }

          private def step(): Unit = {
            while (out.isEmpty && rows.hasNext) {
              val (k, o, e) = rows.next()
              if (curKey == null) curKey = k
              if (k != curKey) {       // key boundary: close out, restart
                emit(); curKey = k; batchIdx = 0L
              }
              val eBytes = e.getBytes("UTF-8").length.toLong
              if (eBytes > perEventMaxBytes) {
                emit()                 // flush-then-drop (omawslogshlc.c:229)
                nDropped += 1
              } else {
                val withSep = eBytes + (if (nEvents > 0) sepLen else 0L)
                if (nEvents > 0 && fixed + bufBytes + withSep > maxPayloadBytes)
                  emit()               // byte cap: flush BEFORE append
                if (nEvents > 0) { buf.append(sep); bufBytes += sepLen }
                else firstOrd = o
                buf.append(e); bufBytes += eBytes
                nEvents += 1; lastOrd = o
                if (nEvents >= maxEvents) emit()  // count cap: post-append
              }
            }
            if (out.isEmpty && !rows.hasNext && !finished) {
              emit(); finished = true  // final partial batch
            }
          }

          override def hasNext: Boolean = { step(); out.nonEmpty }
          override def next(): Packed = {
            if (!hasNext) throw new NoSuchElementException
            out.dequeue()
          }
    }
  }

  // ---------------------------------------------------------------------
  // omawslogshlc — CloudWatch Logs HTTP Log Collector
  // ---------------------------------------------------------------------

  /** One HLC event object (omawslogshlc.c appendEvent:129-215):
    * `{"event":"<msg>","time":<epoch>,"host":"<host>","source":"rsyslog"}`
    * with the reference's JSON escape table (the two-char escapes for
    * `"` `\` \b \f \n \r \t, `\u%04x` for remaining C0 controls) and
    * `%.6f` time. Empty/null msg renders as "(empty)" (:135-137).
    *
    * Determinism seams (documented, not behavioral gaps): the reference
    * stamps gettimeofday() at append time and gethostname() of the
    * collector — a wall-clock and a deployment identity. The engine takes
    * both as columns (message time / configured host) so payloads are
    * reproducible across re-runs and executors; at the foreachBatch
    * transport boundary a caller wanting literal C behavior passes
    * current_timestamp() and the executor hostname.
    */
  def awsHlcEvent(msgCol: Column, tsCol: Column, hostCol: Column): Column = {
    val m = when(msgCol.isNull || length(msgCol) === 0, lit("(empty)"))
      .otherwise(msgCol)
    val esc = JsonEscapeExpr.escape(m)
    // %.6f of tv_sec + tv_usec/1e6 ≡ integer seconds '.' zero-padded µs
    // (exact for the µs-resolution timestamps the engine carries)
    val us = unix_micros(tsCol)
    val timeStr = concat(floor(us / 1000000L).cast("long").cast("string"),
      lit("."), lpad((us % 1000000L).cast("string"), 6, "0"))
    concat(lit("{\"event\":\""), esc, lit("\",\"time\":"), timeStr,
      lit(",\"host\":\""), JsonEscapeExpr.escape(hostCol),
      lit("\",\"source\":\"rsyslog\"}"))
  }

  /** HLC endpoint URL (omawslogshlc.c postBatch:296-315): log group and
    * stream are URL-encoded into the query string. */
  def awsHlcUrl(region: String, logGroup: String, logStream: String): String = {
    val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
      .replace("+", "%20")  // curl_easy_escape %20-encodes spaces
    s"https://logs.$region.amazonaws.com/services/collector/event" +
      s"?logGroup=${enc(logGroup)}&logStream=${enc(logStream)}"
  }

  /** Batch HLC events per stream key: concatenated JSON objects (no
    * separator/wrapper — "The HLC endpoint accepts concatenated JSON
    * objects", omawslogshlc.c:125-127), flushed at max_batch_size events
    * (default 100, AWS-recommended, :407), the 1 MiB request cap, and the
    * 256 KiB per-event cap. */
  def awsHlcBatches(ds: DataFrame, keyCol: String, ordCol: String,
                    eventCol: String, maxBatchSize: Int = 100): DataFrame =
    greedyPack(ds, keyCol, ordCol, eventCol, maxEvents = maxBatchSize,
      maxPayloadBytes = 1024L * 1024L, perEventMaxBytes = 256L * 1024L)

  // ---------------------------------------------------------------------
  // omazuredce — Azure Monitor Data Collection Endpoint
  // ---------------------------------------------------------------------

  /** Validate-and-compact one DCE record (omazuredce.c
    * buildRecordJson:668-727): the rendered template must be a single
    * JSON OBJECT (trailing whitespace tolerated, trailing garbage or a
    * non-object → error ⇒ null here, the row never joins a batch), and is
    * re-serialized in json-c PLAIN form — compact, key order preserved —
    * before batching, so template formatting can't bloat the payload. */
  def azureDceRecord(msgCol: Column): Column =
    graft.functions.JsonCompactExpr.compact(msgCol)

  /** DCE ingestion URL (omazuredce.c buildDceUrl:407-430). */
  def azureDceUrl(dceUrl: String, dcrId: String, tableName: String): String = {
    val slash = if (dceUrl.endsWith("/")) "" else "/"
    s"$dceUrl${slash}dataCollectionRules/$dcrId/streams/$tableName" +
      "?api-version=2023-01-01"
  }

  /** Batch compacted DCE records into JSON-array request payloads
    * (omazuredce.c: batchBuf always starts '[', records comma-joined,
    * ']' appended at flush). The cap applies to the ESTIMATED HTTP
    * request — payload plus header overhead (estimateHttpRequestBytes:
    * 469-480, auth token + fixed headers) — which `overheadBytes`
    * models; a record that cannot fit alone is dropped (:881-885).
    * Null records (failed validation) never reach the packer. */
  def azureDceBatches(ds: DataFrame, keyCol: String, ordCol: String,
                      recordCol: String, maxBatchBytes: Long = 1024L * 1024L,
                      overheadBytes: Long = 0L): DataFrame =
    greedyPack(ds.filter(col(recordCol).isNotNull), keyCol, ordCol, recordCol,
      maxPayloadBytes = maxBatchBytes,
      perEventMaxBytes = maxBatchBytes - 2 - overheadBytes,
      sep = ",", prefix = "[", suffix = "]", overheadBytes = overheadBytes)

  // ---------------------------------------------------------------------
  // omazureeventhubs — Event Hubs AMQP 1.0 producer
  // ---------------------------------------------------------------------

  /** AMQP message shaping for Event Hubs (omazureeventhubs.c
    * proton_encode_message:297-334): content-type
    * "application/octet-stream", inferred=true, a per-worker decimal
    * sequence number as the string message id (writeProton:534-546), the
    * configured static `eventproperties` key/value map as AMQP
    * application properties, and the rendered template as the BINARY
    * body. creation-time is qpid's ms-epoch timestamp (time_now:
    * 1136-1140) — wall-clock at encode in the reference; the engine takes
    * it from `tsCol` for reproducibility (same seam as awsHlcEvent).
    * The AMQP connection/SASL/flow machinery is qpid-proton = transport.
    */
  def eventHubsMessage(ds: DataFrame, payloadCol: Column, seqCol: Column,
                       tsCol: Column, amqpAddress: String,
                       eventProperties: Seq[(String, String)] = Nil): DataFrame = {
    val props =
      if (eventProperties.isEmpty) lit(null).cast("map<string,string>")
      else map(eventProperties.flatMap {
        case (k, v) => Seq(lit(k), lit(v)) }: _*)
    ds.withColumn("amqp_message", to_json(struct(
      lit(amqpAddress).as("address"),
      seqCol.cast("string").as("message_id"),
      lit("application/octet-stream").as("content_type"),
      lit(true).as("inferred"),
      floor(unix_micros(tsCol) / 1000L).cast("long").as("creation_time"),
      props.as("properties"),
      payloadCol.as("body"))))
  }

  // ---------------------------------------------------------------------
  // omhttpfs — HDFS over WebHDFS/HttpFS REST
  // ---------------------------------------------------------------------

  /** Per-message WebHDFS request shaping (contrib/omhttpfs/omhttpfs.c):
    * the append-URL and the create-URL the retry ladder walks
    * (httpfs_log:544-600: APPEND → 404 ⇒ CREATE&overwrite=false →
    * FileAlreadyExists ⇒ APPEND), with dynafile support (doAction:
    * 677-694: template-computed path per message). URL grammar is
    * httpfs_build_url:184-221 — scheme by `https`, `/webhdfs/v1` prefix,
    * a '/' spliced iff the file doesn't start with one, `?user.name=`.
    * Body = the rendered message; Content-Type application/octet-stream.
    * The curl session/cookie jar and status-code ladder are transport.
    */
  def httpfsRequests(ds: DataFrame, fileCol: Column, bodyCol: Column,
                     host: String, port: Int = 14000, https: Boolean = false,
                     user: String = "hdfs"): DataFrame = {
    val base = concat(
      lit((if (https) "https://" else "http://") + host + ":" + port +
        "/webhdfs/v1"),
      when(fileCol.startsWith("/"), fileCol)
        .otherwise(concat(lit("/"), fileCol)),
      lit(s"?user.name=$user"))
    ds.withColumn("url_append", concat(base, lit("&op=append&data=true")))
      .withColumn("url_create",
        concat(base, lit("&op=create&overwrite=false&data=true")))
      .withColumn("hdfs_body", bodyCol)
  }
}
