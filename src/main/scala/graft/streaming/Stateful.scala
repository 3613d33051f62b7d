package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming stateful operators mirroring rsyslog's runtime
  * state machines. All use flatMapGroupsWithState — state is per-key,
  * partitioned by Spark's state store, so a 1000-executor run shards key
  * space with no coordination (the reference shards the same way across
  * worker threads, runtime/ratelimit.c / runtime/dynstats.c).
  */
object Stateful {

  // ---------------------------------------------------------------- ratelimit

  case class RlInput(key: String, tsMillis: Long, payload: String)
  case class RlState(windowStart: Long, used: Long)
  case class RlOutput(key: String, tsMillis: Long, payload: String, dropped: Boolean)

  /** Token bucket `interval`+`burst` per key (runtime/ratelimit.c:388-404):
    * within each interval window at most `burst` messages pass; emits
    * passed rows (and optionally drop markers, mirroring the "begin to
    * drop messages" mark rsyslog logs).
    */
  def rateLimit(ds: Dataset[RlInput], intervalMillis: Long, burst: Long,
                emitDropMarks: Boolean = false): Dataset[RlOutput] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[RlState, RlOutput](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[RlState]) =>
          var st = state.getOption.getOrElse(RlState(Long.MinValue, 0))
          val out = scala.collection.mutable.ArrayBuffer.empty[RlOutput]
          rows.toSeq.sortBy(_.tsMillis).foreach { r =>
            val win = r.tsMillis / intervalMillis
            // only a FORWARD window move resets the bucket: late rows from
            // an earlier window count against the stored one, so event-time
            // regressions can never re-admit a fresh burst
            if (win > st.windowStart) st = RlState(win, 0)
            if (st.used < burst) {
              st = st.copy(used = st.used + 1)
              out += RlOutput(key, r.tsMillis, r.payload, dropped = false)
            } else if (emitDropMarks && st.used == burst) {
              st = st.copy(used = st.used + 1)
              out += RlOutput(key, r.tsMillis, "begin to drop messages", dropped = true)
            } else st = st.copy(used = st.used + 1)
          }
          state.update(st)
          out.iterator
      }
  }

  // ---------------------------------------------------------------- dynstats

  case class DynInput(bucket: String, key: String, tsMillis: Long)
  case class DynState(counters: Map[String, Long], lastSeen: Map[String, Long],
                      overflow: Long)
  case class DynSnapshot(bucket: String, metric: String, value: Long)
  /** per-input-partition digest of one (bucket, key): count + first/last
    * arrival time within the micro-batch partition. */
  case class DynPartial(bucket: String, key: String, n: Long,
                        firstTs: Long, lastTs: Long)

  /** map-side combine for dynStats: collapse one input partition's raw
    * rows to per-(bucket, key) partials. Stateless and narrow — runs with
    * the source's full parallelism, so a single hot bucket is digested by
    * every task instead of funneling raw rows into one state-store task. */
  private[graft] def digestPartition(it: Iterator[DynInput]): Iterator[DynPartial] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[(String, String), (Long, Long, Long)]
    it.foreach { r =>
      val k = (r.bucket, r.key)
      val (n, f, l) = m.getOrElse(k, (0L, Long.MaxValue, Long.MinValue))
      m(k) = (n + 1, math.min(f, r.tsMillis), math.max(l, r.tsMillis))
    }
    m.iterator.map { case ((b, k), (n, f, l)) => DynPartial(b, k, n, f, l) }
  }

  /** dyn_stats bucket with maxCardinality cap and unusedMetricLife TTL
    * (runtime/dynstats.c:73-97): new keys beyond the cap increment
    * ops_overflow; keys idle past the TTL are evicted. Emits the full
    * counter snapshot on every trigger (impstats-style interval flush).
    *
    * Scale shape: raw rows never reach the per-bucket state task. Each
    * input partition first collapses to per-(bucket, key) partials
    * (`digestPartition` — the map-side combine), so the single stateful
    * task per bucket merges ≤ partitions × distinct-keys digest rows, not
    * the bucket's whole event volume. Admission under the cap depends
    * ONLY on each key's FIRST arrival time, so processing merged digests
    * in first-arrival order is exactly the reference's arrival-order
    * admission (the reference pays a bucket mutex per op; we pay one
    * narrow digest pass + a tiny shuffle).
    */
  def dynStats(ds: Dataset[DynInput], maxCardinality: Int,
               unusedMetricLifeMillis: Long): Dataset[DynSnapshot] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(digestPartition _)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[DynState, DynSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (bucket, parts, state: GroupState[DynState]) =>
          var st = state.getOption.getOrElse(DynState(Map.empty, Map.empty, 0))
          // merge the per-partition partials per key
          val merged = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]
          parts.foreach { p =>
            val (n, f, l) = merged.getOrElse(p.key, (0L, Long.MaxValue, Long.MinValue))
            merged(p.key) = (n + p.n, math.min(f, p.firstTs), math.max(l, p.lastTs))
          }
          var maxTs = 0L
          // arrival-order determinism: which keys land under the
          // maxCardinality cap depends on first-arrival order (key name as
          // the tie-break for equal timestamps — the row-level order was
          // iterator-dependent there, this is strictly more deterministic)
          merged.toSeq.sortBy { case (k, (_, f, _)) => (f, k) }.foreach {
            case (k, (n, _, l)) =>
              maxTs = math.max(maxTs, l)
              st.counters.get(k) match {
                case Some(c) =>
                  st = st.copy(counters = st.counters + (k -> (c + n)),
                    lastSeen = st.lastSeen + (k -> l))
                case None if st.counters.size < maxCardinality =>
                  st = st.copy(counters = st.counters + (k -> n),
                    lastSeen = st.lastSeen + (k -> l))
                case None => st = st.copy(overflow = st.overflow + n)
              }
          }
          // TTL eviction (unusedMetricLife)
          val expired = st.lastSeen.filter(_._2 < maxTs - unusedMetricLifeMillis).keySet
          if (expired.nonEmpty)
            st = st.copy(counters = st.counters -- expired, lastSeen = st.lastSeen -- expired)
          state.update(st)
          (st.counters.map { case (k, v) => DynSnapshot(bucket, k, v) } ++
            (if (st.overflow > 0) Seq(DynSnapshot(bucket, "ops_overflow", st.overflow))
             else Nil)).iterator
      }
  }

  // ---------------------------------------------------------------- perctile

  case class PctInput(bucket: String, key: String, value: Long)
  case class PctState(ring: Vector[Long])
  case class PctSnapshot(bucket: String, key: String, window_count: Long,
                         window_min: Long, window_max: Long, window_sum: Long,
                         p50: Long, p95: Long, p99: Long)

  /** percentile_stats ring buffer of the last `windowSize` observations
    * per (bucket, key), emitting p50/p95/p99 + min/max/sum/count
    * (runtime/perctile_stats.c:239-343, perctile_ringbuf.c). Exact within
    * the window — matches the reference's ring-buffer semantics rather
    * than a sketch. */
  def perctileStats(ds: Dataset[PctInput], windowSize: Int): Dataset[PctSnapshot] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.bucket, r.key))
      .flatMapGroupsWithState[PctState, PctSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bucket, key), rows, state: GroupState[PctState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          rows.foreach { r => ring = (ring :+ r.value).takeRight(windowSize) }
          state.update(PctState(ring))
          if (ring.isEmpty) Iterator.empty
          else {
            val sorted = ring.sorted
            def pct(p: Double): Long =
              sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
            Iterator.single(PctSnapshot(bucket, key, ring.size, sorted.head,
              sorted.last, ring.sum, pct(0.50), pct(0.95), pct(0.99)))
          }
      }
  }

  // ---------------------------------------------------------- streaming dedup

  /** Streaming exact dedup on a content fingerprint, state bounded by the
    * watermark horizon (the streaming face of Dedup.exact — at 100 TB/day
    * the watermark is what keeps fingerprint state finite).
    * dropDuplicatesWithinWatermark is required here: plain
    * dropDuplicates("fp") would never evict state because the event-time
    * column is not part of the dedup key — fingerprints would accumulate
    * until the state store OOMs. */
  def dedupExact(df: org.apache.spark.sql.DataFrame, textCol: String,
                 eventTimeCol: String, watermark: String): org.apache.spark.sql.DataFrame =
    df.withColumn("fp", graft.operators.TextAnalysis.fingerprint(
        org.apache.spark.sql.functions.col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  // ------------------------------------------------------- repeated-msg squash

  case class RrInput(key: String, seq: Long, msg: String, ts: java.sql.Timestamp)
  case class RrState(lastMsg: String, lastSeq: Long, suppressed: Long)
  case class RrOutput(key: String, seq: Long, msg: String, synthetic: Boolean)

  /** Streaming "last message repeated n times" reduction
    * (runtime/action.c:172 RepeatedMsgReduction): the first occurrence
    * passes, consecutive identical messages per key are suppressed; when a
    * different message arrives, a synthetic repeat-mark is emitted first.
    * State (last message + suppressed count) survives micro-batch
    * boundaries, so a run spanning triggers still collapses.
    *
    * Flush is EVENT-TIME driven: a key whose run goes quiet emits its
    * pending repeat-mark once the watermark passes lastTs + flushAfterMs
    * (the reference's iSecsExecOnceInterval timer flush — without it a
    * trailing suppressed run would be silently lost). EventTimeTimeout is
    * deliberate: ProcessingTimeTimeout makes
    * FlatMapGroupsWithStateExec.shouldRunAnotherBatch permanently true, so
    * a 0-interval trigger busy-loops empty micro-batches and
    * processAllAvailable() never observes quiescence — with event-time
    * timeouts extra batches run only while the watermark advances, which
    * requires new data. The timeout also evicts idle-key state, bounding
    * the state store at 100 TB key cardinality.
    *
    * `flushAfterMs` ≤ 0 means "flush a run as soon as the watermark passes
    * its last event" — the bounded-stream drain the verification gate uses
    * (with 0 the max-event-time run would tie the final watermark and the
    * strict `timeout < watermark` expiry check would never fire it). */
  def repeatedMsgSquash(ds: Dataset[RrInput],
                        watermarkDelay: String = "0 seconds",
                        flushAfterMs: Long = 30000L): Dataset[RrOutput] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[RrState, RrOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[RrState]) =>
          if (state.hasTimedOut) {
            // quiet key: emit the pending mark and forget the run, so a
            // later identical message starts a fresh run (reference
            // semantics after the timer fires)
            val st = state.get
            state.remove()
            if (st.suppressed > 0)
              Iterator.single(RrOutput(key, st.lastSeq,
                s"last message repeated ${st.suppressed} times", synthetic = true))
            else Iterator.empty
          } else {
            var st = state.getOption.orNull
            var maxTs = Long.MinValue
            val out = scala.collection.mutable.ArrayBuffer.empty[RrOutput]
            rows.toSeq.sortBy(_.seq).foreach { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              if (st == null) {
                out += RrOutput(key, r.seq, r.msg, synthetic = false)
                st = RrState(r.msg, r.seq, 0)
              } else if (r.msg == st.lastMsg) {
                st = RrState(st.lastMsg, r.seq, st.suppressed + 1)
              } else {
                if (st.suppressed > 0)
                  out += RrOutput(key, r.seq,
                    s"last message repeated ${st.suppressed} times", synthetic = true)
                out += RrOutput(key, r.seq, r.msg, synthetic = false)
                st = RrState(r.msg, r.seq, 0)
              }
            }
            state.update(st)
            // must be strictly ahead of the current watermark or Spark
            // rejects the timestamp; max() guards late batches
            state.setTimeoutTimestamp(
              math.max(maxTs + flushAfterMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  // ------------------------------------------------------------- sender track

  case class StInput(sender: String, tsMillis: Long, bytes: Long)
  case class StState(firstSeen: Long, lastSeen: Long, n: Long, bytes: Long)
  case class StSnapshot(sender: String, first_seen: Long, last_seen: Long,
                        n_msgs: Long, n_bytes: Long)

  /** omsendertrack per-sender statistics (plugins/omsendertrack): running
    * first/last-seen + message/byte counters per sender, snapshot emitted
    * every trigger (the reference writes periodic JSON snapshots). */
  def senderTrack(ds: Dataset[StInput]): Dataset[StSnapshot] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.sender)
      .flatMapGroupsWithState[StState, StSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (sender, rows, state: GroupState[StState]) =>
          var st = state.getOption.getOrElse(
            StState(Long.MaxValue, Long.MinValue, 0, 0))
          rows.foreach { r =>
            st = StState(math.min(st.firstSeen, r.tsMillis),
              math.max(st.lastSeen, r.tsMillis), st.n + 1, st.bytes + r.bytes)
          }
          state.update(st)
          Iterator.single(StSnapshot(sender, st.firstSeen, st.lastSeen, st.n, st.bytes))
      }
  }

  // ---------------------------------------------------------------- multiline

  case class MlInput(key: String, seq: Long, line: String, ts: java.sql.Timestamp)
  case class MlState(pending: Option[String], startSeq: Long, lastSeq: Long,
                     ignoring: Boolean)
  case class MlOutput(key: String, startSeq: Long, record: String)

  /** imfile multiline assembly, regex flavor (runtime/stream.c
    * strmReadMultiLine, plugins/imfile/imfile.c startmsg.regex /
    * endmsg.regex):
    *
    *  - a line matching `startRegex` completes the previous record and
    *    begins a new one; a line matching `endRegex` completes the record
    *    including itself (a line may match both: it completes the previous
    *    record AND emits alone).
    *  - continuation lines join with `\n`-escape (`escapeLFString`,
    *    default the two characters `\n` as in strmReadMultiLine) or a raw
    *    newline when `escapeLF` is false.
    *  - lines before the first start accumulate and flush at the first
    *    start (the reference buffers them as prevMsgSegment).
    *  - a record crossing `maxMsgSize` emits truncated at the boundary;
    *    the line remainder starts a new record, or — with
    *    `discardTruncatedMsg` — is dropped until the next start match
    *    (imfile discardTruncatedMsg / msgDiscardingError semantics).
    *  - a key quiet past `flushAfterMs` of event time emits its pending
    *    record (imfile readTimeout; `flushAfterMs` ≤ 0 drains at the
    *    final watermark — see repeatedMsgSquash).
    *  - a `seq` regression (file truncated + rewritten under the reader,
    *    imfile reopenOnTruncate) flushes the pending record and resets.
    */
  def imfileMultiline(ds: Dataset[MlInput],
                      startRegex: Option[String], endRegex: Option[String],
                      escapeLF: Boolean = true,
                      escapeLFString: Option[String] = None,
                      maxMsgSize: Int = 8096,
                      discardTruncatedMsg: Boolean = false,
                      watermarkDelay: String = "0 seconds",
                      flushAfterMs: Long = 30000L): Dataset[MlOutput] = {
    import ds.sparkSession.implicits._
    require(startRegex.nonEmpty || endRegex.nonEmpty,
      "imfileMultiline needs startmsg.regex and/or endmsg.regex")
    val sep = if (escapeLF) escapeLFString.getOrElse("\\n") else "\n"
    val (sre, ere) = (startRegex, endRegex)
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[MlState, MlOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[MlState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            st.pending.map(p => MlOutput(key, st.startSeq, p)).iterator
          } else {
            val sp = sre.map(java.util.regex.Pattern.compile)
            val ep = ere.map(java.util.regex.Pattern.compile)
            var st = state.getOption.getOrElse(MlState(None, -1L, Long.MinValue, false))
            var maxTs = Long.MinValue
            val out = scala.collection.mutable.ArrayBuffer.empty[MlOutput]
            def flush(): Unit = {
              st.pending.foreach(p => out += MlOutput(key, st.startSeq, p))
              st = st.copy(pending = None)
            }
            // truncate at record-construction time (imfile caps EVERY
            // record at maxMsgSize, including a single oversize line):
            // full-size head chunk(s) emit immediately; the tail seeds the
            // pending record, or with discardTruncatedMsg the tail is
            // dropped and continuation lines ignored until the next match
            def clampPending(text: String, seq: Long): Unit = {
              var rest = text
              var dropped = false
              while (!dropped && rest.length > maxMsgSize) {
                out += MlOutput(key, seq, rest.take(maxMsgSize))
                if (discardTruncatedMsg) dropped = true
                else rest = rest.drop(maxMsgSize)
              }
              st =
                if (dropped) st.copy(pending = None, ignoring = true)
                else st.copy(pending = Some(rest), startSeq = seq)
            }
            // arrival order = read time then file offset: a truncated-and-
            // rewritten file REGRESSES seq at a LATER read time, and that
            // order must survive the sort for the reset to be seen
            rows.toSeq.sortBy(r => (r.ts.getTime, r.seq)).foreach { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              if (r.seq < st.lastSeq) { // truncation: file restarted
                flush(); st = MlState(None, -1L, Long.MinValue, false)
              }
              val isStart = sp.exists(_.matcher(r.line).find())
              val isEnd = ep.exists(_.matcher(r.line).find())
              if (isStart) {
                if (!st.ignoring) flush()
                st = MlState(None, r.seq, r.seq, false)
                clampPending(r.line, r.seq)
              } else if (!st.ignoring) {
                st.pending match {
                  case None => clampPending(r.line, r.seq)
                  case Some(p) =>
                    val joined = p + sep
                    if (joined.length + r.line.length < maxMsgSize)
                      st = st.copy(pending = Some(joined + r.line))
                    else { // oversize: emit truncated, remainder continues/drops
                      val keep = math.max(0, maxMsgSize - joined.length)
                      // .take also caps the keep=0 case, where `joined`
                      // alone exceeds maxMsgSize by the separator length
                      out += MlOutput(key, st.startSeq,
                        (joined + r.line.take(keep)).take(maxMsgSize))
                      if (discardTruncatedMsg)
                        st = st.copy(pending = None, ignoring = true)
                      else clampPending(r.line.drop(keep), r.seq)
                    }
                }
              }
              if (isEnd) {
                if (!st.ignoring) flush()
                st = st.copy(ignoring = false)
              }
              st = st.copy(lastSeq = r.seq)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(maxTs + flushAfterMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** imfile readMode assembly (runtime/stream.c strmReadLine modes 1/2,
    * line-level re-expression of the char loop):
    *
    *  - mode 1 ("paragraph"): blank lines separate records; record lines
    *    join with `escapeLFString` (default `#012`) or a raw newline.
    *  - mode 2 ("indented"): a line starting with space/tab continues the
    *    previous record; blank lines terminate; `trimLineOverBytes` keeps
    *    the first N chars of an oversize record.
    *
    * Timer flush / truncation reset as in imfileMultiline. */
  def imfileReadMode(ds: Dataset[MlInput], readMode: Int,
                     escapeLF: Boolean = true,
                     escapeLFString: Option[String] = None,
                     trimLineOverBytes: Int = 0,
                     watermarkDelay: String = "0 seconds",
                     flushAfterMs: Long = 30000L): Dataset[MlOutput] = {
    import ds.sparkSession.implicits._
    require(readMode == 1 || readMode == 2,
      "readMode 0 is plain line input; use the source directly")
    val sep = if (escapeLF) escapeLFString.getOrElse("#012") else "\n"
    def trim(s: String): String =
      if (trimLineOverBytes > 0 && s.length > trimLineOverBytes)
        s.take(trimLineOverBytes) else s
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[MlState, MlOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[MlState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            st.pending.map(p => MlOutput(key, st.startSeq, trim(p))).iterator
          } else {
            var st = state.getOption.getOrElse(MlState(None, -1L, Long.MinValue, false))
            var maxTs = Long.MinValue
            val out = scala.collection.mutable.ArrayBuffer.empty[MlOutput]
            def flush(): Unit = {
              st.pending.foreach(p => out += MlOutput(key, st.startSeq, trim(p)))
              st = st.copy(pending = None)
            }
            // arrival order = read time then file offset (see imfileMultiline)
            rows.toSeq.sortBy(r => (r.ts.getTime, r.seq)).foreach { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              if (r.seq < st.lastSeq) { // truncation: file restarted
                flush(); st = MlState(None, -1L, Long.MinValue, false)
              }
              val blank = r.line.isEmpty
              val continues = readMode == 2 && !blank &&
                (r.line.charAt(0) == ' ' || r.line.charAt(0) == '\t')
              (st.pending, blank) match {
                case (_, true) => flush() // blank line terminates (and is eaten)
                case (None, _) => st = st.copy(pending = Some(r.line), startSeq = r.seq)
                case (Some(p), _) =>
                  if (readMode == 1 || continues)
                    st = st.copy(pending = Some(p + sep + r.line))
                  else { // mode 2: non-indented line starts a new record
                    flush()
                    st = st.copy(pending = Some(r.line), startSeq = r.seq)
                  }
              }
              st = st.copy(lastSeq = r.seq)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(maxTs + flushAfterMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** startmsg.regex-only assembly (back-compat face of imfileMultiline
    * with the raw-newline join). */
  def multiline(ds: Dataset[MlInput], startRegex: String): Dataset[MlOutput] =
    imfileMultiline(ds, Some(startRegex), None, escapeLF = false)

  case class KubeOutput(path: String, seq: Long, msg: String, stream: String,
                        fmt: String, parse_error: Boolean,
                        ts: java.sql.Timestamp)

  /** Streaming face of the imkubernetes CRI assembler
    * (contrib/imkubernetes/imkubernetes.c processLine:1243-1275 +
    * emitPartialIfComplete:1100-1148): per pod-log file (the key), CRI
    * `P` fragments accumulate in the state store until their closing
    * `F` record — the combined record carries the FIRST fragment's
    * stream/time — while docker-json and raw lines pass through as
    * standalone records (the cross-format close is out of the modeled
    * subset, as in the batch face). An unclosed run stays pending until
    * the state times out, mirroring the reference waiting for more
    * file data; the timeout DISCARDS it (never emitted). `ts` in the
    * output is the record time where the line carried one, else the
    * input row's event time. */
  /** Pre-parsed line for the CRI assembler: everything per-row
    * (format detect, CRI fields, docker-json extraction, record-time
    * parse) is computed COLUMN-side in codegen before the state
    * function — only the fragment accumulation itself runs in the
    * typed loop. `outTsMs` = record time where the line carried one,
    * else event time. */
  case class KubeLine(key: String, seq: Long, isCri: Boolean,
                      partial: Boolean, stream: String, body: String,
                      fmt: String, parseError: Boolean, outTsMs: Long,
                      ts: java.sql.Timestamp)

  def kubeCriAssemble(ds: Dataset[MlInput],
                      watermarkDelay: String = "0 seconds",
                      flushAfterMs: Long = 30000L): Dataset[KubeOutput] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val criRe = "^([^ ]+) (stdout|stderr) ([^ ]+) (.*)$"
    val tsPat = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS][.SS][.S][XXX]"
    def t3339(c: org.apache.spark.sql.Column) =
      try_to_timestamp(regexp_replace(c, "Z$", "+00:00"), lit(tsPat))
    val line = col("line")
    val dockerLog = get_json_object(line, "$.log")
    val isCri = regexp_extract(line, criRe, 1) =!= ""
    val isDocker = !isCri && dockerLog.isNotNull
    val lineTs = when(isCri, t3339(regexp_extract(line, criRe, 1)))
      .when(isDocker, t3339(get_json_object(line, "$.time")))
    val parsed = ds.toDF()
      .withColumn("isCri", isCri)
      .withColumn("partial",
        isCri && regexp_extract(line, criRe, 3).startsWith("P"))
      .withColumn("stream",
        when(isCri, regexp_extract(line, criRe, 2))
          .when(isDocker && get_json_object(line, "$.stream") === "stderr",
            "stderr")
          .otherwise("stdout"))
      .withColumn("body",
        when(isCri, regexp_extract(line, criRe, 4))
          .when(isDocker, regexp_replace(dockerLog, "\n$", ""))
          .otherwise(line))
      .withColumn("fmt", when(isCri, "cri")
        .when(isDocker, "docker_json").otherwise("raw"))
      .withColumn("parseError", !isCri && !isDocker)
      .withColumn("outTsMs",
        coalesce(unix_millis(lineTs), unix_millis(col("ts"))))
      .drop("line")
      .as[KubeLine]
    parsed.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Option[(String, String, Long)], KubeOutput](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // state = Some((accumulated msg, first fragment's stream,
            // first fragment's ts millis)) while a P run is open
            var pending = state.getOption.flatten
            var maxTs = Long.MinValue
            val out = scala.collection.mutable.ArrayBuffer.empty[KubeOutput]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.seq)).foreach { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              if (r.isCri) {
                if (r.partial) {
                  pending = pending match {
                    case Some((acc, s0, t0)) => Some((acc + r.body, s0, t0))
                    case None => Some((r.body, r.stream, r.outTsMs))
                  }
                } else pending match {
                  case Some((acc, s0, t0)) =>
                    out += KubeOutput(key, r.seq, acc + r.body, s0, "cri",
                      parse_error = false, new java.sql.Timestamp(t0))
                    pending = None
                  case None =>
                    out += KubeOutput(key, r.seq, r.body, r.stream, "cri",
                      parse_error = false, new java.sql.Timestamp(r.outTsMs))
                }
              } else
                out += KubeOutput(key, r.seq, r.body, r.stream, r.fmt,
                  r.parseError, new java.sql.Timestamp(r.outTsMs))
            }
            state.update(pending)
            state.setTimeoutTimestamp(
              math.max(maxTs + flushAfterMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
