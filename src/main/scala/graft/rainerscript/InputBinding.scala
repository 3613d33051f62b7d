package graft.rainerscript

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** input() activation: bind the config's declared inputs to live Spark
  * sources and route each through its ruleset — the engine analogue of
  * the reference's activation pass (tools/rsyslogd.c:885-929: inputs are
  * started last, once rulesets/queues exist, each listener carrying its
  * ruleset binding; imfile instance params plugins/imfile/imfile.c:392-421,
  * defaults severity=5 facility=local0 imfile.c:1984-1988, PRI stamped at
  * submit imfile.c:1613-1614).
  *
  * Transport ownership is split Spark-first: imfile binds directly to the
  * filesystem (batch read here; `bindStreamImfile` tails it through the
  * multiline state machines). Socket/broker inputs (imudp/imtcp/imuxsock/
  * imkafka/...) are transport the platform owns — a deployment plugs the
  * live frame (socket-recorder output, Kafka source, ...) in via `feeds`,
  * and the binding owns everything the reference's input modules own past
  * the socket: framing (imtcp octet counting), reception sanitize + parser
  * chain, provenance columns, PRI defaults, and per-input ruleset routing.
  * An input with no bound feed is an idle listener: warn + skip, so an
  * unmodified distro config activates cleanly.
  */
object InputBinding {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** syslog facility keywords (names as in the reference's
    * syslog_fac_names table, runtime/srutils.c). */
  val facilities: Map[String, Int] = Map(
    "kern" -> 0, "user" -> 1, "mail" -> 2, "daemon" -> 3, "auth" -> 4,
    "security" -> 4, "syslog" -> 5, "lpr" -> 6, "news" -> 7, "uucp" -> 8,
    "cron" -> 9, "authpriv" -> 10, "ftp" -> 11, "ntp" -> 12, "audit" -> 13,
    "console" -> 14, "local0" -> 16, "local1" -> 17, "local2" -> 18,
    "local3" -> 19, "local4" -> 20, "local5" -> 21, "local6" -> 22,
    "local7" -> 23)

  /** syslog severity keywords incl. the aliases the reference accepts. */
  val severities: Map[String, Int] = Map(
    "emerg" -> 0, "panic" -> 0, "alert" -> 1, "crit" -> 2, "err" -> 3,
    "error" -> 3, "warning" -> 4, "warn" -> 4, "notice" -> 5, "info" -> 6,
    "debug" -> 7)

  def facilityNum(s: String): Int =
    facilities.getOrElse(s.toLowerCase, s.toIntOption.getOrElse(16))
  def severityNum(s: String): Int =
    severities.getOrElse(s.toLowerCase, s.toIntOption.getOrElse(5))

  /** Feed lookup for a non-file input, most specific first: the input's
    * name=, then "type:port", then bare type. */
  private def feed(feeds: Map[String, DataFrame],
                   p: Map[String, String], typ: String): Option[DataFrame] =
    p.get("name").flatMap(feeds.get)
      .orElse(p.get("port").flatMap(port => feeds.get(s"$typ:$port")))
      .orElse(feeds.get(typ))

  private def localHost: String =
    java.net.InetAddress.getLocalHost.getHostName

  /** imfile batch bind: read the glob, stamp tag/PRI/provenance. The
    * default path does NOT run the parser chain — imfile messages are
    * file lines, not syslog frames (msg = the line, hostname = receiver,
    * PRI from the facility/severity params); needparse="on" opts into
    * the full decode like the reference's flag. */
  private def bindImfile(spark: SparkSession, p: Map[String, String],
                         now: Column, defaultYear: Int): DataFrame = {
    val path = p.getOrElse("file",
      throw new IllegalArgumentException("input(type=\"imfile\") needs file="))
    val tag = p.getOrElse("tag",
      throw new IllegalArgumentException("input(type=\"imfile\") needs tag="))
    val lines0 = Sources.fileLines(spark, path)
    val lines = p.get("trimlineoverbytes").map(_.toInt) match {
      case Some(max) if max > 0 =>
        lines0.withColumn("value", substring(col("value"), 1, max))
      case _ => lines0
    }
    if (p.get("needparse").contains("on"))
      Sources.decodeSyslog(lines, defaultYear = defaultYear)
        .withColumn("ts", coalesce(col("ts"), now))
    else {
      val fac = facilityNum(p.getOrElse("facility", "local0"))
      val sev = severityNum(p.getOrElse("severity", "notice"))
      val prog = graft.functions.SyslogParseExpr.programName(tag)
      lines.select(
        col("inputname"), col("fromhost"),
        Sources.sanitize(col("value")).as("rawmsg"),
        lit(0).as("protocol_version"),
        lit(fac * 8 + sev).as("pri"),
        lit(fac).as("facility"), lit(sev).as("severity"),
        now.as("ts"),
        col("fromhost").as("hostname"),
        (if (prog == null || prog.isEmpty) lit(null) else lit(prog))
          .cast("string").as("app_name"),
        lit(null).cast("string").as("procid"),
        lit(null).cast("string").as("msgid"),
        lit(null).cast("string").as("structured_data"),
        lit(tag).as("syslogtag"),
        lit(prog).cast("string").as("programname"),
        Sources.sanitize(col("value")).as("msg"),
        lit(true).as("parsesuccess"),
        lit("{}").as("vars_msg"), lit("{}").as("vars_local"))
    }
  }

  /** Resolve a ruleset's parser-name chain to (name, params) instances:
    * custom parser() objects by name, plus the reference's built-in
    * parser names (PARSER_NAME registrations: "rsyslog.rfc5424"
    * pmrfc5424.c, "rsyslog.rfc3164" pmrfc3164.c, "rsyslog.pmnull"
    * pmnull.c's module-global instance). */
  private def resolveChain(cfg: RsyslogConfig,
                           names: Seq[String]): Seq[(String, Map[String, String])] =
    names.map { n =>
      cfg.parsers.get(n).map(n -> _).getOrElse(n match {
        case "rsyslog.rfc5424" => n -> Map("type" -> "rfc5424")
        case "rsyslog.rfc3164" => n -> Map("type" -> "rfc3164")
        case "rsyslog.pmnull" => n -> Map("type" -> "pmnull")
        case other => throw new IllegalArgumentException(
          s"ruleset parser=\"$other\": no parser(name=\"$other\") object " +
          "and not a built-in parser name")
      })
    }

  /** Decode a sanitized line frame through a configured parser chain
    * (runtime/parser.c:613-686 ParseMsg: sanitize once, auto-PRI-parse,
    * then first parser that doesn't return COULD_NOT_PARSE wins). All
    * supported parser types are total (pmnull/pmnormalize by contract —
    * pmnormalize's no-match still accepts the message, see
    * tests/pmnormalize-rule_invld-data.sh — and the builtin pair via
    * rfc3164's catch-all), so the no-parser-accepted discard path is
    * unreachable here. Builtin names map to the autodetect expression:
    * listing either of rsyslog.rfc5424/rfc3164 runs the same
    * 5424-first-then-legacy parse the default list runs.
    *
    * Chain output columns match [[graft.sources.Sources.decodeSyslog]];
    * `ts` is null (reception time is coalesced in by the caller).
    */
  private[rainerscript] def decodeChain(lines: DataFrame,
      chain: Seq[(String, Map[String, String])], defaultYear: Int): DataFrame = {
    import graft.sources.Sources
    require(chain.nonEmpty, "empty parser chain")
    // the head parser wins whenever it accepts; supported types are all
    // total, so lowering keeps only the head (parse2 cascade collapses)
    val (name, p) = chain.head
    val sanitized = Sources.sanitize(col("value"))
    p.getOrElse("type", name) match {
      case "pmnull" =>
        // plugins/pmnull/pmnull.c parse2: MSG offset 0 (msg = the whole
        // sanitized frame INCLUDING any <PRI>), PRI forced to the
        // configured facility*8+severity (defaults 1/5 → 13,
        // pmnull.c:99-100) even though auto-PRI-parsing ran, TAG = tag=
        // param or empty (tests/pmnull-basic.sh locks all three)
        val fac = p.get("syslogfacility").map(facilityNum).getOrElse(1)
        val sev = p.get("syslogseverity").map(severityNum).getOrElse(5)
        val tag = p.getOrElse("tag", "")
        val prog = graft.functions.SyslogParseExpr.programName(tag)
        val passthrough = lines.columns.filter(_ != "value").map(col)
        lines.select(passthrough ++ Seq[Column](
          sanitized.as("rawmsg"),
          lit(0).as("protocol_version"),
          lit(fac * 8 + sev).as("pri"),
          lit(fac).as("facility"), lit(sev).as("severity"),
          lit(null).cast("timestamp").as("ts"),
          col("fromhost").as("hostname"),
          (if (prog == null || prog.isEmpty) lit(null) else lit(prog))
            .cast("string").as("app_name"),
          lit(null).cast("string").as("procid"),
          lit(null).cast("string").as("msgid"),
          lit(null).cast("string").as("structured_data"),
          lit(tag).as("syslogtag"),
          lit(prog).cast("string").as("programname"),
          sanitized.as("msg"),
          lit(true).as("parsesuccess"),
          lit("{}").as("vars_msg"), lit("{}").as("vars_local")): _*)
      case "pmnormalize" =>
        // pmnormalize (doc/source/configuration/modules/pmnormalize.rst;
        // no C source ships — semantics locked by tests/pmnormalize-*):
        // normalize the FULL raw frame (incl. <PRI>) against the
        // rulebase; well-known fields populate the properties (pri →
        // facility/severity, hostname, syslogtag, fromhost-ip, msg); a
        // no-match still accepts the message with msg = the whole frame
        // (tests/pmnormalize-rule_invld-data.sh). Fields outside the
        // well-known set are dropped (nothing else is observable in the
        // reference's tests).
        val rules: Seq[String] =
          p.get("rulebase").map { f =>
            java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f))
              .toArray(Array.empty[String]).toSeq
              .filter(_.startsWith("rule="))
              .map(l => l.substring(l.indexOf(':', 5) + 1))
          }.getOrElse(p.get("rule").map(RsyslogConfig.splitArray).getOrElse(Nil))
            .map(graft.operators.Normalize.stripRulePrefix)
        require(rules.nonEmpty,
          s"parser(name=\"$name\" type=\"pmnormalize\") needs rulebase= or rule=")
        // stage the normalize result once (CollapseProject won't inline
        // a multiply-referenced non-cheap alias — shared via one select)
        val staged = lines
          .withColumn("__raw", sanitized)
          .withColumn("__nz",
            graft.operators.Normalize.normalize(col("__raw"), rules))
        def g(field: String): Column =
          get_json_object(col("__nz"), s"$$['$field']")
        // auto-PRI fallback for missing/no-match pri (parserParsePRI ran
        // before the parser; DEFUPRI=13 when absent/invalid)
        val autoPri =
          when(col("__raw").rlike("^<\\d{1,3}>"),
            regexp_extract(col("__raw"), "^<(\\d{1,3})>", 1).cast("int"))
          .otherwise(lit(13))
        val priC = coalesce(g("pri").cast("int"), autoPri)
        val tagC = coalesce(g("syslogtag"), lit(""))
        val progC = regexp_extract(tagC, "^([^:\\[/\\x00-\\x1f]*)", 1)
        val passthrough = staged.columns
          .filterNot(c => c == "value" || c == "fromhost" || c.startsWith("__"))
          .map(col)
        staged.select(passthrough ++ Seq[Column](
          coalesce(g("fromhost-ip"), col("fromhost")).as("fromhost"),
          col("__raw").as("rawmsg"),
          lit(0).as("protocol_version"),
          priC.as("pri"),
          (priC / 8).cast("int").as("facility"),
          (priC % 8).cast("int").as("severity"),
          lit(null).cast("timestamp").as("ts"),
          coalesce(g("hostname"), col("fromhost")).as("hostname"),
          when(progC =!= "", progC).as("app_name"),
          lit(null).cast("string").as("procid"),
          lit(null).cast("string").as("msgid"),
          lit(null).cast("string").as("structured_data"),
          tagC.as("syslogtag"),
          progC.as("programname"),
          coalesce(g("msg"), col("__raw")).as("msg"),
          (col("__nz") =!= "{}").as("parsesuccess"),
          lit("{}").as("vars_msg"), lit("{}").as("vars_local")): _*)
      case "rfc5424" | "rfc3164" =>
        Sources.decodeSyslog(lines, defaultYear = defaultYear)
      case other => throw new IllegalArgumentException(
        s"parser type \"$other\" is not supported in a config parser chain " +
        "(supported: pmnull, pmnormalize, rsyslog.rfc5424/rfc3164)")
    }
  }

  /** Network/broker bind: feed frame (a `value` line column, or the Spark
    * Kafka source contract) → framing → decode chain. `chain` = the
    * ruleset's configured parser list; None = the default
    * rfc5424→rfc3164 list. */
  private def bindFeed(typ: String, df: DataFrame, now: Column,
                       defaultYear: Int,
                       chain: Option[Seq[(String, Map[String, String])]] = None): DataFrame = {
    if (typ == "imkafka" || df.columns.contains("topic"))
      Sources.imkafkaDecode(df, defaultYear)
        .withColumn("ts", coalesce(col("ts"), now))
    else if (typ == "imjournal")
      // feed rows carry one journal EXPORT-format entry per row
      Sources.imjournalDecode(df)
        .withColumn("ts", coalesce(col("ts"), now))
    else {
      val withProv0 =
        if (df.columns.contains("inputname")) df
        else df.withColumn("inputname", lit(typ))
      val withProv =
        if (withProv0.columns.contains("fromhost")) withProv0
        else withProv0.withColumn("fromhost", lit(localHost))
      // imtcp accepts octet-counted framing per connection (RFC6587,
      // runtime/tcpsrv.c); deframe is per-row conditional so LF-framed
      // lines pass through untouched. imrelp feeds carry RELP frames —
      // syslog-command payloads extracted, control frames dropped.
      val framed = typ match {
        case "imtcp" => Sources.deframeOctetCounted(withProv)
        case "imrelp" => Sources.deframeRelp(withProv)
        case _ => withProv
      }
      chain.map(c => decodeChain(framed, c, defaultYear))
        .getOrElse(Sources.decodeSyslog(framed, defaultYear = defaultYear))
        .withColumn("ts", coalesce(col("ts"), now))
    }
  }

  /** Bind every declared input; returns (ruleset, frame) pairs — "" is
    * the default/main ruleset, like the reference's
    * RSYSLOG_DefaultRuleset binding for inputs without ruleset=. */
  def bindBatch(cfg: RsyslogConfig, spark: SparkSession,
                feeds: Map[String, DataFrame],
                now: Column, defaultYear: Int): Seq[(String, DataFrame)] =
    cfg.inputs.flatMap { p =>
      val typ = p.getOrElse("type", "")
      val ruleset = p.getOrElse("ruleset", "")
      // ruleset(parser=[...]) replaces the default parser list for
      // messages bound to that ruleset (ruleset.GetParserList in
      // runtime/parser.c:638-640)
      val chain = cfg.rulesetParsers.get(ruleset)
        .map(names => resolveChain(cfg, names))
      if (typ.nonEmpty && !cfg.hasModule(typ))
        log.warn(s"input(type=\"$typ\") without module(load=\"$typ\") — binding anyway")
      val frame: Option[DataFrame] = typ match {
        case "" =>
          log.warn("input() without type=; skipped"); None
        case "imfile" =>
          Some(bindImfile(spark, p, now, defaultYear))
        case t =>
          feed(feeds, p, t) match {
            case Some(df) => Some(bindFeed(t, df, now, defaultYear, chain))
            case None =>
              log.warn(s"input(type=\"$t\"${p.get("port").map(po => s" port=$po").getOrElse("")}) " +
                "has no bound feed in this run; listener idle")
              None
          }
      }
      frame.map(ruleset -> _)
    }

  /** imfile streaming bind: fileTail through the multiline/readMode
    * state machines with the input's params threaded (startmsg.regex /
    * endmsg.regex / readmode / escapelf / escapelf.replacement /
    * trimlineoverbytes). Returns assembled records as
    * (key, start_seq, record).
    *
    * Ordering caveat: the text stream source exposes no line index, so
    * seq is a per-partition counter seeded from the wall clock at
    * partition start — within one micro-batch a file's lines keep read
    * order, and a later batch's lines always sort after an earlier
    * batch's (so the state machine's seq-regression truncation detector
    * doesn't false-positive across batches). Not stable across restarts;
    * same single-batch determinism contract the stream gate documents.
    */
  def bindStreamImfile(spark: SparkSession, p: Map[String, String]): DataFrame = {
    import spark.implicits._
    import graft.streaming.Stateful
    val path = p.getOrElse("file",
      throw new IllegalArgumentException("input(type=\"imfile\") needs file="))
    val in = Sources.fileTail(spark, path).select(
      input_file_name().as("key"),
      col("value").as("line"),
      current_timestamp().as("ts"))
      .as[(String, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        // 2^20 lines of headroom per partition before seqs could
        // interleave with a batch started in the same millisecond
        val base = System.currentTimeMillis() << 20
        var i = -1L
        it.map { case (k, l, t) => i += 1; Stateful.MlInput(k, base + i, l, t) }
      }
    val readMode = p.getOrElse("readmode", "0").toInt
    val start = p.get("startmsg.regex")
    val end = p.get("endmsg.regex")
    val maxMsg = p.getOrElse("trimlineoverbytes", "8096").toInt
    // readTimeout (seconds, imfile param, default 0): the multiline
    // partial-record flush timer. 0 maps to flush-when-the-watermark-
    // passes — the shutdown flush in a bounded run, never-mid-tail in a
    // live one, matching the reference's no-timeout default.
    val flushMs = p.getOrElse("readtimeout", "0").toLong * 1000L match {
      case 0L => -1L
      case ms => ms
    }
    val out =
      if (start.nonEmpty || end.nonEmpty)
        Stateful.imfileMultiline(in, start, end,
          escapeLF = !p.get("escapelf").contains("off"),
          escapeLFString = p.get("escapelf.replacement"),
          maxMsgSize = maxMsg,
          discardTruncatedMsg = p.get("discardtruncatedmsg").contains("on"),
          flushAfterMs = flushMs)
          .toDF()
      else if (readMode > 0)
        Stateful.imfileReadMode(in, readMode, flushAfterMs = flushMs).toDF()
      else in.toDF().select(col("key"), col("seq").as("startSeq"),
        col("line").as("record"))
    out.select(col("key"), col("startSeq").as("start_seq"), col("record"))
  }
}
