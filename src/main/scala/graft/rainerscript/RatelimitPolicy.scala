package graft.rainerscript

/** Named `ratelimit()` objects and their YAML policy files
  * (runtime/ratelimit.c + rsconf.c initFunc_ratelimit:625-700).
  *
  * Schema (the reference's libyaml event walk, ratelimit.c:700-960):
  * {{{
  * scope: input|output          # default input
  * mode: drop|pace              # output scope; default drop
  * interval: 60                 # seconds, 0 = off
  * burst: 5                     # default 10000
  * severity: 3                  # numeric; -1/absent = all
  * perSource:
  *   enabled: true
  *   keyTemplate: "PerSourceKey"  # template name; default = fromhost
  *   default: { max: 5, window: 2s }
  *   overrides:
  *     - key: "quiethost"
  *       max: 50
  *       window: 2s
  * }}}
  * Durations take the reference grammar (parseDurationMillis:456-496):
  * bare digits = seconds, suffixes ms/s/m/h; a ms value that isn't a
  * whole second is invalid where seconds are required
  * (parseDurationSeconds:500-509). The parser here covers exactly this
  * subset (block maps, one list, scalar values, '#' comments) — the
  * container has no YAML library, and the reference schema needs no
  * more. policyWatch ≡ re-resolving the policy per epoch, the same
  * hot-reload face as lookup tables.
  */
object RatelimitPolicy {

  case class PsOverride(key: String, max: Option[Long], windowSec: Option[Long])

  case class PerSource(enabled: Boolean, keyTemplate: Option[String],
                       defaultMax: Long, defaultWindowSec: Long,
                       overrides: Seq[PsOverride]) {
    def limitFor(key: String): (Long, Long) =
      overrides.find(_.key == key)
        .map(o => (o.max.getOrElse(defaultMax),
          o.windowSec.getOrElse(defaultWindowSec)))
        .getOrElse((defaultMax, defaultWindowSec))
  }

  case class Policy(scope: String = "input", mode: String = "drop",
                    intervalSec: Long = 0L, burst: Long = 10000L,
                    severity: Int = -1, perSource: Option[PerSource] = None)

  /** parseDurationMillis grammar → whole seconds
    * (parseDurationSeconds rejects sub-second ms values). */
  def durationSeconds(v: String): Long = {
    val t = v.trim
    val m = """(\d+)\s*(ms|s|m|h)?""".r
    t match {
      case m(n, suffix) =>
        val ms = suffix match {
          case null | "s" => n.toLong * 1000L
          case "ms" => n.toLong
          case "m" => n.toLong * 60000L
          case "h" => n.toLong * 3600000L
        }
        require(ms % 1000L == 0, s"ratelimit: window '$v' is not whole seconds")
        ms / 1000L
      case _ => throw new IllegalArgumentException(
        s"ratelimit: invalid duration '$v'")
    }
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
      (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
    else t
  }

  private def boolVal(v: String): Boolean =
    Seq("true", "on", "yes", "1").contains(unquote(v).toLowerCase)

  /** Parse the schema subset. Unknown keys are ignored like the
    * reference's event walk (it only inspects known last_key values). */
  def parse(yaml: String): Policy = {
    var p = Policy()
    var psEnabled = false
    var psKeyTpl: Option[String] = None
    var psDefMax: Option[Long] = None
    var psDefWin: Option[Long] = None
    val overrides = scala.collection.mutable.ListBuffer.empty[PsOverride]
    var curKey: Option[String] = None
    var curMax: Option[Long] = None
    var curWin: Option[Long] = None
    var inOverrideItem = false
    var sawPerSource = false

    // context = indent-derived: top / perSource / perSource.default /
    // perSource.overrides (list items flush on "- ")
    var ctx: List[String] = Nil

    def flushOverride(): Unit = if (inOverrideItem) {
      curKey.foreach(k => overrides += PsOverride(k, curMax, curWin))
      curKey = None; curMax = None; curWin = None
      inOverrideItem = false
    }

    val lines = yaml.split('\n')
    for (raw <- lines) {
      val noComment =
        if (raw.trim.startsWith("#")) ""
        else raw
      if (noComment.trim.nonEmpty) {
        val indent = noComment.takeWhile(_ == ' ').length
        var line = noComment.trim
        val isItem = line.startsWith("- ") || line == "-"
        if (isItem) {
          flushOverride()
          inOverrideItem = true
          line = line.stripPrefix("-").trim
        }
        // pop contexts deeper than this indent
        ctx = ctx.dropWhile { case c =>
          val depth = c.count(_ == '.') + 1
          indent < depth * 2
        }
        if (line.nonEmpty) {
          val (k, v) = line.indexOf(':') match {
            case -1 => (line, "")
            case i => (line.take(i).trim, line.drop(i + 1).trim)
          }
          val where = ctx.headOption.getOrElse("")
          if (v.isEmpty) {
            // a mapping opener
            val path = if (where.isEmpty) k else s"$where.$k"
            ctx = path :: ctx
            if (path == "perSource") sawPerSource = true
          } else where match {
            case "" => k match {
              case "scope" => p = p.copy(scope = unquote(v).toLowerCase)
              case "mode" => p = p.copy(mode = unquote(v).toLowerCase)
              case "interval" => p = p.copy(intervalSec = unquote(v).toLong)
              case "burst" => p = p.copy(burst = unquote(v).toLong)
              case "severity" => p = p.copy(severity = unquote(v).toInt)
              case _ => ()
            }
            case "perSource" => k match {
              case "enabled" => psEnabled = boolVal(v)
              case "keyTemplate" => psKeyTpl = Some(unquote(v))
              case _ => ()
            }
            case "perSource.default" => k match {
              case "max" => psDefMax = Some(unquote(v).toLong)
              case "window" => psDefWin = Some(durationSeconds(unquote(v)))
              case _ => ()
            }
            case "perSource.overrides" => k match {
              case "key" => curKey = Some(unquote(v))
              case "max" => curMax = Some(unquote(v).toLong)
              case "window" => curWin = Some(durationSeconds(unquote(v)))
              case _ => ()
            }
            case _ => ()
          }
        }
      }
    }
    flushOverride()
    require(p.scope == "input" || p.scope == "output",
      s"ratelimit: invalid scope '${p.scope}'")
    require(p.mode == "drop" || p.mode == "pace",
      s"ratelimit: invalid mode '${p.mode}'")
    if (sawPerSource && psEnabled) {
      // the reference requires default max+window when perSource is on
      // (ratelimit.c:945)
      require(psDefMax.isDefined && psDefWin.isDefined,
        "ratelimit: perSource requires default.max and default.window")
      p = p.copy(perSource = Some(PerSource(enabled = true, psKeyTpl,
        psDefMax.get, psDefWin.get, overrides.toList)))
    }
    p
  }

  /** Load a policy file; call again per epoch for the policyWatch /
    * HUP hot-reload face (ratelimitReloadPolicyFile). */
  def load(path: String): Policy =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Merge `ratelimit(...)` object params with their policy file — the
    * file's fields override inline where set, like ratelimit.c:2075-2085.
    */
  def fromParams(params: Map[String, String]): Policy = {
    val inline = Policy(
      intervalSec = params.get("interval").map(_.toLong).getOrElse(0L),
      burst = params.get("burst").map(_.toLong).getOrElse(10000L),
      severity = params.get("severity").map(_.toInt).getOrElse(-1))
    params.get("policy") match {
      case Some(f) =>
        val file = load(f)
        // the file carries its own interval/burst/severity when present;
        // fall back to inline for fields the file leaves at defaults
        file.copy(
          intervalSec = if (file.intervalSec != 0) file.intervalSec
                        else inline.intervalSec,
          burst = if (file.burst != 10000L) file.burst else inline.burst,
          severity = if (file.severity >= 0) file.severity
                     else inline.severity)
      case None => inline
    }
  }
}
