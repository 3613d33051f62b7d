package graft.rainerscript

import scala.util.parsing.combinator.RegexParsers

/** Recursive-descent RainerScript parser (reference grammar:
  * grammar/grammar.y:131-236, lexer tokens grammar/lexer.l — notably
  * `$[$!./]name` variables at lexer.l:373). Covers the script-statement
  * and expression surface; config *objects* handled: action(...).
  * Comments: `#` to end of line and C-style block comments.
  */
/** Environment lookup with a test seam: a JVM cannot mutate its own
  * environment, so replay tests (the reference pattern `export VAR=…`
  * then startup) inject overrides here instead. Used by backtick
  * `echo $VAR` expansion and the getenv() script function. */
object EnvSource {
  @volatile var overrides: Map[String, String] = Map.empty
  def get(name: String): Option[String] =
    overrides.get(name).orElse(sys.env.get(name))
  /** global(localHostname=) override (glbl.c LocalHostNameOverride) —
    * the `$myhostname` system property reads it; unset falls back to
    * the JVM's hostname. */
  @volatile var localHostname: Option[String] = None

  /** global(variables.casesensitive="off") — JSON variable key
    * comparison goes case-insensitive (glbl.c:1405 →
    * fjson_global_do_case_sensitive_comparison; the reference's own
    * DEFAULT is the insensitive mode, but its only test —
    * tests/json_var_case.sh — pins casesensitive="on", so THIS engine
    * defaults to the tested sensitive mode and configs opt into the
    * insensitive one explicitly). Read at COMPILE time: the flag is
    * baked into each constructed json expression, so task-time
    * evaluation is immune to later mutation. Set/reset in a
    * try/finally bracket around RsyslogConfig.run's compile, so it can
    * never leak into queries built outside that config. */
  @volatile var varsCaseInsensitive: Boolean = false
}

class RainerParserBase extends RegexParsers {
  override protected val whiteSpace =
    """(\s|#.*|/\*(?s:.*?)\*/)+""".r

  // ---- lexical ----
  private def ident: Parser[String] = """[A-Za-z_][A-Za-z0-9_\-]*""".r
  private def number: Parser[Long] = """-?\d+""".r ^^ (_.toLong)
  /** Single left-to-right escape scan: chained String.replace is wrong
    * (input `\\n` — escaped backslash then n — must decode to `\n` the
    * two chars, not a newline). Table per the reference lexer's
    * doUnescape (grammar/rainerscript.c:6472-6548): \a \b \f \n \r \t
    * \' \" \? \$ \\ plus \xHH (exactly two hex digits) and \OOO
    * (exactly three octal digits). Divergence kept deliberately: an
    * unknown or incomplete escape passes through literally (`\%` must
    * survive for the template compiler's own escape layer), where the
    * reference emits '?' / reads garbage past the escape. */
  protected def unescape(body: String): String = {
    val sb = new StringBuilder(body.length)
    var i = 0
    def isOct(c: Char) = c >= '0' && c <= '7'
    def isHex(c: Char) = c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'a' => sb.append('\u0007'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\u000C'); i += 2
          case 'x' if i + 3 < body.length && isHex(body.charAt(i + 2)) &&
              isHex(body.charAt(i + 3)) =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar)
            i += 4
          case d if isOct(d) && i + 3 < body.length &&
              isOct(body.charAt(i + 2)) && isOct(body.charAt(i + 3)) =>
            sb.append((((d - '0') << 6) + ((body.charAt(i + 2) - '0') << 3) +
              (body.charAt(i + 3) - '0')).toChar)
            i += 4
          case other => sb.append(other); i += 2 // \" \' \\ \$ \? + unknown → literal
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
  /** Backtick parameter expansion (lexer.l:211-235), run at parse time
    * like the reference's lexer: `echo TEXT` expands $VAR / ${VAR} from
    * the environment (missing vars splice as empty,
    * expand_backticks_echo lexer.l:145-207); `cat FILE` splices the
    * file's bytes verbatim (read_file lexer.l:92-141, error → a
    * comment placeholder); any other command is invalid and yields "". */
  protected def expandBackticks(body: String): String =
    if (body.startsWith("echo ")) expandEnvRefs(body.drop(5))
    else if (body.startsWith("cat ")) {
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(body.drop(4))),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: Exception =>
        "/* file could not be accessed - see error messages */" }
    } else ""

  private def expandEnvRefs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '$') {
        if (i + 1 < s.length && s.charAt(i + 1) == '{') {
          // ${NAME}; an unterminated brace consumes to end-of-string and
          // still expands (the reference's end-of-loop in_env flush)
          val end = s.indexOf('}', i + 2)
          val stop = if (end >= 0) end else s.length
          sb.append(EnvSource.get(s.substring(i + 2, stop)).getOrElse(""))
          i = stop + 1
        } else {
          var j = i + 1
          while (j < s.length &&
            (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
          sb.append(EnvSource.get(s.substring(i + 1, j)).getOrElse(""))
          i = j
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  protected def btstring: Parser[String] =
    ("`" + """([^`\\]|\\.)*""" + "`").r ^^ { s =>
      expandBackticks(unescape(s.substring(1, s.length - 1))) }

  private def qstring: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { s => unescape(s.substring(1, s.length - 1)) } |
    ("'" + """([^'\\]|\\.)*""" + "'").r ^^ { s => unescape(s.substring(1, s.length - 1)) } |
    btstring
  private def variable: Parser[RVar] =
    // '@' is a legal name char (lexer.l:373 VAR charset — SD ids like
    // $!rfc5424-sd!id@32473!k depend on it); [N] array subscripts after
    // any segment (same charset, tests/json_array_subscripting.sh)
    // '$' as second char = system property read ($$now, $$myhostname —
    // lexer.l:373 `\$[$!./]{0,1}`, msg.c:473-533)
    """\$[$!./]?[A-Za-z0-9_@\-]+(\[\d+\])*(![A-Za-z0-9_@\-]+(\[\d+\])*)*""".r ^^ RVar.apply |
    // bare tree roots `$!` `$.` `$/` (rscript_bare_var_root.sh: whole
    // JSON-tree read/assign)
    """\$[!./](?![A-Za-z0-9_\-])""".r ^^ RVar.apply

  // ---- expressions (precedence: or < and < not < cmp < concat < add < mul < unary) ----
  def expr: Parser[RExpr] = orExpr

  private def orExpr: Parser[RExpr] =
    andExpr ~ rep(("or" | "OR") ~> andExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => RBinop("or", a, b))
    }
  private def andExpr: Parser[RExpr] =
    notExpr ~ rep(("and" | "AND") ~> notExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => RBinop("and", a, b))
    }
  private def notExpr: Parser[RExpr] =
    ("not" | "NOT") ~> notExpr ^^ RNot.apply | cmpExpr

  private def cmpOp: Parser[String] =
    "==" | "!=" | "<>" | "<=" | ">=" | "<" | ">" |
    "contains_i" | "contains" | "startswith_i" | "startswith" | "endswith"
  private def cmpExpr: Parser[RExpr] =
    concatExpr ~ opt(cmpOp ~ concatExpr) ^^ {
      case l ~ None => l
      case l ~ Some(op ~ r) => RBinop(op, l, r)
    }
  private def concatExpr: Parser[RExpr] =
    addExpr ~ rep("&" ~> addExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => RBinop("&", a, b))
    }
  private def addExpr: Parser[RExpr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => RBinop(op, a, b) }
    }
  private def mulExpr: Parser[RExpr] =
    unaryExpr ~ rep(("*" | "/" | "%") ~ unaryExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => RBinop(op, a, b) }
    }
  private def unaryExpr: Parser[RExpr] =
    "-" ~> primary ^^ RNeg.apply | primary

  private def arrayLit: Parser[RArr] =
    "[" ~> repsep(qstring, ",") <~ "]" ^^ RArr.apply

  private def funcCall: Parser[RFunc] =
    ident ~ ("(" ~> repsep(expr, ",") <~ ")") ^^ {
      case n ~ args => RFunc(n.toLowerCase, args)
    }

  /** Expression-position strings: a bare `$` inside DOUBLE quotes is
    * reserved by the lexer and diagnosed (`lexer.l:389-392`, tests/
    * rscript_re_match-dbl_quotes.sh — the right spelling is `\$`);
    * single-quoted and backtick strings allow it. We warn and keep the
    * literal (graceful-parse policy) where the reference rejects. */
  private def exprQstring: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { s =>
      val raw = s.substring(1, s.length - 1)
      if (raw.replaceAll("\\\\.", "").contains("$"))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$$-sign in double quotes must be escaped, problem string is: $s")
      unescape(raw)
    } |
    ("'" + """([^'\\]|\\.)*""" + "'").r ^^ { s => unescape(s.substring(1, s.length - 1)) } |
    btstring

  private def primary: Parser[RExpr] =
    "(" ~> expr <~ ")" |
    arrayLit |
    funcCall |
    variable |
    number ^^ RNum.apply |
    exprQstring ^^ RStr.apply

  // ---- statements ----
  def stmt: Parser[RStmt] =
    setStmt | unsetStmt | ifStmt | foreachStmt | stopStmt | continueStmt |
    callIndirectStmt | callStmt | reloadLookupStmt | actionStmt |
    priFiltStmt | propFiltStmt

  /** config.enabled="off" (any value but "on") disables the carrying
    * object/statement at load (nvlstChkDisabled,
    * grammar/rainerscript.c:759-772; exact-match like es_strbufcmp). */
  protected def paramsDisabled(p: Map[String, String]): Boolean =
    p.get("config.enabled").exists(_ != "on")

  private val inclDepth = new ThreadLocal[Integer] { override def initialValue = 0 }

  /** Statement-position include(): the reference's config preprocessor
    * splices included text anywhere a statement can stand (the
    * rscript-config_enable tests put `include(text="stop")` inside an
    * if-block). text= splices inline; file= reads one file (the
    * top-level include keeps glob/optional handling); a disabled or
    * unreadable include splices nothing. */
  private def includeStmt: Parser[Seq[RStmt]] =
    "include" ~> "(" ~> rep(actionParam) <~ ")" ^^ { ps =>
      val p = ps.toMap
      val text: Option[String] =
        if (paramsDisabled(p)) None
        else p.get("text").orElse(p.get("file").flatMap { f =>
          try Some(java.nio.file.Files.readString(java.nio.file.Paths.get(f)))
          catch { case _: Exception => None }
        })
      text.map { t =>
        require(inclDepth.get < 16, "include nesting too deep (cycle?)")
        inclDepth.set(inclDepth.get + 1)
        try parseScript(t) finally inclDepth.set(inclDepth.get - 1)
      }.getOrElse(Seq.empty)
    }

  protected def stmtMulti: Parser[Seq[RStmt]] =
    includeStmt |
    stmt ^^ {
      case RAction(p) if paramsDisabled(p) => Seq.empty
      case other => Seq(other)
    }

  // `reset` maps onto RSet: our set always replaces the target leaf,
  // which IS reset's contract (msgSetJSONFromVar force_reset,
  // msg.c:5134); the set-on-existing-OBJECT merge nuance lives in the
  // container side-effect form, see Compiler's parse_json handling
  private def setStmt: Parser[RStmt] =
    ("set" | "reset") ~> variable ~ ("=" ~> expr) <~ ";" ^^ {
      case v ~ e => RSet(v, e)
    }
  private def unsetStmt: Parser[RStmt] =
    "unset" ~> variable <~ ";" ^^ RUnset.apply
  private def block: Parser[Seq[RStmt]] =
    "{" ~> rep(stmtMulti) <~ "}" ^^ (_.flatten) | stmtMulti
  private def ifStmt: Parser[RStmt] =
    ("if" ~> expr) ~ ("then" ~> block) ~ opt("else" ~> block) ^^ {
      case c ~ t ~ e => RIf(c, t, e.getOrElse(Seq.empty))
    }
  private def foreachStmt: Parser[RStmt] =
    ("foreach" ~> "(" ~> variable) ~ ("in" ~> expr <~ ")") ~ ("do" ~> block) ^^ {
      case v ~ src ~ b => RForeach(v, src, b)
    }
  private def stopStmt: Parser[RStmt] = "stop" <~ opt(";") ^^^ RStop
  private def continueStmt: Parser[RStmt] = "continue" <~ opt(";") ^^^ RContinue
  private def callIndirectStmt: Parser[RStmt] =
    "call_indirect" ~> expr <~ opt(";") ^^ RCallIndirect.apply
  private def reloadLookupStmt: Parser[RStmt] =
    "reload_lookup_table" ~> "(" ~> qstring ~ (opt("," ~> qstring) <~ ")") <~ opt(";") ^^ {
      case t ~ stub => RReloadLookupTable(t, stub)
    }
  private def callStmt: Parser[RStmt] =
    "call" ~> ident <~ opt(";") ^^ RCall.apply
  private def actionParam: Parser[(String, String)] =
    // array values (rule=["…", "…"]) NUL-join like the object-param
    // parser, consumed via RsyslogConfig.splitArray
    """[A-Za-z_][A-Za-z0-9_.\-]*""".r ~ ("=" ~>
      (("[" ~> repsep(qstring, ",") <~ "]") ^^ (_.mkString("\u0000"))
        | qstring)) ^^ { case k ~ v => (k, v) }
  private def actionStmt: Parser[RStmt] =
    "action" ~> "(" ~> rep(actionParam) <~ ")" ^^ (ps => RAction(ps.toMap))

  /** legacy selector line: `mail.info action(...)` / `*.err { ... }` */
  private def priFiltStmt: Parser[RStmt] =
    """[a-z0-9*,\-]+\.[!=*a-z]+(;[a-z0-9*,\-]+\.[!=*a-z]+)*""".r ~ block ^^ {
      case sel ~ b => RPriFilt(sel, b)
    }

  /** legacy property filter: `:msg, contains, "x"` + block */
  private def propFiltStmt: Parser[RStmt] =
    (":" ~> ident) ~ ("," ~> opt("!")) ~ ident ~ ("," ~> qstring) ~ block ^^ {
      case prop ~ neg ~ op ~ v ~ b => RPropFilt(prop, op, neg.isDefined, v, b)
    }

  def script: Parser[Seq[RStmt]] = rep(stmtMulti) ^^ (_.flatten)

  def parseScript(src: String): Seq[RStmt] = parseAll(script, src) match {
    case Success(r, _) => r
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"RainerScript parse error at line ${next.pos.line}, col ${next.pos.column}: $msg")
    case other => throw new IllegalStateException(other.toString)
  }

  def parseExpr(src: String): RExpr = parseAll(expr, src) match {
    case Success(r, _) => r
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"expression parse error at col ${next.pos.column}: $msg")
    case other => throw new IllegalStateException(other.toString)
  }
}

object RainerParser extends RainerParserBase
