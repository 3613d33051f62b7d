package graft.rainerscript

import scala.util.parsing.combinator.RegexParsers

/** Bidirectional config translator — the engine face of `rsyslogd -o
  * <file> -F yaml|rainerscript` (runtime/translate.c, wired from
  * runtime/rsconf.c cnfDoObj/cnfDoScript/cnfDoCfsysline; exact-output
  * goldens in tests/config-translate-*.sh).
  *
  * The translator is a syntax-level capture + re-emission pass, entirely
  * separate from the execution compiler: params keep their source case,
  * their string/array datatype, and their object identity; emission
  * sorts keys by the reference's preferred-rank order (name < type <
  * load < everything-alphabetical, translate.c:1586-1631) so output is
  * canonical regardless of source order. Top-level statements normalize
  * into an explicit RSYSLOG_DefaultRuleset with the reference's
  * TRANSLATION WARNING comment (translate.c:1390-1442); legacy
  * `$-directives` and BSD blocks are fatal, with the reference's exact
  * diagnostics (rsconf.c:835-867).
  */
object ConfigTranslate {

  // ---------------------------------------------------------- model

  sealed trait TVal
  final case class TStr(s: String) extends TVal
  final case class TArr(items: Seq[String]) extends TVal
  type TParams = Seq[(String, TVal)]

  /** Translator-local statement tree: unlike the execution AST it keeps
    * the raw printable of legacy targets and selector/property filters
    * (stmt->printable in the reference) and the set-vs-reset flag. */
  sealed trait TStmt
  final case class TAct(params: TParams) extends TStmt
  final case class TLegacyAct(raw: String) extends TStmt
  case object TStop extends TStmt
  case object TContinue extends TStmt
  final case class TCall(name: String) extends TStmt
  final case class TCallInd(e: RExpr) extends TStmt
  final case class TSet(varName: String, e: RExpr, reset: Boolean) extends TStmt
  final case class TUnset(varName: String) extends TStmt
  final case class TIf(c: RExpr, t: Seq[TStmt], e: Seq[TStmt]) extends TStmt
  final case class TForeach(v: String, coll: RExpr, body: Seq[TStmt]) extends TStmt
  final case class TPriFilt(selector: String, thenB: Seq[TStmt]) extends TStmt
  final case class TPropFilt(raw: String, thenB: Seq[TStmt]) extends TStmt
  final case class TReload(table: String, stub: String) extends TStmt
  /** `& target` continuation captured at parse level, folded into the
    * preceding selector's action list (grammar.y actlst '&' s_act). */
  private final case class TAmp(s: TStmt) extends TStmt

  /** YAML ruleset body classification (translate.h ruleset kinds). */
  private sealed trait YKind
  private case object YNone extends YKind
  private case object YActions extends YKind
  private case object YFilterActions extends YKind
  private case object YStatements extends YKind

  private final class Item(val kind: String, var params: TParams) {
    var subobjs: Vector[(String, TParams)] = Vector.empty // template elements
    var script: Option[String] = None                     // serialized body
    var warnings: Vector[String] = Vector.empty
    var yKind: YKind = YNone
    var yFilter: Option[String] = None
    var yActions: Vector[TParams] = Vector.empty
    var yStatements: Vector[(String, Vector[TParams])] = Vector.empty
    def name: Option[String] =
      params.collectFirst { case (k, TStr(v)) if k.equalsIgnoreCase("name") => v }
  }

  private final class Capture {
    var globals: Option[Item] = None
    var mainqueue: Option[Item] = None
    val modules = Vector.newBuilder[Item]
    val inputs = Vector.newBuilder[Item]
    val templates = Vector.newBuilder[Item]
    var rulesets: Vector[Item] = Vector.empty
    val lookups = Vector.newBuilder[Item]
    val parsers = Vector.newBuilder[Item]
    val timezones = Vector.newBuilder[Item]
    val dynstats = Vector.newBuilder[Item]
    val perctile = Vector.newBuilder[Item]
    val ratelimits = Vector.newBuilder[Item]
  }

  // ---------------------------------------------------- shared emit bits

  /** estrAppendQuoted / writeYamlQuoted (identical tables). */
  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def emitVal(v: TVal): String = v match {
    case TStr(s) => quote(s)
    case TArr(items) => items.map(quote).mkString("[", ", ", "]")
  }

  /** preferredKeyRank: name < type < load < rest (case-sensitive match). */
  private def rank(name: String): Int = name match {
    case "name" => 0
    case "type" => 1
    case "load" => 2
    case _ => 3
  }

  private def sorted(ps: TParams): TParams =
    ps.sortBy { case (k, _) => (rank(k), k) } // stable; strcmp ≡ String order on ASCII

  /** The node that leads a YAML list item: lowest rank, first wins ties
    * in SOURCE order (translate.c firstNode scan uses strict `<`). */
  private def firstNode(ps: TParams): Option[(String, TVal)] =
    if (ps.isEmpty) None
    else Some(ps.minBy { case (k, _) => rank(k) }) // minBy keeps first minimum

  private def varName(raw: String): String =
    if (raw.startsWith("$")) raw else "$" + raw

  /** exprToString (translate.c:919-1016): every binary node fully
    * parenthesized; NOT/unary-minus prefix their operand bare. */
  private def exprStr(e: RExpr): String = e match {
    case RBinop(op, l, r) => s"(${exprStr(l)} $op ${exprStr(r)})"
    case RNot(x) => "not " + exprStr(x)
    case RNeg(x) => "-" + exprStr(x)
    case RNum(n) => n.toString
    case RStr(s) => quote(s)
    case RVar(raw) => varName(raw)
    case RArr(items) => items.map(quote).mkString("[", ", ", "]")
    case RFunc(n, args) => n + args.map(exprStr).mkString("(", ", ", ")")
  }

  /** legacyActionToNvlst (translate.c:440-475): the two convertible
    * sysklogd shorthands; everything else stays script text. */
  private def legacyToParams(raw: String): Option[TParams] = {
    val s = raw.dropWhile(c => c == ' ' || c == '\t')
    if (s.startsWith("/") || s.startsWith("-/"))
      Some(Seq("type" -> TStr("omfile"),
        "file" -> TStr(if (s.startsWith("-")) s.drop(1) else s)))
    else if (s.startsWith(":omusrmsg:"))
      Some(Seq("type" -> TStr("omusrmsg"), "users" -> TStr(s.drop(10))))
    else None
  }

  /** buildPriFilterExpr (translate.c:477-520). */
  private def priFilterExpr(selector: String): String =
    if (selector.contains('\'')) s"prifilt(${quote(selector)})"
    else s"prifilt('$selector')"

  private def actionSingleline(params: TParams): String =
    "action(" + sorted(params).map { case (k, v) => s"$k=${emitVal(v)}" }
      .mkString(" ") + ")"

  private def selectorCompatible(b: Seq[TStmt]): Boolean = b.forall {
    case _: TAct | _: TLegacyAct | TStop | TContinue | _: TCall |
         _: TCallInd => true
    case _ => false
  }

  private def structuredActionsOnly(b: Seq[TStmt]): Boolean =
    b.nonEmpty && b.forall {
      case _: TAct => true
      case TLegacyAct(raw) => legacyToParams(raw).isDefined
      case _ => false
    }

  private def actionParamsOf(b: Seq[TStmt]): Vector[TParams] = b.map {
    case TAct(p) => p
    case TLegacyAct(raw) => legacyToParams(raw).get
    case other => sys.error(s"not an action: $other")
  }.toVector

  // ------------------------------------------------ script serialization

  /** emitActionSingleline for one selector-compatible statement. */
  private def stmtSingleline(s: TStmt, warn: String => Unit): String = s match {
    case TAct(p) => actionSingleline(p)
    case TLegacyAct(raw) => legacyToParams(raw) match {
      case Some(p) => actionSingleline(p)
      case None =>
        warn("legacy action syntax preserved as script text")
        raw
    }
    case TStop => "stop"
    case TContinue => "continue"
    case TCall(n) => "call " + n
    case TCallInd(e) => "call_indirect " + exprStr(e) + ";"
    case other => sys.error(s"not singleline: $other")
  }

  private def indentStr(n: Int): String = "  " * n

  /** stmtListToString (translate.c:1139-1237). */
  private def scriptText(stmts: Seq[TStmt], indent: Int,
                         warn: String => Unit): String = {
    val sb = new StringBuilder
    stmts.foreach {
      case s @ (_: TAct | _: TLegacyAct | TStop | TContinue | _: TCall |
                _: TCallInd) =>
        sb.append(indentStr(indent)).append(stmtSingleline(s, warn)).append('\n')
      case TSet(v, e, reset) =>
        sb.append(indentStr(indent)).append(if (reset) "reset " else "set ")
          .append(varName(v)).append(" = ").append(exprStr(e)).append(";\n")
      case TUnset(v) =>
        sb.append(indentStr(indent)).append("unset ").append(varName(v))
          .append(";\n")
      case TIf(c, t, e) =>
        sb.append(indentStr(indent)).append("if ").append(exprStr(c))
          .append(" then {\n").append(scriptText(t, indent + 1, warn))
          .append(indentStr(indent))
        if (e.nonEmpty)
          sb.append("} else {\n").append(scriptText(e, indent + 1, warn))
            .append(indentStr(indent)).append("}\n")
        else sb.append("}\n")
      case TForeach(v, coll, body) =>
        sb.append(indentStr(indent)).append("foreach (").append(varName(v))
          .append(" in ").append(exprStr(coll)).append(") do {\n")
          .append(scriptText(body, indent + 1, warn))
          .append(indentStr(indent)).append("}\n")
      case TPriFilt(sel, thenB) =>
        if (selectorCompatible(thenB)) {
          var first = true
          thenB.foreach { a =>
            sb.append(indentStr(indent))
            if (!first) sb.append("& ")
            if (first) sb.append(sel).append(' ')
            first = false
            sb.append(stmtSingleline(a, warn)).append('\n')
          }
        } else {
          warn("PRI selector normalized into if/prifilt() form")
          sb.append(indentStr(indent)).append("if prifilt(")
            .append(quote(sel)).append(") then {\n")
            .append(scriptText(thenB, indent + 1, warn))
            .append(indentStr(indent)).append("}\n")
        }
      case TPropFilt(raw, thenB) =>
        if (selectorCompatible(thenB)) {
          var first = true
          thenB.foreach { a =>
            sb.append(indentStr(indent))
            if (!first) sb.append("& ")
            if (first) sb.append(raw).append(' ')
            first = false
            sb.append(stmtSingleline(a, warn)).append('\n')
          }
        } else throw new IllegalArgumentException(
          "property selector with else/complex body is not safely translatable")
      case TReload(t, stub) =>
        sb.append(indentStr(indent)).append("reload_lookup_table(")
          .append(quote(t)).append(", stub_value=").append(quote(stub))
          .append(")\n")
      case TAmp(_) => sys.error("unfolded & continuation")
    }
    sb.toString
  }

  // ------------------------------------------------ YAML body classify

  /** captureYamlRulesetBody (translate.c:731-820). */
  private def classifyBody(it: Item, stmts: Seq[TStmt]): Unit = {
    if (stmts.isEmpty) return
    if (structuredActionsOnly(stmts)) {
      val actions = actionParamsOf(stmts)
      if (it.yKind == YNone) {
        it.yStatements = Vector.empty
        it.yActions = actions
        it.yKind = YActions
        return
      } else if (it.yKind == YActions && it.yFilter.isEmpty) {
        it.yActions ++= actions
        return
      } else {
        it.yFilter = None; it.yActions = Vector.empty
        it.yStatements = Vector.empty; it.yKind = YNone
      }
    }
    if (stmts.size == 1) {
      val (printable, thenB) = stmts.head match {
        case TPriFilt(sel, t) => (Some(sel), t)
        case TPropFilt(raw, t) => (Some(raw), t)
        case _ => (None, Nil)
      }
      if (printable.isDefined && structuredActionsOnly(thenB) &&
          it.yKind == YNone) {
        it.yFilter = printable
        it.yActions = actionParamsOf(thenB)
        it.yStatements = Vector.empty
        it.yKind = YFilterActions
        return
      }
    }
    if (it.yKind == YNone) {
      // cloneYamlLegacyStatements: all PRIFILT w/ structured-only bodies
      val ok = stmts.forall {
        case TPriFilt(_, t) => structuredActionsOnly(t)
        case _ => false
      }
      if (ok && stmts.nonEmpty) {
        it.yStatements = stmts.map {
          case TPriFilt(sel, t) => (priFilterExpr(sel), actionParamsOf(t))
          case _ => sys.error("unreachable")
        }.toVector
        it.yKind = YStatements
        return
      }
    }
    it.yFilter = None; it.yActions = Vector.empty
    it.yStatements = Vector.empty; it.yKind = YNone
  }

  /** appendYamlLegacyStatement + promoteSimpleYamlToStatements
    * (translate.c:672-730) for follow-up top-level captures. */
  private def appendStatement(it: Item, stmts: Seq[TStmt]): Boolean = {
    val single = stmts match {
      case Seq(TPriFilt(sel, t)) if structuredActionsOnly(t) => Some((sel, t))
      case _ => None
    }
    if (single.isEmpty) return false
    // promote FILTER_ACTIONS → STATEMENTS
    if (it.yKind == YFilterActions && it.yFilter.isDefined) {
      it.yStatements = Vector((priFilterExpr(it.yFilter.get), it.yActions))
      it.yFilter = None; it.yActions = Vector.empty; it.yKind = YStatements
    }
    if (it.yKind != YStatements) return false
    val (sel, t) = single.get
    it.yStatements :+= ((priFilterExpr(sel), actionParamsOf(t)))
    true
  }

  // -------------------------------------------------------- RS parser

  /** The translator's own parser: typed + case-preserving params, raw
    * legacy/selector printables, set-vs-reset — capture fidelity the
    * execution parser deliberately normalizes away. Reuses the base
    * expression grammar (operator precedence, functions, escapes). */
  private object TxP extends RainerParserBase {
    private def tIdent: Parser[String] = """[A-Za-z_][A-Za-z0-9_.\-]*""".r
    private def tString: Parser[String] =
      ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { s =>
        unescape(s.substring(1, s.length - 1))
      } | btstring
    private def tValue: Parser[TVal] =
      "[" ~> repsep(tString, ",") <~ "]" ^^ (TArr(_)) | tString ^^ (TStr(_))
    private def tParam: Parser[(String, TVal)] =
      tIdent ~ ("=" ~> tValue) ^^ { case k ~ v => (k, v) }
    def tParams: Parser[TParams] = rep(tParam)

    private def tVarRaw: Parser[String] =
      """\$[$!./]?[A-Za-z0-9_@\-]+(\[\d+\])*(![A-Za-z0-9_@\-]+(\[\d+\])*)*""".r |
      """\$[!./](?![A-Za-z0-9_\-])""".r

    private def tAction: Parser[TStmt] =
      "action" ~> "(" ~> tParams <~ ")" ^^ TAct.apply
    private def tSet: Parser[TStmt] =
      ("set" | "reset") ~ tVarRaw ~ ("=" ~> expr) <~ ";" ^^ {
        case kw ~ v ~ e => TSet(v, e, kw == "reset")
      }
    private def tUnset: Parser[TStmt] =
      "unset" ~> tVarRaw <~ ";" ^^ TUnset.apply
    private def tBlock: Parser[Seq[TStmt]] =
      "{" ~> rep(tBody) <~ "}" ^^ foldAmp | tBody ^^ (s => foldAmp(Seq(s)))
    private def tIf: Parser[TStmt] =
      ("if" ~> expr) ~ ("then" ~> tBlock) ~ opt("else" ~> tBlock) ^^ {
        case c ~ t ~ e => TIf(c, t, e.getOrElse(Nil))
      }
    private def tForeach: Parser[TStmt] =
      ("foreach" ~> "(" ~> tVarRaw) ~ ("in" ~> expr <~ ")") ~
        ("do" ~> tBlock) ^^ { case v ~ c ~ b => TForeach(v, c, b) }
    private def tStop: Parser[TStmt] = "stop" <~ opt(";") ^^^ TStop
    private def tContinue: Parser[TStmt] = "continue" <~ opt(";") ^^^ TContinue
    private def tCall: Parser[TStmt] =
      "call_indirect" ~> expr <~ opt(";") ^^ TCallInd.apply |
      "call" ~> tIdent <~ opt(";") ^^ TCall.apply
    private def tReload: Parser[TStmt] =
      "reload_lookup_table" ~> "(" ~> tString ~
        (opt("," ~> opt("stub_value" ~ "=") ~> tString) <~ ")") <~ opt(";") ^^ {
        case t ~ stub => TReload(t, stub.getOrElse(""))
      }

    /** one legacy action target, raw text kept (lexer.l LEGACY_ACTION). */
    private def tLegacyTarget: Parser[TStmt] =
      ("~" | """-?/[^\s;#&]+""".r | """\|[^\s;#&]+""".r |
       """@@?[^\s;#&]+""".r | """:[A-Za-z][A-Za-z0-9]*:[^\s#&]*""".r |
       "*") ^^ TLegacyAct.apply

    private def tTarget: Parser[TStmt] = tAction | tStop | tLegacyTarget

    val selRegex: Parser[String] =
      """[a-z0-9*,\-]+\.[!=*a-z0-7]+(;[a-z0-9*,\-]+\.[!=*a-z0-7]+)*""".r
    private def tSelector: Parser[TStmt] =
      selRegex ~ tTarget ^^ { case sel ~ t => TPriFilt(sel, Seq(t)) } |
      selRegex ~ tBlock ^^ { case sel ~ b => TPriFilt(sel, b) }

    private val propRegex: Parser[String] =
      """:[A-Za-z\-]+\s*,\s*!?\s*[a-z_\-]+\s*,\s*"(\\.|[^"\\])*"""".r
    private def tPropFilt: Parser[TStmt] =
      propRegex ~ tTarget ^^ { case raw ~ t => TPropFilt(raw.trim, Seq(t)) } |
      propRegex ~ tBlock ^^ { case raw ~ b => TPropFilt(raw.trim, b) }

    private def tAmp: Parser[TStmt] =
      "&" ~> tTarget ^^ TAmp.apply

    def tBody: Parser[TStmt] =
      tSet | tUnset | tIf | tForeach | tStop | tContinue | tCall | tReload |
      tAmp | tAction | tSelector | tPropFilt

    /** fold & continuations into the preceding selector's action list. */
    def foldAmp(ss: Seq[TStmt]): Seq[TStmt] =
      ss.foldLeft(Vector.empty[TStmt]) {
        case (acc :+ TPriFilt(sel, b), TAmp(a)) => acc :+ TPriFilt(sel, b :+ a)
        case (acc :+ TPropFilt(raw, b), TAmp(a)) => acc :+ TPropFilt(raw, b :+ a)
        case (acc, TAmp(a)) => acc :+ a // dangling &: keep the action
        case (acc, s) => acc :+ s
      }

    // ---- top-level items ----
    sealed trait TopItem
    final case class ObjItem(kind: String, params: TParams,
                             sub: Seq[(String, TParams)],
                             body: Option[Seq[TStmt]]) extends TopItem
    final case class StmtItem(s: TStmt) extends TopItem
    final case class IncludeItem(params: TParams) extends TopItem
    final case class FatalItem(msg: String) extends TopItem

    private def tElement: Parser[(String, TParams)] =
      ("property" | "constant") ~ ("(" ~> tParams <~ ")") ^^ {
        case k ~ p => (k, p)
      }
    private def objKind: Parser[String] =
      "template" | "lookup_table" | "main_queue" | "global" | "module" |
      "input" | "parser" | "timezone" | "dyn_stats" | "perctile_stats" |
      "percentile_stats" | "ratelimit" | "ruleset"
    private def tObj: Parser[TopItem] =
      objKind ~ ("(" ~> tParams <~ ")") ~
        opt("{" ~> (rep(tElement) ^^ (Left(_)) ||| rep(tBody) ^^ (Right(_))) <~ "}") ^^ {
        case kind ~ p ~ body =>
          val k = if (kind == "percentile_stats") "perctile_stats" else kind
          body match {
            case Some(Left(els)) if k == "template" => ObjItem(k, p, els, None)
            case Some(Right(b)) => ObjItem(k, p, Nil, Some(foldAmp(b)))
            case Some(Left(Nil)) => ObjItem(k, p, Nil, Some(Nil))
            case Some(Left(els)) => ObjItem(k, p, els, None)
            case None => ObjItem(k, p, Nil, None)
          }
      }
    private def tInclude: Parser[TopItem] =
      "include" ~> "(" ~> tParams <~ ")" ^^ IncludeItem.apply
    private def tFatal: Parser[TopItem] =
      """\$[A-Za-z][A-Za-z0-9]*[^\n]*""".r ^^ (ln => FatalItem(
        s"legacy $$-directive '${ln.takeWhile(!_.isWhitespace)}' is not supported by the translator")) |
      """![^\n]+""".r ^^ (ln => FatalItem(
        s"BSD-style tag block '${ln.trim}' is not supported by the translator")) |
      """\+[^\n]+""".r ^^ (ln => FatalItem(
        s"BSD-style host block '${ln.trim}' is not supported by the translator"))

    private def tTop: Parser[TopItem] =
      tInclude | tObj | tFatal | tBody ^^ StmtItem.apply

    def parseTop(src: String): Seq[TopItem] = parseAll(rep(tTop), src) match {
      case Success(r, _) => r
      case NoSuccess(msg, next) => throw new IllegalArgumentException(
        s"translate: parse error at line ${next.pos.line}, col ${next.pos.column}: $msg")
      case other => throw new IllegalStateException(other.toString)
    }
  }

  // ------------------------------------------------------- RS capture

  private def captureRs(src: String): Capture = {
    val cap = new Capture
    def items(text: String): Seq[TxP.TopItem] = TxP.parseTop(text).flatMap {
      case TxP.IncludeItem(p) =>
        val txt = p.collectFirst { case (k, TStr(v)) if k.equalsIgnoreCase("text") => v }
        val file = p.collectFirst { case (k, TStr(v)) if k.equalsIgnoreCase("file") => v }
        txt.map(items).orElse(file.map { f =>
          val path = java.nio.file.Paths.get(f)
          if (java.nio.file.Files.isReadable(path))
            items(java.nio.file.Files.readString(path))
          else Seq.empty
        }).getOrElse(Seq.empty)
      case other => Seq(other)
    }
    // group top-level statements into per-capture units: each statement
    // is its own cnfDoScript call, except & continuations which the
    // grammar folds into the preceding selector (actlst '&' s_act)
    val folded = {
      val raw = items(src)
      val out = Vector.newBuilder[TxP.TopItem]
      var prev: Option[TStmt] = None
      def flush(): Unit = { prev.foreach(s => out += TxP.StmtItem(s)); prev = None }
      raw.foreach {
        case TxP.StmtItem(TAmp(a)) => prev match {
          case Some(TPriFilt(sel, b)) => prev = Some(TPriFilt(sel, b :+ a))
          case Some(TPropFilt(r, b)) => prev = Some(TPropFilt(r, b :+ a))
          case _ => flush(); prev = Some(a)
        }
        case TxP.StmtItem(s) => flush(); prev = Some(s)
        case other => flush(); out += other
      }
      flush()
      out.result()
    }
    folded.foreach {
      case TxP.FatalItem(msg) => throw new IllegalArgumentException(msg)
      case TxP.ObjItem(kind, params, sub, body) => kind match {
        case "global" | "main_queue" =>
          val slot = if (kind == "global") cap.globals else cap.mainqueue
          slot match {
            case Some(it) => // mergeSingleton: replace same-key (ci), else append
              params.foreach { case (k, v) =>
                val i = it.params.indexWhere(_._1.equalsIgnoreCase(k))
                if (i >= 0) it.params = it.params.updated(i, (k, v))
                else it.params :+= ((k, v))
              }
            case None =>
              val it = new Item(kind, params)
              if (kind == "global") cap.globals = Some(it)
              else cap.mainqueue = Some(it)
          }
        case "ruleset" =>
          val it = new Item(kind, params)
          body.filter(_.nonEmpty).foreach { b =>
            it.script = Some(scriptText(b, 1, w => it.warnings :+= w))
            classifyBody(it, b)
          }
          cap.rulesets :+= it
        case "template" =>
          val it = new Item(kind, params)
          it.subobjs = sub.toVector
          cap.templates += it
        case other =>
          val it = new Item(other, params)
          (other match {
            case "module" => cap.modules
            case "input" => cap.inputs
            case "lookup_table" => cap.lookups
            case "parser" => cap.parsers
            case "timezone" => cap.timezones
            case "dyn_stats" => cap.dynstats
            case "perctile_stats" => cap.perctile
            case "ratelimit" => cap.ratelimits
          }) += it
      }
      case TxP.StmtItem(s) => captureTopStmt(cap, s)
      case TxP.IncludeItem(_) => // expanded above
    }
    cap
  }

  /** rsconfTranslateCaptureScript (translate.c:1383-1498): route a
    * top-level statement into RSYSLOG_DefaultRuleset. */
  private def captureTopStmt(cap: Capture, s: TStmt): Unit = {
    val it = cap.rulesets.find(_.name.contains("RSYSLOG_DefaultRuleset"))
      .getOrElse {
        val n = new Item("ruleset", Seq("name" -> TStr("RSYSLOG_DefaultRuleset")))
        n.warnings :+=
          "top-level statements normalized into explicit RSYSLOG_DefaultRuleset"
        cap.rulesets :+= n
        n
      }
    val hadScript = it.script.isDefined
    val text = scriptText(Seq(s), 1, w => it.warnings :+= w)
    it.script = Some(it.script.getOrElse("") + text)
    if (hadScript) {
      if (!appendStatement(it, Seq(s))) {
        it.yFilter = None; it.yActions = Vector.empty
        it.yStatements = Vector.empty; it.yKind = YNone
      }
    } else classifyBody(it, Seq(s))
  }

  // ------------------------------------------------------ YAML capture

  private def yamlUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t'); case c => sb.append(c)
        }
        i += 2
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  /** An inline `[ "a", "b" ]` scalar from YamlLite → TArr. */
  private def yamlVal(raw: String): TVal = {
    val t = raw.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) TArr(Nil)
      else TArr(inner.split(",").toSeq.map { e =>
        val v = e.trim
        if (v.length >= 2 && v.head == '"' && v.last == '"')
          yamlUnescape(v.substring(1, v.length - 1))
        else v
      })
    } else TStr(yamlUnescape(t))
  }

  private def yamlParams(m: YamlLite.YMap): TParams =
    m.entries.collect { case (k, YamlLite.YScalar(v)) => (k, yamlVal(v)) }

  private def captureYaml(src: String): Capture = {
    import YamlLite._
    val cap = new Capture
    val top = parse(src) match {
      case m: YMap => m
      case _ => YMap(Nil)
    }
    def listOf(key: String): Seq[YMap] = top.get(key) match {
      case Some(YList(items)) => items.collect { case m: YMap => m }
      case _ => Nil
    }
    top.get("global").collect { case m: YMap =>
      cap.globals = Some(new Item("global", yamlParams(m)))
    }
    top.get("mainqueue").collect { case m: YMap =>
      cap.mainqueue = Some(new Item("main_queue", yamlParams(m)))
    }
    def fill(key: String, kind: String,
             dst: scala.collection.mutable.Builder[Item, Vector[Item]]): Unit =
      listOf(key).foreach { m => dst += new Item(kind, yamlParams(m)) }
    fill("modules", "module", cap.modules)
    fill("inputs", "input", cap.inputs)
    listOf("templates").foreach { m =>
      val it = new Item("template",
        yamlParams(YMap(m.entries.filterNot(_._1 == "elements"))))
      m.get("elements").collect { case YList(els) =>
        // reference element shape: `- property:` marker with the params
        // as SIBLING keys at the marker's indent (writeYamlListSection
        // elements emit, translate.c:1800-1806) — also accept the
        // well-formed nested-map spelling
        it.subobjs = els.collect { case em: YMap =>
          em.entries.collectFirst {
            case (k, sub) if k == "property" || k == "constant" =>
              val nested = sub match {
                case sm: YMap => yamlParams(sm)
                case _ => Nil
              }
              val siblings = em.entries.collect {
                case (kk, YScalar(v)) if kk != k => (kk, yamlVal(v))
              }
              (k, nested ++ siblings)
          }
        }.flatten.toVector
      }
      cap.templates += it
    }
    fill("lookup_tables", "lookup_table", cap.lookups)
    fill("parsers", "parser", cap.parsers)
    fill("timezones", "timezone", cap.timezones)
    fill("dyn_stats", "dyn_stats", cap.dynstats)
    fill("perctile_stats", "perctile_stats", cap.perctile)
    fill("ratelimits", "ratelimit", cap.ratelimits)
    val bodyKeys = Set("script", "actions", "filter", "statements")
    listOf("rulesets").foreach { m =>
      val it = new Item("ruleset",
        yamlParams(YMap(m.entries.filterNot(e => bodyKeys(e._1)))))
      // body: one of script | actions | filter+actions | statements —
      // rebuild the statement list, then serialize + classify exactly
      // like the RS path so both inputs canonicalize identically
      val stmts: Seq[TStmt] = m.get("script") match {
        case Some(YScalar(text)) =>
          TxP.foldAmp(TxP.parseTop(text).collect { case TxP.StmtItem(s) => s })
        case _ =>
          def acts(n: Option[YNode]): Seq[TStmt] = n match {
            case Some(YList(items)) =>
              items.collect { case am: YMap => TAct(yamlParams(am)) }
            case _ => Nil
          }
          (m.get("filter"), m.get("statements")) match {
            case (Some(YScalar(f)), _) =>
              Seq(TPriFilt(yamlUnescape(f.trim), acts(m.get("actions"))))
            case (_, Some(YList(sts))) =>
              sts.collect { case sm: YMap =>
                val cond = sm.scalar("if").getOrElse("")
                val thenActs = sm.get("then") match {
                  case Some(_) => acts(sm.get("then"))
                  case None => sm.get("action") match {
                    case Some(am: YMap) => Seq(TAct(yamlParams(am)))
                    case _ => Nil
                  }
                }
                // `if:` strings are full expressions; a bare
                // prifilt('SEL') round-trips to the selector form
                yamlIfStmt(yamlUnescape(cond), thenActs)
              }
            case _ => acts(m.get("actions"))
          }
      }
      if (stmts.nonEmpty) {
        it.script = Some(scriptText(stmts, 1, w => it.warnings :+= w))
        classifyBody(it, stmts)
      }
      cap.rulesets :+= it
    }
    cap
  }

  private val PrifiltRe = """prifilt\('([^']*)'\)""".r
  /** A YAML `if:` entry: bare prifilt('sel') keeps selector identity,
    * anything else is an expression guard. */
  private def yamlIfStmt(cond: String, actions: Seq[TStmt]): TStmt =
    cond.trim match {
      case PrifiltRe(sel) => TPriFilt(sel, actions)
      case other => TIf(RainerParser.parseExpr(other), actions, Nil)
    }

  // -------------------------------------------------------- YAML emit

  private def yamlQuoted(s: String): String = quote(s)

  private def yEntry(sb: StringBuilder, k: String, v: TVal, indent: Int,
                     dash: Boolean): Unit = {
    sb.append(indentStr(indent))
    if (dash) sb.append("- ")
    sb.append(k).append(": ").append(emitVal(v)).append('\n')
  }

  private def yMappingExcept(sb: StringBuilder, ps: TParams, indent: Int,
                             skip: Option[(String, TVal)]): Unit =
    sorted(ps).foreach { p =>
      if (!skip.contains(p)) yEntry(sb, p._1, p._2, indent, dash = false)
    }

  private def yWarnings(sb: StringBuilder, it: Item, indent: Int): Unit =
    it.warnings.foreach { w =>
      sb.append(indentStr(indent)).append("# TRANSLATION WARNING: ")
        .append(w).append('\n')
    }

  private def yActionsBlock(sb: StringBuilder, label: String,
                            actions: Seq[TParams], indent: Int): Unit = {
    sb.append(indentStr(indent)).append(label).append(":\n")
    actions.foreach { a =>
      val fn = firstNode(a)
      fn match {
        case Some((k, v)) => yEntry(sb, k, v, indent + 1, dash = true)
        case None => sb.append(indentStr(indent + 1)).append("-\n")
      }
      yMappingExcept(sb, a, indent + 2, fn)
    }
  }

  private def yActionList(sb: StringBuilder, actions: Seq[TParams],
                          indent: Int): Unit =
    actions.foreach { a =>
      val fn = firstNode(a)
      fn match {
        case Some((k, v)) => yEntry(sb, k, v, indent, dash = true)
        case None => sb.append(indentStr(indent)).append("-\n")
      }
      yMappingExcept(sb, a, indent + 1, fn)
    }

  private def yListSection(sb: StringBuilder, name: String,
                           items: Seq[Item]): Unit = {
    if (items.isEmpty) return
    sb.append(name).append(":\n")
    items.foreach { it =>
      yWarnings(sb, it, 1)
      val fn = firstNode(it.params)
      if (it.params.isEmpty && it.script.isEmpty) { sb.append("  -\n") }
      else {
        fn match {
          case Some((k, v)) => yEntry(sb, k, v, 1, dash = true)
          case None => sb.append("  -\n")
        }
        yMappingExcept(sb, it.params, 2, fn)
        if (it.subobjs.nonEmpty) {
          sb.append("    elements:\n")
          it.subobjs.foreach { case (k, ps) =>
            sb.append("      - ").append(k).append(":\n")
            yMappingExcept(sb, ps, 4, None)
          }
        }
        it.yKind match {
          case YFilterActions if it.yFilter.isDefined =>
            sb.append("    filter: ").append(yamlQuoted(it.yFilter.get))
              .append('\n')
            yActionsBlock(sb, "actions", it.yActions, 2)
          case YActions =>
            yActionsBlock(sb, "actions", it.yActions, 2)
          case YStatements =>
            sb.append("    statements:\n")
            it.yStatements.foreach { case (cond, actions) =>
              sb.append("      - if: ").append(yamlQuoted(cond)).append('\n')
              if (actions.size == 1) {
                sb.append("        action:\n")
                val fn2 = firstNode(actions.head)
                fn2.foreach { case (k, v) => yEntry(sb, k, v, 5, dash = false) }
                yMappingExcept(sb, actions.head, 5, fn2)
              } else {
                sb.append("        then:\n")
                yActionList(sb, actions, 5)
              }
            }
          case _ =>
            it.script.foreach { sc =>
              sb.append("    script: |\n")
              sc.linesIterator.foreach { line =>
                sb.append(indentStr(3)).append(line).append('\n')
              }
            }
        }
      }
    }
  }

  private def emitYaml(cap: Capture): String = {
    val sb = new StringBuilder("version: 2\n\n")
    cap.globals.foreach { it =>
      yWarnings(sb, it, 0)
      sb.append("global:\n")
      yMappingExcept(sb, it.params, 1, None)
      sb.append('\n')
    }
    cap.mainqueue.foreach { it =>
      yWarnings(sb, it, 0)
      sb.append("mainqueue:\n")
      yMappingExcept(sb, it.params, 1, None)
      sb.append('\n')
    }
    yListSection(sb, "modules", cap.modules.result())
    yListSection(sb, "inputs", cap.inputs.result())
    yListSection(sb, "templates", cap.templates.result())
    yListSection(sb, "rulesets", cap.rulesets)
    yListSection(sb, "lookup_tables", cap.lookups.result())
    yListSection(sb, "parsers", cap.parsers.result())
    yListSection(sb, "timezones", cap.timezones.result())
    yListSection(sb, "dyn_stats", cap.dynstats.result())
    yListSection(sb, "perctile_stats", cap.perctile.result())
    yListSection(sb, "ratelimits", cap.ratelimits.result())
    sb.toString
  }

  // ---------------------------------------------------------- RS emit

  private def rsParams(ps: TParams): String =
    sorted(ps).map { case (k, v) => s"$k=${emitVal(v)}" }.mkString(" ")

  private def rsWarnings(sb: StringBuilder, it: Item): Unit =
    it.warnings.foreach { w =>
      sb.append("# TRANSLATION WARNING: ").append(w).append('\n')
    }

  private def rsList(sb: StringBuilder, keyword: String,
                     items: Seq[Item]): Unit =
    items.foreach { it =>
      rsWarnings(sb, it)
      it.kind match {
        case "template" =>
          sb.append("template(").append(rsParams(it.params))
          if (it.subobjs.isEmpty) sb.append(")\n\n")
          else {
            sb.append(") {\n")
            it.subobjs.foreach { case (k, ps) =>
              sb.append("  ").append(k).append('(').append(rsParams(ps))
                .append(")\n")
            }
            sb.append("}\n\n")
          }
        case "ruleset" =>
          sb.append("ruleset(").append(rsParams(it.params))
          it.script match {
            case Some(sc) => sb.append(") {\n").append(sc).append("}\n\n")
            case None => sb.append(") {}\n\n")
          }
        case _ =>
          sb.append(keyword).append('(').append(rsParams(it.params))
            .append(")\n\n")
      }
    }

  private def emitRs(cap: Capture): String = {
    val sb = new StringBuilder
    rsList(sb, "global", cap.globals.toSeq)
    rsList(sb, "main_queue", cap.mainqueue.toSeq)
    rsList(sb, "module", cap.modules.result())
    rsList(sb, "input", cap.inputs.result())
    rsList(sb, "template", cap.templates.result())
    rsList(sb, "lookup_table", cap.lookups.result())
    rsList(sb, "parser", cap.parsers.result())
    rsList(sb, "timezone", cap.timezones.result())
    rsList(sb, "dyn_stats", cap.dynstats.result())
    rsList(sb, "perctile_stats", cap.perctile.result())
    rsList(sb, "ratelimit", cap.ratelimits.result())
    rsList(sb, "ruleset", cap.rulesets)
    sb.toString
  }

  // ------------------------------------------------------------- API

  /** Translate config text between formats — `rsyslogd -o out -F fmt`.
    * `inputIsYaml` selects the reader; `toFormat` is "yaml" or
    * "rainerscript". Unsupported constructs (legacy $-directives, BSD
    * blocks, complex property selectors) throw with the reference's
    * diagnostic text. */
  def translate(src: String, inputIsYaml: Boolean, toFormat: String): String = {
    val cap = if (inputIsYaml) captureYaml(src) else captureRs(src)
    toFormat match {
      case "yaml" => emitYaml(cap)
      case "rainerscript" => emitRs(cap)
      case other => throw new IllegalArgumentException(
        s"translate: unknown output format '$other'")
    }
  }

  def toYaml(confText: String): String =
    translate(confText, inputIsYaml = false, toFormat = "yaml")
  def toRainerScript(yamlText: String): String =
    translate(yamlText, inputIsYaml = true, toFormat = "rainerscript")
}
