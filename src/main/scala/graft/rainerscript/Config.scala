package graft.rainerscript

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.parsing.combinator.RegexParsers
import graft.operators.LookupTable
import graft.templates.TemplateCompiler

/** Full rsyslog.conf front-end: config objects + script statements →
  * a compiled engine configuration (reference compile path SURVEY §3.1:
  * lexer → grammar → cnfobj/cnfstmt → rsconf assembly). Object types
  * covered (grammar/rainerscript.h:36-53): template, lookup_table,
  * ruleset; plus top-level script = the default ruleset.
  */
case class RsyslogConfig(
    templates: Map[String, String],
    jsonfTemplates: Map[String, Seq[TemplateCompiler.JsonfField]],
    lookupTables: Map[String, LookupTable],
    rulesets: Map[String, Seq[RStmt]],
    mainStmts: Seq[RStmt],
    // remaining CNFOBJ registries (grammar/rainerscript.h:36-53):
    // dyn_stats / perctile_stats / ratelimit / timezone objects — params
    // by object name, consumed by the DynStats / Stateful operators
    objects: Map[(String, String), Map[String, String]] = Map.empty) {

  /** Params of a named config object (kind = "dyn_stats",
    * "perctile_stats", "ratelimit", "timezone"). */
  def obj(kind: String, name: String): Option[Map[String, String]] =
    objects.get((kind, name))

  /** Run a ruleset (or the main/default script) against a LogEvent frame.
    * `call` statements expand inline (runtime/ruleset.c:277-294 direct
    * call path; queued rulesets = separate pipelines at the caller's
    * discretion). */
  def run(input: DataFrame, ruleset: String = ""): RainerCompiler.ScriptResult = {
    val stmts = if (ruleset.isEmpty) mainStmts
                else rulesets.getOrElse(ruleset,
                  throw new IllegalArgumentException(s"unknown ruleset $ruleset"))
    RainerCompiler.runStmts(inlineCalls(stmts, Set.empty), input, lookupTables,
      templates)
  }

  private def inlineCalls(stmts: Seq[RStmt], seen: Set[String]): Seq[RStmt] =
    stmts.flatMap {
      case RCall(name) if rulesets.contains(name) && !seen(name) =>
        inlineCalls(rulesets(name), seen + name)
      // call_indirect: evaluate-at-runtime dispatch lowers to one
      // name-equality guard per known ruleset (a message's computed name
      // selects at most one branch; unknown names fall through = NOP,
      // runtime/ruleset.c:250-255). Cycle guard via `seen` as for call.
      case RCallIndirect(e) =>
        rulesets.toSeq.sortBy(_._1).collect {
          case (name, body) if !seen(name) =>
            RIf(RBinop("==", e, RStr(name)), inlineCalls(body, seen + name), Nil)
        }
      case RIf(c, t, e) => Seq(RIf(c, inlineCalls(t, seen), inlineCalls(e, seen)))
      case RPriFilt(s, b) => Seq(RPriFilt(s, inlineCalls(b, seen)))
      case RPropFilt(p, o, n, v, b) => Seq(RPropFilt(p, o, n, v, inlineCalls(b, seen)))
      case other => Seq(other)
    }

  /** Render a named template over a frame (exec_template / action
    * template= resolution, rsconf.c:1570-1604 registration). */
  def renderTemplate(name: String, props: String => Column): Column =
    templates.get(name).map(t => TemplateCompiler.compile(t, props))
      .orElse(jsonfTemplates.get(name).map(fs => TemplateCompiler.compileJsonf(fs, props)))
      .getOrElse(throw new IllegalArgumentException(s"unknown template $name"))

  private def run0(): Unit = ()
}

object RsyslogConfig {

  /** Built-in templates (runtime/rsconf.c:215-260). */
  val builtinTemplates: Map[String, String] = Map(
    "RSYSLOG_TraditionalFileFormat" ->
      "%timereported:::date-rfc3164% %hostname% %syslogtag%%msg:::sp-if-no-1st-sp,drop-last-lf%\n",
    "RSYSLOG_FileFormat" ->
      "%timereported:::date-rfc3339% %hostname% %syslogtag%%msg:::sp-if-no-1st-sp,drop-last-lf%\n",
    "RSYSLOG_ForwardFormat" ->
      "<%pri%>%timereported:::date-rfc3339% %hostname% %syslogtag%%msg%",
    "RSYSLOG_TraditionalForwardFormat" ->
      "<%pri%>%timereported:::date-rfc3164% %hostname% %syslogtag%%msg%")

  private object P extends RainerParserBase {
    def cfgIdent: Parser[String] = """[A-Za-z_][A-Za-z0-9_\-.]*""".r
    def cfgString: Parser[String] =
      ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { s =>
        s.substring(1, s.length - 1).replace("\\\"", "\"")
      }
    def param: Parser[(String, String)] =
      cfgIdent ~ ("=" ~> cfgString) ^^ { case k ~ v => (k.toLowerCase, v) }
    def params: Parser[Map[String, String]] = rep(param) ^^ (_.toMap)

    sealed trait Item
    case class TemplateObj(p: Map[String, String],
                           fields: Seq[Map[String, String]]) extends Item
    case class LookupObj(p: Map[String, String]) extends Item
    case class RulesetObj(name: String, body: Seq[RStmt]) extends Item
    case class StmtItem(s: RStmt) extends Item

    /** template(name="t" type="string" string="...") or
      * template(name="t" type="list") { constant(value="x") property(name="msg") } */
    def templateObj: Parser[Item] =
      "template" ~> "(" ~> params ~ (")" ~> opt(listBody)) ^^ {
        case p ~ body => TemplateObj(p, body.getOrElse(Seq.empty))
      }
    def listEntry: Parser[Map[String, String]] =
      "constant" ~> "(" ~> params <~ ")" ^^ (p =>
        Map("outname" -> "__const", "name" -> p.getOrElse("value", ""))) |
      "property" ~> "(" ~> params <~ ")" ^^ { p =>
        Map("outname" -> p.getOrElse("outname", p.getOrElse("name", "")),
          "name" -> p.getOrElse("name", ""),
          "datatype" -> p.getOrElse("datatype", p.getOrElse("dataType", "string")),
          "onEmpty" -> p.getOrElse("onEmpty", p.getOrElse("onempty", "keep")))
      }
    def listBody: Parser[Seq[Map[String, String]]] = "{" ~> rep(listEntry) <~ "}"

    def lookupObj: Parser[Item] =
      "lookup_table" ~> "(" ~> params <~ ")" ^^ LookupObj.apply

    case class GenericObj(kind: String, p: Map[String, String]) extends Item
    def genericObj: Parser[Item] =
      ("dyn_stats" | "percentile_stats" | "perctile_stats" | "ratelimit" |
        "timezone") ~ ("(" ~> params <~ ")") ^^ {
        case kind ~ p =>
          GenericObj(if (kind == "percentile_stats") "perctile_stats" else kind, p)
      }

    def rulesetObj: Parser[Item] =
      "ruleset" ~> "(" ~> params ~ (")" ~> "{" ~> rep(stmt) <~ "}") ^^ {
        case p ~ body => RulesetObj(p.getOrElse("name",
          throw new IllegalArgumentException("ruleset needs name=")), body)
      }

    def item: Parser[Item] =
      templateObj | lookupObj | genericObj | rulesetObj | stmt ^^ StmtItem.apply

    def config: Parser[Seq[Item]] = rep(item)
  }

  def parse(src: String): RsyslogConfig = {
    val items = P.parseAll(P.config, src) match {
      case P.Success(r, _) => r
      case P.NoSuccess(msg, next) =>
        throw new IllegalArgumentException(
          s"config parse error at line ${next.pos.line}: $msg")
      case other => throw new IllegalStateException(other.toString)
    }
    var templates = builtinTemplates
    var jsonf = Map.empty[String, Seq[TemplateCompiler.JsonfField]]
    var lookups = Map.empty[String, LookupTable]
    var rulesets = Map.empty[String, Seq[RStmt]]
    var objects = Map.empty[(String, String), Map[String, String]]
    val main = scala.collection.mutable.ArrayBuffer.empty[RStmt]
    items.foreach {
      case P.TemplateObj(p, fields) =>
        val name = p("name")
        p.getOrElse("type", "string") match {
          case "string" => templates += name -> p("string")
          case "list" =>
            // list templates with only properties compile to jsonf when
            // option.jsonf="on", else to a concatenated string template
            if (p.get("option.jsonf").contains("on"))
              jsonf += name -> fields.filter(_("outname") != "__const").map(f =>
                TemplateCompiler.JsonfField(f("outname"), f("name"),
                  f.getOrElse("datatype", "string"), f.getOrElse("onEmpty", "keep")))
            else templates += name -> fields.map { f =>
              if (f("outname") == "__const") f("name").replace("%", "\\%")
              else s"%${f("name")}%"
            }.mkString
          case "subtree" => templates += name -> s"%${p("subtree")}%"
          case other =>
            throw new IllegalArgumentException(s"template type $other")
        }
      case P.LookupObj(p) =>
        lookups += p("name") -> LookupTable.load(p("file"))
      case P.RulesetObj(name, body) => rulesets += name -> body
      case P.GenericObj(kind, p) =>
        // timezone objects are identified by id=, the rest by name=
        objects += (kind, p.getOrElse("name", p.getOrElse("id", ""))) -> p
      case P.StmtItem(s) => main += s
    }
    RsyslogConfig(templates, jsonf, lookups, rulesets, main.toSeq, objects)
  }
}
