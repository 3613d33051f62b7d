package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** mmnormalize-lite: a liblognorm-style rulebase compiler
  * (reference: plugins/mmnormalize, liblognorm rule syntax
  * `literal %field:type% literal …`). Each rule compiles to ONE regex +
  * regexp_extract projections — the whole rulebase becomes a coalesce
  * chain (first matching rule wins, like the reference's parse DAG).
  *
  * Supported field types: word, number, char-to:<c>, quoted-string,
  * ipv4, rest.
  */
object Normalize {

  case class Field(name: String, typ: String)
  case class CompiledRule(regex: String, fields: Seq[Field])

  /** Parse a rule string like "sshd[%pid:number%]: Accepted %method:word% for %user:word% from %ip:ipv4%" */
  def compileRule(rule: String): CompiledRule = {
    val sb = new StringBuilder("^")
    val fields = scala.collection.mutable.ArrayBuffer.empty[Field]
    var i = 0
    while (i < rule.length) {
      if (rule(i) == '%') {
        val end = rule.indexOf('%', i + 1)
        require(end > i, s"unterminated field in rule: $rule")
        val spec = rule.substring(i + 1, end)
        val parts = spec.split(":", 2)
        val (name, typ) = (parts(0), if (parts.length > 1) parts(1) else "word")
        fields += Field(name, typ)
        sb.append(typ match {
          case "word" => "(\\S+)"
          case "number" => "(\\d+)"
          case "ipv4" => "(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})"
          case "quoted-string" => "\"([^\"]*)\""
          case "rest" => "(.*)"
          case t if t.startsWith("char-to:") =>
            val c = java.util.regex.Pattern.quote(t.substring(8))
            s"([^$c]*)"
          case other => throw new IllegalArgumentException(s"field type $other")
        })
        i = end + 1
      } else {
        sb.append(java.util.regex.Pattern.quote(rule(i).toString))
        i += 1
      }
    }
    CompiledRule(sb.toString, fields.toSeq)
  }

  /** Extract one rule's fields as a JSON column (the `$!` tree the
    * reference populates), null when the rule doesn't match. */
  def extract(msg: Column, rule: String): Column = {
    val cr = compileRule(rule)
    when(msg.rlike(cr.regex),
      to_json(struct(cr.fields.zipWithIndex.map { case (f, idx) =>
        val v = regexp_extract(msg, cr.regex, idx + 1)
        (if (f.typ == "number") v.cast("long").cast("string") else v).as(f.name)
      }: _*)))
  }

  /** First-matching-rule-wins over a rulebase (parser chain semantics,
    * runtime/parser.c:613-686). */
  def normalize(msg: Column, rules: Seq[String]): Column =
    coalesce(rules.map(r => extract(msg, r)) :+ lit("{}"): _*)

  // ------------------------------------------------------------- mmgrok
  /** Grok base-pattern table (the usual logstash names; reference:
    * contrib/mmgrok/mmgrok.c compiles patterns via libgrok). */
  val grokPatterns: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "NUMBER" -> "(?:\\d+(?:\\.\\d+)?)",
    "INT" -> "[+-]?\\d+",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]?\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "LOGLEVEL" -> "(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "HOSTNAME" -> "[A-Za-z0-9][A-Za-z0-9._-]*")

  /** Compile a grok expression `lit %{TYPE:name} lit …` into one regex +
    * named capture list — same shape as the liblognorm rule compiler
    * above, so the extraction path is shared. */
  def compileGrok(pattern: String): CompiledRule = {
    val sb = new StringBuilder("^")
    val fields = scala.collection.mutable.ArrayBuffer.empty[Field]
    val m = java.util.regex.Pattern.compile("%\\{(\\w+)(?::(\\w+))?\\}").matcher(pattern)
    var last = 0
    while (m.find()) {
      sb.append(java.util.regex.Pattern.quote(pattern.substring(last, m.start())))
      val typ = m.group(1)
      val re = grokPatterns.getOrElse(typ,
        throw new IllegalArgumentException(s"unknown grok pattern %{$typ}"))
      Option(m.group(2)) match {
        case Some(name) => fields += Field(name, typ); sb.append(s"($re)")
        case None => sb.append(s"(?:$re)")
      }
      last = m.end()
    }
    sb.append(java.util.regex.Pattern.quote(pattern.substring(last))).append("$")
    CompiledRule(sb.toString.replace("\\Q\\E", ""), fields.toSeq)
  }

  /** mmgrok: extract grok fields as named struct columns (null struct
    * when the pattern doesn't match). */
  def grok(msg: Column, pattern: String): Column = {
    val cr = compileGrok(pattern)
    when(msg.rlike(cr.regex),
      struct(cr.fields.zipWithIndex.map { case (f, idx) =>
        regexp_extract(msg, cr.regex, idx + 1).as(f.name)
      }: _*))
  }
}
