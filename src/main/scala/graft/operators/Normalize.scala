package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  case class CompiledRule(regex: String, fields: Seq[Field],
                          tags: Seq[String] = Nil,
                          annotations: Seq[(String, String)] = Nil)

  /** Strip a rulebase line's `rule=[tags]:` prefix when present —
    * pmnormalize/mmnormalize rule= params carry full rulebase LINES
    * (doc/source/configuration/modules/pmnormalize.rst examples), while
    * programmatic callers pass bare patterns; accept both. */
  def stripRulePrefix(l: String): String =
    if (l.startsWith("rule=")) l.substring(l.indexOf(':', 5) + 1) else l

  /** liblognorm \xHH escapes inside separators/terminators. */
  private[operators] def unescSep(s: String): String =
    "\\\\x([0-9a-fA-F]{2})".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))

  /** Rewrite every capturing group in a user regex to non-capturing so
    * it can embed inside the rule's positional capture scheme. */
  private def nonCapturing(re: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < re.length) {
      val c = re.charAt(i)
      if (c == '\\' && i + 1 < re.length) { sb.append(c).append(re.charAt(i + 1)); i += 2 }
      else {
        if (inClass) { if (c == ']') inClass = false; sb.append(c) }
        else c match {
          case '[' => inClass = true; sb.append(c)
          case '(' if i + 1 < re.length && re.charAt(i + 1) == '?' => sb.append(c)
          case '(' => sb.append("(?:")
          case _ => sb.append(c)
        }
        i += 1
      }
    }
    sb.toString
  }

  /** Non-capturing token regex for a field type — shared by the scalar
    * compile path and the tokenized recursion. */
  private def baseRe(typ: String): String = typ match {
    case "word" => "\\S+"
    case "number" => "\\d+"
    case "ipv4" => "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    case "quoted-string" => "\"[^\"]*\""
    case "rest" => ".*"
    case t if t.startsWith("char-to:") || t.startsWith("char-sep:") =>
      val raw = t.substring(t.indexOf(':') + 1)
      s"[^${java.util.regex.Pattern.quote(unescSep(raw))}]*"
    // timestamp-shaped fields (liblognorm date-rfc3164/date-rfc5424)
    case "date-rfc3164" =>
      "[A-Z][a-z]{2} (?: \\d|\\d{2}) \\d{2}:\\d{2}:\\d{2}"
    case "date-rfc5424" =>
      "\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:\\d{2})?"
    case t if t.startsWith("regex:") =>
      // %f:regex:<ere>% (liblognorm allowRegex fields,
      // tests/mmnormalize_regex.sh) — value = the whole match; user
      // capture groups neutralize so positional extraction stays aligned
      nonCapturing(graft.functions.PosixRegex.translate(unescSep(t.substring(6))))
    case t if t.startsWith("tokenized:") =>
      // %f:tokenized:<sep>:<subtype>% — one or more subtype tokens
      // joined by the literal separator (liblognorm tokenized field,
      // tests/mmnormalize_tokenized.sh); subtype may itself be
      // tokenized (the recursive comma/colon/hash corpus case)
      val parts = t.split(":", 3)
      require(parts.length == 3, s"malformed tokenized spec: $t")
      val sep = java.util.regex.Pattern.quote(unescSep(parts(1)))
      val tok = baseRe(parts(2))
      s"(?:$tok)(?:$sep(?:$tok))*"
    case other => throw new IllegalArgumentException(s"field type $other")
  }

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
        if (name == "-")
          // liblognorm's discard name: the field anchors the match but
          // is never captured or emitted (mmnormalize_processing_tests
          // rulebase `%-:date-rfc5424%` etc.)
          sb.append(typ match {
            case "quoted-string" => "\"(?:[^\"]*)\""
            case t => s"(?:${baseRe(t)})"
          })
        else {
          fields += Field(name, typ)
          sb.append(typ match {
            case "quoted-string" => "\"([^\"]*)\"" // capture INSIDE the quotes
            case t => s"(${baseRe(t)})"
          })
        }
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
    * runtime/parser.c:613-686) — single-pass expression: ONE regex match
    * attempt per rule per row, versus the Column-level coalesce chain's
    * (1 rlike + N regexp_extract) per rule. Output values are identical
    * (number fields long-normalized, non-numeric omitted like a null
    * struct field under to_json). */
  def normalize(msg: Column, rules: Seq[String]): Column =
    normalizeCompiled(msg, rules.map(r => compileRule(stripRulePrefix(r))))

  /** Parse a whole v1 rulebase: ordered `rule=TAGS:pattern` lines plus
    * `annotate=TAG:+name="value"` lines attached to every rule carrying
    * TAG (liblognorm v1 annotate — exercised by the reference's
    * tests/mmnormalize_processing_test1-4.sh over
    * tests/testsuites/mmnormalize_processing_tests.rulebase). `%-:type%`
    * fields anchor without capturing (the rulebase discard name).
    *
    * Subset boundary: liblognorm v2 `%{...}%` alternatives blocks are
    * NOT implemented — no scenario in the reference test suite
    * exercises them (grep over every rulebase under tests/testsuites);
    * the v1 grammar covers every mmnormalize/pmnormalize reference
    * test. */
  def compileRulebase(lines: Seq[String]): Seq[CompiledRule] = {
    val ruleRe = "^rule=([^:]*):(.*)$".r
    val annRe = "^annotate=([^:]+):\\+([^=]+)=\"(.*)\"\\s*$".r
    val anns = lines.collect {
      case annRe(tag, name, v) => (tag.trim, name.trim, v)
    }
    lines.flatMap { line =>
      line.trim match {
        case ruleRe(tags, pattern) =>
          val tagSeq = tags.split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val ruleAnns =
            anns.filter(a => tagSeq.contains(a._1)).map(a => (a._2, a._3))
          Some(compileRule(pattern).copy(tags = tagSeq, annotations = ruleAnns))
        case t if t.isEmpty || t.startsWith("#") || t.startsWith("annotate=") ||
          t.startsWith("version=") || t.startsWith("prefix=") => None
        case bare => Some(compileRule(bare))
      }
    }
  }

  /** normalize() over full rulebase lines — tags/annotate aware. */
  def normalizeRulebase(msg: Column, lines: Seq[String]): Column =
    normalizeCompiled(msg, compileRulebase(lines))

  private def normalizeCompiled(msg: Column, compiled: Seq[CompiledRule]): Column =
    org.apache.spark.sql.GraftBridge.column(
      NormalizeExpr(org.apache.spark.sql.GraftBridge.expression(msg),
        compiled.map(cr => (cr.regex, cr.fields.map(f => (f.name, f.typ)),
          cr.annotations))))

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
    * when the pattern doesn't match). Single-match struct kernel — one
    * regex execution per row instead of guard + one per field. */
  def grok(msg: Column, pattern: String): Column = {
    val cr = compileGrok(pattern)
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.RegexStructExpr(
        org.apache.spark.sql.GraftBridge.expression(msg), cr.regex,
        cr.fields.zipWithIndex.map { case (f, idx) => (f.name, idx + 1, 'S') }))
  }
}

/** First-matching-rule field extraction in one pass. `rules` is
  * (regex, fields(name, type), annotations(name, value)) per rule; the
  * first rule whose regex matches yields a JSON object of its captured
  * fields ("number" fields long-normalized; unparsable numbers omitted)
  * plus its tag-attached annotation constants, no rule → "{}".
  * Patterns compile once per executor (transient lazy), and generated
  * code is one instance-method call via a reference object.
  */
case class NormalizeExpr(child: Expression,
                         rules: Seq[(String, Seq[(String, String)],
                           Seq[(String, String)])])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false // null msg → "{}", never SQL NULL
  override def prettyName: String = "normalize"

  @transient private lazy val compiled =
    rules.map { case (re, fs, anns) =>
      (java.util.regex.Pattern.compile(re), fs, anns) }

  def kernel(msg: UTF8String): UTF8String = {
    val s = msg.toString
    val it = compiled.iterator
    while (it.hasNext) {
      val (p, fields, anns) = it.next()
      val m = p.matcher(s)
      if (m.find()) {
        val node = graft.functions.JsonPathUtil.mapper.createObjectNode()
        var i = 0
        while (i < fields.length) {
          val (name, typ) = fields(i)
          val v = m.group(i + 1)
          if (typ == "number") {
            try node.put(name, java.lang.Long.parseLong(v).toString)
            catch { case _: NumberFormatException => } // cast-null → omitted
          } else if (typ.startsWith("tokenized:"))
            node.set[com.fasterxml.jackson.databind.JsonNode](
              name, NormalizeExpr.tokNode(v, typ))
          else node.put(name, v)
          i += 1
        }
        // tag annotations last (liblognorm applies annotate after the
        // parse fields populate the event)
        anns.foreach { case (name, value) => node.put(name, value) }
        return UTF8String.fromString(node.toString)
      }
    }
    UTF8String.fromString("{}")
  }

  // A null msg still yields "{}" (the documented no-rule contract), so
  // the expression is total: eval/codegen handle the null child inline
  // instead of the UnaryExpression null-propagating fast path.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NormalizeExpr.EMPTY else kernel(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("normExpr", this,
      "graft.operators.NormalizeExpr")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? graft.operators.NormalizeExpr.EMPTY()
          : $ref.kernel(${childGen.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeExpr {
  /** Shared "{}" result for null/ruleless rows (referenced from codegen). */
  val EMPTY: UTF8String = UTF8String.fromString("{}")

  /** Tokenized field value → (nested) JSON array of STRING leaves —
    * liblognorm renders every tokenized element as a string, even for
    * number subtypes (tests/mmnormalize_tokenized.sh expected output). */
  def tokNode(text: String, spec: String): com.fasterxml.jackson.databind.JsonNode =
    if (spec.startsWith("tokenized:")) {
      val parts = spec.split(":", 3)
      val sep = Normalize.unescSep(parts(1))
      val arr = graft.functions.JsonPathUtil.mapper.createArrayNode()
      text.split(java.util.regex.Pattern.quote(sep), -1)
        .foreach(t => arr.add(tokNode(t, parts(2))))
      arr
    } else graft.functions.JsonPathUtil.mapper.getNodeFactory.textNode(text)
}
