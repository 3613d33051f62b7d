package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ObjectNode, ArrayNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for mutable-JSON-tree semantics.
  *
  * rsyslog messages carry json-c variable trees mutated by
  * `set $!a!b = expr` / `unset $!a!b` (reference: runtime/ruleset.c:190-227,
  * runtime/msg.h:294). Spark has no built-in JSON mutation, so these are
  * genuine custom `Expression`s (SURVEY.md §1.2). Paths use rsyslog's `!`
  * separator ("a!b!c"); a leading `$!` is stripped.
  */
object JsonPathUtil {
  val mapper = new ObjectMapper()

  def splitPath(path: String): Array[String] = {
    val p0 = if (path.startsWith("$!")) path.substring(2)
             else if (path.startsWith("!")) path.substring(1)
             else path
    p0.split('!').filter(_.nonEmpty)
  }

  /** Field lookup with the reference's `variables.casesensitive` toggle
    * (glbl.c:1405 → fjson_global_do_case_sensitive_comparison): ci=false
    * is a plain exact get; ci=true returns the FIRST case-insensitively
    * matching field in insertion order — libfastjson's comparison under
    * the insensitive global (an exact match is also a ci match, so
    * first-in-order wins regardless of exactness). */
  def getField(node: JsonNode, name: String, ci: Boolean): JsonNode = {
    if (!ci) return node.get(name)
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.equalsIgnoreCase(name)) return e.getValue
    }
    null
  }

  /** Navigate to parent of the leaf, creating objects along the way. */
  def ensureParent(root: ObjectNode, segs: Array[String]): ObjectNode =
    ensureParent(root, segs, ci = false)

  def ensureParent(root: ObjectNode, segs: Array[String], ci: Boolean): ObjectNode = {
    var cur = root
    var i = 0
    while (i < segs.length - 1) {
      val nxt = getField(cur, segs(i), ci)
      cur = nxt match {
        case o: ObjectNode => o
        case _ =>
          val fresh = mapper.createObjectNode()
          // same in-place rule as putTagged: a ci-matched existing key
          // keeps its original spelling/position when overwritten
          var key = segs(i)
          if (ci && nxt != null) {
            val it = cur.fieldNames()
            var hit: String = null
            while (hit == null && it.hasNext) {
              val k = it.next()
              if (k.equalsIgnoreCase(key)) hit = k
            }
            if (hit != null) key = hit
          }
          cur.set(key, fresh)
          fresh
      }
      i += 1
    }
    cur
  }

  /** One path segment with optional array subscripts — "foo", "foo[3]",
    * "foo[3][0]" (lexer VAR charset includes [], lexer.l:373;
    * tests/json_array_subscripting.sh). 0-based like the reference;
    * subscript on a non-array or out of bounds → null. */
  def navSeg(node: JsonNode, seg: String): JsonNode =
    navSeg(node, seg, ci = false)

  def navSeg(node: JsonNode, seg: String, ci: Boolean): JsonNode = {
    val bracket = seg.indexOf('[')
    if (bracket < 0) return getField(node, seg, ci)
    var cur: JsonNode =
      if (bracket == 0) node else getField(node, seg.substring(0, bracket), ci)
    var k = bracket
    while (cur != null && k < seg.length && seg.charAt(k) == '[') {
      val close = seg.indexOf(']', k)
      if (close < 0) return null
      val idxStr = seg.substring(k + 1, close)
      if (idxStr.isEmpty || !idxStr.forall(_.isDigit)) return null
      cur = if (cur.isArray) cur.get(idxStr.toInt) else null
      k = close + 1
    }
    cur
  }

  def parseOrEmpty(s: String): ObjectNode =
    try {
      mapper.readTree(s) match {
        case o: ObjectNode => o
        case _ => mapper.createObjectNode()
      }
    } catch { case _: Exception => mapper.createObjectNode() }

  /** Compact value-type tag so generated code can dispatch without
    * DataType objects: 0=long 1=int 2=double 3=boolean 4=string/other. */
  def typeTag(dt: DataType): Int = dt match {
    case LongType => 0
    case IntegerType => 1
    case DoubleType => 2
    case BooleanType => 3
    case _ => 4
  }

  def putTagged(parent: ObjectNode, leaf: String, v: Any, tag: Int): Unit =
    putTagged(parent, leaf, v, tag, ci = false)

  def putTagged(parent: ObjectNode, leaf: String, v: Any, tag: Int,
                ci: Boolean): Unit = {
    // fjson add under the insensitive global (json-c lineage,
    // json_object_object_add): a case-insensitively matched EXISTING
    // entry has its value replaced IN PLACE — the hash-table slot keeps
    // the original key pointer, so the ORIGINAL spelling and position
    // survive the write; only the value changes. (An earlier build
    // removed the old entry and re-inserted the new spelling at the
    // end — that respells and reorders, diverging from the reference.)
    var key = leaf
    if (ci) {
      val it = parent.fieldNames()
      var hit: String = null
      while (hit == null && it.hasNext) {
        val k = it.next()
        if (k.equalsIgnoreCase(leaf)) hit = k
      }
      if (hit != null) key = hit
    }
    if (v == null) { parent.putNull(key); return }
    tag match {
      case 0 => parent.put(key, v.asInstanceOf[Long])
      case 1 => parent.put(key, v.asInstanceOf[Int].toLong)
      case 2 => parent.put(key, v.asInstanceOf[Double])
      case 3 => parent.put(key, v.asInstanceOf[Boolean])
      case _ =>
        val s = v.toString
        val trimmed = s.trim
        val asTree: JsonNode =
          if (trimmed.startsWith("{") || trimmed.startsWith("[")) {
            try mapper.readTree(trimmed) catch { case _: Exception => null }
          } else null
        if (asTree != null && !asTree.isValueNode) parent.set[JsonNode](key, asTree)
        else parent.put(key, s)
    }
  }

  // ---- static kernels for generated code (null dispatch inside) ----

  /** json_set kernel: p==null → j unchanged (may be null). */
  def setKernel(j: UTF8String, p: UTF8String, v: Any, tag: Int): UTF8String =
    setKernel(j, p, v, tag, false)

  def setKernel(j: UTF8String, p: UTF8String, v: Any, tag: Int,
                ci: Boolean): UTF8String = {
    if (p == null) return j
    val root = parseOrEmpty(if (j == null) "{}" else j.toString)
    val segs = splitPath(p.toString)
    if (segs.isEmpty) return j
    val parent = ensureParent(root, segs, ci)
    putTagged(parent, segs.last, v, tag, ci)
    UTF8String.fromString(mapper.writeValueAsString(root))
  }

  /** batched json_set kernel: guard==false/null → j unchanged. */
  def setMultiKernel(j: UTF8String, guard: java.lang.Boolean, paths: Array[String],
                     values: Array[AnyRef], tags: Array[Int]): UTF8String =
    setMultiKernel(j, guard, paths, values, tags, false)

  def setMultiKernel(j: UTF8String, guard: java.lang.Boolean, paths: Array[String],
                     values: Array[AnyRef], tags: Array[Int],
                     ci: Boolean): UTF8String = {
    if (guard == null || !guard.booleanValue()) return j
    val root = parseOrEmpty(if (j == null) "{}" else j.toString)
    var i = 0
    while (i < paths.length) {
      val segs = splitPath(paths(i))
      if (segs.nonEmpty) {
        val parent = ensureParent(root, segs, ci)
        putTagged(parent, segs.last, values(i), tags(i), ci)
      }
      i += 1
    }
    UTF8String.fromString(mapper.writeValueAsString(root))
  }

  /** json_unset kernel: j==null → null; p==null → j. */
  def unsetKernel(j: UTF8String, p: UTF8String): UTF8String =
    unsetKernel(j, p, false)

  def unsetKernel(j: UTF8String, p: UTF8String, ci: Boolean): UTF8String = {
    if (j == null) return null
    if (p == null) return j
    val root = parseOrEmpty(j.toString)
    val segs = splitPath(p.toString)
    if (segs.nonEmpty) {
      var cur: JsonNode = root
      var i = 0
      while (i < segs.length - 1 && cur != null) {
        cur = getField(cur, segs(i), ci); i += 1
      }
      cur match {
        case o: ObjectNode =>
          if (ci) {
            val it = o.fieldNames()
            var hit: String = null
            while (hit == null && it.hasNext) {
              val k = it.next()
              if (k.equalsIgnoreCase(segs.last)) hit = k
            }
            if (hit != null) o.remove(hit)
          } else o.remove(segs.last)
        case _ =>
      }
    }
    UTF8String.fromString(mapper.writeValueAsString(root))
  }

  /** json_exists kernel. */
  def existsKernel(j: UTF8String, p: UTF8String): Boolean =
    existsKernel(j, p, false)

  def existsKernel(j: UTF8String, p: UTF8String, ci: Boolean): Boolean = {
    if (j == null || p == null) return false
    val segs = splitPath(p.toString)
    var cur: JsonNode = try mapper.readTree(j.toString) catch { case _: Exception => null }
    var i = 0
    while (i < segs.length && cur != null) { cur = getField(cur, segs(i), ci); i += 1 }
    cur != null
  }

  /** find-json scan kernel (mmjsonparse.c find_first_json_object):
    * candidate end via a string/escape-aware brace balance, validity via
    * a real parse; a failed candidate advances the scan one char past
    * its '{'. Returns the object substring or null. */
  def findJsonKernel(msg: String, maxScan: Int, allowTrailing: Boolean): String = {
    val scanEnd = math.min(maxScan.toLong, msg.length.toLong).toInt
    var i = msg.indexOf('{')
    while (i >= 0 && i < scanEnd) {
      // balance scan bounded by the scan window
      var j = i
      var depth = 0
      var inStr = false
      var esc = false
      var end = -1
      while (j < scanEnd && end < 0) {
        val ch = msg.charAt(j)
        if (inStr) {
          if (esc) esc = false
          else if (ch == '\\') esc = true
          else if (ch == '"') inStr = false
        } else ch match {
          case '"' => inStr = true
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) end = j
          case _ => ()
        }
        j += 1
      }
      if (end >= 0) {
        val cand = msg.substring(i, end + 1)
        val ok =
          try mapper.readTree(cand).isObject
          catch { case _: Exception => false }
        if (ok) {
          if (!allowTrailing) {
            var k = end + 1
            while (k < msg.length && Character.isWhitespace(msg.charAt(k))) k += 1
            if (k < msg.length) return null // result 3: trailing rejected
          }
          return cand
        }
      }
      i = msg.indexOf('{', i + 1)
    }
    null
  }

  /** json-c SPACED-format serializer (the reference's default render for
    * JSON trees: jsonToString at runtime/msg.c:1050-1068 uses
    * glblJsonFormatOpt = JSON_C_TO_STRING_SPACED, runtime/glbl.c:104).
    * Spacing per json-c json_object_to_json_string_ext: a space after
    * every `{`/`[`/`,`, after each key's colon, and before the closing
    * brace of a non-empty container — `{ "a": 1, "b": [ 2, 3 ] }`;
    * empty containers stay `{}`/`[]`. String escaping mirrors
    * json-c json_escape_str: short forms for \b\t\n\f\r, `\"`, `\\`,
    * other control chars as lowercase \u00xx, `/` NOT escaped, non-ASCII
    * passed through as UTF-8. */
  private def escJsonC(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '/' => sb.append("\\/") // json-c default escapes '/' (no NOSLASHESCAPE)
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\f' => sb.append("\\f")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04x") else sb.append(c)
      }
      i += 1
    }
  }

  private def renderSpaced(n: JsonNode, sb: java.lang.StringBuilder): Unit = {
    if (n.isObject) {
      sb.append('{')
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(',')
        first = false
        sb.append(" \"")
        escJsonC(e.getKey, sb)
        sb.append("\": ")
        renderSpaced(e.getValue, sb)
      }
      if (!first) sb.append(' ')
      sb.append('}')
    } else if (n.isArray) {
      sb.append('[')
      var i = 0
      while (i < n.size()) {
        if (i > 0) sb.append(',')
        sb.append(' ')
        renderSpaced(n.get(i), sb)
        i += 1
      }
      if (n.size() > 0) sb.append(' ')
      sb.append(']')
    } else if (n.isTextual) {
      sb.append('"'); escJsonC(n.textValue(), sb); sb.append('"')
    } else sb.append(n.asText()) // numbers keep their literal, bool, null
  }

  /** Render the value at `path` ("" = whole tree) the way the reference's
    * property fetch does (getJSONPropVal → jsonToString, msg.c:3950+):
    * strings bare (no quotes), scalars by literal, objects/arrays in
    * json-c SPACED form. Missing path, JSON null, or an unparsable tree
    * → SQL null. Path segments split on `!` and `.` like the template
    * resolver's get_json_object form did. */
  def renderKernel(j: UTF8String, path: String): UTF8String =
    renderKernel(j, path, false)

  def renderKernel(j: UTF8String, path: String, ci: Boolean): UTF8String = {
    if (j == null) return null
    var cur: JsonNode =
      try mapper.readTree(j.toString) catch { case _: Exception => null }
    if (path.nonEmpty) {
      val segs = path.split(Array('!', '.')).filter(_.nonEmpty)
      var i = 0
      while (i < segs.length && cur != null) {
        cur = JsonPathUtil.navSeg(cur, segs(i), ci); i += 1
      }
    }
    if (cur == null || cur.isNull || cur.isMissingNode) return null
    if (cur.isTextual) return UTF8String.fromString(cur.textValue())
    if (cur.isValueNode) return UTF8String.fromString(cur.asText())
    val sb = new java.lang.StringBuilder(64)
    renderSpaced(cur, sb)
    UTF8String.fromString(sb.toString)
  }

  /** JSON string-escape kernel (the json-c json_escape_str table, shared
    * verbatim by omawslogshlc.c appendEvent:152-196: two-char escapes for
    * quote/backslash/\b\f\n\r\t, lowercase `\u%04x` for remaining C0
    * controls, `/` and non-ASCII passed through). */
  def escapeKernel(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 8)
    escJsonC(str, sb)
    UTF8String.fromString(sb.toString)
  }

  /** json-c PLAIN (compact) renderer: no spacing at all —
    * `{"a":1,"b":[2,3]}` (json_object_to_json_string_ext with
    * JSON_C_TO_STRING_PLAIN). Key order preserved like json-c's
    * insertion-ordered object table. */
  private def renderPlain(n: JsonNode, sb: java.lang.StringBuilder): Unit = {
    if (n.isObject) {
      sb.append('{')
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(',')
        first = false
        sb.append('"'); escJsonC(e.getKey, sb); sb.append("\":")
        renderPlain(e.getValue, sb)
      }
      sb.append('}')
    } else if (n.isArray) {
      sb.append('[')
      var i = 0
      while (i < n.size()) {
        if (i > 0) sb.append(',')
        renderPlain(n.get(i), sb)
        i += 1
      }
      sb.append(']')
    } else if (n.isTextual) {
      sb.append('"'); escJsonC(n.textValue(), sb); sb.append('"')
    } else sb.append(n.asText()) // numbers by literal, bool, null
  }

  /** Validate-and-compact kernel (omazuredce.c buildRecordJson:668-727):
    * the input must parse as ONE JSON object — leading/trailing
    * whitespace tolerated, any trailing non-whitespace token or a
    * non-object top level rejects (→ null) — and is re-serialized in
    * json-c PLAIN form so template formatting can't bloat the payload. */
  def compactKernel(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    try {
      val p = mapper.createParser(str)
      val tree: JsonNode = p.readValueAsTree[JsonNode]()
      // trailing-garbage check ≡ `parseEnd != msgLen` after isspace skip
      val trailing = try { p.nextToken() != null } catch { case _: Exception => true }
      p.close()
      if (tree == null || !tree.isObject || trailing) return null
      val sb = new java.lang.StringBuilder(str.length)
      renderPlain(tree, sb)
      UTF8String.fromString(sb.toString)
    } catch { case _: Exception => null }
  }

  /** Write an evaluated Spark value into `parent` at `leaf`, preserving
    * its type (JSON-object strings embed as subtrees — rsyslog 'J' svar). */
  def putTyped(parent: ObjectNode, leaf: String, v: Any,
               dt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    if (v == null) { parent.putNull(leaf); return }
    dt match {
      case LongType    => parent.put(leaf, v.asInstanceOf[Long])
      case IntegerType => parent.put(leaf, v.asInstanceOf[Int].toLong)
      case DoubleType  => parent.put(leaf, v.asInstanceOf[Double])
      case BooleanType => parent.put(leaf, v.asInstanceOf[Boolean])
      case _ =>
        val s = v.toString
        val trimmed = s.trim
        val asTree: JsonNode =
          if (trimmed.startsWith("{") || trimmed.startsWith("[")) {
            try mapper.readTree(trimmed) catch { case _: Exception => null }
          } else null
        if (asTree != null && !asTree.isValueNode) parent.set[JsonNode](leaf, asTree)
        else parent.put(leaf, s)
    }
  }
}

/** json_render(json, path): the value at path rendered the way the
  * reference's property fetch renders it — strings bare, scalars by
  * literal, objects/arrays in json-c SPACED form (`{ "a": 1 }`), the
  * glblJsonFormatOpt default every `%$!…%` template render and script
  * string coercion goes through (runtime/msg.c:1067, glbl.c:104).
  * path "" renders the whole tree.
  */
case class JsonRenderExpr(child: Expression, path: String,
                          ci: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_render"

  override protected def nullSafeEval(j: Any): Any =
    JsonPathUtil.renderKernel(j.asInstanceOf[UTF8String], path, ci)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathRef = ctx.addReferenceObj("renderPath", path, "java.lang.String")
    nullSafeCodeGen(ctx, ev, j => s"""
      ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.renderKernel($j, $pathRef, $ci);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** json_set(json, path, value): returns json with value written at path.
  * Value keeps its Spark type: longs/doubles/booleans become JSON numbers/
  * booleans; a string that itself parses as JSON object/array is embedded
  * as a subtree (mirrors rsyslog's 'J'-typed svar assignment).
  */
case class JsonSetExpr(json: Expression, path: Expression, value: Expression,
                       ci: Boolean = false)
    extends TernaryExpression {
  override def first: Expression = json
  override def second: Expression = path
  override def third: Expression = value
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_set"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    JsonPathUtil.setKernel(
      json.eval(input).asInstanceOf[UTF8String],
      path.eval(input).asInstanceOf[UTF8String],
      value.eval(input), JsonPathUtil.typeTag(value.dataType), ci)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = json.genCode(ctx); val p = path.genCode(ctx); val v = value.genCode(ctx)
    val tag = JsonPathUtil.typeTag(value.dataType)
    ev.copy(code = code"""
      ${j.code}
      ${p.code}
      ${v.code}
      UTF8String ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.setKernel(
        ${j.isNull} ? null : ${j.value},
        ${p.isNull} ? null : ${p.value},
        ${v.isNull} ? null : (Object) ${v.value}, $tag, $ci);
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(json = f, path = s, value = t)
}

/** Batched json_set: applies N (path, value) writes with ONE parse and
  * ONE serialize of the tree — the compiler's peephole for consecutive
  * `set $!…` statements (each JsonSetExpr alone costs a full Jackson
  * roundtrip; scripts routinely run 5-10 sets in a row).
  * children = json +: guard +: values; writes apply only when guard=true.
  */
case class JsonSetMultiExpr(paths: Seq[String], children: Seq[Expression],
                            ci: Boolean = false)
    extends Expression {
  private def json: Expression = children.head
  private def guard: Expression = children(1)
  private def values: Seq[Expression] = children.drop(2)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_set_multi"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = json.eval(input).asInstanceOf[UTF8String]
    val g = guard.eval(input).asInstanceOf[java.lang.Boolean]
    // short-circuit: a false guard must not evaluate the values (they can
    // be arbitrarily expensive and the statement is usually inside a
    // rarely-true `if`)
    if (g == null || !g.booleanValue()) return j
    JsonPathUtil.setMultiKernel(j, g, paths.toArray,
      values.map(v => v.eval(input).asInstanceOf[AnyRef]).toArray,
      values.map(v => JsonPathUtil.typeTag(v.dataType)).toArray, ci)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = json.genCode(ctx); val g = guard.genCode(ctx)
    val vs = values.map(_.genCode(ctx))
    val pathsRef = ctx.addReferenceObj("jsmPaths", paths.toArray, "java.lang.String[]")
    val tagsRef = ctx.addReferenceObj("jsmTags",
      values.map(v => JsonPathUtil.typeTag(v.dataType)).toArray, "int[]")
    val valsArr = ctx.freshName("jsmVals")
    val fill = vs.zipWithIndex.map { case (v, i) =>
      s"$valsArr[$i] = ${v.isNull} ? null : (Object) ${v.value};"
    }.mkString("\n")
    // value expressions evaluate only under a true guard (same
    // short-circuit as the interpreted path)
    ev.copy(code = code"""
      ${j.code}
      ${g.code}
      UTF8String ${ev.value};
      if (!${g.isNull} && ${g.value}) {
        ${vs.map(_.code.toString).mkString("\n")}
        Object[] $valsArr = new Object[${vs.length}];
        $fill
        ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.setMultiKernel(
          ${j.isNull} ? null : ${j.value}, Boolean.TRUE,
          $pathsRef, $valsArr, $tagsRef, $ci);
      } else {
        ${ev.value} = ${j.isNull} ? null : ${j.value};
      }
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** json_unset(json, path): delete the node at path (rsyslog `unset`). */
case class JsonUnsetExpr(json: Expression, path: Expression,
                         ci: Boolean = false)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_unset"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    JsonPathUtil.unsetKernel(
      json.eval(input).asInstanceOf[UTF8String],
      path.eval(input).asInstanceOf[UTF8String], ci)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = json.genCode(ctx); val p = path.genCode(ctx)
    ev.copy(code = code"""
      ${j.code}
      ${p.code}
      UTF8String ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.unsetKernel(
        ${j.isNull} ? null : ${j.value},
        ${p.isNull} ? null : ${p.value}, $ci);
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(json = l, path = r)
}

/** json_merge(dst, src): merge src object's fields into dst (rsyslog
  * append_json, grammar/rainerscript.c:3614). Scalars in src overwrite dst.
  */
case class JsonMergeExpr(dst: Expression, src: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = dst
  override def right: Expression = src
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_merge"

  private def merge(a: ObjectNode, b: ObjectNode): Unit = {
    val it = b.fields()
    while (it.hasNext) {
      val e = it.next()
      (a.get(e.getKey), e.getValue) match {
        case (ao: ObjectNode, bo: ObjectNode) => merge(ao, bo)
        // explicit type param: Jackson's generic set() would otherwise
        // infer BoxedUnit here and CCE at runtime
        case (_, v) => a.set[JsonNode](e.getKey, v)
      }
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = dst.eval(input)
    val s = src.eval(input)
    if (s == null) return d
    if (d == null) return s
    val droot = JsonPathUtil.parseOrEmpty(d.toString)
    val sroot = JsonPathUtil.parseOrEmpty(s.toString)
    merge(droot, sroot)
    UTF8String.fromString(JsonPathUtil.mapper.writeValueAsString(droot))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(dst = l, src = r)
}

/** unflatten(json, sep): dotted keys → nested objects (reference:
  * contrib/fmunflatten/fmunflatten.c:207, plugins/mmjsontransform).
  * {"a.b": 1, "a.c": 2} → {"a": {"b": 1, "c": 2}}
  */
case class JsonUnflattenExpr(json: Expression, sep: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = json
  override def right: Expression = sep
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_unflatten"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = json.eval(input)
    if (j == null) return null
    val sepEv = sep.eval(input)
    val sepCh = if (sepEv == null) "." else sepEv.toString
    // a non-object input passes through unchanged — fmunflatten returns
    // the value itself when there is nothing to unflatten
    // (tests/rscript_unflatten_non_object.sh)
    val parsed =
      try JsonPathUtil.mapper.readTree(j.toString)
      catch { case _: Exception => null }
    if (parsed == null || !parsed.isObject) return j
    val root = parsed.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val out = JsonPathUtil.mapper.createObjectNode()
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val segs = e.getKey.split(java.util.regex.Pattern.quote(sepCh)).filter(_.nonEmpty)
      if (segs.isEmpty) out.set(e.getKey, e.getValue)
      else {
        val parent = JsonPathUtil.ensureParent(out, segs)
        parent.set(segs.last, e.getValue)
      }
    }
    UTF8String.fromString(JsonPathUtil.mapper.writeValueAsString(out))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(json = l, sep = r)
}

/** json_exists(json, path): rsyslog `exists($!a!b)` — existence is distinct
  * from null/empty (grammar/grammar.y:224, runtime/msg.h:286).
  */
case class JsonExistsExpr(json: Expression, path: Expression,
                          ci: Boolean = false)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_exists"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    JsonPathUtil.existsKernel(
      json.eval(input).asInstanceOf[UTF8String],
      path.eval(input).asInstanceOf[UTF8String], ci)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val j = json.genCode(ctx); val p = path.genCode(ctx)
    ev.copy(
      code = code"""
        ${j.code}
        ${p.code}
        boolean ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.existsKernel(
          ${j.isNull} ? null : ${j.value},
          ${p.isNull} ? null : ${p.value}, $ci);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(json = l, path = r)
}

/** mmjsonparse mode="find-json": scan the message for the first parseable
  * JSON OBJECT within `maxScan` chars and return it as a substring, or
  * null (plugins/mmjsonparse/mmjsonparse.c find_first_json_object,
  * :224-291): try each '{'; a candidate that fails to parse advances the
  * scan by one char; with allowTrailing=false, anything but whitespace
  * after the object rejects the match (result 3 = give up, not
  * keep-scanning — mirrored here). Candidate bounds come from a
  * string/escape-aware balance scan, validated by a real JSON parse.
  */
case class FindJsonExpr(child: Expression, maxScan: Int = 65536,
                        allowTrailing: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "find_json"

  override protected def nullSafeEval(input: Any): Any = {
    val r = JsonPathUtil.findJsonKernel(input.toString, maxScan, allowTrailing)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val found = ctx.freshName("foundJson")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      boolean ${ev.isNull} = true;
      if (!${c.isNull}) {
        String $found = graft.functions.JsonPathUtil$$.MODULE$$.findJsonKernel(
          ${c.value}.toString(), $maxScan, $allowTrailing);
        if ($found != null) {
          ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($found);
          ${ev.isNull} = false;
        }
      }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** json_escape(s): the json-c/omawslogshlc JSON string-escape table applied
  * to a raw string (no surrounding quotes) — the per-event escaping HLC
  * event bodies go through (omawslogshlc.c appendEvent:152-196).
  */
case class JsonEscapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_escape"

  override protected def nullSafeEval(input: Any): Any =
    JsonPathUtil.escapeKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.escapeKernel($s);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object JsonEscapeExpr {
  def escape(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      JsonEscapeExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** json_compact(s): strict single-JSON-object validation + json-c PLAIN
  * re-serialization (omazuredce.c buildRecordJson:668-727). Non-object,
  * unparsable, or trailing-garbage input → null (the reference's
  * LogError + RS_RET_ERR drop path).
  */
case class JsonCompactExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_compact"

  override protected def nullSafeEval(input: Any): Any =
    JsonPathUtil.compactKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.functions.JsonPathUtil$$.MODULE$$.compactKernel($s);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object JsonCompactExpr {
  def compact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      JsonCompactExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** Strict whole-input JSON validity — the reference's parse_json gate
  * (doFunc_parse_json, grammar/rainerscript.c:1887-1905): one JSON value,
  * then only whitespace to end-of-input. Spark's try_parse_json (and a
  * plain Jackson readTree) accept a valid PREFIX — "22 08 23 x" would
  * half-parse to 22, the exact bug tests/rscript_parse_json_issue.sh
  * pins — so validity needs its own kernel with FAIL_ON_TRAILING_TOKENS.
  */
case class JsonValidExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_valid_strict"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else JsonValidExpr.kernel(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = !${c.isNull} &&
        graft.functions.JsonValidExpr$$.MODULE$$.kernel(${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object JsonValidExpr {
  private val strictMapper = {
    val m = new ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  def kernel(s: UTF8String): Boolean =
    try {
      val n = strictMapper.readTree(s.toString)
      n != null && !n.isMissingNode
    } catch { case _: Exception => false }
}

/** The property replacer's JSON value escaping — jsonAddVal/
  * jsonAddVal_escaped (runtime/msg.c:3298-3478), NOT a generic JSON
  * encoder: `/` escapes to `\/`, C0 controls get RFC4627 short forms or
  * UPPERCASE `\u00XX`, and in relaxed mode (jsonr/jsonfr, escapeAll
  * false) a backslash already starting a JSON escape pair is kept as-is
  * to avoid double encoding. */
case class JsonPropEscapeExpr(child: Expression, escapeAll: Boolean)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = if (escapeAll) "json_prop_escape" else "jsonr_prop_escape"

  override protected def nullSafeEval(input: Any): Any =
    JsonPropEscapeExpr.kernel(input.asInstanceOf[UTF8String], escapeAll)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JsonPropEscapeExpr$$.MODULE$$.kernel($c, $escapeAll);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object JsonPropEscapeExpr {
  private val hexdigit = "0123456789ABCDEF"

  @inline private def plain(c: Char): Boolean =
    (c >= 0x30 && c <= 0x5b) || (c >= 0x23 && c <= 0x2e) || c >= 0x5d ||
    c == 0x20 || c == 0x21

  def kernel(s0: UTF8String, escapeAll: Boolean): UTF8String = {
    val s = s0.toString
    var i = 0
    val n = s.length
    while (i < n && plain(s.charAt(i))) i += 1
    if (i == n) return s0
    val sb = new java.lang.StringBuilder(n + 8)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (plain(c)) sb.append(c)
      else if (c == 0) sb.append("\\u0000")
      else if (c == '"') sb.append("\\\"")
      else if (c == '/') sb.append("\\/")
      else if (c == '\\') {
        val nc = if (i + 1 < n) s.charAt(i + 1) else ' '
        if (!escapeAll && i + 1 < n &&
            (nc == '"' || nc == '/' || nc == '\\' || nc == 'b' || nc == 'f' ||
             nc == 'n' || nc == 'r' || nc == 't' || nc == 'u')) {
          sb.append(c).append(nc); i += 1
        } else sb.append("\\\\")
      }
      else if (c == '\b') sb.append("\\b")
      else if (c == '\f') sb.append("\\f")
      else if (c == '\n') sb.append("\\n")
      else if (c == '\r') sb.append("\\r")
      else if (c == '\t') sb.append("\\t")
      else {
        sb.append("\\u")
          .append(hexdigit((c >> 12) & 0xF))
          .append(hexdigit((c >> 8) & 0xF))
          .append(hexdigit((c >> 4) & 0xF))
          .append(hexdigit(c & 0xF))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
