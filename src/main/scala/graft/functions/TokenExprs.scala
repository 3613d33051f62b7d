package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Casefolded whitespace tokens of a text in ONE pass — semantics equal
  * `filter(split(lower(text), "\\s+"), _ != "")` (Java `\s` =
  * [ \t\n\x0B\f\r], leading/trailing/repeated whitespace yields no empty
  * tokens) but without the interpreted HOF chain: the token array feeds
  * language-ID, quality scoring, n-gram repetition and the LLM-prep
  * compositions, so it is one of the hottest subtrees in the text
  * pipelines. Same kernel style as ShinglesExpr (one static call inside
  * whole-stage codegen).
  */
case class TokensExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokensExpr.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokensExpr$$.MODULE$$.kernel($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokensExpr {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def kernel(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(UTF8String.fromString(s.substring(start, i)))
    }
    new GenericArrayData(toks.toArray)
  }
}

/** All consecutive n-grams of a token array, joined with a single space —
  * semantics equal the zip-shift construction
  * `filter(zip_with(toks, slice(toks, k+1, …), concat(_, " ", _)), _.isNotNull)`
  * chained over k < n (grams touching a null element are dropped, trailing
  * partial grams never form), in one kernel pass.
  */
case class NgramJoinExpr(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "n-gram size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"ngrams$n"

  override protected def nullSafeEval(input: Any): Any =
    NgramJoinExpr.kernel(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramJoinExpr$$.MODULE$$.kernel($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Whole device-parser struct in ONE regex match: field spec =
  * (name, groupIdx, conv) with conv 'S' string ("" for an unmatched
  * optional group, like regexp_extract), 'L' long (empty/unparsable →
  * null — the nullif+cast idiom), 'I' int, 'M' the mmaudit k=v map
  * (quoted values kept whole, surrounding quotes stripped —
  * plugins/mmaudit parseName/parseValue). Returns a null struct when
  * the pattern does not match. One kernel call replaces the
  * guard-rlike + per-group regexp_extract pattern (7 regex executions
  * for a 6-field parser), and plain GetStructField consumers CSE to a
  * single evaluation.
  */
case class RegexStructExpr(child: Expression, pattern: String,
                           fields: Seq[(String, Int, Char)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(fields.nonEmpty)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(fields.map { case (n, _, c) =>
    StructField(n, c match {
      case 'S' => StringType
      case 'L' => LongType
      case 'I' => IntegerType
      case 'M' => MapType(StringType, StringType, valueContainsNull = false)
    }, nullable = true)
  })
  override def nullable: Boolean = true
  override def prettyName: String = "regex_struct"

  @transient private lazy val p = java.util.regex.Pattern.compile(pattern)

  def kernel(msg: UTF8String): Any = {
    val m = p.matcher(msg.toString)
    if (!m.find()) return null
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val (_, g, conv) = fields(i)
      val gv = m.group(g)
      out(i) = conv match {
        case 'S' => UTF8String.fromString(if (gv == null) "" else gv)
        case 'L' =>
          if (gv == null || gv.isEmpty) null
          else try java.lang.Long.valueOf(gv)
          catch { case _: NumberFormatException => null }
        case 'I' =>
          if (gv == null || gv.isEmpty) null
          else try Integer.valueOf(gv)
          catch { case _: NumberFormatException => null }
        case 'M' => RegexStructExpr.kvMap(if (gv == null) "" else gv)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("regexStruct", this,
      "graft.functions.RegexStructExpr")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object ${ev.value}_o = $ref.kernel($c);
      if (${ev.value}_o == null) { ${ev.isNull} = true; }
      else { ${ev.value} =
        (org.apache.spark.sql.catalyst.InternalRow) ${ev.value}_o; }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RegexStructExpr {
  private val kvPat =
    java.util.regex.Pattern.compile("([A-Za-z0-9_-]+)=(\"[^\"]*\"|\\S+)")

  /** mmaudit body scan: k=v pairs, quoted values ONE entry with the
    * surrounding quotes stripped. First occurrence of a duplicate key
    * wins (LinkedHashMap insertion order preserved). */
  def kvMap(body: String): org.apache.spark.sql.catalyst.util.MapData = {
    val keys = new java.util.ArrayList[Any]()
    val vals = new java.util.ArrayList[Any]()
    val seen = new java.util.HashSet[String]()
    val m = kvPat.matcher(body)
    while (m.find()) {
      val k = m.group(1)
      if (seen.add(k)) {
        var v = m.group(2)
        if (v.length >= 2 && v.charAt(0) == '"' && v.charAt(v.length - 1) == '"')
          v = v.substring(1, v.length - 1)
        keys.add(UTF8String.fromString(k))
        vals.add(UTF8String.fromString(v))
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      keys.toArray, vals.toArray)
  }
}

/** Marker-argmax language ID over a token array — the native form of the
  * `aggregate(toks, zero, zip_with-add, argmax)` HOF chain (semantics
  * identical: counts of per-language marker hits, argmax with
  * declaration-order tie-break, no hit at all → "und").
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray

  @transient private lazy val mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case ((_, ms), i) =>
      ms.foreach { mk =>
        val k = UTF8String.fromString(mk)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def kernel(toks: ArrayData): UTF8String = {
    val counts = new Array[Int](langs.length)
    var i = 0
    val len = toks.numElements()
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val bits = mask.get(toks.getUTF8String(i))
        if (bits != null) {
          var b = bits.intValue()
          var l = 0
          while (b != 0) {
            if ((b & 1) != 0) counts(l) += 1
            b >>>= 1
            l += 1
          }
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) { best = counts(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) LangIdExpr.UND else langs(bestIdx)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this,
      "graft.functions.LangIdExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangIdExpr {
  val UND: UTF8String = UTF8String.fromString("und")
}

object NgramJoinExpr {
  def kernel(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](m)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var j = 0
      var ok = true
      while (ok && j < n) {
        if (toks.isNullAt(k + j)) ok = false
        else {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(k + j).toString)
          j += 1
        }
      }
      if (ok) out.add(UTF8String.fromString(sb.toString))
      k += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Single-pass multi-literal span removal — Rabin-Karp over a set of
  * FIXED-WIDTH spans (all the same character length, as
  * Dedup.substringDupSpans' W-char windows are by construction).
  *
  * Semantics: scan the text left to right; whenever one of the spans
  * starts at the current position, drop it and continue AFTER it (the
  * seam is never re-scanned) — exactly a global `regexp_replace` over a
  * literal alternation of the spans, which is what the DuckDB oracle
  * runs. This replaces the k-step sequential `replace` fold, whose cost
  * is O(k·n) per document (k full substring searches); one rolling-hash
  * pass is O(n + hits·W) regardless of k, the difference between a
  * pipeline that tolerates 100 hot spans and one that re-reads the
  * corpus 100 times.
  *
  * The hash is a polynomial rolling hash over UTF-16 code units
  * (base 31); candidate hits are verified with String.startsWith, so
  * collisions cost one W-char compare and never a wrong removal.
  */
case class MultiRemoveExpr(child: Expression, spans: Seq[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(spans.map(_.length).distinct.size <= 1,
    "MultiRemoveExpr: spans must share one fixed width")
  require(spans.forall(_.nonEmpty), "MultiRemoveExpr: empty span")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_remove"

  @transient private lazy val width: Int =
    if (spans.isEmpty) 0 else spans.head.length
  // span hash -> candidate spans with that hash (collision list)
  @transient private lazy val table: java.util.HashMap[java.lang.Long, Array[String]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[String]]()
    spans.foreach { s =>
      val h = java.lang.Long.valueOf(MultiRemoveExpr.hashOf(s))
      val prev = m.get(h)
      m.put(h, if (prev == null) Array(s) else prev :+ s)
    }
    m
  }
  // 31^(width-1) for the rolling subtract
  @transient private lazy val pow: Long = {
    var p = 1L; var i = 1
    while (i < width) { p *= 31L; i += 1 }
    p
  }

  /** Instance kernel (referenced from generated code). */
  def kernel(in: UTF8String): UTF8String = {
    if (spans.isEmpty) return in
    val text = in.toString
    val n = text.length
    if (n < width) return in
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    // rolling hash of text[i, i+width)
    var h = 0L
    var j = 0
    while (j < width) { h = h * 31L + text.charAt(j); j += 1 }
    var changed = false
    while (i + width <= n) {
      val cand = table.get(java.lang.Long.valueOf(h))
      var matched: String = null
      if (cand != null) {
        var c = 0
        while (matched == null && c < cand.length) {
          if (text.startsWith(cand(c), i)) matched = cand(c)
          c += 1
        }
      }
      if (matched != null) {
        changed = true
        i += width
        // recompute the window hash at the new position (rare: once per hit)
        if (i + width <= n) {
          h = 0L; var k = i
          while (k < i + width) { h = h * 31L + text.charAt(k); k += 1 }
        }
      } else {
        sb.append(text.charAt(i))
        if (i + width < n) h = (h - text.charAt(i) * pow) * 31L + text.charAt(i + width)
        i += 1
      }
    }
    if (!changed) return in
    sb.append(text, i, n)
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("multiRemove", this,
      "graft.functions.MultiRemoveExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MultiRemoveExpr {
  private[functions] def hashOf(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) { h = h * 31L + s.charAt(i); i += 1 }
    h
  }
}

/** BPE-ish subword COUNT — the number of matches of
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (alpha runs + digit runs + each
  * isolated non-space symbol ≈ one token), as one counting pass.
  * Value-identical to `size(regexp_extract_all(text, re, 0))`
  * (KernelParitySpec) but never materializes the match ARRAY — the
  * extract-all form allocates a string per match (thousands per doc)
  * on the quality-scoring scan. Whitespace class = Java regex `\s`.
  */
case class SubwordCountExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "subword_count"

  override protected def nullSafeEval(input: Any): Any =
    SubwordCountExpr.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubwordCountExpr$$.MODULE$$.kernel($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SubwordCountExpr {
  private final val NONE = 0
  private final val ALPHA = 1
  private final val DIGIT = 2

  def kernel(in: UTF8String): Int = {
    val t = in.toString
    var count = 0
    var cls = NONE
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        if (cls != ALPHA) count += 1
        cls = ALPHA
      } else if (c >= '0' && c <= '9') {
        if (cls != DIGIT) count += 1
        cls = DIGIT
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
                 c == '\f' || c == '\r') {
        cls = NONE
      } else {
        // each non-alnum non-space CODEPOINT is its own match (the
        // regex third alternative) — including all non-ASCII; a
        // surrogate pair is one codepoint to the regex engine
        if (Character.isHighSurrogate(c) && i + 1 < t.length &&
            Character.isLowSurrogate(t.charAt(i + 1))) i += 1
        count += 1
        cls = NONE
      }
      i += 1
    }
    count
  }
}

/** Fused content fingerprint — md5 of casefolded, punctuation-stripped,
  * whitespace-collapsed text, value-identical to the Column chain
  * `md5(trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9\s]", ""),
  * "\s+", " ")))` it replaces (parity pinned in KernelParitySpec), but
  * ONE lowercase pass + one state-machine pass + one md5 instead of two
  * regex rewrites with their intermediate strings. The fingerprint is
  * the key of every exact-dedup groupBy (Dedup.exact/keepBest/
  * textGroups, streaming dedup), so this sits on the hottest corpus
  * scan: stripped chars are invisible to the whitespace state (a ws
  * run interrupted by punctuation still collapses to ONE space, exactly
  * like strip-then-collapse), leading/trailing ws never emits.
  */
case class FingerprintExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "content_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintExpr.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FingerprintExpr$$.MODULE$$.kernel($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object FingerprintExpr {
  private val HEX = "0123456789abcdef".toCharArray

  private def isWsJava(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def kernel(in: UTF8String): UTF8String = {
    // same lowercase as the Lower expression (full Unicode), so parity
    // with the regex chain holds for every input, not just ASCII
    val t = in.toLowerCase.toString
    val sb = new java.lang.StringBuilder(t.length)
    var pendingWs = false
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingWs && sb.length > 0) sb.append(' ')
        sb.append(c)
        pendingWs = false
      } else if (isWsJava(c)) {
        pendingWs = true
      } // stripped char: invisible to the whitespace state
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(j * 2) = HEX((md(j) >> 4) & 0xf)
      out(j * 2 + 1) = HEX(md(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Every eval document fuzzily contaminated by one corpus document, in
  * ONE kernel call — the streaming face of the contamination report
  * (see [[graft.operators.Dedup.contaminationReport]]): Structured
  * Streaming allows a single aggregation per query, and the batch
  * report needs two (gram-level intersection, then the eval-side
  * fold), so the gram-level half moves scan-side into this kernel and
  * the one remaining groupBy(eval_id) streams in complete mode with
  * eval-sized state.
  *
  * The eval gram sets ride in as a reference object — bounded because
  * EVAL SETS are bounded by nature (the same justification as the
  * batch operator's broadcast(eval grams)); the gram→eval index is
  * built once per executor, and each input document costs one pass
  * over its own distinct n-grams with O(1) index probes. Input is the
  * already-tokenized array (TokensExpr — the exact tokenization the
  * batch path and the DuckDB oracle share); grams join with ' ' like
  * [[NgramJoinExpr]]; micro-Jaccard uses the identical double
  * arithmetic floor(inter·1e6 / (na+nb−inter)) so values are
  * bit-equal to the batch report. Emits (eval_id, mjac) for every
  * eval doc at or above `thresholdMicro`.
  */
case class EvalContamExpr(child: Expression, evalIds: Array[Long],
                          evalGramSets: Array[Array[String]], n: Int,
                          thresholdMicro: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(evalIds.length == evalGramSets.length, "ids/gram sets misaligned")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("eval_id", LongType, nullable = false),
    StructField("mjac", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_contam"

  private val nEval = evalIds.length
  // gram -> indexes of eval docs containing it (distinct per eval set
  // by construction: the caller passes array_distinct'ed gram sets)
  @transient private lazy val index: java.util.HashMap[String, Array[Int]] = {
    val tmp = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    var e = 0
    while (e < nEval) {
      evalGramSets(e).foreach { g =>
        var l = tmp.get(g)
        if (l == null) { l = new java.util.ArrayList[Integer](); tmp.put(g, l) }
        l.add(e)
      }
      e += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](tmp.size())
    tmp.forEach { (g, l) =>
      val a = new Array[Int](l.size())
      var i = 0
      while (i < a.length) { a(i) = l.get(i).intValue(); i += 1 }
      out.put(g, a)
    }
    out
  }

  def kernel(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String]()
    val counters = new Array[Int](nEval)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(k + j).toString)
        j += 1
      }
      val g = sb.toString
      if (seen.add(g)) {
        val hits = index.get(g)
        if (hits != null) {
          var i = 0
          while (i < hits.length) { counters(hits(i)) += 1; i += 1 }
        }
      }
      k += 1
    }
    val na = seen.size
    val out = new java.util.ArrayList[Any]()
    var e = 0
    while (e < nEval) {
      if (counters(e) > 0) {
        val denom = na + evalGramSets(e).length - counters(e)
        // identical double arithmetic to the batch/oracle floor()
        val mj = math.floor(counters(e) * 1000000.0 / denom).toLong
        if (mj >= thresholdMicro)
          out.add(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](evalIds(e), mj)))
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("evalContam", this,
      "graft.functions.EvalContamExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Content-selected duplicate-detection windows — every W-CHAR sliding
  * window of the text whose md5 hex digest ends in '0' (the 1/16
  * content-defined selection of Dedup.substringDupSpans), in one pass.
  *
  * Value-identical to the declarative form
  * `filter(transform(sequence(1, length(t)-W+1), i -> substring(t,i,W)),
  *         w -> substring(md5(w),32,1) = '0')`
  * (SelectWindowsParitySpec) but never materializes the discarded 15/16:
  * the transform/explode/filter chain allocates EVERY window string —
  * ~W× the corpus bytes — before the md5 filter throws most of them
  * away, and that allocation (not the shuffle, which only carries
  * survivors' groupBy) dominated the dedup_substring scan stage. Here
  * each window is hashed straight out of the text's UTF-8 buffer (two
  * byte cursors advancing one code point per step, exactly Spark's
  * substring() character semantics) and only survivors allocate.
  *
  * The md5-ends-in-'0' predicate is ON-CONTRACT (oracle-replayed):
  * selection must depend only on the window bytes so both copies of any
  * duplicated span ≥ W+15 chars keep identical windows. Only the
  * evaluation strategy changes; java.security md5 == Spark md5() ==
  * DuckDB md5 byte-for-byte.
  *
  * Invalid-UTF-8 divergence (documented contract, ADVICE r15): when the
  * text ends in a TRUNCATED code point, Spark's UTF8String.substring
  * steps past the buffer and copies undefined adjacent bytes into the
  * final window (`j < numBytes` is checked before the width is added) —
  * measured: a lone 0xE4 lead byte yielded E4 00 01. The kernel instead
  * CLAMPS that final window to the real buffer bytes. Reachable only on
  * non-UTF-8 input, which parquet string columns never carry, so no
  * declared query observes the difference; the byte-level contract is
  * pinned by SelectWindowsParitySpec's raw-invalid-bytes case. */
case class SelectWindowsExpr(child: Expression, window: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(window > 0, "SelectWindowsExpr: window must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "select_windows"

  override protected def nullSafeEval(input: Any): Any =
    SelectWindowsExpr.kernel(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SelectWindowsExpr$$.MODULE$$.kernel($c, $window);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SelectWindowsExpr {
  // MessageDigest is stateful; one instance per thread, reset per window
  private val md5TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** UTF-8 byte width of the code point starting with byte `b` —
    * exactly Spark's UTF8String.numBytesForFirstByte table (invalid
    * first bytes 0x80–0xC1 and 0xF5–0xFF count 1), so char stepping
    * matches length()/substring() bit-for-bit on ANY byte sequence. */
  private def cpWidth(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0xC2) 1 // ASCII, continuation bytes, overlong 0xC0/0xC1
    else if (u < 0xE0) 2
    else if (u < 0xF0) 3
    else if (u < 0xF5) 4
    else 1 // 0xF5+ disallowed in UTF-8
  }

  def kernel(text: UTF8String, window: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // advance `end` over `window` code points; shorter text -> no windows
    var end = 0
    var chars = 0
    while (chars < window && end < nBytes) {
      end += cpWidth(bytes(end)); chars += 1
    }
    if (chars < window)
      return new GenericArrayData(Array.empty[Any])
    // a truncated trailing code point (invalid UTF-8) steps past the
    // buffer: emit the final window CLAMPED to the real bytes — see the
    // documented divergence in the class scaladoc (Spark's substring
    // copies past the buffer here; the r15 kernel dropped the window)
    if (end > nBytes) end = nBytes
    val md = md5TL.get()
    val out = new java.util.ArrayList[Any]()
    var start = 0
    var done = false
    while (!done) {
      md.reset()
      md.update(bytes, start, end - start)
      val dig = md.digest()
      if ((dig(15) & 0x0F) == 0)
        out.add(UTF8String.fromBytes(bytes, start, end - start))
      if (end >= nBytes) done = true
      else {
        start += cpWidth(bytes(start))
        end += cpWidth(bytes(end))
        if (end > nBytes) end = nBytes // same clamp mid-walk
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Σ weights(b) over a hashed-feature bucket array, with multiplicity —
  * the per-document DSIR importance weight as ONE scan-side kernel.
  * Replaces `explode(bs) ⋈ broadcast(weightTable) → groupBy(doc_id).sum`:
  * the weight table is ≤ `buckets` rows BY CONSTRUCTION (feature
  * hashing — the same boundedness argument that made it broadcast-safe
  * makes it a reference object), so the per-doc sum needs neither the
  * exploded occurrence rows, nor the join probe, nor a corpus-sized
  * groupBy shuffle. Long addition is order-free, so summing in array
  * order is bit-identical to the groupBy sum of joined rows. Null
  * elements cannot occur (pmod of fnv64 over non-null grams).
  */
case class BucketWeightSumExpr(child: Expression, weights: Array[Long])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bucket_weight_sum"

  // Array fields get reference equals/hashCode from the case class —
  // value semantics restore canonicalization/semanticEquals/CSE should
  // this expression ever appear twice in one plan (ADVICE r15)
  override def equals(o: Any): Boolean = o match {
    case b: BucketWeightSumExpr =>
      child == b.child && java.util.Arrays.equals(weights, b.weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)

  def kernel(bs: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = bs.numElements()
    while (i < n) {
      val b = bs.getLong(i)
      // contract: elements must index the weight table — fail with the
      // contract named instead of a bare codegen AIOOBE (ADVICE r15)
      if (b < 0L || b >= weights.length)
        throw new IllegalArgumentException(
          s"bucket_weight_sum: bucket id $b outside [0, ${weights.length})")
      s += weights(b.toInt); i += 1
    }
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeightSum", this,
      "graft.functions.BucketWeightSumExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
