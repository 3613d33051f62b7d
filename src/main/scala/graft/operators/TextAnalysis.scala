package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-marker heuristic), quality scoring, token
  * counting, and document fingerprinting. All pure Column compositions —
  * codegen'd, shuffle-free, scan-bound: exactly what survives a 100 TB run.
  */
object TextAnalysis {

  /** Per-language marker/stopword sets for the n-gram-free language-ID
    * heuristic. Deterministic tie-break = this declaration order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"))

  /** Casefolded whitespace tokens — native single-pass kernel
    * (TokensExpr; semantics equal the interpreted
    * `filter(split(lower(text), "\\s+"), _ != "")` HOF chain it
    * replaced, but stays inside whole-stage codegen). */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.TokensExpr(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** token count, whitespace tokenization. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword estimate: alpha runs + digit runs + isolated
    * punctuation, each ≈ one token (a public, common char-class regex
    * approximation of byte-pair tokenizers).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Language-ID: argmax of marker hits; 'und' when no marker at all.
    * Tie-break: earlier language in `langMarkers` wins (deterministic).
    * Markers are SHARED across languages ("de"/"la"/"en" each appear in
    * several lists), so the kernel's token lookup yields a per-language
    * bit vector, not a single lang tag. */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Staged form over an already-materialized token array (use from a
    * previous select so the tokenization is shared across signals).
    * Native marker-argmax kernel (LangIdExpr) — identical semantics to
    * the `aggregate` HOF chain it replaced (per-language marker-hit
    * counts, declaration-order tie-break, no hit → "und"), one static
    * call per row inside codegen. */
  def langIdFromTokens(toks: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.LangIdExpr(
        org.apache.spark.sql.GraftBridge.expression(toks), langMarkers))

  /** Quality score in [0,1]: combines length band, mean word length,
    * alpha ratio and digit ratio — the standard cheap heuristics
    * (C4/Gopher-style filters) as one arithmetic expression.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(length(text), tokenCount(text),
      size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))),
      size(regexp_extract_all(text, lit("[0-9]"), lit(0))))

  /** Staged form over pre-computed per-doc stats. `nToks` is referenced
    * several times by the score arithmetic — pass an attribute (staged
    * select over a shared token array), not a fresh tokenization chain,
    * or each reference re-evaluates the whole HOF subtree per row.
    */
  def qualityScoreFrom(nChars: Column, nToks: Column,
                       nAlpha: Column, nDigit: Column): Column = {
    val meanWord = when(nToks > 0, nChars.cast("double") / nToks).otherwise(lit(0.0))
    val alphaRatio = when(nChars > 0, nAlpha.cast("double") / nChars)
      .otherwise(lit(0.0))
    val digitRatio = when(nChars > 0, nDigit.cast("double") / nChars)
      .otherwise(lit(0.0))
    val lenScore = when(nToks >= 50 && nToks <= 100000, lit(1.0))
      .otherwise(when(nToks >= 10, lit(0.5)).otherwise(lit(0.0)))
    val wordScore = when(meanWord >= 3 && meanWord <= 12, lit(1.0)).otherwise(lit(0.3))
    // floor-quantize rather than round: both engines compute the same
    // IEEE double, so floor is bit-stable while round-half diverges at
    // exact .5 boundaries between dialects
    floor((lenScore * 0.4 + wordScore * 0.2 + alphaRatio * 0.3 +
      (lit(1.0) - digitRatio) * 0.1) * 1e6) / 1e6
  }

  /** Stable content fingerprint: md5 of casefolded, punctuation-stripped,
    * whitespace-collapsed text — the exact-near-dup key for clustering.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " ")))

  /** Word n-grams as an array column — native kernel (NgramJoinExpr; no
    * explode, no shuffle, and no per-gram interpreted zip_with chain). */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 2, "use tokens() for unigrams")
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.NgramJoinExpr(
        org.apache.spark.sql.GraftBridge.expression(toks), n))
  }

  /** Duplicate fraction over an already-materialized gram ARRAY column:
    * 1 - distinct/total — the Gopher-style repetition signal (high value
    * = boilerplate or generation loops). Floor-quantized at 1e-6 for
    * cross-engine bit-stability, 0.0 when no gram formed. Take the gram
    * column as a REFERENCE (staged select) so the n-gram chain is built
    * once per row — CollapseProject keeps multiply-referenced non-cheap
    * aliases in their own projection instead of inlining them per use.
    */
  def dupFrac(grams: Column): Column = {
    val total = size(grams)
    when(total > 0,
      floor((lit(1.0) - size(array_distinct(grams)).cast("double") / total) * 1e6) / 1e6)
      .otherwise(lit(0.0))
  }

  /** One-shot convenience form (tokenizes + builds grams inline). */
  def dupNgramFrac(text: Column, n: Int): Column =
    dupFrac(wordNgrams(tokens(text), n))

  /** PII-style scrubbing for training corpora: emails, bare IPv4s and
    * long digit runs (phone/account numbers) replaced with stable class
    * tokens — the text-side sibling of mmanon's IP zeroing. Pure
    * regexp_replace chain: scan-bound, shuffle-free, and expressible
    * verbatim in the oracle dialect.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val longDigitsRe = "\\b\\d{7,}\\b"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      longDigitsRe, "<NUM>")

  /** DuckDB-side mirrors (shared with oracle SQL). */
  def langIdSql(col: String): String = {
    val hitExprs = langMarkers.map { case (l, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_filter(list_filter(string_split(lower($col), ' '), x -> x <> ''), x -> list_contains($lst, x))) AS hits_$l"
    }.mkString(",\n    ")
    val bestExpr = langMarkers.map { case (l, _) => s"hits_$l" }.mkString("greatest(", ", ", ")")
    val caseExpr = langMarkers.foldRight("'und'") { case ((l, _), rest) =>
      s"CASE WHEN hits_$l > 0 AND hits_$l = best THEN '$l' ELSE $rest END"
    }
    s"(SELECT *, $caseExpr AS predicted FROM (SELECT *, $bestExpr AS best FROM (SELECT *,\n    $hitExprs FROM documents)))"
  }
}
