package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

/** rag_retrieve's r16 chunk-token formulation — each chunk's scoring
  * tokens are a SLICE of the doc's lowered token array — must be
  * value-identical to the r15 composition (chunkByTokens' rejoined
  * case-preserving chunk text, lowered and re-split by TokensExpr).
  * The commutation being pinned: TokensExpr's lowercasing never
  * creates or destroys whitespace, and the character following a token
  * is whitespace (or end) in BOTH forms, so even context-sensitive
  * case mappings (Greek final sigma) agree; window arithmetic (count,
  * stride, short final window, empty-doc drop) is replicated verbatim.
  */
class ChunkTokenSliceParitySpec extends SparkSpec {
  import spark.implicits._

  private val chunkTokens = 8
  private val overlapTokens = 3
  private val stride = chunkTokens - overlapTokens

  private def oldForm(df: org.apache.spark.sql.DataFrame) =
    Sampling.chunkByTokens(df, "doc_id", "text",
        chunkTokens = chunkTokens, overlapTokens = overlapTokens)
      .select(col("doc_id"), col("chunk_idx"),
        TextAnalysis.tokens(col("chunk_text")).as("t"))
      .select(col("doc_id"), col("chunk_idx"), col("t"),
        size(col("t")).cast("long").as("dl"))

  private def newForm(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        greatest(lit(1L),
          expr(s"(__n - $overlapTokens + ${stride - 1}) div $stride")) - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)).as("t"))
      .select(col("doc_id"), col("chunk_idx"), col("t"),
        size(col("t")).cast("long").as("dl"))

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Seq[String], Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  test("token-slice chunks == rejoined-text chunks on nasty fixtures") {
    val texts = Seq(
      // boundary counts around the window arithmetic
      "", "one", ("w " * (chunkTokens - 1)).trim,
      ("w " * chunkTokens).trim, ("w " * (chunkTokens + 1)).trim,
      ("w " * (2 * stride + overlapTokens)).trim,
      // mixed whitespace separators incl. \x0B and \f
      "a\tb\ncd\fe\rf  g",
      // case-sensitive contexts: Greek final sigma at token ends,
      // dotted capital I, multibyte, surrogate-adjacent
      "ΦΩΣ ΟΔΟΣ μέσΑ ΣΟΦΙΑ",
      "İstanbul İstanbul STRASSE ẞß",
      "中文 日本語 ΑΒΓΔΣ x🙂y ΣΣΣ",
      // long doc with repeated multibyte tokens crossing many windows
      (1 to 40).map(i => if (i % 3 == 0) s"ΛΟΓΟΣ$i" else s"tok$i")
        .mkString("  "),
      // leading/trailing whitespace runs
      "   lead\t\ttrail   "
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = collect(newForm(df))
    val want = collect(oldForm(df))
    assert(got == want, s"got $got\nwant $want")
  }

  test("random fuzz parity incl. random whitespace and case") {
    val rnd = new scala.util.Random(0xC4A5)
    val alphabet = "abXY ΣσςİIıẞß中🙂\t\n\f\r ".toCharArray
    val texts = (0 until 150).map { _ =>
      val n = rnd.nextInt(120)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.append(alphabet(rnd.nextInt(alphabet.length))))
      sb.toString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(collect(newForm(df)) == collect(oldForm(df)))
  }
}
