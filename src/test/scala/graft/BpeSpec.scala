package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeFixture}
import graft.operators.TextAnalysis

/** BPE training + greedy-encode contracts (see functions.Bpe). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train: hand-computable merges, deterministic order") {
    // words: "ab"x3, "abc"x2 → pairs (a,b):5 (b,c):2 → merge "ab";
    // then (ab,c):2 → merge "abc"; then nothing repeats
    val merges = Bpe.train(Seq("ab ab ab", "abc abc"), numMerges = 10)
    assert(merges == Seq("ab", "abc"))
    // ties break to the lexicographically smallest pair: "xy" and "yz"
    // both occur twice in "xyq yzq xyr yzr" words — (x,y) < (y,z)
    val tied = Bpe.train(Seq("xyq yzq xyr yzr"), numMerges = 1)
    assert(tied == Seq("xy"))
    // casefolding happens before counting
    val cased = Bpe.train(Seq("AB ab aB Ab"), numMerges = 1)
    assert(cased == Seq("ab"))
  }

  test("train stops when no pair repeats; numMerges bounds the vocab") {
    val m = Bpe.train(Seq("abcdefg"), numMerges = 100)
    assert(m.isEmpty, "all pairs unique: nothing to merge")
    val bounded = Bpe.train(
      Seq("aa aa aa bb bb bb cc cc cc dd dd dd"), numMerges = 2)
    assert(bounded.size == 2)
  }

  test("greedy encode: longest match wins, single-char fallback, word isolation") {
    val vocab = Seq("ab", "abc")
    val df = Seq("abcab ba a b", "ABCAB", "", "  ").toDF("t")
    val got = df.select(
        TextAnalysis.bpeEncode(col("t"), vocab).as("e"),
        TextAnalysis.bpeCount(col("t"), vocab).as("n"))
      .as[(Seq[String], Int)].collect().toSeq
    assert(got(0) == (Seq("abc", "ab", "b", "a", "a", "b"), 6))
    assert(got(1) == (Seq("abc", "ab"), 2)) // casefolds before matching
    assert(got(2) == (Seq(), 0))
    assert(got(3) == (Seq(), 0))
    // matches never cross a whitespace boundary: "a b" has no "ab"
    val iso = Seq("a b").toDF("t")
      .select(TextAnalysis.bpeEncode(col("t"), vocab))
      .as[Seq[String]].head()
    assert(iso == Seq("a", "b"))
  }

  test("non-BMP fallback advances one codepoint, not one UTF-16 unit") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, surrogate pair
    val got = Seq(s"a${clef}b").toDF("t")
      .select(TextAnalysis.bpeEncode(col("t"), Seq("zz")))
      .as[Seq[String]].head()
    assert(got == Seq("a", clef, "b"))
  }

  test("fixture vocab splits a real share of corpus words (multi-token path live)") {
    // the 48-merge fixture is deliberately bounded so the encoder
    // actually SPLITS (a pair-exhausted vocab absorbed every frequent
    // word whole, leaving n_bpe == n_ws corpus-wide — vacuous)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = docs.select(
        sum(TextAnalysis.tokenCount(col("text"))).as("ws"),
        sum(TextAnalysis.bpeCount(col("text"), BpeFixture.vocab)).as("bpe"))
      .as[(Long, Long)].head()
    assert(r._2 > r._1 * 3 / 2,
      s"BPE tokens (${r._2}) should exceed whitespace tokens (${r._1}) by >1.5x")
  }

  test("trainOnSample is deterministic and bounded") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.trainOnSample(docs, "doc_id", "text", 16, 50)
    val b = Bpe.trainOnSample(docs, "doc_id", "text", 16, 50)
    assert(a == b && a.size <= 16 && a.nonEmpty)
  }
}
