package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def frac(text: String, n: Int): Double =
    Seq(text).toDF("t")
      .select(TextAnalysis.dupNgramFrac(col("t"), n).as("f"))
      .as[Double].collect().head

  test("wordNgrams: zip-shift construction, no trailing partial grams") {
    val out = Seq("a b c d").toDF("t")
      .select(TextAnalysis.wordNgrams(TextAnalysis.tokens(col("t")), 2).as("g"))
      .as[Seq[String]].collect().head
    assert(out == Seq("a b", "b c", "c d"))
    val tri = Seq("a b c d").toDF("t")
      .select(TextAnalysis.wordNgrams(TextAnalysis.tokens(col("t")), 3).as("g"))
      .as[Seq[String]].collect().head
    assert(tri == Seq("a b c", "b c d"))
  }

  test("gopherQuality: each rule trips on its own violation") {
    val good = (("w" * 5 + " ") * 59).trim + " the and of that" // 63 words, len-5
    val docs = Seq(
      (1L, good),                                   // passes all 7
      (2L, "the and of that"),                      // r_words: 4 < 50
      (3L, (("w" * 20 + " ") * 60).trim + " the and"), // r_meanlen: ~19.4 > 10
      (4L, good + " " + ("# " * 20).trim),          // r_symbols: 20/83 > 0.1
      (5L, (1 to 60).map(i => s"- item$i the and of").mkString("\n")), // r_bullets
      (6L, (1 to 60).map(i => s"item$i the and of...").mkString("\n")), // r_ellipsis
      (7L, (("9" * 4 + " ") * 55).trim + " the and of that and be to have with"), // r_alpha
      (8L, (("w" * 5 + " ") * 63).trim))            // r_stop: zero stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("r_words") && out(2L).getAs[Boolean]("r_stop"))
    assert(!out(3L).getAs[Boolean]("r_meanlen"))
    assert(!out(4L).getAs[Boolean]("r_symbols"))
    assert(!out(5L).getAs[Boolean]("r_bullets"))
    assert(!out(6L).getAs[Boolean]("r_ellipsis"))
    assert(!out(7L).getAs[Boolean]("r_alpha"))
    assert(!out(8L).getAs[Boolean]("r_stop") && !out(8L).getAs[Boolean]("pass"))
    assert((2L to 8L).forall(i => !out(i).getAs[Boolean]("pass")))
  }

  test("bigramLogProb: hand-checked smoothed model on a tiny corpus") {
    import graft.operators.LanguageModel
    // corpus: "a b a b" + "a c" + "a" -> V = {a,b,c} = 3
    // U: a=4, b=2, c=1; B: "a b"=2, "b a"=1, "a c"=1
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "a")).toDF("doc_id", "text")
    val out = LanguageModel.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def mlp(b: Long, u: Long): Long =
      math.floor(math.log((b + 1).toDouble / (u + 3).toDouble) * 1e6).toLong
    // doc 1 bigrams: ab, ba, ab -> mlp(2,4)*2 + mlp(1,2)
    assert(out(1L).getAs[Long]("n_bigrams") == 3L)
    assert(out(1L).getAs[Long]("sum_micro_lp") == 2 * mlp(2, 4) + mlp(1, 2))
    // doc 2: one bigram "a c" -> mlp(1,4)
    assert(out(2L).getAs[Long]("sum_micro_lp") == mlp(1, 4))
    // doc 3: single token, no bigram evidence
    assert(out(3L).getAs[Long]("n_bigrams") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("avg_lp")))
    val avg = out(1L).getAs[Double]("avg_lp")
    assert(math.abs(avg - (2 * mlp(2, 4) + mlp(1, 2)) / 3e6) < 1e-12)
  }

  test("tfidfTopK: hand-checked scores, deterministic tie-break on term") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk")) ->
        (r.getAs[String]("term"), r.getAs[Long]("mscore"))).toMap
    def m(tf: Long, df: Long): Long =
      math.floor(tf * math.log(3.0 / df) * 1e6).toLong
    assert(out((1L, 1)) == ("apple", m(2, 1)))   // 2·ln3 beats 1·ln1.5
    assert(out((1L, 2)) == ("banana", m(1, 2)))
    // doc 2: banana and cherry tie exactly -> term order breaks it
    assert(out((2L, 1))._1 == "banana" && out((2L, 2))._1 == "cherry")
    assert(out((2L, 1))._2 == out((2L, 2))._2)
    assert(out((3L, 1)) == ("cherry", m(3, 2)))  // 3·ln1.5 > 1·ln3
    assert(out((3L, 2)) == ("durian", m(1, 1)))
  }

  test("dupNgramFrac: repetition raises the fraction, short docs are 0") {
    assert(frac("", 2) == 0.0)
    assert(frac("one", 2) == 0.0)           // no bigram can form
    assert(frac("one two three four", 2) == 0.0) // all distinct
    // "spam spam spam spam spam" -> bigrams all "spam spam": 4 total, 1 distinct
    assert(frac("spam spam spam spam spam", 2) == 0.75)
    assert(frac("a b a b a b", 2) > 0.5)    // alternating boilerplate
  }
}
