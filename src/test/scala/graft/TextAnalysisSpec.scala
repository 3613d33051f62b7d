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

  test("dupNgramFrac: repetition raises the fraction, short docs are 0") {
    assert(frac("", 2) == 0.0)
    assert(frac("one", 2) == 0.0)           // no bigram can form
    assert(frac("one two three four", 2) == 0.0) // all distinct
    // "spam spam spam spam spam" -> bigrams all "spam spam": 4 total, 1 distinct
    assert(frac("spam spam spam spam spam", 2) == 0.75)
    assert(frac("a b a b a b", 2) > 0.5)    // alternating boilerplate
  }
}
