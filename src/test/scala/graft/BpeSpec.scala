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

  test("greedy encode vs merge-order replay: divergence measured and bounded") {
    // The documented encode divergence (r13 verdict #4), quantified: the
    // engine encodes by greedy longest-match against the merge products
    // (WordPiece-style — what the oracle can replay); reference BPE
    // replays the merges in training order. Both encoders run here over
    // every distinct word of the training corpus and the disagreement is
    // pinned, word-frequency-weighted.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    // must reproduce the checked-in fixture (trainer/fixture sync guard —
    // also pins the Locale.ROOT casefold fix: ROOT folding produced this
    // exact vocab)
    val sample = docs.select(col("text").cast("string"))
      .orderBy(col("doc_id")).limit(400).collect().map(_.getString(0)).toSeq
    val merges = Bpe.trainMerges(sample, 48)
    assert(merges.map { case (l, r) => l + r } == BpeFixture.vocab,
      "trainMerges out of sync with the checked-in fixture vocab")

    // merge-order replay: per word, apply each merge pair in training
    // order, left-to-right (the reference BPE apply loop)
    def replay(word: String): Seq[String] = {
      var syms: Vector[String] = {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < word.length) {
          val n = if (Character.isHighSurrogate(word.charAt(i)) &&
            i + 1 < word.length &&
            Character.isLowSurrogate(word.charAt(i + 1))) 2 else 1
          b += word.substring(i, i + n); i += n
        }
        b.result()
      }
      merges.foreach { case (l, r) =>
        if (syms.length >= 2) {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }

    // corpus word frequencies + the engine's greedy encode per word
    val wf = docs
      .select(explode(split(lower(col("text")), "[\\s]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().as[(String, Long)].collect()
    val greedy: Map[String, Seq[String]] = wf.map(_._1).toSeq.toDF("w")
      .select(col("w"), TextAnalysis.bpeEncode(col("w"), BpeFixture.vocab))
      .as[(String, Seq[String])].collect().toMap

    val total = wf.map(_._2).sum
    val diffSeq = wf.filter { case (w, _) => greedy(w) != replay(w) }
    val diffCount = diffSeq.filter { case (w, _) =>
      greedy(w).length != replay(w).length }
    val seqRate = diffSeq.map(_._2).sum.toDouble / total
    val cntRate = diffCount.map(_._2).sum.toDouble / total
    info(f"sequence-divergence rate: $seqRate%.4f " +
      f"(${diffSeq.length}/${wf.length} distinct words: " +
      diffSeq.map(_._1).mkString(",") + "); " +
      f"token-COUNT divergence: $cntRate%.4f (${diffCount.length} words)")
    // measured on this corpus/vocab: 0.0314 of word instances (1/31
    // distinct words) get different token BOUNDARIES; token COUNTS —
    // the unit every budgeting operator consumes — diverge on 0.0000.
    // Pinned with headroom so a vocab or kernel change that balloons
    // the divergence fails here before the scaladoc's claim goes stale.
    assert(seqRate <= 0.05,
      f"greedy vs merge-order sequence divergence $seqRate%.4f > 5%%")
    assert(cntRate <= 0.01,
      f"greedy vs merge-order token-count divergence $cntRate%.4f > 1%%")
  }

  test("trainOnSample is deterministic and bounded") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.trainOnSample(docs, "doc_id", "text", 16, 50)
    val b = Bpe.trainOnSample(docs, "doc_id", "text", 16, 50)
    assert(a == b && a.size <= 16 && a.nonEmpty)
  }

  test("fertility: per-word transform counts sum to the doc-level kernel count") {
    // bpe_fertility derives n_bpe from per-word counts (transform over
    // the token array); this must equal the doc-level BpeCountExpr on
    // the full text — the two kernel paths may never disagree
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val v = BpeFixture.vocab
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val rows = docs.select(
        TextAnalysis.bpeCount(col("text"), v).cast("long").as("doc_n"),
        aggregate(transform(TextAnalysis.tokens(col("text")),
          w => TextAnalysis.bpeCount(w, v).cast("long")),
          lit(0L), (a, c) => a + c).as("word_sum"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"doc-level ${r.getLong(0)} != per-word sum ${r.getLong(1)}")
      // every word contributes at least one token
      assert(r.getLong(1) >= r.getLong(2))
    }
  }
}
