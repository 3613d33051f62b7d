package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** BM25 ranked retrieval — closed-form scoring checks on a corpus small
  * enough to hand-replay the Robertson/Lucene formula, plus the rank
  * invariants the oracle comparison can't see (dense ranks, score
  * monotonicity, query-term pruning). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  // plain-Scala replay of the operator's per-(doc, term) micro-score —
  // the same double arithmetic in the same order
  private def micro(tf: Long, df: Long, dl: Long, nd: Long, avgdl: Double): Long = {
    val idf = math.log(1.0 + (nd.toDouble - df + 0.5) / (df + 0.5))
    val tfpart = (tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
    math.floor(idf * tfpart * 1e6).toLong
  }

  private def docs = Seq(
    (0L, "alpha beta alpha gamma"), // dl 4: alpha tf 2
    (1L, "alpha beta"),             // dl 2
    (2L, "delta epsilon zeta eta"), // dl 4: no query terms
    (3L, "beta beta beta gamma")    // dl 4
  ).toDF("doc_id", "text")

  test("scores match the hand-replayed formula; non-matching docs absent") {
    // query 100 = {alpha, gamma}
    val queries = Seq((100L, Seq("alpha", "gamma"))).toDF("query_id", "qt")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 5)
      .select("query_id", "rk", "doc_id", "mscore")
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)

    val nd = 4L
    val avgdl = 14.0 / 4.0
    // df(alpha)=2 (docs 0,1), df(gamma)=2 (docs 0,3)
    val s0 = micro(2, 2, 4, nd, avgdl) + micro(1, 2, 4, nd, avgdl) // doc 0
    val s1 = micro(1, 2, 2, nd, avgdl)                             // doc 1
    val s3 = micro(1, 2, 4, nd, avgdl)                             // doc 3
    val expected = Seq((100L, 0L, s0), (100L, 1L, s1), (100L, 3L, s3))
      .sortBy { case (_, id, m) => (-m, id) }
      .zipWithIndex.map { case ((q, id, m), i) => (q, i + 1, id, m) }
    assert(out.toSeq == expected, s"got ${out.toSeq}")
    // doc 2 shares no query term and must not appear
    assert(!out.exists(_._3 == 2L))
  }

  test("rank invariants: dense ranks from 1, scores non-increasing, k caps") {
    val queries = Seq(
      (100L, Seq("alpha")), (200L, Seq("beta", "gamma"))
    ).toDF("query_id", "qt")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, k = 2)
      .select("query_id", "rk", "doc_id", "mscore")
      .as[(Long, Int, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.length <= 2)
      assert(sorted.sliding(2).forall {
        case Array(a, c) => a._4 >= c._4
        case _           => true
      })
    }
  }

  test("length normalization: at equal tf/df the shorter doc ranks first") {
    // beta: tf 3 in doc 3 (dl 4), tf 1 in docs 0 (dl 4) and 1 (dl 2) —
    // the tf advantage keeps doc 3 first, and between the equal-tf
    // docs the shorter doc 1 must outrank doc 0 (the normalization
    // BM25 adds over raw tf-idf)
    val qBeta = Seq((8L, Seq("beta"))).toDF("query_id", "qt")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", qBeta, k = 3)
      .orderBy("rk").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(3L, 1L, 0L), s"got ${out.toSeq}")
  }

  test("hybrid RRF fusion equals the manually fused legs") {
    // corpus where every doc also has an embedding (vec_id = doc_id) —
    // the operator's one-embedding-per-document contract. The test does
    // NOT predict BM25 or cosine ranks; it recomputes both legs with
    // the already-spec'd operators and replays the RRF arithmetic in
    // plain Scala, pinning the fusion step itself.
    val docTbl = (0 until 12).map { id =>
      (id.toLong, s"term$id shared common word${id % 3} tail$id filler")
    }.toDF("doc_id", "text")
    val embTbl = (0 until 12).map { id =>
      val v = Array.tabulate(64) { d =>
        var z = id * 6271L + d * 31337L + 5
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        (z.toFloat / Long.MaxValue)
      }
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val k = 4; val nLeg = 6; val k0 = 60; val maxQ = 3L
    val got = TextAnalysis.hybridRetrieve(docTbl, embTbl, k = k,
        nLeg = nLeg, k0 = k0, maxQueryId = maxQ)
      .select("query_id", "rk", "doc_id", "rrf_micro", "n_legs")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    // manual fusion from the two independently-computed legs
    val lex = TextAnalysis.bm25TopK(docTbl, "doc_id", "text",
        TextAnalysis.keywordQueries(docTbl, "doc_id", "text", maxQ), k = nLeg)
      .select("query_id", "doc_id", "rk").as[(Long, Long, Int)].collect()
    val sem = graft.operators.Similarity.bruteForceTopK(embTbl,
        embTbl.filter(col("vec_id") < maxQ), nLeg)
      .select("q_id", "neighbor", "rk").as[(Long, Long, Int)].collect()
    val expected = (lex ++ sem).groupBy(t => (t._1, t._2)).map {
      case ((q, d), rows) =>
        (q, d, rows.map(r => 1000000000L / (k0 + r._3)).sum, rows.length.toLong)
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.toSeq.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex.map {
        case ((q, d, s, n), i) => (q, i + 1, d, s, n)
      }
    }.toSet
    assert(got == expected, s"got $got\nexpected $expected")
    // at least one fused row must draw from both legs for the test to
    // exercise the sum path (guard against a degenerate fixture)
    assert(expected.exists(_._5 == 2L), "no doc appeared in both legs")
  }

  test("MMR kernel: diversity penalty demotes the near-duplicate; pw=0 is pure relevance") {
    // doc 1 (rel 1e6) and doc 2 (rel 999999) share an identical
    // embedding; doc 3 (rel 5e5) is orthogonal. With penaltyWeight 3,
    // step 2 must skip the twin (score 999999 - 3e6) for the diverse
    // doc 3 (score 5e5); with penaltyWeight 0 the order is pure rel.
    val e1 = Array.tabulate(8)(d => if (d == 0) 1f else 0f).toSeq
    val e2 = Array.tabulate(8)(d => if (d == 1) 1f else 0f).toSeq
    def run(pw: Int, rows: Seq[(Long, Long, Long, Seq[Float])]) = {
      val packed = rows.toDF("query_id", "rel", "doc", "emb")
        .groupBy(col("query_id"))
        .agg(collect_list(struct(col("rel").as("rel"), col("doc").as("doc"),
          col("emb").as("emb"))).as("cands"))
      val sel = org.apache.spark.sql.GraftBridge.column(
        graft.functions.MmrSelectExpr(
          org.apache.spark.sql.GraftBridge.expression(col("cands")), 3, pw))
      packed.select(col("query_id"), explode(sel).as("s"))
        .select(col("s.step"), col("s.doc_id"), col("s.mmr_micro"))
        .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    }
    val rows = Seq(
      (100L, 1000000L, 1L, e1), (100L, 999999L, 2L, e1),
      (100L, 500000L, 3L, e2))
    assert(run(3, rows) == Seq(
      (1, 1L, 1000000L),
      (2, 3L, 500000L),          // diverse doc beats the penalized twin
      (3, 2L, 999999L - 3000000L)))
    assert(run(0, rows).map(_._2) == Seq(1L, 2L, 3L))
    // arrival order must not matter (kernel sorts internally)
    assert(run(3, rows.reverse) == run(3, rows))
    // score tie breaks to the lowest doc id
    val tie = Seq((100L, 7L, 9L, e1), (100L, 7L, 4L, e2))
    assert(run(0, tie).map(_._2) == Seq(4L, 9L))
  }

  test("MaxScore pruning is value-identical to the direct fan-out (r16)") {
    // the regime the pruning exists for: many queries sharing a small
    // common vocabulary, so the direct (term → query) fan-out explodes.
    // 400 docs over a 30-word vocabulary with heavy repetition; queries
    // derived from the first 256 docs (keywordQueries), so query terms
    // overlap massively. Assert the pruned path returns EXACTLY the
    // direct path's rows (ranks, ids, micro scores) for several k,
    // including k=1 (tightest θ) and k larger than many result sets.
    val rnd = new scala.util.Random(0xB25)
    val corpus = (0 until 400).map { id =>
      val n = 3 + rnd.nextInt(12)
      val words = (0 until n).map { _ =>
        val v = rnd.nextInt(30)
        if (v < 8) s"common$v" else s"w$v"   // hot head + tail
      }
      (id.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val queries = TextAnalysis.keywordQueries(corpus, "doc_id", "text",
      maxId = 256, nTerms = 3)
    for (k <- Seq(1, 5, 40)) {
      val direct = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
          queries, k = k)
        .select("query_id", "rk", "doc_id", "mscore")
        .as[(Long, Int, Long, Long)].collect().toSet
      val pruned = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
          queries, k = k, maxScorePrune = true)
        .select("query_id", "rk", "doc_id", "mscore")
        .as[(Long, Int, Long, Long)].collect().toSet
      assert(pruned == direct,
        s"k=$k: pruned ${pruned.size} rows vs direct ${direct.size}; " +
          s"missing=${(direct -- pruned).take(5)} extra=${(pruned -- direct).take(5)}")
    }
    // tie stress: identical docs give identical scores at the θ
    // boundary — the pruning must keep every doc that ties into the
    // top-k by the (mscore desc, doc_id) order
    val twins = (0 until 60).map(id => (id.toLong, "dup dup alpha"))
      .toDF("doc_id", "text")
    val tq = Seq((0L, Seq("dup")), (1L, Seq("dup", "alpha")))
      .toDF("query_id", "qt")
    val dT = TextAnalysis.bm25TopK(twins, "doc_id", "text", tq, k = 7)
      .select("query_id", "rk", "doc_id", "mscore")
      .as[(Long, Int, Long, Long)].collect().toSet
    val pT = TextAnalysis.bm25TopK(twins, "doc_id", "text", tq, k = 7,
        maxScorePrune = true)
      .select("query_id", "rk", "doc_id", "mscore")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(pT == dT)
  }

  test("keywordQueries derives first-n distinct tokens of low-id docs") {
    val q = TextAnalysis.keywordQueries(docs, "doc_id", "text",
      maxId = 2, nTerms = 3)
      .as[(Long, Seq[String])].collect().toMap
    assert(q.keySet == Set(0L, 1L))
    // doc 0's first 3 tokens are (alpha, beta, alpha) → distinct keeps
    // first occurrences
    assert(q(0L) == Seq("alpha", "beta"))
    assert(q(1L) == Seq("alpha", "beta"))
  }
}
