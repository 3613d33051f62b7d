package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("five", "FIVE")), // near-dup of 1
      (3L, base.split(" ").reverse.mkString(" ")), // same words, shuffled order
      (4L, "completely unrelated text with entirely different tokens here " +
           "nothing shared at all between documents whatsoever truly")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 16, rows = 4, minEstJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("nearDupVerified: exact jaccard on LSH survivors only") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("five", "cinq")), // genuine near-dup of 1 (one
      // token differs AFTER lowering, so preDedup can't collapse it)
      (3L, "completely unrelated text with entirely different tokens here " +
           "nothing shared at all between documents whatsoever truly")
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupVerified(docs, "doc_id", "text",
      minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    // the 1-2 pair survives filter AND verify; exact jaccard matches the
    // exhaustive verifier's number for the same pair
    assert(out.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    val exhaustive = Dedup.ngramJaccardPairs(
        docs.withColumn("lang", lit("en")), "doc_id", "text", "lang",
        minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    assert(out.forall(p => exhaustive((p._1, p._2)) == p._3))
    // a doc pair below the verify threshold is filtered even if LSH
    // proposed it: verify with an impossible threshold → empty
    assert(Dedup.nearDupVerified(docs, "doc_id", "text",
      minJaccard = 0.999).count() == 0)
  }

  test("verified composition: exact copies collapse, members expand to clusters") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, base),
      (2L, base.toUpperCase),              // exact dup of 1 after lowering
      (3L, base.replace("five", "cinq")),  // near-dup of 1
      (4L, "totally different content here with nothing shared at all " +
           "between documents whatsoever truly unrelated text tokens")
    ).toDF("doc_id", "text")
    // preDedup: LSH sees reps {1, 3, 4} only; pair (1,3) verifies
    val pairs = Dedup.nearDupVerified(docs, "doc_id", "text",
      minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 3L)))
    // member expansion: 2 rides its rep 1's cluster; 4 unclustered
    val members = Dedup.textMembersGlobal(docs, "doc_id", "text")
    val labels = Dedup.clusters(pairs.toSeq.toDF("id_a", "id_b", "j"))
    val out = members.join(labels, members("rep") === labels("doc"), "left")
      .select(members("doc"),
        coalesce(labels("cluster"),
          when(members("grp_n") >= 2, members("rep"))).as("cluster"))
      .filter(col("cluster").isNotNull)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("exact dedup groups identical normalized content") {
    val docs = Seq(
      (10L, "Hello,  World!"), (11L, "hello world"), (12L, "other text")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(out(10L) == 2) // 10 and 11 normalize identically
    assert(out(12L) == 1)
  }

  test("keepBest resolves duplicate groups to max score, ties to smallest id") {
    val docs = Seq(
      // one normalized group: 20 wins on score; 22 ties 20 but has larger id
      (20L, "Hello,  World!", 9.0), (21L, "hello world", 3.0),
      (22L, "HELLO WORLD", 9.0),
      // singleton group
      (30L, "other text", 1.0)
    ).toDF("doc_id", "text", "q")
    val out = Dedup.keepBest(docs, "doc_id", "text", col("q"))
      .select("keep_id", "best_score", "n_dups")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((20L, 9.0, 3L), (30L, 1.0, 1L)), out.toString)
    // same groups as exact(), different representative policy
    val fps = Dedup.exact(docs, "doc_id", "text").select("fp")
      .as[String].collect().sorted.toSeq
    val fps2 = Dedup.keepBest(docs, "doc_id", "text", col("q")).select("fp")
      .as[String].collect().sorted.toSeq
    assert(fps == fps2)
    // the per-group argmax stays a combinable aggregate, not a window
    val plan = Dedup.keepBest(docs, "doc_id", "text", col("q"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keepBest must not window:\n$plan")
  }

  test("contaminationReport: eval-side coverage with zero rows included") {
    // eval doc 100 leaked verbatim into train docs 1 and 2; eval doc 200
    // shares nothing; train doc 3 is unrelated
    val leak = "alpha beta gamma delta epsilon zeta"
    val train = Seq(
      (1L, leak), (2L, leak + " tail"), (3L, "one two three four five six"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, leak), (200L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val out = Dedup.contaminationReport(train, eval, "doc_id", "text",
        n = 5, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(100L, 200L))
    val hit = out(0)
    assert(hit._2 == 2 && hit._3 == 1000000L && hit._4 == 1L, hit.toString)
    assert(out(1) == ((200L, 0L, -1L, -1L)), out(1).toString)
    // consistency with the doc-side view: every contaminated doc's best
    // eval must appear in the report with n_contaminated > 0
    val docSide = Dedup.decontaminateFuzzy(train, eval, "doc_id", "text",
        n = 5, threshold = 0.3)
      .filter(col("contaminated")).select("best_eval_id")
      .as[Long].collect().toSet
    assert(docSide.subsetOf(out.filter(_._2 > 0).map(_._1).toSet))
  }

  test("connected components cluster transitive near-dups") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // chain: 1-2-3
      (10L, 11L),         // separate pair
      (20L, 21L), (21L, 22L), (22L, 23L) // chain of 4
    ).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 1L)
    assert(cl(10L) == 10L && cl(11L) == 10L)
    assert(Seq(20L, 21L, 22L, 23L).map(cl).toSet == Set(20L))
  }

  test("pointer doubling converges on a chain longer than the round count") {
    // 40-node chain: diameter 40; one-hop propagation would need 40 rounds,
    // pointer doubling needs ~log2(40)+2 ≈ 8 — well inside maxIter.
    // localThreshold=0 forces the distributed loop (the scale path).
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(cl.size == 41)
    assert(cl.values.toSet == Set(0L))
  }

  test("driver union-find path matches the distributed path") {
    val pairs = Seq((5L, 3L), (3L, 9L), (7L, 8L), (1L, 9L)).toDF("id_a", "id_b")
    val local = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.clusters(pairs, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local(5L) == 1L && local(3L) == 1L && local(9L) == 1L && local(1L) == 1L)
    assert(local(7L) == 7L && local(8L) == 7L)
  }

  test("ngram verify pre-dedups exact copies; members expand to rep clusters") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, "en", base),
      (2L, "en", base),                       // exact copy of 1
      (3L, "en", base.toUpperCase),           // copy modulo case
      (4L, "en", base.replace("zeta", "Z")),  // genuine near-dup of 1
      (5L, "en", "unrelated words entirely different from the others " +
                 "nothing shared here at all truly distinct content"),
      (6L, "en", "lone duplicate pair text with its own unique tokens " +
                 "spread over enough words to shingle cleanly right"),
      (7L, "en", "lone duplicate pair text with its own unique tokens " +
                 "spread over enough words to shingle cleanly right")
    ).toDF("doc_id", "lang", "text")
    // pairs are between representatives only: (1,4), never (2,4)/(3,4)
    // or the jaccard-1.0 pairs (1,2)(1,3)(2,3)(6,7)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
      n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 4L)))
    // member expansion (the dedup_clusters composition): copies 2 and 3
    // inherit rep 1's cluster; the pair-less dup group {6,7} forms its
    // own cluster labeled by its rep
    val members = Dedup.textMembers(docs, "doc_id", "text", "lang")
    val repLabels = Dedup.clusters(Dedup.ngramJaccardPairs(docs, "doc_id",
      "text", "lang", n = 3, minJaccard = 0.5))
    val cl = members.join(repLabels, members("rep") === repLabels("doc"), "left")
      .select(members("doc"),
        coalesce(repLabels("cluster"),
          when(members("grp_n") >= 2, members("rep"))).as("cluster"))
      .filter(col("cluster").isNotNull)
      .as[(Long, Long)].collect().toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 6L -> 6L, 7L -> 6L))
  }

  test("simhash banding catches small hamming distances") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("tok7", "tokX")),
      (3L, (100 to 140).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("substring dup spans: content-defined selection is alignment-independent") {
    // the same 400-char span embedded at DIFFERENT offsets in two docs
    // must be detected: md5-based window selection depends only on the
    // window bytes, so both copies keep identical windows
    val rng = new scala.util.Random(7)
    def blob(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val span = blob(400)
    val docs = Seq(
      (1L, blob(37) + span + blob(50)),   // span at offset 37
      (2L, blob(211) + span + blob(13)),  // span at offset 211
      (3L, blob(500))                     // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, "doc_id", "text")
      .select("ndocs", "first_doc").as[(Long, Long)].collect()
    assert(out.nonEmpty) // ≥1 shared window survives the 1/16 selection
    assert(out.forall { case (ndocs, first) => ndocs == 2 && first == 1L })
    // a short doc (< window) produces no windows and no crash
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(Dedup.substringDupSpans(short, "doc_id", "text").count() == 0)
  }

  test("lineDedup removes corpus-wide boilerplate, preserves line order") {
    val docs = Seq(
      (1L, "BANNER\nalpha one\nmid\nFOOTER"),
      (2L, "BANNER\nbeta two\nFOOTER"),
      (3L, "BANNER\ngamma three\nFOOTER"),
      (4L, "BANNER\nBANNER\nBANNER") // all-boilerplate doc drops out
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text")
      .select("doc_id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect().toSet
    // BANNER ×6 and FOOTER ×3 cross the >=3 threshold; unique lines stay
    assert(out == Set(
      (1L, 2L, "alpha one\nmid"),
      (2L, 1L, "beta two"),
      (3L, 1L, "gamma three")))
  }

  test("decontaminateFuzzy: max Jaccard + deterministic argmax") {
    // eval 100: grams {a b c d e, b c d e f} (6 tokens → 2 distinct 5-grams)
    // eval 200: a disjoint doc
    // corpus 1 ≡ eval 100 → jaccard 1.0 against it
    // corpus 2 shares exactly one of eval 100's two grams and has two
    //   grams of its own → jaccard = 1 / (2 + 2 - 1) = 1/3
    // corpus 3 shares nothing → absent from the output
    val evalSet = Seq(
      (100L, "a b c d e f"),
      (200L, "p q r s t u")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e zz"),
      (3L, "m n o ww xx yy")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateFuzzy(corpus, evalSet, "doc_id", "text")
      .select("doc_id", "micro_jaccard", "best_eval_id", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1000000L, 100L, true),
      (2L, 333333L, 100L, false)))
  }

  test("snapshotNearDup: exact copies and near-copies drop, distinct and short docs stay") {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val snap = Seq(
      (1000L, base),
      (1001L, "completely different snapshot content about maritime navigation charts")
    ).toDF("doc_id", "text")
    val input = Seq(
      (1L, base),                          // exact copy → identical sig → dropped
      (2L, base.toUpperCase),              // case variant → identical lowered text → dropped
      (3L, base + " extra tail"),          // near-copy (jaccard ≈ 12/15) → dropped
      (4L, "entirely unrelated fresh text about quantum chromodynamics lattice results"),
      (5L, "ab cd")                        // < n tokens: null signature → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.snapshotNearDup(input, snap, "doc_id", "text")
      .as[Long].collect().toSet
    assert(kept == Set(4L, 5L))
  }

  test("snapshotDedup: seen fingerprints drop; disjoint and empty slivers pass all") {
    val snap = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val input = Seq(
      (10L, "alpha beta gamma"),   // byte-identical → dropped
      (11L, "Alpha, beta GAMMA!"), // canonical-fingerprint-equal → dropped
      (12L, "totally new text")    // unseen → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.snapshotDedup(input, snap, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L))
    // fully disjoint input: the sliver (bloom hits) is empty, the
    // sliver bloom is null, and the verify join prunes away entirely —
    // everything passes
    val disjoint = Seq((20L, "nothing shared at all here"))
      .toDF("doc_id", "text")
    val kept2 = Dedup.snapshotDedup(disjoint, snap, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(20L))
  }

  test("leakage-safe split: exact dups and verified near-dups never straddle the boundary") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val split = SparkEntry.queries("split_leakage_safe")(spark, dir)
      .select("doc_id", "split_key", "is_train")
      .as[(Long, Long, Boolean)].collect()
    assert(split.length == docs.count())
    val side = split.map(r => r._1 -> r._3).toMap
    // every verified near-dup pair lands on the same side
    val pairs = Dedup.nearDupVerified(docs, "doc_id", "text", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must contain verified near-dups")
    pairs.foreach { case (a, b) =>
      assert(side(a) == side(b), s"near-dup pair ($a,$b) straddles the split")
    }
    // every exact-dup group lands on the same side (the sf0.001 corpus
    // has none — the branch is exercised by construction when present,
    // since their split key is the shared rep)
    val groups = Dedup.textMembersGlobal(docs, "doc_id", "text")
      .filter(col("grp_n") >= 2)
      .select("rep", "doc").as[(Long, Long)].collect().groupBy(_._1)
    groups.values.foreach { ms =>
      assert(ms.map(m => side(m._2)).toSet.size == 1,
        "exact-dup group straddles the split")
    }
    // synthetic exact-dup check instead: identical texts share split_key
    val synth = (0 until 40).map(i => (i.toLong, s"dup text ${i % 10}"))
      .toDF("doc_id", "text")
    val synthSplit = {
      val pairs = Dedup.nearDupVerified(synth, "doc_id", "text",
        minJaccard = 0.5)
      val repLabels = Dedup.clusters(pairs)
      val members = Dedup.textMembersGlobal(synth, "doc_id", "text")
      members.join(repLabels, members("rep") === repLabels("doc"), "left")
        .select(members("doc").as("doc_id"),
          coalesce(repLabels("cluster"),
            when(members("grp_n") >= 2, members("rep")),
            members("doc")).as("split_key"))
        .withColumn("is_train",
          graft.operators.Sampling.hashFraction(col("split_key"), "split") < 0.9)
        .select("doc_id", "is_train").as[(Long, Boolean)].collect().toMap
    }
    (0 until 40).foreach { i =>
      assert(synthSplit(i.toLong) == synthSplit((i % 10).toLong),
        s"exact dup $i split differently from its group")
    }
    // deterministic re-evaluation
    val again = SparkEntry.queries("split_leakage_safe")(spark, dir)
      .select("doc_id", "is_train").as[(Long, Boolean)].collect().toMap
    assert(again == side)
  }

  test("dedupReport: closed-form per-source tallies, cross-source attribution") {
    // srcA doc 0 keeps the shared text (min id); srcB docs 2,3 lose
    // their copies — the removal is charged to srcB, the keeper to srcA
    val docs = Seq(
      (0L, "shared text here", "srcA"),   // keeper (3 tokens)
      (1L, "unique alpha", "srcA"),       // keeper (2 tokens)
      (2L, "shared text here", "srcB"),   // removed
      (3L, "shared TEXT   here", "srcB"), // removed (same fingerprint)
      (4L, "unique beta gamma", "srcB")   // keeper (3 tokens)
    ).toDF("doc_id", "text", "source")
    val rep = Dedup.dedupReport(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rep("srcA"); val b = rep("srcB")
    assert(a.getLong(1) == 2 && a.getLong(2) == 2 && a.getLong(3) == 0)
    assert(a.getLong(4) == 5 && a.getLong(5) == 5 && a.getLong(6) == 0)
    assert(a.getLong(7) == 0) // dup_pct_micro
    assert(b.getLong(1) == 3 && b.getLong(2) == 1 && b.getLong(3) == 2)
    assert(b.getLong(4) == 9 && b.getLong(5) == 3 && b.getLong(6) == 6)
    assert(b.getLong(7) == 2L * 1000000L / 3L)
  }
}
