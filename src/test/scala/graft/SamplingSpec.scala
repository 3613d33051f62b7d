package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 2000)
    .map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("hash sample is deterministic across runs and repartitioning") {
    val a = Sampling.hashSample(docs, "id", numerator = 64)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(7), "id", numerator = 64)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("fraction lands near numerator/denominator") {
    val n = Sampling.hashSample(docs, "id", numerator = 64, digits = 2).count()
    // 64/256 = 25% of 2000 = 500 expected; md5 is uniform, allow ±20%
    assert(n > 400 && n < 600, s"got $n of 2000")
  }

  test("stratified sampling: adding rows to one stratum never changes another's selections") {
    val base = Sampling.stratifiedHashSample(docs, "lang", "id", numerator = 64)
      .filter($"lang" === "de").select("id").as[Long].collect().sorted.toSeq
    val grown = docs.unionByName(
      (10000 until 12000).map(i => (i.toLong, "en")).toDF("id", "lang"))
    val after = Sampling.stratifiedHashSample(grown, "lang", "id", numerator = 64)
      .filter($"lang" === "de").select("id").as[Long].collect().sorted.toSeq
    assert(base == after)
  }

  test("salt changes the selection, same salt reproduces it") {
    val s1 = Sampling.hashSample(docs, "id", 64, salt = "a")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs, "id", 64, salt = "b")
      .select("id").as[Long].collect().toSet
    val s1again = Sampling.hashSample(docs, "id", 64, salt = "a")
      .select("id").as[Long].collect().toSet
    assert(s1 == s1again && s1 != s2)
  }

  test("filter is a scan-side predicate: no shuffle in the plan") {
    val plan = Sampling.hashSample(docs, "id", 64).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling should not shuffle:\n$plan")
  }

  test("domain mix: per-domain rates hold, shuffle-free, deterministic") {
    val mixed = Sampling.domainMixSample(docs, "lang", "id",
      rates = Map("en" -> 0.5, "de" -> 0.1), salt = "t")
    val n = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    // en: 500 docs * 0.5 = 250 ± ; de: 1500 * 0.1 = 150 ±
    assert(n("en") > 200 && n("en") < 300, n.toString)
    assert(n("de") > 110 && n("de") < 190, n.toString)
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix should not shuffle:\n$plan")
    // deterministic under repartitioning
    val a = mixed.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.domainMixSample(docs.repartition(7), "lang", "id",
      rates = Map("en" -> 0.5, "de" -> 0.1), salt = "t")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("chunkByTokens: stride/overlap invariants and full coverage") {
    val docs2 = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "only three tokens"),
      (3L, "   "),                                      // zero tokens
      (4L, (1 to 48).map(i => s"u$i").mkString(" "))    // exactly one stride
    ).toDF("id", "text")
    val chunks = Sampling.chunkByTokens(docs2, "id", "text",
      chunkTokens = 64, overlapTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    // doc 1: stride 48 → ceil((100-16)/48) = 2 chunks
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.length == 2)
    assert(d1(0)._3.startsWith("t1 ") && d1(0)._4 == 64)
    assert(d1(1)._3.startsWith("t49 ") && d1(1)._4 == 52) // 100 - 48
    // consecutive chunks share exactly `overlap` tokens
    val c0 = d1(0)._3.split(" ").toSeq
    val c1 = d1(1)._3.split(" ").toSeq
    assert(c0.takeRight(16) == c1.take(16))
    // every token covered, in order, reconstructing the doc
    assert((c0 ++ c1.drop(16)) == (1 to 100).map(i => s"t$i"))
    // short doc: one partial chunk
    assert(chunks.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, "only three tokens", 3)))
    // zero tokens: no chunks
    assert(!chunks.exists(_._1 == 3L))
    // n == stride: single chunk, no phantom second window
    assert(chunks.count(_._1 == 4L) == 1)
  }

  test("perplexitySample: per-stratum tiles, no-evidence docs go to tail without shifting boundaries") {
    // 9 ranked docs per lang (distinct avg_lp, descending by id) + 2
    // zero-evidence docs; keep-all rates expose the raw bucketing
    val scored = (for {
      (lang, base) <- Seq(("en", 100L), ("de", 200L)); i <- 0 until 9
    } yield (base + i, lang, 5L, -1.0 - i * 0.1))
      .toDF("doc_id", "lang", "n_bigrams", "avg_lp")
      .unionByName(Seq((9001L, "en", 0L, Option.empty[Double]),
        (9002L, "de", 0L, Option.empty[Double]))
        .toDF("doc_id", "lang", "n_bigrams", "avg_lp"))
    val all = Sampling.perplexitySample(scored, "lang", "doc_id",
      rates = Map(1 -> 1.0, 2 -> 1.0, 3 -> 1.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // highest avg_lp = head: per lang exactly 3/3/3 ranked + unranked in tail
    for (lang <- Seq("en", "de")) {
      val ranked = all.filter(t => t._2 == lang && t._1 < 9000).sortBy(_._1)
      assert(ranked.map(_._3).toSeq == Seq(1, 1, 1, 2, 2, 2, 3, 3, 3),
        ranked.mkString(","))
    }
    assert(all.filter(_._1 >= 9000).forall(_._3 == 3))
    // head-only rates keep exactly the head tiles
    val head = Sampling.perplexitySample(scored, "lang", "doc_id",
      rates = Map(1 -> 1.0, 2 -> 0.0, 3 -> 0.0))
      .collect().map(_.getLong(0)).toSet
    assert(head == all.filter(_._3 == 1).map(_._1).toSet)
    // deterministic under repartitioning
    val again = Sampling.perplexitySample(scored.repartition(7), "lang",
      "doc_id", rates = Map(1 -> 1.0, 2 -> 0.5, 3 -> 0.1))
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    val base = Sampling.perplexitySample(scored, "lang", "doc_id",
      rates = Map(1 -> 1.0, 2 -> 0.5, 3 -> 0.1))
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(again == base)
  }

  test("upsample by weight: multiplicity = floor(w) or floor(w)+1, mean ~ w") {
    val up = Sampling.upsampleByWeight(docs, "lang", "id",
      weights = Map("en" -> 2.5, "de" -> 0.25), salt = "t")
    val perDoc = up.groupBy("lang", "id").count()
      .groupBy("lang").agg(min("count").as("lo"), max("count").as("hi"),
        sum("count").as("tot"), countDistinct("id").as("ids"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // en weight 2.5: every doc 2 or 3 copies, total ≈ 500*2.5
    assert(perDoc("en")._2 == 2 && perDoc("en")._3 == 3)
    assert(perDoc("en")._4 > 1100 && perDoc("en")._4 < 1400, perDoc.toString)
    // de weight 0.25: surviving docs have exactly 1 copy, ≈ 1500*0.25 survive
    assert(perDoc("de")._2 == 1 && perDoc("de")._3 == 1)
    assert(perDoc("de")._4 > 280 && perDoc("de")._4 < 470, perDoc.toString)
    // copy index is dense 0..n-1 per key
    val copies = up.filter($"lang" === "en").groupBy("id")
      .agg(sort_array(collect_list("copy")).as("cs"), count(lit(1)).as("n"))
      .filter(expr("cs != sequence(0, cast(n - 1 as int))")).count()
    assert(copies == 0)
  }

  test("trainingShuffle: total permutation, dense per-shard positions, arrival-order-free") {
    val docs = (1L to 500L).map(i => (i, s"d$i")).toDF("doc_id", "t")
    val out = Sampling.trainingShuffle(docs, "doc_id", nShards = 8, salt = "e0-")
    val rows = out.select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect()
    assert(rows.length == 500 && rows.map(_._1).distinct.length == 500)
    // every shard's positions are dense 1..n
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // shards spread (8 shards over 500 docs: none empty, none hot)
    val sizes = rows.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 8 && sizes.min > 20)
    // determinism under different input partitioning/arrival order
    val again = Sampling.trainingShuffle(
        docs.repartition(7).sortWithinPartitions(desc("doc_id")),
        "doc_id", nShards = 8, salt = "e0-")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different epoch salt permutes differently
    val e1 = Sampling.trainingShuffle(docs, "doc_id", 8, salt = "e1-")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(e1.sortBy(_._1).toSeq != rows.sortBy(_._1).toSeq)
  }

  test("dsirResample: target-like docs get higher weights; per-shard frac holds; deterministic") {
    // two vocabularies: target-flavored docs repeat "alpha beta", raw
    // docs "gamma delta" — the hashed-ngram likelihood ratio must push
    // target-like docs' importance weights above raw-like docs'
    val corpus = (0 until 400).map { i =>
      val isT = i % 4 == 0
      val text = if (isT) "alpha beta alpha beta gamma"
                 else "gamma delta gamma delta epsilon"
      (i.toLong, text, isT)
    }.toDF("doc_id", "text", "is_t")
    val out = Sampling.dsirResample(corpus, "doc_id", "text",
      targetPred = col("is_t"), targetFrac = 0.25, nShards = 4)
    val rows = out.select("doc_id", "shard", "w_micro", "key_micro", "kept")
      .as[(Long, Int, Long, Long, Boolean)].collect()
    assert(rows.length == 400)
    // weight separation: every target-flavored doc outweighs every raw doc
    val (tW, rW) = rows.partition(_._1 % 4 == 0)
    assert(tW.map(_._3).min > rW.map(_._3).max,
      "target-like docs must carry strictly higher importance weights")
    // per-shard keep count = floor(shard_n * frac)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val expect = math.floor(rs.length * 0.25).toLong
      assert(rs.count(_._5) == expect, s"shard keep ${rs.count(_._5)} != $expect")
    }
    // kept docs are exactly the per-shard top keys (Gumbel-top-k)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (-r._4, r._1))
      val expectKept = sorted.take(math.floor(rs.length * 0.25).toInt)
        .map(_._1).toSet
      assert(rs.filter(_._5).map(_._1).toSet == expectKept)
    }
    // deterministic under re-evaluation and input reordering
    val again = Sampling.dsirResample(
        corpus.repartition(7).sortWithinPartitions(desc("doc_id")),
        "doc_id", "text", targetPred = col("is_t"),
        targetFrac = 0.25, nShards = 4)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toSet
    assert(again == rows.map(r => (r._1, r._5)).toSet)
  }

  test("dsirResample r15 scan-side weight kernel == explode+join reference") {
    import graft.operators.{QualityClassifier, TextAnalysis}
    // small bucket count (64) forces hash collisions; texts include
    // empty / whitespace-only / single-token docs (zero-feature docs
    // must DROP, exactly as the explode form dropped them)
    val texts = Seq("alpha beta alpha", "gamma delta", "", "   ", "solo",
      "alpha gamma alpha gamma beta delta", "x y z w v u t s r q",
      "beta beta beta beta") ++ (0 until 40).map(i => s"w$i w${i % 3} tail")
    val corpus = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, i % 3 == 0) }
      .toDF("doc_id", "text", "is_t")
    val buckets = 64
    val out = Sampling.dsirResample(corpus, "doc_id", "text",
        targetPred = col("is_t"), targetFrac = 0.5,
        buckets = buckets, nShards = 2)
      .select("doc_id", "w_micro").as[(Long, Long)].collect().toMap
    // pre-r15 reference: exploded occurrences, broadcast join, groupBy
    val staged = corpus.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"), col("is_t").as("is_target"))
    val bucketArr = transform(
      concat(col("toks"), TextAnalysis.wordNgrams(col("toks"), 2)),
      g => pmod(QualityClassifier.fnv64(g), lit(buckets.toLong)))
    val occ = staged.select(col("doc_id"), col("is_target"),
      explode(bucketArr).as("b"))
    val t = occ.agg(sum(when(col("is_target"), 1L).otherwise(0L)),
      count(lit(1))).head()
    val (totT, totS) = (t.getLong(0), t.getLong(1))
    val w = occ.groupBy(col("b"))
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n_s"))
      .select(col("b"),
        floor(log(((col("n_t") + 1).cast("double") *
            lit((totS + buckets).toDouble)) /
          ((col("n_s") + 1).cast("double") * lit((totT + buckets).toDouble)))
          * 1e6).cast("long").as("w"))
    val ref = occ.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id")).agg(sum(col("w")).as("w_micro"))
      .as[(Long, Long)].collect().toMap
    assert(out == ref, "kernel weights must equal the explode+join form")
    // zero-feature docs (ids 2, 3) dropped by both
    assert(!out.contains(2L) && !out.contains(3L))
  }
}
