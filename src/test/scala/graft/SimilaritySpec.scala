package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // deterministic synthetic vectors: 64-dim from a seeded integer hash
    val rows = (0 until 300).map { id =>
      val v = Array.tabulate(64) { d =>
        var z = id * 7919L + d * 104729L + 17
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        (z.toFloat / Long.MaxValue)
      }
      (id.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("multi-probe LSH recall vs brute force") {
    val q = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(corpus, q, k = 5)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, q, k = 5, nPlanes = 8)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    // every query must get candidates, and recall must be non-trivial
    assert(lsh.map(_._1).size == 5 || lsh.nonEmpty)
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall > 0.2, s"recall $recall too low; lsh=${lsh.size} pairs")
  }

  test("IVF with full probing equals brute force; partial probing recalls") {
    val q = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(corpus, q, k = 5)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect().toSet
    // nprobe == nlist probes every cell → identical to brute force
    val full = Similarity.ivfTopK(corpus, q, k = 5, nlist = 8, nprobe = 8)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
    // partial probing: recall must stay useful
    val part = Similarity.ivfTopK(corpus, q, k = 5, nlist = 8, nprobe = 3)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(t => (t._1, t._3))
    val recall = exactPairs.intersect(part).size.toDouble / exactPairs.size
    assert(recall > 0.3, s"ivf recall $recall too low")
  }

  test("IVF codebook training reduces quantization error") {
    import org.apache.spark.sql.functions._
    def quantError(cents: Array[Array[Float]]): Double = {
      val s = array(cents.map(ce =>
        Similarity.cosine(col("embedding"), array(ce.map(lit): _*))): _*)
      corpus.select(avg(lit(1.0) - array_max(s)).as("e"))
        .collect()(0).getDouble(0)
    }
    val init = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)
    val trained = Similarity.trainIvfCodebook(corpus, nlist = 8, iters = 4)
    val e0 = quantError(init)
    val e1 = quantError(trained)
    assert(e1 <= e0 + 1e-9, s"training worsened quantization: $e0 -> $e1")
    assert(e1 < e0 * 0.95, s"training barely moved: $e0 -> $e1")
  }

  test("PQ codebook training reduces per-subspace quantization error") {
    import org.apache.spark.sql.functions._
    val (m, ksub, dim) = (8, 8, 64)
    val sub = dim / m
    def quantError(cents: Array[Array[Array[Float]]]): Double = {
      // mean over vectors of the total (all-subspace) min squared L2
      val perJ = (0 until m).map { j =>
        val sv = slice(col("embedding"), j * sub + 1, sub)
        array_min(array((0 until ksub).map { c =>
          aggregate(zip_with(sv,
            array(cents(j)(c).map(v => lit(v.toDouble)): _*),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (acc, v) => acc + v)
        }: _*))
      }.reduce(_ + _)
      corpus.select(avg(perJ).as("e")).collect()(0).getDouble(0)
    }
    val init = Array.tabulate(m, ksub) { (j, c) =>
      corpus.filter(col("vec_id") === c).select(col("embedding"))
        .collect()(0).getSeq[Float](0).toArray.slice(j * sub, (j + 1) * sub)
    }
    val trained = Similarity.trainPqCodebooks(corpus, m, ksub, dim, iters = 4)
    val e0 = quantError(init)
    val e1 = quantError(trained)
    assert(e1 <= e0 + 1e-9, s"training worsened quantization: $e0 -> $e1")
    assert(e1 < e0 * 0.9, s"training barely moved: $e0 -> $e1")
    // trained codebooks feed straight into the search (shape contract)
    val out = Similarity.pqTopK(corpus, corpus.filter(col("vec_id") < 2),
      k = 3, m, ksub, dim, codebook = Some(trained)).collect()
    assert(out.length == 6)
  }

  test("embedding near-dup: finds planted near-duplicates within a block") {
    // plant near-dups: vectors 1000/1001 and 1002/1003 are tiny
    // perturbations of corpus vectors — cosine ≈ 1 within the same block
    val base = corpus.withColumn("label", (col("vec_id") % 3).cast("int"))
    val planted = corpus.filter(col("vec_id") < 2)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), x => x * 1.0001f).as("embedding"),
        (col("vec_id") % 3).cast("int").as("label"))
    val pairs = Similarity.embeddingNearDupPairs(base.union(planted), "label",
        threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1000L)), s"missing planted pair in $pairs")
    assert(pairs.contains((1L, 1001L)), s"missing planted pair in $pairs")
  }

  test("embedding near-dup: a hot block cannot materialize m²/2 pairs") {
    // one block of 3000 IDENTICAL vectors: all-pairs would be ~4.5M rows;
    // every LSH bucket holds all 3000 members > maxBucket → dropped, so
    // the capped plan returns zero candidate pairs (exact duplicates are
    // the exact-dedup layer's job — same contract as Dedup.bucketPairs)
    val v = Array.tabulate(64)(d => (d + 1).toFloat / 64f).toSeq
    val hot = (0 until 3000).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val out = Similarity.embeddingNearDupPairs(hot, "label",
      threshold = 0.3, maxBucket = 1024)
    assert(out.count() == 0L)
    // and a small block below the cap still yields its pairs
    val small = (0 until 4).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    assert(Similarity.embeddingNearDupPairs(small, "label", threshold = 0.3)
      .count() == 6L) // C(4,2)
  }

  test("semDedup: keeps the lowest id per tau-close group, caps pass through") {
    // three exact copies of one vector + one distinct vector, plus the
    // deterministic-corpus tail so the codebook (first-16) exists
    val v = Array.tabulate(64)(d => (d + 1).toFloat / 64f).toSeq
    val w = Array.tabulate(64)(d => (if (d % 2 == 0) 1f else -1f)).toSeq
    val docs = (Seq((100L, v), (101L, v), (102L, v), (103L, w)) ++
      (0 until 32).map { id =>
        val u = Array.tabulate(64) { d =>
          var z = id * 7919L + d * 104729L + 17
          z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
          (z.toFloat / Long.MaxValue)
        }
        (id.toLong, u.toSeq)
      }).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(docs, tau = 0.99)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(out(100L), "lowest id of the duplicate group must survive")
    assert(!out(101L) && !out(102L), "copies of a lower id must drop")
    assert(out(103L), "a distinct vector must survive")
    // a cluster above maxCluster passes through un-deduped
    val hot = (0 until 40).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val capped = Similarity.semDedup(hot, tau = 0.99, maxCluster = 8)
    assert(capped.filter(!col("kept")).count() == 0L)
    assert(capped.count() == 40L)
  }

  test("decontaminateSemantic flags tau-close train vectors, returns every train row") {
    // plant: train id 101 = exact copy of eval id 100 (evalMod 50 →
    // 100 is eval, 101 train); identical vectors share every band key,
    // so the LSH can never miss the pair
    val evalRow = corpus.filter(col("vec_id") === 7)
      .select(lit(100L).as("vec_id"), col("embedding"))
    val copyRow = corpus.filter(col("vec_id") === 7)
      .select(lit(101L).as("vec_id"), col("embedding"))
    val base = corpus.filter(col("vec_id") < 90 && col("vec_id") % 50 =!= 0)
    val df = base.unionByName(evalRow).unionByName(copyRow)
    val out = Similarity.decontaminateSemantic(df, evalMod = 50, tau = 0.9)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1), r.getBoolean(2)))
    // every train row present, eval rows absent
    assert(out.map(_._1).toSet == base.collect().map(_.getLong(0)).toSet + 101L)
    val planted = out.find(_._1 == 101L).get
    assert(planted._3 && planted._2 > 0.999, planted.toString)
    // train vec 7 is the eval vector's own source — flagged too; every
    // flagged row must actually clear tau
    assert(out.find(_._1 == 7L).get._3)
    assert(out.filter(_._3).forall(_._2 >= 0.9), out.filter(_._3).mkString(","))
    // determinism under repartitioning
    val again = Similarity.decontaminateSemantic(df.repartition(5),
        evalMod = 50, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(again == out.map(t => (t._1, t._3)).sortBy(_._1).toSeq)
  }

  test("clusterTopics: every vector assigned once, mass sums to corpus, codebook members self-match") {
    val out = Similarity.clusterTopics(corpus)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // total mass = corpus size; cluster ids inside the adaptive nlist
    assert(out.map(_._2).sum == 300)
    assert(out.forall(t => t._1 >= 0 && t._1 < 16)) // 300/512 -> nlist 16
    // micro-sims are exact integers in [-1e6, 1e6]; min <= max per row
    assert(out.forall(t => t._4 <= t._5 && t._5 <= 1000000L && t._4 >= -1000000L))
    // each codebook vector (vec_id < nlist) has cosine 1.0 to itself, so
    // every cluster's max micro-sim is exactly 1e6 minus float-floor slack
    assert(out.forall(_._5 >= 999999L), out.mkString(","))
    // deterministic under repartitioning
    val again = Similarity.clusterTopics(corpus.repartition(7))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(again == out.map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq)
  }

  test("PQ-ADC: clustered corpus ranks exactly; self-excluded, deterministic") {
    // corpus built to make ADC behavior closed-form: vectors 0..15 are
    // the anchors (and therefore the first-ksub codebook rows); vector
    // i > 15 is anchor(i % 16) plus a tiny perturbation that can never
    // flip a subspace assignment (anchors are mutually far). Every
    // member of cluster a then shares anchor a's exact code, ADC
    // distance depends ONLY on the code, all same-cluster members tie,
    // and ties break by ascending id — so for query a the top-5 is
    // exactly [a+16, a+32, a+48, a+64, a+80].
    val rows = (0 until 128).map { id =>
      val a = id % 16
      val eps = 1e-4f * (id / 16)
      val v = Array.tabulate(64) { d =>
        var z = a * 7919L + d * 104729L + 17
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        (z.toFloat / Long.MaxValue) + eps
      }
      (id.toLong, v.toSeq)
    }
    val c = rows.toDF("vec_id", "embedding")
    val q = c.filter(col("vec_id") < 4)
    val out = Similarity.pqTopK(c, q, k = 5)
      .select("q_id", "rk", "neighbor", "dist_micro")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length == 20)
    assert(out.forall { case (q0, _, n, _) => q0 != n })
    (0L until 4L).foreach { a =>
      val got = out.filter(_._1 == a).sortBy(_._2).map(_._3).toSeq
      assert(got == Seq(a + 16, a + 32, a + 48, a + 64, a + 80),
        s"query $a neighbors $got")
    }
    // the query IS its own codebook anchor: its ADC distance to its
    // cluster's code is exactly 0 micro-units
    assert(out.filter(_._2 == 1).forall(_._4 == 0L))
    // deterministic across runs
    val again = Similarity.pqTopK(c, q, k = 5)
      .select("q_id", "rk", "neighbor", "dist_micro")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("SQ8: level ladder is the closed-form uniform grid per dimension") {
    // two vectors pin every dimension's min/max to (0, d+1), so level c
    // of dimension d must be exactly ((d+1) * c / (nlevels-1)).toFloat
    // under the trainSqLevels double arithmetic
    val dim = 4
    val rows = Seq(
      (0L, Array.fill(dim)(0.0f).toSeq),
      (1L, Array.tabulate(dim)(d => (d + 1).toFloat).toSeq))
    val c = rows.toDF("vec_id", "embedding")
    val lv = Similarity.trainSqLevels(c, dim = dim, nlevels = 8)
    assert(lv.length == dim && lv.forall(_.length == 8) &&
      lv.forall(_.forall(_.length == 1)))
    for (d <- 0 until dim; k <- 0 until 8) {
      val expected = (0.0 + k * ((d + 1).toDouble / 7.0)).toFloat
      assert(lv(d)(k)(0) == expected, s"level ($d, $k)")
    }
  }

  test("SQ8: quantization is fine enough to reproduce brute-force top-1 " +
       "on separated clusters; self-excluded, deterministic") {
    // same clustered construction as the PQ-ADC test: members of a
    // cluster differ by eps=1e-4 steps while clusters are mutually far,
    // so even after per-dim rounding to 256 levels the nearest neighbor
    // of every query is a member of its own cluster
    val rows = (0 until 96).map { id =>
      val a = id % 8
      val eps = 1e-4f * (id / 8)
      val v = Array.tabulate(64) { d =>
        var z = a * 7919L + d * 104729L + 17
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        (z.toFloat / Long.MaxValue) + eps
      }
      (id.toLong, v.toSeq)
    }
    val c = rows.toDF("vec_id", "embedding")
    val q = c.filter(col("vec_id") < 4)
    val out = Similarity.sq8TopK(c, q, k = 5)
      .select("q_id", "rk", "neighbor", "dist_micro")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length == 20)
    assert(out.forall { case (q0, _, n, _) => q0 != n })
    // top-5 of query a are exactly its cluster siblings (all 11 other
    // members are closer than any cross-cluster vector at this spread)
    (0L until 4L).foreach { a =>
      val got = out.filter(_._1 == a).map(_._3).toSet
      assert(got.forall(n => n % 8 == a), s"query $a neighbors $got")
    }
    val again = Similarity.sq8TopK(c, q, k = 5)
      .select("q_id", "rk", "neighbor", "dist_micro")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("brute force top-k is deterministic, self-excluded, ordered") {
    val q = corpus.filter(col("vec_id") === 0)
    val rows = Similarity.bruteForceTopK(corpus, q, k = 10)
      .orderBy("rk").collect()
    assert(rows.length == 10)
    assert(!rows.exists(_.getAs[Long]("neighbor") == 0L))
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("hamming: closed-form ranks on constructed sign patterns") {
    // vector j = the all-positive base with its first j dims flipped
    // negative → hamming(v_0, v_j) = j exactly; ranks must follow j
    val rows = (0 until 12).map { j =>
      (j.toLong, Array.tabulate(64)(d => if (d < j) -1f else 1f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.hammingTopK(df, df.filter(col("vec_id") === 0), k = 5)
      .orderBy("rk").collect()
    assert(got.map(_.getAs[Long]("neighbor")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_.getAs[Long]("hamming")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("hamming: self-excluded, deterministic, tie-broken by neighbor") {
    val q = corpus.filter(col("vec_id") < 3)
    val a = Similarity.hammingTopK(corpus, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val b = Similarity.hammingTopK(corpus, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    assert(a.size == 15)
    assert(!a.exists(t => t._1 == t._3)) // self-excluded
    // within a query, hamming non-decreasing by rank
    a.groupBy(_._1).foreach { case (_, rows) =>
      val byRk = rows.toSeq.sortBy(_._2).map(_._4)
      assert(byRk.zip(byRk.tail).forall { case (x, y) => x <= y })
    }
  }

  test("hamming rerank: candidates re-rank by exact cosine; full-width candidates equal brute force") {
    val q = corpus.filter(col("vec_id") < 4)
    // nCand = corpus size ⇒ stage 1 nominates everything ⇒ the rerank
    // IS brute force (same round-4 cosine + neighbor tie-break)
    val full = Similarity.hammingRerankTopK(corpus, q, k = 5, nCand = 300)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(corpus, q, k = 5)
      .select("q_id", "rk", "neighbor").as[(Long, Int, Long)].collect().toSet
    assert(full == exact)
    // narrow candidates: every result must come from stage 1's
    // candidate set, ordered by exact sim within each query
    val cands = Similarity.hammingTopK(corpus, q, k = 20)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val got = Similarity.hammingRerankTopK(corpus, q, k = 5, nCand = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.forall(t => cands.contains((t._1, t._3))))
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRk = rows.toSeq.sortBy(_._2).map(_._4)
      assert(byRk.zip(byRk.tail).forall { case (x, y) => x >= y })
    }
  }

  test("recall audit: PQ recall matches the manual leg intersection") {
    val q = corpus.filter(col("vec_id") < 4)
    val k = 10
    val auditRows = Similarity.annRecallAudit(corpus, q, k = k)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val exact = Similarity.bruteForceTopK(corpus, q, k)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopK(corpus, q, k)
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    assert(auditRows.keySet == Set(0L, 1L, 2L, 3L))
    auditRows.foreach { case (qid, (hits, microRecall)) =>
      val manual = exact.filter(_._1 == qid).intersect(approx.filter(_._1 == qid)).size
      assert(hits == manual, s"q$qid hits $hits != manual $manual")
      assert(microRecall == hits * 1000000L / k)
      assert(hits >= 0 && hits <= k)
    }
  }
}
