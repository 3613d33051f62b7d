package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through a noop write
  * (count() alone would let Catalyst prune all projections away) and
  * prints the single JSON line the driver collects into BENCH_r{N}.json.
  *
  * Methodology (the reference's own bench gate — multiple paired trials
  * judged on median ± MAD, benchmarks/ratelimit-port-keys/RESULTS.md):
  * each query runs SPARK_GRAFT_TRIALS (default 2, + 1 untimed warm-up)
  * times inside one JVM
  * and the JSON carries {median, mad, trials[]} per query, so a noisy
  * neighbor on a shared host shows up as a fat MAD instead of silently
  * poisoning a single-trial number. `queries` keeps the flat
  * name→median map for round-over-round comparability.
  */
object Bench {

  /** Wall-clock budget (r11): BENCH_r10 died at the driver's hard
    * timeout (rc 124, parsed:null) because the default invocation grew
    * past the driver's wall-clock allowance — an unparseable bench is a
    * failed bench regardless of engine speed. Everything below paces
    * itself against ONE deadline: `budgetS` seconds from main() entry
    * (env SPARK_GRAFT_BUDGET_S, default 1500 — r9's successful run took
    * 1524 s and r10's was killed, so the driver allowance is near there;
    * 1500 plus sbt/JVM startup stays inside it with margin). Sections
    * run in MUST-HAVE order (main medians → trial → sf1 → sf10 → sf100)
    * and each scale section is skipped — loudly, with a
    * "sfN_skipped":"budget" marker in the JSON — when its measured-cost
    * estimate no longer fits. The sf100 linearity evidence therefore
    * comes from a standalone `runMain graft.Bench sf100` invocation
    * (coldest-JVM, which is also what its single-trial methodology
    * wants) recorded in benchmarks/NOTES_r11.md, not from squeezing the
    * default run past its deadline. */
  private val benchStart = System.nanoTime()
  private def elapsedS: Double = (System.nanoTime() - benchStart) / 1e9
  private[graft] var budgetS: Double =
    sys.env.getOrElse("SPARK_GRAFT_BUDGET_S", "1500").toDouble
  private def remainingS: Double = budgetS - elapsedS

  // clean-run section cost estimates (NOTES_r10/r11 medians + headroom);
  // used only for skip decisions, never reported as measurements.
  // estSf1 dropped 520 -> 230 in r12: the section now runs the curated
  // join/agg/stateful subset (sf1Names, ~40 queries incl. synth) instead
  // of all 193 — the r11 full-suite section cost 399 s and starved sf10
  // out of the driver artifact two rounds running (VERDICT r11 #1).
  private val estSf1 = 230.0
  private val estSf10 = 380.0
  private val estSf100Synth = 280.0
  private val estSf100Query = // cold-JVM measurements (NOTES_r12) + margin
    Map("dedup_verified" -> 380.0, "dedup_substring" -> 300.0,
      "dedup_lines" -> 60.0, "decontaminate_fuzzy" -> 100.0,
      "dedup_snapshot" -> 60.0, "dedup_snapshot_fuzzy" -> 150.0)

  /** Host-speed calibration anchor: the r11 (uncontended) median of the
    * 524,288-msg trial on this host class, in msgs/s. The engine code
    * behind the trial is frozen (ingest decode→filter→template→agg),
    * so the ratio current/ref measures the HOST, not the engine — r12
    * measured 892 k on identical code purely from neighbor contention.
    * Published as "host_factor" (ref/current; >1 = today's host is
    * slower) so cross-round comparisons can ratio-correct absolutes. */
  private val hostRefMsgsPerSec = 1016000.0

  /** Deterministic cross-query heap reclaim: System.gc() alone leaves
    * localCheckpoint/persist blocks to the ASYNC ContextCleaner, so a
    * section query could start while gigabytes from a previous query
    * (sf1's clusters/verified checkpoints especially) still occupy the
    * block manager — the r10 clean run measured sf10 simhash at 166 s
    * mid-section vs 49.6 s fresh-JVM from exactly this. Unpersisting
    * every persistent RDD with blocking=true frees the blocks before
    * the next query's first task. */
  private def reclaim(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }

  private def median(xs: Seq[Double]): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** (median, median-absolute-deviation). */
  private def medMad(xs: Seq[Double]): (Double, Double) = {
    val m = median(xs)
    (m, median(xs.map(x => math.abs(x - m))))
  }

  private def fmtTrials(xs: Seq[Double]): String =
    xs.map(x => f"$x%.3f").mkString("[", ",", "]")

  /** sf1 rehearsal corpus: 10 shards of the sf0.1 documents/embeddings/
    * events tables with remapped ids. Doc shards 0-3 are EXACT copies
    * (byte-identical text) and shards 4-9 differ by one trailing token,
    * so every document has 4 exact duplicates plus 6 near-identical
    * variants — the crawl-duplication shape: the exact mass exercises
    * the dedup-before-verify composition (preDedup collapses it), the
    * near mass exercises the capped LSH/bucket generators. Embeddings
    * get a small per-shard vector shift. Cached under /tmp; events keep
    * the LONG-nanos ts convention. */
  private def synthesizeSf1(spark: SparkSession, sfDir: String,
                            shards: Int = 10): String = {
    import org.apache.spark.sql.functions._
    val out = "/tmp/graft_sf1"
    // versioned marker: bumping it invalidates caches synthesized with an
    // older corpus shape (v2 = exact-copy shards + lineitem/nation;
    // v3 = splittable outputs — multi-file dirs and small parquet row
    // groups, so scans parallelize instead of serializing a whole table
    // onto one core behind a single unsplittable row group;
    // v4 = row-group sizing actually applied — the v3 writer option
    // "parquet.block.size" was silently ignored by the DataFrameWriter,
    // leaving events.parquet ONE row group; it must go through the
    // hadoop conf; v5 = 512 KiB groups — the whole 1M-row events table
    // encodes to ~9 MiB, so an 8 MiB target still produced ONE group;
    // ~20 groups lets Tables.rebalance skip its compensating shuffle
    // while scans keep >= half the cores busy; v6 = orders/customer
    // shards for the q3_join relational baseline)
    val marker = new java.io.File(out, "_SYNTH_DONE_v6")
    val hconf = spark.sparkContext.hadoopConfiguration
    if (!marker.exists()) {
      val prevBlock = hconf.get("parquet.block.size")
      hconf.setInt("parquet.block.size", 512 * 1024)
      try {
      val sh = spark.range(shards).select(col("id").as("shard"))
      Tables.documents(spark, sfDir).crossJoin(sh).select(
        (col("doc_id") + col("shard") * 100000000L).as("doc_id"),
        when(col("shard") <= 3, col("text"))
          .otherwise(concat(col("text"), lit(" shard"), col("shard"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      Tables.embeddings(spark, sfDir).crossJoin(sh).select(
        (col("vec_id") + col("shard") * 100000000L).as("vec_id"),
        transform(col("embedding"),
          v => v + col("shard").cast("float") * lit(0.001f)).as("embedding"),
        col("label"))
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      // events must land as ONE real parquet FILE (not a Spark output
      // dir): the stream gate's single-micro-batch ordering contract and
      // its `{events.parquet}` glob both assume the driver's file layout
      val evTmp = s"$out/events_tmp"
      Tables.events(spark, sfDir).crossJoin(sh).select(
        (col("event_id") + col("shard") * 1000000000L).as("event_id"),
        col("ts_ns").as("ts"), // keep the driver's LONG-nanos convention
        (col("user_id") + col("shard") * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
        // one file (the stream gate's layout contract) but SMALL row
        // groups (512 KiB via the hadoop conf above): parquet only splits
        // at row-group boundaries, so a single 500MB-buffer group would
        // serialize every events scan onto one task no matter what
        // maxPartitionBytes says
        .coalesce(1).write.mode("overwrite")
        .parquet(evTmp)
      val part = new java.io.File(evTmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(evTmp).listFiles().foreach(_.delete())
      new java.io.File(evTmp).delete()
      // lineitem ×shards with remapped order keys (q1_agg is a scan-agg,
      // but keep keys disjoint anyway); nation is a 25-row dim — copied
      // unscaled, as a real deployment would
      Tables.lineitem(spark, sfDir).crossJoin(sh).select(
        (col("l_orderkey") + col("shard") * 1000000000L).as("l_orderkey") +:
        Tables.lineitem(spark, sfDir).columns.filter(_ != "l_orderkey")
          .map(col).toSeq: _*)
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      // orders ×shards with order keys remapped to stay joinable to the
      // lineitem shards above; customer keys remap the same way so the
      // q3 join fans out realistically (each shard its own key range)
      Tables.orders(spark, sfDir).crossJoin(sh).select(
        (col("o_orderkey") + col("shard") * 1000000000L).as("o_orderkey"),
        (col("o_custkey") + col("shard") * 100000000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      Tables.customer(spark, sfDir).crossJoin(sh).select(
        (col("c_custkey") + col("shard") * 100000000L).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/nation.parquet"),
        java.nio.file.Paths.get(s"$out/nation.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      marker.createNewFile()
      } finally {
        if (prevBlock == null) hconf.unset("parquet.block.size")
        else hconf.set("parquet.block.size", prevBlock)
      }
    }
    out
  }

  /** sf10 corpus: 100 shards of sf0.1 documents/embeddings = 500k docs /
    * 200k vectors — one decade above the sf1 rehearsal, two above
    * verification scale. Shape matters as much as count: naively copying
    * 100 shards of near-identical text would multiply the DUPLICATION
    * factor (100-wide duplicate groups → quadratic candidate-pair growth
    * inside each LSH bucket), which is a different — and unrealistic —
    * workload from a 10× larger crawl. Instead the 100 shards form 10
    * content BLOCKS: a per-block letter rotation rewrites nearly every
    * shingle (blocks are mutually dissimilar), while within each block
    * the sf1 crawl-duplication shape repeats exactly (4 byte-identical
    * copies + 6 single-trailing-token variants). The corpus grows 10× in
    * DISTINCT documents at constant duplication factor — how a real
    * crawl scales. Embeddings likewise: a block-dependent sign-flip
    * pattern makes cross-block vectors near-orthogonal while the small
    * within-block shift keeps the 10-wide near-dup groups. */
  private def synthesizeSf10(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val out = "/tmp/graft_sf10"
    val marker = new java.io.File(out, "_SYNTH_DONE_v1")
    if (!marker.exists()) {
      val shards = 100
      val sh = spark.range(shards).select(col("id").as("shard"))
      val block = (col("shard") / 10).cast("int")
      val pos = (col("shard") % 10).cast("int")
      // 10 distinct rotations of a 10-letter alphabet: block b translates
      // via the alphabet rotated by b, so most characters (and therefore
      // most shingles) differ between blocks; rotation 0 is the identity
      val alpha = "aeiounrsth"
      val rotated = (1 until 10).foldLeft(col("text")) { (acc, b) =>
        when(block === b,
          translate(col("text"), alpha, alpha.drop(b) + alpha.take(b)))
          .otherwise(acc)
      }
      Tables.documents(spark, sfDir).crossJoin(sh).select(
        (col("doc_id") + col("shard") * 100000000L).as("doc_id"),
        when(pos <= 3, rotated)
          .otherwise(concat(rotated, lit(" shard"), pos)).as("text"),
        col("lang"), col("source"), col("n_chars"))
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      // cross-block dissimilarity via deterministic per-block sign flips
      // (random-ish half-dim flips → near-orthogonal across blocks,
      // norms preserved); within-block near-dup groups via the sf1-style
      // small additive shift
      Tables.embeddings(spark, sfDir).crossJoin(sh).select(
        (col("vec_id") + col("shard") * 100000000L).as("vec_id"),
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (v, i) => {
            val flip = when(((i + lit(1)) * (block + lit(2))) % 7 < 3,
              lit(-1.0f)).otherwise(lit(1.0f))
            (v * flip + (col("shard") % 10).cast("float") * lit(0.001f))
              .cast("float")
          }).as("embedding"),
        col("label"))
        .repartition(shards)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      marker.createNewFile()
    }
    out
  }

  /** sf100 corpus: 1000 shards of sf0.1 documents = 5M docs, one decade
    * above sf10, built the same shard way — 100 content blocks of 10
    * shards each. 100 mutually-dissimilar blocks need 100 distinct
    * character maps, so the translation composes TWO rotations over
    * disjoint 10-letter alphabets (block%10 rotates the first,
    * block/10 the second → 10×10 distinct maps); within each block the
    * sf1 crawl-duplication shape repeats exactly (4 byte-identical
    * copies + 6 single-trailing-token variants), so the corpus grows
    * 10× in DISTINCT documents at constant duplication factor. */
  private def synthesizeSf100(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val out = "/tmp/graft_sf100"
    val marker = new java.io.File(out, "_SYNTH_DONE_v1")
    if (!marker.exists()) {
      val shards = 1000
      val sh = spark.range(shards).select(col("id").as("shard"))
      val block = (col("shard") / 10).cast("int")
      val pos = (col("shard") % 10).cast("int")
      val alpha1 = "aeiounrsth"
      val alpha2 = "dlcmfwypbg"
      // ONE flat 100-branch CaseWhen, each branch a double-translate of
      // the ORIGINAL text. A nested fold (rot(rot(text,…),…)) would put
      // the whole inner when-tree in BOTH branches of every outer when —
      // 2^20 expression nodes, and codegen's common-subexpression walk
      // never returns (observed: the first sf100 synth attempt hung a
      // shuffle-exchange thread inside EquivalentExpressions for 5+ min)
      val rotated = (1 until 100).foldLeft(when(lit(false), col("text"))) {
        (acc, b) =>
          val t1 = alpha1.drop(b % 10) + alpha1.take(b % 10)
          val t2 = alpha2.drop(b / 10) + alpha2.take(b / 10)
          acc.when(block === b,
            translate(translate(col("text"), alpha1, t1), alpha2, t2))
      }.otherwise(col("text"))
      Tables.documents(spark, sfDir).crossJoin(sh).select(
        (col("doc_id") + col("shard") * 100000000L).as("doc_id"),
        when(pos <= 3, rotated)
          .otherwise(concat(rotated, lit(" shard"), pos)).as("text"),
        col("lang"), col("source"), col("n_chars"))
        .repartition(shards / 4)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      marker.createNewFile()
    }
    out
  }

  /** One more decade of measured scale curve for the two most expensive
    * sf10 queries (near-dup verify, substring dedup): single-trial spot
    * run at sf100 (5M docs). The check is near-linearity — each query
    * should land within ~10× its sf10 wall-time. */
  private def sf100Spot(spark: SparkSession, sfDir: String,
                        forced: Boolean): (String, String) = {
    // CHEAP-FIRST order (r13): the driver run reaches this section with
    // a small remaining budget, so the queries carrying the SUBLINEARITY
    // claims (snapshot bloom 3.4×, line-dedup 2.7× at 10× data — the
    // micro-spot VERDICT r12 #4 asked to land in the artifact) run
    // first at ~20 s each; the 250-340 s exhaustive heavies
    // (dedup_verified's pair verify, substring's window explode) run
    // only when the wall allows — their sf100 points are already three
    // rounds deep in NOTES.
    val names = Seq("dedup_snapshot", "dedup_lines",
      "dedup_snapshot_fuzzy", "decontaminate_fuzzy",
      "dedup_verified", "dedup_substring")
    val dir = synthesizeSf100(spark, sfDir)
    reclaim(spark)
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val timed = names.flatMap { n =>
      SparkEntry.queries.get(n).flatMap { fn =>
        // per-query deadline check (bypassed when `sf100` was an
        // explicit arg — standalone runs own their wall clock)
        if (!forced && remainingS < estSf100Query.getOrElse(n, 400.0)) {
          System.err.println(f"[bench:sf100] $n skipped (budget: ${remainingS}%.0fs left)")
          skipped += n
          None
        } else {
          reclaim(spark) // same retained-heap guard as the sf10 section
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench:sf100] $n failed: ${e.getMessage}"); false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench:sf100] $n%-18s $dt%8.2fs${if (ok) "" else "  FAILED"}")
          Some((n, dt, ok))
        }
      }
    }
    val nDocs = Tables.documents(spark, dir).count()
    val qj = timed.map { case (n, t, ok) =>
      "\"" + n + "\":" + (if (ok) f"$t%.3f" else "null")
    }.mkString("{", ",", "}")
    val total = timed.filter(_._3).map(_._2).sum
    val failed = timed.count(!_._3)
    val skipJson =
      if (skipped.isEmpty) ""
      else skipped.map("\"" + _ + "\"")
        .mkString(""","skipped":[""", ",", "]")
    (f""""sf100_spot":{"dir":"$dir","shards":1000,"rows":{"documents":$nDocs},"queries":$qj,"total":$total%.3f,"failed":$failed$skipJson}""",
     f""""sf100_total":$total%.3f,"sf100_failed":$failed""")
  }

  /** Single-trial spot-run of the dedup/ANN family at sf10 — the 100 TB
    * story is argued from bucketed-by-design kernels; this adds one more
    * decade of measured curve (sf0.1 → sf1 → sf10) as evidence. The
    * families whose scale behavior is non-obvious run here (candidate
    * generation, iterative CC, ANN) plus the flagship training-data
    * compositions over the same 100-shard document corpus (llm_prep's
    * dedup shuffle, decontaminate's broadcast-gram join, seq_pack's
    * per-shard windows); the rest of the suite has its sf1 point. */
  private def sf10Section(spark0: SparkSession, cpus: String, sfDir: String,
                          sf1Times: Map[String, Double],
                          reserveS: Double): (String, String, SparkSession) = {
    // PRIORITY order, not family order: the per-query deadline guard
    // truncates the TAIL, so a budget squeeze drops the least
    // informative queries first (the r11 validation run lost
    // dedup_verified to a 131 s dedup_ngram placed ahead of it).
    // Three tiers (VERDICT r12 #1b):
    //   1. text_quality warm-up + the four mandated flagship entries +
    //      the ANN family;
    //   2. EVERY round-new operator (r12 sketch/ingest family + r13
    //      additions) — these had zero sf10 points in the r12 driver
    //      artifact because they sat BEHIND the legacy heavies whose
    //      sf10 points were already three rounds deep;
    //   3. medium legacy, then the expensive exhaustive fallbacks
    //      (ngram's inverted index, simhash's fat buckets, substring's
    //      window explode) last.
    // text_quality leads NOT for priority but as the warm-up: a cheap
    // full-corpus scan absorbs the fresh context's first-read cost so
    // it doesn't land inside the flagship's timing.
    val tier1 = Seq(
      "text_quality",
      "dedup_verified", "dedup_clusters_verified",
      "decontaminate_fuzzy", "dedup_lines",
      "ann_cosine", "ann_lsh", "ann_ivf", "emb_stats")
    val tierNew = Seq(
      "dedup_snapshot", "dedup_snapshot_fuzzy", "ngram_hot",
      "quality_classifier", "token_budget", "corpus_stats",
      "cluster_topics", "sample_shuffle", "sample_perplexity",
      "tokenize_bpe", "token_budget_bpe")
    val tierMid = Seq(
      "dedup_exact", "dedup_canonical", "dedup_semantic", "dedup_url",
      "dedup_keep_best", "llm_prep", "decontaminate",
      "decontaminate_semantic", "contamination_report",
      "text_repetition", "text_fingerprint",
      "sample_stratified", "seq_pack", "lm_score", "quality_gopher",
      "tfidf_topk")
    val tierHeavy = Seq(
      "dedup_minhash", "emb_neardup",
      "dedup_clusters", "dedup_simhash",
      "dedup_substring", "dedup_substring_removal", "dedup_ngram")
    val names = tier1 ++ tierNew ++ tierMid ++ tierHeavy
    // Context restarts BEFORE the accumulation-sensitive heavies
    // (VERDICT r12 #1a/#7): the in-section inflation (clusters 161-179 s
    // vs ~40 s standalone; minhash 91 vs ~20 — with NO iterative loop)
    // tracks accumulated section state, so each 2-3-heavy block starts
    // in a fresh SparkContext (~15 s each; shuffle dirs, block manager
    // and broadcast state all reset — JIT warmth stays in the JVM).
    val restartBefore = Set("dedup_minhash", "dedup_clusters",
      "dedup_substring")
    // per-query wall-cost estimate for the deadline guard: the query's
    // OWN measured sf1 time from the section that just ran, scaled by
    // the 10x data factor plus a 30% margin, clamped to [60, 300] s
    // (fixed overhead floors small queries). Queries without an sf1
    // point keep a conservative flat 160. The guard also holds back
    // `reserveS` for the sf100 micro-spot that follows this section
    // (VERDICT r12 #4: the spot is worth two sf10 tail queries).
    def needS(n: String): Double =
      sf1Times.get(n).map(t => (t * 13.0).max(60.0).min(300.0))
        .getOrElse(160.0)
    var spark = spark0
    val sf10Dir = synthesizeSf10(spark, sfDir)
    reclaim(spark)
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val timed = names.flatMap { n =>
      SparkEntry.queries.get(n).flatMap { fn =>
        // per-query deadline guard: section-ENTRY gating is not enough —
        // the r11 driver-simulation run measured this section at 763 s
        // against a 380 s clean estimate. Skip the tail loudly rather
        // than blow the budget (or eat the sf100 micro-spot's reserve).
        if (remainingS - reserveS < needS(n)) { skipped += n; None }
        else Some(fn)
      }.map { fn =>
        if (restartBefore(n)) {
          spark.stop()
          spark = buildSession(cpus)
          // absorb the fresh context's first-read cost outside the
          // timed window (same role text_quality plays at section entry)
          try Tables.documents(spark, sf10Dir).limit(32).count()
          catch { case _: Throwable => }
        }
        // deterministic reclaim between queries — see `reclaim`
        reclaim(spark)
        val t0 = System.nanoTime()
        val ok = try {
          fn(spark, sf10Dir).write.format("noop").mode("overwrite").save(); true
        } catch { case e: Throwable =>
          System.err.println(s"[bench:sf10] $n failed: ${e.getMessage}"); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench:sf10] $n%-18s $dt%8.2fs${if (ok) "" else "  FAILED"}")
        (n, dt, ok)
      }
    }
    val nDocs = Tables.documents(spark, sf10Dir).count()
    val nEmb = Tables.embeddings(spark, sf10Dir).count()
    val qj = timed.map { case (n, t, ok) =>
      "\"" + n + "\":" + (if (ok) f"$t%.3f" else "null")
    }.mkString("{", ",", "}")
    val total = timed.filter(_._3).map(_._2).sum
    val failed = timed.count(!_._3)
    val worst = timed.filter(_._3).sortBy(-_._2).take(3)
      .map { case (n, t, _) => "\"" + n + f"""\":$t%.3f""" }.mkString("{", ",", "}")
    val skipJson =
      if (skipped.isEmpty) ""
      else skipped.map("\"" + _ + "\"")
        .mkString(""","skipped":[""", ",", "]")
    (f""""sf10":{"dir":"$sf10Dir","shards":100,"rows":{"documents":$nDocs,"embeddings":$nEmb},"queries":$qj,"total":$total%.3f,"failed":$failed$skipJson}""",
     f""""sf10_total":$total%.3f,"sf10_failed":$failed,"sf10_worst":$worst""",
     spark)
  }

  /** The curated sf1 rehearsal subset (r12): the join/agg/stateful/
    * iterative shapes whose scale behavior is NOT a linear extrapolation
    * of their sf0.1 medians — every sf10-section query (so the sf10
    * deadline guard has a measured per-query sf1 anchor) plus the core
    * relational/streaming compositions. The r11 section ran all 189
    * queries (399 s), but ~160 of them are scan-bound projections whose
    * sf1 point is just 10x their sf0.1 median — information the main
    * loop already has — and that spend starved the sf10 section out of
    * the driver artifact two rounds running (VERDICT r11 #1). */
  private val sf1Names = Seq(
    // flagship + relational core
    "llm_prep", "pipeline_e2e", "q1_agg", "q3_join", "skew_join",
    "window_agg", "session_window", "stream_llm_prep",
    "stream_dedup_snapshot", "stream_dedup_snapshot_fuzzy",
    "stream_cluster_topics", "stream_corpus_stats",
    // dedup family (candidate generation, iterative CC, anti-joins)
    "dedup_exact", "dedup_canonical", "dedup_minhash", "dedup_verified",
    "dedup_clusters_verified", "dedup_clusters", "dedup_simhash",
    "dedup_ngram", "dedup_substring", "dedup_substring_removal",
    "dedup_lines", "dedup_semantic", "dedup_url", "dedup_snapshot",
    "dedup_snapshot_fuzzy",
    // decontamination + sampling/packing
    "decontaminate", "decontaminate_fuzzy", "decontaminate_semantic",
    "contamination_report", "sample_stratified", "sample_shuffle",
    "sample_domain_mix", "sample_perplexity", "seq_pack", "chunk_tokens",
    "dedup_keep_best",
    // ANN / embeddings
    "ann_cosine", "ann_lsh", "ann_ivf", "emb_neardup", "emb_stats",
    "cluster_topics",
    // text-analysis aggregations and model scoring
    "tfidf_topk", "lm_score", "quality_classifier", "quality_gopher",
    "quality_calibration", "token_budget", "corpus_stats", "ngram_hot",
    "text_quality", "text_repetition", "text_fingerprint",
    "tokenize_bpe", "token_budget_bpe")

  /** One bench pass of the curated sf1 subset at the synthesized sf1
    * scale — the families whose scale behavior is non-obvious get a
    * recorded data point one decade above verification scale, so a
    * scale cliff surfaces here instead of in production. Single trial
    * each (the medians come from the main sf0.1 loop); the point is
    * no-OOM/no-pathology completion and the timing curve vs sf0.1.
    * Also returns the per-query wall times — the sf10 section derives
    * its per-query deadline guards from them. */
  private def sf1Section(spark: SparkSession, sfDir: String)
      : (String, String, Map[String, Double]) = {
    val names = sf1Names
    val sf1Dir = synthesizeSf1(spark, sfDir)
    // the section runs after ~700 query executions in this JVM — shed
    // cached blocks and give the old gen a chance to compact so the
    // 10x-scale timings measure the plans, not accumulated heap state
    reclaim(spark)
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val timed = names.flatMap { n =>
      SparkEntry.queries.get(n).flatMap { fn =>
        // per-query deadline guard (see sf10Section): truncate the tail
        // loudly instead of running the whole bench past the wall
        if (remainingS < 120) { skipped += n; None } else Some(fn)
      }.map { fn =>
        reclaim(spark) // same retained-heap guard as the sf10 section
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sf1Dir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench:sf1] $n failed: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench:sf1] $n%-18s $dt%8.2fs${if (ok) "" else "  FAILED"}")
        (n, dt, ok)
      }
    }
    val nDocs = Tables.documents(spark, sf1Dir).count()
    val nEmb = Tables.embeddings(spark, sf1Dir).count()
    val nEv = Tables.events(spark, sf1Dir).count()
    val qj = timed.map { case (n, t, ok) =>
      "\"" + n + "\":" + (if (ok) f"$t%.3f" else "null")
    }.mkString("{", ",", "}")
    val total = timed.filter(_._3).map(_._2).sum
    val failed = timed.count(!_._3)
    val worst = timed.filter(_._3).sortBy(-_._2).take(5)
      .map { case (n, t, _) => "\"" + n + f"""\":$t%.3f""" }.mkString("{", ",", "}")
    val skipJson =
      if (skipped.isEmpty) ""
      else skipped.map("\"" + _ + "\"")
        .mkString(""","skipped":[""", ",", "]")
    (f""""sf1":{"dir":"$sf1Dir","shards":10,"rows":{"documents":$nDocs,"embeddings":$nEmb,"events":$nEv},"queries":$qj,"total":$total%.3f,"failed":$failed$skipJson}""",
     f""""sf1_total":$total%.3f,"sf1_failed":$failed,"sf1_worst":$worst""",
     timed.filter(_._3).map { case (n, t, _) => n -> t }.toMap)
  }

  /** Parse the parent's sf1-times handoff file ({"query":secs,...}). */
  private def readTimes(path: String): Map[String, Double] = try {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    om.readTree(new java.io.File(path)).fields().asScala
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
  } catch { case _: Throwable => Map.empty }

  /** Child-JVM entry for the scale sections (VERDICT r12 #1/#7): the
    * r12 driver artifact measured dedup_verified at 103 s inside the
    * section vs 31.5 s standalone on the SAME binary — and the r12
    * falsification runs showed a fresh SparkCONTEXT does not clear it
    * (the accumulation is JVM-level: old-gen shape after ~1000 query
    * executions). A fresh child JVM is the state the standalone
    * methodology measures, so the driver artifact's numbers become
    * reproducible standalone numbers by construction. The child
    * inherits the parent's exact JVM flags and classpath; its wall
    * budget arrives via SPARK_GRAFT_BUDGET_S (benchStart is process
    * start, so the child's own per-query deadline guards just work). */
  private def runChild(mode: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf1Times = sys.env.get("SPARK_GRAFT_SF1TIMES")
      .map(readTimes).getOrElse(Map.empty)
    val spark = buildSession(cpus)
    mode match {
      case "child_sf10" =>
        val (full, short, s2) = sf10Section(spark, cpus, sfDir, sf1Times, 0.0)
        println("@@FULL@@" + full)
        println("@@SHORT@@" + short)
        s2.stop()
      case "child_sf100" =>
        val (full, short) = sf100Spot(spark, sfDir, forced = false)
        println("@@FULL@@" + full)
        println("@@SHORT@@" + short)
        spark.stop()
      case other =>
        System.err.println(s"[bench] unknown child mode $other")
        sys.exit(2)
    }
  }

  /** Fork a child JVM running `runChild(mode)` with `budget` seconds of
    * wall allowance; returns its (full, short) JSON fragments. The
    * child gets the parent's own java binary, JVM args (--add-opens,
    * -Xmx) and classpath; stderr streams through live so the driver
    * log keeps the per-query lines. A hard watchdog at budget+180 s
    * kills a wedged child — the parent's remaining sections still
    * report. Returns None on fork failure / crash / missing markers. */
  private def forkChild(mode: String, budget: Double,
                        sf1TimesPath: Option[String]): Option[(String, String)] = {
    import scala.jdk.CollectionConverters._
    try {
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xdebug") ||
          a.startsWith("-Xrunjdwp"))
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench", mode)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().put("SPARK_GRAFT_BUDGET_S", f"$budget%.0f")
      sf1TimesPath.foreach(p => pb.environment().put("SPARK_GRAFT_SF1TIMES", p))
      val proc = pb.start()
      val outLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def pump(in: java.io.InputStream, sink: String => Unit): Thread = {
        val t = new Thread(() => {
          val br = new java.io.BufferedReader(new java.io.InputStreamReader(in))
          var line = br.readLine()
          while (line != null) { sink(line); line = br.readLine() }
        })
        t.setDaemon(true); t.start(); t
      }
      val errT = pump(proc.getErrorStream, System.err.println)
      val outT = pump(proc.getInputStream, l => { outLines.add(l); () })
      val finished = proc.waitFor((budget + 180).toLong,
        java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) {
        System.err.println(s"[bench] child $mode overran its watchdog; killing")
        proc.destroyForcibly()
        proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      }
      outT.join(3000); errT.join(3000)
      val lines = outLines.asScala.toSeq
      val full = lines.collectFirst {
        case l if l.startsWith("@@FULL@@") => l.substring(8) }
      val short = lines.collectFirst {
        case l if l.startsWith("@@SHORT@@") => l.substring(9) }
      val rc = proc.exitValue()
      (full, short) match {
        case (Some(f), Some(s)) if rc == 0 => Some((f, s))
        case _ =>
          System.err.println(
            s"[bench] child $mode rc=$rc markers=${full.nonEmpty}/${short.nonEmpty}")
          None
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] child fork failed: ${e.getMessage}"); None
    }
  }

  private def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // test parquet is a handful of ~10-30MB files; the 128MB default
      // split size would serialize every scan onto one core. At cluster
      // scale the default is right — this mirrors having many input
      // files. 512k matches the synth corpora's row-group size, so
      // byte-range splits land on group boundaries and a ~10MB table
      // still spreads across ~20 cores without a rebalance shuffle.
      .config("spark.sql.files.maxPartitionBytes", "512k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    if (args.length == 1 && args(0).startsWith("child_")) {
      runChild(args(0)); return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 2 trials (r12; was 3, originally 5): with the warm-up run every
    // query still executes 3×, and the shed execution per query buys
    // the sf10 section ~200 s — the r11 run spent ~700 s on the main
    // loop + trial and then skipped sf10 on budget for the second
    // round running (VERDICT r11 #1). median-of-2 = midpoint; the
    // trials[] array still exposes the spread per query.
    val nTrials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val spark = buildSession(cpus)
    // warm the JVM/codegen once so per-query numbers measure the plan,
    // not first-call classloading
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // optional args = subset of query names (local iteration aid)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(q => args.contains(q._1))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val trials = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      // one UNTIMED warm-up run per query: JIT/codegen/classload of the
      // query's own kernels otherwise lands in trial 1 and — because the
      // warm-up curve is monotone — drags the median (observed: a
      // regex+JSON kernel at 14.8s cold vs 1.6s steady). The reference's
      // methodology likewise measures only warmed trials.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => failed = true }
      var i = 0
      // contention guard: on a clean host the whole main loop fits well
      // under 40% of the budget, but a contended host inflates it up to
      // 3x (NOTES_r10) — shed to single-trial rather than starve the
      // scale sections (the trials[] array shows the reduced count).
      // The ~160 queries OUTSIDE the curated sf1 subset are stable
      // scan-bound projections (sub-second, MAD ≈ 0 every round) — one
      // warmed trial each (r13): the shed execution buys the scale
      // sections ~80 s without losing information the medians carry.
      val qTrials =
        if (args.isEmpty && (elapsedS > budgetS * 0.4 ||
          !sf1Names.contains(name))) 1
        else nTrials
      while (i < qTrials && !failed) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed = true
        }
        if (!failed) trials += (System.nanoTime() - t0) / 1e9
        i += 1
      }
      val (med, mad) = medMad(trials.toSeq)
      System.err.println(
        f"[bench] $name%-22s median $med%8.2fs  mad $mad%6.3fs  (${trials.size} trials)")
      (name, med, mad, trials.toSeq)
    }
    val qs = results.map { case (k, m, _, _) => "\"" + k + f"""\":$m%.3f""" }
      .mkString("{", ",", "}")
    val qstats = results.map { case (k, m, mad, ts) =>
      "\"" + k + "\":{\"median\":" + f"$m%.3f" + ",\"mad\":" + f"$mad%.3f" +
        ",\"trials\":" + fmtTrials(ts) + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // BASELINE.md anchor: end-to-end msgs/sec through the full ingest→
    // parse→filter→template pipeline (the 524,288-msg trial shape)
    val e2eRate = try {
      val nMsgs = Tables.events(spark, sfDir).count()
      val secs = results.collectFirst { case ("pipeline_e2e", m, _, _) => m }
        .getOrElse(Double.NaN)
      if (secs > 0) nMsgs / secs else 0.0
    } catch { case _: Throwable => 0.0 }
    // BASELINE.md trial shape: 524,288 sequenced messages through the full
    // decode→filter→template→agg hot path. The input is materialized
    // (cached + counted) before the clock starts — the reference's
    // tcpflood generator also runs outside the measured engine — so this
    // measures sustained engine throughput, not per-query fixed overhead.
    // Repeated nTrials times over the SAME cached input; rate = median.
    val trialRates = try {
      import org.apache.spark.sql.functions._
      val nTrial = 524288L
      val raw = Queries.synthSyslog(spark, sfDir).select(col("rawmsg").as("value"))
      val nBase = math.max(1L, raw.count())
      val factor = ((nTrial + nBase - 1) / nBase).toInt
      val input = Seq.fill(factor)(raw).reduce(_ union _).limit(nTrial.toInt)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val actual = input.count()
      val decoded = graft.sources.Sources.decodeSyslog(input)
      val sevNames = array(Seq("emerg", "alert", "crit", "err", "warning",
        "notice", "info", "debug").map(lit): _*)
      val shaped = decoded
        .filter(graft.functions.rainer.prifilt("*.warning")(col("facility"), col("severity")))
        .withColumn("line", concat(
          date_format(col("ts"), "MMM "),
          lpad(date_format(col("ts"), "d"), 2, " "),
          date_format(col("ts"), " HH:mm:ss "),
          col("hostname"), lit(" "),
          col("syslogtag"), lit(" "),
          element_at(sevNames, col("severity") + 1), lit(":"), col("msg")))
        .groupBy(col("hostname"))
        .agg(count(lit(1)).as("n"), max(length(col("line"))).as("max_len"))
      val rates = (1 to nTrials).map { _ =>
        val t0 = System.nanoTime()
        shaped.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        actual / dt
      }
      input.unpersist()
      val (m, mad) = medMad(rates)
      System.err.println(
        f"[bench] trial_524288          median $m%.0f msgs/s  mad $mad%.0f  (${rates.size} trials)")
      rates
    } catch { case e: Throwable =>
      System.err.println(s"[bench] trial failed: ${e.getMessage}"); Seq.empty[Double]
    }
    val (trialMed, trialMad) = medMad(trialRates)
    // side-by-side reference anchor: benchmarks/ref_anchor/RESULTS.md
    // documents the attempt to build/run the reference engine on this
    // host; when a measured msgs/s exists it lands in ref_anchor.json as
    // {"ref_msgs_per_sec": N} and the ratio becomes a measurement.
    val anchorFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_ANCHOR", "benchmarks/ref_anchor/ref_anchor.json"))
    val refRate: Option[Double] =
      if (anchorFile.isFile) {
        val txt = scala.io.Source.fromFile(anchorFile).mkString
        "\"ref_msgs_per_sec\"\\s*:\\s*([0-9.eE+]+)".r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
      } else None
    val ratioJson = refRate match {
      case Some(r) if r > 0 =>
        f""""baseline_ratio":${trialMed / r}%.3f,"baseline_anchor":"measured","ref_msgs_per_sec":$r%.0f"""
      case _ =>
        """"baseline_ratio":1.0,"baseline_anchor":"assumed""""
    }
    // Host-speed calibration (VERDICT r12 #1): the 524k-trial rate on
    // FROZEN ingest code, ratioed against the r11 uncontended anchor,
    // names today's host factor explicitly so cross-round absolute
    // comparisons can be ratio-corrected (r12's artifact carried a ~2×
    // contended host and its absolutes were misread as regressions).
    val hostJson =
      f""""host_ref_msgs_per_sec":$hostRefMsgsPerSec%.0f,"host_factor":${if (trialMed > 0) hostRefMsgsPerSec / trialMed else 0.0}%.3f"""
    // Scale sections in MUST-HAVE order (sf1 → sf10 → sf100), each
    // gated on the remaining wall-clock budget: a section whose
    // clean-run cost estimate no longer fits is skipped with a
    // "sfN_skipped":"budget" marker instead of running the whole bench
    // into the driver's hard timeout (BENCH_r10: rc 124, everything
    // lost). After each section a cumulative {"metric":"progress"} line
    // goes to stdout so a kill mid-way still leaves the completed
    // sections parseable in the driver's output tail.
    def progress(fields: String): Unit =
      println(f"""{"metric":"progress","elapsed_s":$elapsedS%.1f,"budget_s":$budgetS%.0f,"value":$total%.3f,"unit":"sec","trial_msgs_per_sec":$trialMed%.0f,$hostJson,$ratioJson$fields}""")
    // FRESH SparkContext for the sf1 section (r11): ~1000 query
    // executions leave the first context with shuffle-file and
    // block-manager accumulation that reclaim() cannot fully shed.
    // Stopping the context deletes its shuffle dirs and broadcast
    // state; JIT/codegen warmth stays in the JVM. Costs ~15 s.
    val sparkScale =
      if (args.isEmpty || args.exists(Set("sf1", "sf10", "sf100"))) {
        spark.stop()
        buildSession(cpus)
      } else spark
    // standalone path only: tracks the latest session across the
    // in-process sf10 section's internal restarts
    var sparkScaleFinal: SparkSession = sparkScale
    // sf1 scale rehearsal (skipped during single-query local iteration or
    // with SPARK_GRAFT_SF1=off; `sf1` as an explicit arg forces it — the
    // local-iteration aid for the scale sections themselves)
    val (sf1Json, sf1Summary, sf1Times) =
      if ((args.nonEmpty && !args.contains("sf1")) ||
          sys.env.get("SPARK_GRAFT_SF1").contains("off"))
        ("", "", Map.empty[String, Double])
      else if (args.isEmpty && remainingS < estSf1) {
        System.err.println(f"[bench:sf1] skipped (budget: ${remainingS}%.0fs left, need ~${estSf1}%.0f)")
        (""","sf1_skipped":"budget"""", ""","sf1_skipped":"budget"""",
          Map.empty[String, Double])
      } else try {
        reclaim(sparkScale)
        val (full, short, times) = sf1Section(sparkScale, sfDir)
        ("," + full, "," + short, times)
      } catch { case e: Throwable =>
        System.err.println(s"[bench:sf1] section failed: ${e.getMessage}")
        ("", "", Map.empty[String, Double])
      }
    if (args.isEmpty) progress(sf1Summary)
    // sf10 and sf100 run in FRESH CHILD JVMs on the driver path
    // (VERDICT r12 #1/#7): the r12 falsification showed the in-section
    // inflation (dedup_verified 103 s in-artifact vs 31.5 s standalone)
    // survives a SparkContext restart — it is JVM-level accumulated
    // state, so only a new JVM yields the standalone numbers the gate
    // should read. The sf100 micro-spot gets a RESERVE carved out of
    // the sf10 child's budget (VERDICT r12 #4: worth two sf10 tail
    // queries); the reserve is small when the /tmp synth cache is warm
    // (the corpus survives between driver rounds on this host).
    val childStartS = 30.0
    val sf100Cached =
      new java.io.File("/tmp/graft_sf100/_SYNTH_DONE_v1").exists()
    val sf100NeedS =
      (if (sf100Cached) 0.0 else estSf100Synth) + childStartS +
        estSf100Query("dedup_snapshot") + estSf100Query("dedup_lines")
    val isDriverRun = args.isEmpty
    if (isDriverRun) {
      // children own the host's cores and memory from here; the parent
      // only aggregates JSON
      sparkScale.stop()
    }
    val timesPath: Option[String] =
      if (!isDriverRun || sf1Times.isEmpty) None
      else try {
        val p = java.nio.file.Paths.get("/tmp/graft_sf1times.json")
        val body = sf1Times.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
          .mkString("{", ",", "}")
        java.nio.file.Files.write(p, body.getBytes("UTF-8"))
        Some(p.toString)
      } catch { case _: Throwable => None }
    val (sf10Json, sf10Summary) =
      if ((args.nonEmpty && !args.contains("sf10")) ||
          sys.env.get("SPARK_GRAFT_SF10").contains("off")) ("", "")
      else if (isDriverRun && remainingS < estSf10 + childStartS) {
        System.err.println(f"[bench:sf10] skipped (budget: ${remainingS}%.0fs left, need ~${estSf10 + childStartS}%.0f)")
        (""","sf10_skipped":"budget"""", ""","sf10_skipped":"budget"""")
      } else if (isDriverRun) {
        // reserve the sf100 micro-spot's slice (guards inside the child
        // then spend freely — the reserve already left the building)
        val grant = (remainingS - sf100NeedS - 15.0).max(estSf10)
        forkChild("child_sf10", grant, timesPath)
          .map { case (f, s) => ("," + f, "," + s) }
          .getOrElse((""","sf10_child_failed":true""",
            ""","sf10_child_failed":true"""))
      } else try {
        reclaim(sparkScale)
        val (full, short, s2) =
          sf10Section(sparkScale, cpus, sfDir, sf1Times, 0.0)
        sparkScaleFinal = s2
        ("," + full, "," + short)
      } catch { case e: Throwable =>
        System.err.println(s"[bench:sf10] section failed: ${e.getMessage}"); ("", "")
      }
    if (args.isEmpty) progress(sf1Summary + sf10Summary)
    // sf100 near-linearity micro-spot LAST — in the driver path it now
    // actually RUNS (a fresh child JVM is also the coldest-JVM state
    // its single-trial methodology wants): the cheap sublinearity
    // queries land inside the reserve; the exhaustive heavies still
    // need a standalone `runMain graft.Bench sf100`.
    val (sf100Json, sf100Summary) =
      if ((args.nonEmpty && !args.contains("sf100")) ||
          sys.env.get("SPARK_GRAFT_SF100").contains("off")) ("", "")
      else if (isDriverRun && remainingS < sf100NeedS) {
        System.err.println(f"[bench:sf100] skipped (budget: ${remainingS}%.0fs left, need ~$sf100NeedS%.0f)")
        (""","sf100_skipped":"budget"""", ""","sf100_skipped":"budget"""")
      } else if (isDriverRun) {
        forkChild("child_sf100", remainingS - 10.0, None)
          .map { case (f, s) => ("," + f, "," + s) }
          .getOrElse((""","sf100_child_failed":true""",
            ""","sf100_child_failed":true"""))
      } else try {
        val s = sparkScaleFinal
        reclaim(s)
        val (full, short) = sf100Spot(s, sfDir, forced = args.nonEmpty)
        ("," + full, "," + short)
      } catch { case e: Throwable =>
        System.err.println(s"[bench:sf100] section failed: ${e.getMessage}"); ("", "")
      }
    val trialStats = "{\"median\":" + f"$trialMed%.0f" + ",\"mad\":" +
      f"$trialMad%.0f" + ",\"trials\":" +
      trialRates.map(r => f"$r%.0f").mkString("[", ",", "]") + "}"
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_stats":$qstats,"bench_trials":$nTrials,"warmup_runs":1,"sf":"$sfDir","pipeline_msgs_per_sec":$e2eRate%.0f,"trial_msgs":524288,"trial_msgs_per_sec":$trialMed%.0f,"trial_msgs_per_sec_mad":$trialMad%.0f,"trial_stats":$trialStats,$hostJson,$ratioJson$sf1Json$sf10Json$sf100Json}""")
    // compact recap AFTER the full line: the driver keeps only the last
    // few KB of stdout, and the full line's headline fields sit at its
    // FRONT — this short line guarantees they survive the tail window
    println(f"""{"metric":"summary","value":$total%.3f,"unit":"sec","sf":"$sfDir","trial_msgs_per_sec":$trialMed%.0f,"trial_msgs_per_sec_mad":$trialMad%.0f,"pipeline_msgs_per_sec":$e2eRate%.0f,$hostJson,$ratioJson$sf1Summary$sf10Summary$sf100Summary}""")
    if (!isDriverRun) sparkScaleFinal.stop()
  }
}
