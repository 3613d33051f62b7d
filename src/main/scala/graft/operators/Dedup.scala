package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.rainer

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: one hash-groupBy on a fingerprint (map-side combinable).
  *  - MinHash+LSH: shingle → k minhashes → b bands; only band-bucket
  *    groupBys shuffle (each key ~few rows), never an all-pairs join.
  *  - SimHash: one 64-bit fingerprint per doc, banded into 4×16-bit keys
  *    for candidate generation, Hamming-verified.
  *  - n-gram Jaccard: exact verification via shingle-inverted-index
  *    self-join — the expensive path, bounded by a blocking key.
  */
object Dedup {

  /** Drop the storage blocks behind a localCheckpoint'd Dataset.
    *
    * `Dataset.unpersist` only calls `CacheManager.uncacheQuery`, and a
    * checkpointed Dataset is a bare `LogicalRDD` the CacheManager has
    * never seen — so `ds.unpersist()` silently frees nothing (verified
    * against the shipped spark-sql 4.1.2). The persisted blocks belong
    * to the wrapped RDD itself; unpersist THAT. Falls back to the
    * Dataset-level call for non-checkpoint plans. */
  private[graft] def releaseLocalCheckpoint(ds: DataFrame): Unit =
    ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ds.unpersist()
    }

  /** Exact dedup on a normalized-content fingerprint: keeps the smallest
    * id per group, reports group size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Per-source dedup-impact report — the audit table a pipeline owner
    * reads after every ingest: for each source, how many documents (and
    * tokens) exact dedup removed. A crawl source with a high dup share
    * is re-fetching itself; a curated source with ANY dup share has an
    * upstream bug — this table is where both show up first.
    *
    * Keeper convention = [[exact]]'s min-id rule; a keeper is attributed
    * to ITS OWN source, so a group spanning sources charges the removal
    * to the sources that lost their copies (the standard way crawl
    * overlap is reported). dup_pct_micro is exact integer arithmetic
    * (removed·1e6 div docs) — order-free, oracle-exact.
    *
    * Scale shape: kept = `min(id) over (partition by fp)` — ONE hash
    * shuffle on the fingerprint carrying only (fp, id, source, n_tok),
    * never the text (the window's input is pre-projected); then one
    * map-side-combinable groupBy with ≤ #sources output rows. A
    * groupBy + join-back would shuffle the same bytes twice. */
  def dedupReport(df: DataFrame, idCol: String, textCol: String,
                  srcCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slim = df.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"))
    val kept = slim.withColumn("is_kept",
      col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("fp"))))
    kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("tokens_total"),
        sum(when(col("is_kept"), col("n_tok")).otherwise(0L))
          .as("tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_removed"),
        col("tokens_total"), col("tokens_kept"),
        (col("tokens_total") - col("tokens_kept")).as("tokens_removed"),
        expr("((n_docs - n_kept) * CAST(1000000 AS BIGINT)) div n_docs")
          .as("dup_pct_micro"))
  }

  /** DuckDB oracle for [[dedupReport]]: the dedup_exact fingerprint
    * mirror, min-id-over-fingerprint keeper, per-source integer tallies. */
  def dedupReportOracleSql: String =
    """WITH f AS (
      |  SELECT doc_id, source,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp,
      |    CAST(len(list_filter(string_split_regex(lower(text), '[\s\x0B]+'),
      |      x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |k AS (
      |  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_kept
      |  FROM f)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(count(*) - sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(n_tok) AS BIGINT) AS tokens_total,
      |  CAST(sum(CASE WHEN is_kept THEN n_tok ELSE 0 END) AS BIGINT)
      |    AS tokens_kept,
      |  CAST(sum(n_tok) - sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)
      |    AS BIGINT) AS tokens_removed,
      |  CAST((count(*) - sum(CASE WHEN is_kept THEN 1 ELSE 0 END))
      |    * 1000000 // count(*) AS BIGINT) AS dup_pct_micro
      |FROM k GROUP BY 1""".stripMargin

  /** Exact-duplicate resolution keeping the BEST copy of each group
    * instead of the smallest id — the crawl-snapshot policy: several
    * fetches of one page share a normalized fingerprint but differ in
    * trim/boilerplate, and the pipeline should keep the richest capture,
    * not an arbitrary one. `score` ranks copies (the caller picks the
    * policy — raw length, a quality score, a recency column); ties break
    * to the smallest id, so the selection is a deterministic total order.
    *
    * Scale shape: ONE map-side-combinable hash groupBy on the
    * fingerprint — best-copy selection is `max(struct(score, -id))`, an
    * ordinary combinable max, NOT a window (a row_number over fp would
    * shuffle the same bytes but lose the map-side combine; duplicate
    * groups are exactly the high-multiplicity keys where partial
    * aggregation pays). Requires a non-negative numeric id (the struct
    * max recovers min-id-on-tie through the negated id).
    *
    * Reference anchor: pmlastmsg's "last message repeated n times" keeps
    * one representative of a repeat run (contrib/pmlastmsg/pmlastmsg.c);
    * this is the corpus-level analogue with an explicit best-copy policy.
    */
  def keepBest(df: DataFrame, idCol: String, textCol: String,
               score: Column): DataFrame = {
    df.select(col(idCol).cast("long").as("id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"),
        score.cast("double").as("score"))
      .groupBy(col("fp"))
      .agg(max(struct(col("score").as("s"), (-col("id")).as("nid"))).as("best"),
        count(lit(1)).as("n_dups"))
      .select(col("fp"), (-col("best.nid")).as("keep_id"),
        col("best.s").as("best_score"), col("n_dups"))
  }

  /** Word n-gram shingles of a text column — native one-pass expression
    * (see ShinglesExpr: the equivalent transform/element_at HOF chain is
    * interpreted and re-evaluated per reference, ~9× slower here). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftBridge.expression(text), n))

  /** k MinHash signatures over the shingle set — single-pass custom
    * expression (each shingle hashed once, k permutations derived by
    * integer mixing; see MinHashSignatureExpr). */
  def minhashSignature(sh: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashSignatureExpr(
        org.apache.spark.sql.GraftBridge.expression(sh), k))

  /** Fused text → k-MinHash signature (NULL when the text has < n tokens):
    * value-identical to `minhashSignature(shingles(text, n), k)` but one
    * kernel — no shingle strings, no dedupe set, no array hand-off between
    * expressions (see MinHashTextExpr). */
  def minhashTextSignature(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashTextExpr(
        org.apache.spark.sql.GraftBridge.expression(text), n, k))

  /** Ordered within-bucket pair emission: group members by bucket, sort,
    * and emit every (a, b) with a < b via a nested transform. ONE shuffle
    * (the groupBy) where a bucket self-join costs two exchanges plus the
    * join build; the pair fan-out (Σ m²/2 per bucket) is inherent to
    * candidate generation. Member structs carry per-doc payloads
    * (signatures, set sizes) so downstream needs no joins back to the
    * corpus.
    *
    * `maxBucket` drops buckets above the bound (the standard stop-shingle
    * guard: a key shared by >1024 documents identifies nothing, and EXACT
    * duplicates are the exact-dedup layer's job, which has no such cap).
    * The cap is part of the operator contract: the DuckDB oracles apply
    * the same bound, so engine and oracle agree on capped corpora too.
    *
    * Pair emission is a TWO-step explode — (member, bucket) rows first,
    * then each member against its tail slice — so per-row memory is
    * O(m), never O(m²). The first cut built the whole m²/2 pair array of
    * a bucket inside ONE row before exploding; with payload-carrying
    * members (near-dup embeddings at ~300 B/struct) a bucket at the
    * 1024 cap materialized ~300 MB per row × concurrent tasks = task
    * OOM, found by the sf10 spot-run. The collect_list buffer itself
    * stays O(maxBucket·payload) for KEPT buckets; a degenerate >cap
    * bucket still buffers before the size filter — acceptable because
    * the band-key space is sized so buckets are ≤ ~10⁴ members, and the
    * buffer is linear, not quadratic, in bucket size. */
  private[operators] def bucketPairs(df: DataFrame, bucketCols: Seq[Column],
                                     member: Column, maxBucket: Int = 1024): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(sort_array(collect_list(member)).as("ms"))
      .filter(size(col("ms")) > 1 && size(col("ms")) <= maxBucket)
      .select(col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("a"), explode(
        slice(col("ms"), col("i") + lit(2), size(col("ms")) - col("i") - 1)).as("b"))
      .select(struct(col("a").as("a"), col("b").as("b")).as("p"))

  /** Label the eager jobs an operator runs at construction time
    * (checkpoint materializations, bounded counts) so a driver-run
    * bench attributes stage time to the right stage instead of one
    * opaque query entry (VERDICT r15 #2); restores the caller's
    * description afterwards. */
  private def labeled[A](df: DataFrame, label: String)(f: => A): A = {
    val sc = df.sparkSession.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try f finally sc.setJobDescription(prev)
  }

  /** LSH core shared by [[minhashLshPairs]] and [[nearDupVerified]]:
    * checkpointed signatures + distinct band-bucket candidate id pairs.
    * Banding shuffles doc ids ONLY — the 64-long signature (~0.5 KB)
    * does not ride every one of the 16 band rows. */
  private[operators] def lshCore(df: DataFrame, idCol: String,
      textCol: String, n: Int, bands: Int, rows: Int,
      maxBucket: Int): (DataFrame, DataFrame) = {
    val k = bands * rows
    // signature computation is CPU-bound (k hashes × shingles per doc);
    // a small input often arrives as 1-2 parquet partitions, which would
    // serialize the whole stage — spread it across the cluster first
    val par = df.sparkSession.sparkContext.defaultParallelism
    // fused signature kernel: shingle hashing folds straight over the
    // lowered text's token ranges (MinHashTextExpr) — no shingle strings,
    // no Filter/Project hand-off of the shingle array. NULL signature =
    // fewer than n tokens: such a doc has no content to near-match (its
    // all-MaxValue signature would collide with every short doc) — drop it.
    //
    // The signature set is consumed by THREE branches below (banding +
    // the two est-jaccard signature joins); left lazy, each branch
    // re-runs the kernel on its own map side — the physical plan builds
    // three independent scan→kernel stacks and ReuseExchange does NOT
    // dedupe them (verified on the executed plan: zero ReusedExchange
    // nodes; measured as the dominant term of the sf100 LSH stage).
    // localCheckpoint materializes the signatures ONCE. The block is
    // SIGNATURE-sized — doc id + k longs ≈ 0.5 KB/doc, ~1.8 GB at the
    // sf100 probe — not corpus-sized; at cluster scale that is the same
    // size class as the candidate-pair checkpoint this pipeline already
    // holds, and strictly cheaper than paying the shingle+hash kernel
    // twice more over every document.
    val withSig = labeled(df, "lsh: signature checkpoint") {
      df.select(col(idCol).as("doc"), col(textCol).as("t"))
        .repartition(par)
        .withColumn("sig", minhashTextSignature(col("t"), n, k))
        .filter(col("sig").isNotNull)
        .select(col("doc"), col("sig"))
        .localCheckpoint()
    }
    val banded = withSig.select(
      col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = bucketPairs(banded, Seq(col("band"), col("bucket")),
        struct(col("doc")), maxBucket)
      .select(col("p.a.doc").as("id_a"), col("p.b.doc").as("id_b"))
      .distinct()
    (cand, withSig)
  }

  /** MinHash-LSH candidate pairs: b bands of r rows (k = b*r). Docs
    * sharing any band bucket become candidates; estimated Jaccard =
    * matching-minhash fraction. Returns (id_a, id_b, est_jaccard) with
    * id_a < id_b. Two shuffles total (band-bucket groupBy + pair dedupe);
    * no all-pairs stage, no self-join.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 16, rows: Int = 4,
                      minEstJaccard: Double = 0.5,
                      maxBucket: Int = 1024): DataFrame = {
    val k = bands * rows
    val (cand, withSig) = lshCore(df, idCol, textCol, n, bands, rows, maxBucket)
    // the two signature joins attach sig_a/sig_b once per pair (the
    // checkpointed signature table serves both sides)
    cand
      .join(withSig.select(col("doc").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(withSig.select(col("doc").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          e => e)).cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Verified near-dup pairs — the DEFAULT near-dup composition at scale:
    * MinHash-LSH as the candidate *filter* (`minhashLshPairs`), exact
    * shingle-set Jaccard as the per-pair *verifier*. The exact verifier
    * only ever touches LSH survivors, so its cost scales with the
    * candidate-pair count (crawl near-dup mass), not with corpus², and no
    * inverted index is built at all — `ngramJaccardPairs` remains the
    * exhaustive recall-1 fallback when a full sweep is required.
    *
    * Shuffle profile: the LSH stages (two shuffles) + one semi-join that
    * restricts the pair join's text payload to candidate-participating
    * docs + two id-keyed joins that attach the two TEXTS once per pair.
    * Per-pair verification is the fused [[graft.functions.JaccardTextsExpr]]
    * kernel — re-shingling per pair costs ~15 µs of CPU while cutting the
    * exchange mass ~25× vs carrying shingle-string arrays (the r11 sf100
    * diagnostic; NOTES_r11.md).
    *
    * Recall: bounded by the LSH S-curve at (bands, rows) — a pair the
    * banding misses is never verified (the standard trade). There is NO
    * est-jaccard layer between banding and exact verify: the estimate
    * priced ~12 GB of signature-attach exchange at the sf100 probe to
    * prune almost nothing ahead of a verifier that recomputes exactly,
    * and as a probabilistic filter it could only LOSE true pairs. The
    * DuckDB oracle mirrors the exact composition, banding and verifier
    * both.
    */
  def nearDupVerified(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 16, rows: Int = 4,
                      minJaccard: Double = 0.5,
                      maxBucket: Int = 1024,
                      preDedup: Boolean = true): DataFrame = {
    // dedup-before-near-dup (same composition order as ngramJaccardPairs):
    // byte-identical lowered text ⟹ identical shingle set ⟹ identical
    // signature, so a d-wide exact-duplicate group would flood every one
    // of its LSH buckets with d(d-1)/2 jaccard-1.0 pairs the exact-dedup
    // layer removes for free. On the sf100 corpus (4 exact copies per
    // doc) preDedup cut the candidate mass ~2x and the shingle-join
    // payload ~2.5x. Pairs are emitted between REPRESENTATIVES (min id
    // per identical-text group) — run textMembers to map members back.
    val src =
      if (preDedup)
        df.groupBy(md5(lower(col(textCol))).as("g"))
          .agg(min(struct(col(idCol).as("doc"), col(textCol).as("t"))).as("m"))
          .select(col("m.doc").as(idCol), col("m.t").as(textCol))
      else df
    // candidates materialize once (localCheckpoint): the set is consumed
    // twice below (vertex projection + pair join) and is orders of
    // magnitude smaller than the corpus; re-deriving the LSH pipeline per
    // consumer would repeat every upstream shuffle instead. Bounded: LSH
    // survivor pairs, the same size class the clusters() probe holds.
    //
    // Band-bucket pairs go STRAIGHT to exact verification — no
    // est-jaccard middle layer (r11). The estimate stage existed to
    // prune candidates cheaply, but here a full verifier follows anyway,
    // and attaching two 64-long signatures per pair cost ~12 GB of
    // exchange at the sf100 probe to prune almost nothing (the est
    // filter is also probabilistic — it could DROP pairs whose true
    // jaccard passes minJaccard, so removing it strictly improves
    // recall at lower cost). `dedup_minhash` keeps the estimate as its
    // output contract; the oracle mirrors this exact composition.
    val cand = labeled(df, "neardup: banding + candidate checkpoint") {
      lshCore(src, idCol, textCol, n, bands, rows, maxBucket)._1
        .localCheckpoint()
    }
    // Data-dependent shuffle sizing for the verify join (r11). The pair
    // join below carries TWO shingle arrays (~2.4 KB each for 300-token
    // docs), so its exchange mass is ~5 KB × |pairs| — at the sf100
    // probe (11.7M pairs) that is ~56 GB through a session-default
    // 32-partition exchange: ~1.8 GB per SORTED partition against
    // <1 GB of per-slot execution memory. Measured: 490 s cold-JVM at
    // sf100 vs 14.5 s at sf10 — 34x wall for 10.00x counted input; the
    // spill cliff, not the plan, was the superlinearity r10 blamed on
    // heap state. Sizing the exchange so each partition holds ~25k
    // pairs (~125 MB) keeps every sort in memory at any corpus size —
    // the "size your shuffle partitions to fit executor memory" rule
    // applied adaptively. The count is one bounded job against the
    // already-materialized checkpoint; AQE still coalesces everything
    // upstream, and small corpora keep the session default.
    val defaultParts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val nCand = labeled(df, "neardup: verify-width count")(cand.count())
    val verifyParts = math.max(defaultParts, (nCand / 25000L).toInt)
    // only candidate-participating docs join the pair set (semi-join
    // bound), and the pair join carries the two TEXTS (~300 B each),
    // re-deriving both shingle sets per pair inside the fused
    // JaccardTextsExpr kernel. The r10 verdict ("arrays once per doc,
    // fused kernel measured slower") did NOT survive sf100: shingle
    // STRING arrays are ~10 KB per 300-token doc, so the array-carrying
    // join moved ~230 GB at 11.7M pairs — past page cache, disk-bound,
    // measured 419 s for the join ALONE (intersect removed), and
    // partition sizing didn't help because the bytes were the cost.
    // Texts cut the exchange mass ~25x for ~15 µs of re-shingling CPU
    // per pair side (~12 s at sf100). Measured A/B in NOTES_r11.md.
    val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("doc"))
      .distinct()
    val txt = df.select(col(idCol).as("doc"), col(textCol).as("t"))
      .join(ids, Seq("doc"), "left_semi")
    // explicit co-partitioning at verifyParts: both sides of each join
    // land as HashPartitioning(key, verifyParts), so the SMJ reuses the
    // exchanges (no extra shuffle) and every sort fits in memory at any
    // corpus size
    cand.repartition(verifyParts, col("id_a"))
      .join(txt.select(col("doc").as("id_a"), col("t").as("t_a"))
        .repartition(verifyParts, col("id_a")), "id_a")
      .repartition(verifyParts, col("id_b"))
      .join(txt.select(col("doc").as("id_b"), col("t").as("t_b"))
        .repartition(verifyParts, col("id_b")), "id_b")
      .withColumn("jacc", org.apache.spark.sql.GraftBridge.column(
        graft.functions.JaccardTextsExpr(
          org.apache.spark.sql.GraftBridge.expression(col("t_a")),
          org.apache.spark.sql.GraftBridge.expression(col("t_b")), n)))
      .filter(col("jacc") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jacc"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash per doc, 4×16-bit bands for
    * blocking, Hamming ≤ maxHamming verification. Same two-shuffle
    * bucket-pairs layout as MinHash-LSH. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame = {
    val withH = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc"),
        rainer.simhash64(TextAnalysis.tokens(col(textCol))).as("h"))
    val banded = withH.select(col("doc"), col("h"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    bucketPairs(banded, Seq(col("band"), col("bucket")),
        struct(col("doc"), col("h")), maxBucket)
      .select(col("p.a.doc").as("id_a"), col("p.b.doc").as("id_b"),
        bit_count(col("p.a.h").bitwiseXOR(col("p.b.h"))).as("hamming"))
      .groupBy(col("id_a"), col("id_b")).agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- DuckDB oracles
  // The minhash/simhash pipelines are fully deterministic, so they are
  // oracle-expressible: FNV-1a runs as a list_reduce over character
  // codes in HUGEINT mod-2^64 arithmetic, and the splitmix finalizer's
  // 64×64-bit multiplies split into hi/lo halves to stay inside INT128.

  private val fnvM = "18446744073709551616::HUGEINT" // 2^64
  private val fnvHalf = "9223372036854775808::HUGEINT" // 2^63

  /** a*b mod 2^64 without INT128 overflow: ((a>>32)*b mod 2^32)<<32 +
    * (a mod 2^32)*b, mod 2^64. */
  private def modMul(z: String, c: String): String = {
    val b32 = "4294967296::HUGEINT"
    s"(((($z) >> 32) * $c::HUGEINT % $b32) * $b32 + (($z) % $b32) * $c::HUGEINT) % $fnvM"
  }

  /** FNV-1a 64 of a string expression (HashUtil.fnv1a64): one mix round
    * of (c & 0xFF), plus a second round of (c >> 8) for wide chars —
    * matching the engine's UTF-16 code-unit loop for the whole BMP
    * (astral-plane codepoints would still diverge: the engine sees two
    * surrogates where SQL sees one codepoint). */
  private[operators] def fnvSql(s: String): String =
    s"""list_reduce(
       |      list_prepend(14695981039346656037::HUGEINT,
       |        flatten(list_transform(
       |          list_transform(range(length($s)), i -> ascii(substring($s, (i+1)::INT, 1))),
       |          c -> CASE WHEN c <= 255 THEN [c::HUGEINT]
       |               ELSE [(c % 256)::HUGEINT, (c // 256)::HUGEINT] END))),
       |      (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT) % $fnvM)""".stripMargin

  /** DuckDB oracle for minhashLshPairs (MinHashSignatureExpr semantics:
    * splitmix64 finalizer over h XOR golden-ratio seeds, signed min).
    * Band membership tests slice equality directly — the semantic
    * definition the engine's xxhash64 bucketing approximates. */
  def minhashOracleSql(n: Int = 3, bands: Int = 16, rows: Int = 4,
                       minEstJaccard: Double = 0.5,
                       maxBucket: Int = 1024): String =
    s"""WITH ${minhashCtes(n, bands, rows, maxBucket)}
       |SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= $minEstJaccard""".stripMargin

  /** DuckDB oracle for nearDupVerified: the minhash CTE chain as the
    * candidate filter, then exact shingle-set Jaccard per surviving pair
    * (list_intersect over the distinct-shingle lists) — mirroring the
    * engine's filter→verify composition stage for stage. */
  def nearDupVerifiedOracleSql(n: Int = 3, bands: Int = 16, rows: Int = 4,
                               minJaccard: Double = 0.5,
                               maxBucket: Int = 1024): String =
    s"""WITH ${nearDupVerifiedCtes(n, bands, rows, minJaccard, maxBucket)}
       |SELECT id_a, id_b, jaccard FROM verified""".stripMargin

  /** The full preDedup→filter→verify chain as CTEs ending in `verified`
    * (id_a, id_b, jaccard) — composed by nearDupVerifiedOracleSql and
    * the verified-composition cluster oracle. Also defines `grp`
    * (doc_id, rep per identical lowered text, grp_n) for member
    * expansion. */
  def nearDupVerifiedCtes(n: Int = 3, bands: Int = 16, rows: Int = 4,
                          minJaccard: Double = 0.5,
                          maxBucket: Int = 1024): String = {
    val grams = (0 until n).map(j => s"t[i+${j + 1}]").mkString(" || ' ' || ")
    s"""grp AS ( -- engine's preDedup: one rep per identical lowered text
       |  SELECT doc_id, text,
       |    min(doc_id) OVER (PARTITION BY lower(text)) AS rep,
       |    count(*) OVER (PARTITION BY lower(text)) AS grp_n
       |  FROM documents),
       |reps AS (SELECT doc_id, text FROM grp WHERE doc_id = rep),
       |${minhashCtes(n, bands, rows, maxBucket, src = "reps")},
       |cand AS ( -- band-bucket pairs straight to exact verify (no est layer)
       |  SELECT DISTINCT id_a, id_b FROM pairs),
       |shs AS ( -- exact distinct-shingle sets (ShinglesExpr semantics)
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(len(t) - ${n - 1}), i -> $grams)) AS sh
       |  FROM toks WHERE len(t) >= $n),
       |ex AS (
       |  SELECT c.id_a, c.id_b, len(list_intersect(a.sh, b.sh)) AS i,
       |    len(a.sh) AS sa, len(b.sh) AS sb
       |  FROM cand c
       |  JOIN shs a ON a.doc_id = c.id_a
       |  JOIN shs b ON b.doc_id = c.id_b),
       |verified AS (
       |  SELECT id_a, id_b,
       |    round(CAST(i AS DOUBLE) / (sa + sb - i), 4) AS jaccard
       |  FROM ex WHERE CAST(i AS DOUBLE) / (sa + sb - i) >= $minJaccard)""".stripMargin
  }

  /** DuckDB oracle for the FLAGSHIP 100 TB dedup composition — exact
    * dedup → LSH filter → exact verify → connected components → member
    * expansion (`dedup_clusters_verified`): the verified chain above,
    * then min-label reachability over the verified pairs, then every
    * member doc mapped to its representative's cluster (an unclustered
    * rep with an exact-dup group still forms its own cluster). */
  def verifiedClustersOracleSql(n: Int = 3, bands: Int = 16, rows: Int = 4,
                                minJaccard: Double = 0.5,
                                maxBucket: Int = 1024): String =
    s"""WITH RECURSIVE ${nearDupVerifiedCtes(n, bands, rows, minJaccard,
          maxBucket)},
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM verified
       |  UNION SELECT id_b, id_a FROM verified),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |labels AS (
       |  SELECT a AS doc, least(a, min(b)) AS cluster
       |  FROM reach GROUP BY a)
       |SELECT g.doc_id AS doc,
       |  coalesce(l.cluster, CASE WHEN g.grp_n >= 2 THEN g.rep END) AS cluster
       |FROM grp g LEFT JOIN labels l ON l.doc = g.rep
       |WHERE coalesce(l.cluster, CASE WHEN g.grp_n >= 2 THEN g.rep END)
       |  IS NOT NULL""".stripMargin

  /** DuckDB oracle for the leakage-safe train/eval split: the
    * [[verifiedClustersOracleSql]] chain kept for ALL docs (singletons
    * fall back to their own id as the split key), then the md5 split
    * draw keyed on the CLUSTER key — so every member of a near-dup
    * cluster lands in the same split by construction. */
  def leakageSafeSplitOracleSql(trainFrac: Double, salt: String = "split",
                                n: Int = 3, bands: Int = 16, rows: Int = 4,
                                minJaccard: Double = 0.5,
                                maxBucket: Int = 1024): String =
    s"""WITH RECURSIVE ${nearDupVerifiedCtes(n, bands, rows, minJaccard,
          maxBucket)},
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM verified
       |  UNION SELECT id_b, id_a FROM verified),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |labels AS (
       |  SELECT a AS doc, least(a, min(b)) AS cluster
       |  FROM reach GROUP BY a),
       |keyed AS (
       |  SELECT g.doc_id,
       |    coalesce(l.cluster, CASE WHEN g.grp_n >= 2 THEN g.rep END,
       |      g.doc_id) AS split_key
       |  FROM grp g LEFT JOIN labels l ON l.doc = g.rep)
       |SELECT doc_id, split_key,
       |  ${Sampling.hashFractionSql("split_key", salt)} < $trainFrac
       |    AS is_train
       |FROM keyed""".stripMargin

  /** The shared minhash-LSH CTE chain (toks→…→est), ending with per-pair
    * `est_jaccard` in the `est` CTE — composed by minhashOracleSql and
    * nearDupVerifiedOracleSql. */
  private def minhashCtes(n: Int, bands: Int, rows: Int,
                          maxBucket: Int, src: String = "documents"): String =
    s"""${minhashBandedCtes(n, bands, rows, src)},
       |kept AS ( -- the engine's maxBucket hot-bucket guard, mirrored
       |  SELECT band, bkey FROM banded GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $maxBucket),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  JOIN kept k ON k.band = a.band AND k.bkey = a.bkey),
       |est AS (
       |  SELECT id_a, id_b,
       |    round(len(list_filter(range(${bands * rows}), j -> sig_a[j+1] = sig_b[j+1])) / ${bands * rows}.0, 4) AS est_jaccard
       |  FROM pairs)""".stripMargin

  /** The signature+banding CTE prefix (toks→sh→hashed→perms→sigs→banded)
    * over `src(doc_id, text)` — shared by the same-corpus pair chain
    * ([[minhashCtes]]) and the cross-snapshot chain
    * ([[snapshotNearDupOracleSql]]). Band membership tests the signature
    * slice directly — the semantic definition the engine's xxhash64
    * bucketing approximates. */
  private def minhashBandedCtes(n: Int, bands: Int, rows: Int,
                                src: String): String = {
    val k = bands * rows
    val grams = (0 until n).map(j => s"t[i+${j + 1}]").mkString(" || ' ' || ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '') AS t
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(len(t) - ${n - 1}), i -> $grams))) AS s
       |  FROM toks WHERE len(t) >= $n),
       |hashed AS (
       |  SELECT doc_id, ${fnvSql("s")} AS h0
       |  FROM sh),
       |perms AS (
       |  SELECT doc_id,
       |    list_transform(
       |      list_transform(
       |        list_transform(
       |          list_transform(
       |            list_transform(
       |              list_transform(
       |                list_transform(range($k), j -> xor(h0, (11400714819323198485::HUGEINT * (j+1)::HUGEINT) % $fnvM)),
       |                z -> xor(z, z >> 30)),
       |              z -> ${modMul("z", "13787848793156543929")}),
       |            z -> xor(z, z >> 27)),
       |          z -> ${modMul("z", "10723151780598845931")}),
       |        z -> xor(z, z >> 31)),
       |      z -> CASE WHEN z >= $fnvHalf THEN (z - $fnvM)::BIGINT ELSE z::BIGINT END) AS zs
       |  FROM hashed),
       |sigs AS (
       |  SELECT doc_id,
       |    list_transform(range($k), j -> list_min(list_transform(zll, l -> l[j+1]))) AS sig
       |  FROM (SELECT doc_id, list(zs) AS zll FROM perms GROUP BY doc_id)),
       |banded AS (
       |  SELECT doc_id, sig,
       |    sig[(band*$rows+1)::INT:((band+1)*$rows)::INT] AS bkey, band
       |  FROM (SELECT doc_id, sig, unnest(range($bands)) AS band FROM sigs))""".stripMargin
  }

  /** DuckDB oracle for simhashPairs (SimHash64Expr semantics: per-token
    * FNV-1a bit votes, 4×16-bit band blocking, Hamming verify). */
  def simhashOracleSql(maxHamming: Int = 3, maxBucket: Int = 1024): String = {
    val signedXor =
      s"(CASE WHEN xor(ha, hb) >= $fnvHalf THEN (xor(ha, hb) - $fnvM)::BIGINT ELSE xor(ha, hb)::BIGINT END)"
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '') AS t
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id,
       |    list_transform(t, tok -> ${fnvSql("tok")}) AS hl
       |  FROM toks),
       |sims AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(64), b ->
       |      CASE WHEN coalesce(list_sum(list_transform(hl, h ->
       |          CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0
       |        THEN (1::HUGEINT << b) ELSE 0::HUGEINT END))::HUGEINT AS h
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, h, (h >> (band*16)::INT) % 65536 AS bkey, band
       |  FROM (SELECT doc_id, h, unnest(range(4)) AS band FROM sims)),
       |kept AS ( -- the engine's maxBucket hot-bucket guard, mirrored
       |  SELECT band, bkey FROM banded GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $maxBucket),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.h AS ha, b.h AS hb
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  JOIN kept k ON k.band = a.band AND k.bkey = a.bkey)
       |SELECT id_a, id_b, bit_count($signedXor)::INT AS hamming
       |FROM pairs WHERE bit_count($signedXor) <= $maxHamming""".stripMargin
  }

  /** Dedup cluster formation: connected components over a near-dup pair
    * list via min-label propagation WITH pointer doubling — each round
    * propagates one hop through edges AND one hop through the current
    * label table itself (doc→label→label-of-label), so chain length halves
    * per round and convergence is O(log(diameter)) joins, not O(diameter).
    * No driver-side graph ever materializes. Returns (doc, cluster) where
    * cluster = the smallest doc id reachable. */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIter: Int = 16, localThreshold: Long = 1000000L): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // cached BEFORE the probe so the expensive upstream pair DAG is never
    // recomputed: the probe materializes (and caches) whatever partitions
    // it touches, and the distributed path reuses them
    val p0 = pairs.select(col(idA).as("src"), col(idB).as("dst")).cache()
    // Scale-adaptive: a near-dup edge list is orders of magnitude smaller
    // than the corpus (it's the LSH/verify survivors), so up to
    // `localThreshold` edges a driver-side union-find (zero iterative
    // jobs) beats scheduling log(d) join rounds — the same
    // small-side-local tradeoff as a broadcast join. The bounded collect
    // probes size and fetches the edges in ONE job: ≤ threshold rows back
    // means we hold the complete set; one extra row → distributed loop.
    // localThreshold bounds driver heap (rows × 2 ids) — size it to the
    // driver as you would any broadcast/collect limit. The 1M default
    // keeps the fetched edge set (~tens of MB) comfortably under the
    // default spark.driver.maxResultSize (1g); raise it only alongside
    // that setting.
    val probe = p0.limit((localThreshold + 1).toInt).collect()
    if (probe.length <= localThreshold) {
      p0.unpersist()
      val spark = pairs.sparkSession
      val srcType = p0.schema("src").dataType
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        // path compression
        var c = x
        while (parent.getOrDefault(c, c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
        r
      }
      val ord = implicitly[Ordering[String]]
      def lessThan(a: Any, b: Any): Boolean = (a, b) match {
        case (x: Long, y: Long) => x < y
        case (x: Int, y: Int) => x < y
        case (x, y) => ord.lt(x.toString, y.toString)
      }
      val nodes = new java.util.LinkedHashSet[Any]()
      probe.foreach { row =>
        val (x, y) = (row.get(0), row.get(1))
        nodes.add(x); nodes.add(y)
        val (a, b) = (find(x), find(y))
        if (a != b) {
          // min id becomes the representative (cluster = smallest reachable)
          if (lessThan(a, b)) parent.put(b, a) else parent.put(a, b)
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      nodes.forEach { k => out += org.apache.spark.sql.Row(k, find(k)) }
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1),
        StructType(Seq(StructField("doc", srcType), StructField("cluster", srcType))))
    }
    // distributed path: p0 is already cached (partially materialized by
    // the probe). cache, NOT localCheckpoint, for the edge list:
    // checkpointing drops to the RDD and loses AQE's runtime join
    // optimization of the upstream plan (measured 3.5× slower here).
    val p = p0
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    // localCheckpoint (not cache) each round: the iteration references
    // `labels` three times, so without lineage truncation the logical plan
    // doubles per round — exponential analysis cost long before any data
    // moves. Checkpointing keeps the plan O(1) per round.
    var labels = edges.groupBy(col("src").as("doc"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // one hop through edges: min over my neighbors' labels
      val viaEdges = edges.join(labels, edges("dst") === labels("doc"))
        .select(edges("src").as("doc"), col("cluster"))
      // pointer doubling: follow my label's own label
      val viaLabels = labels.as("l1").join(labels.as("l2"),
          col("l1.cluster") === col("l2.doc"))
        .select(col("l1.doc").as("doc"), col("l2.cluster").as("cluster"))
      val next = labels.select(col("doc"), col("cluster"))
        .union(viaEdges).union(viaLabels)
        .groupBy(col("doc")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint()
      val changed = next.as("n").join(labels.as("o"), Seq("doc"))
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count() > 0
      // release the superseded round's checkpoint blocks NOW: they are
      // fully consumed (next is eager-checkpointed; `changed` just read
      // them), and without the explicit unpersist every round's label
      // table stays resident until GC — ~log(d) corpus-label copies of
      // dead storage that amplify the mid-JVM eviction churn the bench
      // sections measure. Dataset.unpersist is a NO-OP here: a local-
      // checkpointed Dataset is backed by a LogicalRDD never registered
      // with the CacheManager, and unpersist only uncaches via the
      // CacheManager — the blocks must be dropped on the RDD itself.
      releaseLocalCheckpoint(labels)
      labels = next
      converged = !changed
      i += 1
    }
    if (!converged)
      log.warn(s"clusters() exited after $maxIter rounds without converging; " +
        "components may be split — raise maxIter")
    edges.unpersist()
    p0.unpersist()
    labels
  }

  /** Exact-text group map for the dedup-before-near-dup composition:
    * one row per doc with its group representative (min id among docs
    * with byte-identical lowered text in the same block) and group size.
    * The key is lowered text itself, NOT the punctuation-stripping
    * canonical fingerprint — identical lowered text implies an identical
    * shingle set (shingles are lowered-whitespace-token n-grams), which
    * is what makes representative-only pair verification sound; fp-equal
    * docs can still shingle differently. One map-side-combinable shuffle.
    */
  def textGroups(df: DataFrame, idCol: String, textCol: String,
                 blockCol: String): DataFrame =
    df.select(col(idCol).as("doc"), col(blockCol).as("blk"),
        col(textCol).as("t"))
      .groupBy(col("blk"), md5(lower(col("t"))).as("g"))
      .agg(min(struct(col("doc"), col("t"))).as("m"),
        count(lit(1)).as("grp_n"))
      .select(col("m.doc").as("rep"), col("blk"), col("m.t").as("t"),
        col("grp_n"))

  /** textMembers without a blocking column: rep/grp_n per identical
    * lowered text across the WHOLE corpus — the member-expansion stage
    * of the verified composition, whose preDedup groups globally (LSH
    * banding needs no block key). One window shuffle. */
  def textMembersGlobal(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val w = Window.partitionBy(col("g"))
    df.select(col(idCol).as("doc"), md5(lower(col(textCol))).as("g"))
      .withColumn("rep", min(col("doc")).over(w))
      .withColumn("grp_n", count(lit(1)).over(w))
      .select(col("doc"), col("rep"), col("grp_n"))
  }

  /** Member-level companion to textGroups: every doc mapped to its
    * group representative and group size (one window shuffle, no join
    * back to the corpus). Drives the expand-members-after-clustering
    * step of the canonical dedup composition. */
  def textMembers(df: DataFrame, idCol: String, textCol: String,
                  blockCol: String): DataFrame = {
    val w = Window.partitionBy(col("blk"), col("g"))
    df.select(col(idCol).as("doc"), col(blockCol).as("blk"),
        md5(lower(col(textCol))).as("g"))
      .withColumn("rep", min(col("doc")).over(w))
      .withColumn("grp_n", count(lit(1)).over(w))
      .select(col("doc"), col("rep"), col("grp_n"))
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking key (lang):
    * inverted index on shingles → pair intersection counts → Jaccard.
    * The blocking column bounds bucket fan-out so the shingle self-join
    * stays linear-ish at scale; this is the *verifier*, LSH is the filter.
    *
    * Composition order matters on a dup-dense corpus (the expected input
    * at crawl scale): exact duplicates share every shingle, so a group of
    * d copies would fill buckets with d(d-1)/2 jaccard-1.0 pairs plus d
    * copies of every cross pair — work the exact-dedup layer removes for
    * free. `preDedup` (default on) therefore collapses byte-identical
    * lowered text to one representative BEFORE the inverted index, and
    * pairs are emitted between representatives only (run textGroups to
    * map members back when group-level pairs are needed).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int = 3,
                        minJaccard: Double = 0.8,
                        maxBucket: Int = 1024,
                        preDedup: Boolean = true): DataFrame = {
    // preDedup's groupBy exchange already spreads the rows across the
    // cluster, so only the raw path needs the explicit repartition (a
    // small parquet input otherwise arrives as 1-2 partitions and the
    // CPU-bound shingle stage would serialize)
    val src =
      if (preDedup)
        textGroups(df, idCol, textCol, blockCol)
          .select(col("rep").as("doc"), col("blk"), col("t"))
      else
        df.select(col(idCol).as("doc"), col(blockCol).as("blk"),
          col(textCol).as("t"))
          .repartition(df.sparkSession.sparkContext.defaultParallelism)
    // each shingle row carries the owner's set size, so |A∪B| is known the
    // moment an intersection count exists — no sizes join, no cache, and
    // two shuffles past the dedup: the shingle groupBy and the pair groupBy
    val sh = src
      .select(col("doc"), col("blk"), shingles(col("t"), n).as("sharr"))
      .select(col("doc"), col("blk"), size(col("sharr")).as("sz"),
        explode(col("sharr")).as("s"))
    bucketPairs(sh, Seq(col("blk"), col("s")),
        struct(col("doc"), col("sz")), maxBucket)
      .groupBy(col("p.a.doc").as("id_a"), col("p.b.doc").as("id_b"),
        col("p.a.sz").as("sz_a"), col("p.b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact duplicated-span detection (the "dedup training data at the
    * substring level" pass of C4/RefinedWeb-style pipelines): every
    * W-char window of every document, thinned by CONTENT-DEFINED
    * selection — keep a window iff its md5 ends in '0' (1/16 of
    * windows). Because selection depends only on the bytes, both copies
    * of any duplicated span ≥ W+15 chars keep the same windows, so the
    * span is detected regardless of alignment (the winnowing/robust-
    * selection argument), while the shuffle carries ~1/16 of the
    * corpus. One explode + one map-side-combinable groupBy; output
    * capped deterministically (count desc, window asc).
    */
  def substringDupSpans(df: DataFrame, idCol: String, textCol: String,
                        window: Int = 120, cap: Int = 100): DataFrame = {
    // one-pass kernel: hash every W-char window straight out of the
    // UTF-8 buffer and emit ONLY the md5-selected 1/16 (r15; the
    // declarative transform-all-windows + filter form allocated ~W×
    // the corpus in discarded window strings — value parity pinned by
    // SelectWindowsParitySpec, selection contract unchanged/oracled)
    val wcol = explode(org.apache.spark.sql.GraftBridge.column(
      graft.functions.SelectWindowsExpr(
        org.apache.spark.sql.GraftBridge.expression(col(textCol)), window)))
    df.select(col(idCol).as("doc"), wcol.as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc")).as("ndocs"),
        min(col("doc")).as("first_doc"))
      .filter(col("ndocs") >= 2)
      .orderBy(col("n").desc, col("w"))
      .limit(cap)
  }

  /** Substring-span REMOVAL — composes [[substringDupSpans]] back onto
    * the corpus the way [[lineDedup]] does for lines (VERDICT r11 #4b):
    * the detected duplicated windows are scrubbed from every document
    * and the cleaned text re-emitted.
    *
    * Semantics (r12): ONE left-to-right pass — whenever a span starts
    * at the scan position it is dropped and scanning continues after
    * it, never re-reading the seam. This is a global regexp_replace
    * over a literal alternation (the oracle's form) and the C4-style
    * production semantic. The first cut was a sequential ≤cap-step
    * `replace` FOLD — semantically a re-scanning edit chain, and
    * O(cap·n) per document: 100 hot spans made removal re-read the
    * corpus 100 times (measured 27.5 s warmed at sf1 vs 9.5 s for
    * detection alone). The fused Rabin-Karp kernel
    * ([[graft.functions.MultiRemoveExpr]]) does the same alternation
    * removal in O(n + hits·window) — one rolling-hash scan however
    * many spans are hot.
    *
    * Scale shape: the span list is ≤ `cap` rows BY CONTRACT
    * (substringDupSpans ends in a deterministic top-`cap`), so the
    * driver collect is bounded the way a broadcast dim is — the
    * removal itself is then a pure scan-bound kernel projection, no
    * join, no shuffle.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 120, cap: Int = 100): DataFrame = {
    // bounded collect: ≤ cap strings of `window` chars (the operator's
    // own output contract), fetched once at plan-build time
    val spans = substringDupSpans(df, idCol, textCol, window, cap)
      .select(col("w")).collect().map(_.getString(0)).toSeq
    val cleaned = org.apache.spark.sql.GraftBridge.column(
      graft.functions.MultiRemoveExpr(
        org.apache.spark.sql.GraftBridge.expression(col(textCol)), spans))
    df.select(col(idCol).as("doc_id"), length(col(textCol)).as("n0"),
        cleaned.as("clean_text"))
      .select(col("doc_id"), col("clean_text"),
        (col("n0") - length(col("clean_text"))).cast("long")
          .as("n_chars_removed"))
  }

  /** DuckDB oracle for [[removeDupSpans]]: the substringDupSpans CTE,
    * its spans regex-escaped and joined into one literal alternation,
    * removed globally — RE2's leftmost-match-then-continue-after scan
    * is exactly the engine kernel's single pass (spans share one fixed
    * width, so no two distinct spans can match at one position and
    * alternation order never matters). */
  def removeDupSpansOracleSql(window: Int = 120, cap: Int = 100): String =
    s"""WITH wins AS (
       |  SELECT doc_id AS doc, substr(text, CAST(gs.i AS INT), $window) AS w
       |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
       |    greatest(length(text) - ${window - 1}, 0))) AS i) gs),
       |spans AS (
       |  SELECT w, count(*) AS n
       |  FROM wins WHERE substr(md5(w), 32, 1) = '0'
       |  GROUP BY w HAVING count(DISTINCT doc) >= 2
       |  ORDER BY n DESC, w LIMIT $cap),
       |pat AS (
       |  SELECT count(*) AS nspans, list_aggregate(
       |    list(regexp_replace(w,
       |      '([\\.\\^\\$$\\|\\?\\*\\+\\(\\)\\[\\]\\{\\}\\\\])',
       |      '\\\\\\1', 'g') ORDER BY n DESC, w),
       |    'string_agg', '|') AS p
       |  FROM spans),
       |cleaned AS (
       |  SELECT doc_id,
       |    CASE WHEN pat.nspans = 0 THEN text
       |         ELSE regexp_replace(text, pat.p, '', 'g') END AS clean_text
       |  FROM documents CROSS JOIN pat)
       |SELECT c.doc_id, c.clean_text,
       |  length(d.text) - length(c.clean_text) AS n_chars_removed
       |FROM cleaned c JOIN documents d USING (doc_id)""".stripMargin

  /** C4-style LINE-level dedup: drop every line that occurs >=
    * `minRepeat` times corpus-wide (boilerplate — cookie banners,
    * nav bars, copyright footers — survives document-level dedup
    * because the surrounding text differs), then reassemble each
    * document with its remaining lines in original order.
    *
    * Scale shape (rebuilt r12 — VERDICT r11 #2): the removal join is
    * keyed on md5(line), a fixed 32-byte key, so the hot side carries
    * no line text at all, and it carries NO broadcast hint. The r11
    * version forced `broadcast(hot)` on the claim the hot table is
    * "tiny by construction" — untrue for a web corpus, where the lines
    * repeated >= minRepeat corpus-wide are every site's nav/footer/
    * banner variants, hundreds of millions of distinct strings (C4
    * removed ~6% of its tokens this way); a forced broadcast there
    * OOMs with no fallback. AQE picks the strategy at runtime instead:
    * broadcast when the hot table really is boilerplate-sized (it is
    * at every test SF — the adaptive plan shows BroadcastHashJoin),
    * shuffled left-anti on the 32-byte key (linear, AQE skew-split)
    * when it is not. Corpus-sized shuffles: the combinable line count,
    * the anti-join exchange, the per-doc reassembly groupBy. Docs
    * whose every line is boilerplate drop out of the output (nothing
    * left to train on). md5 rather than a 64-bit hash keeps the
    * operator oracle-exact: both engines compute identical digests,
    * so even a collision (p ~ 2^-128) would be mirrored.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                minRepeat: Int = 3): DataFrame = {
    // r16 (guide §2.3 narrower types): the join/agg key is the md5 as
    // 16 RAW bytes, not the 32-char hex string — unhex(md5) is a
    // bijection of the digest, so hot/cold decisions are bit-identical
    // (a collision would require an md5 collision exactly as before)
    // while both corpus-sized exchanges (hot-count agg, anti join)
    // carry half the key bytes. lh never reaches the output.
    val lines = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lh", unhex(md5(col("line"))))
    val hot = lines.groupBy(col("lh")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minRepeat).select(col("lh"))
    lines.join(hot, Seq("lh"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
  }

  /** Fuzzy benchmark decontamination: per corpus doc, the MAX n-gram
    * Jaccard against any eval-set doc (exact `decontaminate` only counts
    * shared grams — a doc paraphrasing an eval item with 40% gram
    * overlap passes it; this is the GPT-3/PaLM-style fuzzy pass).
    *
    * Shape = the `decontaminate` broadcast pattern extended with
    * nearDupVerified's per-candidate exact-Jaccard idea: the eval side
    * is small by nature, so its exploded distinct-gram set broadcasts;
    * the corpus side is one scan + explode; the only shuffles are the
    * combinable (doc, eval) intersection count and the per-doc max.
    * Verifier cost ∝ docs sharing ≥1 gram with the eval set — at 100 TB
    * that's the contaminated sliver, not the corpus.
    *
    * Jaccard is quantized to an integer micro-score and the per-doc
    * argmax packs (micro_jaccard, eval_id) into one BIGINT key so the
    * winner is order-independent and hash-stable across engines (the
    * tfidf_topk discipline). Packing factor 1e12 > any synth-corpus
    * doc_id (sf100 ids reach ~1e11); integer `div`, never double
    * division (1e18-scale keys exceed 2^53). */
  /** Shared core of [[decontaminateFuzzy]] and [[contaminationReport]]:
    * per (corpus doc, eval doc) pair sharing ≥ 1 n-gram, the exact
    * micro-Jaccard (⌊jaccard·10⁶⌋ BIGINT). Broadcast eval grams,
    * combinable intersection count — pair volume ∝ the contaminated
    * sliver, never corpus × eval. */
  private[operators] def fuzzyMicroJaccard(corpus: DataFrame,
      evalSet: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val P = 1000000000000L
    def gramSets(d: DataFrame, as: String) = d.select(col(idCol).as(as),
        array_distinct(TextAnalysis.wordNgrams(
          TextAnalysis.tokens(col(textCol)), n)).as("gs"))
      .filter(size(col("gs")) > 0)
    val cg = gramSets(corpus, "doc_id")
      .select(col("doc_id"), size(col("gs")).as("na"), explode(col("gs")).as("g"))
    val eg = gramSets(evalSet, "eval_id")
      .select(
        // enforce the BIGINT-packing precondition (ADVICE r11): an
        // eval id outside [0, 1e12) would silently corrupt the packed
        // argmax instead of failing. The check rides the eval side —
        // small by nature — so it costs one comparison per eval doc,
        // and it cannot be pruned away (it IS the projected id).
        when(col("eval_id") >= 0 && col("eval_id") < P, col("eval_id"))
          .otherwise(raise_error(concat(
            lit("decontaminateFuzzy: eval id out of [0, 1e12): "),
            col("eval_id").cast("string")))).as("eval_id"),
        size(col("gs")).as("nb"), explode(col("gs")).as("g"))
    cg.join(broadcast(eg), Seq("g"))
      .groupBy(col("doc_id"), col("eval_id"), col("na"), col("nb"))
      // grams are distinct within each doc, so count(*) = |A ∩ B|
      .agg(count(lit(1)).as("inter"))
      .withColumn("mjac", floor(col("inter") * lit(1000000.0) /
        (col("na") + col("nb") - col("inter"))).cast("long"))
  }

  def decontaminateFuzzy(corpus: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String, n: Int = 5,
                         threshold: Double = 0.5): DataFrame = {
    val P = 1000000000000L // micro-jaccard × 1e12 + eval_id
    fuzzyMicroJaccard(corpus, evalSet, idCol, textCol, n)
      .groupBy(col("doc_id"))
      .agg(max(col("mjac") * lit(P) + col("eval_id")).as("k"))
      .select(col("doc_id"),
        expr(s"k div $P").as("micro_jaccard"),
        pmod(col("k"), lit(P)).as("best_eval_id"),
        (expr(s"k div $P") >= lit((threshold * 1e6).toLong)).as("contaminated"))
  }

  /** Contamination-coverage REPORT — the EVAL-side view of
    * [[decontaminateFuzzy]]: for each eval document, how many corpus
    * documents are fuzzy-contaminated with it (micro-Jaccard ≥
    * threshold), the worst offender's score, and the smallest offending
    * doc id (a stable exemplar to inspect). Eval docs nothing leaked
    * from report n_contaminated = 0, so the table always covers the
    * whole eval set — this is the audit artifact a training run files
    * alongside the decontamination pass (GPT-3 appendix-C style).
    *
    * Scale shape: [[fuzzyMicroJaccard]]'s broadcast-gram join + one
    * more combinable groupBy on eval_id (eval-sized output) + a
    * broadcast-sized left join back to the eval id list for the zero
    * rows. */
  def contaminationReport(corpus: DataFrame, evalSet: DataFrame,
                          idCol: String, textCol: String, n: Int = 5,
                          threshold: Double = 0.5): DataFrame = {
    val hits = fuzzyMicroJaccard(corpus, evalSet, idCol, textCol, n)
      .filter(col("mjac") >= lit((threshold * 1e6).toLong))
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_contaminated"),
        max(col("mjac")).as("max_micro_jaccard"),
        min(col("doc_id")).as("first_doc"))
    // every eval doc with gram evidence appears, zeros included
    val evalIds = evalSet
      .select(col(idCol).as("eval_id"),
        TextAnalysis.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= n).select(col("eval_id"))
    evalIds.join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        col("max_micro_jaccard"), col("first_doc"))
  }

  /** DuckDB oracle for [[decontaminateFuzzy]] with the standard
    * `doc_id % 97` eval split over `documents`. */
  def decontaminateFuzzyOracleSql(n: Int = 5, threshold: Double = 0.5): String = {
    val gram = (1 until n).foldLeft("toks[i]")((a, j) => s"$a || ' ' || toks[i+$j]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(toks) - ${n - 2}), i -> $gram))) AS g
       |  FROM t WHERE len(toks) >= $n),
       |sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
       |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 97 = 0),
       |co AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0),
       |inter AS (
       |  SELECT co.doc_id, ev.eval_id, count(*) AS i
       |  FROM co JOIN ev USING (g) GROUP BY 1, 2),
       |sc AS (
       |  SELECT inter.doc_id,
       |    CAST(floor(inter.i * 1000000.0 / (a.sz + b.sz - inter.i)) AS BIGINT)
       |      * 1000000000000 + inter.eval_id AS k
       |  FROM inter
       |  JOIN sz a ON a.doc_id = inter.doc_id
       |  JOIN sz b ON b.doc_id = inter.eval_id)
       |SELECT doc_id,
       |  max(k) // 1000000000000 AS micro_jaccard,
       |  max(k) % 1000000000000 AS best_eval_id,
       |  max(k) // 1000000000000 >= ${(threshold * 1e6).toLong} AS contaminated
       |FROM sc GROUP BY 1""".stripMargin
  }

  /** Cross-snapshot dedup — "drop every document already ingested by a
    * prior crawl" — with a bloom-filter pre-pass so the join only ever
    * sees the possibly-seen sliver. The 100 TB problem with the plain
    * anti-join is not the scan, it's the exchange: EVERY input
    * fingerprint shuffles to meet the snapshot side, though ~all of a
    * fresh crawl is new. Here:
    *
    *  1. the snapshot folds into ONE fixed-size bloom filter via
    *     Spark's own distributed [[org.apache.spark.sql.catalyst
    *     .expressions.aggregate.BloomFilterAggregate]] (the kernel
    *     behind AQE runtime row-level filtering) — a combinable
    *     aggregate whose buffer is `numBits/8` bytes REGARDLESS of
    *     snapshot row count, so the driver collect is bounds-checked
    *     by construction;
    *  2. the input's (id, fingerprint) projection is materialized once
    *     (localCheckpoint — scanned twice below, and ReuseExchange
    *     never fires across independent branches);
    *  3. definite-new rows (bloom miss) pass through with NO exchange —
    *     [[org.apache.spark.sql.catalyst.expressions
    *     .BloomFilterMightContain]] is a scan-side codegen'd predicate;
    *  4. only bloom hits (true dupes + the fpp sliver) anti-join the
    *     snapshot for exact verification, so the result is EXACT — the
    *     bloom can only fail toward extra verification work, never
    *     toward a wrong answer;
    *  5. the verify anti-join's SNAPSHOT side is pruned by a SECOND
    *     bloom built over the sliver (also fixed-size — the sliver is
    *     small by construction): without it, one fingerprint per
    *     snapshot document shuffles to meet a sliver typically orders
    *     of magnitude smaller, which is the cost that dominates once
    *     the accumulated snapshot is 10-100x the fresh input. A bloom
    *     has no false negatives, so every snapshot fingerprint equal to
    *     a sliver fingerprint still reaches the join — false positives
    *     only add shuffle rows, never change the answer. Verify cost is
    *     now ∝ sliver on BOTH sides.
    *
    * `expectedItems`/`numBits` size the filter (defaults: 2²⁰ items /
    * 2²³ bits ≈ 1 MB, ~2% fpp at full load; stay under
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, and raise
    * both for snapshots past ~10⁶ keys — an undersized bloom only
    * degrades the pre-filter rate, not correctness). Output: the kept
    * (idCol, fp) rows — input documents whose content fingerprint does
    * not appear in the snapshot. */
  def snapshotDedup(input: DataFrame, snapshot: DataFrame,
                    idCol: String, textCol: String,
                    expectedItems: Long = 1L << 20,
                    numBits: Long = 1L << 23): DataFrame = {
    val snapFp = snapshot.select(
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val bfBytes = snapshotBloom(snapFp, expectedItems, numBits)
    val fps = input.select(col(idCol).as("doc_id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .localCheckpoint()
    if (bfBytes == null) return fps // empty snapshot: everything is new
    val might = bloomMightContain(bfBytes, col("fp"))
    val defNew = fps.filter(!might)
    // the sliver re-filters from fps' checkpoint blocks (no exchange),
    // so its two consumers below (bloom build + join probe) are cheap
    // re-scans, not recomputed lineage
    val sliver = fps.filter(might)
    val sliverBloom = snapshotBloom(sliver.select(col("fp")),
      expectedItems, numBits)
    val verified =
      if (sliverBloom == null) sliver.limit(0) // empty sliver: no dupes
      else sliver
        .join(snapFp.filter(bloomMightContain(sliverBloom, col("fp"))),
          Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp"))
    defNew.select(col("doc_id"), col("fp")).union(verified)
  }

  /** Distributed bloom build over a one-column `fp` frame: ONE combinable
    * [[org.apache.spark.sql.catalyst.expressions.aggregate
    * .BloomFilterAggregate]] whose buffer (and the driver collect) is
    * `numBits/8` bytes by construction — a PARAMETER, not a function of
    * the data. Null when the frame is empty. */
  private[graft] def snapshotBloom(snapFp: DataFrame, expectedItems: Long,
                                   numBits: Long): Array[Byte] = {
    import org.apache.spark.sql.GraftBridge.{column => gcol, expression => gexp}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bloomAgg = gcol(new BloomFilterAggregate(
      gexp(xxhash64(col("fp"))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    snapFp.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Scan-side codegen'd bloom membership predicate over a fingerprint
    * column — usable in batch AND streaming plans (it is a plain
    * deterministic expression, no join, no state). */
  private[graft] def bloomMightContain(bfBytes: Array[Byte],
                                       fp: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column => gcol, expression => gexp}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    gcol(BloomFilterMightContain(
      Literal(bfBytes, BinaryType), gexp(xxhash64(fp))))
  }

  /** Streaming face of [[snapshotDedup]] — continuous crawl ingest: the
    * PRIOR snapshot is static (bloom built once, driver-side, fixed
    * size), the fresh crawl arrives as a stream. Bloom misses pass
    * through as a stateless scan-side filter (no state store, no
    * exchange); bloom hits exact-verify through a stream-static LEFT
    * ANTI join against the snapshot fingerprints (allowed by Structured
    * Streaming with the static side on the right; re-planned per
    * micro-batch, never stateful). The union of the two branches is the
    * kept stream. Semantics identical to the batch operator: EXACT —
    * the bloom only ever errs toward extra verification.
    *
    * State profile at 100 TB/day: ZERO streaming state (no watermark
    * needed — both branches are stateless per-row decisions against
    * static data); the static side re-scans per micro-batch, which is
    * the standard stream-static trade and is bounded by snapshot size,
    * not stream history. */
  def snapshotDedupStream(input: DataFrame, snapshot: DataFrame,
                          idCol: String, textCol: String,
                          expectedItems: Long = 1L << 20,
                          numBits: Long = 1L << 23): DataFrame = {
    val snapFp = snapshot.select(
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val bfBytes = snapshotBloom(snapFp, expectedItems, numBits)
    val fps = input.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    if (bfBytes == null) return fps
    val might = bloomMightContain(bfBytes, col("fp"))
    fps.filter(!might).union(
      fps.filter(might).join(snapFp, Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp")))
  }

  /** DuckDB oracle for [[snapshotDedup]] with the `doc_id % 3` snapshot
    * split over `documents`: the bloom is invisible to semantics (exact
    * verify), so the oracle is the plain anti-join. */
  def snapshotDedupOracleSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\s\x0B]', '', 'g'), '[\s\x0B]+', ' ', 'g'))) AS fp
      |  FROM documents),
      |snap AS (SELECT fp FROM f WHERE doc_id % 3 = 0),
      |inp AS (SELECT doc_id, fp FROM f WHERE doc_id % 3 <> 0)
      |SELECT doc_id, fp FROM inp ANTI JOIN snap USING (fp)""".stripMargin

  /** Batch-fixture oracle: the input additionally carries re-keyed
    * copies of the `doc_id % 6 = 0` snapshot half (ids + 1e6, same
    * text), all of which the exact verify must DROP. */
  def snapshotDedupRecrawlOracleSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\s\x0B]', '', 'g'), '[\s\x0B]+', ' ', 'g'))) AS fp
      |  FROM documents),
      |snap AS (SELECT fp FROM f WHERE doc_id % 3 = 0),
      |inp AS (SELECT doc_id, fp FROM f WHERE doc_id % 3 <> 0
      |        UNION ALL
      |        SELECT doc_id + 1000000, fp FROM f WHERE doc_id % 6 = 0)
      |SELECT doc_id, fp FROM inp ANTI JOIN snap USING (fp)""".stripMargin

  /** Cross-snapshot NEAR-dup — the fuzzy face of [[snapshotDedup]]:
    * drop input documents whose exact shingle-set Jaccard against ANY
    * prior-snapshot document reaches `tau`, with MinHash-LSH banding as
    * the candidate filter. The scale shape differs from running
    * [[nearDupVerified]] over the union: candidates are generated ONLY
    * across the corpus boundary (input bands probe snapshot bands), so
    * the operator never pays for snapshot×snapshot pairs — and in
    * incremental ingest the snapshot is typically 10-100× the fresh
    * crawl, making union-pairing mostly wasted work.
    *
    * Stage shapes, all bounded:
    *  - one rep per identical lowered text PER SIDE (combinable groupBy;
    *    an exact-duplicate group shares one verdict);
    *  - signatures via the fused [[graft.functions.MinHashTextExpr]]
    *    kernel, banding shuffles (doc, band, bucket) triples only;
    *  - snapshot stop-buckets (> `maxBucket` members) are dropped before
    *    the probe join — a band key shared by thousands of snapshot docs
    *    identifies boilerplate, not provenance (same cap contract as
    *    [[bucketPairs]], mirrored by the oracle);
    *  - candidates verify by exact per-pair Jaccard on the TEXTS
    *    ([[graft.functions.JaccardTextsExpr]] — the r11 exchange-mass
    *    lesson), co-partitioned at a data-dependent width so sorts stay
    *    in memory at any corpus size;
    *  - verdicts map back to members through the identical-text group
    *    key, and docs with <n tokens (null signature) are kept — they
    *    carry no shingle content to near-match.
    *
    * Recall is bounded by the LSH S-curve at (bands, rows), exactly as
    * in [[nearDupVerified]]; the oracle mirrors banding and verifier
    * both. Output: (doc_id) — input documents that survive. */
  def snapshotNearDup(input: DataFrame, snapshot: DataFrame,
                      idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 16, rows: Int = 4,
                      tau: Double = 0.5, maxBucket: Int = 1024): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => gcol, expression => gexp}
    val k = bands * rows
    val par = input.sparkSession.sparkContext.defaultParallelism
    // one rep per identical lowered text (min doc id; struct min is
    // deterministic because the id leads). Checkpointed: each rep table
    // feeds 2-3 independent branches below and ReuseExchange never
    // fires across branches.
    def reps(df: DataFrame): DataFrame = df
      .groupBy(md5(lower(col(textCol))).as("g"))
      .agg(min(struct(col(idCol).as("doc"), col(textCol).as("t"))).as("m"))
      .select(col("g"), col("m.doc").as("doc"), col("m.t").as("t"))
      .localCheckpoint()
    val inReps = reps(input)   // banding + text attach + verdict map-back
    val snReps = reps(snapshot) // banding + text attach
    def banded(repsDf: DataFrame): DataFrame = repsDf
      .repartition(par)
      .withColumn("sig", minhashTextSignature(col("t"), n, k))
      .filter(col("sig").isNotNull)
      .select(col("doc"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // snapshot bands feed the stop-bucket count AND the probe join;
    // (doc, band, bucket) triples only — checkpoint, don't re-sign
    val bSnap = banded(snReps).localCheckpoint()
    val keptBuckets = bSnap.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") <= maxBucket)
      .select(col("band"), col("bucket"))
    val cand = banded(inReps)
      .join(bSnap.join(keptBuckets, Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), col("doc").as("snap_rep")),
        Seq("band", "bucket"))
      .select(col("doc").as("in_rep"), col("snap_rep"))
      .distinct()
      .localCheckpoint() // bounded: LSH survivors; consumed 3x below
    // data-dependent verify width (the nearDupVerified discipline):
    // the pair join carries two ~300 B texts per row; ~25k pairs per
    // partition keeps every sort in memory at any corpus size
    val defaultParts =
      input.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val verifyParts = math.max(defaultParts, (cand.count() / 25000L).toInt)
    val tIn = inReps.select(col("doc").as("in_rep"), col("t").as("t_a"))
      .join(cand.select(col("in_rep")), Seq("in_rep"), "left_semi")
    val tSn = snReps.select(col("doc").as("snap_rep"), col("t").as("t_b"))
      .join(cand.select(col("snap_rep")), Seq("snap_rep"), "left_semi")
    val contaminated = cand
      .repartition(verifyParts, col("in_rep"))
      .join(tIn.repartition(verifyParts, col("in_rep")), "in_rep")
      .repartition(verifyParts, col("snap_rep"))
      .join(tSn.repartition(verifyParts, col("snap_rep")), "snap_rep")
      .withColumn("jacc", gcol(graft.functions.JaccardTextsExpr(
        gexp(col("t_a")), gexp(col("t_b")), n)))
      .filter(col("jacc") >= tau)
      .select(col("in_rep").as("rep")).distinct()
    input.select(col(idCol), md5(lower(col(textCol))).as("g"))
      .join(inReps.select(col("g"), col("doc").as("rep")), "g")
      .join(contaminated, Seq("rep"), "left_anti")
      .select(col(idCol))
  }

  /** Streaming face of [[snapshotNearDup]] — flag-on-arrival: each
    * streaming document computes its MinHash signature (a deterministic
    * scan expression — no state), explodes its band keys, probes the
    * STATIC snapshot's capped band table through a stream-static inner
    * join, exact-verifies survivors with the fused text kernel, and
    * folds to one (doc_id, micro_jaccard) row per contaminated doc.
    * Differences from the batch operator, both semantics-free:
    * per-DOC signatures instead of per-rep (identical lowered text ⟹
    * identical signature ⟹ identical verdict — streaming cannot
    * pre-group), and the output is the CONTAMINATED list (the drop
    * feed a continuous ingest acts on) rather than the kept set.
    * Zero watermark state; the per-doc max is the bounded complete-mode
    * aggregate. */
  def snapshotNearDupStream(input: DataFrame, snapshot: DataFrame,
                            idCol: String, textCol: String,
                            n: Int = 3, bands: Int = 16, rows: Int = 4,
                            tau: Double = 0.5,
                            maxBucket: Int = 1024): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column => gcol, expression => gexp}
    val k = bands * rows
    val snReps = snapshot
      .groupBy(md5(lower(col(textCol))).as("g"))
      .agg(min(struct(col(idCol).as("doc"), col(textCol).as("t"))).as("m"))
      .select(col("m.doc").as("doc"), col("m.t").as("t"))
      .localCheckpoint()
    val bSnap = snReps
      .withColumn("sig", minhashTextSignature(col("t"), n, k))
      .filter(col("sig").isNotNull)
      .select(col("t").as("t_b"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .localCheckpoint()
    val keptBuckets = bSnap.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") <= maxBucket)
      .select(col("band"), col("bucket"))
    val snapBands = bSnap.join(keptBuckets, Seq("band", "bucket"), "left_semi")
    input
      .select(col(idCol).as("doc_id"), col(textCol).as("t_a"))
      .withColumn("sig", minhashTextSignature(col("t_a"), n, k))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("t_a"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .join(snapBands, Seq("band", "bucket")) // stream-static inner
      .withColumn("jacc", gcol(graft.functions.JaccardTextsExpr(
        gexp(col("t_a")), gexp(col("t_b")), n)))
      .filter(col("jacc") >= tau)
      .groupBy(col("doc_id"))
      .agg(round(max(col("jacc")) * 1000000).cast("long").as("micro_jaccard"))
  }

  /** DuckDB oracle for [[snapshotNearDupStream]] with the `doc_id % 3`
    * split: per-doc input signatures (no rep grouping) probing capped
    * snapshot-rep bands; one max-jaccard row per contaminated doc. */
  def snapshotNearDupStreamOracleSql(n: Int = 3, bands: Int = 16,
                                     rows: Int = 4, tau: Double = 0.5,
                                     maxBucket: Int = 1024): String = {
    val grams = (0 until n).map(j => s"t[i+${j + 1}]").mkString(" || ' ' || ")
    s"""WITH inp AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
       |snap AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
       |snreps AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      min(doc_id) OVER (PARTITION BY lower(text)) AS rep
       |    FROM snap) WHERE doc_id = rep),
       |allreps AS (SELECT * FROM inp UNION ALL SELECT * FROM snreps),
       |${minhashBandedCtes(n, bands, rows, src = "allreps")},
       |bin AS (
       |  SELECT b.* FROM banded b JOIN inp r ON r.doc_id = b.doc_id),
       |bsnap AS (
       |  SELECT b.* FROM banded b JOIN snreps r ON r.doc_id = b.doc_id),
       |kept AS (
       |  SELECT band, bkey FROM bsnap GROUP BY 1, 2
       |  HAVING count(*) <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS id_in, s.doc_id AS id_snap
       |  FROM bin i JOIN bsnap s ON i.band = s.band AND i.bkey = s.bkey
       |  JOIN kept k ON k.band = i.band AND k.bkey = i.bkey),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(len(t) - ${n - 1}), i -> $grams)) AS sh
       |  FROM toks WHERE len(t) >= $n),
       |j AS (
       |  SELECT c.id_in AS doc_id,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jc
       |  FROM cand c
       |  JOIN shs a ON a.doc_id = c.id_in
       |  JOIN shs b ON b.doc_id = c.id_snap
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $tau)
       |SELECT doc_id, CAST(round(max(jc) * 1000000) AS BIGINT) AS micro_jaccard
       |FROM j GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for [[snapshotNearDup]] with the `doc_id % 3`
    * snapshot split over `documents`: per-side identical-text reps, the
    * shared signature+banding chain over the union, input bands probing
    * capped snapshot bands, exact shingle-set Jaccard on survivors,
    * verdict mapped back through the rep. */
  def snapshotNearDupOracleSql(n: Int = 3, bands: Int = 16, rows: Int = 4,
                               tau: Double = 0.5,
                               maxBucket: Int = 1024): String = {
    val grams = (0 until n).map(j => s"t[i+${j + 1}]").mkString(" || ' ' || ")
    s"""WITH inp AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
       |snap AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
       |ing AS (
       |  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY lower(text)) AS rep
       |  FROM inp),
       |inreps AS (SELECT doc_id, text FROM ing WHERE doc_id = rep),
       |snreps AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      min(doc_id) OVER (PARTITION BY lower(text)) AS rep
       |    FROM snap) WHERE doc_id = rep),
       |allreps AS (SELECT * FROM inreps UNION ALL SELECT * FROM snreps),
       |${minhashBandedCtes(n, bands, rows, src = "allreps")},
       |bin AS (
       |  SELECT b.* FROM banded b JOIN inreps r ON r.doc_id = b.doc_id),
       |bsnap AS (
       |  SELECT b.* FROM banded b JOIN snreps r ON r.doc_id = b.doc_id),
       |kept AS ( -- snapshot stop-bucket cap, mirrored
       |  SELECT band, bkey FROM bsnap GROUP BY 1, 2
       |  HAVING count(*) <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS id_in, s.doc_id AS id_snap
       |  FROM bin i JOIN bsnap s ON i.band = s.band AND i.bkey = s.bkey
       |  JOIN kept k ON k.band = i.band AND k.bkey = i.bkey),
       |shs AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(len(t) - ${n - 1}), i -> $grams)) AS sh
       |  FROM toks WHERE len(t) >= $n),
       |bad AS (
       |  SELECT DISTINCT c.id_in FROM cand c
       |  JOIN shs a ON a.doc_id = c.id_in
       |  JOIN shs b ON b.doc_id = c.id_snap
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $tau)
       |SELECT doc_id FROM ing WHERE rep NOT IN (SELECT id_in FROM bad)""".stripMargin
  }

  /** DuckDB oracle for [[contaminationReport]] with the standard
    * `doc_id % 97` eval split over `documents`. */
  def contaminationReportOracleSql(n: Int = 5, threshold: Double = 0.5): String = {
    val gram = (1 until n).foldLeft("toks[i]")((a, j) => s"$a || ' ' || toks[i+$j]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(toks) - ${n - 2}), i -> $gram))) AS g
       |  FROM t WHERE len(toks) >= $n),
       |sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY 1),
       |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 97 = 0),
       |co AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0),
       |inter AS (
       |  SELECT co.doc_id, ev.eval_id, count(*) AS i
       |  FROM co JOIN ev USING (g) GROUP BY 1, 2),
       |mj AS (
       |  SELECT inter.doc_id, inter.eval_id,
       |    CAST(floor(inter.i * 1000000.0 / (a.sz + b.sz - inter.i)) AS BIGINT)
       |      AS mjac
       |  FROM inter
       |  JOIN sz a ON a.doc_id = inter.doc_id
       |  JOIN sz b ON b.doc_id = inter.eval_id),
       |hits AS (
       |  SELECT eval_id, count(*) AS n_contaminated,
       |    max(mjac) AS max_micro_jaccard, min(doc_id) AS first_doc
       |  FROM mj WHERE mjac >= ${(threshold * 1e6).toLong} GROUP BY 1),
       |eids AS (
       |  SELECT doc_id AS eval_id FROM t
       |  WHERE doc_id % 97 = 0 AND len(toks) >= $n)
       |SELECT e.eval_id,
       |  coalesce(h.n_contaminated, 0) AS n_contaminated,
       |  h.max_micro_jaccard, h.first_doc
       |FROM eids e LEFT JOIN hits h USING (eval_id)""".stripMargin
  }
}
