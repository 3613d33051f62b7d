package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for large-scale training-data pipelines.
  *
  * Random `df.sample()` is useless for pipeline debugging and for oracle
  * verification: re-running the job gives a different subset, and no other
  * engine can reproduce the RNG stream. The standard fix at scale is
  * HASH-BUCKET sampling: a document is in the sample iff a stable hash of
  * its key lands in an agreed bucket range. That is reproducible across
  * runs, engines (md5 is md5 everywhere), cluster sizes, and data layouts,
  * and it composes with stratification by folding the stratum into the
  * hash key. It is also shuffle-free — a scan-side filter that Catalyst
  * pushes into the file scan, exactly what survives a 100 TB pass.
  */
object Sampling {

  /** True iff `key` is selected at rate numerator/16^digits.
    *
    * Selection = first `digits` hex chars of md5(salt:key) interpreted as
    * a base-16 number < numerator. `digits`=2 gives 1/256 granularity,
    * 3 gives 1/4096. Pure Column composition (md5+substring+conv) — no
    * UDF, codegen'd, pushable.
    */
  def hashBucketFilter(key: Column, numerator: Int, digits: Int = 2,
                       salt: String = ""): Column = {
    require(digits >= 1 && digits <= 8, "digits in [1,8]")
    val den = math.pow(16, digits).toLong
    require(numerator >= 0 && numerator <= den, s"numerator in [0,$den]")
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, digits), 16, 10)
      .cast("long") < numerator
  }

  /** Deterministic fraction ≈ numerator/16^digits sample of `df` keyed on
    * `keyCol`. Every engine hashing the same keys selects the same rows. */
  def hashSample(df: DataFrame, keyCol: String, numerator: Int,
                 digits: Int = 2, salt: String = ""): DataFrame =
    df.filter(hashBucketFilter(col(keyCol), numerator, digits, salt))

  /** Stratified deterministic sample: the stratum value is folded into the
    * hash key so each stratum is sampled independently at the same rate —
    * a skewed stratum cannot starve the others, and adding data to one
    * stratum never changes another stratum's selections. */
  def stratifiedHashSample(df: DataFrame, stratumCol: String, keyCol: String,
                           numerator: Int, digits: Int = 2,
                           salt: String = ""): DataFrame =
    df.filter(hashBucketFilter(
      concat(col(stratumCol), lit(":"), col(keyCol).cast("string")),
      numerator, digits, salt))

  /** DuckDB mirror of [[hashBucketFilter]] for oracle SQL. */
  def hashBucketSql(keyExpr: String, numerator: Int, digits: Int = 2,
                    salt: String = ""): String =
    s"('0x' || substr(md5('$salt' || $keyExpr), 1, $digits))::BIGINT < $numerator"

  /** Sequence packing for LLM training prep, concat-and-chunk style:
    * documents are laid end-to-end in deterministic (shard, id) order
    * and cut into fixed-size token chunks; each document reports the
    * chunk its FIRST token lands in plus its token span. The running
    * offset is a window sum PARTITIONED BY SHARD — never a global
    * order-by (a single-partition window is a scale killer); packing
    * per shard is exactly what distributed training prep wants, since
    * shards map to data-parallel workers. One shuffle on the shard key.
    */
  def sequencePack(df: DataFrame, idCol: String, textCol: String,
                   seqLen: Int = 2048, shards: Int = 64,
                   tokenCount: Column => Column =
                     TextAnalysis.tokenCount): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
    // shard = id mod shards (portable across engines; ids are dense —
    // a content hash would also work but is engine-specific).
    // `tokenCount` picks the token denomination — whitespace default,
    // or the BPE kernel for subword-budgeted packing (seq_pack_bpe)
    df.select(col(idCol), pmod(col(idCol), lit(shards)).as("shard"),
        tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("end_off", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .withColumn("chunk", (col("start_off") / seqLen).cast("long"))
      .select(col(idCol), col("shard"), col("n_tok"),
        col("start_off"), col("chunk"))
  }

  /** Sliding token-window chunking — the RAG/pretraining windowing step:
    * each document's whitespace-token stream cuts into `chunkTokens`-long
    * windows advancing by `chunkTokens - overlapTokens`, so consecutive
    * chunks share exactly `overlapTokens` tokens and every token of the
    * source lands in at least one chunk (the final window may be short).
    * Chunk text keeps the original casing (unlike the casefolded
    * analysis tokens). Narrow plan: split + explode(sequence) + slice,
    * no shuffle, no UDF — survives any corpus size the scan survives.
    * Documents with zero tokens emit no chunks.
    *
    * `tokens` picks the token DENOMINATION (r13 verdict #5: context
    * windows are subword-denominated, and the unit mismatch matters
    * most exactly in the windowing operator): default = whitespace
    * words with original casing; pass [[TextAnalysis.bpeEncode]] for
    * subword windows (chunk_tokens_bpe) — the window arithmetic is
    * identical over whatever array comes back. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int = 512,
                    overlapTokens: Int = 64,
                    tokens: Column => Column =
                      c => filter(split(c, "\\s+"), t => t =!= "")): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 &&
      overlapTokens < chunkTokens, "0 <= overlap < chunk")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        greatest(lit(1L),
          expr(s"(__n - $overlapTokens + ${stride - 1}) div $stride")) - 1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens.toLong),
          col("__n") - col("chunk_idx") * stride).cast("int").as("n_tokens"))
  }

  /** Uniform deterministic fraction of `key` in [0, 1): first 8 hex chars
    * of md5(salt:key) as a base-16 number over 16^8. The reproducible
    * "random draw" the mixture operators share — same engine-portable
    * contract as [[hashBucketFilter]], finer grained (2^-32). */
  def hashFraction(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** DuckDB mirror of [[hashFraction]] for oracle SQL. */
  def hashFractionSql(keyExpr: String, salt: String = ""): String =
    s"(('0x' || substr(md5('$salt' || $keyExpr), 1, 8))::BIGINT / 4294967296.0)"

  private def perDomainLit(domainCol: String, table: Map[String, Double],
                           default: Double): Column = {
    // flat when-chain (one CaseWhen node), never a nested otherwise-fold:
    // mixture tables are small (tens of domains), but a flat chain also
    // keeps codegen's subexpression walk linear if one isn't
    val entries = table.toSeq.sortBy(_._1)
    entries.tail.foldLeft(
        when(col(domainCol) === entries.head._1, lit(entries.head._2))) {
      case (acc, (d, v)) => acc.when(col(domainCol) === d, lit(v))
    }.otherwise(lit(default))
  }

  /** Domain-mixture DOWN-sampling: each domain (source, language, corpus
    * shard…) is kept at its own rate in [0, 1] — the "data mixture" step
    * of training-data prep, where e.g. web crawl is thinned to 30% while
    * curated corpora pass whole. Pure scan-side filter: the rate table is
    * one flat CaseWhen literal and the draw is [[hashFraction]], so the
    * plan is a pushable filter with zero shuffle and zero driver state —
    * the only shape that survives a 100 TB pass. Deterministic per key:
    * reruns, engines, and cluster layouts agree on every selection. */
  def domainMixSample(df: DataFrame, domainCol: String, keyCol: String,
                      rates: Map[String, Double], defaultRate: Double = 1.0,
                      salt: String = "mix"): DataFrame = {
    require(rates.nonEmpty && (rates.values ++ Seq(defaultRate)).forall(
      r => r >= 0 && r <= 1), "rates in [0,1]")
    df.filter(hashFraction(col(keyCol), salt) <
      perDomainLit(domainCol, rates, defaultRate))
  }

  /** CCNet-style perplexity-stratified sampling (Wenzek et al. 2020,
    * arXiv:1911.00359 §4.3): rank documents by their LM score WITHIN each
    * stratum (CCNet strata are languages — the score distribution is not
    * comparable across them), split the ranking into `nBuckets` equal
    * tiles (head = most LM-typical text), and keep each tile at its own
    * rate — head kept whole, tail thinned, the standard quality-mixture
    * curriculum. Input is [[LanguageModel.bigramLogProb]] output joined
    * with the stratum column: (idCol, stratumCol, n_bigrams, avg_lp).
    *
    * Documents with NO bigram evidence (n_bigrams = 0: empty or 1-token
    * texts) can't be ranked; they're assigned the TAIL bucket — "no
    * evidence of quality" is treated like "evidence of low quality",
    * matching CCNet's discard-short behavior. They are EXCLUDED from the
    * tile computation so they don't shift real documents' bucket
    * boundaries.
    *
    * The keep draw is [[hashFraction]] — deterministic per id, so the
    * selection reproduces across runs/engines and is oracle-exact.
    *
    * Scale shape: ntile is a window over (stratum) — ONE shuffle on the
    * stratum key plus an in-partition sort of (avg_lp, id) pairs
    * (16 B/row; the text never rides the window). Strata are languages,
    * so a partition holds one language's score pairs — at 100 TB that is
    * the documented ceiling of this exact-tile contract: past ~10⁹ docs
    * per language, switch the tile assignment to fixed micro-lp
    * thresholds calibrated from a sample (the CaseWhen then makes this a
    * pure scan-side filter; CCNet itself uses precomputed per-language
    * cutoffs exactly so the pass stays streaming). The exact-ntile form
    * is the deterministic, oracle-verifiable default. */
  def perplexitySample(scored: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[Int, Double], nBuckets: Int = 3,
                       salt: String = "ppl"): DataFrame = {
    require(rates.keySet == (1 to nBuckets).toSet,
      s"rates must cover buckets 1..$nBuckets")
    require(rates.values.forall(r => r >= 0 && r <= 1), "rates in [0,1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("avg_lp").desc, col(idCol).asc)
    val ranked = scored.filter(col("n_bigrams") > 0)
      .withColumn("ppl_bucket", ntile(nBuckets).over(w))
    val unranked = scored.filter(col("n_bigrams") === 0)
      .withColumn("ppl_bucket", lit(nBuckets))
    val rateCol = (2 to nBuckets).foldLeft(
        when(col("ppl_bucket") === 1, lit(rates(1)))) {
      (acc, b) => acc.when(col("ppl_bucket") === b, lit(rates(b)))
    }.otherwise(lit(0.0))
    ranked.unionByName(unranked)
      .filter(hashFraction(col(idCol), salt) < rateCol)
      .select(col(idCol), col(stratumCol), col("ppl_bucket"))
  }

  /** Epoch-weighted UP-sampling for mixture weights ≥ 0: weight w emits
    * floor(w) copies of every row in the domain plus one extra copy for a
    * hash-selected frac(w) share of keys, so the expected multiplicity is
    * exactly w and every copy is deterministic (the `copy` index column
    * disambiguates repeats for downstream shuffling/seeding). w < 1
    * degenerates to [[domainMixSample]] semantics. explode(sequence) is a
    * narrow op — no shuffle; output mass is Σ w_d·N_d by construction. */
  /** Deterministic training-order shuffle: every document gets a
    * pseudo-random (shard, pos) — the read order a data-parallel
    * training job consumes (worker w reads shard w in pos order). The
    * 100 TB shape: ONE hash-partition shuffle on the shard key plus a
    * per-shard external sort; position numbering is a window
    * PARTITIONED BY SHARD, never a global row_number (a one-partition
    * window is the classic scale killer this operator exists to avoid).
    * Both the shard draw and the order key are md5-derived from the
    * document key alone, so the permutation is independent of input
    * partitioning/arrival order, reproducible across runs, and
    * re-seedable per epoch via `salt` — and the DuckDB oracle can
    * replay it exactly. */
  def trainingShuffle(df: DataFrame, keyCol: String, nShards: Int,
                      salt: String = ""): DataFrame = {
    require(nShards > 0, "trainingShuffle: nShards must be positive")
    val key = col(keyCol).cast("string")
    val shard = (conv(substring(md5(concat(lit(salt + "shard:"), key)), 1, 2),
      16, 10).cast("long") % nShards).cast("int")
    val ord = md5(concat(lit(salt + "order:"), key))
    df.withColumn("shard", shard)
      .withColumn("__ord", ord)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__ord"), col(keyCol)))
        .cast("long"))
      .drop("__ord")
  }

  def upsampleByWeight(df: DataFrame, domainCol: String, keyCol: String,
                       weights: Map[String, Double],
                       defaultWeight: Double = 1.0,
                       salt: String = "epoch"): DataFrame = {
    require(weights.nonEmpty && (weights.values ++ Seq(defaultWeight))
      .forall(_ >= 0), "weights >= 0")
    val w = perDomainLit(domainCol, weights, defaultWeight)
    val copies = (floor(w) +
      when(hashFraction(col(keyCol), salt) < w - floor(w), 1)
        .otherwise(0)).cast("int")
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__n_copies") - 1)))
      .drop("__n_copies")
  }

  /** DSIR-style importance resampling (Xie et al. 2023,
    * arXiv:2302.03169 — Data Selection for LMs via Importance
    * Resampling): reweight a raw corpus toward a TARGET distribution by
    * per-document importance log-weights over hashed-ngram features,
    * then sample with Gumbel-top-k (exact weighted sampling without
    * replacement). The step mixture designers run between heuristic
    * filtering and training: "make the crawl look like the target
    * domain".
    *
    *  - Features: hashed unigram+bigram OCCURRENCES (the
    *    [[QualityClassifier]] hashing — `pmod(fnv1a64(gram), buckets)` —
    *    but counts, not presence: DSIR's bag-of-ngrams likelihood).
    *  - Per-bucket weight = floor(1e6·ln(p̂_target(b)/p̂_raw(b))) with
    *    add-1 smoothing over `buckets` — ONE ln, quantized once (the
    *    classifier discipline), so per-doc log-weights are order-free
    *    integer sums.
    *  - Selection: Gumbel-top-k per SHARD — g = −ln(−ln u) from the
    *    md5-uniform draw (u offset by +0.5/2³² so it is never 0),
    *    floor-quantized to micro units; keep the top
    *    floor(shard_n·frac) of (w_micro + g_micro) per shard. The
    *    shard partition is the [[trainingShuffle]] discipline: never a
    *    global row_number — the rank window shuffles once on the shard
    *    key and sorts (key, id) pairs, text never rides it.
    *
    * Scale shape (r15 form): the hashed-gram stack materializes ONCE as
    * a per-doc bucket ARRAY (localCheckpoint — a fraction of the
    * exploded occurrence rows' bytes); totals are a 2-scalar agg over
    * array sizes (no explode); per-bucket counts are one combinable
    * explode+groupBy with ≤ `buckets` output rows; the weight table is
    * bounded BY CONSTRUCTION (feature hashing, the classifier's
    * argument — 32 KB at the default 4096), so the per-doc weight is a
    * scan-side reference-object kernel
    * ([[graft.functions.BucketWeightSumExpr]]) instead of an
    * explode→broadcast-join probe of every occurrence plus a
    * corpus-sized groupBy(doc_id); the ONLY corpus-sized shuffle left
    * is the per-shard rank window. Docs with zero tokens have no
    * features and drop out (documented, as in
    * [[QualityClassifier.distillQuality]]).
    *
    * Returns every featured doc: (doc_id, shard, w_micro, key_micro,
    * kept).
    *
    * BATCH-ONLY by boundary (the tfidf_topk argument): the target/raw
    * feature distributions and the per-shard counts are corpus-wide
    * state, and selection must be a consistent-snapshot decision — a
    * drifting partial-stream importance ratio would silently re-rank
    * docs already emitted. Streaming selection against a FROZEN weight
    * table is a different operator (a stateless scan-side filter, which
    * [[domainMixSample]] already models). */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
                   targetPred: Column, targetFrac: Double = 0.25,
                   buckets: Int = 4096, nShards: Int = 16,
                   salt: String = "dsir"): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac in (0,1]")
    import org.apache.spark.sql.expressions.Window
    val staged = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"),
      targetPred.as("is_target"))
    val bucketArr = transform(
      concat(col("toks"), TextAnalysis.wordNgrams(col("toks"), 2)),
      g => pmod(QualityClassifier.fnv64(g), lit(buckets.toLong)))
    // the fnv/gram stack feeds three branches (totals, the per-bucket
    // distribution, the per-doc sums) and ReuseExchange never fires
    // across branches — materialize it ONCE (the distillQuality
    // lesson). r15: checkpoint the bucket ARRAY per doc, not the
    // exploded occurrence ROWS — same information at a fraction of the
    // bytes (no per-occurrence row header / doc_id / flag), and the
    // totals read it without exploding at all.
    val occA = staged.select(col("doc_id"), col("is_target"),
        bucketArr.as("bs"))
      .localCheckpoint()
    // bounded collect: the two gram-occurrence totals (2 longs) —
    // Σ|bs| over all / target docs == the exploded row counts
    val t = occA.agg(
      sum(when(col("is_target"), size(col("bs")).cast("long"))
        .otherwise(0L)).as("tt"),
      sum(size(col("bs")).cast("long")).as("ts")).head()
    val totT = if (t.isNullAt(0)) 0L else t.getLong(0)
    val totS = if (t.isNullAt(1)) 0L else t.getLong(1)
    // per-bucket raw + target counts → micro-log importance ratio;
    // ≤ `buckets` rows by construction — the feature-hashing bound
    // that made this table broadcast-safe makes it a bounded driver
    // collect (32 KB at the default 4096), so the per-doc weight can
    // be a SCAN-SIDE kernel: no explode→join probe of every
    // occurrence, no corpus-sized groupBy(doc_id) shuffle.
    val w = occA.select(col("is_target"), explode(col("bs")).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n_s"))
      .select(col("b"),
        floor(log(((col("n_t") + 1).cast("double") *
            lit((totS + buckets).toDouble)) /
          ((col("n_s") + 1).cast("double") * lit((totT + buckets).toDouble)))
          * 1e6).cast("long").as("w"))
    val wArr = new Array[Long](buckets)
    w.collect().foreach(r => wArr(r.getLong(0).toInt) = r.getLong(1))
    // long addition is order-free: the kernel's array-order sum equals
    // the groupBy sum of joined occurrence rows bit-for-bit. Docs with
    // zero features drop out, as the explode form did.
    val perDoc = occA.filter(size(col("bs")) > 0)
      .select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.BucketWeightSumExpr(
            org.apache.spark.sql.GraftBridge.expression(col("bs")), wArr))
          .as("w_micro"))
    // Gumbel key: u in (0,1) from the md5 draw (never 0 via +0.5),
    // g = −ln(−ln u) micro-floored once; key = w + g.
    // Cross-engine contract (ADVICE r14): unlike the weight's single-ln
    // discipline, g chains TWO transcendentals before its one floor, so
    // the micro key can flip by 1 unit if the JVM's Math.log and the
    // oracle's libm ln disagree in the last ulp on either call. Both
    // are correctly-rounded-to-≤1-ulp on every platform this gate runs
    // (glibc/OpenJDK StrictMath-equal on these inputs — verified by the
    // gate itself every round: a flip would hash-mismatch sample_dsir);
    // a port to a libm with looser ln bounds should quantize u to a
    // fixed grid first and take both lns over exact grid points.
    val u = (conv(substring(md5(concat(lit(salt + "g:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val shard = (conv(substring(md5(concat(lit(salt + "shard:"),
        col("doc_id").cast("string"))), 1, 2), 16, 10).cast("long")
      % nShards).cast("int")
    val keyed = perDoc
      .withColumn("shard", shard)
      .withColumn("key_micro",
        col("w_micro") + floor(-log(-log(u)) * 1e6).cast("long"))
    val win = Window.partitionBy(col("shard"))
      .orderBy(col("key_micro").desc, col("doc_id"))
    val cntWin = Window.partitionBy(col("shard"))
    keyed
      .withColumn("__rk", row_number().over(win))
      .withColumn("__n", count(lit(1)).over(cntWin))
      .select(col("doc_id"), col("shard"), col("w_micro"), col("key_micro"),
        (col("__rk") <= floor(col("__n").cast("double") * lit(targetFrac))
          .cast("long")).as("kept"))
  }

  /** DuckDB oracle for [[dsirResample]] over the `documents` table:
    * the full hashed-ngram distribution estimation (FNV replay via
    * Dedup.fnvSql), one-ln micro weights, md5 Gumbel keys, and the
    * per-shard top-frac rank — one SQL statement. `targetPredSql` is
    * the SQL form of the target predicate (e.g. `lang = 'en'`). */
  def dsirOracleSql(targetPredSql: String, targetFrac: Double = 0.25,
                    buckets: Int = 4096, nShards: Int = 16,
                    salt: String = "dsir"): String = {
    val fnvG = Dedup.fnvSql("g")
    s"""WITH t AS (
       |  SELECT doc_id, ($targetPredSql) AS is_target,
       |    list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, is_target, unnest(list_concat(toks,
       |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS g
       |  FROM t WHERE len(toks) > 0),
       |occ AS (SELECT doc_id, is_target, ($fnvG) % $buckets AS b FROM g),
       |tot AS (
       |  SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tt,
       |         count(*) AS ts
       |  FROM occ),
       |w AS (
       |  SELECT b, CAST(floor(ln(
       |      (CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) + 1 AS DOUBLE)
       |        * CAST(tot.ts + $buckets AS DOUBLE)) /
       |      (CAST(count(*) + 1 AS DOUBLE) * CAST(tot.tt + $buckets AS DOUBLE))
       |    ) * 1e6) AS BIGINT) AS w
       |  FROM occ CROSS JOIN tot GROUP BY b, tot.ts, tot.tt),
       |pd AS (
       |  SELECT occ.doc_id, CAST(sum(w.w) AS BIGINT) AS w_micro
       |  FROM occ JOIN w USING (b) GROUP BY 1),
       |keyed AS (
       |  SELECT doc_id, w_micro,
       |    CAST(('0x' || substr(md5('${salt}shard:' || CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
       |      % $nShards AS INT) AS shard,
       |    w_micro + CAST(floor(-ln(-ln(
       |      (('0x' || substr(md5('${salt}g:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
       |        / 4294967296.0)) * 1e6) AS BIGINT) AS key_micro
       |  FROM pd),
       |ranked AS (
       |  SELECT *, row_number() OVER
       |      (PARTITION BY shard ORDER BY key_micro DESC, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY shard) AS n
       |  FROM keyed)
       |SELECT doc_id, shard, w_micro, key_micro,
       |  rk <= CAST(floor(CAST(n AS DOUBLE) * CAST($targetFrac AS DOUBLE)) AS BIGINT) AS kept
       |FROM ranked""".stripMargin
  }
}
