package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-ngram linear quality classifier — the fastText shape (Joulin
  * et al. 2016, arXiv:1607.01759: a linear model over hashed
  * bag-of-ngram features) trained by closed-form Bernoulli-NB log-odds
  * instead of SGD, so TRAINING IS A QUERY: two map-side-combinable
  * groupBys plus one bounded 2-scalar collect — no iterative driver
  * loop, no mutable model state, nothing that breaks at 100 TB. This is
  * the CCNet/DCLM-style step after the heuristic gate: distill a cheap
  * teacher rule (here the [[TextAnalysis.qualityScoreFrom]] battery)
  * into a reusable linear scorer and measure holdout agreement.
  *
  * Scale shape:
  *  - features: per-doc DISTINCT hashed buckets of unigrams + bigrams
  *    (`pmod(fnv1a64(gram), buckets)`), distinct taken ARRAY-side
  *    (array_distinct before explode) so presence-feature dedup costs
  *    no shuffle;
  *  - the weight table is ≤ `buckets` rows BY CONSTRUCTION (a literal,
  *    default 4096) — the broadcast is justified the way tfidf's
  *    vocabulary broadcast is not (ADVICE r11): feature hashing bounds
  *    it regardless of corpus vocabulary;
  *  - the class totals are one 2-scalar driver collect (the tfidf-|N|
  *    discipline), and every other stage is a combinable groupBy.
  *
  * Determinism: weights are integer micro-log-odds
  * (floor(1e6·ln((n_pos+1)(neg+2)/((n_neg+1)(pos+2))))), the per-doc
  * score an integer sum — hash-stable across engines; only the one ln
  * per bucket is floating-point, quantized once (the tfidf discipline).
  * Train split = `doc_id % 10 < 8` (numeric-id precondition, same
  * convention as the decontaminate eval split).
  */
object QualityClassifier {

  /** FNV-1a 64 as a Column (codegen'd scalar kernel; DuckDB mirror =
    * the HUGEINT list_reduce in Dedup.fnvSql). */
  def fnv64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.Fnv1a64Expr(
        org.apache.spark.sql.GraftBridge.expression(c)))

  /** Train on the `doc_id % 10 < 8` split against the quality-score
    * teacher, score EVERY doc (including holdout — that's where
    * agreement is read). Output: (doc_id, micro_score, predicted,
    * teacher, is_train); docs with zero tokens have no features and
    * drop out. */
  def distillQuality(df: DataFrame, idCol: String, textCol: String,
                     buckets: Int = 4096): DataFrame = {
    // char-class counts via length difference, NOT regexp_extract_all:
    // the extract-all form materializes an array of single-char strings
    // per match (thousands of allocations per doc on a scan that runs
    // for every training and scoring pass); length(x) - length(replace
    // (x, class, '')) counts the same matches allocation-free. Same
    // integers, so the oracle's regexp_extract_all count is unchanged.
    val staged = df.select(col(idCol).as("doc_id"),
        col(textCol).as("text"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        (col("doc_id") % 10 < 8).as("is_train"),
        (TextAnalysis.qualityScoreFrom(length(col("text")), size(col("toks")),
          length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z]", "")),
          length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          >= 0.5).as("teacher"))
    // bounded scalar collect: the two train-split class totals — two
    // longs, independent of corpus size (the same discipline as
    // tfidf's |N|). This is the "training pass": one scan + one agg.
    val totals = staged.filter(col("is_train"))
      .agg(sum(when(col("teacher"), 1L).otherwise(0L)),
        sum(when(!col("teacher"), 1L).otherwise(0L))).head()
    val pos = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val neg = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    // NB priors/smoothing as integer micro-log-odds literals
    val biasMicro = math.floor(math.log((pos + 1.0) / (neg + 1.0)) * 1e6).toLong
    // weight of a bucket never seen in training (n_pos = n_neg = 0)
    val unseenMicro = math.floor(math.log((neg + 2.0) / (pos + 2.0)) * 1e6).toLong
    // per-doc distinct hashed presence features, dedup'd array-side
    val bucketArr = array_distinct(transform(
      concat(col("toks"), TextAnalysis.wordNgrams(col("toks"), 2)),
      g => pmod(fnv64(g), lit(buckets.toLong))))
    // feat is consumed TWICE (training counts + scoring) and each
    // consumer would otherwise rebuild the whole scan→tokenize→teacher→
    // gram→fnv stack — the dedup_verified lesson (ReuseExchange never
    // fires across independent branches). localCheckpoint materializes
    // the hashed features once: (doc_id, 2 bools, bucket) rows, ~20 B
    // each, block-manager-resident with disk spill. At true 100 TB
    // scale prefer persist(DISK_ONLY) or accept the one recompute —
    // either is linear; the double compute of the fnv/gram kernel is
    // the part worth paying memory to avoid (measured 29.9 s → the
    // checkpoint form at sf1, see NOTES_r12).
    val feat = staged.select(col("doc_id"), col("is_train"), col("teacher"),
        explode(bucketArr).as("b"))
      .localCheckpoint()
    // closed-form training: per-bucket class presence counts
    // (combinable), ≤ `buckets` rows out
    val cnt = feat.filter(col("is_train"))
      .groupBy(col("b"))
      .agg(sum(when(col("teacher"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("teacher"), 1L).otherwise(0L)).as("n_neg"))
    val w = cnt.select(col("b"),
      floor(log(((col("n_pos") + 1) * lit(neg + 2)).cast("double") /
        ((col("n_neg") + 1) * lit(pos + 2))) * 1e6).cast("long").as("w"))
    // the model broadcast: ≤ `buckets` rows by construction (feature
    // hashing bounds it for ANY vocabulary — this broadcast is safe at
    // 100 TB in a way a raw-vocabulary table would not be)
    feat.join(broadcast(w), Seq("b"), "left")
      .groupBy(col("doc_id"), col("is_train"), col("teacher"))
      .agg((sum(coalesce(col("w"), lit(unseenMicro))) + lit(biasMicro))
        .as("micro_score"))
      .select(col("doc_id"), col("micro_score"),
        (col("micro_score") > 0).as("predicted"),
        col("teacher"), col("is_train"))
  }

  /** DuckDB oracle for [[distillQuality]] over the `documents` table —
    * the full train-then-score pipeline, FNV feature hashing included
    * (Dedup.fnvSql), as one SQL statement. */
  def distillQualityOracleSql(buckets: Int = 4096): String = {
    val fnvG = Dedup.fnvSql("g")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '') AS toks
       |  FROM documents),
       |lbl AS (
       |  SELECT doc_id, toks, doc_id % 10 < 8 AS is_train,
       |    floor((
       |      (CASE WHEN len(toks) >= 50 AND len(toks) <= 100000 THEN 1.0::DOUBLE
       |            WHEN len(toks) >= 10 THEN 0.5::DOUBLE ELSE 0.0::DOUBLE END) * 0.4::DOUBLE +
       |      (CASE WHEN len(toks) > 0
       |            AND CAST(length(text) AS DOUBLE)/len(toks) >= 3
       |            AND CAST(length(text) AS DOUBLE)/len(toks) <= 12
       |            THEN 1.0::DOUBLE ELSE 0.3::DOUBLE END) * 0.2::DOUBLE +
       |      (CASE WHEN length(text) > 0
       |            THEN CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)/length(text)
       |            ELSE 0.0::DOUBLE END) * 0.3::DOUBLE +
       |      (1.0::DOUBLE - CASE WHEN length(text) > 0
       |            THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)/length(text)
       |            ELSE 0.0::DOUBLE END) * 0.1::DOUBLE
       |    ) * 1e6) / 1e6 >= 0.5 AS teacher
       |  FROM t),
       |g AS (
       |  SELECT doc_id, unnest(list_concat(toks,
       |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS g
       |  FROM lbl WHERE len(toks) > 0),
       |bd AS (SELECT DISTINCT doc_id, ($fnvG) % $buckets AS b FROM g),
       |tot AS (
       |  SELECT sum(CASE WHEN teacher THEN 1 ELSE 0 END) AS pos,
       |         sum(CASE WHEN NOT teacher THEN 1 ELSE 0 END) AS neg
       |  FROM lbl WHERE is_train),
       |cnt AS (
       |  SELECT b, sum(CASE WHEN l.teacher THEN 1 ELSE 0 END) AS n_pos,
       |         sum(CASE WHEN NOT l.teacher THEN 1 ELSE 0 END) AS n_neg
       |  FROM bd JOIN lbl l USING (doc_id) WHERE l.is_train GROUP BY 1),
       |w AS (
       |  SELECT b, CAST(floor(ln(CAST((n_pos+1) * (tot.neg+2) AS DOUBLE)
       |    / ((n_neg+1) * (tot.pos+2))) * 1e6) AS BIGINT) AS w
       |  FROM cnt CROSS JOIN tot),
       |sc AS (
       |  SELECT bd.doc_id, CAST(sum(coalesce(w.w,
       |    CAST(floor(ln(CAST(tot.neg+2 AS DOUBLE)/(tot.pos+2)) * 1e6) AS BIGINT)))
       |    AS BIGINT) AS s
       |  FROM bd CROSS JOIN tot LEFT JOIN w USING (b)
       |  GROUP BY 1)
       |SELECT l.doc_id,
       |  CAST(CAST(floor(ln(CAST(tot.pos+1 AS DOUBLE)/(tot.neg+1)) * 1e6) AS BIGINT)
       |    + sc.s AS BIGINT) AS micro_score,
       |  CAST(floor(ln(CAST(tot.pos+1 AS DOUBLE)/(tot.neg+1)) * 1e6) AS BIGINT)
       |    + sc.s > 0 AS predicted,
       |  l.teacher, l.is_train
       |FROM sc JOIN lbl l USING (doc_id) CROSS JOIN tot""".stripMargin
  }
}
