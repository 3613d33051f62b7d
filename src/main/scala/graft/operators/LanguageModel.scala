package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * (Wenzek et al. 2020, arXiv:1911.00359) perplexity filter with the
  * external KenLM stage replaced by an in-engine add-one-smoothed bigram
  * model: P(w2|w1) = (B(w1,w2) + 1) / (U(w1) + |V|). Everything derives
  * from the corpus itself, so train + score is one deterministic,
  * oracle-expressible pipeline — the score ranks documents by how
  * "typical" their word transitions are, the signal the perplexity
  * bucket filter thresholds on.
  */
object LanguageModel {

  /** Per-document bigram log-probability under the corpus-trained model.
    *
    * Returns (doc_id, n_bigrams, sum_micro_lp, avg_lp): each bigram's
    * ln P is quantized to an exact integer micro-log
    * (⌊ln(p)·10⁶⌋ as BIGINT) BEFORE the per-document sum, so the
    * aggregation is integer-exact and order-independent — a raw double
    * sum would hash differently across engines/partitionings from
    * last-bit addition-order noise. avg_lp is then one exact integer
    * division (magnitudes ≪ 2⁵³). Docs with < 2 tokens have no bigram
    * evidence: n_bigrams 0, avg_lp NULL.
    *
    * Scale shape: training is two map-side-combinable groupBy counts
    * (bigram, unigram — vocabulary-sized outputs, ≪ corpus) plus one
    * distributed distinct count collapsing to a single driver scalar
    * (|V|, the smoothing denominator — bounded by vocabulary, not data).
    * Scoring explodes each document's bigrams once and joins the two
    * count tables on their natural keys; AQE broadcasts them when they
    * fit, and at 100 TB a vocabulary table is exactly the
    * broadcast-side shape. No window, no driver loop.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // toks feeds FIVE independent plan branches (uni counts, the |V|
    // scalar, bigram training counts, the scoring explode, the left-join
    // skeleton) and ReuseExchange never fires across independent
    // branches — without materialization the scan+tokenize stack
    // executes 5x (the dedup_verified/quality_classifier lesson).
    // localCheckpoint materializes (doc_id, tokens) once; measured at
    // sf0.1: lm_score 4.46 -> 2.04 s, sample_perplexity 9.42 -> 3.39 s
    // (3-trial medians, NOTES_r12). At true 100 TB the checkpoint is linear local-disk
    // I/O of the token arrays — cheaper than four re-reads + re-regex
    // of the raw text.
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("t"))
      .localCheckpoint()
    val grams = toks.select(col("doc_id"),
      explode(TextAnalysis.wordNgrams(col("t"), 2)).as("g"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("uc"))
    val vocab = uni.count() // bounded collect: one scalar, |V| rows scanned
    val bi = grams.groupBy(col("g")).agg(count(lit(1)).as("bc"))
    val scored = grams
      .join(bi, "g")
      // bigrams are space-joined token pairs and tokens contain no
      // whitespace by construction, so w1 recovers exactly
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .withColumn("mlp", floor(log((col("bc") + 1).cast("double") /
        (col("uc") + lit(vocab.toDouble))) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("mlp")).as("sum_micro_lp"))
    toks.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_micro_lp"), lit(0L)).as("sum_micro_lp"),
        when(col("n_bigrams") > 0,
          col("sum_micro_lp") / (col("n_bigrams") * lit(1e6))).as("avg_lp"))
  }

  /** DuckDB oracle for [[bigramLogProb]] over the `documents` table.
    * ln agrees between engines to ≤ 1 ulp; a micro-log floor flip needs
    * ln(p)·10⁶ within ~1e-10 of an integer — negligible at gate scale
    * (and the quantization happens per bigram in BOTH engines, so the
    * sums compare exactly). */
  def bigramOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[\s\x0B]+'), x -> x <> '') AS t
      |  FROM documents),
      |uni AS (
      |  SELECT w, count(*) AS uc
      |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
      |v AS (SELECT count(*) AS vs FROM uni),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(t)),
      |      i -> t[i] || ' ' || t[i + 1])) AS g
      |  FROM toks),
      |bi AS (SELECT g, count(*) AS bc FROM bg GROUP BY 1),
      |sc AS (
      |  SELECT bg.doc_id,
      |    CAST(floor(ln((bi.bc + 1) / CAST(uni.uc + v.vs AS DOUBLE)) * 1e6)
      |      AS BIGINT) AS mlp
      |  FROM bg JOIN bi USING (g)
      |  JOIN uni ON uni.w = string_split(bg.g, ' ')[1]
      |  CROSS JOIN v),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(mlp) AS BIGINT) AS sum_micro_lp
      |  FROM sc GROUP BY 1)
      |SELECT t.doc_id,
      |  coalesce(a.n_bigrams, 0) AS n_bigrams,
      |  coalesce(a.sum_micro_lp, 0) AS sum_micro_lp,
      |  CASE WHEN a.n_bigrams > 0
      |       THEN a.sum_micro_lp / (a.n_bigrams * 1e6) END AS avg_lp
      |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin
}
