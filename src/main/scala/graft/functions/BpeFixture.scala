package graft.functions

/** Checked-in pretrained BPE vocabulary — the FIXED tokenizer the
  * token-accounting queries budget under (see [[Bpe]]: production
  * pipelines do not retrain the tokenizer per corpus; a fixed vocab is
  * also what lets the DuckDB oracle replay the encoding exactly).
  * Regenerate with `sbt "runMain graft.tools.BpeTrainMain <dir> 48 400"`
  * — the list is the merge products of deterministic char-level BPE
  * over the 400 smallest-id documents of the training dir, in merge
  * order. numMerges is DELIBERATELY small (48): the synthetic corpus'
  * word set is tiny, and a vocabulary trained to pair-exhaustion
  * absorbs every frequent word whole — leaving the multi-token encode
  * path dormant. At 48 merges roughly half of all word instances split
  * into 2-5 subwords (the realistic regime a ~32k-entry production
  * vocabulary produces on web text). Any vocabulary is a VALID encoder
  * input — gate correctness never depends on which corpus trained it. */
object BpeFixture {
  // trained: /root/testdata/sf0.01 sample=400 merges=48
  val vocab: Seq[String] = Seq(
    "er",
    "in",
    "ow",
    "or",
    "st",
    "mer",
    "at",
    "al",
    "ar",
    "par",
    "jo",
    "join",
    "as",
    "ash",
    "hash",
    "atc",
    "atch",
    "batch",
    "cu",
    "cust",
    "custo",
    "customer",
    "an",
    "can",
    "scan",
    "fi",
    "fil",
    "filt",
    "filter",
    "all",
    "mall",
    "small",
    "ge",
    "merge",
    "low",
    "slow",
    "co",
    "col",
    "colu",
    "colum",
    "column",
    "ct",
    "ctor",
    "ector",
    "vector",
    "row",
    "der",
    "order",
  )

  /** The vocabulary as a quoted SQL VALUES body for the DuckDB oracle
    * (single quotes doubled). */
  def sqlValues: String =
    vocab.map(v => "('" + v.replace("'", "''") + "')").mkString(",")
}
