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
                   seqLen: Int = 2048, shards: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
    // shard = id mod shards (portable across engines; ids are dense —
    // a content hash would also work but is engine-specific)
    df.select(col(idCol), pmod(col(idCol), lit(shards)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("end_off", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .withColumn("chunk", (col("start_off") / seqLen).cast("long"))
      .select(col(idCol), col("shard"), col("n_tok"),
        col("start_off"), col("chunk"))
  }
}
