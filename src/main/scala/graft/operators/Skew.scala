package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at 100 TB. AQE's skew-join splitting
  * handles sort-merge cases at runtime; explicit salting is for when a
  * key's fan-out is structural (one hostname producing 30% of a log
  * stream) and both sides of a shuffle join would hammer one partition.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt derived
    * from a high-cardinality column; the small side is exploded across
    * all salt values. Key distribution spreads hot keys over `factor`
    * partitions at the cost of duplicating the small side `factor`×.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(factor)))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation with explicit salting — for aggregations whose
    * partial-aggregate state is too wide for map-side combine to save the
    * day (e.g. collect-style or huge distinct sets per key): first
    * aggregate (key, salt), then merge per key. `merge` maps the
    * partial-result columns to their final combining expressions.
    */
  def saltedAgg(df: DataFrame, key: String, saltSource: Column, factor: Int,
                partials: Seq[Column], merge: Seq[Column]): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
