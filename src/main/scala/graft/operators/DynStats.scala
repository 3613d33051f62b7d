package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** dyn_stats counter buckets (reference: runtime/dynstats.c:43-97 —
  * hashtable of named counters keyed by a runtime string, with a
  * `maxCardinality` cap: keys beyond the cap are not tracked and counted
  * into an ops_overflow metric instead; `dyn_inc` probes the bucket,
  * grammar/rainerscript.c:2724).
  *
  * Batch re-expression: groupBy(key).count() is the dyn_inc sum; the
  * cardinality cap keeps the first `maxCardinality` keys in first-seen
  * order (min of a monotonic order column — rsyslog admits keys in arrival
  * order) and folds the rest into `_overflow`. The heavy aggregation is
  * map-side combinable; only the tiny per-key digest hits the unpartitioned
  * ranking window, so this holds at 100 TB (window input = #distinct keys,
  * already capped in spirit by maxCardinality).
  */
object DynStats {
  def counters(df: DataFrame, keyCol: Column, orderCol: Column,
               maxCardinality: Int): DataFrame = {
    val perKey = df.groupBy(keyCol.as("metric_key"))
      .agg(count(lit(1)).as("cnt"), min(orderCol).as("first_seen"))
    val w = Window.orderBy(col("first_seen"))
    perKey
      .withColumn("rk", row_number().over(w))
      .withColumn("metric",
        when(col("rk") <= maxCardinality, col("metric_key")).otherwise(lit("_overflow")))
      .groupBy(col("metric"))
      .agg(sum(col("cnt")).as("n"))
  }

  def oracleSql(maxCardinality: Int): String =
    s"""WITH perkey AS (
       |  SELECT event_type AS metric_key, count(*) AS cnt,
       |         min(event_id) AS first_seen
       |  FROM events GROUP BY 1),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY first_seen) AS rk FROM perkey)
       |SELECT CASE WHEN rk <= $maxCardinality THEN metric_key
       |            ELSE '_overflow' END AS metric,
       |       CAST(sum(cnt) AS BIGINT) AS n
       |FROM ranked GROUP BY 1""".stripMargin
}
