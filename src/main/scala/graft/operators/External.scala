package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** mmexternal / omprog-style external-transform boundary (reference:
  * plugins/mmexternal/mmexternal.c — line-oriented stdin/stdout JSON
  * protocol; plugins/omprog with confirm protocol on the sink side).
  *
  * The Spark shape is a `mapPartitions` pipe: one external worker per
  * partition, messages streamed line-by-line, replies merged back into
  * the variable tree. `transform` is the worker boundary — in production
  * it wraps a child process (stdin/stdout); tests inject a pure function.
  * Partition-level batching is what makes the per-message protocol viable
  * at scale: worker startup amortizes over a whole partition, and workers
  * run node-local exactly like the reference's forked helpers.
  */
object External {

  /** Pipe each row's `jsonCol` through an external transform; the reply
    * (a JSON object string) replaces the column. `workerFactory` is
    * invoked once per partition (≈ one child process per task). A worker
    * that implements AutoCloseable is closed when the task completes —
    * success OR failure — so a wrapped child process gets its stdin
    * closed and is reaped instead of leaking one orphan per task. */
  def pipeJson(df: DataFrame, jsonCol: String,
               workerFactory: () => String => String): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(jsonCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val worker = workerFactory() // per-partition child process analogue
      worker match {
        case c: AutoCloseable =>
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => c.close()))
        case _ =>
      }
      rows.map { r =>
        val in = r.getString(idx)
        val out = worker(if (in == null) "{}" else in)
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Reference protocol helper: mmexternal sends `{"msg": ..., "$!": ...}`
    * per line and merges the reply's `$!` tree. This builds that envelope
    * from (msg, vars) columns. */
  def envelope(msg: org.apache.spark.sql.Column,
               vars: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_json(struct(msg.as("msg"), coalesce(vars, lit("{}")).as("vars")))
}
