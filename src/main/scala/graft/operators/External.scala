package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** mmexternal / omprog-style external-transform boundary (reference:
  * plugins/mmexternal/mmexternal.c — line-oriented stdin/stdout JSON
  * protocol; plugins/omprog with confirm protocol on the sink side).
  *
  * The Spark shape is a `mapPartitions` pipe: one external worker per
  * partition, messages streamed line-by-line, replies merged back into
  * the variable tree. `transform` is the worker boundary — production
  * wraps a child process (`ProcessWorker`); tests may inject a pure
  * function. Partition-level batching is what makes the per-message
  * protocol viable at scale: worker startup amortizes over a whole
  * partition, and workers run node-local exactly like the reference's
  * forked helpers.
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

  /** mmexternal with a REAL child process per partition: each row's JSON
    * line goes to the program's stdin, one reply line comes back
    * (plugins/mmexternal/mmexternal.c callExtProg). */
  def pipeProgram(df: DataFrame, jsonCol: String, cmd: Seq[String],
                  maxRestarts: Int = 3): DataFrame =
    pipeJson(df, jsonCol, () => new ProcessWorker(cmd, maxRestarts))

  /** Reference protocol helper: mmexternal sends `{"msg": ..., "$!": ...}`
    * per line and merges the reply's `$!` tree. This builds that envelope
    * from (msg, vars) columns. */
  def envelope(msg: org.apache.spark.sql.Column,
               vars: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_json(struct(msg.as("msg"), coalesce(vars, lit("{}")).as("vars")))

  /** omprog confirm-protocol status decode (omprog.c lineToStatusCode):
    * leading dots are a keep-alive prefix and are stripped; "OK",
    * "DEFER_COMMIT" and "PREVIOUS_COMMITTED" confirm; anything else is a
    * recoverable failure (the reference suspends + restarts the child). */
  def statusOk(line: String): Boolean = {
    val s = line.dropWhile(_ == '.')
    s == "OK" || s == "DEFER_COMMIT" || s == "PREVIOUS_COMMITTED"
  }
}

/** A real child process speaking the line protocol: one request line in →
  * one reply line out (mmexternal's stdin/stdout JSON interface; with
  * `confirmStartup` also omprog's startup handshake, where the program
  * emits one initial status line before the first message, omprog.c
  * startChild/readStatus).
  *
  * Crash handling mirrors omprog.c writeToChild/readStatus: a write
  * failure (EPIPE) or an EOF reply means the child died — it is restarted
  * and the in-flight message resent, up to `maxRestarts` times per
  * worker; past that the task fails, which is Spark's version of the
  * reference's action-suspend escalation (the retried task gets a fresh
  * worker). AutoCloseable so pipeJson's task-completion hook reaps the
  * child on success AND failure paths — no orphans.
  */
final class ProcessWorker(cmd: Seq[String], maxRestarts: Int = 3,
                          confirmStartup: Boolean = false,
                          env: Map[String, String] = Map.empty)
    extends (String => String) with AutoCloseable {

  private var proc: Process = _
  private var toChild: java.io.BufferedWriter = _
  private var fromChild: java.io.BufferedReader = _
  /** restarts performed so far (visible for tests/metrics). */
  @volatile var restarts: Int = 0
  /** status line the child emitted at startup (confirm protocol). */
  @volatile var startupStatus: Option[String] = None

  start()

  private def start(): Unit = {
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    proc = pb.start()
    toChild = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
    fromChild = new java.io.BufferedReader(new java.io.InputStreamReader(
      proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
    if (confirmStartup) startupStatus = Option(fromChild.readLine())
  }

  private def restart(): Unit = {
    restarts += 1
    if (restarts > maxRestarts)
      throw new java.io.IOException(
        s"external program ${cmd.head} died $restarts times; giving up")
    kill()
    start()
  }

  /** one request/reply round-trip; restarts the child and resends on a
    * broken pipe or EOF reply. */
  def apply(line: String): String = {
    var attempt = 0
    while (true) {
      attempt += 1
      val reply =
        try {
          toChild.write(line); toChild.newLine(); toChild.flush()
          fromChild.readLine() // null = EOF = child died
        } catch {
          case _: java.io.IOException => null
        }
      if (reply != null) return reply
      restart() // throws past maxRestarts
    }
    throw new IllegalStateException("unreachable")
  }

  private def kill(): Unit = {
    try toChild.close() catch { case _: java.io.IOException => }
    if (proc != null && proc.isAlive) {
      proc.destroy()
      if (!proc.waitFor(2, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
    }
  }

  override def close(): Unit = kill()
}
