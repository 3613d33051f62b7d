package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** Action retry/suspend/failover semantics for foreachBatch sinks
  * (reference: runtime/action.c:370-371,856-1015 -- exponential backoff
  * iResumeInterval -> iResumeIntervalMax with tryResume probes; the
  * omelasticsearch error-file pattern for messages that keep failing).
  *
  * Wraps a batch writer: on failure retries with exponential backoff; if
  * the action stays suspended past maxRetries the batch goes to the
  * fallback (error-file / dead-letter) writer instead of being lost --
  * rsyslog's action.execOnlyWhenPreviousIsSuspended failover chain.
  */
object ReliableSink {

  case class RetryPolicy(maxRetries: Int = 3, resumeIntervalMs: Long = 100,
                         resumeIntervalMaxMs: Long = 5000, backoffFactor: Double = 2.0)

  final class SuspendedException(cause: Throwable)
    extends RuntimeException("action suspended", cause)

  /** Run `write` with retry/backoff; route to `fallback` on exhaustion.
    * Returns true if the primary succeeded. */
  def writeWithRetry(df: DataFrame, write: DataFrame => Unit,
                     fallback: DataFrame => Unit,
                     policy: RetryPolicy = RetryPolicy()): Boolean = {
    var attempt = 0
    var interval = policy.resumeIntervalMs
    while (attempt <= policy.maxRetries) {
      try {
        write(df)
        return true
      } catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > policy.maxRetries) {
            fallback(df)
            return false
          }
          Thread.sleep(interval)
          interval = math.min((interval * policy.backoffFactor).toLong,
            policy.resumeIntervalMaxMs)
      }
    }
    false
  }

  /** foreachBatch adapter: exactly the shape writeStream.foreachBatch
    * expects, with per-batch retry + dead-letter. */
  def foreachBatchWithRetry(write: DataFrame => Unit, fallback: DataFrame => Unit,
                            policy: RetryPolicy = RetryPolicy())
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // persist so a retry does not recompute the upstream query
      batch.persist()
      try writeWithRetry(batch, write, fallback, policy)
      finally batch.unpersist()
    }
}
