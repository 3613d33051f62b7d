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

  /** omtesting failure injector (plugins/omtesting/omtesting.c:123-185,
    * the testbench's action-retry driver): `fail F R` suspends every
    * F-th action call (the call counter starts at 1, :315) and stays
    * suspended until the R-th resume probe (doFailOnResume), after which
    * the retried call re-enters the normal counter check; `alwaysSuspend`
    * never resumes. Wraps a writer so [[writeWithRetry]]'s backoff
    * ladder is driven by DETERMINISTIC failures — each retry invocation
    * is one tryResume probe. */
  final class OmtestingInjector(failFrequency: Int, resumeAfter: Int,
                                alwaysSuspend: Boolean = false) {
    private var currCall = 1
    private var failed = false
    private var currRetries = 0
    def calls: Int = synchronized(currCall - 1)

    def wrap(write: DataFrame => Unit): DataFrame => Unit = df => synchronized {
      if (alwaysSuspend) throw new SuspendedException(null)
      if (failed) {
        currRetries += 1 // tryResume probe (doFailOnResume :124-136)
        if (currRetries == resumeAfter) failed = false
        else throw new SuspendedException(null)
      }
      val n = currCall
      currCall += 1 // iCurrCallNbr++ evaluates on every non-failed call
      if (n % failFrequency == 0) {
        currRetries = 0; failed = true
        throw new SuspendedException(null)
      }
      write(df)
    }
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
