package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.sources.ReliableSink
import graft.sources.ReliableSink.RetryPolicy

class ReliableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(1, 2, 3).toDF("x")

  test("retry succeeds after transient failures") {
    val attempts = new AtomicInteger(0)
    val fellBack = new AtomicInteger(0)
    val ok = ReliableSink.writeWithRetry(df,
      write = _ => if (attempts.incrementAndGet() < 3)
        throw new RuntimeException("transient"),
      fallback = _ => fellBack.incrementAndGet(),
      RetryPolicy(maxRetries = 3, resumeIntervalMs = 1))
    assert(ok)
    assert(attempts.get() == 3)
    assert(fellBack.get() == 0)
  }

  test("permanent failure routes batch to dead-letter fallback") {
    val attempts = new AtomicInteger(0)
    var deadLetterRows = 0L
    val ok = ReliableSink.writeWithRetry(df,
      write = _ => { attempts.incrementAndGet(); throw new RuntimeException("down") },
      fallback = b => deadLetterRows = b.count(),
      RetryPolicy(maxRetries = 2, resumeIntervalMs = 1))
    assert(!ok)
    assert(attempts.get() == 3) // initial + 2 retries
    assert(deadLetterRows == 3)
  }

  test("foreachBatch adapter persists and unpersists") {
    val fn = ReliableSink.foreachBatchWithRetry(
      write = _ => (), fallback = _ => (), RetryPolicy(resumeIntervalMs = 1))
    val d = df
    fn(d, 0L)
    assert(d.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
