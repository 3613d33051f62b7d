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

  test("omtesting 'fail F R': every F-th call suspends, R probes resume (omtesting.c:123-155)") {
    val written = new AtomicInteger(0)
    val inj = new ReliableSink.OmtestingInjector(failFrequency = 2, resumeAfter = 2)
    val w = inj.wrap(_ => written.incrementAndGet())
    def deliver(): Boolean = ReliableSink.writeWithRetry(df, w,
      fallback = _ => (), RetryPolicy(maxRetries = 4, resumeIntervalMs = 1))
    // call 1: 1 % 2 != 0 → writes
    assert(deliver() && written.get() == 1)
    // call 2: suspends; probe 1 suspends; probe 2 resumes; call 3 writes
    assert(deliver() && written.get() == 2)
    // call 4: suspends again (the counter kept moving), same ladder
    assert(deliver() && written.get() == 3)
  }

  test("omtesting always_suspend exhausts retries into dead-letter") {
    val fellBack = new AtomicInteger(0)
    val inj = new ReliableSink.OmtestingInjector(1, 1, alwaysSuspend = true)
    val ok = ReliableSink.writeWithRetry(df, inj.wrap(_ => ()),
      fallback = _ => fellBack.incrementAndGet(),
      RetryPolicy(maxRetries = 2, resumeIntervalMs = 1))
    assert(!ok && fellBack.get() == 1)
  }

  test("mmexternal pipe: per-partition worker transforms the JSON tree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, """{"a":1}"""), (2L, """{"a":2}"""), (3L, null))
      .toDF("id", "vars")
    // worker = the external program stand-in: wraps the tree
    val out = graft.operators.External.pipeJson(df, "vars",
      () => (in: String) => s"""{"seen":true,"orig":$in}""")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == """{"seen":true,"orig":{"a":1}}""")
    assert(rows(2).getString(1) == """{"seen":true,"orig":{}}""") // null → {}
  }

  test("impstats-style observe metrics surface per action") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        qe.observedMetrics.get("ingest").foreach { row =>
          metrics.add((row.getAs[Long]("n_processed"), row.getAs[Long]("n_parse_fail")))
        }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq(("a", true), ("b", false), ("c", true))
        .toDF("msg", "parsesuccess")
      graft.sources.Sources.withStats(df, "ingest").collect()
      // QueryExecutionListener callbacks are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (metrics.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(!metrics.isEmpty, "no observed metrics delivered")
      val (n, fails) = metrics.peek()
      assert(n == 3 && fails == 1)
    } finally spark.listenerManager.unregister(listener)
  }

  test("foreachBatch adapter persists and unpersists") {
    val fn = ReliableSink.foreachBatchWithRetry(
      write = _ => (), fallback = _ => (), RetryPolicy(resumeIntervalMs = 1))
    val d = df
    fn(d, 0L)
    assert(d.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
