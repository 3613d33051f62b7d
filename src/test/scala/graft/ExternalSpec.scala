package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{External, ProcessWorker}

/** mmexternal/omprog REAL child-process worker: line protocol through an
  * actual subprocess, crash-restart, confirm handshake, orphan reaping
  * (plugins/mmexternal/mmexternal.c, plugins/omprog/omprog.c). */
class ExternalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ProcessWorker round-trips lines through a real subprocess") {
    val w = new ProcessWorker(Seq("cat"))
    try {
      assert(w("""{"msg":"hello"}""") == """{"msg":"hello"}""")
      assert(w("""{"msg":"again"}""") == """{"msg":"again"}""")
      assert(w.restarts == 0)
    } finally w.close()
  }

  test("ProcessWorker restarts a crashing child and resends the message") {
    // child handles exactly one line then dies: every subsequent message
    // hits EOF → restart → resend (omprog.c EPIPE/readStatus paths)
    val w = new ProcessWorker(
      Seq("sh", "-c", "read l; echo \"$l\"; exit 1"), maxRestarts = 5)
    try {
      assert(w("a") == "a")
      assert(w("b") == "b") // first send sees the dead child, restarts
      assert(w("c") == "c")
      assert(w.restarts == 2)
    } finally w.close()
    // past maxRestarts the worker gives up (task failure = action suspend)
    val w2 = new ProcessWorker(
      Seq("sh", "-c", "read l; echo \"$l\"; exit 1"), maxRestarts = 1)
    try {
      assert(w2("a") == "a")
      assert(w2("b") == "b")
      intercept[java.io.IOException] { w2("c") }
    } finally w2.close()
  }

  test("omprog confirm handshake: startup status + per-message confirm") {
    // program emits one init line before the first message (omprog.c
    // startChild), then one status line per message; dots are keep-alive
    val w = new ProcessWorker(
      Seq("sh", "-c", "echo READY; while read l; do echo ...OK; done"),
      confirmStartup = true)
    try {
      assert(w.startupStatus.contains("READY"))
      assert(External.statusOk(w("msg one")))
      assert(External.statusOk(w("msg two")))
    } finally w.close()
    assert(External.statusOk("OK"))
    assert(External.statusOk("....DEFER_COMMIT"))
    assert(External.statusOk("PREVIOUS_COMMITTED"))
    assert(!External.statusOk("Error: could not write"))
  }

  test("pipeProgram transforms a DataFrame through a real subprocess and reaps it") {
    val df = spark.range(20)
      .select(col("id"), concat(lit("""{"n":"""), col("id"), lit("}")).as("vars"))
    // sed as the external program, as the reference docs demo;
    // -u = line-buffered so each reply flushes per message
    val out = External.pipeProgram(df, "vars",
      Seq("sed", "-u", "s/n/m/")).collect()
    assert(out.length == 20)
    assert(out.map(r => r.getString(1)).toSet ==
      (0 until 20).map(i => s"""{"m":$i}""").toSet)
    // orphan reap: task-completion hook closed every worker → no child
    // `sed` of ours survives the job (check our own process tree)
    val pids = new java.io.File("/proc").listFiles()
      .filter(f => f.getName.forall(_.isDigit))
      .filter { f =>
        try {
          val cmdline = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/${f.getName}/cmdline"))
          new String(cmdline).contains("s/n/m/")
        } catch { case _: java.io.IOException => false }
      }
    assert(pids.isEmpty, s"leaked sed workers: ${pids.map(_.getName).mkString(",")}")
  }
}
