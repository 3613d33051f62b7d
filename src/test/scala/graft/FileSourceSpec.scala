package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** imfile-lite / omfile round trip through real files — the file-source
  * analogue of the reference's startup→inject→assert testbench pattern.
  */
class FileSourceSpec extends SparkSpec {

  test("file source → decode → template → file sink round trip") {
    val inDir = Files.createTempDirectory("graft_in").toFile
    val outDir = new java.io.File(
      Files.createTempDirectory("graft_out").toFile, "out")
    val lines = (0 until 100).map(i =>
      f"<${8 * (i % 24) + i % 8}%d>Mar  1 01:00:00 host$i%d app[$i%d]: msgnum:$i%08d:")
    Files.write(new java.io.File(inDir, "a.log").toPath,
      String.join("\n", lines: _*).getBytes)

    val decoded = Sources.decodeSyslog(Sources.fileLines(spark, inDir.getAbsolutePath))
    assert(decoded.count() == 100)
    assert(decoded.filter(col("parsesuccess")).count() == 100)
    assert(decoded.filter(col("hostname").startsWith("host")).count() == 100)

    val rendered = decoded.withColumn("line",
      graft.templates.TemplateCompiler.compile(
        "%hostname% %syslogtag%%msg%", col))
    Sources.omfileText(rendered, "line", outDir.getAbsolutePath)
    val back = spark.read.text(outDir.getAbsolutePath)
    assert(back.count() == 100)
    // msg keeps its leading space (reference semantics) -> "]: msgnum"
    assert(back.filter(col("value").rlike("^host\\d+ app\\[\\d+\\]: msgnum:")).count() == 100)
  }

  test("reception sanitize: CR-drop option, control-char octal escaping default") {
    import spark.implicits._
    val lines = Seq("<13>Mar  1 01:00:00 h a: m\r").toDF("value")
    // default: CR kept (drop is opt-in) and escaped #015 (EscapeCCOnRcv=1)
    val kept = Sources.decodeSyslog(lines).collect()(0)
    assert(kept.getAs[String]("msg") == " m#015")
    val dropped = Sources.decodeSyslog(lines, dropTrailingCr = true).collect()(0)
    assert(dropped.getAs[String]("msg") == " m")
    // tab escapes as #011 (snare's wire format under default settings);
    // 8-bit chars pass through (Escape8BitCharacters default off)
    val tab = Seq("<13>Mar  1 01:00:00 h a: x\ty ü").toDF("value")
    val t = Sources.decodeSyslog(tab).collect()(0)
    assert(t.getAs[String]("msg") == " x#011y ü")
    val ccoff = Sources.decodeSyslog(tab, escapeControlCharacters = false).collect()(0)
    assert(ccoff.getAs[String]("msg") == " x\ty ü")
  }

  test("dynafile ≡ partitioned write by computed columns") {
    val outDir = new java.io.File(
      Files.createTempDirectory("graft_dyna").toFile, "part")
    import spark.implicits._
    val df = Seq((0, "err", "m0"), (1, "info", "m1"), (2, "err", "m2"))
      .toDF("id", "sev", "msg")
    Sources.omfilePartitioned(df, outDir.getAbsolutePath, Seq("sev"))
    val dirs = outDir.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("sev=err", "sev=info"))
    assert(spark.read.parquet(outDir.getAbsolutePath).count() == 3)
  }

  test("streaming fileTail processes appended files") {
    val inDir = Files.createTempDirectory("graft_stream").toFile
    Files.write(new java.io.File(inDir, "one.log").toPath,
      "<13>Mar  1 01:00:00 h1 a: first\n<13>Mar  1 01:00:00 h2 b: second".getBytes)
    val q = Sources.decodeSyslog(Sources.fileTail(spark, inDir.getAbsolutePath))
      .writeStream.format("memory").queryName("tail_out").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tail_out")
    assert(out.count() == 2)
    assert(out.filter(col("msg") === " first").count() == 1)
  }
}
