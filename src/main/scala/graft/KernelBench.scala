package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool (guide §1: measure first, interleaved A/B): time an
  * optimized formulation against the declarative/naive one it replaced
  * INSIDE ONE JVM, strictly alternating trials so host-contention
  * drift hits both sides equally — the sandbox hosts swing 2-4× within
  * minutes, which poisons cross-process A/B medians (r15 measured a
  * 3.2× host_factor shift between two back-to-back bench runs). noop
  * sink, per-trial seconds + medians + the median of PAIRWISE ratios
  * (the drift-robust statistic).
  * Usage: sbt "runMain graft.KernelBench [reps] [pair ...]"
  * Pairs: windows, windows_long, rag
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val which = if (args.length > 1) args.drop(1).toSet
                else Set("windows", "windows_long", "rag")
    val spark = GraftSession("local[" +
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]", "graft-kernelbench")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .localCheckpoint() // time the formulations, not the parquet read
    // realistic-length documents (sf corpora average ~300 chars; web
    // documents are KBs): same corpus, text ×8
    val longDocs = docs.select(col("doc_id"),
        concat_ws(" ", array_repeat(col("text"), 8)).as("text"))
      .localCheckpoint()
    val w = 120

    def declWindows(src: DataFrame) = src.select(col("doc_id").as("doc"),
        explode(expr(
          s"CASE WHEN length(text) < $w THEN array() " +
          s"ELSE transform(sequence(1, length(text) - ${w - 1}), " +
          s"i -> substring(text, i, $w)) END")).as("w"))
      .filter(substring(md5(col("w")), 32, 1) === "0")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

    def kernWindows(src: DataFrame) = src.select(col("doc_id").as("doc"),
        explode(org.apache.spark.sql.GraftBridge.column(
          graft.functions.SelectWindowsExpr(
            org.apache.spark.sql.GraftBridge.expression(col("text")), w))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

    // rag_retrieve compositions: double-pass (pre-r15: bm25TopK rebuilds
    // the chunk projection for the stats agg AND the matched scan) vs
    // the single-scan checkpointed chunk token projection
    def chunks = operators.Sampling.chunkByTokens(docs, "doc_id", "text",
        chunkTokens = 64, overlapTokens = 16)
      .select((col("doc_id") * lit(1000000L) + col("chunk_idx")).as("pid"),
        col("chunk_text"))
    def ragOld = operators.TextAnalysis.bm25TopK(chunks, "pid", "chunk_text",
      operators.TextAnalysis.keywordQueries(docs, "doc_id", "text"))
    def ragNew = {
      val ctoks = chunks
        .select(col("pid").as("doc_id"),
          operators.TextAnalysis.tokens(col("chunk_text")).as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
        .localCheckpoint()
      operators.TextAnalysis.bm25TopKFromToks(ctoks,
        operators.TextAnalysis.keywordQueries(docs, "doc_id", "text"))
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, before: => DataFrame, after: => DataFrame): Unit = {
      time(before); time(after) // untimed warm-up
      val (bT, aT) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
      for (i <- 0 until reps) {
        spark.sparkContext.setJobDescription(s"$name before #$i")
        bT(i) = time(before)
        spark.sparkContext.setJobDescription(s"$name after #$i")
        aT(i) = time(after)
      }
      def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
      val ratios = bT.zip(aT).map { case (b, a) => b / a }
      println(f"""{"kernel_bench":"$name","reps":$reps,""" +
        f""""before_s":[${bT.map(t => f"$t%.3f").mkString(",")}],""" +
        f""""after_s":[${aT.map(t => f"$t%.3f").mkString(",")}],""" +
        f""""before_median_s":${med(bT)}%.3f,""" +
        f""""after_median_s":${med(aT)}%.3f,""" +
        f""""median_pairwise_speedup":${med(ratios)}%.2f}""")
    }
    if (which("windows")) run("select_windows",
      declWindows(docs), kernWindows(docs))
    if (which("windows_long")) run("select_windows_8x_docs",
      declWindows(longDocs), kernWindows(longDocs))
    if (which("rag")) run("rag_single_scan", ragOld, ragNew)
    spark.stop()
  }
}
