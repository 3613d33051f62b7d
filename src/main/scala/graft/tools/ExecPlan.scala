package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: execute a named query (noop sink) and print the FINAL
  * adaptive plan — `Explain` shows the initial plan
  * (isFinalPlan=false), but AQE join-strategy decisions (e.g.
  * dedup_lines' broadcast-vs-shuffled anti, VERDICT r15 #5) only exist
  * after execution.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.ExecPlan <query ...>"
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[" +
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]", "graft-execplan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      println(s"\n================= $n (executed, $dir) =================")
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        spark.sparkContext.setJobDescription(s"execplan: $n")
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable => println(s"error: ${e.getMessage}") }
    }
    spark.stop()
  }
}
