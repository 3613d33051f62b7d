package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries —
  * used to audit pushdown (PushedFilters/ReadSchema), broadcast joins,
  * and WholeStageCodegen spans before accepting a plan.
  * Usage: sbt "runMain graft.Explain [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", "graft-explain")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n================= $n =================")
      try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"error: ${e.getMessage}") }
    }
    spark.stop()
  }
}
