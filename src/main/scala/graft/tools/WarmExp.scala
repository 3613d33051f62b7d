package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch experiment: does a tiny-corpus (sf0.001) warm-up run of a
  * query recover the post-warmup steady state for its sf10 execution
  * in a fresh JVM? (Cold first-execution of dedup_verified at sf10
  * measured 234 s vs a 31 s post-warmup standalone median — if the
  * cost is janino/JIT, the same plan SHAPE at toy scale should pay it.) */
object WarmExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "512k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(args.headOption.getOrElse("dedup_verified"))
    val skipWarm = args.contains("--no-warm")
    def run(dir: String): Double = {
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    if (!skipWarm) {
      val w = run("/root/testdata/sf0.001")
      System.err.println(f"[warmexp] sf0.001 warm-up: $w%.2fs")
    }
    val t = run("/tmp/graft_sf10")
    System.err.println(f"[warmexp] sf10 run: $t%.2fs")
    val t2 = run("/tmp/graft_sf10")
    System.err.println(f"[warmexp] sf10 second run: $t2%.2fs")
  }
}
