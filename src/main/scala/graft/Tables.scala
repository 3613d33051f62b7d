package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS) which Spark
  * cannot read natively; we flip `spark.sql.legacy.parquet.nanosAsLong`
  * and expose both the raw nanosecond long (`ts_ns`) and a derived
  * microsecond TIMESTAMP (`ts`), matching DuckDB's ns→µs cast truncation.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Post-scan rebalance for split-starved inputs. The test corpus is
    * single-file single-ROW-GROUP parquet — unsplittable below the row
    * group, so however small `maxPartitionBytes` is, the scan (and any
    * shuffle-free per-row pipeline above it, which is most of this
    * engine's parse/template/enrich surface) runs on ONE core. A real
    * deployment's tables arrive as thousands of splits and must NOT pay
    * a full-data shuffle here, so the round-robin redistribute is
    * DOUBLE-gated: skipped past 1 GiB (a real table), and skipped when
    * the parquet footers show enough ROW GROUPS for the scan itself to
    * parallelize (the v5 synth corpora write 512 KiB row groups exactly so
    * scans split without paying this shuffle — repartitioning those was
    * a measured ~1s/query waste at sf1). Row order is not part of any
    * oracle contract (the driver sorts rows before hashing; ordered
    * operators order by explicit columns).
    */
  private val rowGroupCache = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Total parquet row groups under `path` (file or dir), cached by
    * (path, mtime, size) so a re-synthesized corpus re-counts. Footer
    * reads are a few ms, driver-side, once per table per corpus. */
  private def rowGroupCount(spark: SparkSession, path: String): Int = {
    val p = new java.io.File(path)
    val key = s"$path:${p.lastModified}:${p.length}"
    rowGroupCache.getOrElseUpdate(key, {
      try {
        val files =
          if (p.isFile) Seq(p)
          else p.listFiles().filter(f => f.isFile &&
            f.getName.endsWith(".parquet")).toSeq
        val conf = spark.sessionState.newHadoopConf()
        files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size finally r.close()
        }.sum
      } catch { case _: Throwable => Int.MaxValue }
    })
  }

  private def rebalance(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val p = new java.io.File(path)
    val bytes: Long =
      if (p.isFile) p.length()
      else if (p.isDirectory)
        p.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length()).sum
      else Long.MaxValue
    val par = spark.sparkContext.defaultParallelism
    // the scan's real parallelism is bounded BOTH by row groups (parquet
    // only splits at group boundaries) and by the byte-range split size
    // (Spark emits ceil(bytes/maxPartitionBytes) ranges) — gating on row
    // groups alone put a 104-group 9 MiB file on 3 cores at 4 MiB splits
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val effectiveSplits = math.min(
      rowGroupCount(spark, path).toLong,
      (bytes + maxSplit - 1) / maxSplit)
    if (bytes < (1L << 30) && effectiveSplits < math.max(4, par / 2))
      df.repartition(par)
    else df
  }

  /** events with ts normalized: ts_ns LONG, ts TIMESTAMP (µs, UTC).
    * Schema-adaptive: the driver corpus has shipped `ts` both as INT64
    * TIMESTAMP(NANOS) (read as LONG under nanosAsLong) and as plain
    * µs TIMESTAMP — both normalize to the same (ts_ns, ts) pair, so
    * queries and oracles are corpus-revision-independent. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val raw = rebalance(spark, spark.read.parquet(path), path)
    val norm = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // µs timestamp (NTZ or LTZ; session tz is UTC everywhere)
        val tsCol = col("ts").cast("timestamp")
        raw.withColumn("ts_ns", unix_micros(tsCol) * 1000)
          .withColumn("ts", tsCol)
    }
    // fixed column order regardless of corpus revision (the two branches
    // would otherwise place ts/ts_ns differently — visible to
    // star-selects if the corpus flips back)
    val others = raw.columns.filter(_ != "ts")
    norm.select(others.map(col) :+ col("ts_ns") :+ col("ts"): _*)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  // documents/embeddings feed the per-row-expensive dedup/text/ANN
  // pipelines — split-starved inputs get the gated rebalance. The TPC-H
  // tables above stay pure scans: their queries are columnar scan-aggs
  // where map-side combine beats paying a full-row shuffle.
  def documents(spark: SparkSession, dir: String): DataFrame =
    rebalance(spark, apply(spark, dir, "documents"), s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    rebalance(spark, apply(spark, dir, "embeddings"), s"$dir/embeddings.parquet")
}

/** Session factory with the engine's standard tuning. AQE on so
  * skew/coalesce replanning works at scale the same way it would on a
  * real cluster. The two scale-dependent knobs are env-parameterised
  * (r15, guide §2/§6 — never bake a local constant into a setting
  * whose right value is cluster-dependent) with local-mode defaults:
  *
  *  - `SPARK_GRAFT_SHUFFLE_PARTITIONS` (default 32): matches local[32]
  *    and this sandbox's ~10–30 MB test tables. On a cluster, size so
  *    post-shuffle partitions land in the 100 MB–1 GB band (guide
  *    §2.2) — AQE coalescing then trims the excess at runtime.
  *  - `SPARK_GRAFT_MAX_PARTITION_BYTES` (default 4m): the test parquet
  *    is a handful of small files; the 128 MB default would serialize
  *    every scan onto one core. On a cluster keep the default or go
  *    BIGGER (512m–1g) for large sequential scans (guide §6).
  */
object GraftSession {
  def apply(master: String = "local[*]", appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
