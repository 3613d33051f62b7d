package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through a noop write
  * (count() alone would let Catalyst prune all projections away) and
  * prints the single JSON line the driver collects into BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // test parquet is a handful of ~10-30MB files; the 128MB default
      // split size would serialize every scan onto one core. At cluster
      // scale the default is right — this mirrors having many input files.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once so per-query numbers measure the plan,
    // not first-call classloading
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // optional args = subset of query names (local iteration aid)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(q => args.contains(q._1))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $dt%8.2fs")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // BASELINE.md anchor: end-to-end msgs/sec through the full ingest→
    // parse→filter→template pipeline (the 524,288-msg trial shape)
    val e2eRate = try {
      val nMsgs = Tables.events(spark, sfDir).count()
      val secs = results.toMap.getOrElse("pipeline_e2e", Double.NaN)
      if (secs > 0) nMsgs / secs else 0.0
    } catch { case _: Throwable => 0.0 }
    // BASELINE.md trial shape: 524,288 sequenced messages through the full
    // decode→filter→template→agg hot path. The input is materialized
    // (cached + counted) before the clock starts — the reference's
    // tcpflood generator also runs outside the measured engine — so this
    // measures sustained engine throughput, not per-query fixed overhead.
    val trialRate = try {
      import org.apache.spark.sql.functions._
      val nTrial = 524288L
      val raw = Queries.synthSyslog(spark, sfDir).select(col("rawmsg").as("value"))
      val nBase = math.max(1L, raw.count())
      val factor = ((nTrial + nBase - 1) / nBase).toInt
      val input = Seq.fill(factor)(raw).reduce(_ union _).limit(nTrial.toInt)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val actual = input.count()
      val decoded = graft.sources.Sources.decodeSyslog(input)
      val sevNames = array(Seq("emerg", "alert", "crit", "err", "warning",
        "notice", "info", "debug").map(lit): _*)
      val t0 = System.nanoTime()
      decoded
        .filter(graft.functions.rainer.prifilt("*.warning")(col("facility"), col("severity")))
        .withColumn("line", concat(
          date_format(col("ts"), "MMM "),
          lpad(date_format(col("ts"), "d"), 2, " "),
          date_format(col("ts"), " HH:mm:ss "),
          col("hostname"), lit(" "),
          col("syslogtag"), lit(" "),
          element_at(sevNames, col("severity") + 1), lit(": "), col("msg")))
        .groupBy(col("hostname"))
        .agg(count(lit(1)).as("n"), max(length(col("line"))).as("max_len"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      input.unpersist()
      System.err.println(f"[bench] trial_524288          $dt%8.2fs (${actual / dt}%.0f msgs/s)")
      actual / dt
    } catch { case e: Throwable =>
      System.err.println(s"[bench] trial failed: ${e.getMessage}"); 0.0
    }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_msgs_per_sec":$e2eRate%.0f,"trial_msgs":524288,"trial_msgs_per_sec":$trialRate%.0f}""")
    spark.stop()
  }
}
