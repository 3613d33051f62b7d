package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Dev probe (VERDICT r15 #2): stage-level timing of nearDupVerified at
  * a given SF dir — names which stage owns the wall time (signature
  * checkpoint, banding+candidate checkpoint, verify-width count, pair
  * join + exact verify) instead of one opaque query-level number.
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt "runMain graft.tools.DedupProbe"
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[" +
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]", "graft-dedupprobe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sc = spark.sparkContext
    def t[A](label: String)(f: => A): A = {
      sc.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    for (rep <- 1 to reps) {
      System.err.println(s"[probe] --- rep $rep")
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val (n, bands, rows, maxBucket, minJaccard) = (3, 16, 4, 1024, 0.5)
      val k = bands * rows
      val src = t("preDedup groupBy") {
        docs.groupBy(md5(lower(col("text"))).as("g"))
          .agg(min(struct(col("doc_id").as("doc"), col("text").as("t"))).as("m"))
          .select(col("m.doc").as("doc_id"), col("m.t").as("text"))
          .localCheckpoint()
      }
      val par = spark.sparkContext.defaultParallelism
      val withSig = t("signature checkpoint") {
        src.select(col("doc_id").as("doc"), col("text").as("t"))
          .repartition(par)
          .withColumn("sig",
            graft.operators.Dedup.minhashTextSignature(col("t"), n, k))
          .filter(col("sig").isNotNull)
          .select(col("doc"), col("sig"))
          .localCheckpoint()
      }
      val banded = withSig.select(
        col("doc"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cand = t("banding + cand checkpoint") {
        // bucketPairs replica (private[operators]): O(m) two-step pair
        // explode over sorted bucket members
        banded.groupBy(col("band"), col("bucket"))
          .agg(sort_array(collect_list(struct(col("doc")))).as("ms"))
          .filter(size(col("ms")) > 1 && size(col("ms")) <= maxBucket)
          .select(col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
          .select(col("a"), explode(
            slice(col("ms"), col("i") + lit(2),
              size(col("ms")) - col("i") - 1)).as("b"))
          .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
          .distinct()
          .localCheckpoint()
      }
      val nCand = t("cand count")(cand.count())
      System.err.println(s"[probe] candidate pairs: $nCand")
      val verifyParts = math.max(
        spark.conf.get("spark.sql.shuffle.partitions", "200").toInt,
        (nCand / 25000L).toInt)
      System.err.println(s"[probe] verifyParts: $verifyParts")
      t("verify join + jaccard") {
        val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("doc"))
          .distinct()
        val txt = docs.select(col("doc_id").as("doc"), col("text").as("t"))
          .join(ids, Seq("doc"), "left_semi")
        cand.repartition(verifyParts, col("id_a"))
          .join(txt.select(col("doc").as("id_a"), col("t").as("t_a"))
            .repartition(verifyParts, col("id_a")), "id_a")
          .repartition(verifyParts, col("id_b"))
          .join(txt.select(col("doc").as("id_b"), col("t").as("t_b"))
            .repartition(verifyParts, col("id_b")), "id_b")
          .withColumn("jacc", org.apache.spark.sql.GraftBridge.column(
            graft.functions.JaccardTextsExpr(
              org.apache.spark.sql.GraftBridge.expression(col("t_a")),
              org.apache.spark.sql.GraftBridge.expression(col("t_b")), n)))
          .filter(col("jacc") >= minJaccard)
          .select(col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      // full operator end-to-end for the same rep, for the total
      t("nearDupVerified end-to-end") {
        graft.operators.Dedup.nearDupVerified(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
