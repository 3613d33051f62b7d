package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode/feature-extraction kernel is STUBBED (no codec libs in this
  * container — see the deterministic fake in `stubDecode`); everything
  * Spark-side is real: schema, batch iteration via mapPartitions (the
  * Scala analogue of mapInPandas' arrow-batch contract), partition sizing,
  * and the typed output schema. Swapping `stubDecode` for a real JNI/FFI
  * decoder changes no plan shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),       // image | audio | video
    StructField("content", BinaryType),    // opaque encoded payload
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_ms", IntegerType)))  // duration for audio/video

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("content_sha", StringType),
    StructField("feature", ArrayType(DoubleType, containsNull = false)),
    StructField("frames_sampled", IntegerType)))

  /** Synthesize a deterministic media table from documents: the text bytes
    * stand in for an encoded payload (fixture role only). */
  def synthMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (col("n_chars") % 640).cast("int").as("meta_width"),
      (col("n_chars") % 480).cast("int").as("meta_height"),
      (col("n_chars") * 10).cast("int").as("meta_ms"))

  /** STUB decode kernel: a real implementation would FFI into an image/
    * audio codec here. The fake derives a deterministic 8-dim feature from
    * byte statistics so tests can assert exact values end-to-end. */
  def stubDecode(kind: String, content: Array[Byte]): (Array[Double], Int) = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < content.length) { hist((content(i) & 0xFF) % 8) += 1; i += 1 }
    val feat = hist.map(h => if (content.length == 0) 0.0
                             else math.round(h.toDouble / content.length * 1e6) / 1e6)
    val frames = kind match {
      case "video" => content.length / 1024 + 1   // ~1 "frame" per KiB
      case "audio" => content.length / 4096 + 1
      case _ => 1
    }
    (feat, frames)
  }

  /** Batch feature extraction over binary payloads: mapPartitions keeps
    * one decoder context per partition (the expensive init a real codec
    * needs), streams rows through it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (stub: nothing)
        rows.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val content = r.getAs[Array[Byte]](2)
          val (feat, frames) = stubDecode(kind, content)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(content).map("%02x".format(_)).mkString
          Row(id, kind, content.length, sha, feat, frames)
        }
      }(enc)
  }

  /** Frame sampling for video payloads: every Nth 1 KiB block becomes a
    * "frame" (stub for keyframe extraction); output one row per frame. */
  def sampleFrames(media: DataFrame, everyNth: Int): DataFrame = {
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(
          filter(
            transform(sequence(lit(0), (length(col("content")) / 1024).cast("int")),
              i => when(i % everyNth === 0, i)),
            x => x.isNotNull)))
      .select(col("media_id"), col("pos").as("frame_no"), col("col").as("block_offset_kib"))
  }
}
