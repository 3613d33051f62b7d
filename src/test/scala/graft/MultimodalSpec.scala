package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-codec multimodal paths: the fixtures synthesize genuinely
  * encoded PNG / RIFF-WAVE bytes and the decode kernels run the JDK's
  * actual codecs, so these tests assert exact round-trip values. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("pngBytes → decodeImages round-trips dimensions and channel means") {
    val docs = Seq(0L, 1L, 7L, 123L, 4096L).toDF("doc_id")
    val out = Multimodal.decodeImages(
        Multimodal.synthEncodedMedia(docs, "image"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L, 4096L)) {
      val r = out(id)
      assert(r.getInt(1) == 8 + (id % 8) * 2, s"width of $id")
      assert(r.getInt(2) == 8 + (id % 5) * 2, s"height of $id")
      assert(r.getDouble(3) == ((id % 256) + (id * 3 % 256)) / 2.0)
      assert(r.getDouble(4) == ((id * 7 % 256) + (id * 11 % 256)) / 2.0)
      assert(r.getDouble(5) == ((id * 13 % 256) + (id * 17 % 256)) / 2.0)
    }
    // the payloads really are PNG containers
    val magic = Multimodal.pngBytes(42L).take(8)
    assert(magic.sameElements(
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)))
  }

  test("wavBytes → decodeAudio round-trips format, frames, first sample") {
    val docs = Seq(3L, 801L).toDF("doc_id")
    val out = Multimodal.decodeAudio(
        Multimodal.synthEncodedMedia(docs, "audio"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 801L)) {
      val r = out(id)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 16 && r.getInt(3) == 1)
      assert(r.getLong(4) == 800 + id % 800, s"frames of $id")
      assert(r.getDouble(5) == (800 + id % 800) / 8.0)
      assert(r.getInt(6) == (id % 100) * 64)
    }
    val magic = new String(Multimodal.wavBytes(5L).take(4), "US-ASCII")
    assert(magic == "RIFF")
  }

  test("undecodable payloads quarantine as null fields, never fail the task") {
    val junk = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Array[Byte](1, 2, 3))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    val img = Multimodal.decodeImages(junk).collect()(0)
    assert(img.isNullAt(1) && img.isNullAt(3))
    val aud = Multimodal.decodeAudio(junk).collect()(0)
    assert(aud.isNullAt(1) && aud.isNullAt(6))
  }
}
