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

  test("video: MJPEG-AVI round-trip — container facts and decoded dims are id-derived") {
    val docs = Seq(0L, 7L, 123L).toDF("doc_id")
    val out = Multimodal.decodeVideo(
        Multimodal.synthEncodedMedia(docs, "video"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 7L, 123L)) {
      val r = out(id)
      val (w, h, nF) = ((16 + (id % 4) * 8).toInt, (8 + (id % 3) * 8).toInt,
        (2 + id % 4).toInt)
      val usPf = 40000 + (id % 5) * 20000
      assert(r.getInt(1) == w && r.getInt(2) == h, s"header dims of $id")
      assert(r.getInt(3) == nF && r.getLong(4) == usPf)
      assert(r.getLong(5) == nF * usPf / 1000)
      // EVERY frame must decode through the real JPEG reader, and the
      // decoded dimensions must match the container header
      assert(r.getInt(6) == nF, s"frames_decoded of $id")
      assert(r.getInt(7) == w && r.getInt(8) == h)
    }
    val magic = new String(Multimodal.aviBytes(5L).take(4), "US-ASCII")
    assert(magic == "RIFF")
  }

  test("video: keyframe sampling decodes every Nth frame only") {
    val docs = Seq(3L).toDF("doc_id") // 2 + 3%4 = 5 frames; sample 0, 2, 4
    val rows = Multimodal.sampleVideoFrames(
        Multimodal.synthEncodedMedia(docs, "video"), everyNth = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).sorted
    assert(rows.toSeq == Seq((0, 40, 8), (2, 40, 8), (4, 40, 8)))
  }

  test("video: garbage and truncated payloads quarantine, never fail") {
    assert(Multimodal.parseAvi(Array[Byte](1, 2, 3)) == null)
    val good = Multimodal.aviBytes(9L)
    // truncation mid-movi: the walk stops at the broken chunk; whatever
    // parsed stays usable (header), frames list may be shorter
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 7)
    val p = Multimodal.parseAvi(cut)
    assert(p == null || p._2 == 24) // header-only parse is acceptable
  }

  test("video: hostile chunk lengths and deep LIST nesting terminate") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    // A 32-bit chunk length >= 2^31 used to wrap negative through .toInt:
    // len = 0xFFFFFFF9 (-7 as Int) passed the truncation guard and made
    // the chunk advance ZERO — an infinite loop pinning the executor.
    val evil = fcc("RIFF") ++ le32(0xFFFFFFFFL) ++ fcc("AVI ") ++
      fcc("JUNK") ++ le32(0xFFFFFFF9L) ++ new Array[Byte](32)
    val t0 = System.nanoTime()
    assert(Multimodal.parseAvi(evil) == null)
    assert((System.nanoTime() - t0) < 5e9, "hostile AVI must not spin")
    // Deeply nested LISTs: the recursive walker overflowed the JVM stack
    // (StackOverflowError escapes a `catch Exception` quarantine). The
    // explicit-stack walker is depth-immune.
    val depth = 200000
    val innerLen = 12 // each LIST: 4-byte type + one empty JUNK chunk
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(fcc("RIFF")); bos.write(le32(12L * depth + 12))
    bos.write(fcc("AVI "))
    var remaining = depth
    while (remaining > 0) {
      bos.write(fcc("LIST"))
      bos.write(le32(innerLen.toLong + 12L * (remaining - 1)))
      bos.write(fcc("rec "))
      remaining -= 1
    }
    bos.write(fcc("JUNK")); bos.write(le32(0))
    assert(Multimodal.parseAvi(bos.toByteArray) == null) // no avih → null
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
