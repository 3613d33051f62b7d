package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Image and audio decode are REAL: `decodeImages` runs javax.imageio
  * (PNG/JPEG/GIF/BMP/TIFF/WBMP — the JDK's own readers, present in this
  * container) and `decodeAudio` runs javax.sound.sampled (RIFF-WAVE/
  * PCM), each fed by a fixture that synthesizes genuinely ENCODED bytes
  * whose content is a closed-form function of the id — so the DuckDB
  * oracle asserts the decoded dimensions/means/durations analytically
  * and the correctness gate covers the full encode→decode round-trip.
  * Only video keeps a stub kernel (`stubDecode` — no video codec in the
  * container); its Spark-side plumbing (schema, mapPartitions batch
  * iteration, partition sizing, typed output) is identical to the real
  * paths, so swapping in a JNI/FFI video decoder changes no plan shape.
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

  // ------------------------------------------------------------------
  // REAL codec paths — javax.imageio (PNG/JPEG/GIF/BMP/TIFF/WBMP
  // readers ship in the JDK; probed present in this container) and
  // javax.sound.sampled (WAV/PCM). These replace the stub for the
  // image/audio kinds end-to-end: the fixture synthesizes REAL encoded
  // bytes (PNG / RIFF-WAVE), the decode kernel runs the REAL codec,
  // and because the fixture's pixel/sample content is a closed-form
  // function of the id, the DuckDB oracle can assert the decoded
  // dimensions, means, and durations analytically — a genuine
  // encode→decode round-trip under the correctness gate. Video keeps
  // the documented stub (no container codec for it).
  // ------------------------------------------------------------------

  /** Deterministic PNG: left half colorA, right half colorB (both
    * id-derived), even width — so decoded per-channel means are exactly
    * (a+b)/2, closed-form for the oracle. Lossless PNG ⇒ exact. */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val w = (8 + (id % 8) * 2).toInt
    val h = (8 + (id % 5) * 2).toInt
    def rgb(r: Long, g: Long, b: Long): Int =
      ((r.toInt & 0xFF) << 16) | ((g.toInt & 0xFF) << 8) | (b.toInt & 0xFF)
    val a = rgb(id % 256, id * 7 % 256, id * 13 % 256)
    val b = rgb(id * 3 % 256, id * 11 % 256, id * 17 % 256)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, if (x < w / 2) a else b); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM RIFF-WAVE: 8 kHz, id-derived frame
    * count and constant sample value (little-endian), so frame length,
    * duration, and the first decoded sample are closed-form. */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val n = (800 + id % 800).toInt
    val v = ((id % 100) * 64).toInt // constant 16-bit sample value
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real-encoded media fixture: one PNG and one WAV payload per doc.
    * mapPartitions (not a per-row UDF) so a real codec's per-task init
    * cost amortizes — the same batch contract as extractFeatures. */
  def synthEncodedMedia(docs: DataFrame, kind: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType)))
    val enc = RowEncoder.encoderFor(schema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, kind match {
          case "image" => pngBytes(id)
          case "video" => aviBytes(id)
          case _ => wavBytes(id)
        })
      }
    }(enc)
  }

  /** REAL image decode: javax.imageio sniffs the container format from
    * the bytes, decodes pixels; output = dimensions + exact per-channel
    * means. Undecodable payloads yield null fields (the quarantine
    * column pattern), never a task failure. */
  def decodeImages(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          catch { case _: java.io.IOException => null }
        if (img == null) Row(id, null, null, null, null, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          Row(id, w, h, sr / n, sg / n, sb / n)
        }
      }
    }(enc)
  }

  /** REAL audio decode: javax.sound parses the RIFF header and PCM
    * format; output = format fields, frame length, duration, first
    * decoded sample. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("dur_ms", DoubleType),
      StructField("first_sample", IntegerType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val f = ais.getFormat
          val frames = ais.getFrameLength
          // whole-frame read (single-byte read() is illegal at frame
          // size 2); little-endian 16-bit first sample
          val fr = new Array[Byte](2)
          ais.read(fr)
          val first = ((fr(0) & 0xFF) | (fr(1) << 8)).toShort.toInt
          Row(id, f.getSampleRate.toInt, f.getSampleSizeInBits,
            f.getChannels, frames,
            frames * 1000.0 / f.getSampleRate, first)
        } catch {
          case _: Exception => Row(id, null, null, null, null, null, null)
        }
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

  // ------------------------------------------------------------------
  // REAL video path — MJPEG-in-AVI. An AVI file is a RIFF container
  // (reference container handling: plugins/impcap parses link-layer
  // containers the same walk-a-length-prefixed-chunk way); MJPEG frames
  // are plain JPEG payloads in '00dc' chunks, decodable by the JDK's
  // own javax.imageio JPEG reader. So the full encode→container-walk→
  // per-frame-decode loop runs with ZERO external codecs: the fixture
  // writes genuine AVI bytes whose header fields and frame dimensions
  // are closed-form functions of the id, the kernel re-parses RIFF and
  // decodes every sampled frame, and the DuckDB oracle asserts the
  // header/dimension/count facts analytically. (Pixel VALUES stay out
  // of the oracle — JPEG is lossy; dimensions and structure are exact.)
  // ------------------------------------------------------------------

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ le32(data.length.toLong) ++ data ++ pad
  }

  private def list(typ: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(typ) ++ body)

  /** One solid-color JPEG frame (JDK imageio writer). */
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic MJPEG-AVI: id-derived frame count, dimensions, and
    * frame interval — all closed-form for the oracle. Dimensions are
    * multiples of 8 (JPEG MCU-friendly), frames are solid id/frame-
    * derived colors. */
  private[graft] def aviBytes(id: Long): Array[Byte] = {
    val nF = (2 + id % 4).toInt
    val w = (16 + (id % 4) * 8).toInt
    val h = (8 + (id % 3) * 8).toInt
    val usPf = (40000 + (id % 5) * 20000).toInt
    val frames = (0 until nF).map { i =>
      jpegFrame(w, h, (((id * 37 + i * 53) % 256).toInt << 16) |
        (((id * 11 + i * 29) % 256).toInt << 8) | ((id * 7 + i * 3) % 256).toInt)
    }
    val avih = chunk("avih", le32(usPf.toLong) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(nF.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
      le32(0) ++ le32(0) ++ le32(0) ++ // flags, prio+lang, initialFrames
      le32(usPf.toLong) ++ le32(1000000L) ++ // scale, rate => fps = rate/scale
      le32(0) ++ le32(nF.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++
      new Array[Byte](8)) // rcFrame
    val strf = chunk("strf", le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ fourcc("MJPG") ++
      le32((w * h * 3).toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  private def rdLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fccAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Minimal RIFF-AVI walk: returns (usPerFrame, headerW, headerH,
    * '00dc' frame payload slices) or null if not an AVI. Bounds-checked
    * — truncated/garbage payloads quarantine as null rows, never a task
    * failure. */
  private[graft] def parseAvi(b: Array[Byte]): (Long, Int, Int, Seq[Array[Byte]]) = {
    if (b.length < 12 || fccAt(b, 0) != "RIFF" || fccAt(b, 8) != "AVI ")
      return null
    var usPf = -1L; var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // Explicit range stack instead of recursion: crafted deeply-nested
    // LIST chunks can't overflow the JVM stack (a StackOverflowError is
    // not an Exception, so it would escape the quarantine catch). Chunk
    // lengths stay Long until range-checked: a 32-bit length >= 2^31
    // must not wrap negative (len = -7/-8 makes the advance zero — an
    // infinite loop) nor overflow dataOff + len past Int range.
    val stack = scala.collection.mutable.ArrayDeque.empty[(Int, Int)]
    stack.append((12, math.min(b.length.toLong,
      8L + rdLe32(b, 4)).toInt))
    while (stack.nonEmpty) {
      var (off, to) = stack.removeLast()
      var walking = true
      while (walking && off + 8 <= to) {
        val id = fccAt(b, off)
        val len = rdLe32(b, off + 4) // unsigned, 0 .. 2^32-1
        val dataOff = off + 8
        if (dataOff.toLong + len > to) walking = false // truncated: stop
        else {
          val lenI = len.toInt // safe: <= to - dataOff <= Int range
          val next = dataOff + lenI + (lenI % 2) // chunks pad to even
          id match {
            case "LIST" if lenI >= 4 =>
              // Depth-first like the recursive form: save the rest of
              // this range, descend into the list body (skip list type).
              stack.append((next, to))
              off = dataOff + 4; to = dataOff + lenI
            case other =>
              other match {
                case "avih" if lenI >= 40 =>
                  usPf = rdLe32(b, dataOff)
                  w = rdLe32(b, dataOff + 32).toInt
                  h = rdLe32(b, dataOff + 36).toInt
                case "00dc" =>
                  frames += java.util.Arrays.copyOfRange(b, dataOff, dataOff + lenI)
                case _ =>
              }
              off = next
          }
        }
      }
    }
    if (usPf < 0) null else (usPf, w, h, frames.toSeq)
  }

  /** REAL video decode: RIFF/AVI container walk + per-frame JPEG decode
    * through javax.imageio. Output = header facts (dimensions, frame
    * interval, duration) + the decoded-frame count and first decoded
    * frame's dimensions — the structural loop the oracle can assert
    * exactly (pixel values are lossy-JPEG territory and stay out). */
  def decodeVideo(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("us_per_frame", LongType),
      StructField("dur_ms", LongType),
      StructField("frames_decoded", IntegerType),
      StructField("first_w", IntegerType),
      StructField("first_h", IntegerType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val parsed =
          try parseAvi(r.getAs[Array[Byte]](1))
          catch { case _: Exception => null }
        if (parsed == null) Row(id, null, null, null, null, null, null, null, null)
        else {
          val (usPf, w, h, frames) = parsed
          val decoded = frames.flatMap { f =>
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f)))
            catch { case _: java.io.IOException => None }
          }
          val (fw, fh) = decoded.headOption
            .map(i => (i.getWidth, i.getHeight)).getOrElse((-1, -1))
          Row(id, w, h, frames.length, usPf,
            frames.length.toLong * usPf / 1000L, decoded.length,
            if (fw < 0) null else fw, if (fh < 0) null else fh)
        }
      }
    }(enc)
  }

  /** REAL keyframe sampling: every `everyNth` '00dc' frame of the AVI is
    * decoded; one output row per sampled frame with its decoded
    * dimensions — the production frame-sample shape (decode only what
    * the sample keeps). */
  def sampleVideoFrames(media: DataFrame, everyNth: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_w", IntegerType),
      StructField("frame_h", IntegerType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("media_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val parsed =
          try parseAvi(r.getAs[Array[Byte]](1))
          catch { case _: Exception => null }
        if (parsed == null) Iterator.empty
        else parsed._4.iterator.zipWithIndex
          .filter(_._2 % everyNth == 0)
          .map { case (f, i) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
              catch { case _: java.io.IOException => null }
            if (img == null) Row(id, i, null, null)
            else Row(id, i, img.getWidth, img.getHeight)
          }
      }
    }(enc)
  }
}
