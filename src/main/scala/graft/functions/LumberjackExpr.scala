package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lumberjack v2 (Beats transport) session-stream decode — one pass over
  * the raw bytes of a session, returning every JSON data event as
  * (seq, payload) in arrival order. Wire grammar per
  * plugins/imbeats/lj_parser.c parse_frames_from_memory /
  * imbeats.c:940-1000: frames are `2W` + uint32BE window-size, `2J` +
  * uint32BE seq + uint32BE length + JSON payload, `2C` + uint32BE length
  * + zlib payload that inflates to a sequence of `2J` frames ONLY
  * (nested `2C` rejected, lj_parser.c:219-223). Events past the
  * announced window, oversized frames, inflation past the size or
  * compression-ratio guards (lj_parser.c lj_parse_compressed_frames),
  * a sequence number that is not strictly sequential from 1 across the
  * session (imbeats_seq_is_expected, seqnum.h:28-34 with lastAckedSeq
  * advancing per acked window), or any malformed frame invalidate the
  * whole stream → SQL null, the set analogue of the reference's
  * validate-the-complete-batch-before-submitting rule
  * (imbeats.c sessionValidateBatch:785-815).
  */
case class LumberjackBatchExpr(child: Expression,
                               maxWindowSize: Int = 1024,
                               maxFrameSize: Long = 10L * 1024 * 1024,
                               maxDecompressedSize: Long = 64L * 1024 * 1024,
                               maxCompressionRatio: Int = 256)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("seq", LongType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lumberjack_batch"

  override protected def nullSafeEval(input: Any): Any =
    LumberjackBatchExpr.kernel(input.asInstanceOf[Array[Byte]],
      maxWindowSize, maxFrameSize, maxDecompressedSize, maxCompressionRatio)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.LumberjackBatchExpr$$.MODULE$$.kernel(
         |    $c, $maxWindowSize, ${maxFrameSize}L, ${maxDecompressedSize}L,
         |    $maxCompressionRatio);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LumberjackBatchExpr {
  private final val V2 = '2'.toByte
  private final val W = 'W'.toByte
  private final val J = 'J'.toByte
  private final val C = 'C'.toByte

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** null = malformed stream (whole-batch reject). */
  def kernel(buf: Array[Byte], maxWindow: Int, maxFrame: Long,
             maxDecompressed: Long, maxRatio: Int): ArrayData = {
    val out = new java.util.ArrayList[InternalRow]()
    // windowSize 0 = no 2W seen yet; the reference requires a window
    // announcement before counting events against it (imbeats.c:952)
    var windowSize = 0L
    var off = 0
    val len = buf.length
    while (off + 2 <= len) {
      if (buf(off) != V2) return null
      val typ = buf(off + 1)
      off += 2
      typ match {
        case W =>
          if (off + 4 > len) return null
          windowSize = u32(buf, off); off += 4
          if (windowSize == 0 || windowSize > maxWindow) return null
        case J =>
          if (off + 8 > len) return null
          val seq = u32(buf, off)
          val plen = u32(buf, off + 4)
          off += 8
          if (plen == 0 || plen > maxFrame || plen > len - off) return null
          if (windowSize == 0 || out.size >= windowSize) return null
          if (seq != ((out.size + 1L) & 0xffffffffL)) return null
          out.add(InternalRow(seq,
            UTF8String.fromBytes(buf, off, plen.toInt)))
          off += plen.toInt
        case C =>
          if (off + 4 > len) return null
          val clen = u32(buf, off); off += 4
          if (clen == 0 || clen > len - off) return null
          val limit = math.min(maxDecompressed, clen * maxRatio.toLong)
          val inflated =
            try {
              val inf = new java.util.zip.Inflater()
              inf.setInput(buf, off, clen.toInt)
              val bos = new java.io.ByteArrayOutputStream(
                math.min(clen * 4, 1 << 16).toInt)
              val tmp = new Array[Byte](8192)
              var total = 0L
              var done = false
              while (!done) {
                val n = inf.inflate(tmp)
                if (n > 0) {
                  total += n
                  if (total > limit) { inf.end(); done = true; bos.reset() }
                  else bos.write(tmp, 0, n)
                } else if (inf.finished() || inf.needsDictionary()) {
                  done = true
                } else if (inf.needsInput()) {
                  // truncated zlib stream
                  inf.end(); bos.reset(); done = true
                }
              }
              val r = bos.toByteArray
              if (r.isEmpty) null else r
            } catch { case _: Exception => null }
          if (inflated == null) return null
          // inner frames: JSON only (nested 2C is rejected)
          var ioff = 0
          val ilen = inflated.length
          while (ioff + 2 <= ilen) {
            if (inflated(ioff) != V2 || inflated(ioff + 1) != J) return null
            ioff += 2
            if (ioff + 8 > ilen) return null
            val seq = u32(inflated, ioff)
            val plen = u32(inflated, ioff + 4)
            ioff += 8
            if (plen == 0 || plen > maxFrame || plen > ilen - ioff) return null
            if (windowSize == 0 || out.size >= windowSize) return null
            if (seq != ((out.size + 1L) & 0xffffffffL)) return null
            out.add(InternalRow(seq,
              UTF8String.fromBytes(inflated, ioff, plen.toInt)))
            ioff += plen.toInt
          }
          if (ioff != ilen) return null
          off += clen.toInt
        case _ => return null
      }
    }
    if (off != len) return null
    new GenericArrayData(out.toArray)
  }
}
