package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Docker attach-stream demultiplex — one pass over a container's
  * multiplexed log stream, returning (stream_type, payload) per frame
  * in arrival order. Wire grammar per contrib/imdocker/imdocker.c's
  * curl callback (imdocker.c:1415-1439): each frame is an 8-byte
  * header `[STREAM_TYPE, 0, 0, 0, SIZE1..SIZE4]` (size big-endian
  * uint32) followed by SIZE payload bytes; STREAM_TYPE 0=stdin (written
  * on stdout), 1=stdout, 2=stderr. A header with an invalid stream type
  * means the stream is NOT multiplexed (TTY container) — the reference
  * then treats ALL remaining bytes as one stdout payload ("copy all the
  * data and submit to prevent data loss", imdocker.c:1516-1526); a
  * frame truncated by end-of-capture yields its available bytes (the
  * reference writes MIN(payload, available)). Each completed frame is
  * one message (SubmitMsg fires when bytes_remaining reaches 0,
  * imdocker.c:1531-1534).
  */
case class DockerStreamDecodeExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("stream_type", IntegerType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "docker_stream_decode"

  override protected def nullSafeEval(input: Any): Any =
    DockerStreamDecodeExpr.kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.DockerStreamDecodeExpr$$.MODULE$$.kernel($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DockerStreamDecodeExpr {
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  def kernel(buf: Array[Byte]): ArrayData = {
    val out = new java.util.ArrayList[InternalRow]()
    var off = 0
    val len = buf.length
    var done = false
    while (!done && off + 8 <= len) {
      val streamType = buf(off) & 0xff
      // header bytes 1-3 are zero padding in the multiplexed protocol;
      // is_valid_stream_type = {0,1,2} (imdocker.c:1277-1279) AND the
      // padding must be zero — anything else is the non-multiplexed
      // (TTY) fallthrough
      val multiplexed = streamType <= 2 &&
        buf(off + 1) == 0 && buf(off + 2) == 0 && buf(off + 3) == 0
      if (multiplexed) {
        val size = u32(buf, off + 4)
        val avail = math.min(size, (len - off - 8).toLong).toInt
        out.add(InternalRow(streamType,
          UTF8String.fromBytes(buf, off + 8, avail)))
        off += 8 + avail
      } else {
        // TTY stream: everything from here is one stdout payload
        out.add(InternalRow(1, UTF8String.fromBytes(buf, off, len - off)))
        done = true
      }
    }
    // a trailing fragment shorter than a header is the same
    // data-loss-prevention stdout path
    if (!done && off < len)
      out.add(InternalRow(1, UTF8String.fromBytes(buf, off, len - off)))
    new GenericArrayData(out.toArray)
  }
}
