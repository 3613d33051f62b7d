package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** imhttp request-body processing kernels (contrib/imhttp/imhttp.c):
  * the POST body is a byte stream carrying one or MANY messages —
  * LF-delimited by default (processDataUncompressed char loop :744-760),
  * whole-body blocks under disableLFDelim (processDisableLF :701-728,
  * maxLine-sized chunks), or octet-counted frames with per-frame
  * auto-detect under supportOctetCountedFraming (processOctetCounting
  * :500-560 + processOctetMsgLen :578-640: digit at frame start opens a
  * count, non-digit falls back to LF stuffing for that frame, oversize
  * counts truncate at maxLine with the remainder skipped). gzip bodies
  * (Content-Encoding, processDataCompressed :820+) inflate first; a
  * malformed stream rejects the request — modeled as NULL from
  * [[GunzipExpr]].
  */
object HttpKernels {
  private final val DIGIT_CAP = 200000000L // imhttp.c:595 overflow guard

  /** One-shot split of a request body into message payloads.
    * mode 0 = LF stuffing, 1 = disableLFDelim blocks, 2 = octet-counted
    * with auto-detect. Unlike the reference's connection worker the body
    * is complete, so a trailing partial message flushes instead of
    * waiting for the next request. */
  def bodySplit(body: Array[Byte], mode: Int, maxLine: Int): Array[UTF8String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val n = body.length
    if (mode == 1) {
      var i = 0
      while (i < n) {
        val count = math.min(maxLine, n - i)
        out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(body, i, i + count))
        i += count
      }
      return out.toArray
    }
    val buf = new java.io.ByteArrayOutputStream(64)
    def submit(): Unit = {
      // zero-sized messages are discarded (doSubmitMsg, imhttp.c:536-539)
      if (buf.size > 0) out += UTF8String.fromBytes(buf.toByteArray)
      buf.reset()
    }
    var state = 0 // 0=frame start, 1=octet count, 2=msg stuffing, 3=msg octet
    var remain = 0L
    var i = 0
    while (i < n) {
      val ch = body(i)
      if (state == 0) {
        if (mode == 2 && ch >= '0' && ch <= '9') { state = 1; remain = 0L }
        else state = 2
      }
      state match {
        case 1 =>
          if (ch >= '0' && ch <= '9') {
            if (remain <= DIGIT_CAP) remain = remain * 10 + (ch - '0')
            i += 1
          } else {
            // delimiter (SP expected; anything else only logs an error
            // in the reference) is consumed; count<1 submits empty,
            // count>maxLine truncates in state 3
            state = 3
            i += 1
            if (remain == 0) { submit(); state = 0 }
          }
        case 2 =>
          if (buf.size >= maxLine) { submit(); state = 0 } // ch NOT consumed
          else if (ch == '\n') { submit(); state = 0; i += 1 }
          else { buf.write(ch); i += 1 }
        case 3 =>
          val frameBytes = math.min(remain, (n - i).toLong).toInt
          val copy =
            if (buf.size < maxLine) math.min(frameBytes, maxLine - buf.size)
            else 0
          if (copy > 0) buf.write(body, i, copy)
          i += frameBytes
          remain -= frameBytes
          if (remain == 0) { submit(); state = 0 }
        case _ => // state 0 resolved above; loop re-dispatches
      }
    }
    // one-shot body: flush the trailing partial (stuffing frame without
    // final LF, or an octet frame the body undershot)
    if (buf.size > 0 || state == 3) submit()
    out.toArray
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** omfwd single-message compression (tools/omfwd.c:1782-1807): zlib
    * compress2 the rendered wire bytes when longer than
    * CONF_MIN_SIZE_FOR_COMPRESS (runtime/rsyslog.h:244 — 60), prefix the
    * 'z' marker, and keep the compressed form only when it actually
    * gains (destLen + 1 < srcLen); otherwise the raw bytes go out
    * unchanged. java.util.zip.Deflater IS zlib, so the wire format
    * (2-byte zlib header + deflate + adler32) matches the reference's
    * compress2 output shape. */
  def omfwdZip(bytes: Array[Byte], level: Int): Array[Byte] = {
    if (bytes.length <= 60) return bytes
    val defl = new java.util.zip.Deflater(level)
    defl.setInput(bytes); defl.finish()
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) bos.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = bos.toByteArray
    if (z.length + 1 < bytes.length) {
      val out = new Array[Byte](z.length + 1)
      out(0) = 'z'.toByte
      System.arraycopy(z, 0, out, 1, z.length)
      out
    } else bytes
  }

  /** Receive-side single-message decompression (imptcp.c:1400-1430 /
    * tcps_sess compression extension): a leading 'z' means the rest is
    * a zlib stream; anything else passes through. null on a corrupt
    * stream — the reject path. */
  def omfwdUnzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length == 0 || bytes(0) != 'z'.toByte) bytes
    else try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes, 1, bytes.length - 1)
      val bos = new java.io.ByteArrayOutputStream(bytes.length * 2 + 32)
      val tmp = new Array[Byte](8192)
      while (!inf.finished()) {
        val r = inf.inflate(tmp)
        if (r == 0 && !inf.finished() && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated")
        bos.write(tmp, 0, r)
      }
      inf.end()
      bos.toByteArray
    } catch { case _: java.util.zip.DataFormatException => null }

  /** omfwd compression.mode="stream:always" (omfwd.c:1204-1310): one
    * continuous zlib stream per connection, each transaction flushed
    * with Z_SYNC_FLUSH (compression.stream.flushontxend default on) so
    * the receiver can decode message boundaries without waiting for the
    * stream to close; finish at connection end. Input = the session's
    * transaction payloads in order. */
  def zipStream(txs: Array[Array[Byte]], level: Int): Array[Byte] = {
    val defl = new java.util.zip.Deflater(level)
    val bos = new java.io.ByteArrayOutputStream(256)
    val tmp = new Array[Byte](8192)
    txs.foreach { tx =>
      defl.setInput(tx)
      var n = defl.deflate(tmp, 0, tmp.length, java.util.zip.Deflater.SYNC_FLUSH)
      while (n > 0) {
        bos.write(tmp, 0, n)
        n = defl.deflate(tmp, 0, tmp.length, java.util.zip.Deflater.SYNC_FLUSH)
      }
    }
    defl.finish()
    while (!defl.finished()) bos.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    bos.toByteArray
  }

  /** imptcp stream-mode receive (imptcp.c:1376-1432): inflate the
    * connection's bytes incrementally; null on a corrupt stream OR on
    * trailing bytes after Z_STREAM_END (the reference's
    * logCompressedStreamFailure reject paths). */
  def inflateStream(bytes: Array[Byte]): Array[Byte] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(bytes)
      val bos = new java.io.ByteArrayOutputStream(bytes.length * 2 + 32)
      val tmp = new Array[Byte](8192)
      while (!inf.finished()) {
        val r = inf.inflate(tmp)
        if (r == 0 && !inf.finished() && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated")
        bos.write(tmp, 0, r)
      }
      // "received trailing data after end of compressed stream"
      if (inf.getRemaining > 0) { inf.end(); null }
      else { inf.end(); bos.toByteArray }
    } catch { case _: java.util.zip.DataFormatException => null }

  /** imptcp compression="auto" session sniff (imptcp.c:1437-1460): the
    * first two bytes are a CANDIDATE zlib (RFC 1950) header iff
    * CM = deflate (low nibble 8) and the CMF/FLG check bits divide
    * by 31. */
  def zlibCandidate(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0x0f) == 8 &&
      (((bytes(0) & 0xff) << 8 | (bytes(1) & 0xff)) % 31) == 0

  /** null on a malformed stream — the request-reject path. */
  def gunzip(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val bos = new java.io.ByteArrayOutputStream(bytes.length * 2 + 32)
      val tmp = new Array[Byte](8192)
      var r = in.read(tmp)
      while (r > 0) { bos.write(tmp, 0, r); r = in.read(tmp) }
      in.close()
      bos.toByteArray
    } catch { case _: java.io.IOException => null }
}

/** Split an imhttp body string into its message payloads. */
case class HttpBodySplitExpr(child: Expression, mode: Int, maxLine: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "imhttp_body_split"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(HttpKernels.bodySplit(
      input.asInstanceOf[UTF8String].getBytes, mode, maxLine)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.HttpKernels$$.MODULE$$.bodySplit(
         |    ($c).getBytes(), $mode, $maxLine));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class GzipExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_compress"
  override protected def nullSafeEval(input: Any): Any =
    HttpKernels.gzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HttpKernels$$.MODULE$$.gzip($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class GunzipExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_inflate"
  override protected def nullSafeEval(input: Any): Any =
    HttpKernels.gunzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HttpKernels$$.MODULE$$.gunzip($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class OmfwdZipExpr(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "omfwd_zip"
  override protected def nullSafeEval(input: Any): Any =
    HttpKernels.omfwdZip(input.asInstanceOf[Array[Byte]], level)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HttpKernels$$.MODULE$$.omfwdZip($c, $level);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class OmfwdUnzipExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "omfwd_unzip"
  override protected def nullSafeEval(input: Any): Any =
    HttpKernels.omfwdUnzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HttpKernels$$.MODULE$$.omfwdUnzip($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ZipStreamExpr(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "omfwd_zip_stream"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    HttpKernels.zipStream(
      Array.tabulate(arr.numElements())(i => arr.getBinary(i)), level)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val txs = ctx.freshName("txs")
      s"""byte[][] $txs = new byte[($c).numElements()][];
         |for (int $i = 0; $i < $txs.length; $i++) $txs[$i] = ($c).getBinary($i);
         |${ev.value} = graft.functions.HttpKernels$$.MODULE$$.zipStream($txs, $level);
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class InflateStreamExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "imptcp_inflate_stream"
  override protected def nullSafeEval(input: Any): Any =
    HttpKernels.inflateStream(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HttpKernels$$.MODULE$$.inflateStream($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ZlibSniffExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "zlib_candidate"
  override protected def nullSafeEval(input: Any): Any =
    HttpKernels.zlibCandidate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HttpKernels$$.MODULE$$.zlibCandidate($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HttpExprs {
  /** imhttp body → array of message payloads. modeName: "lf" (default
    * LF delimiting), "block" (disableLFDelim="on"), "octet"
    * (supportOctetCountedFraming="on"). maxLine = global maxMessageSize. */
  def bodyMessages(body: Column, modeName: String,
                   maxLine: Int = 8096): Column = {
    val mode = modeName match {
      case "lf" => 0
      case "block" => 1
      case "octet" => 2
      case other => throw new IllegalArgumentException(
        s"imhttp body mode '$other' (lf|block|octet)")
    }
    org.apache.spark.sql.GraftBridge.column(HttpBodySplitExpr(
      org.apache.spark.sql.GraftBridge.expression(body), mode, maxLine))
  }
  def gzipCompress(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(GzipExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
  def gzipInflate(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(GunzipExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
  /** omfwd compression.mode="single" wire bytes (level = zipLevel,
    * reference default 9 — omfwd.c:2058). */
  def omfwdZip(c: Column, level: Int = 9): Column =
    org.apache.spark.sql.GraftBridge.column(OmfwdZipExpr(
      org.apache.spark.sql.GraftBridge.expression(c), level))
  /** imptcp/tcps_sess receive-side inflate of the 'z' extension. */
  def omfwdUnzip(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(OmfwdUnzipExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
  /** compression.mode="stream:always" per-session zlib stream over an
    * ARRAY of transaction payloads (SYNC_FLUSH at each txend). */
  def omfwdZipStream(c: Column, level: Int = 9): Column =
    org.apache.spark.sql.GraftBridge.column(ZipStreamExpr(
      org.apache.spark.sql.GraftBridge.expression(c), level))
  /** imptcp stream-mode inflate; null on corrupt/trailing-data streams. */
  def imptcpInflateStream(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(InflateStreamExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
  /** imptcp compression="auto" two-byte RFC1950 candidate sniff. */
  def zlibSniff(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(ZlibSniffExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
}
