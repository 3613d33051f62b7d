package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** omfile zip output (runtime/stream.c:1728-1746 doZipWrite →
  * runtime/zlibw.c:112-165): the file stream deflates with
  * deflateInit2(level, windowBits = 31) — i.e. GZIP wrapping, so the
  * output file is `zcat`-compatible — flushing with Z_SYNC_FLUSH on
  * buffer flush. With bVeryReliableZip (omfile veryRobustZip="on",
  * zlibw.c:161) every flushed block is FINISHED into its own complete
  * gzip member and the deflater re-initialized, producing a multi-member
  * gzip file: a torn tail after a crash loses only the member being
  * written, every earlier member stays independently decodable.
  */
object FileZipKernels {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One complete gzip member at `level` (header MTIME=0/OS=255 like a
    * metadata-free writer; raw deflate; CRC32 + ISIZE trailer). */
  def gzipMember(bytes: Array[Byte], level: Int): Array[Byte] = {
    val defl = new java.util.zip.Deflater(level, true)
    defl.setInput(bytes); defl.finish()
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    bos.write(Array(0x1f.toByte, 0x8b.toByte, 8.toByte, 0.toByte,
      0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte, 0xff.toByte))
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) bos.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    bos.write(le32(crc.getValue))
    bos.write(le32(bytes.length.toLong & 0xffffffffL))
    bos.toByteArray
  }

  /** The omfile zip file image for a sequence of flushed blocks:
    * veryRobust → one gzip member per block, concatenated; otherwise one
    * member with a SYNC_FLUSH at each block boundary. */
  def omfileZip(parts: Array[Array[Byte]], level: Int,
                veryRobust: Boolean): Array[Byte] =
    if (veryRobust) {
      val bos = new java.io.ByteArrayOutputStream(256)
      parts.foreach(p => bos.write(gzipMember(p, level)))
      bos.toByteArray
    } else {
      val defl = new java.util.zip.Deflater(level, true)
      val bos = new java.io.ByteArrayOutputStream(256)
      bos.write(Array(0x1f.toByte, 0x8b.toByte, 8.toByte, 0.toByte,
        0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte, 0xff.toByte))
      val tmp = new Array[Byte](8192)
      val crc = new java.util.zip.CRC32()
      var total = 0L
      parts.foreach { p =>
        defl.setInput(p); crc.update(p); total += p.length
        var n = defl.deflate(tmp, 0, tmp.length, java.util.zip.Deflater.SYNC_FLUSH)
        while (n > 0) {
          bos.write(tmp, 0, n)
          n = defl.deflate(tmp, 0, tmp.length, java.util.zip.Deflater.SYNC_FLUSH)
        }
      }
      defl.finish()
      while (!defl.finished()) bos.write(tmp, 0, defl.deflate(tmp))
      defl.end()
      bos.write(le32(crc.getValue))
      bos.write(le32(total & 0xffffffffL))
      bos.toByteArray
    }

  /** Walk the gzip members of a file image exactly (header check, raw
    * inflate to member end, CRC32/ISIZE trailer verify), returning
    * (memberCount, decoded). null on any corruption — including a CRC
    * mismatch, the check `gzip -d` would fail on. */
  def walkMembers(bytes: Array[Byte]): (Int, Array[Byte]) =
    try {
      var off = 0
      var count = 0
      val bos = new java.io.ByteArrayOutputStream(bytes.length * 2 + 32)
      while (off < bytes.length) {
        if (bytes.length - off < 18 || bytes(off) != 0x1f.toByte ||
            bytes(off + 1) != 0x8b.toByte || bytes(off + 2) != 8.toByte ||
            bytes(off + 3) != 0.toByte) return null
        off += 10
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, off, bytes.length - off)
        val tmp = new Array[Byte](8192)
        val memberStart = bos.size()
        while (!inf.finished()) {
          val r = inf.inflate(tmp)
          if (r == 0 && !inf.finished() && inf.needsInput()) { inf.end(); return null }
          bos.write(tmp, 0, r)
        }
        val consumed = (bytes.length - off) - inf.getRemaining
        inf.end()
        off += consumed
        if (bytes.length - off < 8) return null
        val body = bos.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(body, memberStart, body.length - memberStart)
        val want = (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
        if (crc.getValue != want) return null
        off += 8
        count += 1
      }
      (count, bos.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => null }
}

/** The zstd compression driver (runtime/zstdw.c, selected by
  * compression.driver="zstd" / omfile compressionDriver): same stream
  * contract as the zlib writer — ZSTD_e_flush at each buffer flush,
  * ZSTD_e_end at close, and with bVeryReliableZip a doCompressFinish per
  * flush, i.e. one complete zstd FRAME per flushed block
  * (zstdw.c:102-123). zstd-jni ships with Spark, so the codec is real. */
object ZstdKernels {

  /** One complete zstd frame at `level`. */
  def zstdFrame(bytes: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, level)
    zos.write(bytes); zos.close()
    bos.toByteArray
  }

  def omfileZstd(parts: Array[Array[Byte]], level: Int,
                 veryRobust: Boolean): Array[Byte] =
    if (veryRobust) {
      val bos = new java.io.ByteArrayOutputStream(256)
      parts.foreach(p => bos.write(zstdFrame(p, level)))
      bos.toByteArray
    } else {
      val bos = new java.io.ByteArrayOutputStream(256)
      val zos = new com.github.luben.zstd.ZstdOutputStream(bos, level)
      parts.foreach { p => zos.write(p); zos.flush() } // ZSTD_e_flush
      zos.close() // ZSTD_e_end
      bos.toByteArray
    }

  /** Walk the zstd frames exactly (findFrameCompressedSize per frame,
    * streaming decode of the whole image), returning
    * (frameCount, decoded); null when `zstd -d` would reject. */
  def walkFrames(bytes: Array[Byte]): (Int, Array[Byte]) =
    try {
      var off = 0
      var count = 0
      while (off < bytes.length) {
        val sz = com.github.luben.zstd.Zstd.findFrameCompressedSize(bytes, off)
        if (sz <= 0 || off + sz > bytes.length) return null
        off += sz.toInt
        count += 1
      }
      val zis = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val bos = new java.io.ByteArrayOutputStream(bytes.length * 2 + 32)
      val tmp = new Array[Byte](8192)
      var r = zis.read(tmp)
      while (r > 0) { bos.write(tmp, 0, r); r = zis.read(tmp) }
      zis.close()
      (count, bos.toByteArray)
    } catch { case _: java.io.IOException => null
              case _: com.github.luben.zstd.ZstdException => null }
}

case class OmfileZstdExpr(child: Expression, level: Int, veryRobust: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "omfile_zstd"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    ZstdKernels.omfileZstd(
      Array.tabulate(arr.numElements())(i => arr.getBinary(i)), level, veryRobust)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val ps = ctx.freshName("ps")
      s"""byte[][] $ps = new byte[($c).numElements()][];
         |for (int $i = 0; $i < $ps.length; $i++) $ps[$i] = ($c).getBinary($i);
         |${ev.value} = graft.functions.ZstdKernels$$.MODULE$$.omfileZstd(
         |  $ps, $level, $veryRobust);
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (frameCount INT, decoded BINARY) of a zstd file image; null when
  * `zstd -d` would reject it. */
case class ZstdFramesExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("members", IntegerType, nullable = false),
    StructField("decoded", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "zstd_frames"
  override protected def nullSafeEval(input: Any): Any = {
    val r = ZstdKernels.walkFrames(input.asInstanceOf[Array[Byte]])
    if (r == null) null
    else org.apache.spark.sql.catalyst.InternalRow(r._1, r._2)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val t = ctx.freshName("t")
      s"""scala.Tuple2 $t = graft.functions.ZstdKernels$$.MODULE$$.walkFrames($c);
         |if ($t == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $t._1(), $t._2() });
         |}""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class OmfileZipExpr(child: Expression, level: Int, veryRobust: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "omfile_zip"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    FileZipKernels.omfileZip(
      Array.tabulate(arr.numElements())(i => arr.getBinary(i)), level, veryRobust)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val ps = ctx.freshName("ps")
      s"""byte[][] $ps = new byte[($c).numElements()][];
         |for (int $i = 0; $i < $ps.length; $i++) $ps[$i] = ($c).getBinary($i);
         |${ev.value} = graft.functions.FileZipKernels$$.MODULE$$.omfileZip(
         |  $ps, $level, $veryRobust);
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (memberCount INT, decoded BINARY) of a gzip file image; null when
  * `gzip -d` would reject it. */
case class GzipMembersExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("members", IntegerType, nullable = false),
    StructField("decoded", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_members"
  override protected def nullSafeEval(input: Any): Any = {
    val r = FileZipKernels.walkMembers(input.asInstanceOf[Array[Byte]])
    if (r == null) null
    else org.apache.spark.sql.catalyst.InternalRow(r._1, r._2)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val t = ctx.freshName("t")
      s"""scala.Tuple2 $t = graft.functions.FileZipKernels$$.MODULE$$.walkMembers($c);
         |if ($t == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $t._1(), $t._2() });
         |}""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FileZipExprs {
  def omfileZip(parts: Column, level: Int = 6, veryRobust: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(OmfileZipExpr(
      org.apache.spark.sql.GraftBridge.expression(parts), level, veryRobust))
  def gzipMembers(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(GzipMembersExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
  def omfileZstd(parts: Column, level: Int = 3, veryRobust: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(OmfileZstdExpr(
      org.apache.spark.sql.GraftBridge.expression(parts), level, veryRobust))
  def zstdFrames(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(ZstdFramesExpr(
      org.apache.spark.sql.GraftBridge.expression(c)))
}
