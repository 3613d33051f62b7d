package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** imbatchreport whole-file shaping — one batch-job report file becomes
  * one message (contrib/imbatchreport/imbatchreport.c readAndSendFile:
  * 240-370). Steps, in the reference's order:
  *
  *  1. trailing `\n`/`\t`/space trimmed from the file end (:262);
  *  2. if the trimmed end is `]`, scan BACKWARD for `[` inside the last
  *     150 bytes (SRUCTDATA_BUFFER_LEN, :83,:248) — that span is the
  *     message's STRUCTURED-DATA, with embedded line feeds removed
  *     (:268-273); no `[` in the window ⇒ no SD;
  *  3. `timestampkey` digits inside the SD override the message time
  *     (:281-289, the `*field ^ 0x30 <= 9` digit walk); `programkey`
  *     value up to the closing quote becomes APP-NAME (:291-301);
  *  4. whitespace before the SD is trimmed (:304-305), the rest is the
  *     body;
  *  5. body rewrite (:326-350): TAB/space runs collapse to one space
  *     (dedupspace default on, :508), `\n` becomes the two characters
  *     `\\n` with a pending space dropped first, capped at maxMsgSize;
  *  6. a body that exceeds the cap is replaced by
  *     `"File too large : " + path` (:355-361) and flagged (the
  *     reference also renames the file to its reject name — filesystem
  *     transport).
  *
  * Returns struct(msg, structured_data, ts_epoch, program, too_large);
  * structured_data is "-" when absent (MsgSetStructuredData default,
  * :242).
  */
case class BatchReportExpr(text: Expression, path: Expression,
                           timestampKey: String, programKey: String,
                           maxMsgSize: Int = 8096, dedupSpace: Boolean = true)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def left: Expression = text
  override def right: Expression = path
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("msg", StringType, nullable = false),
    StructField("structured_data", StringType, nullable = false),
    StructField("ts_epoch", LongType, nullable = true),
    StructField("program", StringType, nullable = true),
    StructField("too_large", BooleanType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "batchreport"

  override protected def nullSafeEval(t: Any, p: Any): Any =
    BatchReportExpr.kernel(t.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString,
      timestampKey, programKey, maxMsgSize, dedupSpace)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val tsRef = ctx.addReferenceObj("brTsKey", timestampKey, "java.lang.String")
    val pgRef = ctx.addReferenceObj("brPgKey", programKey, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, p) => {
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.functions.BatchReportExpr$$.MODULE$$.kernel(
         |    $t.toString(), $p.toString(), $tsRef, $pgRef,
         |    $maxMsgSize, $dedupSpace);""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(text = l, path = r)
}

object BatchReportExpr {
  private final val SdWindow = 150 // SRUCTDATA_BUFFER_LEN

  def kernel(text: String, path: String, tsKey: String, progKey: String,
             maxMsgSize: Int, dedupSpace: Boolean): InternalRow = {
    var end = text.length
    def isWs(c: Char) = c == '\n' || c == '\t' || c == ' '
    while (end > 0 && isWs(text(end - 1))) end -= 1

    var sd: String = null
    var tsEpoch: java.lang.Long = null
    var program: String = null
    var bodyEnd = end
    if (end > 1 && text(end - 1) == ']') {
      // backward scan for '[' bounded by the 150-byte tail window
      val windowStart = math.max(0, text.length - SdWindow)
      var i = end - 2
      while (i > windowStart && text(i) != '[') i -= 1
      if (i >= windowStart && text(i) == '[') {
        sd = text.substring(i, end).replace("\n", "")
        if (tsKey != null && tsKey.nonEmpty) {
          val at = sd.indexOf(tsKey)
          if (at >= 0) {
            var j = at + tsKey.length
            var v = 0L
            var any = false
            while (j < sd.length && sd(j) >= '0' && sd(j) <= '9') {
              v = v * 10 + (sd(j) - '0'); j += 1; any = true
            }
            if (any) tsEpoch = v
          }
        }
        if (progKey != null && progKey.nonEmpty) {
          val at = sd.indexOf(progKey)
          if (at >= 0) {
            val from = at + progKey.length
            val q = sd.indexOf('"', from)
            if (q >= 0) program = sd.substring(from, q)
          }
        }
        bodyEnd = i
        while (bodyEnd > 0 && isWs(text(bodyEnd - 1))) bodyEnd -= 1
      }
    }

    // body rewrite: dedup space runs, \n → literal backslash-n
    val sb = new java.lang.StringBuilder(math.min(bodyEnd, maxMsgSize) + 2)
    var lastIsSpace = false
    var k = 0
    var tooLarge = false
    while (k < bodyEnd && !tooLarge) {
      text(k) match {
        case '\t' | ' ' =>
          if (!lastIsSpace) sb.append(' ')
          lastIsSpace = dedupSpace
        case '\n' =>
          if (lastIsSpace) sb.setLength(sb.length - 1)
          sb.append('\\').append('n')
          lastIsSpace = false
        case c =>
          sb.append(c)
          lastIsSpace = false
      }
      if (sb.length >= maxMsgSize) tooLarge = k < bodyEnd - 1
      k += 1
    }
    val msg =
      if (tooLarge) "File too large : " + path
      else sb.toString
    InternalRow(
      UTF8String.fromString(msg),
      UTF8String.fromString(if (sd == null) "-" else sd),
      if (tsEpoch == null) null else tsEpoch.longValue(),
      if (program == null) null else UTF8String.fromString(program),
      tooLarge)
  }
}
