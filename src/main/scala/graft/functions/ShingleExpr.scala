package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text in ONE pass: lowercase,
  * whitespace-split, join each n consecutive tokens with a single space,
  * first-occurrence-order dedupe. Semantics match
  * `array_distinct(transform(seq, i -> concat_ws(' ', tok[i..i+n-1])))`
  * over `filter(split(lower(text), "\\s+"), _ != "")` — but the HOF
  * chain is interpreted per element (and re-interpreted per reference),
  * which measured ~9× slower than this kernel in the dedup pipelines.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"shingles$n"

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesExpr$$.MODULE$$.kernel($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShinglesExpr {
  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def kernel(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    // whitespace tokenization without regex
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(k + j))
        j += 1
      }
      seen.add(sb.toString)
      k += 1
    }
    val out = new Array[Any](seen.size)
    var idx = 0
    val it = seen.iterator()
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }
}

/** Fused text → MinHash signature: the ShinglesExpr + MinHashSignatureExpr
  * composition collapsed into ONE kernel. Value-identical to
  * `MinHashSignatureExpr(ShinglesExpr(text, n), k)` (KernelParitySpec), by
  * construction:
  *
  *  - each shingle's FNV-1a 64 folds directly over the token char ranges of
  *    the lowered text (token chars + one ' ' separator between tokens) —
  *    the exact byte sequence of the joined shingle string, with no
  *    StringBuilder copy, no String hashCode pass, no UTF8 encode/decode
  *    round-trip between the two expressions;
  *  - the first-occurrence dedupe drops out: MinHash takes a min over the
  *    shingle-hash set, and duplicate shingles cannot change a min.
  *
  * Returns NULL when the text has fewer than n tokens (the composition's
  * `size(sh) > 0` pre-filter becomes an isNotNull filter on the signature:
  * such a doc has no content to near-match and its all-MaxValue signature
  * would collide with every other short doc in every band).
  */
/** Exact shingle-set Jaccard of TWO texts in one fused kernel:
  * value-identical to
  * `size(array_intersect(shingles(a,n), shingles(b,n))) / (|A|+|B|-inter)`
  * (both sets distinct by construction; string equality, no hashing —
  * KernelParitySpec pins the parity), but the verify JOIN ships the two
  * ~300-byte TEXTS instead of two ~10 KB shingle-STRING arrays.
  *
  * Why this exists (r11): at the sf100 probe (11.7M candidate pairs,
  * ~300-token docs) the array-carrying verify join moved ~230 GB
  * through its exchanges — past page cache, disk-bound, 419 s measured
  * for the JOIN ALONE with the intersect removed, and per-partition
  * sizing didn't help because the BYTES were the cost, not the sort.
  * Re-shingling per pair is ~15 µs of CPU per text — the measured
  * trade is ~25x less exchange mass for ~12 s of extra CPU at sf100.
  * (r10 had measured a fused variant slower at sf10 and kept the
  * join-back form; the sf100 diagnostic showed that verdict doesn't
  * survive the scale where the arrays stop fitting in page cache.)
  */
case class JaccardTextsExpr(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"jaccard_texts$n"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardTextsExpr.kernel(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardTextsExpr$$.MODULE$$.kernel($a, $b, $n);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object JaccardTextsExpr {
  def kernel(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = ShinglesExpr.kernel(a, n).asInstanceOf[GenericArrayData]
    val sb = ShinglesExpr.kernel(b, n).asInstanceOf[GenericArrayData]
    val na = sa.numElements()
    val nb = sb.numElements()
    if (na == 0 && nb == 0) return 0.0
    val setA = new java.util.HashSet[Any](na * 2)
    var i = 0
    while (i < na) { setA.add(sa.array(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (setA.contains(sb.array(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }
}

case class MinHashTextExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1 && k >= 1, "shingle size and signature length must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"minhash_text"

  override protected def nullSafeEval(input: Any): Any =
    MinHashTextExpr.kernel(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashTextExpr$$.MODULE$$.kernel($c, $n, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashTextExpr {
  private val FnvPrime = 0x100000001b3L

  def kernel(text: UTF8String, n: Int, k: Int): GenericArrayData = {
    val s = text.toLowerCase.toString
    val len = s.length
    // token boundaries (two int arrays, grown geometrically)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var ntoks = 0
    var i = 0
    while (i < len) {
      while (i < len && ShinglesExpr.isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !ShinglesExpr.isWs(s.charAt(i))) i += 1
      if (i > start) {
        if (ntoks == starts.length) {
          starts = java.util.Arrays.copyOf(starts, ntoks * 2)
          ends = java.util.Arrays.copyOf(ends, ntoks * 2)
        }
        starts(ntoks) = start; ends(ntoks) = i; ntoks += 1
      }
    }
    val m = ntoks - n + 1
    if (m <= 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var p = 0
    while (p < m) {
      // FNV-1a 64 of "tok_p tok_{p+1} … tok_{p+n-1}" without building it
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= 0x20L; h *= FnvPrime } // the ' ' separator
        var q = starts(p + j)
        val e = ends(p + j)
        while (q < e) {
          val c = s.charAt(q)
          h ^= (c & 0xFF); h *= FnvPrime
          if (c > 0xFF) { h ^= (c >> 8); h *= FnvPrime }
          q += 1
        }
        j += 1
      }
      // k permutations: splitmix64 finalizer over (h ^ seed_j)
      var t = 0
      while (t < k) {
        var z = h ^ (0x9E3779B97F4A7C15L * (t + 1))
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < mins(t)) mins(t) = z
        t += 1
      }
      p += 1
    }
    new GenericArrayData(mins)
  }
}
