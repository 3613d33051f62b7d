package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array: per token a 64-bit hash votes ±1 on
  * each bit; the sign vector is the fingerprint. Near-duplicate documents
  * land within small Hamming distance. Single-pass custom expression
  * (64 nested `aggregate()` Column calls would defeat codegen and scan the
  * array 64×).
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Expr$$.MODULE$$.kernel($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64Expr {
  def kernel(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.fnv1a64(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** k-permutation MinHash signature over a string array in ONE pass:
  * each element is hashed once (FNV-1a 64), then the k permutations are
  * derived by affine mixing (h XOR seed_i, finalized splitmix-style) —
  * the standard multiply-shift derivation. O(n·k) cheap integer ops vs
  * the O(n·k) *string re-hashes* a Column-level transform() would cost,
  * and no per-element Catalyst interpretation overhead.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.kernel(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignatureExpr$$.MODULE$$.kernel($c, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignatureExpr {
  def kernel(arr: ArrayData, k: Int): GenericArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashUtil.fnv1a64(arr.getUTF8String(i).toString)
        var j = 0
        while (j < k) {
          // splitmix64 finalizer over (h ^ seed_j)
          var z = h ^ (0x9E3779B97F4A7C15L * (j + 1))
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          if (z < mins(j)) mins(j) = z
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Cosine similarity between two numeric arrays in one fused pass —
  * dot, |a|², |b|² accumulated together. A Column-level zip_with/
  * aggregate composition walks both arrays three times through
  * interpreted higher-order lambdas; this is the hot kernel of every
  * ANN/near-dup operator so it gets a native expression.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def isFloatA = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def isFloatB = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val v = CosineSimilarityExpr.kernel(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], isFloatA, isFloatB)
    if (v.isNaN) null else v
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.CosineSimilarityExpr$$.MODULE$$.kernel(
         |  $a, $b, $isFloatA, $isFloatB);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         |""".stripMargin)
    code
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarityExpr {
  /** Returns NaN for zero-norm inputs (mapped to SQL null by callers). */
  def kernel(a: ArrayData, b: ArrayData, isFloatA: Boolean, isFloatB: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloatA) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloatB) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Scalar FNV-1a 64 of a string — the same kernel SimHash/MinHash fold
  * internally, exposed as its own codegen'd expression for feature
  * hashing (hashed bag-of-ngrams buckets: pmod(fnv64(gram), D)). The
  * DuckDB oracle mirror is the HUGEINT list_reduce in
  * [[graft.operators.Dedup]] (`fnvSql`) — deterministic, engine-equal
  * for the whole BMP (UTF-16 code-unit loop on both sides).
  */
case class Fnv1a64Expr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.fnv1a64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashUtil$$.MODULE$$.fnv1a64($c.toString());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashUtil {
  /** FNV-1a 64-bit — deterministic, seedable by suffixing. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h ^= (c & 0xFF)
      h *= 0x100000001b3L
      if (c > 0xFF) { h ^= (c >> 8); h *= 0x100000001b3L }
      i += 1
    }
    h
  }
}

/** Karp-Rabin rolling-hash document fingerprint with winnowing (window w
  * over k-gram hashes, keep per-window minimum → robust local fingerprints;
  * the standard winnowing scheme from the MOSS paper). Returns the sorted
  * distinct selected hashes — overlap between two docs' fingerprint sets
  * estimates content overlap.
  */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.toString.toLowerCase
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // polynomial rolling hash base 257 mod 2^61-1
    val MOD = (1L << 61) - 1
    val BASE = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = mulmod(pow, BASE, MOD); i += 1 }
    var h = 0L
    i = 0
    while (i < n) {
      h = (mulmod(h, BASE, MOD) + s.charAt(i)) % MOD
      if (i >= k - 1) {
        hashes(i - k + 1) = h
        h = (h - mulmod(s.charAt(i - k + 1), pow, MOD) % MOD + MOD) % MOD
      }
      i += 1
    }
    // winnow: min of each window of w consecutive k-gram hashes
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    if (nGrams <= w) { if (nGrams > 0) sel += hashes.min }
    else {
      var start = 0
      while (start + w <= nGrams) {
        var mn = Long.MaxValue
        var j = start
        while (j < start + w) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
        sel += mn
        start += 1
      }
    }
    new GenericArrayData(sel.toArray)
  }

  private def mulmod(a: Long, b: Long, m: Long): Long =
    java.math.BigInteger.valueOf(a).multiply(java.math.BigInteger.valueOf(b))
      .mod(java.math.BigInteger.valueOf(m)).longValue()

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
