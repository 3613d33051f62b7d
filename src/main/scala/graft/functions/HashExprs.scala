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
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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
    extends UnaryExpression with CodegenFallback {
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
