package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization code assignment — all `m` subspace codes of an
  * embedding in ONE kernel call (see
  * [[graft.operators.Similarity.pqTopK]]).
  *
  * The Column formulation (m·ksub `aggregate(zip_with(...))`
  * subexpressions = 128 aggregates) blows past whole-stage codegen's
  * method limits and falls back to interpreted evaluation — measured
  * 110 s for the sf10 encode vs the expected few seconds. This kernel
  * is the same arithmetic as one codegen'd static call: for subspace j
  * and centroid c, micro-distance = floor((⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩)·1e6)
  * with every dot product a sequential left fold over double-promoted
  * floats — bit-identical to the DuckDB oracle's list_dot_product
  * replay (the parity contract the ANN family shares). Code = the
  * lowest centroid index achieving the minimum. The codebook rides in
  * as a reference object, bounded by m·ksub·(dim/m) floats BY
  * CONSTRUCTION.
  */
case class PqCodesExpr(child: Expression,
                       codebook: Array[Array[Array[Float]]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_codes"

  private val m = codebook.length
  private val ksub = if (m == 0) 0 else codebook(0).length
  private val sub = if (m == 0 || ksub == 0) 0 else codebook(0)(0).length
  // ⟨c,c⟩ precomputed once per (j, c) — same sequential fold order as
  // the oracle's list_dot_product(c, c)
  @transient private lazy val centSelf: Array[Array[Double]] =
    Array.tabulate(m, ksub) { (j, c) =>
      val s = codebook(j)(c); var acc = 0.0; var i = 0
      while (i < s.length) { acc += s(i).toDouble * s(i).toDouble; i += 1 }
      acc
    }

  def kernel(in: ArrayData): ArrayData = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      // ⟨x,x⟩ for this subspace (sequential fold)
      var dAA = 0.0
      var i = 0
      while (i < sub) {
        val x = in.getFloat(base + i).toDouble
        dAA += x * x
        i += 1
      }
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val cent = codebook(j)(c)
        var dAB = 0.0
        i = 0
        while (i < sub) {
          dAB += in.getFloat(base + i).toDouble * cent(i)
          i += 1
        }
        val md = math.floor((dAA - 2.0 * dAB + centSelf(j)(c)) * 1e6).toLong
        if (md < best) { best = md; bestC = c } // strict <: first-min-wins
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, "graft.functions.PqCodesExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC scoring over PQ codes — every query's asymmetric distance to one
  * row's codes in ONE kernel call (see
  * [[graft.operators.Similarity.pqTopK]] / `ivfPqTopK`).
  *
  * The Column formulation emitted one literal LUT array per
  * query×subspace (m·ksub longs per query) into a single projection —
  * plan size grew linearly with |queries| and at 10^4-query batches
  * would hand Janino a megabyte method, the exact blowup
  * [[PqCodesExpr]] was added to kill on the encode side. Here the full
  * LUT matrix (|queries|·m·ksub longs) rides in as ONE reference
  * object, so the generated code is a single static call regardless of
  * query count.
  *
  * Per query q: dist = Σ_j luts(q)(j)(code_j) — a sum of integers, so
  * the result is order-free and oracle-exact (the LUT entries are the
  * same integer micro-L2² both engines quantize BEFORE summation).
  * Output slot q is NULL when the row IS query q (self-exclusion) or,
  * when `probeCells` is non-null (the IVF-PQ composition), when the
  * row's coarse cell is not among query q's probed cells — the
  * downstream filter is a codegen'd isNotNull, never a per-query
  * literal comparison.
  */
case class PqAdcExpr(codes: Expression, vecId: Expression, cell: Expression,
                     luts: Array[Array[Array[Long]]], qIds: Array[Long],
                     probeCells: Array[Array[Int]], nlist: Int)
    extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def first: Expression = codes
  override def second: Expression = vecId
  override def third: Expression = cell
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "pq_adc"

  private val nQ = luts.length
  // probe membership as a dense (q × nlist) mask: O(1) per (q, cell)
  @transient private lazy val mask: Array[Array[Boolean]] =
    if (probeCells == null) null
    else Array.tabulate(nQ) { q =>
      val row = new Array[Boolean](nlist)
      probeCells(q).foreach(c => row(c) = true)
      row
    }

  def kernel(codes: ArrayData, vecId: Long, cl: Int): ArrayData = {
    val out = new Array[Any](nQ)
    var q = 0
    while (q < nQ) {
      if (vecId == qIds(q) || (mask != null && !mask(q)(cl))) out(q) = null
      else {
        val lq = luts(q)
        var acc = 0L
        var j = 0
        while (j < lq.length) { acc += lq(j)(codes.getInt(j)); j += 1 }
        out(q) = acc
      }
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(c: Any, v: Any, cl: Any): Any =
    kernel(c.asInstanceOf[ArrayData], v.asInstanceOf[Long],
      cl.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, "graft.functions.PqAdcExpr")
    nullSafeCodeGen(ctx, ev, (c, v, cl) =>
      s"${ev.value} = $ref.kernel($c, $v, $cl);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(codes = f, vecId = s, cell = t)
}
