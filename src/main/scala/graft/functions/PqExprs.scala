package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
