package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein
  * 1998) over one query's candidate set — the diversity re-rank a RAG
  * pipeline runs between retrieval and the context window: pick the
  * most relevant passage, then repeatedly the candidate maximizing
  * `relevance − penaltyWeight·max_cos_to_selected`, so near-duplicate
  * passages can't crowd the window.
  *
  * Determinism contract (the whole selection is oracle-replayable):
  *  - candidates sort by (rel desc, doc asc) internally, so the result
  *    is independent of collect_list's arrival order;
  *  - relevance is an integer (the caller passes rank-derived RRF
  *    units, `1e9 div (k0+rank)`); the penalty is the integer
  *    micro-cosine `floor(1e6·cos)` with the cosine computed exactly
  *    as [[CosineSimilarityExpr]] (sequential double fold — the DuckDB
  *    list_dot_product parity every ANN oracle relies on), so each
  *    step's score is pure integer arithmetic;
  *  - ties break to the lowest doc id at every step.
  *
  * Scale/codegen note: this expression runs AFTER the per-query
  * collect_list aggregation — its input is ≤ nCand structs and it
  * evaluates once per QUERY, never per corpus row, so the O(k·n)
  * greedy loop with O(n²) worst-case cosines is bounded by the
  * candidate contract (nCand ≤ tens), not the corpus. The generated
  * code is one static call via a reference object (the PqCodesExpr
  * pattern).
  *
  * Input: array<struct<rel: long, doc: long, emb: array<float>>>.
  * Output: array<struct<step: int, doc_id: long, mmr_micro: long>> —
  * step 1..min(k, n), mmr_micro = the score at selection time (step 1
  * = raw relevance, no penalty).
  */
case class MmrSelectExpr(child: Expression, k: Int, penaltyWeight: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(k > 0 && penaltyWeight >= 0, "k > 0, penaltyWeight >= 0")

  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("rel", LongType),
      StructField("doc", LongType),
      StructField("emb", ArrayType(FloatType))))))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("step", IntegerType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("mmr_micro", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "mmr_select"

  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val rel = new Array[Long](n)
    val doc = new Array[Long](n)
    val emb = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      rel(i) = row.getLong(0)
      doc(i) = row.getLong(1)
      emb(i) = row.getArray(2).toFloatArray()
      i += 1
    }
    // candidate order independent of collect_list arrival order
    val order = (0 until n).sortBy(j => (-rel(j), doc(j))).toArray
    // norms once, sequential double fold (the oracle's
    // sqrt(list_dot_product(x, x)) over cast lists)
    val norm = emb.map { v =>
      var acc = 0.0; var d = 0
      while (d < v.length) { acc += v(d).toDouble * v(d).toDouble; d += 1 }
      math.sqrt(acc)
    }
    def cosMicro(a: Int, b: Int): Long = {
      val va = emb(a); val vb = emb(b)
      var dot = 0.0; var d = 0
      val len = math.min(va.length, vb.length)
      while (d < len) { dot += va(d).toDouble * vb(d).toDouble; d += 1 }
      // zero-norm guard (cannot occur for real embeddings; keeps the
      // kernel total): treat as orthogonal
      if (norm(a) == 0.0 || norm(b) == 0.0) 0L
      else math.floor(dot / (norm(a) * norm(b)) * 1e6).toLong
    }
    val taken = new Array[Boolean](n)
    val steps = math.min(k, n)
    val outSteps = new Array[InternalRow](steps)
    val selected = new Array[Int](steps)
    var s = 0
    while (s < steps) {
      var bestIdx = -1
      var bestScore = 0L
      var oi = 0
      while (oi < n) {
        val cand = order(oi)
        if (!taken(cand)) {
          var score = rel(cand)
          if (s > 0 && penaltyWeight > 0) {
            var maxCos = Long.MinValue
            var si = 0
            while (si < s) {
              val c = cosMicro(cand, selected(si))
              if (c > maxCos) maxCos = c
              si += 1
            }
            score -= penaltyWeight.toLong * maxCos
          }
          if (bestIdx < 0 || score > bestScore ||
              (score == bestScore && doc(cand) < doc(bestIdx))) {
            bestIdx = cand; bestScore = score
          }
        }
        oi += 1
      }
      taken(bestIdx) = true
      selected(s) = bestIdx
      outSteps(s) = InternalRow(s + 1, doc(bestIdx), bestScore)
      s += 1
    }
    new GenericArrayData(outSteps.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("mmrSel", this, "graft.functions.MmrSelectExpr")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
