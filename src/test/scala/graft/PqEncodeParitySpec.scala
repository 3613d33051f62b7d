package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import graft.functions.PqCodesExpr
import graft.operators.Similarity

/** The SQ8 closed-form encode (VERDICT r14 #2) must be BIT-IDENTICAL to
  * the full nlevels-way argmin it replaced — including first-min-wins
  * ties, float-rounded level boundaries, collapsed ladders, and values
  * off the ladder's ends. The fast path is only a different SEARCH over
  * the same floored micro-L2² values, so any divergence is a selection
  * bug, never an arithmetic one — these fixtures aim at the selection
  * edge cases.
  */
class PqEncodeParitySpec extends SparkSpec {
  import spark.implicits._

  private def exprFor(cb: Array[Array[Array[Float]]]): PqCodesExpr =
    PqCodesExpr(org.apache.spark.sql.catalyst.expressions.Literal(null), cb)

  private def codes(e: PqCodesExpr, v: Array[Float]): Seq[Int] =
    e.kernel(new GenericArrayData(v)).toIntArray().toSeq

  private def codesGeneral(e: PqCodesExpr, v: Array[Float]): Seq[Int] =
    e.kernelGeneral(new GenericArrayData(v)).toIntArray().toSeq

  /** A 1-dim-subspace ladder codebook from explicit level arrays. */
  private def ladder(levels: Array[Array[Float]]): Array[Array[Array[Float]]] =
    levels.map(_.map(l => Array(l)))

  test("fast encode == general argmin on uniform ladders at boundary-heavy points") {
    // dim=4 ladders with distinct ranges; probe exact levels, exact
    // midpoints (the floor-flip zone), ulp-perturbed midpoints, and
    // points outside the ladder
    val nlevels = 256
    val mins = Array(-1.0, 0.0, 3.5, -1e-3)
    val maxs = Array(1.0, 1e-2, 3.5 + 1e-5, 1e-3)
    val cb = ladder(Array.tabulate(4) { d =>
      val delta = (maxs(d) - mins(d)) / (nlevels - 1).toDouble
      Array.tabulate(nlevels)(c => (mins(d) + c * delta).toFloat)
    })
    val e = exprFor(cb)
    val probes = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val rnd = new scala.util.Random(20260816L)
    (0 until nlevels).foreach { c =>
      val exact = Array.tabulate(4)(d => cb(d)(c)(0))
      probes += exact
      if (c + 1 < nlevels) {
        // midpoints between adjacent stored (float-rounded) levels —
        // where argmin ties and floor flips live
        probes += Array.tabulate(4)(d =>
          ((cb(d)(c)(0).toDouble + cb(d)(c + 1)(0).toDouble) / 2.0).toFloat)
        probes += Array.tabulate(4)(d =>
          math.nextUp((cb(d)(c)(0).toDouble + cb(d)(c + 1)(0).toDouble) / 2.0)
            .toFloat)
        probes += Array.tabulate(4)(d =>
          math.nextDown((cb(d)(c)(0).toDouble + cb(d)(c + 1)(0).toDouble) / 2.0)
            .toFloat)
      }
    }
    // off both ends + random fill
    probes += Array.tabulate(4)(d => (mins(d) - 5.0).toFloat)
    probes += Array.tabulate(4)(d => (maxs(d) + 5.0).toFloat)
    (0 until 500).foreach { _ =>
      probes += Array.tabulate(4)(d =>
        (mins(d) + (rnd.nextDouble() * 1.4 - 0.2) * (maxs(d) - mins(d))).toFloat)
    }
    probes.foreach { v =>
      assert(codes(e, v) == codesGeneral(e, v),
        s"fast/general split on ${v.mkString(",")}")
    }
  }

  test("fast encode == general argmin on degenerate ladders (collapsed and near-ulp spacing)") {
    // collapsed ladder (min == max): every level identical — code 0
    // must win (first-min-wins). near-ulp spacing: adjacent stored
    // levels collide after float rounding, producing long tie plateaus
    // the leftward walk must traverse.
    val flat = Array.fill(16)(0.25f)
    val nearUlp = Array.tabulate(16)(c => (1.0 + c * 1e-8).toFloat)
    val twoStep = Array(0f, 0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f, 1f, 1f, 2f, 2f,
      2f, 2f, 2f)
    val cb = ladder(Array(flat, nearUlp, twoStep))
    val e = exprFor(cb)
    val vals = Seq(-1f, 0f, 0.25f, 0.5f, 0.9999999f, 1f, 1.0000001f, 1.5f,
      2f, 3f)
    for (a <- vals; b <- vals; c <- vals) {
      val v = Array(a, b, c)
      assert(codes(e, v) == codesGeneral(e, v),
        s"fast/general split on ${v.mkString(",")}")
    }
    // collapsed ladder: code 0 exactly
    assert(codes(e, Array(0.25f, 1f, 1f)).head == 0)
  }

  test("fast encode == general argmin under the REAL trainSqLevels ladder on a corpus") {
    // end-to-end: the dim=64/nlevels=256 ladder sq8TopK actually trains,
    // checked vector-by-vector over the deterministic corpus
    val rows = (0 until 300).map { id =>
      val v = Array.tabulate(64) { d =>
        var z = id * 7919L + d * 104729L + 17
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        (z.toFloat / Long.MaxValue)
      }
      (id.toLong, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cb = Similarity.trainSqLevels(corpus, dim = 64, nlevels = 256)
    val e = exprFor(cb)
    rows.foreach { case (_, v) =>
      val arr = v.toArray
      assert(codes(e, arr) == codesGeneral(e, arr))
    }
  }

  test("non-monotone and multi-dim codebooks keep the general path") {
    // a shuffled (non-monotone) 1-dim codebook must not take the fast
    // path — kernel output still equals the general argmin because the
    // dispatch falls back per subspace
    val shuffled = Array(3f, 0f, 2f, 1f, 5f, 4f)
    val cb = ladder(Array(shuffled))
    val e = exprFor(cb)
    Seq(-1f, 0f, 0.4f, 1.5f, 2.5f, 3.5f, 4.5f, 6f).foreach { x =>
      assert(codes(e, Array(x)) == codesGeneral(e, Array(x)))
    }
    // multi-dim subspaces (the PQ default) are untouched by the fast
    // path: m=2, sub=2
    val pq = Array.tabulate(2, 4)((j, c) => Array((j + c).toFloat, c.toFloat))
    val e2 = exprFor(pq)
    val v = Array(0.5f, 1.5f, 2.5f, 3.5f)
    assert(codes(e2, v) == codesGeneral(e2, v))
  }
}
