package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Two paths:
  *
  *  - brute-force cosine top-k: broadcast the (small) query set against
  *    the full corpus — one scan, no shuffle except the final per-query
  *    top-k window over ≤ corpus rows; the correctness baseline.
  *  - LSH (random hyperplanes): deterministic seeded planes → sign-bit
  *    bucket per vector → candidates share a bucket → exact cosine only
  *    within buckets. At 100 TB the bucket groupBy is the only shuffle
  *    and the all-pairs cross product never materializes.
  */
object Similarity {

  /** Cosine similarity — native fused expression (one pass over both
    * arrays, float→double promotion matching DuckDB's arithmetic). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.CosineSimilarityExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Coarse-quantizer cell assignment (struct(cl, max_sim)) — ONE
    * reference-object kernel call per row, plan size independent of
    * nlist (see [[graft.functions.CoarseCellExpr]]; VERDICT r14 #3 —
    * the nlist-cosine HOF array this replaced is the expression family
    * that falls out of whole-stage codegen at production nlist). */
  private def coarseCell(emb: Column, cents: Array[Array[Float]]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.CoarseCellExpr(
        org.apache.spark.sql.GraftBridge.expression(emb), cents))

  /** The full coarse-centroid cosine array (query-probe side — nprobe
    * selection sorts the whole array; see
    * [[graft.functions.CoarseSimsExpr]]). */
  private def coarseSims(emb: Column, cents: Array[Array[Float]]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.CoarseSimsExpr(
        org.apache.spark.sql.GraftBridge.expression(emb), cents))

  /** Two-phase deterministic top-k per query over (q_id, neighbor, sim)
    * candidates: rank within (q_id, source partition) first — parallelism
    * = #queries × #scan partitions — then rank the ≤ k·partitions
    * survivors per query. Any true top-k row survives its partition-local
    * cut (standard superset argument), so results are identical to the
    * single-window form while the per-query serial task only ever sees
    * k·partitions rows. This is what keeps a LARGE query set from
    * serializing the full candidate stream through #queries tasks. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val pre = Window.partitionBy(col("q_id"), col("__pid"))
      .orderBy(col("sim").desc, col("neighbor"))
    val fin = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor"))
    scored
      .withColumn("__pid", spark_partition_id())
      .withColumn("__prk", row_number().over(pre))
      .filter(col("__prk") <= k)
      .withColumn("rk", row_number().over(fin))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor"), col("sim"))
  }

  /** Exact top-k neighbors for each query vector (queries = a filtered
    * subset of the corpus, broadcast). Deterministic: ties broken by
    * vec_id after rounding. Excludes self-matches. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c").join(
        broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))),
        col("c.vec_id") =!= col("q_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("c.embedding")), 4))
    topKPerQuery(joined.select(col("q_id"), col("c.vec_id").as("neighbor"),
      col("sim")), k)
  }

  /** Deterministic pseudo-random hyperplanes: plane(p)[d] derived from a
    * splitmix-style integer hash of (seed, p, d) — reproducible across
    * engines and runs, no RNG state. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      var z = seed + p * 1000003L + d * 998244353L
      z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
      z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
      z = z ^ (z >>> 33)
      (z.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
    }

  /** Sign-bit LSH bucket id for an embedding column. */
  def lshBucket(emb: Column, planeArr: Array[Array[Double]]): Column = {
    val bits = planeArr.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      val dot = aggregate(zip_with(emb, planeCol, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-probe LSH ANN: exact cosine among corpus vectors whose bucket
    * is the query's bucket OR differs in one bit (the standard multi-probe
    * scheme — a sign flipped by a near-boundary hyperplane is the common
    * miss mode). Recall < 1 vs brute force by design — the scale path:
    * candidates per query ≈ (nPlanes+1) · corpus/2^nPlanes, never the
    * full cross product. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val pl = planes(nPlanes, dim)
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), pl))
    // query buckets come from the query set DIRECTLY (small, broadcast
    // side) — deriving them by joining the bucketed corpus would pay the
    // nPlanes×dim dot products over every corpus vector a second time
    val qb = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("q_bucket", lshBucket(col("q_emb"), pl))
      // probe set: exact bucket + all Hamming-1 neighbors
      .withColumn("probes", array((lit(0L) +:
        (0 until nPlanes).map(i => lit(1L << i))).map(b => col("q_bucket").bitwiseXOR(b)): _*))
      .drop("q_bucket")
    val cands = bucketed.as("c").join(broadcast(qb),
        array_contains(col("probes"), col("c.bucket")) && col("c.vec_id") =!= col("q_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("c.embedding")), 4))
    topKPerQuery(cands.select(col("q_id"), col("c.vec_id").as("neighbor"),
      col("sim")), k)
  }

  /** DuckDB oracle for lshTopK: the hyperplanes are deterministic, so the
    * whole multi-probe pipeline (sign-bit bucket, Hamming≤1 probe set,
    * exact cosine, top-k) is SQL-expressible — the plane matrix embeds as
    * literals and bucket equality reduces to bit_count(xor) ≤ 1.
    * Sign agreement between engines holds because both compute the dot
    * product in double; a flip would need |dot| at float-noise scale. */
  def lshOracleSql(nPlanes: Int = 8, dim: Int = 64, k: Int = 5,
                   maxQueryId: Int = 8): String = {
    val pl = planes(nPlanes, dim)
    val terms = pl.zipWithIndex.map { case (row, i) =>
      s"(CASE WHEN list_dot_product(embedding, [${row.mkString(",")}]) >= 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH b AS (SELECT vec_id, embedding, ($terms) AS bucket FROM embeddings),
       |qs AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
       |       FROM b WHERE vec_id < $maxQueryId),
       |cands AS (
       |  SELECT qs.q_id, c.vec_id AS neighbor,
       |    round(list_cosine_similarity(qs.q_emb, c.embedding), 4) AS sim
       |  FROM b c JOIN qs ON c.vec_id <> qs.q_id
       |    AND bit_count(xor(c.bucket::BIGINT, qs.q_bucket::BIGINT)) <= 1),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY sim DESC, neighbor) AS rk FROM cands)
       |SELECT q_id, rk, neighbor, sim FROM ranked WHERE rk <= $k""".stripMargin
  }

  /** Train an IVF codebook with Lloyd iterations over a (sampled) corpus:
    * deterministic k-means — init = the nlist lowest-id vectors, then
    * `iters` rounds of assign (one distributed pass per round, centroids
    * broadcast as literals) + mean-update (driver-side over nlist×dim
    * doubles). At 100 TB: train on a bounded sample (`sampleMod`), the
    * per-round cost is one scan of the sample; assignment of the full
    * corpus stays the one codegen'd projection in ivfTopK. Empty cells
    * keep their previous centroid (standard Lloyd fallback). */
  def trainIvfCodebook(corpus: DataFrame, nlist: Int, iters: Int = 5,
                       sampleMod: Int = 1): Array[Array[Float]] = {
    val sample = (if (sampleMod > 1) corpus.filter(col("vec_id") % sampleMod === 0)
                  else corpus).select(col("embedding"))
    var cents: Array[Array[Float]] = corpus.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)
    require(cents.length == nlist, s"corpus smaller than nlist=$nlist")
    for (_ <- 0 until iters) {
      val assigned = sample.withColumn("cl",
        coarseCell(col("embedding"), cents).getField("cl"))
      // per-cell mean in one aggregation (element-wise sum via
      // posexplode + groupBy (cell, dim) stays distributed)
      val means = assigned
        .select(col("cl"), posexplode(col("embedding")))
        .groupBy(col("cl"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      cents = next
    }
    cents
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into nlist cells; each query probes only its nprobe nearest cells.
    * At 100 TB the corpus is scanned ONCE to assign cells (embarrassingly
    * parallel), the probe join touches nprobe/nlist of the data, and no
    * cross product ever materializes — the classic IVF-Flat layout, with
    * the cell id as the natural partitioning/bucketing key.
    *
    * The quantizer here takes the first nlist corpus vectors as centroids
    * (deterministic stand-in for k-means — at scale, train on a sample
    * and broadcast the codebook; the assignment/probe machinery is
    * identical). Cell assignment = argmax cosine, first-max-wins.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              codebook: Option[Array[Array[Float]]] = None): DataFrame = {
    // codebook: tiny (nlist × dim) — trained via trainIvfCodebook or the
    // deterministic first-nlist stand-in; embedded as literals so the
    // assignment is one codegen'd projection, no join
    val cents: Array[Array[Float]] = codebook.getOrElse(
      corpus.filter(col("vec_id") < nlist)
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).map(_._2))
    require(cents.length == nlist, s"expected $nlist centroids, got ${cents.length}")
    val assigned = corpus.withColumn("cl",
      coarseCell(col("embedding"), cents).getField("cl"))
    // per query: the nprobe cells with highest centroid similarity
    // (sort by (-sim, cid) — deterministic first-max-wins ordering)
    val qprobes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("s", coarseSims(col("q_emb"), cents))
      .withColumn("probes", slice(transform(
        array_sort(transform(sequence(lit(0), lit(nlist - 1)),
          i => struct((-element_at(col("s"), i + 1)).as("ns"), i.as("i")))),
        x => x.getField("i")), 1, nprobe))
      .select(col("q_id"), col("q_emb"), explode(col("probes")).as("probe"))
    val cands = assigned.as("c").join(broadcast(qprobes),
        col("cl") === col("probe") && col("c.vec_id") =!= col("q_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("c.embedding")), 4))
    topKPerQuery(cands.select(col("q_id"), col("c.vec_id").as("neighbor"),
      col("sim")), k)
  }

  /** Product-quantization ANN (PQ-ADC) — the memory-bound scale path for
    * billion-vector search: each embedding compresses to `m` small codes
    * (one per subvector, `ksub` centroids each → m·log2(ksub) bits,
    * here 8×4 = 4 bytes per vector vs 256 bytes of float32), and query
    * scoring reads ONLY the codes via per-query lookup tables
    * (asymmetric distance: LUT[j][c] = ‖q_j − centroid_{j,c}‖²,
    * dist(x) = Σ_j LUT[j][code_j(x)]). At 100 TB the corpus scan
    * touches m bytes per vector instead of the embedding column — the
    * compression IS the operator; compose with [[ivfTopK]]'s cell
    * filter for the production IVF-PQ layout.
    *
    * Determinism discipline (the whole pipeline is oracle-exact):
    *  - codebooks = the first `ksub` corpus vectors' subvectors
    *    (deterministic stand-in for per-subspace k-means, exactly the
    *    [[ivfTopK]] quantizer convention; train on a sample and pass
    *    real codebooks at scale);
    *  - subspace distances quantize to integer micro-L2² BEFORE any
    *    sum — floor(1e6·(⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩)), each dot product a
    *    sequential left fold both engines share — so ADC distances are
    *    sums of integers (order-free) and ranks can never split on a
    *    ulp;
    *  - code assignment and top-k tie-break: lowest centroid index /
    *    lowest neighbor id.
    *
    * Bounded collects by construction: the `ksub` codebook rows and the
    * query set (LUTs are built driver-side from it — ksub·m integers
    * per query, the standard ADC table). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, dim: Int = 64,
             codebook: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    // codebook(j)(c) = subspace-j centroid c. Default: subvectors of
    // the first ksub corpus vectors (bounded collect); pass
    // [[trainPqCodebooks]]' output at scale.
    val cents: Array[Array[Array[Float]]] =
      codebook.getOrElse(firstKsubCodebooks(corpus, m, ksub, dim))
    require(cents.length == m && cents.forall(_.length == ksub),
      "codebook must be m x ksub")
    // per-vector codes: ONE native kernel call per row
    // (graft.functions.PqCodesExpr — the m·ksub aggregate-expression
    // formulation fell out of whole-stage codegen's method limits into
    // interpreted evaluation, measured 110 s vs ~3 s at sf10)
    val codes = corpus.select(col("vec_id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.PqCodesExpr(
          org.apache.spark.sql.GraftBridge.expression(col("embedding")),
          cents)).as("codes"))
    // all per-query distances from ONE reference-object kernel call +
    // posexplode: one scan of the codes, no per-query union, no join —
    // and no per-query LITERALS: the LUT matrix rides in as a reference
    // object, so plan size is independent of |queries| (the Column
    // formulation emitted m·ksub literal longs per query and would hand
    // Janino a megabyte projection at 10^4-query batches; exactly the
    // PqCodesExpr lesson, applied to the scoring side)
    val (qIdArr, luts) = pqQueryLuts(queries, cents, m, ksub, sub)
    val dists = org.apache.spark.sql.GraftBridge.column(
      graft.functions.PqAdcExpr(
        org.apache.spark.sql.GraftBridge.expression(col("codes")),
        org.apache.spark.sql.GraftBridge.expression(col("vec_id")),
        org.apache.spark.sql.GraftBridge.expression(lit(0)),
        luts, qIdArr, null, 0))
    val scored = codes
      .select(col("vec_id").as("neighbor"), posexplode(dists))
      .filter(col("col").isNotNull) // self-exclusion (kernel emits null)
      .select(col("pos").as("q_id"), col("neighbor"),
        (-col("col")).as("sim"))
    // q_id rides as the dense query INDEX through the windows; the real
    // id maps back via one tiny literal array over the ≤ |q|·k result
    // rows — the only place literal size is O(|queries|), far off the
    // scan path
    val qIds = array(qIdArr.map(lit(_)): _*)
    topKPerQuery(scored, k)
      .select(element_at(qIds, col("q_id").cast("int") + 1).as("q_id"),
        col("rk"), col("neighbor"), (-col("sim")).as("dist_micro"))
  }

  /** IVF-PQ — the production billion-vector layout SURVEY §2.11
    * promises: [[ivfTopK]]'s coarse cell filter composes with
    * [[pqTopK]]'s code-only ADC scoring. One corpus scan computes the
    * coarse cell AND the PQ codes; a codegen'd `cl IN probedCells`
    * filter prunes the scan to the union of all probed cells BEFORE any
    * explode (at nprobe/nlist selectivity this is the IVF win); the ADC
    * kernel then scores only (query, row) pairs whose cell the query
    * actually probes (null otherwise — see
    * [[graft.functions.PqAdcExpr]]).
    *
    * The composition's own correctness subtlety is PER-CELL CANDIDATE
    * TRUNCATION: production IVF-PQ caps how many candidates each probed
    * cell contributes before the final ranking (memory-bounds the
    * per-query merge at scale). The cap here is deterministic — rank
    * within (query, cell) by (ADC distance, neighbor id), keep
    * `maxPerCell` — so the DuckDB oracle replays it exactly; like
    * ann_lsh's probe set, recall < 1 vs exhaustive PQ is part of the
    * operator contract. The truncation rank uses the same two-phase
    * partition-local pre-cut as [[topKPerQuery]], so no (query, cell)
    * group ever serializes more than maxPerCell·partitions rows.
    *
    * Query probes are computed with the SAME Spark expression ivfTopK
    * uses (collected — queries are bounded by the pqTopK LUT contract
    * anyway), so engine parity never rests on driver-side float
    * arithmetic. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16, dim: Int = 64,
                maxPerCell: Int = 8,
                coarseCodebook: Option[Array[Array[Float]]] = None,
                pqCodebook: Option[Array[Array[Array[Float]]]] = None)
      : DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    val coarse: Array[Array[Float]] = coarseCodebook.getOrElse(
      corpus.filter(col("vec_id") < nlist)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).map(_._2))
    require(coarse.length == nlist, s"expected $nlist coarse centroids")
    val cents: Array[Array[Array[Float]]] =
      pqCodebook.getOrElse(firstKsubCodebooks(corpus, m, ksub, dim))
    // per-query probe cells via the exact ivfTopK expression (collected:
    // |queries| × nprobe ints)
    val qProbeRows = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("s", coarseSims(col("q_emb"), coarse))
      .withColumn("probes", slice(transform(
        array_sort(transform(sequence(lit(0), lit(nlist - 1)),
          i => struct((-element_at(col("s"), i + 1)).as("ns"), i.as("i")))),
        x => x.getField("i")), 1, nprobe))
      .select(col("q_id"), col("probes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toArray)).sortBy(_._1)
    // LUTs exactly as pqTopK — the shared helper, so the
    // oracle-exactness-critical micro-L2² arithmetic can never drift
    // between the exhaustive and IVF-composed paths
    val (qIdArr, luts) = pqQueryLuts(queries, cents, m, ksub, sub)
    val probeCells: Array[Array[Int]] = qProbeRows.map(_._2)
    val allProbed = probeCells.flatten.distinct.sorted
    // ONE scan: cell + codes in the same codegen'd projection, then the
    // visible cell-filter prune (nprobe/nlist of the corpus survives)
    val scan = corpus.select(col("vec_id"),
        coarseCell(col("embedding"), coarse).getField("cl").as("cl"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.PqCodesExpr(
            org.apache.spark.sql.GraftBridge.expression(col("embedding")),
            cents)).as("codes"))
      .filter(col("cl").isin(allProbed.map(_.asInstanceOf[Any]): _*))
    val dists = org.apache.spark.sql.GraftBridge.column(
      graft.functions.PqAdcExpr(
        org.apache.spark.sql.GraftBridge.expression(col("codes")),
        org.apache.spark.sql.GraftBridge.expression(col("vec_id")),
        org.apache.spark.sql.GraftBridge.expression(col("cl")),
        luts, qIdArr, probeCells, nlist))
    val scored = scan
      .select(col("vec_id").as("neighbor"), col("cl"), posexplode(dists))
      .filter(col("col").isNotNull) // self + unprobed-cell exclusion
      .select(col("pos").as("q_id"), col("cl"), col("neighbor"),
        (-col("col")).as("sim"))
    // deterministic per-cell truncation, two-phase like topKPerQuery
    val preCell = Window.partitionBy(col("q_id"), col("cl"), col("__pid"))
      .orderBy(col("sim").desc, col("neighbor"))
    val finCell = Window.partitionBy(col("q_id"), col("cl"))
      .orderBy(col("sim").desc, col("neighbor"))
    val trunc = scored
      .withColumn("__pid", spark_partition_id())
      .withColumn("__pcrk", row_number().over(preCell))
      .filter(col("__pcrk") <= maxPerCell)
      .withColumn("crk", row_number().over(finCell))
      .filter(col("crk") <= maxPerCell)
      .select(col("q_id"), col("neighbor"), col("sim"))
    val qIds = array(qIdArr.map(lit(_)): _*)
    topKPerQuery(trunc, k)
      .select(element_at(qIds, col("q_id").cast("int") + 1).as("q_id"),
        col("rk"), col("neighbor"), (-col("sim")).as("dist_micro"))
  }

  /** Query-side PQ lookup tables — THE oracle-exactness-critical
    * arithmetic (per (query, subspace, centroid): integer micro-floored
    * asymmetric L2², `floor(1e6·(⟨q,q⟩ − 2⟨q,c⟩ + ⟨c,c⟩))`, every dot a
    * sequential left fold over double-promoted floats). Lives in ONE
    * place shared by [[pqTopK]] and [[ivfPqTopK]] so a change can never
    * drift between the exhaustive and IVF-composed paths while only one
    * of them trips the gate. Bounded collect: the query set (m·ksub
    * longs per query). Returns (query ids sorted ascending, LUT matrix
    * in the same order). */
  private def pqQueryLuts(queries: DataFrame,
                          cents: Array[Array[Array[Float]]],
                          m: Int, ksub: Int, sub: Int)
      : (Array[Long], Array[Array[Array[Long]]]) = {
    val centSelf: Array[Array[Double]] = Array.tabulate(m, ksub) { (j, c) =>
      val s = cents(j)(c); var acc = 0.0; var i = 0
      while (i < s.length) { acc += s(i).toDouble * s(i).toDouble; i += 1 }
      acc
    }
    def lutVal(q: Array[Float], j: Int, c: Int): Long = {
      val cs = cents(j)(c)
      var dAA = 0.0; var dAB = 0.0; var i = 0
      while (i < sub) {
        val qa = q(j * sub + i).toDouble
        dAA += qa * qa; dAB += qa * cs(i)
        i += 1
      }
      math.floor((dAA - 2.0 * dAB + centSelf(j)(c)) * 1e6).toLong
    }
    val qRows = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    (qRows.map(_._1),
     qRows.map { case (_, q) =>
       Array.tabulate(m, ksub)((j, c) => lutVal(q, j, c)) })
  }

  /** The deterministic default PQ codebook: subvectors of the first
    * ksub corpus vectors (bounded collect). */
  private def firstKsubCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                                 dim: Int): Array[Array[Array[Float]]] = {
    val sub = dim / m
    val rows: Array[Array[Float]] = corpus.filter(col("vec_id") < ksub)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    require(rows.length == ksub, s"expected $ksub codebook rows")
    Array.tabulate(m, ksub)((j, c) =>
      java.util.Arrays.copyOfRange(rows(c), j * sub, (j + 1) * sub))
  }

  /** Per-subspace PQ codebook training — Lloyd iterations where each
    * round assigns ALL m subspaces in one distributed projection and
    * updates means driver-side over m·ksub·(dim/m) doubles (the
    * [[trainIvfCodebook]] discipline, subspace-factored). Empty cells
    * keep their previous centroid. At 100 TB: train on a sample
    * (`sampleMod`) and pass the result into [[pqTopK]]. */
  def trainPqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                       dim: Int = 64, iters: Int = 5,
                       sampleMod: Int = 1): Array[Array[Array[Float]]] = {
    val sub = dim / m
    val sample = (if (sampleMod > 1)
        corpus.filter(col("vec_id") % sampleMod === 0)
      else corpus).select(col("embedding"))
    var cents = firstKsubCodebooks(corpus, m, ksub, dim)
    for (_ <- 0 until iters) {
      def codeExpr(j: Int): Column = {
        val sv = slice(col("embedding"), j * sub + 1, sub)
        val dists = array((0 until ksub).map { c =>
          aggregate(zip_with(sv,
            array(cents(j)(c).map(v => lit(v.toDouble)): _*),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (acc, v) => acc + v)
        }: _*)
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }
      // one distributed pass: every subspace's assignment + subvector,
      // then per-(subspace, cell, position) means
      val means = sample
        .select(posexplode(array((0 until m).map(j =>
          struct(codeExpr(j).as("cl"),
            slice(col("embedding"), j * sub + 1, sub).as("sv"))): _*)))
        .select(col("pos").as("j"), col("col.cl").as("cl"),
          posexplode(col("col.sv")))
        .groupBy(col("j"), col("cl"), col("pos"))
        .agg(avg(col("col")).as("mean"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
      }
      cents = next
    }
    cents
  }

  /** Per-dimension uniform quantization levels for [[sq8TopK]]: dim ×
    * nlevels × 1 — scalar quantization expressed as a PQ codebook of
    * 1-dim subspaces. One combinable min/max aggregation over the
    * exploded dimension index (dim groups, map-side combined), then a
    * bounded collect of `dim` rows; level c of dimension d is
    * `min_d + c·(max_d − min_d)/(nlevels−1)` computed in double and
    * stored as Float (the codebook element type — the oracle replays
    * the same double→float rounding). `max_d == min_d` degenerates to
    * nlevels copies of the constant; code 0 wins the argmin tie. */
  def trainSqLevels(corpus: DataFrame, dim: Int = 64,
                    nlevels: Int = 256): Array[Array[Array[Float]]] = {
    val mm = corpus.select(posexplode(col("embedding")))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
      .collect()
      .map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2)))
      .sortBy(_._1)
    require(mm.length == dim, s"expected $dim dimension rows, got ${mm.length}")
    mm.map { case (_, mnF, mxF) =>
      val mn = mnF.toDouble
      val delta = (mxF.toDouble - mn) / (nlevels - 1).toDouble
      Array.tabulate(nlevels)(c => Array((mn + c * delta).toFloat))
    }
  }

  /** Scalar-quantized ANN (SQ8) — the FAISS-family rung between
    * brute-force floats and PQ: each dimension quantizes independently
    * to one of 256 uniform levels spanning that dimension's corpus
    * min/max, so a 64-float vector becomes 64 byte-codes (4× the PQ
    * footprint, far better per-dim fidelity, zero codebook training).
    *
    * Implementation IS [[pqTopK]]: scalar quantization is exactly
    * product quantization with 1-dimensional subspaces (m = dim,
    * ksub = nlevels, codebook = the uniform level ladder from
    * [[trainSqLevels]]) — the encode kernel's per-subspace argmin over
    * micro-floored L2² degenerates to nearest-level rounding and the
    * ADC scoring LUTs to per-dim (query − level)² tables, so both
    * existing kernels ([[graft.functions.PqCodesExpr]],
    * [[graft.functions.PqAdcExpr]]), the join-free plan shape, and the
    * integer-micro exactness contract carry over unchanged. The encode
    * takes [[graft.functions.PqCodesExpr]]'s monotone-ladder fast path
    * (VERDICT r14 #2): binary-search position + a ±2-window of the SAME
    * floored micro-L2² plus noise-bounded outward walks — bit-identical
    * to the 256-way argmin (ties included; PqEncodeParitySpec) at ~2-6
    * micro-distance evals per dimension instead of 256. Encode is THE
    * cost of committing a 100 TB corpus to an SQ8 index; the argmin
    * multiplier was ~20 CPU-hours per billion vectors. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, nlevels: Int = 256): DataFrame =
    pqTopK(corpus, queries, k, m = dim, ksub = nlevels, dim = dim,
      codebook = Some(trainSqLevels(corpus, dim, nlevels)))

  /** DuckDB oracle for [[sq8TopK]]: the [[pqOracleSql]] replay with the
    * codebook CTE swapped for the uniform level ladder (per-dim min/max
    * → double level → REAL cast, mirroring [[trainSqLevels]]' storage
    * rounding), subspace arithmetic reduced to its 1-dim form. */
  def sq8OracleSql(k: Int = 5, dim: Int = 64, nlevels: Int = 256,
                   maxQueryId: Int = 8): String =
    s"""WITH ev AS (SELECT vec_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS demb
       |       FROM embeddings),
       |sj AS (SELECT CAST(unnest(range($dim)) AS INT) AS j),
       |mm AS (SELECT s.j, min(e.demb[s.j+1]) AS mn, max(e.demb[s.j+1]) AS mx
       |       FROM ev e, sj s GROUP BY 1),
       |lv AS (SELECT mm.j, CAST(c AS INT) AS c,
       |         CAST(CAST(mm.mn + c * ((mm.mx - mm.mn) / ${(nlevels - 1).toDouble}) AS REAL)
       |           AS DOUBLE) AS lev
       |       FROM mm, (SELECT unnest(range($nlevels)) AS c) cs),
       |md AS (
       |  SELECT e.vec_id, l.j, l.c,
       |    CAST(floor((
       |      e.demb[l.j+1] * e.demb[l.j+1]
       |      - 2 * (e.demb[l.j+1] * l.lev)
       |      + l.lev * l.lev
       |    ) * 1e6) AS BIGINT) AS md
       |  FROM ev e, lv l),
       |codes AS (
       |  SELECT vec_id, j, CAST(min(md * $nlevels + c) % $nlevels AS INT) AS code
       |  FROM md GROUP BY 1, 2),
       |luts AS (
       |  SELECT vec_id AS q_id, j, c, md FROM md WHERE vec_id < $maxQueryId),
       |adc AS (
       |  SELECT l.q_id, x.vec_id AS neighbor, CAST(sum(l.md) AS BIGINT) AS d
       |  FROM codes x JOIN luts l ON l.j = x.j AND l.c = x.code
       |  WHERE x.vec_id <> l.q_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT q_id, neighbor, d,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d, neighbor) AS rk
       |  FROM adc)
       |SELECT q_id, rk, neighbor, d AS dist_micro
       |FROM ranked WHERE rk <= $k""".stripMargin

  /** Binary-quantization ANN (sign-bit Hamming top-k) — the cheapest
    * rung of the quantization ladder (float32 256 B → SQ8 64 B → PQ
    * 4 B → binary 8 B per 64-dim vector): each dimension contributes
    * one SIGN bit (v_d ≥ 0), packed into two 32-bit words, and distance
    * is the Hamming popcount over the XOR — the standard binary-
    * quantization rerank-candidate generator (Indyk–Motwani SimHash
    * applied with identity hyperplanes).
    *
    * Exactness contract: the code derivation involves ZERO arithmetic —
    * a float sign test is bit-exact in any engine — and Hamming
    * distances are small integers, so ranks (ties by neighbor id) are
    * oracle-exact BY CONSTRUCTION; no micro-quantization needed
    * anywhere. Recall < 1 vs exact cosine is the operator contract, as
    * with every compressed rung ([[annRecallAudit]] measures it).
    *
    * Scale shape: one codegen'd projection packs the bits (scan-bound);
    * scoring reads 8 bytes per vector — at 100 TB of float32 this scans
    * ~3% of the raw bytes. Join-free: per-query codes ride as literals
    * through one posexplode (queries bounded by the same contract as
    * [[pqTopK]]'s LUTs; a 10⁴-query batch would move the code array
    * into a reference-object kernel exactly like
    * [[graft.functions.PqAdcExpr]]). */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                  dim: Int = 64): DataFrame = {
    require(dim <= 64, s"dim=$dim exceeds the two-word bit budget")
    val loEnd = math.min(32, dim)
    def packWord(emb: Column, from: Int, until: Int): Column =
      if (until <= from) lit(0L)
      else (from until until).map(d =>
        when(element_at(emb, d + 1) >= 0, lit(1L << (d - from)))
          .otherwise(lit(0L))).reduce(_ + _)
    val coded = corpus.select(col("vec_id"),
      packWord(col("embedding"), 0, loEnd).as("clo"),
      packWord(col("embedding"), 32, dim).as("chi"))
    // query codes driver-side from the collected floats: the same sign
    // test on the same parquet values — no arithmetic, exact parity.
    // Bounded collect: the query set (the pqTopK LUT contract).
    val qCodes: Array[(Long, Long, Long)] = queries
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var lo = 0L; var hi = 0L
        var d = 0
        while (d < dim) {
          if (v(d) >= 0f) {
            if (d < 32) lo |= 1L << d else hi |= 1L << (d - 32)
          }
          d += 1
        }
        (r.getLong(0), lo, hi)
      }.sortBy(_._1)
    val dists = array(qCodes.map { case (qid, qlo, qhi) =>
      when(col("vec_id") === lit(qid), lit(null))
        .otherwise((bit_count(col("clo").bitwiseXOR(lit(qlo))) +
          bit_count(col("chi").bitwiseXOR(lit(qhi)))).cast("long"))
    }: _*)
    val scored = coded
      .select(col("vec_id").as("neighbor"), posexplode(dists))
      .filter(col("col").isNotNull) // self-exclusion
      .select(col("pos").as("q_id"), col("neighbor"), (-col("col")).as("sim"))
    val qIds = array(qCodes.map(q => lit(q._1)): _*)
    topKPerQuery(scored, k)
      .select(element_at(qIds, col("q_id").cast("int") + 1).as("q_id"),
        col("rk"), col("neighbor"), (-col("sim")).as("hamming"))
  }

  /** DuckDB oracle for [[hammingTopK]]: sign bits as CASE sums over the
    * two 32-bit words (no 1<<63 BIGINT-overflow hazard), Hamming via
    * bit_count(xor). Pure integer pipeline — no float arithmetic
    * anywhere past the sign test. */
  def hammingOracleSql(k: Int = 5, dim: Int = 64,
                       maxQueryId: Long = 8): String = {
    def word(from: Int, until: Int): String =
      if (until <= from) "0"
      else (from until until).map(d =>
        s"(CASE WHEN embedding[${d + 1}] >= 0 THEN ${1L << (d - from)} ELSE 0 END)")
        .mkString(" + ")
    s"""WITH b AS (
       |  SELECT vec_id,
       |    CAST(${word(0, math.min(32, dim))} AS BIGINT) AS clo,
       |    CAST(${word(32, dim)} AS BIGINT) AS chi
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, clo AS qlo, chi AS qhi FROM b
       |      WHERE vec_id < $maxQueryId),
       |d AS (
       |  SELECT q.q_id, c.vec_id AS neighbor,
       |    CAST(bit_count(xor(c.clo, q.qlo)) +
       |         bit_count(xor(c.chi, q.qhi)) AS BIGINT) AS hamming
       |  FROM b c CROSS JOIN q WHERE c.vec_id <> q.q_id),
       |ranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY hamming, neighbor) AS rk FROM d)
       |SELECT q_id, rk, neighbor, hamming FROM ranked WHERE rk <= $k""".stripMargin
  }

  /** Two-stage quantized retrieval — binary candidate generation +
    * exact re-rank, the production composition every compressed rung
    * feeds at scale: [[hammingTopK]] scans 8 bytes/vector to nominate
    * `nCand` candidates per query, then exact cosine re-scores ONLY
    * the |q|·nCand candidate rows (broadcast back onto one corpus
    * scan). At 100 TB the float embeddings are touched for a few
    * hundred rows per query instead of the corpus — the rerank stage
    * recovers most of the recall the binary codes trade away while
    * keeping the scan byte-bound.
    *
    * Determinism: stage 1 is integer-exact by construction (sign
    * codes, popcount, ties by neighbor); stage 2 ranks on the same
    * round-4 cosine + neighbor tie-break as [[bruteForceTopK]] — the
    * DuckDB oracle replays both stages. Recall < 1 vs exact search is
    * the operator contract (bounded by stage 1's candidate recall;
    * [[annRecallAudit]]'s methodology applies). */
  def hammingRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                        nCand: Int = 20, dim: Int = 64): DataFrame = {
    val cands = hammingTopK(corpus, queries, k = nCand, dim = dim)
      .select(col("q_id"), col("neighbor"))
    val qEmb = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"))
    // both joins broadcast the SMALL side (|q|·nCand candidate rows,
    // |q| query embeddings) against the one corpus scan
    val rescored = corpus.select(col("vec_id").as("neighbor"),
        col("embedding").as("n_emb"))
      .join(broadcast(cands), Seq("neighbor"))
      .join(broadcast(qEmb), Seq("q_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("n_emb")), 4))
    topKPerQuery(rescored.select(col("q_id"), col("neighbor"), col("sim")), k)
  }

  /** DuckDB oracle for [[hammingRerankTopK]]: the [[hammingOracleSql]]
    * CTE chain truncated at nCand feeds an exact-cosine re-rank —
    * stage 2 uses the same round-4 + neighbor tie-break as the
    * ann_cosine replay. */
  def hammingRerankOracleSql(k: Int = 5, nCand: Int = 20, dim: Int = 64,
                             maxQueryId: Long = 8): String = {
    def word(from: Int, until: Int): String =
      if (until <= from) "0"
      else (from until until).map(d =>
        s"(CASE WHEN embedding[${d + 1}] >= 0 THEN ${1L << (d - from)} ELSE 0 END)")
        .mkString(" + ")
    s"""WITH b AS (
       |  SELECT vec_id,
       |    CAST(${word(0, math.min(32, dim))} AS BIGINT) AS clo,
       |    CAST(${word(32, dim)} AS BIGINT) AS chi
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, clo AS qlo, chi AS qhi FROM b
       |      WHERE vec_id < $maxQueryId),
       |hd AS (
       |  SELECT q.q_id, c.vec_id AS neighbor,
       |    CAST(bit_count(xor(c.clo, q.qlo)) +
       |         bit_count(xor(c.chi, q.qhi)) AS BIGINT) AS hamming
       |  FROM b c CROSS JOIN q WHERE c.vec_id <> q.q_id),
       |hranked AS (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY hamming, neighbor) AS hrk FROM hd),
       |cand AS (SELECT q_id, neighbor FROM hranked WHERE hrk <= $nCand),
       |rescored AS (
       |  SELECT cand.q_id, cand.neighbor,
       |    round(list_cosine_similarity(qe.embedding, ne.embedding), 4) AS sim
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.q_id
       |  JOIN embeddings ne ON ne.vec_id = cand.neighbor),
       |rr AS (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY sim DESC, neighbor) AS rk FROM rescored)
       |SELECT q_id, rk, neighbor, sim FROM rr WHERE rk <= $k""".stripMargin
  }

  /** Recall@k audit of the compressed index against the exact ranking —
    * THE metric a platform measures before committing 100 TB to an
    * index layout (every compressed rung trades recall for scan bytes;
    * this quantifies the trade on the actual corpus + query set).
    * Per query: |exact top-k ∩ PQ top-k| and the integer micro recall.
    *
    * Both legs are the existing oracled operators ([[bruteForceTopK]],
    * [[pqTopK]]) — deterministic ranks on both sides make the METRIC
    * itself oracle-replayable, which is the audit's whole value: a
    * recall number you can trust to the last row. Cost = the two legs
    * (at scale: run on a sampled query set; the join is |q|·k rows a
    * side, broadcast). */
  def annRecallAudit(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     m: Int = 8, ksub: Int = 16, dim: Int = 64): DataFrame = {
    val exact = bruteForceTopK(corpus, queries, k)
      .select(col("q_id"), col("neighbor"))
    val approx = pqTopK(corpus, queries, k, m, ksub, dim)
      .select(col("q_id"), col("neighbor"), lit(1).as("hit"))
    exact.join(broadcast(approx), Seq("q_id", "neighbor"), "left")
      .groupBy(col("q_id"))
      .agg(count(col("hit")).as("hits"))
      .select(col("q_id"), lit(k).as("k"), col("hits"),
        expr(s"(hits * CAST(1000000 AS BIGINT)) div $k").as("recall_micro"))
  }

  /** DuckDB oracle for [[annRecallAudit]]: the [[pqOracleSql]] CTE chain
    * (shared via pqRankedCtes — the approximate leg is REPLAYED, not
    * restated) intersected with the ann_cosine replay; recall as exact
    * integer division. */
  def recallAuditOracleSql(k: Int = 10, m: Int = 8, ksub: Int = 16,
                           dim: Int = 64, maxQueryId: Int = 8): String =
    s"""WITH ${pqRankedCtes(m, ksub, dim, maxQueryId)},
       |approx AS (SELECT q_id, neighbor FROM ranked WHERE rk <= $k),
       |exq AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |        WHERE vec_id < $maxQueryId),
       |exs AS (
       |  SELECT exq.q_id, c.vec_id AS neighbor,
       |    round(list_cosine_similarity(exq.q_emb, c.embedding), 4) AS sim
       |  FROM embeddings c CROSS JOIN exq WHERE c.vec_id <> exq.q_id),
       |exr AS (SELECT *, row_number() OVER
       |  (PARTITION BY q_id ORDER BY sim DESC, neighbor) AS rk FROM exs),
       |exact AS (SELECT q_id, neighbor FROM exr WHERE rk <= $k),
       |h AS (
       |  SELECT e.q_id, count(a.neighbor) AS hits
       |  FROM exact e LEFT JOIN approx a
       |    ON a.q_id = e.q_id AND a.neighbor = e.neighbor
       |  GROUP BY 1)
       |SELECT q_id, $k AS k, hits,
       |  CAST(hits * 1000000 // $k AS BIGINT) AS recall_micro FROM h""".stripMargin

  /** The [[pqOracleSql]] CTE chain through `ranked` (codebooks, packed-
    * argmin codes, LUT join, integer ADC sums, per-query rank) — factored
    * so [[recallAuditOracleSql]] replays the IDENTICAL approximate leg
    * the standalone `ann_pq` oracle checks; a drift between the two
    * would let the audit pass while the index query fails (or vice
    * versa). */
  private[operators] def pqRankedCtes(m: Int, ksub: Int, dim: Int,
                                      maxQueryId: Int): String = {
    val sub = dim / m
    s"""cb AS (
       |  SELECT CAST(vec_id AS INT) AS c,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
       |  FROM embeddings WHERE vec_id < $ksub),
       |sj AS (SELECT CAST(unnest(range($m)) AS INT) AS j),
       |ev AS (SELECT vec_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS demb
       |       FROM embeddings),
       |md AS (
       |  SELECT e.vec_id, s.j, cb.c,
       |    CAST(floor((
       |      list_dot_product(e.demb[s.j*$sub+1 : s.j*$sub+$sub],
       |                       e.demb[s.j*$sub+1 : s.j*$sub+$sub])
       |      - 2 * list_dot_product(e.demb[s.j*$sub+1 : s.j*$sub+$sub],
       |                             cb.cemb[s.j*$sub+1 : s.j*$sub+$sub])
       |      + list_dot_product(cb.cemb[s.j*$sub+1 : s.j*$sub+$sub],
       |                         cb.cemb[s.j*$sub+1 : s.j*$sub+$sub])
       |    ) * 1e6) AS BIGINT) AS md
       |  FROM ev e, sj s, cb),
       |codes AS (
       |  SELECT vec_id, j, CAST(min(md * $ksub + c) % $ksub AS INT) AS code
       |  FROM md GROUP BY 1, 2),
       |luts AS (
       |  SELECT vec_id AS q_id, j, c, md FROM md WHERE vec_id < $maxQueryId),
       |adc AS (
       |  SELECT l.q_id, x.vec_id AS neighbor, CAST(sum(l.md) AS BIGINT) AS d
       |  FROM codes x JOIN luts l ON l.j = x.j AND l.c = x.code
       |  WHERE x.vec_id <> l.q_id
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT q_id, neighbor, d,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d, neighbor) AS rk
       |  FROM adc)""".stripMargin
  }

  /** DuckDB oracle for [[pqTopK]]: codebooks from the table (vec_id <
    * ksub), codes via the same packed argmin (md·ksub + c → min →
    * % ksub = deterministic first-min-wins), LUT join on (j, code),
    * integer ADC sums. Dot products are list_dot_product over DOUBLE
    * lists — the sequential fold parity every ANN oracle here relies
    * on. CTE chain shared with [[recallAuditOracleSql]]. */
  def pqOracleSql(k: Int = 5, m: Int = 8, ksub: Int = 16, dim: Int = 64,
                  maxQueryId: Int = 8): String =
    s"""WITH ${pqRankedCtes(m, ksub, dim, maxQueryId)}
       |SELECT q_id, rk, neighbor, d AS dist_micro
       |FROM ranked WHERE rk <= $k""".stripMargin

  /** DuckDB oracle for [[ivfPqTopK]]: the [[pqOracleSql]] replay (PQ
    * codebooks, packed-argmin codes, integer ADC) composed with the
    * ann_ivf replay (coarse cells from the first nlist vectors, probe
    * set = nprobe best cells per query) plus the deterministic per-cell
    * truncation rank. */
  def ivfPqOracleSql(k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
                     m: Int = 8, ksub: Int = 16, dim: Int = 64,
                     maxPerCell: Int = 8, maxQueryId: Int = 8): String = {
    val sub = dim / m
    s"""WITH cb AS (
       |  SELECT CAST(vec_id AS INT) AS c,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
       |  FROM embeddings WHERE vec_id < $ksub),
       |sj AS (SELECT CAST(unnest(range($m)) AS INT) AS j),
       |ev AS (SELECT vec_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS demb
       |       FROM embeddings),
       |md AS (
       |  SELECT e.vec_id, s.j, cb.c,
       |    CAST(floor((
       |      list_dot_product(e.demb[s.j*$sub+1 : s.j*$sub+$sub],
       |                       e.demb[s.j*$sub+1 : s.j*$sub+$sub])
       |      - 2 * list_dot_product(e.demb[s.j*$sub+1 : s.j*$sub+$sub],
       |                             cb.cemb[s.j*$sub+1 : s.j*$sub+$sub])
       |      + list_dot_product(cb.cemb[s.j*$sub+1 : s.j*$sub+$sub],
       |                         cb.cemb[s.j*$sub+1 : s.j*$sub+$sub])
       |    ) * 1e6) AS BIGINT) AS md
       |  FROM ev e, sj s, cb),
       |codes AS (
       |  SELECT vec_id, j, CAST(min(md * $ksub + c) % $ksub AS INT) AS code
       |  FROM md GROUP BY 1, 2),
       |luts AS (
       |  SELECT vec_id AS q_id, j, c, md FROM md WHERE vec_id < $maxQueryId),
       |coarse AS (
       |  SELECT list(list_transform(embedding, x -> CAST(x AS DOUBLE))
       |              ORDER BY vec_id) AS ce
       |  FROM embeddings WHERE vec_id < $nlist),
       |simd AS (
       |  -- cosine spelled out in DOUBLE (the decontaminateSemantic
       |  -- discipline): list_cosine_similarity on FLOAT lists returns a
       |  -- FLOAT32 result, and here a borderline flip changes CELL
       |  -- MEMBERSHIP (probe sets, truncation), not just a rounded digit
       |  SELECT e.vec_id,
       |    list_transform(coarse.ce,
       |      x -> list_dot_product(e.demb, x) /
       |           (sqrt(list_dot_product(e.demb, e.demb)) *
       |            sqrt(list_dot_product(x, x)))) AS sims
       |  FROM ev e, coarse),
       |assigned AS (
       |  SELECT vec_id, list_position(sims, list_max(sims)) - 1 AS cl
       |  FROM simd),
       |qp AS (
       |  SELECT vec_id AS q_id,
       |    unnest(list_transform(list_sort(list_transform(range($nlist),
       |        i -> {'ns': -sims[i + 1], 'i': i})),
       |      x -> x.i)[1:$nprobe]) AS probe
       |  FROM simd WHERE vec_id < $maxQueryId),
       |adc AS (
       |  SELECT l.q_id, x.vec_id AS neighbor, CAST(sum(l.md) AS BIGINT) AS d
       |  FROM codes x JOIN luts l ON l.j = x.j AND l.c = x.code
       |  WHERE x.vec_id <> l.q_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT adc.q_id, adc.neighbor, adc.d, a.cl
       |  FROM adc JOIN assigned a ON a.vec_id = adc.neighbor
       |  JOIN qp ON qp.q_id = adc.q_id AND qp.probe = a.cl),
       |cellranked AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY q_id, cl ORDER BY d, neighbor) AS crk
       |  FROM cand),
       |ranked AS (
       |  SELECT q_id, neighbor, d,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d, neighbor) AS rk
       |  FROM cellranked WHERE crk <= $maxPerCell)
       |SELECT q_id, rk, neighbor, d AS dist_micro
       |FROM ranked WHERE rk <= $k""".stripMargin
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within a blocking
    * key (label), ids ascending — the embedding-cosine near-dup operator.
    *
    * Candidate generation is banded sign-bit LSH (OR-construction, the
    * same banded layout as MinHash-LSH): `bands` bands of `rowsPerBand`
    * hyperplanes each; a pair is a candidate iff some band's sign bits
    * agree within the block. Candidates flow through the shared capped
    * `bucketPairs` kernel — ONE groupBy shuffle, a hot (blk, band, key)
    * bucket above `maxBucket` is dropped — so a dominant block ("en" at
    * 100 TB) can never materialize its m²/2 all-pairs cross product. The
    * whole pipeline is deterministic (seeded planes), so the DuckDB
    * oracle replicates it exactly, cap included; recall < 1 vs the
    * all-pairs scan is part of the operator contract, as with ann_lsh. */
  def embeddingNearDupPairs(corpus: DataFrame, blockCol: String,
                            threshold: Double, sampleMod: Int = 1,
                            bands: Int = 8, rowsPerBand: Int = 4,
                            dim: Int = 64, maxBucket: Int = 1024): DataFrame = {
    val pl = planes(bands * rowsPerBand, dim)
    val bandMask = (1L << rowsPerBand) - 1
    val base = (if (sampleMod > 1) corpus.filter(col("vec_id") % sampleMod === 0)
                else corpus)
      .select(col("vec_id"), col(blockCol).as("blk"), col("embedding"))
      // all sign bits in one codegen'd projection over the single scan
      .withColumn("bits", lshBucket(col("embedding"), pl))
    // The embedding payload rides the band rows and pairs verify at
    // emission — the ids-only + join-back layout that wins 8× for
    // minhashLshPairs was MEASURED 11× SLOWER here at sf10 (134 s vs
    // 12 s): the near-dup-dense corpus emits a pair volume large enough
    // that two extra pair-sized join shuffles dominate, while the
    // payload-carrying band rows (8 bands × ~300 B) stay cheap next to
    // minhash's 16 × 520 B signatures. Measure, don't guess.
    val banded = base.select(col("vec_id"), col("blk"), col("embedding"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("bits"), b * rowsPerBand).bitwiseAND(lit(bandMask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    Dedup.bucketPairs(banded, Seq(col("blk"), col("band"), col("bkey")),
        struct(col("vec_id").as("id"), col("embedding").as("emb")), maxBucket)
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        cosine(col("p.a.emb"), col("p.b.emb")).as("sim_raw"))
      // dedupe multi-band collisions (sim identical across bands)
      .groupBy(col("id_a"), col("id_b")).agg(max(col("sim_raw")).as("sim_raw"))
      .filter(col("sim_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim_raw"), 4).as("sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): coarse-cluster the embedding space, then inside
    * each cluster mark as duplicates the vectors that have a LOWER-id
    * neighbor with cosine ≥ tau — the paper's upper-triangular
    * max-similarity rule with vec_id order standing in for the
    * centroid-distance ordering (any deterministic total order yields a
    * valid one-representative-per-group selection).
    *
    * Returns every corpus row as (vec_id, cl, kept) — kept = false iff a
    * lower-id same-cluster vector is tau-close.
    *
    * Scale shape: cell assignment is one codegen'd projection against a
    * broadcast codebook (as in [[ivfTopK]]); the within-cluster pairing
    * reuses the shared capped [[Dedup.bucketPairs]] kernel — ONE groupBy
    * shuffle, clusters above `maxCluster` members are passed through
    * un-deduped rather than materializing an m²/2 blow-up. At 100 TB:
    * train the codebook on a sample ([[trainIvfCodebook]]) with
    * nlist ∝ corpus/targetCellSize so cells stay ~10³ vectors; here the
    * deterministic default keeps the whole pipeline (adaptive nlist =
    * max(16, ⌈N/512⌉), first-nlist centroids, argmax-cosine assignment)
    * oracle-expressible. */
  def semDedup(corpus: DataFrame, tau: Double,
               codebook: Option[Array[Array[Float]]] = None,
               cellTarget: Int = 512, maxCluster: Int = 4096,
               nlistCap: Int = 1024): DataFrame = {
    val cents: Array[Array[Float]] = codebook.getOrElse {
      // nlistCap bounds the DRIVER-side codebook collect (nlist × dim
      // floats) — plan size is nlist-independent since the CoarseCellExpr
      // kernel (the codebook rides as one reference object, r15); the
      // cap keeps the default's collect/broadcast bounded. Past the
      // cap, cells grow toward maxCluster and the right tool is a
      // TRAINED codebook ([[trainIvfCodebook]]) with bucketed
      // assignment, passed in via `codebook`.
      val nlist = math.min(nlistCap.toLong,
        math.max(16L, (corpus.count() + cellTarget - 1) / cellTarget)).toInt
      corpus.filter(col("vec_id") < nlist)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).map(_._2)
    }
    val assigned = corpus
      .select(col("vec_id"), col("embedding"))
      .withColumn("cl", coarseCell(col("embedding"), cents).getField("cl"))
    // bucketPairs sorts members ascending, so p.a.id < p.b.id always:
    // the higher id of a tau-close pair is the duplicate
    val dropped = Dedup.bucketPairs(assigned, Seq(col("cl")),
        struct(col("vec_id").as("id"), col("embedding").as("emb")), maxCluster)
      .filter(cosine(col("p.a.emb"), col("p.b.emb")) >= tau)
      .select(col("p.b.id").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl"), col("dup").isNull.as("kept"))
  }

  /** Topic/diversity report over the embedding space — the corpus-
    * balance audit a mixture designer reads before setting domain
    * weights: assign every vector to its coarse cell (the same
    * deterministic quantizer as [[semDedup]]: adaptive nlist,
    * first-nlist codebook, argmax cosine) and report per-cluster mass
    * plus the cosine-to-centroid distribution. Tight clusters with
    * huge mass = redundant content; singletons = outliers/noise.
    *
    * Determinism discipline: per-row cosine is floor-quantized to an
    * integer micro-sim BEFORE aggregation, so sums are order-
    * independent and the whole report is oracle-exact; the table
    * reports (n, sum, min, max) rather than a float average (integer
    * division semantics differ between engines for negative sums).
    *
    * Scale shape: one codegen'd projection against the broadcast
    * codebook + ONE map-side-combinable groupBy with ≤ nlist output
    * rows. At 100 TB: train the codebook on a sample
    * ([[trainIvfCodebook]]) and pass it in, exactly as [[semDedup]]
    * documents. */
  def clusterTopics(corpus: DataFrame,
                    codebook: Option[Array[Array[Float]]] = None,
                    cellTarget: Int = 512, nlistCap: Int = 1024): DataFrame = {
    val cents: Array[Array[Float]] =
      codebook.getOrElse(defaultTopicCodebook(corpus, cellTarget, nlistCap))
    // ONE kernel call yields the argmax cell AND the max it was chosen
    // by (identical double), so the floor-quantized micro-sim can never
    // drift from the assignment
    corpus.select(col("vec_id"),
        coarseCell(col("embedding"), cents).as("cc"))
      .select(col("vec_id"),
        col("cc.cl").as("cl"),
        floor(col("cc.max_sim") * 1e6).cast("long").as("msim"))
      .groupBy(col("cl"))
      .agg(count(lit(1)).as("n"),
        sum(col("msim")).as("sum_micro_sim"),
        min(col("msim")).as("min_micro_sim"),
        max(col("msim")).as("max_micro_sim"))
  }

  /** The deterministic default quantizer codebook (adaptive nlist,
    * first-nlist rows) — extracted so the STREAMING face can train it
    * from the static table before the stream starts (a streaming DF
    * cannot run the count/collect actions; a production run loads a
    * trained codebook the same way). Bounded collect: ≤ nlistCap rows. */
  def defaultTopicCodebook(corpus: DataFrame, cellTarget: Int = 512,
                           nlistCap: Int = 1024): Array[Array[Float]] = {
    val nlist = math.min(nlistCap.toLong,
      math.max(16L, (corpus.count() + cellTarget - 1) / cellTarget)).toInt
    corpus.filter(col("vec_id") < nlist)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
  }

  /** DuckDB oracle for [[clusterTopics]] with the deterministic default
    * quantizer. Cosine spelled out in DOUBLE over cast lists (the
    * [[decontaminateSemanticOracleSql]] precedent — float32
    * list_cosine_similarity flips borderline micro-sim floors);
    * centroids come FROM THE TABLE (not literals), so the f32→f64
    * promotion is bit-identical to the engine's lit(Float) path. */
  def clusterTopicsOracleSql(cellTarget: Int = 512,
                             nlistCap: Int = 1024): String =
    s"""WITH n AS (
       |  SELECT least($nlistCap,
       |    greatest(16, CAST(ceil(count(*) / $cellTarget.0) AS INT))) AS nl
       |  FROM embeddings),
       |cb AS (
       |  SELECT list(list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    ORDER BY vec_id) AS ce
       |  FROM embeddings, n WHERE vec_id < n.nl),
       |assigned AS (
       |  SELECT vec_id,
       |    list_position(sims, list_max(sims)) - 1 AS cl,
       |    CAST(floor(list_max(sims) * 1e6) AS BIGINT) AS msim
       |  FROM (SELECT e.vec_id,
       |          list_transform(cb.ce, c ->
       |            list_dot_product(de, c) /
       |            (sqrt(list_dot_product(de, de)) *
       |             sqrt(list_dot_product(c, c)))) AS sims
       |        FROM (SELECT vec_id,
       |                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
       |              FROM embeddings) e, cb))
       |SELECT cl, count(*) AS n,
       |  CAST(sum(msim) AS BIGINT) AS sum_micro_sim,
       |  min(msim) AS min_micro_sim,
       |  max(msim) AS max_micro_sim
       |FROM assigned GROUP BY 1""".stripMargin

  /** DuckDB oracle for [[semDedup]] with the deterministic default
    * quantizer: adaptive nlist, first-nlist codebook, argmax-cosine
    * assignment (first-max-wins both engines), maxCluster guard mirrored
    * as a HAVING band. */
  def semDedupOracleSql(tau: Double, cellTarget: Int = 512,
                        maxCluster: Int = 4096, nlistCap: Int = 1024): String =
    s"""WITH n AS (
       |  SELECT least($nlistCap,
       |    greatest(16, CAST(ceil(count(*) / $cellTarget.0) AS INT))) AS nl
       |  FROM embeddings),
       |cb AS (
       |  SELECT list(embedding ORDER BY vec_id) AS ce
       |  FROM embeddings, n WHERE vec_id < n.nl),
       |assigned AS (
       |  SELECT vec_id, embedding,
       |    list_position(sims, list_max(sims)) - 1 AS cl
       |  FROM (SELECT e.vec_id, e.embedding,
       |          list_transform(cb.ce, x -> list_cosine_similarity(e.embedding, x)) AS sims
       |        FROM embeddings e, cb)),
       |small AS ( -- the engine's maxCluster pass-through guard, mirrored
       |  SELECT cl FROM assigned GROUP BY cl
       |  HAVING count(*) BETWEEN 2 AND $maxCluster),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assigned a
       |  JOIN assigned b ON a.cl = b.cl AND a.vec_id < b.vec_id
       |  JOIN small s ON s.cl = a.cl
       |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= $tau)
       |SELECT a.vec_id, a.cl, d.vec_id IS NULL AS kept
       |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id""".stripMargin

  /** Embedding-space (semantic) eval-set decontamination — the third
    * rung of the decontamination ladder next to Dedup.decontaminate
    * (exact n-gram) and Dedup.decontaminateFuzzy (micro-Jaccard): a
    * training document is contaminated when its embedding is tau-close
    * in cosine to ANY eval-set embedding, catching paraphrases that
    * share no 13-gram. Eval membership is `vec_id % evalMod == 0`
    * (deterministic synth split standing in for an external benchmark
    * table).
    *
    * Scale shape: both sides are sign-bit-LSH banded (shared [[planes]]
    * matrix — `bands` bands of `rowsPerBand` bits), and the only join is
    * train-bands × BROADCAST eval-bands on (band, bkey). The broadcast
    * is bounded by nature, not by luck: an eval set is a curated
    * benchmark suite (10³–10⁵ rows), never corpus-scale — same
    * precondition as the exact decontaminator's broadcast gram set, and
    * the banding bounds the comparison fan-out to colliding buckets
    * (≈ |eval|/2^rowsPerBand per band per train row) instead of
    * brute-force |train|×|eval|. Per-train max-sim is one combinable
    * groupBy. LSH recall < 1 by design (a tau-close pair colliding in no
    * band is missed) — the documented trade for never computing the
    * cross product.
    *
    * Returns every TRAIN row: (vec_id, max_sim round-4 of collided evals
    * or NULL, contaminated). */
  def decontaminateSemantic(corpus: DataFrame, evalMod: Int, tau: Double,
                            bands: Int = 8, rowsPerBand: Int = 6,
                            dim: Int = 64): DataFrame = {
    require(bands * rowsPerBand <= 62, "bit budget: keep the bucket id positive")
    val pl = planes(bands * rowsPerBand, dim)
    val bandMask = (1L << rowsPerBand) - 1
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs))
        .withColumn("bits", lshBucket(col(embAs), pl))
        .select(col(idAs), col(embAs),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col("bits"), b * rowsPerBand)
              .bitwiseAND(lit(bandMask))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val train = corpus.filter(col("vec_id") % evalMod =!= 0)
    val eval = corpus.filter(col("vec_id") % evalMod === 0)
    val hits = banded(train, "vec_id", "emb_t")
      .join(broadcast(banded(eval, "eval_id", "emb_e")), Seq("band", "bkey"))
      .select(col("vec_id"), cosine(col("emb_t"), col("emb_e")).as("sim"))
      .groupBy(col("vec_id")).agg(max(col("sim")).as("ms"))
    train.select(col("vec_id"))
      .join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"), round(col("ms"), 4).as("max_sim"),
        coalesce(col("ms") >= tau, lit(false)).as("contaminated"))
  }

  /** DuckDB oracle for [[decontaminateSemantic]]: literal plane matrix,
    * band keys as bit-slices (bit budget ≤ 62 keeps the BIGINT positive,
    * so DuckDB's arithmetic `>>` equals the engine's unsigned shift),
    * cross-set band join, per-train max cosine. */
  def decontaminateSemanticOracleSql(evalMod: Int, tau: Double,
                                     bands: Int = 8, rowsPerBand: Int = 6,
                                     dim: Int = 64): String = {
    val pl = planes(bands * rowsPerBand, dim)
    val terms = pl.zipWithIndex.map { case (row, i) =>
      s"(CASE WHEN list_dot_product(embedding, [${row.mkString(",")}]) >= 0 " +
        s"THEN ${1L << i}::BIGINT ELSE 0 END)"
    }.mkString(" + ")
    // cosine is spelled out in DOUBLE (dot/(sqrt·sqrt) over cast lists)
    // rather than list_cosine_similarity: on FLOAT lists DuckDB returns
    // a FLOAT32 result, and its final-rounding noise vs the engine's
    // all-double kernel flips borderline round(…,4) digits (seen at
    // sf0.001: 2 of 490 rows, enough to misalign the gate's sorted
    // compare). The explicit form reproduces the kernel's exact op
    // sequence: double promote → sequential dot → sqrt(na)·sqrt(nb).
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de,
       |    ($terms) AS bits FROM embeddings),
       |banded AS (
       |  SELECT vec_id, de, band,
       |    (bits >> (band * $rowsPerBand)::INT) % ${1L << rowsPerBand} AS bkey
       |  FROM (SELECT *, unnest(range($bands)) AS band FROM b)),
       |hits AS (
       |  SELECT t.vec_id,
       |    max(list_dot_product(t.de, e.de) /
       |        (sqrt(list_dot_product(t.de, t.de)) *
       |         sqrt(list_dot_product(e.de, e.de)))) AS ms
       |  FROM banded t JOIN banded e ON t.band = e.band AND t.bkey = e.bkey
       |  WHERE t.vec_id % $evalMod <> 0 AND e.vec_id % $evalMod = 0
       |  GROUP BY 1)
       |SELECT b.vec_id, round(h.ms, 4) AS max_sim,
       |  coalesce(h.ms >= $tau, false) AS contaminated
       |FROM b LEFT JOIN hits h ON b.vec_id = h.vec_id
       |WHERE b.vec_id % $evalMod <> 0""".stripMargin
  }

  /** DuckDB oracle for embeddingNearDupPairs: the seeded plane matrix
    * embeds as literals, band keys are bit-slices of the sign vector, and
    * the maxBucket hot-bucket guard is mirrored (as in
    * Dedup.minhashOracleSql). */
  def embNearDupOracleSql(threshold: Double, bands: Int = 8,
                          rowsPerBand: Int = 4, dim: Int = 64,
                          maxBucket: Int = 1024): String = {
    val pl = planes(bands * rowsPerBand, dim)
    val terms = pl.zipWithIndex.map { case (row, i) =>
      s"(CASE WHEN list_dot_product(embedding, [${row.mkString(",")}]) >= 0 " +
        s"THEN ${1L << i}::BIGINT ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT vec_id, label, embedding, ($terms) AS bits FROM embeddings),
       |banded AS (
       |  SELECT vec_id, label, embedding, band,
       |    (bits >> (band * $rowsPerBand)::INT) % ${1L << rowsPerBand} AS bkey
       |  FROM (SELECT *, unnest(range($bands)) AS band FROM b)),
       |kept AS ( -- the engine's maxBucket hot-bucket guard, mirrored
       |  SELECT label, band, bkey FROM banded GROUP BY 1, 2, 3
       |  HAVING count(*) BETWEEN 2 AND $maxBucket),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    a.embedding AS ea, b.embedding AS eb
       |  FROM banded a JOIN banded b
       |    ON a.label = b.label AND a.band = b.band AND a.bkey = b.bkey
       |    AND a.vec_id < b.vec_id
       |  JOIN kept k ON k.label = a.label AND k.band = a.band AND k.bkey = a.bkey)
       |SELECT id_a, id_b, round(list_cosine_similarity(ea, eb), 4) AS sim
       |FROM pairs WHERE list_cosine_similarity(ea, eb) >= $threshold""".stripMargin
  }
}
