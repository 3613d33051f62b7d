package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.rainer

/** Deduplication operators for training-data pipelines, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: one hash-groupBy on a fingerprint (map-side combinable).
  *  - MinHash+LSH: shingle → k minhashes → b bands; only band-bucket
  *    groupBys shuffle (each key ~few rows), never an all-pairs join.
  *  - SimHash: one 64-bit fingerprint per doc, banded into 4×16-bit keys
  *    for candidate generation, Hamming-verified.
  *  - n-gram Jaccard: exact verification via shingle-inverted-index
  *    self-join — the expensive path, bounded by a blocking key.
  */
object Dedup {

  /** Exact dedup on a normalized-content fingerprint: keeps the smallest
    * id per group, reports group size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Word n-gram shingles of a text column — native one-pass expression
    * (see ShinglesExpr: the equivalent transform/element_at HOF chain is
    * interpreted and re-evaluated per reference, ~9× slower here). */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftBridge.expression(text), n))

  /** k MinHash signatures over the shingle set — single-pass custom
    * expression (each shingle hashed once, k permutations derived by
    * integer mixing; see MinHashSignatureExpr). */
  def minhashSignature(sh: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashSignatureExpr(
        org.apache.spark.sql.GraftBridge.expression(sh), k))

  /** Ordered within-bucket pair emission: group members by bucket, sort,
    * and emit every (a, b) with a < b via a nested transform. ONE shuffle
    * (the groupBy) where a bucket self-join costs two exchanges plus the
    * join build; the pair fan-out (Σ m²/2 per bucket) is inherent to
    * candidate generation. Member structs carry per-doc payloads
    * (signatures, set sizes) so downstream needs no joins back to the
    * corpus.
    *
    * Unlike a join, the m²/2 pairs of one bucket materialize in a single
    * row before explode, so a degenerate hot bucket (a stop-shingle, a
    * band bucket full of identical docs) is a task-OOM hazard —
    * `maxBucket` drops buckets above the bound (the standard stop-shingle
    * guard: a key shared by >1024 documents identifies nothing). Raise it
    * if a corpus legitimately needs bigger buckets. */
  private def bucketPairs(df: DataFrame, bucketCols: Seq[Column],
                          member: Column, maxBucket: Int = 1024): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(sort_array(collect_list(member)).as("ms"))
      .filter(size(col("ms")) > 1 && size(col("ms")) <= maxBucket)
      .select(explode(flatten(transform(col("ms"), (a, i) =>
        transform(
          slice(col("ms"), i + 2, greatest(size(col("ms")) - i - 1, lit(0))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))

  /** MinHash-LSH candidate pairs: b bands of r rows (k = b*r). Docs
    * sharing any band bucket become candidates; estimated Jaccard =
    * matching-minhash fraction. Returns (id_a, id_b, est_jaccard) with
    * id_a < id_b. Two shuffles total (band-bucket groupBy + pair dedupe);
    * no all-pairs stage, no self-join, no cache.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 16, rows: Int = 4,
                      minEstJaccard: Double = 0.5): DataFrame = {
    val k = bands * rows
    // signature computation is CPU-bound (k hashes × shingles per doc);
    // a small input often arrives as 1-2 parquet partitions, which would
    // serialize the whole stage — spread it across the cluster first
    val par = df.sparkSession.sparkContext.defaultParallelism
    val withSig = df
      .select(col(idCol).as("doc"), col(textCol).as("t"))
      .repartition(par)
      .withColumn("sig", minhashSignature(shingles(col("t"), n), k))
      .drop("t")
    val banded = withSig.select(
      col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // est_jaccard is computed at emission (both sigs in hand); the pair
    // groupBy then dedupes docs that collide in several bands
    bucketPairs(banded, Seq(col("band"), col("bucket")),
        struct(col("doc"), col("sig")))
      .select(col("p.a.doc").as("id_a"), col("p.b.doc").as("id_b"),
        (size(filter(zip_with(col("p.a.sig"), col("p.b.sig"), (x, y) => x === y),
          e => e)).cast("double") / k).as("est"))
      .groupBy(col("id_a"), col("id_b")).agg(max(col("est")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash per doc, 4×16-bit bands for
    * blocking, Hamming ≤ maxHamming verification. Same two-shuffle
    * bucket-pairs layout as MinHash-LSH. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withH = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc"),
        rainer.simhash64(TextAnalysis.tokens(col(textCol))).as("h"))
    val banded = withH.select(col("doc"), col("h"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    bucketPairs(banded, Seq(col("band"), col("bucket")),
        struct(col("doc"), col("h")))
      .select(col("p.a.doc").as("id_a"), col("p.b.doc").as("id_b"),
        bit_count(col("p.a.h").bitwiseXOR(col("p.b.h"))).as("hamming"))
      .groupBy(col("id_a"), col("id_b")).agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Dedup cluster formation: connected components over a near-dup pair
    * list via min-label propagation WITH pointer doubling — each round
    * propagates one hop through edges AND one hop through the current
    * label table itself (doc→label→label-of-label), so chain length halves
    * per round and convergence is O(log(diameter)) joins, not O(diameter).
    * No driver-side graph ever materializes. Returns (doc, cluster) where
    * cluster = the smallest doc id reachable. */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIter: Int = 16, localThreshold: Long = 5000000L): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // cached BEFORE the probe so the expensive upstream pair DAG is never
    // recomputed: the probe materializes (and caches) whatever partitions
    // it touches, and the distributed path reuses them
    val p0 = pairs.select(col(idA).as("src"), col(idB).as("dst")).cache()
    // Scale-adaptive: a near-dup edge list is orders of magnitude smaller
    // than the corpus (it's the LSH/verify survivors), so up to
    // `localThreshold` edges a driver-side union-find (zero iterative
    // jobs) beats scheduling log(d) join rounds — the same
    // small-side-local tradeoff as a broadcast join. The bounded collect
    // probes size and fetches the edges in ONE job: ≤ threshold rows back
    // means we hold the complete set; one extra row → distributed loop.
    // localThreshold bounds driver heap (rows × 2 ids) — size it to the
    // driver as you would any broadcast/collect limit.
    val probe = p0.limit((localThreshold + 1).toInt).collect()
    if (probe.length <= localThreshold) {
      p0.unpersist()
      val spark = pairs.sparkSession
      val srcType = p0.schema("src").dataType
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        // path compression
        var c = x
        while (parent.getOrDefault(c, c) != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
        r
      }
      val ord = implicitly[Ordering[String]]
      def lessThan(a: Any, b: Any): Boolean = (a, b) match {
        case (x: Long, y: Long) => x < y
        case (x: Int, y: Int) => x < y
        case (x, y) => ord.lt(x.toString, y.toString)
      }
      val nodes = new java.util.LinkedHashSet[Any]()
      probe.foreach { row =>
        val (x, y) = (row.get(0), row.get(1))
        nodes.add(x); nodes.add(y)
        val (a, b) = (find(x), find(y))
        if (a != b) {
          // min id becomes the representative (cluster = smallest reachable)
          if (lessThan(a, b)) parent.put(b, a) else parent.put(a, b)
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      nodes.forEach { k => out += org.apache.spark.sql.Row(k, find(k)) }
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1),
        StructType(Seq(StructField("doc", srcType), StructField("cluster", srcType))))
    }
    // distributed path: p0 is already cached (partially materialized by
    // the probe). cache, NOT localCheckpoint, for the edge list:
    // checkpointing drops to the RDD and loses AQE's runtime join
    // optimization of the upstream plan (measured 3.5× slower here).
    val p = p0
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    // localCheckpoint (not cache) each round: the iteration references
    // `labels` three times, so without lineage truncation the logical plan
    // doubles per round — exponential analysis cost long before any data
    // moves. Checkpointing keeps the plan O(1) per round.
    var labels = edges.groupBy(col("src").as("doc"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // one hop through edges: min over my neighbors' labels
      val viaEdges = edges.join(labels, edges("dst") === labels("doc"))
        .select(edges("src").as("doc"), col("cluster"))
      // pointer doubling: follow my label's own label
      val viaLabels = labels.as("l1").join(labels.as("l2"),
          col("l1.cluster") === col("l2.doc"))
        .select(col("l1.doc").as("doc"), col("l2.cluster").as("cluster"))
      val next = labels.select(col("doc"), col("cluster"))
        .union(viaEdges).union(viaLabels)
        .groupBy(col("doc")).agg(min(col("cluster")).as("cluster"))
        .localCheckpoint()
      val changed = next.as("n").join(labels.as("o"), Seq("doc"))
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count() > 0
      labels = next
      converged = !changed
      i += 1
    }
    if (!converged)
      log.warn(s"clusters() exited after $maxIter rounds without converging; " +
        "components may be split — raise maxIter")
    edges.unpersist()
    p0.unpersist()
    labels
  }

  /** Exact n-gram Jaccard similarity pairs within a blocking key (lang):
    * inverted index on shingles → pair intersection counts → Jaccard.
    * The blocking column bounds bucket fan-out so the shingle self-join
    * stays linear-ish at scale; this is the *verifier*, LSH is the filter.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int = 3,
                        minJaccard: Double = 0.8): DataFrame = {
    // each shingle row carries the owner's set size, so |A∪B| is known the
    // moment an intersection count exists — no sizes join, no cache, and
    // exactly two shuffles: the shingle groupBy and the pair groupBy
    val sh = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc"), col(blockCol).as("blk"),
        shingles(col(textCol), n).as("sharr"))
      .select(col("doc"), col("blk"), size(col("sharr")).as("sz"),
        explode(col("sharr")).as("s"))
    bucketPairs(sh, Seq(col("blk"), col("s")),
        struct(col("doc"), col("sz")))
      .groupBy(col("p.a.doc").as("id_a"), col("p.b.doc").as("id_b"),
        col("p.a.sz").as("sz_a"), col("p.b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
