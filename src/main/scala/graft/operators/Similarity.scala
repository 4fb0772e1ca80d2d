package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the scale playbook:
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    Broadcast the (small) query set, scan the corpus once, reduce with a
  *    two-stage top-k so no single reducer sees more than `partitions * k`
  *    rows per query.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing; only same-bucket
  *    candidates are scored. The 100 TB path: candidate generation is a
  *    bucket-key shuffle, never a cross join.
  */
object Similarity {

  /** Dot product of two equal-length numeric arrays. Higher-order functions
    * evaluate interpreted (outside whole-stage codegen) — use only when the
    * dimension is unknown; [[dotN]] is the hot-path form. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Hot-path dot product: the native codegen'd Catalyst expression
    * ([[graft.functions.VectorExpressions.dotNative]]) — one generated
    * `while` loop over the array buffers, any dimension. The `dim`
    * parameter is kept for API stability; it no longer matters. */
  def dotN(a: Column, b: Column, dim: Int): Column =
    graft.functions.VectorExpressions.dotNative(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normN(a: Column, dim: Int): Column = sqrt(dotN(a, a, dim))

  /** Cosine similarity; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Cosine from PRE-COMPUTED norms: on any candidate-scoring join, compute
    * each side's norm once per row in its projection, not once per pair —
    * the naive form does three array passes per candidate. */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column, dim: Int): Column =
    when(na * nb === 0, lit(0.0)).otherwise(dotN(a, b, dim) / (na * nb))

  /** Distributed top-k per query: ONE `row_number` window + rank filter.
    * Catalyst's `InferWindowGroupLimit` rewrites this into a partial
    * (pre-shuffle, per input partition) `WindowGroupLimit` followed by a
    * final one, so the per-query exchange carries at most
    * `numPartitions × k` rows — exactly the two-stage shape this method
    * used to hand-roll with a second window (which cost an extra
    * exchange + sort per call for nothing the optimizer doesn't already
    * do; at 4 top-k calls inside pqTopK that was 4 wasted exchanges). */
  private def topKPerQuery(scored: DataFrame, qidCol: String, k: Int): DataFrame = {
    val global = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(global))
      .where(col("rank") <= k)
  }

  /** Exact cosine top-k neighbors for each query vector.
    *
    * @param corpus  (id, vec) corpus table
    * @param queries (qid, qvec) small query table — broadcast
    * @return (qid, id, sim, rank) with rank 1..k by sim desc (id tiebreak)
    */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, dim: Int = 0): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("_v"))
      .withColumn("_nv", normN(col("_v"), dim)) // corpus norm: once per row
      .crossJoin(broadcast(
        queries.select(col(qidCol).as("qid"), col(qvecCol).as("_q"))
          .withColumn("_nq", normN(col("_q"), dim))))
      .where(col("id") =!= col("qid")) // a query is not its own neighbor
      .withColumn("sim",
        cosinePre(col("_v"), col("_q"), col("_nv"), col("_nq"), dim))
    topKPerQuery(scored, "qid", k).select("qid", "id", "sim", "rank")
  }

  /** Hard-negative mining for contrastive / embedding training: for each
    * anchor, the exact top-k most-similar corpus vectors whose LABEL
    * differs from the anchor's (similar-but-wrong — the negatives that
    * actually move a contrastive loss; random negatives are trivial at
    * scale). Same shape as [[bruteForceTopK]] — broadcast anchors, one
    * corpus scan, two-stage top-k — with the label filter applied BEFORE
    * ranking, so rank k means "k-th hardest negative", not "k-th
    * neighbor that happened to be negative".
    *
    * @return (qid, id, neg_label, sim, rank), rank 1..k by sim desc. */
  def hardNegatives(
      corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, qlabelCol: String,
      k: Int = 10, dim: Int = 0): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("_v"),
        col(labelCol).as("neg_label"))
      .withColumn("_nv", normN(col("_v"), dim))
      .crossJoin(broadcast(
        queries.select(col(qidCol).as("qid"), col(qvecCol).as("_q"),
          col(qlabelCol).as("_ql"))
          .withColumn("_nq", normN(col("_q"), dim))))
      .where(col("neg_label") =!= col("_ql")) // negatives only
      .withColumn("sim",
        cosinePre(col("_v"), col("_q"), col("_nv"), col("_nq"), dim))
    topKPerQuery(scored, "qid", k)
      .select("qid", "id", "neg_label", "sim", "rank")
  }

  /** Deterministic random hyperplanes: `tables` independent sign-bit
    * signatures of `bits` planes each, derived from a fixed seed so results
    * are reproducible across runs and match between build sides. */
  private def planes(dim: Int, tables: Int, bits: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  private def bucketExpr(vec: Column, plane: Array[Array[Double]]): Column = {
    // bucket id = sign bits of the plane dot products, packed into a long.
    // dotNative, not the HOF `dot`: `tables × bits` (80 at defaults)
    // interpreted array-aggregates per row would dominate the scan, while
    // the native expression is one codegen'd loop each.
    val bitCols = plane.zipWithIndex.map { case (w, i) =>
      val wArr = array(w.map(lit): _*)
      when(graft.functions.VectorExpressions.dotNative(vec, wArr) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: candidates share an LSH bucket in at least one of
    * `tables` hyperplane tables; candidates are scored exactly. Recall
    * improves with `tables`, cost with `bits` (bucket granularity).
    *
    * Shuffle discipline: the candidate-dedup exchange carries only
    * (qid, id) — two longs per row. Buckets are computed map-side from the
    * vector, then the vector is DROPPED before the explode so the
    * `tables ×` duplication never moves embedding bytes; vectors re-join
    * after the distinct (AQE turns that into a broadcast when the
    * candidate set is small).
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, dim: Int = 64, tables: Int = 8, bits: Int = 10,
      seed: Long = 42L): DataFrame = {
    val ps = planes(dim, tables, bits, seed)
    def withBuckets(df: DataFrame, vc: String, keep: Seq[String]): DataFrame = {
      val buckets = array(ps.zipWithIndex.map { case (p, t) =>
        struct(lit(t).as("t"), bucketExpr(col(vc), p).as("b"))
      }: _*)
      // project to (keys, _tb) BEFORE exploding: the vector must not ride
      // through the tables× row multiplication
      df.select(keep.map(col) :+ explode(buckets).as("_tb"): _*)
        .withColumn("_t", col("_tb.t")).withColumn("_b", col("_tb.b"))
        .drop("_tb")
    }
    val cVec = corpus.select(col(idCol).as("id"), col(vecCol).as("_v"))
      .withColumn("_nv", normN(col("_v"), dim))
    val qVec = queries.select(col(qidCol).as("qid"), col(qvecCol).as("_q"))
      .withColumn("_nq", normN(col("_q"), dim))
    val cB = withBuckets(corpus.select(col(idCol).as("id"),
      col(vecCol).as("_v")), "_v", Seq("id"))
    val qB = withBuckets(queries.select(col(qidCol).as("qid"),
      col(qvecCol).as("_q")), "_q", Seq("qid"))
    val candidates = cB.join(broadcast(qB), Seq("_t", "_b"))
      .where(col("id") =!= col("qid"))
      .select("qid", "id")
      .dropDuplicates("qid", "id") // the banded exchange: 2 longs/row
    val scored = candidates
      .join(cVec, Seq("id"))
      .join(broadcast(qVec), Seq("qid"))
      .withColumn("sim",
        cosinePre(col("_v"), col("_q"), col("_nv"), col("_nq"), dim))
    topKPerQuery(scored, "qid", k).select("qid", "id", "sim", "rank")
  }

  /** IVF (inverted-file) ANN: k-means-style coarse quantization. Centroids
    * are seeded deterministically from the corpus and refined with a few
    * Lloyd iterations (all DataFrame ops — assignment is a broadcast
    * nearest-centroid argmin, the update is an element-wise mean via
    * posexplode/regroup); queries probe the `nprobe` nearest lists and
    * score only those lists' members exactly.
    *
    * vs [[lshTopK]]: IVF adapts to the data distribution (clustered real
    * embeddings → small lists, high recall); LSH is oblivious but needs no
    * training pass. Both exist because both trade-offs are real at 100 TB.
    */
  /** Nearest-centroid assignment: (id, _v) × broadcast (cid, _c) →
    * (id, _v, cid). Shared by [[ivfTopK]] and [[IvfIndex]].
    *
    * The argmax is `max_by` over (sim, -cid) — a hash aggregate with
    * map-side partial combine, so the corpus×nlist scored rows collapse
    * to one row per id BEFORE any exchange. The previous window form
    * (row_number over partitionBy(id)) shuffled all nlist copies and
    * sorted them per id — nlist× the shuffle bytes — and an id that
    * constant-folds (a literal) emptied the window's partition spec
    * entirely, collapsing the job to one task. Ties on sim pick the
    * smallest cid, identical to the window's ordering. */
  private[operators] def nearestCid(
      df: DataFrame, centroids: DataFrame, dim: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .withColumn("_sim", cosinePre(col("_v"), col("_c"),
        normN(col("_v"), dim), normN(col("_c"), dim), dim))
    scored.groupBy("id")
      .agg(max_by(struct(col("cid"), col("_v")),
        struct(col("_sim"), (-col("cid")).cast("long").as("_negcid"))).as("_best"))
      .select(col("id"), col("_best._v").as("_v"), col("_best.cid").as("cid"))
  }

  /** Lloyd-refined coarse centroids over a (id, _v) corpus: deterministic
    * seeds (the nlist rows with smallest xxhash64(id)), then
    * `lloydIterations` of assign + element-wise mean — every step a
    * DataFrame op. Returns (cid, _c). Shared by [[ivfTopK]] and
    * [[IvfIndex]].
    *
    * TRAINS ON A BOUNDED SAMPLE, not the corpus: the `max(nlist·64,
    * 4096)` rows with smallest xxhash64(id) (deterministic, one cheap
    * top-N pass). Quantizer quality needs a representative sample, not
    * every row — training on the full corpus would re-scan 100 TB
    * `lloydIterations` times before any search started; this way the
    * corpus is touched exactly ONCE afterwards, by the caller's final
    * assignment pass. */
  /** Driver-side fetch of the deterministic training sample: the `cap`
    * rows of (id, _v) with smallest xxhash64(id), as double arrays
    * (element types may be float/double/int depending on the source
    * parquet; null elements contribute 0 like the codegen'd dot). */
  private def collectSample(c: DataFrame, cap: Int): Array[Array[Double]] =
    c.withColumn("_h", xxhash64(col("id")))
      .orderBy("_h", "id").limit(cap)
      .select(col("_v")).collect()
      .map(_.getSeq[Any](0).iterator.map {
        case null => 0.0
        case x: java.lang.Number => x.doubleValue()
      }.toArray)

  /** The ONE driver-side dot product both Lloyd trainers use (ragged rows
    * truncate to the shorter length, matching the codegen'd DotProduct's
    * min-length contract). */
  private def ddot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }; s
  }

  private[operators] def trainCentroids(
      c: DataFrame, nlist: Int, lloydIterations: Int, dim: Int): DataFrame = {
    val spark = c.sparkSession
    val sampleCap = math.max(nlist * 64, 4096)
    // ONE Spark job for the whole training: fetch the bounded sample
    // (top-N by hash — a TakeOrdered, ~MBs), then run Lloyd entirely on
    // the driver in plain Scala. The earlier DataFrame-shaped loop cost
    // 2 plans + jobs PER iteration on data that is by construction
    // driver-sized — pure scheduling overhead at any scale. Semantics
    // unchanged: cosine assignment (0 for zero norms), ties to the
    // smallest cid, element-wise means, empty clusters drop.
    val rows: Array[Array[Double]] = collectSample(c, sampleCap)
    if (rows.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cid",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_c",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
    val d = rows.head.length
    def dot(a: Array[Double], b: Array[Double]): Double = ddot(a, b)
    // (cid, vec) — cids stay stable across iterations; empty cells drop
    var cent: Array[(Long, Array[Double])] =
      rows.take(nlist).zipWithIndex.map { case (v, i) => (i.toLong, v.clone()) }
    val cnorm = () => cent.map { case (_, v) => math.sqrt(dot(v, v)) }
    (1 to lloydIterations).foreach { _ =>
      val cn = cnorm()
      val sums = Array.fill(cent.length)(new Array[Double](d))
      val counts = new Array[Long](cent.length)
      rows.foreach { v =>
        val nv = math.sqrt(dot(v, v))
        var best = 0; var bestSim = Double.NegativeInfinity
        var k = 0
        while (k < cent.length) {
          val den = nv * cn(k)
          val sim = if (den == 0) 0.0 else dot(v, cent(k)._2) / den
          // ties pick the smallest cid — strict > keeps the first winner
          if (sim > bestSim) { bestSim = sim; best = k }
          k += 1
        }
        val s = sums(best); var i = 0
        val lim = math.min(d, v.length) // ragged/truncated rows contribute
        while (i < lim) { s(i) += v(i); i += 1 } // their prefix, like dot()
        counts(best) += 1
      }
      cent = cent.indices.collect {
        case k if counts(k) > 0 =>
          (cent(k)._1, sums(k).map(_ / counts(k)))
      }.toArray
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cent.map { case (cid, v) =>
        org.apache.spark.sql.Row(cid, v.toSeq) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_c",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false))))
  }

  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      lloydIterations: Int = 2, dim: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("_v"))
    val centroids = trainCentroids(c, nlist, lloydIterations, dim)
    val lists = nearestCid(c, centroids, dim) // final assignment: (id, _v, cid)

    // each query probes its nprobe nearest lists
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("_q"))
    val probes = probeCids(q, centroids, nprobe, dim)
    scoreLists(lists, probes, k, dim)
  }

  /** (qid, _q) × broadcast centroids → the nprobe nearest (qid, _q, cid)
    * probe rows per query. Shared by [[ivfTopK]] and [[IvfIndex]]. */
  private[operators] def probeCids(
      q: DataFrame, centroids: DataFrame, nprobe: Int, dim: Int): DataFrame = {
    val scored = q.crossJoin(broadcast(centroids))
      .withColumn("_sim", cosinePre(col("_q"), col("_c"),
        normN(col("_q"), dim), normN(col("_c"), dim), dim))
    val w = Window.partitionBy("qid").orderBy(col("_sim").desc, col("cid"))
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= nprobe).select(col("qid"), col("_q"), col("cid"))
  }

  /** Exact scoring of probed lists: (id, _v, cid) ⋈ broadcast
    * (qid, _q, cid) → per-query top-k. Shared by [[ivfTopK]] and
    * [[IvfIndex]]. */
  private[operators] def scoreLists(
      lists: DataFrame, probes: DataFrame, k: Int, dim: Int): DataFrame = {
    val scored = lists
      .withColumn("_nv", normN(col("_v"), dim))
      .join(broadcast(probes.withColumn("_nq", normN(col("_q"), dim))), Seq("cid"))
      .where(col("id") =!= col("qid"))
      .withColumn("sim",
        cosinePre(col("_v"), col("_q"), col("_nv"), col("_nq"), dim))
    topKPerQuery(scored, "qid", k).select("qid", "id", "sim", "rank")
  }

  // ------------------------------------------------------- quantization

  /** Symmetric per-vector int8 scalar quantization: `scale = max|x|/127`,
    * `q_i = round(x_i / scale)` ∈ [-127, 127]. The embedding column
    * shrinks 4× (float→byte), which at 100 TB is the difference between an
    * ANN corpus that fits executor storage and one that doesn't; scoring
    * on dequantized vectors loses at most `scale/2` per component.
    *
    * The scale uses `array_max`/`array_min` (codegen'd, no interpreted
    * pass); only the per-element rounding is a HOF — map-only, linear.
    * Adds `scaleCol` (double) and `qCol` (array<tinyint>).
    */
  def quantizeInt8(
      df: DataFrame, vecCol: String,
      scaleCol: String = "q_scale", qCol: String = "q_vec"): DataFrame = {
    val v = col(vecCol)
    val maxAbs = greatest(array_max(v), -array_min(v)).cast("double")
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    df.withColumn(scaleCol, scale)
      .withColumn(qCol,
        transform(v, x => round(x.cast("double") / col(scaleCol)).cast("tinyint")))
  }

  /** Reconstruct a float vector from its int8 quantization. */
  def dequantize(qVec: Column, scale: Column): Column =
    transform(qVec, x => x.cast("double") * scale)

  /** Exact top-k over the QUANTIZED corpus: dequantize in the scan
    * projection and score as usual — the accuracy/recall harness for
    * [[quantizeInt8]]. */
  def bruteForceTopKQuantized(
      quantized: DataFrame, idCol: String, qVecCol: String, scaleCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, dim: Int = 0): DataFrame = {
    val deq = quantized.select(col(idCol),
      dequantize(col(qVecCol), col(scaleCol)).as("_deq"))
    bruteForceTopK(deq, idCol, "_deq", queries, qidCol, qvecCol, k, dim)
  }

  // ------------------------------------------------ product quantization

  /** Per-subspace Lloyd codebooks for product quantization, trained
    * JOINTLY: one DataFrame holds every (subspace, subvector) pair, so
    * each iteration is ONE broadcast-assign plus ONE regrouped mean for
    * all `m` subspaces together — not m sequential trainings. Seeds are
    * deterministic (per subspace, the ksub subvectors of the rows with
    * smallest xxhash64(id)); a cell that loses all members keeps its
    * previous centroid instead of vanishing. Returns (_j, cid, _c):
    * m × ksub rows — broadcast-sized by construction. */
  /** Driver-side PQ codebook: `result(j)(k)` = cell k of subspace j —
    * the form [[pqEncode]]'s native expression and [[pqTopK]]'s LUT
    * construction consume directly. [[pqTrain]] wraps it as a DataFrame
    * for callers that persist or inspect the codebook. */
  private[graft] def pqTrainArrays(
      c: DataFrame, m: Int, ksub: Int, iterations: Int,
      dim: Int): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    // bounded deterministic training sample (see trainCentroids): the
    // codebook trains on the max(ksub·64, 4096) smallest-hash rows, and —
    // like trainCentroids — runs Lloyd ENTIRELY on the driver in plain
    // Scala: one Spark job (the top-N sample fetch) instead of 2 plans +
    // jobs per iteration over driver-sized data. The full corpus is then
    // encoded exactly once by pqEncode. Semantics unchanged: per-subspace
    // seeds are the first ksub sample rows' slices, assignment minimizes
    // ‖c‖²−2·s·c with ties to the smallest cell id, a cell that loses all
    // members keeps its previous centroid.
    val sampleCap = math.max(ksub * 64, 4096)
    val rows: Array[Array[Double]] = collectSample(c, sampleCap)
    def dot(a: Array[Double], b: Array[Double]): Double = ddot(a, b)
    // both indices clamped: a sampled vector shorter than j·dsub yields an
    // EMPTY slice (the ragged-rows-contribute-their-prefix contract), not
    // an IllegalArgumentException from from > to
    def sliceOf(v: Array[Double], j: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v,
        math.min(j * dsub, v.length), math.min((j + 1) * dsub, v.length))
    // codebook(j)(cid) — seeds from the first ksub sample rows
    val nCells = math.min(ksub, rows.length)
    val codebook: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => rows.take(nCells).map(v => sliceOf(v, j)))
    (1 to iterations).foreach { _ =>
      var j = 0
      while (j < m) {
        val cells = codebook(j)
        val cc = cells.map(cv => dot(cv, cv))
        val sums = Array.fill(cells.length)(new Array[Double](dsub))
        val counts = new Array[Long](cells.length)
        rows.foreach { v =>
          val s = sliceOf(v, j)
          var best = 0; var bestD = Double.PositiveInfinity
          var k = 0
          while (k < cells.length) {
            val d2 = cc(k) - 2.0 * dot(s, cells(k))
            if (d2 < bestD) { bestD = d2; best = k } // ties keep smallest cid
            k += 1
          }
          val acc = sums(best); var i = 0
          while (i < s.length) { acc(i) += s(i); i += 1 }
          counts(best) += 1
        }
        var k = 0
        while (k < cells.length) {
          if (counts(k) > 0) cells(k) = sums(k).map(_ / counts(k))
          k += 1 // empty cell keeps its previous centroid
        }
        j += 1
      }
    }
    codebook
  }

  /** DataFrame view of [[pqTrainArrays]]: (_j, cid, _c) — m × ksub rows,
    * broadcast-sized by construction. */
  private[graft] def pqTrain(
      c: DataFrame, m: Int, ksub: Int, iterations: Int, dim: Int): DataFrame = {
    val spark = c.sparkSession
    val codebook = pqTrainArrays(c, m, ksub, iterations, dim)
    import scala.jdk.CollectionConverters._
    val outRows = for {
      j <- 0 until m
      k <- codebook(j).indices
    } yield org.apache.spark.sql.Row(j, k, codebook(j)(k).toSeq)
    spark.createDataFrame(outRows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_j",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("_c",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = false))))
  }

  /** Encode each vector as `m` codebook cell ids: (id, code, _nv) with
    * `code` an array<smallint> — at m=8 that is 16 bytes/vector where the
    * float64 original is 8·dim, a 32× compression (vs 4× for
    * [[quantizeInt8]]). At 100 TB this is what makes the ANN corpus fit
    * in executor memory; the exact norm rides along so ADC scores can be
    * cosine-normalized without touching the original vectors.
    *
    * The encode is MAP-ONLY: one codegen'd expression per row
    * ([[graft.functions.VectorExpressions.pqEncodeNative]]) against the
    * collected (m × ksub — driver-sized by construction) codebook. The
    * previous posexplode → broadcast join → two hash aggregates pipeline
    * multiplied every corpus row m× and paid two exchanges for what is a
    * pure per-row function. */
  private[graft] def pqEncode(
      c: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame =
    pqEncodeWith(c, collectCodebook(codebook, m), dim)

  /** (_j, cid, _c) codebook rows → `result(j)(k)`; requires the cid space
    * dense per subspace (pqTrain's output shape) so the emitted code IS
    * the cell id. */
  private def collectCodebook(
      codebook: DataFrame, m: Int): Array[Array[Array[Double]]] = {
    val rows = codebook.select("_j", "cid", "_c").collect()
    val byJ = rows.groupBy(_.getInt(0))
    Array.tabulate(m) { j =>
      val cells = byJ.getOrElse(j, Array.empty).sortBy(_.getInt(1))
      require(cells.zipWithIndex.forall { case (r, i) => r.getInt(1) == i },
        s"pq codebook subspace $j: cell ids must be dense 0..n-1")
      cells.map(_.getSeq[Any](2).iterator.map {
        case null => 0.0
        case x: java.lang.Number => x.doubleValue()
      }.toArray)
    }
  }

  private def pqEncodeWith(
      c: DataFrame, codebook: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val cbSeq: Seq[Seq[Seq[Double]]] =
      codebook.iterator.map(_.iterator.map(_.toSeq).toSeq).toSeq
    c.select(col("id"),
        graft.functions.VectorExpressions
          .pqEncodeNative(col("_v"), cbSeq).as("code"),
        normN(col("_v"), dim).as("_nv"))
      .where(col("code").isNotNull) // null vectors drop, as the old
      // explode-based pipeline dropped them (posexplode of null emits 0 rows)
  }

  /** PQ ANN with asymmetric-distance scoring and exact re-rank — the
    * third ANN family next to [[lshTopK]] (oblivious hashing) and
    * [[ivfTopK]] (coarse partitioning): here the CORPUS REPRESENTATION
    * itself is compressed 32×, and the full-corpus scan touches only
    * (id, 16-byte code, norm) rows.
    *
    * Queries stay float: each query precomputes an m × ksub lookup table
    * of subvector·cell dot products (nq·m·ksub doubles — broadcast), so
    * scoring a candidate is m table lookups summed, normalized by the
    * stored exact norms into an ADC cosine. The ADC top
    * `k·rerankFactor` shortlist per query — the only rows whose real
    * vectors are ever fetched — is re-scored exactly and cut to top-k.
    * Returns (qid, id, sim, rank) with exact cosine sims.
    */
  def pqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, m: Int = 8, ksub: Int = 16, iterations: Int = 2,
      dim: Int = 64, rerankFactor: Int = 4): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("_v"))
    val codebook = pqTrainArrays(c, m, ksub, iterations, dim)
    // ONE map-only pass over the corpus produces the compressed rows
    val codes = pqEncodeWith(c, codebook, dim)

    // per-query ADC lookup tables: LUT[j][cid] = q_subvec_j · cell. The
    // queries are the broadcast side by contract (nq·m·ksub doubles), so
    // the LUTs are computed ON THE DRIVER from the (already driver-sized)
    // codebook — the previous DataFrame pipeline spent a posexplode, a
    // join and two collect_list aggregations building what is a nested
    // loop over driver data.
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("_q"))
    val qidType = q.schema("qid").dataType
    val lutRows = q.collect().toSeq.map { r =>
      val qid = r.get(0)
      val qv: Array[Double] =
        if (r.isNullAt(1)) Array.empty
        else r.getSeq[Any](1).iterator.map {
          case null => 0.0
          case x: java.lang.Number => x.doubleValue()
        }.toArray
      val lut: Seq[Seq[Double]] = (0 until m).map { j =>
        val off = j * dsub
        val end0 = math.min(off + dsub, qv.length)
        codebook(j).toSeq.map { cell =>
          // ragged cells (trained from short sample vectors, the
          // prefix-contract) bound the sum too — never index past them
          val end = math.min(end0, off + cell.length)
          var s = 0.0; var i = off
          while (i < end) { s += qv(i) * cell(i - off); i += 1 }
          s
        }
      }
      org.apache.spark.sql.Row(qid, lut, math.sqrt(ddot(qv, qv)))
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val luts = spark.createDataFrame(lutRows.asJava, StructType(Seq(
      StructField("qid", qidType),
      StructField("_lut", ArrayType(ArrayType(DoubleType))),
      StructField("_nq", DoubleType))))

    // ADC scan: one codegen'd lookup-sum per (code, query) pair,
    // cosine-normalized by the stored exact norms
    val adc = codes.crossJoin(broadcast(luts))
      .where(col("id") =!= col("qid"))
      .withColumn("_adc", graft.functions.VectorExpressions
        .adcDotNative(col("code"), col("_lut")))
      .withColumn("sim", when(col("_nv") * col("_nq") === 0, lit(0.0))
        .otherwise(col("_adc") / (col("_nv") * col("_nq"))))
    val shortlist = topKPerQuery(adc, "qid", k * rerankFactor)
      .select("qid", "id")

    // exact re-rank of the shortlist only
    val vecs = c.withColumn("_nv", normN(col("_v"), dim))
    val qv = q.withColumn("_nq", normN(col("_q"), dim))
    val exact = shortlist
      .join(vecs, Seq("id"))
      .join(broadcast(qv), Seq("qid"))
      .withColumn("sim",
        cosinePre(col("_v"), col("_q"), col("_nv"), col("_nq"), dim))
    topKPerQuery(exact, "qid", k).select("qid", "id", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: same-bucket candidates with
    * cosine >= threshold (idA < idB). The embedding twin of
    * [[Dedup.minHashDupPairs]], and the same skew-safe shape: each
    * (table, bucket) group is collected ONCE, singleton and over-cap
    * buckets are dropped before anything joins, and the i<j pairs are
    * emitted from array expressions — never a raw bucket self-join, which
    * goes quadratic on one hot bucket of mass-duplicated embeddings.
    * `maxBucketSize` bounds the per-group emit at ~maxBucketSize²/2 pairs;
    * a bucket above the cap is, like in the minhash path, too dense to be
    * discriminative (its members are caught via their other `tables-1`
    * signatures). Vectors never ride the bucket shuffle: the exchange
    * carries (table, bucket, id) and vectors re-join per side afterwards.
    */
  def cosineDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, dim: Int = 64, tables: Int = 8,
      bits: Int = 10, seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val ps = planes(dim, tables, bits, seed)
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val banded = base
      .select(col("_id"), explode(array(ps.zipWithIndex.map { case (p, t) =>
        struct(lit(t).as("t"), bucketExpr(col("_v"), p).as("b"))
      }: _*)).as("_tb"))
      .select(col("_id"), col("_tb.t").as("_t"), col("_tb.b").as("_b"))
    val buckets = banded.groupBy("_t", "_b")
      .agg(collect_list(col("_id")).as("_ids"))
      .where(size(col("_ids")).between(2, maxBucketSize))
    val sortedIds = array_sort(col("_ids"))
    val candidates = buckets
      .select(explode(flatten(transform(sortedIds, (x, i) =>
        transform(slice(sortedIds, i + 2, size(sortedIds)),
          y => struct(x.as("idA"), y.as("idB")))))).as("_p"))
      .select(col("_p.idA").as("idA"), col("_p.idB").as("idB"))
      .where(col("idA") =!= col("idB")) // duplicated source ids: no self-pairs
      .dropDuplicates("idA", "idB")
    val vecs = base.withColumn("_n", normN(col("_v"), dim))
    candidates
      .join(vecs.select(col("_id").as("idA"), col("_v").as("_va"),
        col("_n").as("_na")), Seq("idA"))
      .join(vecs.select(col("_id").as("idB"), col("_v").as("_vb"),
        col("_n").as("_nb")), Seq("idB"))
      .withColumn("cosine",
        cosinePre(col("_va"), col("_vb"), col("_na"), col("_nb"), dim))
      .where(col("cosine") >= threshold)
      .select("idA", "idB", "cosine")
  }
}
