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

  /** Two-stage distributed top-k: per (query, input-partition) local top-k,
    * then global top-k over the k-per-partition survivors. Keeps the final
    * per-query shuffle at `numPartitions * k` rows instead of `N`. */
  private def topKPerQuery(scored: DataFrame, qidCol: String, k: Int): DataFrame = {
    val local = Window.partitionBy(col(qidCol), spark_partition_id())
      .orderBy(col("sim").desc, col("id"))
    val global = Window.partitionBy(col(qidCol))
      .orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("_lrank", row_number().over(local))
      .where(col("_lrank") <= k).drop("_lrank")
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
    * [[IvfIndex]]. */
  private[operators] def trainCentroids(
      c: DataFrame, nlist: Int, lloydIterations: Int, dim: Int): DataFrame = {
    var centroids = c
      .withColumn("_h", xxhash64(col("id")))
      .orderBy("_h").limit(nlist)
      .select(monotonically_increasing_id().as("cid"), col("_v").as("_c"))
    (1 to lloydIterations).foreach { _ =>
      // element-wise mean per centroid: posexplode → avg per (cid, pos)
      val assigned = nearestCid(c, centroids, dim)
      centroids = assigned
        .select(col("cid"), posexplode(col("_v")).as(Seq("_p", "_x")))
        .groupBy("cid", "_p").agg(avg(col("_x")).as("_m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("_p"), col("_m")))).as("_pm"))
        .select(col("cid"), transform(col("_pm"), e => e.getField("_m")).as("_c"))
    }
    centroids
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
