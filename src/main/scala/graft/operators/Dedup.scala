package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed
  * shuffle-safe for 100 TB: every variant is (scan → one key-shuffle →
  * bounded within-bucket work). Nothing ever compares all pairs and no row
  * data passes through the driver.
  */
object Dedup {

  /** Edge-count bound for [[connectedComponents]]' driver fast path: 1M
    * edges = 16 MB of longs (≤ ~100 MB collected as rows) — far under any
    * sane driver heap, and union-find over it runs in ~0.1 s. Overridable
    * for constrained drivers via SPARK_GRAFT_CC_DRIVER_MAX_EDGES. */
  private val DriverCcMaxEdges: Long =
    sys.env.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES").flatMap(_.toLongOption)
      .getOrElse(1_000_000L)

  /** Exact dedup: keep the lowest-`idCol` row per content hash. One shuffle
    * on the 128-bit content hash; ties broken deterministically. */
  def exactDedup(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame = {
    val h = md5(concat_ws("\u0000", contentCols.map(col): _*))
    val w = Window.partitionBy("_content_hash").orderBy(col(idCol))
    df.withColumn("_content_hash", h)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_content_hash")
  }

  /** Per-row MinHash signature Column (higher-order functions; fine for
    * ad-hoc use on modest data — [[minHashSignatures]] is the scale path:
    * HOFs evaluate interpreted, outside whole-stage codegen). The hash
    * family is seeded re-hashing h_i = xxhash64(h, i) — multiply-shift
    * would trip ANSI-mode overflow checks. */
  def minHashSignature(text: Column, numHashes: Int = 128, shingleK: Int = 3): Column = {
    val hs = transform(shingles(text, shingleK), s => xxhash64(s))
    aggregate(hs,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc,
        array((0 until numHashes).map(i => xxhash64(h, lit(i))): _*),
        (a, v) => least(a, v)))
  }

  /** MinHash signatures as a DataFrame op: explode shingles → one codegen'd
    * xxhash64 per shingle → groupBy(id) with `numHashes` codegen'd
    * min-aggregates (map-side partial combine). This keeps the 10^8-hash
    * fan-out inside whole-stage codegen — the interpreted higher-order-
    * function form is ~100× slower at corpus scale.
    *
    * Returns (idCol, _sig array<bigint>).
    */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, shingleK: Int = 3): DataFrame = {
    val exploded = df
      .select(col(idCol).as("_id"),
        explode(shingles(col(textCol), shingleK)).as("_s"))
      .select(col("_id"), xxhash64(col("_s")).as("_h"))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("_h"), lit(i))).as(s"_m$i"))
    exploded.groupBy("_id").agg(aggs.head, aggs.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("_sig"))
  }

  /** Exact word-shingle Jaccard similarity of two texts. */
  def jaccard(a: Column, b: Column, shingleK: Int = 3): Column = {
    val sa = shingles(a, shingleK); val sb = shingles(b, shingleK)
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb))
  }

  /** MinHash + LSH banding near-duplicate discovery with exact Jaccard
    * verification. The scale path: one tokenization pass → one-permutation
    * minhash band buckets → candidate pairs within buckets → shared-hash
    * counting joins for exact |A∩B| / |A∪B|.
    *
    * Returns verified pairs `(idA, idB, jaccard)` with idA < idB and
    * jaccard >= threshold.
    *
    * Cost shape at scale: the corpus text is scanned exactly once into a
    * cached (id, 64-bit shingle-hash) table that every later stage —
    * sizes, banding, verification — derives from; the band shuffle
    * carries only (id, band, bucket), and verification joins move longs,
    * never shingle strings.
    *
    * @param maxBucketSize degenerate buckets (boilerplate shingles hashing
    *   together) are dropped instead of exploding quadratically — the
    *   standard guard; dropped buckets trade recall for a hard skew bound.
    * @param bands fewer bands (more rows per band) sharpen the s-curve:
    *   with r = numHashes/bands rows, the match probability is ~j^r per
    *   band — r=8 targets thresholds around 0.7-0.8 without flooding the
    *   verifier on corpora with high baseline similarity.
    */
  def minHashDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 128,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val (result, tok) = minHashDupPairsPlanned(
      df, idCol, textCol, threshold, numHashes, bands, shingleK, maxBucketSize)
    // Materialize the (small) verified-pair result, cut its lineage, and
    // release the tok cache: a long-lived session calling this repeatedly
    // would otherwise accumulate cached shingle tables until executor
    // storage evicts them. localCheckpoint blocks are owned by the result
    // RDD and reclaimed by the ContextCleaner when it goes out of scope.
    val out = result.localCheckpoint(true)
    tok.unpersist()
    out
  }

  /** The lazy plan form of [[minHashDupPairs]]: returns (pairs, cached tok
    * table). The caller owns the cache — materialize pairs, then
    * `tok.unpersist()`. Package-private for plan audits and composition. */
  private[graft] def minHashDupPairsPlanned(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int,
      bands: Int,
      shingleK: Int,
      maxBucketSize: Int): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    // THE one tokenization pass, entirely inside the scan task. Round 2
    // used the higher-order shingle expression (interpreted — dominated
    // the bench); rounds 3-15 used posexplode + window lead() + multi-arg
    // xxhash64 + distinct — codegen'd, but the window SHUFFLED AND SORTED
    // every token string and the distinct shuffled every (id, hash) row.
    // The native [[graft.functions.TextFunctions.shingleHashes]]
    // expression (this round) computes the same distinct multi-arg-
    // xxhash64 shingle set per document in one generated call — same
    // tokens, same seed-chained hash, same short-doc ""-padding rule,
    // pinned bit-exact against the old pipeline by ShingleHashSpec — so
    // the only shuffle left ahead of banding is banding's own. The cache
    // holds two longs per shingle, not string arrays.
    // (Measured alternative, rejected: repartitioning a single-split
    // corpus before hashing — round-robin pays the deterministic
    // sort-before-repartition over the text rows (9-13 CPU-s at sf0.1)
    // and by-id hash repartition still loses to the shuffle-free build
    // (in-process A/B, Prof "tok"): at local scale the one-task hash
    // build is cheaper than any shuffle, and at 100 TB the scan itself
    // supplies the splits.)
    val tok = df
      .select(col(idCol).as("_id"),
        explode(graft.functions.TextFunctions.shingleHashes(
          col(textCol), shingleK)).as("_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the cache NOW: four downstream branches read tok, and if
    // the first action schedules them as sibling stages they all recompute
    // the scan in parallel before any block lands in the cache
    tok.count()

    // One-permutation-hashing (Li et al., NIPS 2012): bucket the single
    // hash by `h mod numHashes` and take the min per bucket — an unbiased
    // MinHash estimator at 1/numHashes-th the hashing cost of the
    // k-independent-permutation construction. The full 128-long signature
    // array is never materialized: banding needs only one bucket key per
    // (doc, band), which is the hash of the band's sorted (minBucket, min)
    // list. Two docs collide exactly when the band's minhash state matches
    // — including WHICH positions are non-empty, so an empty position can
    // never fake evidence on its own, and bands with no occupied position
    // at all simply produce no row (they used to bucket every short doc
    // together and flood the verifier).
    //
    // The per-(doc, minBucket) aggregate ALSO carries its hash count, so
    // the verifier's per-doc shingle-set sizes fold from this (already
    // (_id, _b)-shuffled, ≤ numHashes rows per doc) table instead of a
    // second full shuffle of tok — Catalyst reuses the exchange between
    // the two branches (ReusedExchange in the plan).
    val perBucket = tok
      .withColumn("_b", pmod(col("_h"), lit(numHashes)).cast("int"))
      .groupBy("_id", "_b").agg(min(col("_h")).as("_m"),
        count(lit(1)).as("_c"))

    // |shingles(doc)| = Σ_b count(doc, b): tok is distinct per doc
    val sizes = perBucket.groupBy("_id").agg(sum(col("_c")).as("_n"))

    val banded = perBucket
      .withColumn("_band", (col("_b") / rows).cast("int"))
      .groupBy("_id", "_band")
      .agg(sort_array(collect_list(struct(col("_b"), col("_m")))).as("_bm"))
      .select(col("_id"), col("_band"),
        xxhash64(col("_band"), col("_bm")).as("_bucket"))

    // Candidate pairs straight out of one groupBy: collect each bucket's id
    // list, drop singletons (the vast majority) and over-cap buckets (the
    // skew guard) BEFORE any join, and emit the i<j pairs with array
    // expressions. One shuffle of (band, bucket, id) total — the previous
    // window-count + self-join shape shuffled the banded rows twice more.
    // maxBucketSize bounds the per-group emit at ~maxBucketSize²/2 pairs.
    val buckets = banded.groupBy("_band", "_bucket")
      .agg(collect_list(col("_id")).as("_ids"))
      .where(size(col("_ids")).between(2, maxBucketSize))
    val sortedIds = array_sort(col("_ids"))
    val candidates = buckets
      .select(explode(flatten(transform(sortedIds, (x, i) =>
        transform(slice(sortedIds, i + 2, size(sortedIds)),
          y => struct(x.as("idA"), y.as("idB")))))).as("_p"))
      .select(col("_p.idA").as("idA"), col("_p.idB").as("idB"))
      // ids are not guaranteed unique (see TESTDATA.md): two rows sharing
      // an id in one bucket would otherwise emit a self-pair that a
      // downstream dedupRemove would read as "doc duplicates itself"
      .where(col("idA") =!= col("idB"))
      .dropDuplicates("idA", "idB")

    // Exact verification by shared-shingle-hash counting: |A ∩ B| is a
    // count of equal hashes, |A ∪ B| = nA + nB − inter. Long-key joins
    // against the cached tok table — no string arrays move through the
    // shuffle, and pairs with zero overlap drop out of the inner join
    // (they could never reach any positive threshold).
    val inter = candidates
      .join(tok.withColumnRenamed("_id", "idA"), Seq("idA"))
      .join(tok.select(col("_id").as("idB"), col("_h")), Seq("idB", "_h"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("_inter"))

    val result = inter
      .join(sizes.select(col("_id").as("idA"), col("_n").as("_nA")), Seq("idA"))
      .join(sizes.select(col("_id").as("idB"), col("_n").as("_nB")), Seq("idB"))
      .withColumn("jaccard", col("_inter").cast("double") /
        (col("_nA") + col("_nB") - col("_inter")))
      .where(col("jaccard") >= threshold)
      .select("idA", "idB", "jaccard")
    (result, tok)
  }

  /** Greedy near-dup removal: drop every doc that appears as the larger id
    * of a verified duplicate pair (keeps the smallest id of each dup
    * cluster under transitive closure-free greedy semantics). */
  def dropNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val losers = minHashDupPairs(df, idCol, textCol, threshold)
      .select(col("idB").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash per doc as a DataFrame op: explode distinct tokens → one
    * codegen'd xxhash64 each → 64 codegen'd bit-vote sum aggregates →
    * pack. Same scale rationale as [[minHashSignatures]].
    * Returns (_id, _sim bigint). */
  def simHashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("_id"),
        explode(array_distinct(tokens(col(textCol)))).as("_t"))
      .select(col("_id"), xxhash64(col("_t")).as("_h"))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"_v$b"))
    exploded.groupBy("_id").agg(votes.head, votes.tail: _*)
      .select(col("_id"),
        (0 until 64).map(b =>
          when(col(s"_v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce((a, c) => a.bitwiseOR(c)).as("_sim"))
  }

  /** SimHash near-dup candidate pairs: band the 64-bit simhash into four
    * 16-bit keys (any equal band → candidate under Hamming<=3 by pigeonhole)
    * and verify exact Hamming distance.
    *
    * @param maxBucketSize skew guard, same shape as [[minHashDupPairs]]:
    *   boilerplate-heavy corpora concentrate simhashes onto few 16-bit band
    *   keys, and an uncapped band self-join goes quadratic on one hot
    *   bucket. Buckets over the cap are dropped BEFORE any pair is emitted
    *   (bounded recall loss, hard cost bound); the per-group emit is at
    *   most ~maxBucketSize²/2 pairs.
    */
  def simHashDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    hammingDupPairs64(simHashes(df, idCol, textCol), maxHamming, maxBucketSize)

  /** Banded near-dup pairing over ANY 64-bit fingerprint column — the
    * machinery behind [[simHashDupPairs]], also driving perceptual image
    * dedup ([[Multimodal.imageDupPairs]]). Input: (`_id`, `_sim`) rows
    * (`_sim` = the 64-bit fingerprint). Candidates share one of four
    * 16-bit bands (pigeonhole: every pair within hamming 3 is guaranteed
    * a clean band; 4-15 are found with decreasing probability), buckets
    * are capped, and each bucket emits its i<j pairs with array
    * expressions — one shuffle of (band, key, id, sim) longs total, no
    * self-join, no payload bytes. */
  def hammingDupPairs64(
      hashed: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    val banded = hashed
      .withColumn("_bk", explode(array((0 until 4).map(b => struct(
        lit(b).as("band"),
        shiftright(col("_sim"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)))
      .select(col("_bk.band").as("_band"), col("_bk.key").as("_key"),
        col("_id"), col("_sim"))
    // collect each band bucket once, cap it, and emit i<j pairs with array
    // expressions — one shuffle of (band, key, id, sim) total, no self-join
    val buckets = banded.groupBy("_band", "_key")
      .agg(collect_list(struct(col("_id"), col("_sim"))).as("_items"))
      .where(size(col("_items")).between(2, maxBucketSize))
    val sorted = array_sort(col("_items")) // struct sort: _id leads
    buckets
      .select(explode(flatten(transform(sorted, (x, i) =>
        transform(slice(sorted, i + 2, size(sorted)), y =>
          struct(x.getField("_id").as("idA"), y.getField("_id").as("idB"),
            x.getField("_sim").as("_simA"), y.getField("_sim").as("_simB")))))).as("_p"))
      .select(col("_p.idA").as("idA"), col("_p.idB").as("idB"),
        col("_p._simA").as("_simA"), col("_p._simB").as("_simB"))
      .where(col("idA") =!= col("idB")) // no self-pairs on duplicate ids
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", hamming64(col("_simA"), col("_simB")))
      .where(col("hamming") <= maxHamming)
      .select("idA", "idB", "hamming")
  }

  /** Connected components over a duplicate-pair list — the step that turns
    * pairwise near-dup evidence into dedup GROUPS (A≈B and B≈C must put A
    * and C in one group even when the A-C pair was never emitted; greedy
    * pair-dropping silently keeps transitive duplicates).
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014) —
    * converges in O(log² n) rounds on any graph, vs O(diameter) for naive
    * label propagation (a 10⁶-long chain of boilerplate docs would need
    * 10⁶ rounds under label propagation). Each round is built ONLY from
    * min-aggregates and joins — no collect_list, so a celebrity node with
    * 10⁷ neighbors shuffles as partial min-combines, never as one array
    * on one reducer. Lineage is cut per round with localCheckpoint (an
    * iterative plan otherwise doubles in depth every round).
    *
    * @param pairs edge list; self-loops ignored, orientation irrelevant
    * @return (id, component) for every id appearing in `pairs`, where
    *   component = the smallest id in its connected component
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "idA",
      bCol: String = "idB",
      maxIter: Int = 30): DataFrame = {
    val nodes = pairs.select(col(aCol).cast("long").as("id"))
      .union(pairs.select(col(bCol).cast("long").as("id"))).distinct()
    val edges0 = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

    // DRIVER FAST PATH: the star loop costs 2+ Spark jobs per round
    // (localCheckpoint + convergence signature) — irreducible latency
    // that dominates every small/medium dup set (the common case: a
    // verified near-dup edge list is orders of magnitude smaller than
    // the corpus). Probe with ONE bounded job: limit(max+1) either
    // returns the ENTIRE edge set (≤ max rows — run union-find locally,
    // producing the SAME (id, component = min of component) forest,
    // exactly) or proves it is bigger than the bound, in which case the
    // distributed O(log² n) loop below runs unchanged — components over
    // 10⁹-edge graphs never touch the driver.
    val ccMax = math.min(DriverCcMaxEdges, Int.MaxValue - 1L).toInt
    val probe: Array[(Long, Long)] = {
      import pairs.sparkSession.implicits._
      edges0.limit(ccMax + 1).as[(Long, Long)].collect()
    }
    if (probe.isEmpty) // no edges at all: every node is its own component
      return nodes.select(col("id"), col("id").as("component"))
    if (probe.length <= ccMax) {
      val collected = probe
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        // path compression
        var c = x
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      collected.foreach { case (u, v) =>
        val ru = find(u); val rv = find(v)
        // union by MIN root: the component label contract
        if (ru != rv) {
          if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
        }
      }
      val forest = collected.iterator
        .flatMap { case (u, v) => Iterator(u, v) }
        .map(n => (n, find(n)))
        .filter { case (n, r) => n != r }
        .toSeq.distinct
      val starEdges = pairs.sparkSession
        .createDataFrame(forest).toDF("id", "_c")
      return nodes.join(starEdges, Seq("id"), "left")
        .select(col("id"), coalesce(col("_c"), col("id")).as("component"))
    }
    var edges = edges0.localCheckpoint(true)

    // Convergence = the (count, hash-sum) signature of the edge set stops
    // moving. One tiny aggregate per round instead of a full exceptAll
    // anti-join; a collision would need two distinct edge sets with equal
    // count AND equal xxhash64 sum mid-run — vanishingly unlikely.
    def sig(e: DataFrame): (Long, Long) = {
      // hashes reduced mod a prime before summing: a raw xxhash64 sum can
      // overflow Long, which ANSI mode (Spark 4 default) turns into an error
      val r = e.agg(count(lit(1)),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L))), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var s = sig(edges)
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val ns = sig(next)
      converged = ns == s
      s = ns
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")

    // Fixpoint is a forest of stars: every non-root points at its
    // component's minimum. Roots map to themselves.
    nodes.join(edges.select(col("u").as("id"), col("v").as("_c")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_c"), col("id")).as("component"))
  }

  /** Large-star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val minN = sym.groupBy("u").agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("u"), col("_mn")).as("_m"))
    sym.where(col("v") > col("u"))
      .join(minN, Seq("u"))
      .select(col("v").as("u"), col("_m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node connects its smaller-or-equal neighbors (and
    * itself) to the minimum among them. */
  private def smallStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .where(col("v") < col("u"))
    val minN = sym.groupBy("u").agg(min(col("v")).as("_m"))
    sym.join(minN, Seq("u"))
      .select(col("v").as("u"), col("_m").as("v"))
      .where(col("u") =!= col("v"))
      .union(minN.select(col("u"), col("_m").as("v")))
      .distinct()
  }

  /** Near-dup groups end-to-end: minhash+LSH pair discovery →
    * connected components. Returns (id, component). */
  def dupGroups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8): DataFrame =
    connectedComponents(minHashDupPairs(df, idCol, textCol, threshold))

  /** Group-aware dedup: keep exactly one doc (the smallest id) per
    * connected duplicate group — the transitive-closure-correct version
    * of [[dropNearDups]]. `pairs` is any duplicate-pair list (minhash,
    * simhash, cosine, or a union of them). */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental exact dedup — the production shape: dedup a NEW batch
    * against the corpus already ingested without rescanning it, using a
    * persisted content-hash index (store `seenHashes` as an ice table and
    * append each batch's hashes after it lands). Drops new rows whose
    * content hash is already in `seenHashes`, then exact-dedups what
    * remains within the batch (lowest id wins). Cost: one broadcast-or-
    * shuffle anti-join on the 128-bit hash + one batch-local window —
    * never touches historical row data.
    *
    * @param seenHashes single-column DataFrame of md5 content hashes
    *   (column name `hash`), as produced by [[contentHashes]]
    */
  def incrementalDedup(
      newDf: DataFrame, contentCols: Seq[String], idCol: String,
      seenHashes: DataFrame): DataFrame = {
    val h = md5(concat_ws(" ", contentCols.map(col): _*))
    val fresh = newDf.withColumn("_content_hash", h)
      .join(seenHashes.select(col("hash").as("_content_hash")),
        Seq("_content_hash"), "left_anti")
    val w = Window.partitionBy("_content_hash").orderBy(col(idCol))
    fresh.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_content_hash")
  }

  /** The content-hash index rows for a batch (feed back into the
    * `seenHashes` table after the batch commits). */
  def contentHashes(df: DataFrame, contentCols: Seq[String]): DataFrame =
    df.select(md5(concat_ws(" ", contentCols.map(col): _*)).as("hash"))
      .distinct()

  /** Cross-document boilerplate removal — the C4/RefinedWeb-style step
    * that strips sentences appearing near-verbatim in many documents
    * (cookie banners, "all rights reserved", subscribe prompts) while
    * keeping each document's unique prose in original order.
    *
    * Sentences = '.'-separated, trimmed, lowercased, non-empty — the same
    * normalization as [[graft.functions.TextFunctions.dupSentenceFraction]].
    * A sentence is boilerplate when it appears in >= `minDocs` DISTINCT
    * documents.
    *
    * Shape at 100 TB: one sentence-explode scan; the boilerplate table is
    * a distinct-count aggregate of it (map-side combined); removal is one
    * anti-join on the sentence string (AQE broadcasts it when small — by
    * construction it holds only sentences repeated across >= minDocs
    * docs); reassembly is a doc-local collect_list (bounded by document
    * size, never corpus-sized).
    *
    * @return (idCol, clean_text, kept_sentences) — one row per input doc;
    *   docs whose every sentence was boilerplate keep an empty clean_text.
    */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int = 3): DataFrame = {
    val sentArr = filter(
      transform(split(lower(col(textCol)), "\\."), s => trim(s)),
      s => length(s) > 0)
    val sents = df.select(col(idCol).as("_id"),
      posexplode(sentArr).as(Seq("_p", "_s")))
    val boiler = sents.groupBy("_s")
      .agg(countDistinct(col("_id")).as("_nd"))
      .where(col("_nd") >= minDocs)
      .select("_s")
    val rebuilt = sents.join(boiler, Seq("_s"), "left_anti")
      .groupBy("_id")
      .agg(
        concat_ws(". ", transform(
          array_sort(collect_list(struct(col("_p"), col("_s")))),
          x => x.getField("_s"))).as("clean_text"),
        count(lit(1)).as("kept_sentences"))
    df.select(col(idCol))
      .join(rebuilt.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_sentences"), lit(0L)).as("kept_sentences"))
  }

  /** Character/word n-gram Jaccard similarity matrix restricted to LSH
    * buckets — the "ngram Jaccard near-dup" surface with minhash recall. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 2): DataFrame =
    minHashDupPairs(df, idCol, textCol, threshold,
      numHashes = 64, bands = 16, shingleK = shingleK)
}
