package graft.operators

import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A persisted MinHash SIGNATURE INDEX as a pair of ice tables —
  * incremental NEAR-duplicate detection: each incoming batch is checked
  * against ALL previously indexed history with one scan + broadcast join,
  * then appended. History is never re-paired, never re-tokenized, never
  * re-read as text — the continuous-crawl dedup workflow
  * ([[Dedup.incrementalDedup]] is the exact-hash analog; this is the
  * fuzzy one).
  *
  * Layout:
  *  - band table `(band, bucket, doc_id)` partitioned `band=<i>`, sorted
  *    (bucket, doc_id) — LSH candidate generation;
  *  - sig table `(doc_id, sig array<bigint>)` — verification by
  *    signature-estimated Jaccard (mean of equal minhash positions, the
  *    standard unbiased estimator) without touching document text.
  *
  * Scale shape per batch: band rows of the BATCH broadcast (a batch is
  * small relative to history); the index side is a linear scan with a
  * broadcast hash join — no shuffle of the 10^10-row history, no
  * re-derivation. Candidate fan-out is bounded by `maxCandidatesPerDoc`
  * (deterministic keep: smallest history ids), the hot-bucket analog of
  * [[Dedup.minHashDupPairs]]'s `maxBucketSize`. Verification joins move
  * only (batch_id, hist_id) pairs plus the two signature arrays.
  *
  * Appends are ordinary atomic inserts; compaction is the ordinary merge.
  * Deletion (GDPR) is a partition rewrite of the member band partitions
  * plus the sig table — or, for a MUTATING corpus, [[syncFromFeed]]'s
  * gen-scoped marker pattern (the [[TextIndex.syncFromFeed]] twin): the
  * index follows the corpus table's change feed, updates retire old
  * signatures via appended markers, and nothing existing rewrites.
  */
object SigIndex {

  def bandConfig: IceTableConfig = IceTableConfig(
    partitionExpr = concat(lit("band="), col("band")),
    sortOrder = Seq("bucket", "doc_id"),
    // crash-replayed sync windows duplicate byte-identical rows;
    // compaction collapses them (the query dedups until then)
    customMergeSql = Some(
      """select band, bucket, doc_id, max(gen) as gen
        |from source_files group by band, bucket, doc_id""".stripMargin))

  def sigConfig: IceTableConfig = IceTableConfig(
    partitionExpr = lit("all"),
    sortOrder = Seq("doc_id"),
    customMergeSql = Some(
      """select doc_id, gen, any_value(sig) as sig
        |from source_files group by doc_id, gen""".stripMargin))

  /** Config for the delete-marker table: one (doc_id, gen) row per
    * retired version set — a marker kills band/sig rows of the same doc
    * with a STRICTLY smaller gen (only the per-doc max matters, which is
    * what compaction keeps). */
  def marksConfig: IceTableConfig = IceTableConfig(
    partitionExpr = lit("all"),
    sortOrder = Seq("doc_id"),
    customMergeSql = Some(
      "select doc_id, max(gen) as gen from source_files group by doc_id"))

  /** (band, bucket, doc_id, gen) rows: `bands` buckets per doc, bucket =
    * hash of the band's signature slice. One row is 4 longs. */
  def bandRows(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val perBand = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("_sig"), b * r + 1, r)).as("bucket"))): _*)
    val genCol =
      if (sigs.columns.contains("_gen")) col("_gen") else lit(0L)
    sigs.select(col("_id").as("doc_id"), genCol.cast("long").as("gen"),
        explode(perBand).as("_bb"))
      .select(col("_bb.band").as("band"), col("_bb.bucket").as("bucket"),
        col("doc_id"), col("gen"))
  }

  /** Index one batch: signatures computed once ([[Dedup.minHashSignatures]]
    * — the codegen'd aggregation form), band rows + sig rows appended,
    * each an atomic commit. */
  def append(bandTable: IceTable, sigTable: IceTable,
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16): Unit = {
    val sigs = Dedup.minHashSignatures(docs, idCol, textCol, numHashes)
      .localCheckpoint(true)
    try {
      bandTable.insert(bandRows(sigs, numHashes, bands))
      sigTable.insert(sigs.select(col("_id").as("doc_id"),
        col("_sig").as("sig"), lit(0L).as("gen")))
    } finally { sigs.unpersist(); () }
  }

  /** Keep the signature index CURRENT as its corpus table mutates —
    * [[TextIndex.syncFromFeed]]'s near-dup twin over the row-level
    * change feed. Per window: the LATEST insert image per doc becomes
    * its live signature + band rows (gen = its commit ts); one marker
    * per deleted doc (gen = its latest delete image's commit ts) retires
    * every strictly-older generation — an update's own rows survive
    * their marker (CoW image pairs share a commit ts), a pure delete's
    * marker outlives everything. No per-version bookkeeping is needed
    * (unlike the text index there are no corpus-wide stats to balance):
    * only the LIVE version must be searchable.
    *
    * Effectively-once: all three appends are insertBatch-keyed by the
    * window bound; the SIG table's record — committed last — is the
    * watermark. Crash-replay duplicates are byte-identical, dropped at
    * query time and collapsed by the tables' merge SQL. Initial build
    * pins its bound on the marks table first so a replayed build is
    * byte-identical too.
    *
    * Returns (signatures indexed, docs retired). */
  def syncFromFeed(source: IceTable, bandTable: IceTable, sigTable: IceTable,
      marks: IceTable, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      replicaId: String = "default"): (Long, Long) = {
    import graft.ice.{CdcApply, ChangeFeed}
    val key = s"_sig_sync:$replicaId"
    def indexDocs(docs: DataFrame, genCol: Column, until: Long): Long = {
      val gens = docs.select(col(idCol).as("_id"), genCol.cast("long").as("_gen"))
      val sigs = Dedup.minHashSignatures(docs, idCol, textCol, numHashes)
        .join(gens, Seq("_id"))
        .localCheckpoint(true)
      try {
        val n = sigs.count()
        if (n > 0) {
          bandTable.insertBatch(bandRows(sigs, numHashes, bands), key, until)
          sigTable.insertBatch(sigs.select(col("_id").as("doc_id"),
            col("_sig").as("sig"), col("_gen").as("gen")), key, until)
        } else CdcApply.commitMark(sigTable, key, until)
        n
      } finally { sigs.unpersist(); () }
    }
    CdcApply.readMark(sigTable, key) match {
      case None =>
        // pin the initial bound FIRST — crash-replay rebuilds byte-same
        val until = CdcApply.readMark(marks, s"$key:init").getOrElse {
          val u = graft.ice.ChangeFeed.settledNow(source)
          CdcApply.commitMark(marks, s"$key:init", u)
          u
        }
        val n = source.trySnapshot(until + 1) match {
          case None => CdcApply.commitMark(sigTable, key, until); 0L
          case Some(_) =>
            indexDocs(source.read(until + 1).localCheckpoint(), lit(until), until)
        }
        (n, 0L)
      case Some(wm) =>
        val (feed, until) = ChangeFeed.betweenSettled(source, wm)
        val f = feed.localCheckpoint()
        // live version only: the LATEST insert image per doc
        val byDocDesc = Window.partitionBy(col(idCol))
          .orderBy(col(ChangeFeed.CommitTsCol).desc)
        val insFinal = f.where(col(ChangeFeed.ChangeTypeCol) === "insert")
          .withColumn("_rn", row_number().over(byDocDesc))
          .where(col("_rn") === 1).drop("_rn")
        // one marker per doc at its LATEST delete image's ts
        val delMarks = f.where(col(ChangeFeed.ChangeTypeCol) === "delete")
          .groupBy(col(idCol).cast("long").as("doc_id"))
          .agg(max(col(ChangeFeed.CommitTsCol)).as("gen"))
        val nDel = delMarks.count()
        val hasIns = !insFinal.isEmpty
        if (nDel == 0 && !hasIns) return (0L, 0L) // idle: commit nothing
        if (nDel > 0) marks.insertBatch(delMarks, key, until)
        val nIns =
          if (hasIns)
            indexDocs(insFinal.localCheckpoint(),
              col(ChangeFeed.CommitTsCol), until)
          else { CdcApply.commitMark(sigTable, key, until); 0L }
        (nIns, nDel)
    }
  }

  /** Near-duplicates of `batch` against the indexed history:
    * (batch_id, hist_id, est_jaccard >= threshold), est_jaccard the
    * fraction of equal minhash positions. The batch never joins itself —
    * append it (before or after) for within-batch coverage on the next
    * round, or run [[Dedup.minHashDupPairs]] on the batch alone. */
  def nearDupsAgainstIndex(bandTable: IceTable, sigTable: IceTable,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      maxCandidatesPerDoc: Int = 1000,
      marks: Option[IceTable] = None): DataFrame = {
    val bSigs = Dedup.minHashSignatures(batch, idCol, textCol, numHashes)
      .localCheckpoint(true)
    val bBands = bandRows(bSigs, numHashes, bands)
      .withColumnRenamed("doc_id", "batch_id")
    // gen-scoped retirement (syncFromFeed): a marker kills index rows of
    // the same doc with a STRICTLY smaller gen — broadcast, doc-count-
    // scale. A marks table with only watermark commits has no columns
    def alive(df: DataFrame): DataFrame = marks match {
      case Some(m) if m.read().columns.contains("doc_id") =>
        val mk = broadcast(m.read().groupBy("doc_id").agg(max("gen").as("_mgen")))
        df.join(mk, df("doc_id") === mk("doc_id") &&
            coalesce(df("gen"), lit(0L)) < mk("_mgen"), "left_anti")
      case _ => df
    }
    // history scan + broadcast join: the index side never shuffles
    val candidates = alive(bandTable.read())
      .join(broadcast(bBands.drop("gen")), Seq("band", "bucket"))
      .select(col("batch_id"), col("doc_id").as("hist_id"))
      .dropDuplicates("batch_id", "hist_id")
    // deterministic hot-bucket cap: keep the smallest history ids
    val w = Window.partitionBy("batch_id").orderBy("hist_id")
    val capped = candidates.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxCandidatesPerDoc).drop("_rn")
    val est = capped
      .join(alive(sigTable.read())
        // crash-replayed sync windows may leave byte-identical dupes
        // until compaction: one surviving (doc, gen) row feeds the join
        .dropDuplicates("doc_id", "gen")
        .select(col("doc_id").as("hist_id"), col("sig").as("_hsig")),
        Seq("hist_id"))
      .join(bSigs.select(col("_id").as("batch_id"), col("_sig").as("_bsig")),
        Seq("batch_id"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("_hsig"), col("_bsig"),
            (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes.toDouble)
      .where(col("est_jaccard") >= threshold)
      .select(col("batch_id"), col("hist_id"), col("est_jaccard"))
    est
  }
}
