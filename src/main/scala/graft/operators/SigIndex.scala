package graft.operators

import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.{DataFrame}
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
  * plus the sig table — or the delete-marker pattern of
  * [[TextIndex.deleteDocs]] if rewrites must be deferred.
  */
object SigIndex {

  def bandConfig: IceTableConfig = IceTableConfig(
    partitionExpr = concat(lit("band="), col("band")),
    sortOrder = Seq("bucket", "doc_id"))

  def sigConfig: IceTableConfig = IceTableConfig(
    partitionExpr = lit("all"),
    sortOrder = Seq("doc_id"))

  /** (band, bucket, doc_id) rows: `bands` buckets per doc, bucket =
    * hash of the band's signature slice. One row is 3 longs. */
  def bandRows(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val perBand = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("_sig"), b * r + 1, r)).as("bucket"))): _*)
    sigs.select(col("_id").as("doc_id"), explode(perBand).as("_bb"))
      .select(col("_bb.band").as("band"), col("_bb.bucket").as("bucket"),
        col("doc_id"))
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
      sigTable.insert(sigs.select(col("_id").as("doc_id"), col("_sig").as("sig")))
    } finally { sigs.unpersist(); () }
  }

  /** Near-duplicates of `batch` against the indexed history:
    * (batch_id, hist_id, est_jaccard >= threshold), est_jaccard the
    * fraction of equal minhash positions. The batch never joins itself —
    * append it (before or after) for within-batch coverage on the next
    * round, or run [[Dedup.minHashDupPairs]] on the batch alone. */
  def nearDupsAgainstIndex(bandTable: IceTable, sigTable: IceTable,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      maxCandidatesPerDoc: Int = 1000): DataFrame = {
    val bSigs = Dedup.minHashSignatures(batch, idCol, textCol, numHashes)
      .localCheckpoint(true)
    val bBands = bandRows(bSigs, numHashes, bands)
      .withColumnRenamed("doc_id", "batch_id")
    // history scan + broadcast join: the index side never shuffles
    val candidates = bandTable.read()
      .join(broadcast(bBands), Seq("band", "bucket"))
      .select(col("batch_id"), col("doc_id").as("hist_id"))
      .dropDuplicates("batch_id", "hist_id")
    // deterministic hot-bucket cap: keep the smallest history ids
    val w = Window.partitionBy("batch_id").orderBy("hist_id")
    val capped = candidates.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxCandidatesPerDoc).drop("_rn")
    val est = capped
      .join(sigTable.read().select(col("doc_id").as("hist_id"),
        col("sig").as("_hsig")), Seq("hist_id"))
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
