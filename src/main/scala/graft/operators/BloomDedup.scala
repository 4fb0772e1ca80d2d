package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership dedup: the constant-size complement to
  * [[graft.operators.Dedup.incrementalDedup]] for continuous-crawl
  * pipelines.
  *
  * The exact incremental path anti-joins EVERY new batch against the full
  * persisted hash index — a shuffle whose history side grows with the
  * corpus. At 100 TB (~10¹¹ docs) a 1%-fpp Bloom filter over the same
  * content hashes is ~120 GB of bits TOTAL — but per-partition filters or
  * a recent-window filter fit in executor memory, and the common case
  * (never-seen document) is decided by a broadcast bit-test with ZERO
  * history I/O. Only Bloom HITS (true dups + ~fpp false positives) reach
  * the exact verification anti-join, so the expensive join's left side
  * shrinks from |batch| to |dups| + fpp·|batch|; pair it with a
  * hash-bucket-partitioned index table ([[graft.operators.SigIndex]]
  * layout) and the right side prunes to the buckets the candidates fall
  * in ([[graft.ice.IceTable.readPartitions]]).
  *
  * Everything stays plan-native: the filter is built with Spark's
  * distributed `bloom_filter_agg` (partial aggregation, no row data on
  * the driver) and probed with the codegen'd `might_contain` expression —
  * no UDF in the hot path. The serialized bits round-trip through
  * [[org.apache.spark.util.sketch.BloomFilter]], so filters persist
  * beside the table and OR-merge across incremental builds.
  *
  * False positives cost only a wasted verification lookup, never a
  * wrongly dropped document — [[dedupAgainst]] verifies every hit against
  * the true hash index.
  */
object BloomDedup {

  /** 64-bit content hash shared by build and probe sides. */
  def contentHash64(contentCols: Seq[String]): Column =
    xxhash64(concat_ws(" ", contentCols.map(col): _*))

  /** Distributed Bloom build over `history`'s content hashes via Spark's
    * own [[BloomFilterAggregate]] (the engine's runtime-join-filter
    * machinery, reused as a first-class operator): per-partition filters
    * OR-combine map-side, so the driver sees one bit-array, never rows.
    * Returns the serialized filter (compatible with
    * [[BloomFilter.readFrom]]).
    *
    * Sizing above ~4M items / 8 MB of bits requires raising
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` — the build fails loudly at the cap, never silently
    * degrades. */
  def build(
      history: DataFrame,
      contentCols: Seq[String],
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] =
    buildOverHashes(history, contentHash64(contentCols), expectedItems, fpp)

  /** [[build]] over an arbitrary LONG hash column (e.g. n-gram hashes for
    * [[Decontam.contaminatedBloom]]). */
  def buildOverHashes(
      df: DataFrame,
      hashCol: Column,
      expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(hashCol),
      ColumnBridge.expression(lit(expectedItems)),
      ColumnBridge.expression(lit(numBits))).toAggregateExpression()
    df.select(ColumnBridge.column(agg).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** OR-merge two serialized filters (must share sizing — i.e. built with
    * the same expectedItems/fpp), for incremental corpus growth. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    serialize(fa)
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** The codegen'd membership probe ([[BloomFilterMightContain]] over the
    * literal bits): true ⇒ POSSIBLY seen (verify), false ⇒ definitely
    * never seen. */
  def mightContain(bloomBits: Array[Byte], contentCols: Seq[String]): Column =
    mightContainHash(bloomBits, contentHash64(contentCols))

  /** [[mightContain]] over an arbitrary LONG hash column. */
  def mightContainHash(bloomBits: Array[Byte], hashCol: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bloomBits)),
      ColumnBridge.expression(hashCol)))

  /** Incremental dedup of `newDf` against a corpus summarized by
    * `bloomBits`, with exact verification of hits against `seenHashes64`
    * (single column `_h`: the corpus' [[contentHash64]] values, e.g. a
    * bucket-pruned read of the persisted hash index).
    *
    * Keeps: one representative (min `idCol`) per content hash among rows
    * that are neither in the corpus nor earlier in the batch. The Bloom
    * miss-path rows bypass the verification join entirely — with an
    * honest fpp, the join's left side is |true dups| + fpp·|batch|.
    */
  def dedupAgainst(
      newDf: DataFrame,
      contentCols: Seq[String],
      idCol: String,
      bloomBits: Array[Byte],
      seenHashes64: DataFrame): DataFrame = {
    val tagged = newDf
      .withColumn("_h", contentHash64(contentCols))
      .withColumn("_maybe", mightContain(bloomBits, contentCols))
    val definiteNew = tagged.where(!col("_maybe"))
    val verifiedNew = tagged.where(col("_maybe"))
      .join(seenHashes64.select(col("_h")).distinct(), Seq("_h"), "left_anti")
    val w = Window.partitionBy("_h").orderBy(col(idCol))
    definiteNew.unionByName(verifiedNew)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_h", "_maybe")
  }

  /** The corpus-side hash rows to persist for verification (same shape
    * [[dedupAgainst]] consumes). */
  def hashes64(df: DataFrame, contentCols: Seq[String]): DataFrame =
    df.select(contentHash64(contentCols).as("_h")).distinct()
}
