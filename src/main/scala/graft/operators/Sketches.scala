package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable sketch operators — the approximate-counting layer a 100 TB
  * pipeline needs where exact aggregation is too expensive or where
  * per-partition summaries must compose without re-scanning:
  *
  *  - count-min sketch for frequency estimation / heavy-hitter detection
  *    (frequency capping of crawl domains, user-contribution caps);
  *  - HLL sketches stored per shard and merged at query time (the
  *    "sketch column in the metadata store" lakehouse pattern — distinct
  *    counts over any shard subset without touching data).
  *
  * Both are built on Spark's native sketch aggregates (`count_min_sketch`,
  * `hll_sketch_agg`, `hll_union_agg`): partial sketches combine map-side,
  * the shuffle carries kilobyte blobs, and the final merge is one row.
  */
object Sketches {

  /** Distributed count-min sketch over `keyCol`, deserialized driver-side.
    * The sketch is depth×width counters (~KBs) regardless of input size;
    * with a fixed seed the result is a deterministic function of the
    * multiset of keys (counter updates commute — they are sums). */
  def countMin(
      df: DataFrame, keyCol: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): CountMinSketch = {
    val bytes = df
      .select(count_min_sketch(col(keyCol), lit(eps), lit(confidence),
        lit(seed)).as("_s"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Exact heavy hitters: keys with occurrence count >= `threshold`.
    * One map-side-combined groupBy — the canonical exact baseline the
    * sketch path is validated against. */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)

  /** Per-shard HLL sketches: one binary sketch per `shardCol` group over
    * `keyCol`. Store these next to shard metadata and any distinct-count
    * query over a shard subset becomes a sketch merge — zero data I/O. */
  def hllPerShard(
      df: DataFrame, shardCol: String, keyCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(shardCol)
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("hll"))

  /** Merge per-shard sketches into one distinct-count estimate (long). */
  def hllMergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
        .as("estimate"))
}
