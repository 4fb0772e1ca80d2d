package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering as a CURATION surface: assign every row to a
  * coarse k-means cell, profile the cells, and draw cluster-balanced
  * samples — the "cluster then sample per cluster" diversity pass used to
  * keep web-scale corpora from collapsing onto their densest modes (and
  * the unsupervised analog of [[Mixing.sampleExactN]]'s explicit strata;
  * SemDeDup-adjacent: [[SemDedup]] deletes within-cluster duplicates,
  * this keeps a bounded, spread sample of every cluster).
  *
  * All three surfaces share the [[Similarity]] centroid machinery (one
  * broadcast Lloyd train, one broadcast nearest-centroid assign — the
  * corpus is scanned, never shuffled on a data key until the per-cluster
  * window) and are deterministic: seeds are hash-picked, the sample is a
  * pure function of the data.
  */
object Cluster {

  /** Cluster assignment: (idCol, cid, centroid_sim). One broadcast
    * argmax per row; `centroid_sim` is the cosine to the assigned
    * centroid — the per-row coherence score downstream filters use. */
  def assign(
      df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, lloydIterations: Int = 2, dim: Int = 64): DataFrame = {
    val c = df.select(col(idCol).as("id"), col(vecCol).as("_v"))
    val centroids = Similarity.trainCentroids(c, nlist, lloydIterations, dim)
    Similarity.nearestCid(c, centroids, dim)
      .join(broadcast(centroids), Seq("cid"))
      .withColumn("centroid_sim",
        Similarity.dotN(col("_v"), col("_c"), dim) /
          (Similarity.normN(col("_v"), dim) * Similarity.normN(col("_c"), dim)))
      .select(col("id").as(idCol), col("cid"), col("centroid_sim"))
  }

  /** Per-cluster profile: (cid, size, mean_sim, min_sim) — size for
    * balance monitoring, the sim stats for coherence (a cluster whose
    * min_sim is near its mean is tight; a long tail marks a junk-drawer
    * cell). One map-side-combined aggregate over the assignment. */
  def profile(assigned: DataFrame): DataFrame =
    assigned.groupBy("cid")
      .agg(count(lit(1)).as("size"),
        avg(col("centroid_sim")).as("mean_sim"),
        min(col("centroid_sim")).as("min_sim"))

  /** Cluster-balanced sample: at most `perCluster` rows per cluster,
    * hash-ordered so the kept set is deterministic. Composes
    * [[assign]] with the [[Mixing.sampleExactN]] window idiom; returns
    * the assignment columns for the kept rows. */
  def balancedSample(
      df: DataFrame, idCol: String, vecCol: String, perCluster: Int,
      nlist: Int = 16, lloydIterations: Int = 2, dim: Int = 64): DataFrame =
    Mixing.sampleExactN(assign(df, idCol, vecCol, nlist, lloydIterations, dim),
      "cid", idCol, perCluster)
}
