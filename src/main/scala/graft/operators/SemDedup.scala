package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication, SemDeDup-style: cluster the
  * corpus with the coarse k-means quantizer, then find near-duplicate
  * pairs WITHIN each cluster by comparing every member only against a
  * bounded neighborhood in centroid-similarity order.
  *
  * Why a third near-dup operator next to [[Similarity.cosineDupPairs]]
  * (LSH buckets) and [[Dedup.minHashDupPairs]] (text shingles): LSH
  * bucketing is oblivious — at tight thresholds it needs many tables to
  * catch pairs near bucket boundaries — while clustering adapts to the
  * embedding distribution, and the per-cluster sort gives a DETERMINISTIC
  * linear-size candidate set: each row is paired with at most
  * `neighborhood` successors, so candidate volume is exactly n·w
  * regardless of how the corpus clumps — there is no hot-bucket quadratic
  * mode to cap away. The cost is approximation at the neighborhood edge:
  * a true dup pair separated by > w rows of equal-similarity interlopers
  * inside the same cluster is missed (near-identical vectors have
  * near-identical centroid similarity, so real dups sort adjacent).
  *
  * Scale shape: one broadcast nearest-centroid assign (map-side argmax),
  * one per-cluster sort (the only skew point: a mega-cluster sorts on one
  * task — O(n log n), not quadratic; raise nlist to shrink clusters), one
  * (cluster, rank)-key equi-join carrying only ids and ranks, then two
  * id-key joins to fetch vectors for exact scoring of the n·w candidates.
  * Embedding bytes never ride the candidate exchange.
  */
object SemDedup {

  /** Near-duplicate pairs (idA < idB, cosine >= threshold) from the
    * within-cluster neighborhood scan. */
  def semanticDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 16, lloydIterations: Int = 2,
      dim: Int = 64, neighborhood: Int = 8): DataFrame = {
    val c = df.select(col(idCol).as("id"), col(vecCol).as("_v"))
    val centroids = Similarity.trainCentroids(c, nlist, lloydIterations, dim)
    // (id, _v, cid) + similarity to the assigned centroid: the sort key
    val assigned = Similarity.nearestCid(c, centroids, dim)
      .join(broadcast(centroids), Seq("cid"))
      .withColumn("_cs", Similarity.dotN(col("_v"), col("_c"), dim) /
        (Similarity.normN(col("_v"), dim) * Similarity.normN(col("_c"), dim)))
      .select(col("id"), col("cid"), col("_cs"))
    val w = Window.partitionBy("cid").orderBy(col("_cs").desc, col("id"))
    val ranked = assigned.withColumn("_r", row_number().over(w))
      .select(col("id"), col("cid"), col("_r"))

    // each row meets its next `neighborhood` successors: explode the
    // probe ranks map-side, equi-join on (cid, rank) — rows are 3 longs
    val probes = ranked.select(col("id").as("idA"), col("cid"),
        explode(sequence(col("_r") + 1, col("_r") + neighborhood)).as("_r"))
    val candidates = probes.join(ranked.select(col("id").as("idB"),
        col("cid"), col("_r")), Seq("cid", "_r"))
      .select(least(col("idA"), col("idB")).as("idA"),
        greatest(col("idA"), col("idB")).as("idB"))

    val vecs = c.withColumn("_n", Similarity.normN(col("_v"), dim))
    candidates
      .join(vecs.select(col("id").as("idA"), col("_v").as("_va"),
        col("_n").as("_na")), Seq("idA"))
      .join(vecs.select(col("id").as("idB"), col("_v").as("_vb"),
        col("_n").as("_nb")), Seq("idB"))
      .withColumn("cosine", when(col("_na") * col("_nb") === 0, lit(0.0))
        .otherwise(Similarity.dotN(col("_va"), col("_vb"), dim) /
          (col("_na") * col("_nb"))))
      .where(col("cosine") >= threshold)
      .select("idA", "idB", "cosine")
  }

  /** SemDeDup keep-set: one canonical row (smallest id) per connected
    * semantic-duplicate group — [[Dedup.keepCanonical]] over
    * [[semanticDupPairs]]. */
  def semanticDedupKeep(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 16, lloydIterations: Int = 2,
      dim: Int = 64, neighborhood: Int = 8): DataFrame =
    Dedup.keepCanonical(df, idCol,
      semanticDupPairs(df, idCol, vecCol, threshold, nlist,
        lloydIterations, dim, neighborhood))
}
