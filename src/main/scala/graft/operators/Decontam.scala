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
}
