package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocabulary construction and coverage analysis — the tokenizer-prep side
  * of a training-data pipeline: word frequency tables, a top-V vocabulary
  * with a deterministic total order, and corpus coverage / OOV statistics
  * for a candidate vocabulary.
  *
  * Shape at 100 TB: word counting is the canonical map-side-combine
  * aggregation (the shuffle carries one row per DISTINCT term per
  * partition, not one per occurrence); vocabulary selection is a top-V
  * `TakeOrderedAndProject` over the distinct-term table (small); coverage
  * is one more counting scan joined against the BROADCAST vocabulary —
  * no shuffle of the token stream ever happens.
  */
object Vocab {

  /** (term, freq) table: whitespace-token occurrence counts. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))

  /** Top-`size` vocabulary by (freq desc, term asc) — the tie-break makes
    * the selected set a deterministic function of the corpus, so two runs
    * (or two engines) always agree on the boundary terms. */
  def build(df: DataFrame, textCol: String, size: Int): DataFrame =
    wordCounts(df, textCol)
      .orderBy(col("freq").desc, col("term"))
      .limit(size)

  /** Coverage of a vocabulary over a corpus, one summary row:
    * total token occurrences, occurrences covered by the vocab, coverage
    * fraction, and distinct out-of-vocabulary terms. `vocab` is broadcast
    * — it is vocabulary-sized by construction, never corpus-sized. */
  def coverage(df: DataFrame, textCol: String, vocab: DataFrame): DataFrame = {
    val occ = df.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
    occ.join(broadcast(vocab.select(col("term"), lit(1L).as("_in"))),
        Seq("term"), "left")
      .agg(
        count(lit(1)).as("total_tokens"),
        sum(coalesce(col("_in"), lit(0L))).cast("bigint").as("covered_tokens"),
        round(sum(coalesce(col("_in"), lit(0L))) /
          count(lit(1)).cast("double"), 6).as("coverage"),
        countDistinct(when(col("_in").isNull, col("term"))).as("oov_terms"))
  }
}
