package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword relevance search over a document corpus — the retrieval side of
  * a training-data pipeline (mining domain-relevant documents, building
  * eval-adjacent subsets, grading corpus drift against a query set).
  *
  * Shape at 100 TB: one tokenization scan with the per-term counters fused
  * into a single `groupBy(doc)` (map-side partial aggregation — the
  * shuffle carries one row per document, not one per token), a scalar
  * corpus-stats aggregate, and a `TakeOrderedAndProject` top-k. The query
  * vocabulary is a handful of literals compiled into the plan; no joins,
  * no UDFs, everything whole-stage codegen.
  *
  * The per-document score is an explicitly ordered sum of per-term
  * contributions (term 0 first), so the float result is reproducible
  * bit-for-bit by any engine replaying the same order — summation order is
  * the only associativity freedom IEEE doubles leave.
  */
object Search {

  /** Per-document BM25 stats for a fixed query vocabulary: `_dl` (doc
    * length in tokens) and `_tf{i}` per query term, in ONE aggregation
    * pass over the exploded token stream. */
  private[graft] def docTermStats(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
    val aggs = count(lit(1)).as("_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("_t") === t, 1L).otherwise(0L)).as(s"_tf$i")
      }
    toks.groupBy("_id").agg(aggs.head, aggs.tail: _*)
  }

  /** BM25 top-k document retrieval for a bag-of-words query.
    *
    * Uses the Robertson/Sparck-Jones idf with the +1 floor (the Lucene
    * form, never negative): `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
    * and the standard tf saturation
    * `tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`.
    *
    * Corpus stats (N, avgdl, per-term df) are a one-row aggregate
    * collected to the driver and folded into the plan as literals — the
    * same two-pass shape every search engine uses (stats are index-time
    * metadata there; here pass 1 is the stats scan).
    *
    * @return (idCol, score double) rows, `score` rounded to 4 decimals,
    *         positive scores only, ordered score desc then id asc, top k.
    */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query must have at least one term")
    // Pass 1: the one-row corpus aggregate (N, avgdl, df per term) —
    // tiny and driver-safe, the ONLY eager step. The returned plan is
    // fully lazy and re-derives the doc stats on execution: a second
    // tokenization scan, but no corpus-sized cache/checkpoint pinned in
    // executor storage (a non-reliable localCheckpoint of a corpus-sized
    // result is lost with any executor at 100 TB).
    val stats = docTermStats(df, idCol, textCol, terms)
    val corpusAggs = Seq(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val c = stats.agg(corpusAggs.head, corpusAggs.tail: _*).head()
    val n = c.getLong(0)
    val avgdl = c.getDouble(1)
    val idf = terms.indices.map { i =>
      val dfi = c.getLong(2 + i).toDouble
      math.log(1.0 + (n - dfi + 0.5) / (dfi + 0.5))
    }
    // explicitly ordered contribution sum: ((c0 + c1) + c2) + ...
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      lit(idf(i)) * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / lit(avgdl)))
    }.reduceLeft(_ + _)
    stats.select(col("_id").as(idCol), score.as("_score"))
      .where(col("_score") > 0)
      .orderBy(col("_score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("_score"), 4).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of ranked
    * lists over a shared id space — the standard way to combine sparse
    * (BM25) and dense (embedding) retrieval without score calibration:
    * `fused(d) = Σ_lists 1/(k0 + rank_d)`. The inputs are top-k lists
    * (metadata-scale), so this is cheap plan glue — the heavy lifting
    * happened producing the rankings. The fused score is integer-scaled
    * (`floor(1e9·s)`) after the order-free double sum, so any engine
    * derives the identical value and ordering.
    *
    * @param lists ranked DataFrames each carrying (idCol, rankCol),
    *              rank 1-based
    * @return (idCol, lists_hit, rrf_e9), top-k by fused score desc, id asc
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranking")
    val contrib = lists.map(l => l.select(col(idCol),
      (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double"))).as("_c")))
    contrib.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("lists_hit"),
        floor(lit(1e9) * sum(col("_c"))).cast("long").as("rrf_e9"))
      .orderBy(col("rrf_e9").desc, col(idCol))
      .limit(k)
  }

  /** Term-frequency/inverse-document-frequency vector norm per doc for a
    * fixed vocabulary — the dense-scoring building block ([[bm25TopK]] is
    * the ranked retrieval surface). Returns (idCol, tfidf_norm) with ONE
    * row per source document: `N` is the full corpus size and a document
    * whose text tokenizes to nothing still appears, with norm 0 — the
    * groupBy-after-explode would otherwise silently drop it and skew the
    * idf denominator. Lazy like [[bm25TopK]]: only the one-row df-count
    * aggregate executes eagerly. */
  def tfidfNorm(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val stats = docTermStats(df, idCol, textCol, terms)
    val n = df.count().toDouble // ALL docs, token-less included
    val aggs = terms.indices.map(i =>
      sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val r = stats.agg(aggs.head, aggs.tail: _*).head()
    val comps: Seq[Column] = terms.indices.map { i =>
      val idf = math.log((n + 1.0) / (r.getLong(i) + 1.0)) + 1.0
      val v = coalesce(col(s"_tf$i"), lit(0L)).cast("double") * lit(idf)
      v * v
    }
    df.select(col(idCol))
      .join(stats.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol), sqrt(comps.reduceLeft(_ + _)).as("tfidf_norm"))
  }
}
