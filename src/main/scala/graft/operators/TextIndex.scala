package graft.operators

import graft.functions.TextFunctions
import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A persisted INVERTED INDEX as an ice table — ranked keyword retrieval
  * that never rescans the corpus. [[Search.bm25TopK]] is the two-pass
  * on-the-fly form (index-build cost per query); this is the search-engine
  * shape: postings are extracted once per ingest batch, committed through
  * the table's atomic log, compacted by the ordinary merge machinery, and
  * a query touches only the hash-bucket partitions its terms live in.
  *
  * Scale shape at 100 TB:
  *  - the postings table is partitioned by `b=<xxhash64(term) % buckets>`,
  *    so a K-term query prunes to ≤ K partitions FROM THE LOG ALONE
  *    ([[IceTable.readPartitions]] — no file listing outside the member
  *    buckets), then to the term rows by a pushed-down `isin` filter;
  *  - corpus statistics (N, Σdl) are an AggregatingMergeTree-style MV:
  *    every ingest batch collapses to ONE (n_docs, sum_dl) row at insert,
  *    merges re-sum it — the query-time stats read is O(#unmerged logs),
  *    never a corpus scan;
  *  - incremental by construction: new batches append postings + one
  *    stats row; no read-modify-write of existing index data, so ingest
  *    never contends with queries (MVCC snapshots) and compaction is the
  *    ordinary background merge. Append-only corpus semantics: re-ingesting
  *    a changed document requires a partition rewrite of its old postings
  *    (the GDPR path), exactly like any lakehouse upsert.
  *
  * Scoring reproduces [[Search.bm25TopK]] operation-for-operation (same
  * idf, same saturation, same explicitly ordered contribution sum, same
  * rounding), so index-backed results are bit-identical to the full-scan
  * form — graded by `llm_bm25_index` against the same DuckDB replay.
  */
object TextIndex {

  /** Term → partition bucket (hash-partitioned posting lists). */
  def bucketOf(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets.toLong))

  /** Config for the postings table: hash-bucket partitions, postings
    * sorted (term, doc_id) within each file for row-group locality. */
  def indexConfig(buckets: Int = 64): IceTableConfig = IceTableConfig(
    partitionExpr = concat(lit("b="), bucketOf(col("term"), buckets)),
    sortOrder = Seq("term", "doc_id"))

  /** Config for the stats MV: one row per ingest batch at insert, one row
    * total after any merge — the uniqState/uniqMerge pattern with plain
    * sums as the state. */
  def statsConfig: IceTableConfig = IceTableConfig(
    partitionExpr = lit("all"),
    sortOrder = Nil,
    customInsertSql = Some(
      """select cast(count(*) as bigint) as n_docs,
        |cast(coalesce(sum(dl), 0) as bigint) as sum_dl
        |from _rows""".stripMargin),
    customMergeSql = Some(
      """select cast(sum(n_docs) as bigint) as n_docs,
        |cast(sum(sum_dl) as bigint) as sum_dl
        |from source_files""".stripMargin))

  /** (term, doc_id, tf, dl) postings for one batch: one tokenization
    * scan, one (doc, term) aggregation, dl denormalized onto every
    * posting via a per-doc window. Empty terms are junk and excluded
    * from the index (they can never be queried). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
    val perTerm = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    perTerm.withColumn("dl",
      sum("tf").over(Window.partitionBy("doc_id")).cast("long"))
  }

  /** One (doc_id, dl) row per doc — the batch input for the stats MV
    * (its insert SQL collapses this to a single row). dl is the RAW
    * whitespace-token count, which for empty/whitespace-only text is 1
    * (the split's single empty string): exactly [[Search.docTermStats]]'s
    * universe, so index-backed corpus stats (N, avgdl) — and therefore
    * scores — are bit-identical to the full-scan form. Null-text docs
    * contribute nothing there (explode of a null array) and are filtered
    * here to match. */
  def docStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = TextFunctions.tokens(col(textCol))
    docs.where(t.isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        size(t).cast("long").as("dl"))
  }

  /** Index one batch of documents: postings append + stats append, each
    * its own atomic commit. */
  def indexBatch(index: IceTable, stats: IceTable,
      docs: DataFrame, idCol: String, textCol: String): Unit = {
    index.insert(postings(docs, idCol, textCol))
    stats.insert(docStats(docs, idCol, textCol))
  }

  /** Config for the delete-marker table: one (doc_id, dl) row per deleted
    * document. A doc's postings are scattered across every bucket its
    * terms hash to, so physical deletion would rewrite arbitrary
    * partitions; the search-engine shape is a DELETE BITMAP — markers are
    * appended (atomic, tiny), queries anti-join them out and subtract
    * their (count, Σdl) from the corpus stats, and a periodic full
    * reindex (or per-bucket rewrite job) garbage-collects for real. */
  def deleteConfig: IceTableConfig = IceTableConfig(
    partitionExpr = lit("all"),
    sortOrder = Seq("doc_id"),
    // deletes are idempotent: re-marking a doc collapses to one marker at
    // compaction, and the query side dedups un-compacted repeats too
    customMergeSql = Some(
      "select doc_id, max(dl) as dl from source_files group by doc_id"))

  /** Mark documents deleted: one atomic append of their (doc_id, dl)
    * rows (same universe rule as [[docStats]], so stats adjust exactly).
    * Idempotent end-to-end: repeated markers dedup at query time and
    * collapse to one row at compaction. */
  def deleteDocs(deletes: IceTable,
      docs: DataFrame, idCol: String, textCol: String): Unit = {
    deletes.insert(docStats(docs, idCol, textCol))
    ()
  }

  /** BM25 top-k from the index alone. Reads: the stats MV (O(#logs)
    * rows), the delete markers (small, broadcast anti-join) if any, then
    * ONLY the query terms' bucket partitions. Formula and float-operation
    * order identical to [[Search.bm25TopK]], so results match a
    * freshly-built index over the surviving corpus bit-for-bit.
    *
    * `asOfTs` time-travels the WHOLE query (postings, stats, deletes
    * fold to the same log horizon — the tables commit atomically per
    * batch, so any horizon is a consistent corpus): "what did this
    * search return last Tuesday" is one parameter, no index rebuild. */
  def bm25TopK(index: IceTable, stats: IceTable,
      terms: Seq[String], buckets: Int = 64, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      deletes: Option[IceTable] = None,
      asOfTs: Long = Long.MaxValue): DataFrame = {
    require(terms.nonEmpty, "query must have at least one term")
    val statsDf = stats.read(asOfTs)
    val spark = statsDf.sparkSession
    val sr = statsDf.agg(sum("n_docs").cast("long"), sum("sum_dl").cast("long")).head()
    // deleted docs leave the stats universe exactly (their dl was
    // recorded at delete time), keeping N/avgdl — and so every score —
    // identical to a rebuild without them
    val (delN, delDl, delDf) = deletes match {
      case None => (0L, 0L, None)
      case Some(t) =>
        val d = t.read(asOfTs).select(col("doc_id"), col("dl"))
          .dropDuplicates("doc_id") // idempotent re-marking pre-compaction
        val r = d.agg(count(lit(1)).cast("long"), sum("dl").cast("long")).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), Some(d))
    }
    val n = sr.getLong(0) - delN
    val avgdl = (sr.getLong(1) - delDl).toDouble / n.toDouble
    // the terms' buckets, via the same engine hash the router used
    val parts = spark.range(1).select(terms.map(t =>
        bucketOf(lit(t), buckets)): _*).head()
      .toSeq.map(bkt => s"b=$bkt").toSet
    val pruned0 = index.readPartitions(parts, asOfTs)
      .where(col("term").isin(terms: _*))
    val pruned = delDf.fold(pruned0)(d =>
      pruned0.join(broadcast(d.select("doc_id")), Seq("doc_id"), "left_anti"))
    val dfByTerm = pruned.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("_df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = terms.map { t =>
      val dfi = dfByTerm.getOrElse(t, 0L).toDouble
      math.log(1.0 + (n - dfi + 0.5) / (dfi + 0.5))
    }
    val aggs = max(col("dl")).as("_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"_tf$i")
      }
    val perDoc = pruned.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      lit(idf(i)) * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / lit(avgdl)))
    }.reduceLeft(_ + _)
    perDoc.select(col("doc_id"), score.as("_score"))
      .where(col("_score") > 0)
      .orderBy(col("_score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("_score"), 4).as("score"))
  }
}
