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
  *    ordinary background merge. Mutating corpora stay incremental too:
  *    [[syncFromFeed]] follows the corpus table's row-level change feed
  *    — updates and deletes become appended delete MARKERS (gen-scoped,
  *    see [[deleteConfig]]) plus fresh postings, never a rewrite of
  *    existing index partitions; a periodic per-bucket rewrite (the GDPR
  *    path) garbage-collects dead versions for real.
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

  /** [[bucketOf]] evaluated DRIVER-SIDE — the same xxhash64(seed 42) +
    * pmod the router wrote partitions with, as a folded catalyst literal
    * instead of a one-row Spark job (a serving-path point lookup must not
    * pay a job scheduling just to learn which buckets to prune to).
    * Operation-identity with the Column form is spec-pinned
    * (TextIndexSpec). */
  private[operators] def bucketOfLocal(term: String, buckets: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    // seed 42 = functions.xxhash64's fixed seed (XxHash64 companion)
    val h = XxHash64(Seq(Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    val m = h % buckets
    if (m < 0) m + buckets else m
  }

  /** Config for the postings table: hash-bucket partitions, postings
    * sorted (term, doc_id) within each file for row-group locality.
    * The merge SQL is a replacing-dedup on the version key — postings
    * duplicated by a crash-replayed [[syncFromFeed]] window are
    * byte-identical, so compaction collapses them for real (the query
    * side drops them on read until then). */
  def indexConfig(buckets: Int = 64): IceTableConfig = IceTableConfig(
    partitionExpr = concat(lit("b="), bucketOf(col("term"), buckets)),
    sortOrder = Seq("term", "doc_id"),
    customMergeSql = Some(
      """select term, doc_id, gen, max(tf) as tf, max(dl) as dl
        |from source_files group by term, doc_id, gen""".stripMargin))

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

  /** (term, doc_id, tf, dl, gen) postings for one batch: one tokenization
    * scan, one (doc, term) aggregation, dl denormalized onto every
    * posting via a per-doc window. Empty terms are junk and excluded
    * from the index (they can never be queried).
    *
    * `gen` is the VERSION GENERATION (a commit timestamp for feed-driven
    * maintenance, 0 for plain append-only batches): a delete marker with
    * a larger gen kills these postings, one with the same gen does not —
    * which is what lets an updated document re-enter the index without
    * the marker shooting down its own replacement. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      gen: Long = 0L): DataFrame =
    postingsWithGen(docs, idCol, textCol, lit(gen))

  private def postingsWithGen(docs: DataFrame, idCol: String,
      textCol: String, genCol: Column): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      genCol.cast("long").as("gen"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
    val perTerm = toks.groupBy("doc_id", "gen", "term").agg(count(lit(1)).as("tf"))
    perTerm.withColumn("dl",
        sum("tf").over(Window.partitionBy("doc_id", "gen")).cast("long"))
      .select("doc_id", "term", "tf", "dl", "gen") // gen last: batch callers
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
      docs: DataFrame, idCol: String, textCol: String,
      gen: Long = 0L): Unit = {
    index.insert(postings(docs, idCol, textCol, gen))
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
    // deletes are idempotent PER VERSION: re-marking a (doc, gen)
    // collapses to one marker at compaction, and the query side dedups
    // un-compacted repeats too; distinct gens of one doc are distinct
    // dead versions and each subtracts its own dl from the stats
    customMergeSql = Some(
      "select doc_id, gen, max(dl) as dl from source_files group by doc_id, gen"))

  /** Mark document VERSIONS deleted: one atomic append of their
    * (doc_id, dl, gen) rows (same universe rule as [[docStats]], so
    * stats adjust exactly). A marker kills postings of the same doc with
    * a STRICTLY SMALLER gen — the default `Long.MaxValue` keeps the old
    * "kill everything for this doc" behavior for append-only corpora.
    * Idempotent end-to-end: repeated markers dedup at query time and
    * collapse to one row at compaction. */
  def deleteDocs(deletes: IceTable,
      docs: DataFrame, idCol: String, textCol: String,
      gen: Long = Long.MaxValue): Unit = {
    deletes.insert(docStats(docs, idCol, textCol).withColumn("gen", lit(gen)))
    ()
  }

  /** Keep the index CURRENT as its corpus table mutates — DML-driven
    * incremental maintenance over the row-level change feed, so a 100 TB
    * corpus never needs a full reindex after updates/deletes:
    *
    *  - first call = INITIAL BUILD: the corpus snapshot at a settled
    *    bound indexes wholesale (gen = that bound, pinned on the deletes
    *    table BEFORE building so a crash-replay rebuilds the byte-same
    *    batch);
    *  - each later call reads the changes since the recorded watermark
    *    and applies EVERY image as a version event: each insert image
    *    becomes that version's postings + stats row (gen = its commit
    *    ts), each delete image becomes one delete marker (gen = its
    *    commit ts, dl from the recovered deleted content). Births and
    *    deaths always balance — a version that lives and dies inside one
    *    window adds and subtracts the same dl, and its postings die to
    *    the doc's later-gen marker — so N/avgdl/scores equal a fresh
    *    rebuild of the surviving corpus.
    *
    * The strict `p.gen < m.gen` kill rule in [[bm25TopK]] is what makes
    * a marker retire every OLDER version while the update's OWN postings
    * (same commit ts) survive. Compactions/reclusters of the corpus are
    * feed-silent and cost nothing here.
    *
    * Effectively-once: each of the three appends is an
    * [[graft.ice.IceTable.insertBatch]] keyed by the window bound, and
    * the STATS batch record — committed last — IS the watermark, so
    * stats (the only non-idempotent aggregate) move atomically with
    * window completion. A crash between appends replays the window:
    * already-applied marker/posting rows re-appear as byte-identical
    * duplicates, which the query side drops (dropDuplicates on version
    * keys) and compaction collapses for real ([[indexConfig]]'s merge
    * SQL). Key-unique corpus contract (same as upsert): re-inserting a
    * live doc_id without deleting it first is undefined.
    *
    * Returns (version births indexed, version deaths retired). */
  def syncFromFeed(source: IceTable, index: IceTable, stats: IceTable,
      deletes: IceTable, idCol: String, textCol: String,
      replicaId: String = "default"): (Long, Long) = {
    import graft.ice.{CdcApply, ChangeFeed}
    val key = s"_idx_sync:$replicaId"
    CdcApply.readMark(stats, key) match {
      case None =>
        // pin the initial bound FIRST: a crash mid-build replays with
        // the SAME bound, so the rebuilt batch is byte-identical and
        // insertBatch/dedup make the retry convergent
        val until = CdcApply.readMark(deletes, s"$key:init").getOrElse {
          val u = graft.ice.ChangeFeed.settledNow(source)
          CdcApply.commitMark(deletes, s"$key:init", u)
          u
        }
        val n = source.trySnapshot(until + 1) match {
          case None => 0L
          case Some(_) =>
            val docs = source.read(until + 1).localCheckpoint()
            index.insertBatch(postings(docs, idCol, textCol, gen = until),
              key, until)
            val c = docs.count()
            stats.insertBatch(docStats(docs, idCol, textCol), key, until)
            c
        }
        if (n == 0) CdcApply.commitMark(stats, key, until)
        (n, 0L)
      case Some(wm) =>
        val (feed, until) = ChangeFeed.betweenSettled(source, wm)
        val f = feed.localCheckpoint()
        val ins = f.where(col(ChangeFeed.ChangeTypeCol) === "insert")
        val del = f.where(col(ChangeFeed.ChangeTypeCol) === "delete")
        val nIns = ins.count()
        val nDel = del.count()
        if (nIns == 0 && nDel == 0) return (0L, 0L) // idle: commit nothing
        if (nDel > 0) {
          // the marker's dl comes from the DELETED content (the feed
          // recovers it), so stats subtract exactly the indexed version
          val t = TextFunctions.tokens(col(textCol))
          deletes.insertBatch(del.where(t.isNotNull)
            .select(col(idCol).cast("long").as("doc_id"),
              size(t).cast("long").as("dl"),
              col(ChangeFeed.CommitTsCol).as("gen")), key, until)
        }
        if (nIns > 0)
          index.insertBatch(
            postingsWithGen(ins, idCol, textCol, col(ChangeFeed.CommitTsCol)),
            key, until)
        // LAST: the stats batch record doubles as the watermark
        stats.insertBatch(docStats(ins, idCol, textCol), key, until)
        (nIns, nDel)
    }
  }

  /** Physically drop RETIRED postings — the GC half of the marker
    * design: [[syncFromFeed]] retires versions logically (gen-scoped
    * markers the query kill-rule honors), this reclaims their bytes.
    * Each bucket partition rewrites through the SAME kill anti-join the
    * query applies, so results cannot change — only scan width and
    * storage shrink. Markers themselves are KEPT: they are
    * (doc_id, gen, dl) rows — doc-count scale, collapsed by compaction —
    * and still carry the stats subtraction; deleting them would need an
    * atomic cross-table stats correction the format does not have, for
    * a table that is already small.
    *
    * Scale shape: one [[graft.ice.IceTable.rewritePartitionWith]] per
    * bucket (bounded, resumable — pass a subset of buckets to spread GC
    * over maintenance windows), marker max-gens broadcast. Returns
    * buckets rewritten. */
  def gcPostings(index: IceTable, deletes: IceTable,
      onlyBuckets: Option[Set[String]] = None): Int = {
    // a deletes table with no commits at all (index built without a
    // syncFromFeed `:init` pin) has no markers to GC
    val d = try deletes.read() catch {
      case _: graft.ice.NoLogFilesException => return 0
    }
    if (!d.columns.contains("doc_id")) return 0 // no markers ever
    val mk = killSet(d)
    // Pre-probe: ONE column-pruned scan (doc_id, gen + the partition
    // string) finds the buckets that actually hold retired rows, so a
    // no-op GC — or a second run right after the first — rewrites
    // nothing instead of churning a full copy of every bucket.
    val probe = index.withPartitionColumn(index.read(), "b")
    val probeGen =
      if (probe.columns.contains("gen")) coalesce(probe("gen"), lit(0L))
      else lit(0L)
    val hit = probe.join(mk,
        probe("doc_id") === mk("doc_id") && probeGen < mk("_mgen"),
        "left_semi")
      .select(col("b")).distinct()
      .collect().map(r => s"b=${r.get(0)}").toSet // bucket-count scale
    val parts = index.snapshot().aliveFiles
      .map(m => index.partitionOf(m.path)).distinct
      .filter(p => onlyBuckets.forall(_.contains(p)) && hit.contains(p))
    var rewritten = 0
    parts.foreach { p =>
      val (log, _, _) = index.rewritePartitionWith(p) { df0 =>
        // left_anti keeps df0's columns untouched (rewrite contract);
        // pre-gen rows compare as gen 0 without being mutated
        val genExpr =
          if (df0.columns.contains("gen")) coalesce(df0("gen"), lit(0L))
          else lit(0L)
        df0.join(mk,
          df0("doc_id") === mk("doc_id") && genExpr < mk("_mgen"),
          "left_anti")
      }
      if (log.nonEmpty) rewritten += 1
    }
    rewritten
  }

  /** The broadcast (doc_id, _mgen) kill set — the ONE definition of
    * which generations a marker retires, shared by the query kill-rule
    * ([[bm25TopK]]) and the physical GC ([[gcPostings]]) so they cannot
    * diverge. Null gen (a whole-doc delete) kills every generation. */
  private def killSet(d: DataFrame): DataFrame =
    broadcast(d.select(col("doc_id"),
        coalesce(col("gen"), lit(Long.MaxValue)).as("gen"))
      .groupBy("doc_id").agg(max("gen").as("_mgen")))

  /** BM25 top-k from the index alone. Reads: the stats MV (O(#logs)
    * rows), the delete markers (small, broadcast anti-join) if any, then
    * ONLY the query terms' bucket partitions. Formula and float-operation
    * order identical to [[Search.bm25TopK]], so results match a
    * freshly-built index over the surviving corpus bit-for-bit.
    *
    * SERVING-PATH latency shape: building the query is ZERO Spark jobs
    * (spec-pinned) — bucket routing is a driver-side hash
    * ([[bucketOfLocal]]), and every global the score needs (N, avgdl,
    * per-term document frequency) is a one-row aggregate broadcast-
    * cross-joined into the SAME DAG the caller's single action executes.
    * The old shape paid four sequential driver actions per query (stats
    * head, delete head, a one-row bucket job, a per-term df collect).
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
    // deleted docs leave the stats universe exactly (their dl was
    // recorded at delete time), keeping N/avgdl — and so every score —
    // identical to a rebuild without them
    val delDf: Option[DataFrame] = deletes match {
      // a deletes table whose only commits are watermark records (e.g.
      // syncFromFeed's `:init` pin before any marker) has no columns yet
      case None => None
      case Some(t) if !t.read(asOfTs).columns.contains("doc_id") => None
      case Some(t) =>
        Some(t.read(asOfTs).select(col("doc_id"), col("dl"),
            coalesce(col("gen"), lit(Long.MaxValue)).as("gen"))
          // idempotent re-marking pre-compaction; distinct gens of one
          // doc are distinct dead VERSIONS, each subtracts its own dl
          .dropDuplicates("doc_id", "gen"))
    }
    // corpus stats as a ONE-ROW frame instead of driver actions; the
    // arithmetic mirrors the old driver-side ops exactly (long
    // subtraction, then double division) so scores stay bit-identical
    val statsAgg = statsDf.agg(
      coalesce(sum("n_docs"), lit(0L)).cast("long").as("_sn"),
      coalesce(sum("sum_dl"), lit(0L)).cast("long").as("_sdl"))
    val corpus = delDf match {
      case None => statsAgg.select(col("_sn").as("_n"), col("_sdl").as("_tdl"))
      case Some(d) =>
        val da = d.agg(count(lit(1)).cast("long").as("_dn"),
          coalesce(sum("dl"), lit(0L)).cast("long").as("_ddl"))
        statsAgg.crossJoin(da).select(
          (col("_sn") - col("_dn")).as("_n"),
          (col("_sdl") - col("_ddl")).as("_tdl"))
    }
    // the terms' buckets, via the same hash the router used — driver-side
    val parts = terms.map(t => s"b=${bucketOfLocal(t, buckets)}").toSet
    val pruned0raw = index.readPartitions(parts, asOfTs)
      .where(col("term").isin(terms: _*))
    // postings written before the gen column existed read as null →
    // gen 0; the version-key dedup drops crash-replay duplicates that
    // compaction has not collapsed yet (K query terms' rows only —
    // never a corpus-scale dedup)
    val pruned0 = pruned0raw.withColumn("gen",
        if (pruned0raw.columns.contains("gen"))
          coalesce(col("gen"), lit(0L)) else lit(0L))
      .dropDuplicates("term", "doc_id", "gen")
    // a marker kills postings of the same doc with a STRICTLY smaller
    // gen: an updated document's fresh postings (gen = the update's
    // commit ts, equal to its marker's) survive their own marker
    val pruned = delDf.fold(pruned0) { d =>
      val mk = killSet(d)
      pruned0.join(mk,
        pruned0("doc_id") === mk("doc_id") && pruned0("gen") < mk("_mgen"),
        "left_anti")
    }
    val aggs = max(col("dl")).as("_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"_tf$i")
      }
    val perDoc = pruned.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    // per-term document frequency folds into the same DAG: a doc matched
    // term i iff its _tf{i} > 0, so df_i is a one-row aggregate of perDoc
    // (replaces the old per-term collect; a missing term sums to 0 like
    // the old map's getOrElse)
    val dfAggs = terms.indices.map(i =>
      coalesce(sum(when(col(s"_tf$i") > 0L, 1L).otherwise(0L)), lit(0L))
        .cast("double").as(s"_dfv$i"))
    val dfAgg = perDoc.agg(dfAggs.head, dfAggs.tail: _*)
    // one broadcast row: N, avgdl, df_0..df_{K-1}
    val globals = broadcast(corpus.crossJoin(dfAgg).select(
      col("_n").cast("double").as("_nd") +:
        (col("_tdl").cast("double") / col("_n").cast("double")).as("_avgdl") +:
        terms.indices.map(i => col(s"_dfv$i")): _*))
    val scored = perDoc.crossJoin(globals)
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val dfi = col(s"_dfv$i")
      val idf = log(lit(1.0) + (col("_nd") - dfi + lit(0.5)) / (dfi + lit(0.5)))
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    }.reduceLeft(_ + _)
    scored.select(col("doc_id"), score.as("_score"))
      .where(col("_score") > 0)
      .orderBy(col("_score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("_score"), 4).as("score"))
  }
}
