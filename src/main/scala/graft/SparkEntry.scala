package graft

import graft.functions.TextFunctions
import graft.ice.{IceTable, IceTableConfig}
import graft.operators.{Bpe, Classifier, Cluster, Decontam, Dedup, Dsir, IvfIndex, LangModel, Mixing, Multimodal, Packing, Resample, Search, SemDedup, Sessions, Shards, SigIndex, Similarity, Sketches, SpanDedup, TextIndex, UrlOps, Vocab}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one registered query per implemented operator from
  * SURVEY.md §2 (+ the LLM-pipeline operators), each with a DuckDB oracle
  * over the same testdata. Engine operators run through ice-backed fixture
  * tables ([[Fixtures]]) so the write → log → snapshot → read path is what
  * gets graded, not a raw parquet scan.
  *
  * Column-name and type discipline (the driver hash-compares values with
  * columns sorted by name): every aggregate is aliased identically on both
  * sides; money sums go through DECIMAL(18,2) so they are exact and
  * order-independent; temporal outputs are strings/dates (never raw
  * timestamps — events.ts is nanos and the tz-ness differs between
  * engines); every query has a total ORDER BY.
  */
object SparkEntry {

  /** Flagship on sf0.001: full engine lifecycle (insert → merge → snapshot
    * read → aggregate) over lineitem. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_entry").toString
    val table = new IceTable(spark, root, IceTableConfig(
      partitionExpr = concat(lit("m="), date_format(col("l_shipdate"), "yyyy-MM")),
      sortOrder = Seq("l_shipdate", "l_orderkey")))
    table.insert(li.where(col("l_orderkey") % 2 === 0))
    table.insert(li.where(col("l_orderkey") % 2 === 1))
    table.merge(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    table.read()
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private type Q = (SparkSession, String) => DataFrame

  // money sums aggregate in DECIMAL(18,2) (exact, summation-order-
  // independent) and surface as DOUBLE (both engines produce the identical
  // nearest-double of the exact decimal; parquet/pandas types then agree)
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // ---------------------------------------------------- planted-dup helpers
  //
  // The LSH-family operators (minhash/ngram/simhash/cosine near-dup) are
  // not SQL-oracle-expressible, so their graded artifacts used to be
  // rows-only dumps with zero verification signal. Instead, each query
  // plants 5 deterministic near-duplicates (id + PlantOffset, a content
  // mutation the operator must see through) and the graded result is the
  // CONSTANT planted-recovery count plus a bool_and over the operator's own
  // similarity guarantee — a self-verifying summary with a trivial oracle.

  private val PlantOffset = 1000000L

  /** The 5 planted sources: longish docs (stable shingle sets), lowest ids
    * — a deterministic total order, so the same docs plant at every run. */
  private def docsWithPlanted(
      s: SparkSession, d: String,
      mutate: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val all = Fixtures.raw(s, d, "documents")
    val base = all.select(col("doc_id"), col("text"))
    val planted = all.where(col("n_chars") >= 200)
      .orderBy(col("doc_id")).limit(5)
      .select((col("doc_id") + PlantOffset).as("doc_id"),
        mutate(col("text")).as("text"))
    base.unionByName(planted)
  }

  /** Constant-row summary over a near-dup pair list: how many of the 5
    * planted (source, source+offset) pairs were recovered, and does every
    * emitted pair honor the operator's similarity bound. */
  private def plantedSummary(
      pairs: DataFrame, pairOk: org.apache.spark.sql.Column): DataFrame =
    pairs.agg(
      sum(when(col("idB") === col("idA") + PlantOffset, 1L).otherwise(0L))
        .cast("bigint").as("planted_found"),
      bool_and(pairOk).as("all_pairs_valid"))

  /** Shared multimodal-dedup grading harness: fingerprint ONCE (the
    * decode is the expensive pass), pair via the banded hamming
    * machinery, then INDEPENDENTLY recompute each pair's hamming from the
    * cached fingerprints (bit_count over xor) — the graded bound must not
    * be the pairing code checking itself. Returns the plantedSummary ×
    * keep-set row. */
  private def fingerprintDedupSummary(
      all: DataFrame, fps0: DataFrame, fpCol: String): DataFrame = {
    val fps = fps0.where(col(fpCol).isNotNull)
      .select(col("media_id").as("_id"), col(fpCol).as("_sim")).localCheckpoint()
    val pairs = Dedup.hammingDupPairs64(fps, maxHamming = 0).localCheckpoint()
    val checked = pairs
      .join(fps.select(col("_id").as("idA"), col("_sim").as("_fa")), Seq("idA"))
      .join(fps.select(col("_id").as("idB"), col("_sim").as("_fb")), Seq("idB"))
      .withColumn("_rh", expr("bit_count(_fa ^ _fb)").cast("int"))
    val kept = Dedup.keepCanonical(all.select(col("media_id")), "media_id",
      pairs.select(col("idA"), col("idB"))).agg(count(lit(1)).as("kept"))
    plantedSummary(checked,
      col("_rh") === col("hamming") && col("_rh") <= 0).crossJoin(kept)
  }

  /** Corpus + queries for the ANN family (shared by all three variants). */
  private def annInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val emb = Fixtures.raw(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.where(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    (emb, queries)
  }

  /** Self-verifying harness for approximate ANN: join the approximate
    * top-10 against the exact brute-force top-10 IN-QUERY and grade
    * recall@10 >= 0.6 (the bound the test suite asserts) as a constant
    * row — the approximation quality itself becomes the graded artifact. */
  private def annRecall(
      s: SparkSession, d: String,
      approx: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val (emb, queries) = annInputs(s, d)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10, dim = 64)
      .select(col("qid"), col("id"), lit(1L).as("_bf"))
    approx(emb, queries)
      .select(col("qid"), col("id"))
      .join(bf, Seq("qid", "id"), "left")
      .agg(countDistinct(col("qid")).as("n_queries"),
        (sum(coalesce(col("_bf"), lit(0L))) >= lit(18L)).as("recall_ok"))
  }

  def queries: Map[String, Q] = Map(
    // ---------------------------------------------------- engine operators
    "a1_insert_count" -> ((s, d) => {
      Fixtures.eventsIce(s, d).table.read()
        .agg(count(lit(1)).as("cnt"))
    }),
    "a9_time_travel" -> ((s, d) => {
      val fx = Fixtures.eventsIce(s, d)
      fx.table.read(fx.betweenTs).agg(count(lit(1)).as("cnt"))
    }),
    "a10_merge_stability" -> ((s, d) => {
      Fixtures.eventsIce(s, d).table.read()
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    }),
    "a15_tombstone_cleanup" -> ((s, d) => {
      Fixtures.eventsCleaned(s, d).read()
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    }),
    "a31_checkpoint" -> ((s, d) => {
      // snapshot folds seed from the table's checkpoint (written mid-build,
      // refreshed by cleanup); the in-query contract column proves the
      // seeded fold is byte-equivalent to the raw whole-log fold
      val t = Fixtures.eventsCheckpointed(s, d)
      val seeded = t.snapshot()
      val rawFold = t.logio.readAtMaxTime(t.root, seeded.timestamp, useCheckpoints = false)
      val consistent =
        seeded.files.map(m => (m.path, m.tombstone)).toSet ==
          rawFold.files.map(m => (m.path, m.tombstone)).toSet &&
        seeded.schema.toJson == rawFold.schema.toJson &&
        t.logio.listCheckpoints(t.root).nonEmpty
      t.read().groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .withColumn("ckpt_consistent", lit(consistent))
        .orderBy(col("event_type"))
    }),
    "a16_remove_partitions" -> ((s, d) => {
      Fixtures.eventsRemoved(s, d).read().agg(count(lit(1)).as("cnt"))
    }),
    "a17_rewrite_partition" -> ((s, d) => {
      Fixtures.eventsRewritten(s, d).read().agg(count(lit(1)).as("cnt"))
    }),
    "a6_schema_evolution" -> ((s, d) => {
      val df = Fixtures.eventsEvolved(s, d).read()
      df.agg(count(lit(1)).as("cnt"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"))
    }),
    "a5_schema_introspect" -> ((s, d) => {
      // A5 schema introspection, oracle-graded: getSchema's type-string
      // map for the events batch (one row per column), with an in-query
      // proof that the LOG's accumulated union schema agrees — DuckDB
      // re-derives the same map from its own DESCRIBE of the identical
      // (ts-normalized) projection, since the log's type vocabulary IS
      // DuckDB's (reference: icedb/log.py:59-108)
      val t = Fixtures.eventsIce(s, d).table
      val preflight = t.getSchema(Fixtures.raw(s, d, "events")).pairs
      val accumulated = t.snapshot().schema.pairs
      import s.implicits._
      preflight.toDF("col_name", "col_type")
        .withColumn("accumulated_matches",
          lit(preflight.toSet == accumulated.toSet))
        .orderBy("col_name")
    }),
    "a36_upsert" -> ((s, d) => {
      // MERGE INTO (IceTable.upsert, replacing semantics): a slice
      // rewritten + brand-new keys appended in ONE commit; result ==
      // (base where key not in src) union src, replayed by DuckDB
      Fixtures.eventsUpserted(s, d).read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("event_id").cast("bigint").as("sum_id"))
        .orderBy(col("event_type"))
    }),
    "a35_row_update" -> ((s, d) => {
      // atomic CoW UPDATE + DELETE (IceTable.updateWhere/deleteWhere):
      // user_id%17==5 redacted, user_id%17==6 deleted; every surviving
      // value hash-checked against DuckDB replaying both mutations
      Fixtures.eventsMutated(s, d).read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("event_id").cast("bigint").as("sum_id"))
        .orderBy(col("event_type"))
    }),
    "a41_change_feed" -> ((s, d) => {
      // row-level change-data feed (ChangeFeed): the window spans an
      // append (inserts), a CoW UPDATE (delete+insert image pairs) and a
      // merge-on-read dv delete; DuckDB re-derives the exact multiset of
      // change images per type from the raw events
      val fx = Fixtures.eventsChangeFeed(s, d)
      graft.ice.ChangeFeed.between(fx.table, fx.sinceTs)
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("cnt"),
          sum("event_id").cast("bigint").as("sum_id"),
          countDistinct("event_type").as("types"))
        .orderBy(col("_change_type"))
    }),
    "a43_cdc_apply" -> ((s, d) => {
      // CDC consumer (CdcApply): a differently-partitioned replica is
      // initial-synced then caught up through the change feed across an
      // append, a CoW update, and a merge-on-read delete; the result is
      // the REPLICA's read, with an in-query proof it equals the source
      // bidirectionally — DuckDB re-derives the final state from events
      val fx = Fixtures.eventsCdcApply(s, d)
      val src = fx.source.read().localCheckpoint()
      // exceptAll is positional: align the replica to the source's
      // column order before diffing
      val tgt = fx.target.read().select(src.columns.map(col): _*)
        .localCheckpoint()
      val drift = src.exceptAll(tgt).count() + tgt.exceptAll(src).count()
      tgt.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum("event_id").cast("bigint").as("sum_id"))
        .withColumn("in_sync", lit(drift == 0L))
        .orderBy("event_type")
    }),
    "a44_wap_branch" -> ((s, d) => {
      // WAP branch: metadata-only fork → isolated insert + CoW delete on
      // the branch (main provably unchanged meanwhile — the carried
      // boolean) → ONE atomic fast-forward publish; DuckDB replays the
      // published state from the raw events
      val fx = Fixtures.wapBranch(s, d)
      fx.table.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .withColumn("main_isolated", lit(fx.isolated))
        .orderBy(col("event_type"))
    }),
    "a48_mv_incremental" -> ((s, d) => {
      // Incremental materialized view (MvSync): a count/sum/min/max
      // GROUP BY view maintained purely from the row-level change feed
      // across an append window, a CoW redaction update, and a
      // merge-on-read delete — the base is never re-aggregated
      // (retracted groups alone rescan). A final rebase collapses the
      // partial generations; the carried boolean proves the read is
      // identical before and after. DuckDB re-derives the aggregation
      // from the raw events.
      val fx = Fixtures.eventsMvSync(s, d)
      graft.operators.MvSync.read(fx.mv, fx.spec)
        .select(col("event_type"), col("cnt"),
          col("sum_user_id").cast("bigint").as("sum_user_id"),
          col("min_event_id"), col("max_event_id"))
        .withColumn("rebase_consistent", lit(fx.rebaseConsistent))
        .orderBy("event_type")
    }),
    "a49_stream_dedup" -> ((s, d) => {
      // Watermark-bounded streaming dedup: an at-least-once feed (a
      // third of the events redelivered) through format("ice") →
      // dropDuplicatesWithinWatermark → exactly-once ice sink. The
      // landed table must equal the ORIGINAL events; the boolean proves
      // duplicates were actually present and dropped.
      val fx = Fixtures.eventsStreamDedup(s, d)
      fx.target.read().agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("event_id")).as("uniq"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .withColumn("dups_dropped", lit(fx.dupsDropped))
    }),
    "a50_multi_table_txn" -> ((s, d) => {
      // Atomic multi-table commit (IceTransaction): the odd half of the
      // events lands in BOTH tables through one staged transaction —
      // invisible everywhere until the single marker PUT, all-at-once
      // after; an aborted transaction never surfaces. Both tables must
      // independently reconcile with the raw events.
      val fx = Fixtures.eventsTxn(s, d)
      val a = fx.t1.read().agg(count(lit(1)).as("cnt"),
        sum(col("event_id")).cast("bigint").as("sum_key"))
        .withColumn("src", lit("t1"))
      val b = fx.t2.read().agg(count(lit(1)).as("cnt"),
        sum(col("user_id")).cast("bigint").as("sum_key"))
        .withColumn("src", lit("t2"))
      a.unionByName(b).withColumn("atomic", lit(fx.atomic))
        .select("src", "cnt", "sum_key", "atomic").orderBy("src")
    }),
    "b56_sql_mv" -> ((s, d) => {
      // SQL materialized view: CREATE MATERIALIZED VIEW compiles the
      // GROUP BY into a persisted spec; one REFRESH follows an append, a
      // CoW redaction update, and a MoR delete incrementally; SELECT
      // resolves to the folded view (never the raw partials). DuckDB
      // re-derives the aggregation from the raw events.
      val fx = Fixtures.eventsSqlMv(s, d)
      // re-point the warehouse: a memo-hit fixture skips its conf-set,
      // and other SQL queries move WarehouseKey between runs
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey,
        new java.io.File(fx.mvRoot).getParent)
      s.sql(s"""SELECT event_type, cnt, CAST(sum_uid AS BIGINT) AS sum_uid,
          min_id, max_id, avg_uid FROM graft.`${fx.viewName}`""")
        .withColumn("dml_rejected", lit(fx.dmlRejected))
        .orderBy("event_type")
    }),
    "b58_mv_distinct" -> ((s, d) => {
      // count(DISTINCT) in a SQL materialized view, maintained as
      // mergeable HLL sketch state across insert / group-moving update /
      // MoR delete + an OPTIMIZE fold. Graded a27-style: the EXACT
      // distinct count (recomputed from the final base state) travels as
      // a column, the sketch estimate enters through the est_ok bound
      // (exact in the sparse regime, ±2% beyond); cnt must match
      // exactly. The boolean also pins that DuckDB view export REFUSES
      // (HLL binaries don't fold in foreign engines).
      val fx = Fixtures.eventsSqlMvDistinct(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      val mv = s.sql(
        s"SELECT event_type, cnt, uniq_users FROM graft.`${fx.viewName}`")
      val fin = Fixtures.raw(s, d, "events")
        .where(pmod(col("user_id"), lit(23)) =!= 8)
        .withColumn("event_type",
          when(pmod(col("user_id"), lit(23)) === 7, lit("redacted"))
            .otherwise(col("event_type")))
      val exact = fin.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("_exact"),
          count(lit(1)).as("_cnt"))
      mv.join(exact, Seq("event_type"))
        .select(col("event_type"),
          col("_exact").cast("bigint").as("exact_users"),
          col("cnt"),
          (abs(col("uniq_users") - col("_exact")) <= col("_exact") * 0.02)
            .as("est_ok"),
          (col("cnt") === col("_cnt")).as("cnt_ok"))
        .withColumn("export_refused", lit(fx.exportRefused))
        .orderBy("event_type")
    }),
    "b60_mv_where" -> ((s, d) => {
      // Filtered, expression-grouped SQL MV: WHERE follows UPDATE/DELETE
      // through the change feed (a redaction moves rows OUT of the
      // filter; their delete images retract, their insert images never
      // land) and pmod(user_id, 10) is a stored derived group key.
      // DuckDB re-derives the same filtered aggregation from raw events.
      val fx = Fixtures.eventsSqlMvWhere(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"""SELECT ub, cnt, CAST(sum_id AS BIGINT) AS sum_id, max_id
          FROM graft.`${fx.viewName}`""").orderBy("ub")
    }),
    "b61_mv_join" -> ((s, d) => {
      // Star-join SQL MV: fact deltas (append / group-moving update /
      // MoR delete) join the pinned dim incrementally — the refresh
      // emits window partials, never a reseed — while a DIM insert is
      // version-detected and reseeds, bringing previously-unmatched
      // 'redacted' rows in under their new category. DuckDB re-derives
      // the join aggregation from raw events + the same derived dim.
      val fx = Fixtures.eventsSqlMvJoin(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"""SELECT cat, cnt, CAST(sum_uid AS BIGINT) AS sum_uid, max_id
          FROM graft.`${fx.viewName}`""")
        .withColumn("fact_delta_incremental", lit(fx.factOnlyDelta))
        .orderBy("cat")
    }),
    "b68_mv_exact_distinct" -> ((s, d) => {
      // billing-grade EXACT count(distinct): per-(group, value) count
      // side state (retractable, exportable) vs DuckDB's own
      // count(DISTINCT) through insert + redaction update + MoR delete.
      // The boolean pins that the DuckDB export serves the exact
      // distinct via the side-fold CTE (the HLL spelling refuses).
      val fx = Fixtures.eventsSqlMvXd(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"SELECT event_type, cnt, users FROM graft.`${fx.viewName}`")
        .withColumn("export_serves_exact", lit(fx.exportOk))
        .orderBy("event_type")
    }),
    "b67_mv_left_join" -> ((s, d) => {
      // LEFT-JOIN star view: facts with no dim row null-extend into a
      // '(none)' group (inner would drop them) and MOVE into 'R' when
      // the dim row arrives — maintained incrementally through insert,
      // redaction update, MoR delete, and the dim arrival; DuckDB
      // re-derives the final state with the same LEFT JOIN. The null
      // group key is surfaced as '(none)' on both sides so row order
      // and hashing never depend on engine null-sort defaults.
      val fx = Fixtures.eventsSqlMvLeftJoin(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"""SELECT coalesce(cat, '(none)') AS cat, cnt,
          CAST(sum_uid AS BIGINT) AS sum_uid, max_id
          FROM graft.`${fx.viewName}`""")
        .withColumn("fact_delta_incremental", lit(fx.factOnlyDelta))
        .orderBy("cat")
    }),
    "b66_drop_partitions" -> ((s, d) => {
      // Log-only SQL retention (A16's SQL spelling): ALTER TABLE … DROP
      // PARTITIONS WHERE drops week one, a whole-partition DELETE
      // auto-routes day 8 through the same metadata-only path; the
      // boolean pins that ZERO physical data files were read, written,
      // or deleted (byte-identical `_data` listing) and the DELETE's
      // reported row count was exact. DuckDB re-derives the survivors.
      val fx = Fixtures.eventsSqlDropped(s, d)
      fx.table.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("log_only", lit(fx.logOnly))
        .orderBy(col("event_type"))
    }),
    "b65_mv_join_manifest" -> ((s, d) => {
      // A STAR-JOIN view's foreign-engine path: join-view partials are
      // MATERIALIZED (the dim-sourced group column is a stored column),
      // so the manifest's fold SQL serves the folded state from the bare
      // file list with no dim data and no join at all. Graded like
      // b57: replay the fold over exactly the manifest's files, compare
      // against DuckDB's re-derivation from raw events + derived dim;
      // the boolean pins the exported SQL's shape (fold CTEs present,
      // the dim-sourced group key quoted DuckDB-style, no backticks).
      import graft.ice.{IceTable, ManifestExport}
      import graft.operators.MvSync
      val fx = Fixtures.eventsSqlMvJoin(s, d)
      val mv = IceTable.open(s, s"${fx.whDir}/${fx.viewName}")
      val dest = s"${mv.root}/_export/manifest.json"
      ManifestExport.writeManifest(mv, dest)
      val sql = ManifestExport.writeDuckDbView(
        mv, s"${mv.root}/_export/view.sql", "mv_join_view")
      val (_, files, dels) = ManifestExport.readManifest(mv, dest)
      val vd = MvSync.MvViewDef.decode(mv.cfg.mvDef.get)
      val aliveAbs = mv.snapshot().aliveFiles
        .map(m => s"${mv.qualifiedRoot}/${m.path}").toSet
      val sqlOk = files.toSet == aliveAbs && dels.isEmpty &&
        sql.contains("_rgen") && sql.contains("\"cat\"") &&
        !sql.contains("`")
      val folded = MvSync.projectView(MvSync.foldPartials(
        s.read.schema(mv.snapshot().schema.toStructType).parquet(files: _*),
        vd.spec), vd)
      folded.select(col("cat"), col("cnt"),
          col("sum_uid").cast("bigint").as("sum_uid"), col("max_id"))
        .withColumn("fold_sql_exported", lit(sqlOk))
        .orderBy("cat")
    }),
    "b62_mv_global" -> ((s, d) => {
      // GLOBAL (no GROUP BY) SQL materialized view — the dashboard
      // count shape — maintained under a synthetic constant key through
      // append + CoW update + MoR delete (the delete resets the one
      // global group). The boolean pins the empty edge: a fully-deleted
      // base reads ONE row with cnt 0, never no-rows. DuckDB re-derives
      // the global aggregates from the raw events.
      val fx = Fixtures.eventsSqlMvGlobal(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"""SELECT cnt, CAST(sum_uid AS BIGINT) AS sum_uid, min_id,
          max_id, avg_uid FROM graft.`${fx.viewName}`""")
        .withColumn("empty_reads_zero", lit(fx.emptyReadsZero))
    }),
    "b63_mv_multidim" -> ((s, d) => {
      // Multi-dimension star SQL MV: fact ⋈ d1 ⋈ d2 with each dim
      // pinned + versioned independently. Fact-only windows are true
      // IVM (partials, zero resets); a SINGLE dim move resets only the
      // affected groups (resets < live groups — both pinned as
      // booleans); both dims moving at once falls back to the atomic
      // reseed. DuckDB re-derives the join aggregation with the same
      // deterministic dim moves (min/max event types recategorized).
      val fx = Fixtures.eventsSqlMvMultiDim(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"""SELECT cat, tier, cnt, CAST(sum_uid AS BIGINT) AS sum_uid,
          max_id FROM graft.`${fx.viewName}`""")
        .withColumn("fact_delta_incremental", lit(fx.factOnlyDelta))
        .withColumn("dim_move_partial", lit(fx.dimMovePartial))
        .orderBy("cat", "tier")
    }),
    "b64_mv_having" -> ((s, d) => {
      // HAVING in a SQL MV definition: compiles to a read-side filter
      // over the folded view (maintenance unchanged) — groups under the
      // 10%-of-rows threshold (the 'redacted' slice) are filtered at
      // read. DuckDB re-derives with the same derivable threshold.
      val fx = Fixtures.eventsSqlMvHaving(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      s.sql(s"""SELECT event_type, cnt, CAST(sum_uid AS BIGINT) AS sum_uid
          FROM graft.`${fx.viewName}`""").orderBy("event_type")
    }),
    "b59_sql_txn" -> ((s, d) => {
      // SQL multi-table transaction: BEGIN TRANSACTION; INSERT INTO raw;
      // INSERT INTO agg; COMMIT — the reference's MV double-write done
      // atomically (one marker PUT flips both tables); ROLLBACK and
      // mid-block failures surface nothing. Both tables must reconcile
      // with the raw events; the boolean pins the rollback/failure paths.
      val fx = Fixtures.eventsSqlTxn(s, d)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, fx.whDir)
      val agg = s.sql("""SELECT 'agg' AS src, CAST(sum(cnt) AS BIGINT) AS cnt,
        CAST(sum(sum_uid) AS BIGINT) AS sum_key FROM graft.txa""")
      val rawT = s.sql("""SELECT 'raw' AS src, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_key FROM graft.txr""")
      agg.unionByName(rawT).withColumn("atomic", lit(fx.atomic))
        .orderBy("src")
    }),
    "b57_mv_manifest" -> ((s, d) => {
      // The MV's foreign-engine path: the exported manifest + generated
      // DuckDB SQL expose the FOLDED view (newest-reset-wins + the
      // definition's projection), never the raw delta partials. Graded
      // by reading the view back from the manifest's bare FILE LIST
      // alone — no log fold — through the same fold algebra; the result
      // must equal DuckDB's re-derivation from the raw events, and the
      // boolean pins the exported SQL's fold shape + exact file set.
      import graft.ice.{IceTable, ManifestExport}
      import graft.operators.MvSync
      val fx = Fixtures.eventsSqlMv(s, d)
      val mv = IceTable.open(s, fx.mvRoot)
      val dest = s"${mv.root}/_export/manifest.json"
      ManifestExport.writeManifest(mv, dest)
      val sql = ManifestExport.writeDuckDbView(
        mv, s"${mv.root}/_export/view.sql", "mv_view")
      val (_, files, dels) = ManifestExport.readManifest(mv, dest)
      val vd = MvSync.MvViewDef.decode(mv.cfg.mvDef.get)
      val aliveAbs = mv.snapshot().aliveFiles
        .map(m => s"${mv.qualifiedRoot}/${m.path}").toSet
      val sqlOk = files.toSet == aliveAbs && dels.isEmpty &&
        sql.contains("_rgen") && sql.contains("HAVING sum(cnt) > 0") &&
        sql.contains("read_parquet")
      val folded = MvSync.projectView(MvSync.foldPartials(
        s.read.schema(mv.snapshot().schema.toStructType).parquet(files: _*),
        vd.spec), vd)
      folded.select(col("event_type"), col("cnt"),
          col("sum_uid").cast("bigint").as("sum_uid"),
          col("min_id"), col("max_id"), col("avg_uid"))
        .withColumn("fold_sql_exported", lit(sqlOk))
        .orderBy("event_type")
    }),
    "b55_check_constraint" -> ((s, d) => {
      // CHECK constraints: declared at create + added via ALTER (with
      // existing-row validation), persisted in the log, enforced on a
      // REOPENED handle's insert AND update — both violations rejected
      // with zero files written, so the aggregates equal the raw events
      val fx = Fixtures.eventsConstrained(s, d)
      fx.table.read().agg(
          count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"),
          count(when(col("event_type").isNull, 1)).as("null_types"))
        .withColumn("rejected_cleanly", lit(fx.rejectedCleanly))
        .withColumn("sql_altered", lit(fx.sqlAltered))
    }),
    "b41_sql_show_create" -> ((s, d) => {
      // SHOW CREATE TABLE: the persisted config rendered as ONE
      // round-trippable statement — executing it under a new name
      // reproduces the partition routing and sort config exactly
      val t = Fixtures.eventsSqlCtas(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val stmt = s.sql(s"SHOW CREATE TABLE graft.`${f.getName}`")
        .head.getString(0)
      val clone = s"${f.getName}_sc"
      s.sql(s"DROP TABLE IF EXISTS graft.`$clone`").collect()
      s.sql(stmt.replace(s"graft.`${f.getName}`", s"graft.`$clone`")).collect()
      val t2 = graft.ice.IceTable.open(s, s"${f.getParent}/$clone")
      val sameCfg =
        t2.snapshot().tableConfig.flatMap(_.get("prt")) ==
          t.snapshot().tableConfig.flatMap(_.get("prt")) &&
        t2.snapshot().tableConfig.flatMap(_.get("srt")).map(_.toString) ==
          t.snapshot().tableConfig.flatMap(_.get("srt")).map(_.toString)
      import s.implicits._
      Seq((
        stmt.contains("PARTITIONED BY ("),
        stmt.contains("SORTED BY (`event_id`)"),
        sameCfg,
        stmt.linesIterator.next.count(_ == '`') / 2 - 1 // schema col count
      )).toDF("has_partition", "has_sort", "roundtrip_ok", "n_cols")
        .withColumn("n_cols", col("n_cols").cast("bigint"))
    }),
    "b42_meta_partitions" -> ((s, d) => {
      // Iceberg-style metadata relation as a TVF. Graded by AGREEMENT
      // WITH THE DATA: per-partition physical row counts come from
      // parquet FOOTERS only (no data pages), yet must hash-match
      // DuckDB's group-by over the rows themselves
      val t = Fixtures.lineitemIce(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT partition, row_count
        FROM table_partitions('${f.getName}') ORDER BY partition""")
    }),
    "b43_meta_files" -> ((s, d) => {
      // the files metadata relation: footer row counts and log-marker
      // partitions must reconcile EXACTLY with the table's content
      val t = Fixtures.lineitemIce(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT CAST(sum(row_count) AS BIGINT) AS total_rows,
          count(DISTINCT partition) AS n_parts,
          CAST(min(row_count) > 0 AS BOOLEAN) AS all_nonempty
        FROM table_files('${f.getName}')""")
    }),
    "b44_bucket_join" -> ((s, d) => {
      // CO-LOCATED fact-to-fact join: both tables bucketed on the order
      // key (IceTableConfig.bucketBy → BucketSpec on the relation), so
      // the join plans with ZERO shuffle exchanges — only bucket-aligned
      // local sorts. The exchange-free plan itself is asserted in
      // BucketedTableSpec/PlanAuditSpec and dumped in PLANS.md
      val (ot, lt) = Fixtures.bucketedPair(s, d)
      val o = graft.plans.IceFileIndex.dataFrame(s, ot)
      val l = graft.plans.IceFileIndex.dataFrame(s, lt)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    }),
    "b45_analyze" -> ((s, d) => {
      // ANALYZE TABLE → persisted column statistics, read back through
      // the table_stats TVF: EXACT ndv/null/min/max must hash-match
      // DuckDB computing the same over the raw rows (production default
      // is the one-pass HLL++ ndv — the 100 TB path; EXACT grades it)
      val t = Fixtures.lineitemIce(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"ANALYZE TABLE graft.`${f.getName}` COMPUTE STATISTICS " +
        "FOR COLUMNS l_orderkey, l_returnflag EXACT").collect()
      s.sql(s"""SELECT column, ndv, null_count, min, max, row_count
        FROM table_stats('${f.getName}') ORDER BY column""")
    }),
    "a45_s3_proxy" -> ((s, d) => {
      // the reference's s3-proxy surface (README.md:29-31) end-to-end: the
      // graded frame is read DIRECTLY off the live proxy endpoint through
      // a client speaking only the S3 REST protocol (s3g:// — paged
      // delimiter LIST + HEAD + ranged GET; GraftS3FileSystem), so
      // Spark's own parquet reader is the foreign engine and every graded
      // byte crossed the wire at query time. DuckDB replays the content
      // from the raw source. bytes_identical pins byte-exact transfer
      // (plain GETs vs source files), paged_ok that a raw max-keys=2
      // LIST walk equals the snapshot manifest.
      val fx = Fixtures.s3Proxy(s, d)
      s.read.parquet(fx.dataUri)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .withColumn("bytes_identical", lit(fx.bytesIdentical))
        .withColumn("paged_ok", lit(fx.pagedOk))
        .orderBy(col("event_type"))
    }),
    "a46_s3_retry" -> ((s, d) => {
      // A19, the reference's S3 retry contract (icedb/s3.py Retry(3)),
      // graded END-TO-END: the proxy truncates every 2nd data GET
      // mid-body (3 injections, below the client's 4-attempt budget) and
      // the s3g client's idempotent retries must still deliver the exact
      // rows. retries_exercised pins that truncations really happened AND
      // a full probe read counted every inserted row through them; the
      // aggregate itself re-reads the flaky endpoint live, so a broken
      // retry path fails the dump outright. DuckDB replays from the raw
      // source.
      val fx = Fixtures.s3Retry(s, d)
      s.read.parquet(fx.dataUri)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .withColumn("retries_exercised", lit(fx.retriesExercised))
        .orderBy(col("event_type"))
    }),
    "b46_sql_branch_dml" -> ((s, d) => {
      // the WAP loop end-to-end in SQL: CREATE BRANCH, then INSERT /
      // UPDATE / DELETE / MERGE against graft.`t@wap`, hash-matched
      // against the API-path twin, published fast-forward, time travel
      // still sees the pre-publish main. DuckDB replays the final state
      // from the raw events; the booleans pin the SQL≡API equivalence,
      // isolation, and the time-travel read.
      val fx = Fixtures.sqlBranchDml(s, d)
      fx.table.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .withColumn("sql_api_match", lit(fx.apiMatch))
        .withColumn("branch_isolated", lit(fx.branchIsolated))
        .withColumn("time_travel_ok", lit(fx.timeTravelOk))
        .orderBy(col("event_type"))
    }),
    "b47_cbo_join" -> ((s, d) => {
      // CBO planning from PERSISTED statistics: the ANALYZE'd orders
      // fixture's catalog relation carries rowCount/ndv/min-max
      // (StatsBridge), so under spark.sql.cbo.enabled the filtered
      // dimension estimates at rows/ndv(o_custkey) ≈ a handful of rows —
      // far below its file-size estimate — and a threshold between the
      // two plans the join as BroadcastHashJoin; with CBO off the same
      // shape sort-merges. Both plans are probed pre-AQE so the flip is
      // purely the optimizer reading persisted stats, never runtime
      // sizes. The booleans pin the flip; the aggregate grades the data.
      // At 100 TB this is ANALYZE'd dimensions broadcasting without hints.
      val ot = Fixtures.cboOrders(s, d)
      val lt = Fixtures.lineitemIce(s, d)
      def shape(): org.apache.spark.sql.DataFrame =
        graft.plans.IceFileIndex.dataFrame(s, lt)
          .join(graft.plans.IceFileIndex.dataFrame(s, ot)
            .where(col("o_custkey") === 7L),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"),
            dec(sum(dec(col("l_quantity")))).cast("double").as("qty"))
          .orderBy(col("o_orderstatus"))
      def withCbo[T](cbo: Boolean, threshold: String)(body: => T): T = {
        val savedCbo = s.conf.get("spark.sql.cbo.enabled", "false")
        val savedTh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.cbo.enabled", cbo.toString)
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        try body
        finally {
          s.conf.set("spark.sql.cbo.enabled", savedCbo)
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", savedTh)
        }
      }
      // SELF-CALIBRATING threshold: the optimizer's own size estimate of
      // the join's dim subtree under each mode (column-pruned file bytes
      // without CBO, rows/ndv with), with the probe threshold placed
      // between them — robust at any scale factor and parquet layout
      def dimEstimate(cbo: Boolean): BigInt =
        withCbo(cbo, "-1") {
          graft.plans.IceFileIndex.dataFrame(s, ot)
            .where(col("o_custkey") === 7L)
            .select(col("o_orderkey"), col("o_orderstatus"))
            .queryExecution.optimizedPlan.stats.sizeInBytes
        }
      val eOn = dimEstimate(cbo = true)
      val eOff = dimEstimate(cbo = false)
      val threshold = ((eOn + eOff) / 2).toString
      // node-typed probe, not a string match (long plan strings truncate)
      def joinKinds(cbo: Boolean): Set[String] =
        withCbo(cbo, threshold) {
          shape().queryExecution.sparkPlan.collect {
            case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
              "broadcast"
            case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
              "sortmerge"
          }.toSet
        }
      // the stats must actually separate the estimates, and the SAME
      // threshold must then split the plans — the flip is purely the
      // optimizer reading persisted statistics
      val cboBroadcast = eOn * 4 <= eOff && joinKinds(cbo = true)("broadcast")
      val nocboSmj = joinKinds(cbo = false)("sortmerge")
      shape()
        .withColumn("cbo_broadcast", lit(cboBroadcast))
        .withColumn("nocbo_smj", lit(nocboSmj))
    }),
    "b48_cbo_reorder" -> ((s, d) => {
      // CBO phase 2 — join REORDER from persisted statistics: a 3-table
      // join written in the worst syntactic order (fact ⋈ fact-sized
      // orders first, selective customer last). JoinReorderDP only fires
      // when EVERY leaf carries a rowCount, all from our ANALYZE
      // persistence — with it, ndv(c_nationkey)≈25 estimates the filtered
      // customer at ~1/25 of its rows, so the cheapest tree joins
      // orders⋈customer first and the big lineitem side last. The probe
      // is node-typed leaf ORDER in the optimized logical plan (CBO off
      // keeps the syntactic order; on, it must differ). At 100 TB this is
      // ANALYZE'd dimensions re-rooting a star join without rewrites.
      val (ct, ot, lt) = Fixtures.cboTriple(s, d)
      def shape(): org.apache.spark.sql.DataFrame =
        graft.plans.IceFileIndex.dataFrame(s, lt)
          .join(graft.plans.IceFileIndex.dataFrame(s, ot),
            col("l_orderkey") === col("o_orderkey"))
          .join(graft.plans.IceFileIndex.dataFrame(s, ct)
            .where(col("c_nationkey") === 3),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"),
            dec(sum(dec(col("l_quantity")))).cast("double").as("qty"))
          .orderBy(col("c_mktsegment"))
      def withReorder[T](on: Boolean)(body: => T): T = {
        val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
          .map(k => k -> s.conf.get(k, "false"))
        saved.foreach { case (k, _) => s.conf.set(k, on.toString) }
        try body finally saved.foreach { case (k, v) => s.conf.set(k, v) }
      }
      def leaves(on: Boolean): Seq[String] = withReorder(on) {
        org.apache.spark.sql.graft.StatsBridge.leafTables(shape())
      }
      val off = leaves(on = false)
      val on = leaves(on = true)
      // CBO off must preserve the syntactic order (lineitem first,
      // customer last); on must produce a genuinely different tree
      val reordered = off.size == 3 && on.size == 3 && off != on &&
        off.head.startsWith("graft_cbo_li") && off.last.startsWith("graft_cbo_cust")
      shape().withColumn("reordered", lit(reordered))
    }),
    "b53_meta_count" -> ((s, d) => {
      // metadata-only count(*): every written file's physical row count
      // rides its log marker (`rc`, from the footer at write time), so a
      // groupless filterless count answers from the snapshot fold alone —
      // planned as a LocalRelation, ZERO data-file I/O, zero tasks. At
      // 100 TB this is the difference between a full-corpus scan and a
      // KB-scale metadata fold. The booleans pin BOTH directions: the
      // bare count really is metadata-only, and a filtered count still
      // scans (Filter blocks the rewrite — correctness over speed).
      val t = Fixtures.lineitemIce(s, d)
      val base = graft.plans.IceFileIndex.dataFrame(s, t)
      val cnt = base.agg(count(lit(1)).as("cnt"))
      def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
      val metaOnly = isLocal(cnt)
      val filteredScans = !isLocal(
        base.where(col("l_quantity") > 25).agg(count(lit(1)).as("cnt")))
      cnt.withColumn("metadata_only", lit(metaOnly))
        .withColumn("filtered_scans", lit(filteredScans))
    }),
    "b54_meta_minmax" -> ((s, d) => {
      // metadata-only min/max: with per-file footer stats in the log
      // markers (statsColumns), groupless min/max over exact-numeric
      // covered columns folds to a LocalRelation alongside count(*) —
      // the `max(event_time)` freshness probe at 100 TB costs one
      // KB-scale metadata fold, zero data I/O. Filters / uncovered
      // columns / dv overlays fall back to a scan by plan shape.
      val t = Fixtures.metaStatsEvents(s, d)
      val base = graft.plans.IceFileIndex.dataFrame(s, t)
      // no cast around the aggregates: a Cast-wrapped Max is not the
      // bare metadata shape and would (correctly) block the rewrite
      val aggd = base.agg(count(lit(1)).as("cnt"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        max(col("value")).as("max_val"))
      val metaOnly = aggd.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
      // an UNCOVERED column (user_id has no stats) must scan
      val uncoveredScans = !base.agg(max(col("user_id")))
        .queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
      aggd.withColumn("metadata_only", lit(metaOnly))
        .withColumn("uncovered_scans", lit(uncoveredScans))
    }),
    "b51_skew_join" -> ((s, d) => {
      // skew-salted join (Skew.saltedJoin): 90% of rows share one hot key
      // — the classic power-law shape that stalls a plain shuffle join on
      // one straggler task at cluster scale. Salting spreads the hot key
      // over 8 buckets (the dim side replicates 8×); the result must
      // hash-match the UNSALTED join DuckDB computes, proving the rewrite
      // is semantics-preserving, not just faster.
      val ev = Fixtures.raw(s, d, "events")
        .select(col("event_id"), col("user_id"))
        .withColumn("k",
          when(pmod(col("user_id"), lit(100)) < 90, lit(0L))
            .otherwise(pmod(col("user_id"), lit(100))))
      val dim = ev.select(col("k")).distinct()
        .withColumn("label", col("k") * 7)
      graft.operators.Skew.saltedJoin(ev, dim, Seq("k"), buckets = 8)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .orderBy(col("label"))
    }),
    "b52_runtime_filter" -> ((s, d) => {
      // runtime BLOOM-FILTER pushdown (InjectRuntimeFilter): a selective
      // dimension filter materializes a bloom filter over the join keys
      // and applies it MAP-SIDE on the fact scan before the shuffle — at
      // 100 TB this drops the shuffled fact volume to the matching keys'
      // fraction without bucketing or DPP. Broadcast is disabled so the
      // join shuffles (the case runtime filters exist for); the boolean
      // pins a node-typed BloomFilterMightContain in the executed plan.
      val lt = Fixtures.lineitemIce(s, d)
      val ot = Fixtures.cboOrders(s, d)
      def shape(): org.apache.spark.sql.DataFrame =
        graft.plans.IceFileIndex.dataFrame(s, lt)
          .join(graft.plans.IceFileIndex.dataFrame(s, ot)
            .where(col("o_custkey") === 7L),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity")).cast("bigint").as("sum_qty"))
          .orderBy(col("o_orderstatus"))
      val keys = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      s.conf.set(keys(0), "true")
      s.conf.set(keys(1), "0")
      s.conf.set(keys(2), "-1")
      try {
        // probe AND execute inside the conf window: a lazily-returned
        // frame would re-plan after the finally restores the session
        // confs, and the boolean would attest a plan that never ran
        val df = shape()
        val injected = df.queryExecution.sparkPlan.flatMap(_.expressions)
          .exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]))
        val rows = df.withColumn("bloom_injected", lit(injected)).collect()
        val schema = df.schema.add("bloom_injected",
          org.apache.spark.sql.types.BooleanType, nullable = false)
        s.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema)
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),
    "b50_cbo_histogram" -> ((s, d) => {
      // CBO phase 3 — EQUI-HEIGHT HISTOGRAMS from persisted ANALYZE: on
      // the right-skewed `value` column (p50 ≈ 35, max ≈ 490), a range
      // filter's uniform min/max interpolation under-estimates `value <=
      // 100` at ~20% where the truth is ~87%; re-analyzing WITH HISTOGRAM
      // (the SQL spelling, through the parser) must pull the optimizer's
      // rowCount estimate within 2× of truth while the uniform estimate
      // stays off by >50%. At 100 TB this is the difference between
      // broadcasting a "small" filtered side that is actually 4× larger
      // and planning from the data's real shape.
      val t = Fixtures.cboEvents(s, d)
      def estimate(): BigInt = {
        val saved = s.conf.get("spark.sql.cbo.enabled", "false")
        s.conf.set("spark.sql.cbo.enabled", "true")
        try graft.plans.IceFileIndex.dataFrame(s, t)
          .where(col("value") <= 100.0)
          .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
        finally s.conf.set("spark.sql.cbo.enabled", saved)
      }
      graft.ice.TableStats.analyze(t, Seq("event_id", "value"))
      val uniformEst = estimate()
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"ANALYZE TABLE graft.`${f.getName}` COMPUTE STATISTICS " +
        "FOR COLUMNS event_id, value WITH HISTOGRAM").collect()
      val histEst = estimate()
      val filtered = graft.plans.IceFileIndex.dataFrame(s, t)
        .where(col("value") <= 100.0)
      val trueN = BigInt(filtered.count())
      val histCloser = (histEst - trueN).abs < (uniformEst - trueN).abs
      val histTight = histEst * 2 >= trueN && histEst <= trueN * 2
      val uniformLoose = (uniformEst - trueN).abs * 2 > trueN
      filtered.agg(count(lit(1)).as("cnt"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
        .withColumn("hist_closer", lit(histCloser))
        .withColumn("hist_tight", lit(histTight))
        .withColumn("uniform_loose", lit(uniformLoose))
    }),
    "b49_sql_branch_travel" -> ((s, d) => {
      // WAP validation in pure SQL, read side: the branch spelling now
      // composes with TIMESTAMP AS OF and table_changes(), so a writer
      // can diff and audit its branch window without the API. The
      // booleans pin SQL ≡ API for both (and that the travel genuinely
      // narrowed past the second mutation); the aggregate grades the
      // branch head, which DuckDB replays from the raw events.
      val fx = Fixtures.sqlBranchTravel(s, d)
      val f = new java.io.File(fx.table.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
          CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}@wap`
        GROUP BY event_type ORDER BY event_type""")
        .withColumn("travel_ok", lit(fx.travelOk))
        .withColumn("changes_ok", lit(fx.changesOk))
    }),
    "b40_sql_changes" -> ((s, d) => {
      // SQL spelling of the change feed: the Delta-CDF-shaped
      // table_changes('t', since) TVF resolves through IceSqlResolution
      // to ChangeFeed.between's (since, until] window — same change
      // multiset as a41, reached purely from SQL
      val fx = Fixtures.eventsChangeFeed(s, d)
      val f = new java.io.File(fx.table.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT _change_type, count(*) AS cnt,
          CAST(sum(event_id) AS BIGINT) AS sum_id,
          count(DISTINCT event_type) AS types
        FROM table_changes('${f.getName}', ${fx.sinceTs})
        GROUP BY _change_type ORDER BY _change_type""")
    }),
    "a40_manifest_export" -> ((s, d) => {
      // foreign-engine manifest (ManifestExport): the snapshot's alive
      // files + schema + dv files exported as static JSON (plus a
      // DuckDB view definition) — here the table is read back THROUGH
      // the manifest alone (no log fold), and the contract column pins
      // the manifest's file set to the snapshot's exact alive set
      import graft.ice.ManifestExport
      val t = Fixtures.eventsIce(s, d).table
      val dest = s"${t.root}/_export/manifest.json"
      ManifestExport.writeManifest(t, dest)
      val sql = ManifestExport.writeDuckDbView(
        t, s"${t.root}/_export/view.sql", "events_view")
      val (_, files, dels) = ManifestExport.readManifest(t, dest)
      val aliveAbs = t.snapshot().aliveFiles
        .map(m => s"${t.qualifiedRoot}/${m.path}").toSet
      val exact = files.toSet == aliveAbs && dels.isEmpty &&
        sql.contains("read_parquet") && sql.contains("union_by_name")
      s.read.schema(t.snapshot().schema.toStructType).parquet(files: _*)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("user_id").cast("bigint").as("sum_uid"))
        .withColumn("manifest_exact", lit(exact))
        .orderBy(col("event_type"))
    }),
    "a38_format_row" -> ((s, d) => {
      // A23 formatRow hook, oracle-graded: a whole-DataFrame pre-insert
      // transform (reference format_row, examples/api-flask.py:156-162)
      // normalizes event_type and derives a tag column BEFORE partition
      // routing; DuckDB re-derives both from the raw events
      val ev = Fixtures.raw(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val t = new graft.ice.IceTable(s, Fixtures.newRoot("a38fmt"),
        graft.ice.IceTableConfig(
          partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
          sortOrder = Seq("event_id"),
          formatRow = Some(df => df
            .withColumn("event_type", upper(col("event_type")))
            .withColumn("etype_tag",
              concat(lit("t_"), lower(col("event_type")))))))
      t.insert(ev)
      t.read().groupBy(col("event_type"), col("etype_tag"))
        .agg(count(lit(1)).as("cnt"),
          sum("event_id").cast("bigint").as("sum_id"))
        .orderBy(col("event_type"))
    }),
    "a39_schema_validation" -> ((s, d) => {
      // A20 pre-flight schema validation, oracle-graded: a second insert
      // whose event_id type conflicts (VARCHAR vs BIGINT) must throw
      // BEFORE writing anything (reference SchemaConflictException,
      // icedb/log.py:68-78); the table keeps exactly the first batch and
      // the contract column proves rejection left no trace
      val ev = Fixtures.raw(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val t = new graft.ice.IceTable(s, Fixtures.newRoot("a39val"),
        graft.ice.IceTableConfig(
          partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
          sortOrder = Seq("event_id")))
      t.insert(ev)
      val filesBefore = t.snapshot().aliveFiles.map(_.path).toSet
      val logsBefore = t.logio.currentLogFiles(t.root).length
      val rejected =
        try { t.insert(ev.withColumn("event_id", col("event_id").cast("string"))); false }
        catch { case _: graft.ice.SchemaConflictException => true }
      val untouched =
        t.snapshot().aliveFiles.map(_.path).toSet == filesBefore &&
          t.logio.currentLogFiles(t.root).length == logsBefore
      t.read().agg(count(lit(1)).as("cnt"),
          sum("event_id").cast("bigint").as("sum_id"))
        .withColumn("rejected_cleanly", lit(rejected && untouched))
    }),
    "a37_dv_visibility" -> ((s, d) => {
      // dv coherence (round 8): rows deleted by ONE dv commit and never
      // materialized are invisible through EVERY read surface —
      // table.read(), DeleteVectors.read, SELECT FROM graft.<t>, and
      // format("ice") — hash-matched against DuckDB's filtered answer.
      // The contract columns prove the dv table still holds live marks
      // (no materialize happened) and that all four surfaces agreed.
      import graft.ice.DeleteVectors
      val t = Fixtures.eventsDvVis(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      def tot(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum("user_id")).head
        (r.getLong(0), r.getLong(1))
      }
      val native = tot(t.read())
      val mor = tot(DeleteVectors.read(t))
      val sqlR = s.sql(
        s"SELECT count(*) c, sum(user_id) u FROM graft.`${f.getName}`").head
      val viaSql = (sqlR.getLong(0), sqlR.getLong(1))
      val viaFormat = tot(s.read.format("ice").option("path", t.root).load())
      val dvAlive = DeleteVectors.dvTable(t).read().count() > 0
      val agree = native == mor && native == viaSql && native == viaFormat
      t.read().groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("user_id").cast("bigint").as("sum_uid"))
        .withColumn("surfaces_agree", lit(agree && dvAlive))
        .orderBy(col("event_type"))
    }),
    "b33_sql_insert" -> ((s, d) => {
      // `INSERT INTO graft.<t> SELECT ...` (IceInsertCommand): the SQL
      // half must be indistinguishable from the API half — same routing,
      // same sort, one atomic commit — and the whole table hash-matches
      // DuckDB over the raw events
      val t = Fixtures.eventsSqlInserted(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "b32_sql_merge" -> ((s, d) => {
      // SQL MERGE INTO through the catalog (IceMergeCommand → upsert):
      // matched keys replaced, unmatched appended, one atomic commit;
      // DuckDB replays the post-state (same shape as a36, via SQL)
      val t = Fixtures.eventsSqlMerged(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "a34_row_deletes" -> ((s, d) => {
      // merge-on-read position deletes (DeleteVectors): rows of user_id%10
      // == 3 marked via one dv commit, excluded at read with zero data
      // rewrite; the contract column proves materialize (copy-on-write of
      // ONLY affected files) + vacuum then yield the identical answer
      import graft.ice.DeleteVectors
      val t = Fixtures.eventsDv(s, d)
      val morTotals = DeleteVectors.read(t)
        .agg(count(lit(1)), sum("user_id")).head
      DeleteVectors.materialize(t)
      DeleteVectors.vacuum(t)
      val cowTotals = t.read().agg(count(lit(1)), sum("user_id")).head
      DeleteVectors.read(t) // post-vacuum read path (dv empty of matches)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum("user_id").cast("bigint").as("sum_uid"))
        .withColumn("mor_equals_cow", lit(morTotals == cowTotals))
        .orderBy(col("event_type"))
    }),
    "a33_history" -> ((s, d) => {
      // DESCRIBE HISTORY over the shared events fixture: two inserts (one
      // file per event day each) then the single-commit optimize that
      // compacts each day's pair into one file — every delta re-derivable
      // from the raw events in DuckDB
      import org.apache.spark.sql.expressions.Window
      val t = Fixtures.eventsIce(s, d).table
      t.history()
        .withColumn("seq", row_number().over(
          Window.orderBy(col("commit_ts"), col("log_file"))))
        .select(col("seq"), col("merged"),
          col("files_added").cast("bigint").as("files_added"),
          col("files_tombstoned").cast("bigint").as("files_tombstoned"))
        .orderBy(col("seq"))
    }),
    "a32_final_read" -> ((s, d) => {
      // merge-on-read FINAL: three unmerged seeded batches collapse at
      // query time via the table's own merge SQL; n_groups pins the
      // collapse (raw read holds MORE rows than distinct groups)
      val t = Fixtures.eventsAggHot(s, d)
      val fin = t.readFinal()
      fin.groupBy(col("event_type")).agg(sum("cnt").cast("bigint").as("cnt"))
        .withColumn("n_groups", lit(fin.count()))
        .orderBy(col("event_type"))
    }),
    "a12_agg_merge" -> ((s, d) => {
      Fixtures.eventsAgg(s, d).read()
        .groupBy(col("event_type")).agg(sum(col("cnt")).as("cnt"))
        .orderBy(col("event_type"))
    }),
    "a12_mv" -> ((s, d) => {
      // materialized-view double-write recipe: MV grand total == raw
      // count(*) after both tables compact (materialized-view.py:112-118)
      val pair = Fixtures.eventsMv(s, d)
      val rawCnt = pair.raw.read().agg(count(lit(1)).as("raw_cnt"))
      val mvCnt = pair.mv.read().agg(sum(col("cnt")).cast("bigint").as("mv_cnt"))
      rawCnt.crossJoin(mvCnt)
    }),
    "b18_union_seed" -> ((s, d) => {
      // query-time re-application of the seeding agg (README.md:672-687):
      // unmerged pre-evolution files read cnt as null → coalesce to 1
      Fixtures.eventsSeeded(s, d).read()
        .groupBy(col("event_type"))
        .agg(sum(coalesce(col("cnt"), lit(1L))).cast("bigint").as("cnt"))
        .orderBy(col("event_type"))
    }),
    "a13_replacing_merge" -> ((s, d) => {
      Fixtures.eventsReplacing(s, d).read()
        .groupBy(col("user_id"))
        .agg(max_by(col("event_type"), col("event_id")).as("event_type"),
          max(col("event_id")).as("last_event_id"))
        .orderBy(col("user_id"))
    }),
    "a14_dedup_merge" -> ((s, d) => {
      Fixtures.eventsDedup(s, d).read()
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("_row_id")).as("uniq"))
    }),
    "a18_partition_prune" -> ((s, d) => {
      val t = Fixtures.eventsIce(s, d).table
      t.readPartitionRange("d=2024-01-01", "d=2024-01-01")
        .agg(count(lit(1)).as("cnt"))
    }),
    "a24_incremental_read" -> ((s, d) => {
      // CDC tail: rows committed after the first insert = exactly the odd
      // half of events; the full compaction the fixture ran afterwards
      // rewrote every row but must emit NOTHING through the changelog
      // (`evens` = 0 is the self-verifying guard against merge re-emission)
      val (t, sinceTs) = Fixtures.eventsIncremental(s, d)
      t.readAdded(sinceTs).agg(
        count(lit(1)).as("cnt"),
        sum(col("event_id")).cast("bigint").as("sum_id"),
        count(when(col("event_id") % 2 === 0, 1)).cast("bigint").as("evens"))
    }),
    "a25_stream_exactly_once" -> ((s, d) => {
      // the fixture replayed both micro-batches (and replayed again after
      // compaction): exactly-once holds iff the table matches the source
      // exactly — and the committed high-water batch id survived the
      // merge/optimize log rewrites
      val t = Fixtures.eventsStream(s, d)
      val lastBatch = t.snapshot().streamCommits("evstream")
      t.read().agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("event_id")).as("uniq"))
        .withColumn("last_batch", lit(lastBatch))
    }),
    "a42_stream_change_feed" -> ((s, d) => {
      // the streaming form of a41: readStream.format("ice") with
      // changeFeed=true drains the SAME change multiset (inserts, CoW
      // UPDATE image pairs, MoR deletes; maintenance silent) as batch
      // ChangeFeed.between over the full history, and DuckDB re-derives
      // it — seed insert + second insert are both inserts here (window
      // from zero), so the expected multiset is base ∪ update images
      val fx = Fixtures.eventsChangeFeed(s, d)
      val sink = "icecdc_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("ice").option("path", fx.table.root)
        .option("changeFeed", "true").load()
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("cnt"),
          sum("event_id").cast("bigint").as("sum_id"))
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy(col("_change_type"))
    }),
    "a26_stream_source" -> ((s, d) => {
      // the reader-side dual of a25: readStream.format("ice") tails the
      // events table's log from zero. The CDC contract (non-merged logs
      // only) means the drained stream equals the raw source exactly, even
      // though the fixture compacted the table after both inserts.
      val t = Fixtures.eventsIce(s, d).table
      val sink = "icesrc_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = s.readStream.format("ice").option("path", t.root).load()
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .writeStream.format("memory").queryName(sink).outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink).orderBy(col("event_type"))
    }),

    "a47_stream_windows" -> ((s, d) => {
      // the event-time streaming surface graded end-to-end: the events
      // table streamed through format("ice"), watermarked, tumbling
      // hourly windows per type (Streams.windowedCounts), drained with
      // AvailableNow into a memory sink in complete mode — the final
      // window set must equal DuckDB replaying epoch-aligned hourly
      // windows over the raw events. Complete mode so the tail windows
      // the watermark has not closed still emit (the drain is bounded).
      val t = Fixtures.eventsIce(s, d).table
      val src = s.readStream.format("ice").option("path", t.root).load()
        .withColumn("ev_ts", Fixtures.evTs(col("ts")))
      val win = graft.streaming.Streams.windowedCounts(
        src, "ev_ts", "event_type",
        windowDuration = "1 hour", watermark = "2 hours")
      val sink = "winsink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = win.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink)
        .select(col("event_type"), unix_millis(col("win_start")).as("win_ms"),
          col("cnt"))
        .orderBy(col("event_type"), col("win_ms"))
    }),

    "a28_format_read" -> ((s, d) => {
      // the batch half of format("ice"): a standard reader-API load of
      // the compacted events table, plus option("snapshotTs") time travel
      // back to the first (even-ids-only) insert, plus a partition-column
      // predicate resolved through the FileIndex — three contracts in one
      // graded row
      val fx = Fixtures.eventsIce(s, d)
      val full = s.read.format("ice").option("path", fx.table.root).load()
      val tt = s.read.format("ice").option("path", fx.table.root)
        .option("snapshotTs", fx.betweenTs.toString).load()
      full.agg(count(lit(1)).as("cnt"),
          countDistinct(col("d")).as("days"))
        .crossJoin(tt.agg(count(lit(1)).as("cnt_tt")))
        .crossJoin(full.where(col("d") === "2024-01-01")
          .agg(count(lit(1)).as("cnt_day1")))
    }),
    "a29_format_write" -> ((s, d) => {
      // the write half of format("ice"): two standard writer-API appends
      // (partition routing + sort order via options) into a fresh table,
      // read back through the same format — values prove the round trip,
      // not just a row count
      val ev = Fixtures.raw(s, d, "events")
      val root = Fixtures.scratchDir("graft_fmtw")
      def put(half: Int): Unit =
        ev.where(pmod(col("event_id"), lit(2)) === half)
          .write.format("ice").option("path", root)
          .option("partitionExpr", "concat('t=', event_type)")
          .option("sortOrder", "event_id").mode("append").save()
      put(0); put(1)
      s.read.format("ice").option("path", root).load()
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("t")).as("types"),
          sum(col("event_id")).cast("bigint").as("sum_id"))
    }),
    "a30_repartition" -> ((s, d) => {
      // partition evolution: the day-partitioned events table rewritten to
      // user-hash buckets in ONE atomic merged-log commit
      // (IceTable.repartitionTable); graded on the NEW virtual partition
      // key + full-table metrics surviving the rewrite bit-for-bit
      val t = Fixtures.eventsRepartitioned(s, d)
      t.withPartitionColumn(t.read(), "u")
        .groupBy(col("u"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("user_id")).cast("bigint").as("user_sum"),
          countDistinct(col("event_id")).as("ids"))
        .orderBy(col("u"))
    }),
    "a22_http_roundtrip" -> ((s, d) => {
      // A22 end-to-end through the real HTTP edge: 500 events POST as
      // NDJSON to /insert, /flush commits them as ONE atomic ice insert,
      // and GET /query runs SQL over the snapshot and returns CSV. The
      // CSV aggregates are re-emitted as the graded row, so DuckDB
      // re-derives them from the raw parquet — VALUES prove the payload
      // survived the edge, not just a row count.
      import java.net.URI
      import java.net.http.{HttpClient, HttpRequest, HttpResponse}
      val src = Fixtures.raw(s, d, "events").where(col("event_id") < 500)
        .select(col("event_id"), col("event_type"), col("user_id"))
      val nd = src.toJSON.collect().mkString("\n") // 500 short lines: edge-scale
      val root = Fixtures.scratchDir("graft_http")
      val table = new IceTable(s, root, IceTableConfig(
        partitionExpr = concat(lit("t="), col("event_type")),
        sortOrder = Seq("event_id")))
      val api = new graft.sources.IceHttpApi(table, flushIntervalMs = 0)
      val addr = api.start()
      try {
        val client = HttpClient.newHttpClient()
        val base = s"http://localhost:${addr.getPort}"
        client.send(HttpRequest.newBuilder(URI.create(s"$base/insert"))
          .POST(HttpRequest.BodyPublishers.ofString(nd)).build(),
          HttpResponse.BodyHandlers.ofString())
        client.send(HttpRequest.newBuilder(URI.create(s"$base/flush"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.ofString())
        val sql = java.net.URLEncoder.encode(
          "select count(*) as r, sum(event_id) as s, " +
            "count(distinct user_id) as u from ice", "UTF-8")
        val csv = client.send(
          HttpRequest.newBuilder(URI.create(s"$base/query?sql=$sql"))
            .GET().build(), HttpResponse.BodyHandlers.ofString()).body()
        val cols = csv.split("\n")(1).split(",")
        import s.implicits._
        Seq((cols(0).toLong, cols(1).toLong, cols(2).toLong))
          .toDF("http_rows", "http_sum", "http_users")
      } finally api.stop()
    }),

    // --------------------------------------------- delegated query surface
    "b2_partition_columns" -> ((s, d) => {
      val t = Fixtures.eventsIce(s, d).table
      t.withPartitionColumn(t.read(), "d")
        .groupBy(col("d")).agg(count(lit(1)).as("cnt")).orderBy(col("d"))
    }),
    "b4_projection" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") * 2).cast("bigint").as("double_qty"))
        // the synthetic testdata has duplicate (orderkey, linenumber) pairs,
        // so double_qty is needed to make the order total under LIMIT
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("double_qty"))
        .limit(50)
    }),
    "b5_filter" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .where(col("l_quantity") < 25 && col("l_discount").between(0.02, 0.08))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"))
    }),
    "b6_group_agg" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          dec(sum(dec(col("l_extendedprice")))).cast("double").as("sum_price"),
          max(col("l_quantity")).cast("bigint").as("max_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "b7_count_distinct" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .agg(countDistinct(col("l_orderkey")).as("uniq_orders"),
          countDistinct(col("l_partkey")).as("uniq_parts"))
    }),
    "b7_approx_uniq" -> ((s, d) => {
      // CH `uniq` parity (query.sql:4): HLL estimate, graded as a
      // verified-accuracy bound — the oracle pins exact_uniq and asserts
      // the estimate landed within 5% (rsd 0.02 ⇒ ~2σ margin)
      val df = Fixtures.lineitemIce(s, d).read()
      df.agg(countDistinct(col("l_orderkey")).as("exact_uniq"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
        .select(col("exact_uniq"),
          (abs(col("approx") - col("exact_uniq")) <=
            col("exact_uniq") * 0.05).as("approx_within_5pct"))
    }),
    "b8_max_by" -> ((s, d) => {
      Fixtures.raw(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(max_by(col("o_orderstatus"), col("o_orderkey")).as("last_status"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))
    }),
    "b9_any_value" -> ((s, d) => {
      Fixtures.raw(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(any_value(col("o_orderstatus")).as("av"),
          count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    }),
    "b10_quantiles" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
    }),
    "b11_topk" -> ((s, d) => {
      // Exact scale-4 arithmetic in INTEGER units: revenue_e4 = Σ
      // price_e2·(100 − disc_e2) summed as plain longs, divided by 10⁴
      // at the end. Bit-identical to the former decimal(38,4) sum (the
      // e2 units come from the same HALF_UP decimal(18,2) casts, the
      // products and sums are exact in both domains — per-group sums
      // ≪ 2⁵³ — and long/1e4 is the correctly-rounded double of the same
      // rational, which is what casting the exact decimal to double
      // yields; QueryEquivalenceSpec pins this, the oracle hash-matches
      // both). Why: sum over decimal(38,4) stores >18-digit values as
      // byte arrays in the agg buffer — per-row BigDecimal serialize +
      // deserialize — and at sf1's 1.5M groups that measured 420-1100
      // CPU-s vs 15-60 for the long form (10-30× — the recorded sf1
      // cliff), with identical results.
      Fixtures.lineitemIce(s, d).read()
        .groupBy(col("l_orderkey"))
        .agg((sum((dec(col("l_extendedprice")) * 100).cast("long") *
          (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))) /
          lit(10000.0)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "b12_json_extract" -> ((s, d) => {
      Fixtures.eventsIce(s, d).table.read()
        .agg(sum(get_json_object(col("props"), "$.k").cast("bigint"))
          .cast("bigint").as("k_sum"),
          count(get_json_object(col("props"), "$.k")).as("k_cnt"))
    }),
    "b13_to_json" -> ((s, d) => {
      Fixtures.eventsIce(s, d).table.read()
        .orderBy(col("event_id")).limit(5)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"))).as("js"))
    }),
    "b14_casts" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .agg(sum(col("l_quantity").cast("bigint")).as("qty_long"),
          countDistinct(col("l_orderkey").cast("string")).as("key_str"),
          max(round(col("l_discount") * 100).cast("bigint")).as("disc_pct"))
    }),
    "b15_datetime" -> ((s, d) => {
      Fixtures.lineitemIce(s, d).read()
        .groupBy(year(col("l_shipdate")).cast("bigint").as("yr"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(date_trunc("month", col("l_shipdate"))).as("months"),
          min(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("first_day"))
        .orderBy(col("yr"))
    }),
    "b16_string_regex" -> ((s, d) => {
      Fixtures.raw(s, d, "part")
        .groupBy(regexp_extract(col("p_name"), "([a-z]+)", 1).as("w"))
        .agg(count(lit(1)).as("cnt"),
          max(upper(col("p_brand"))).as("max_brand"),
          min(substring(col("p_type"), 1, 3)).as("type3"))
        .orderBy(col("w"))
    }),
    "b17_uuid" -> ((s, d) => {
      // uuid() values are nondeterministic, but their UNIQUENESS is the
      // contract — 100 generated ids must be 100 distinct ids (constant)
      Fixtures.raw(s, d, "orders").limit(100)
        .select(expr("uuid()").as("id"))
        .agg(countDistinct(col("id")).as("uniq"))
    }),
    "b19_coalesce" -> ((s, d) => {
      Fixtures.eventsIce(s, d).table.read()
        .agg(sum(coalesce(get_json_object(col("props"), "$.missing").cast("bigint"),
          lit(1L))).cast("bigint").as("s"))
    }),
    "b20_subquery" -> ((s, d) => {
      val inner = Fixtures.raw(s, d, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      inner.agg(round(avg(col("cnt")), 6).as("avg_orders"),
        max(col("cnt")).as("max_orders"))
    }),
    "b25_window" -> ((s, d) => {
      // analytic window surface: row_number / lag / running sum / rank
      // over a unique-keyed monthly rollup (unique key ⇒ deterministic)
      val W = org.apache.spark.sql.expressions.Window
      val monthly = Fixtures.lineitemIce(s, d).read()
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("m"))
        .agg(count(lit(1)).as("cnt"), sum(dec(col("l_extendedprice"))).as("_rev"))
      val w = W.orderBy(col("m"))
      monthly.select(col("m"), col("cnt"),
          col("_rev").cast("double").as("rev"),
          row_number().over(w).cast("bigint").as("rn"),
          lag(col("_rev"), 1).over(w).cast("double").as("prev_rev"),
          sum(col("_rev")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double").as("cum_rev"),
          rank().over(W.orderBy(col("_rev").desc, col("m"))).cast("bigint").as("rev_rank"))
        .orderBy(col("m"))
    }),
    "b26_rollup" -> ((s, d) => {
      // multi-level aggregation: ROLLUP with grouping() disambiguation
      Fixtures.lineitemIce(s, d).read()
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast("bigint").as("lvl"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"), col("sum_qty"), col("lvl"))
        .orderBy(col("lvl"), col("flag"), col("status"))
    }),
    "b34_sql_ctas" -> ((s, d) => {
      // CREATE TABLE ... PARTITIONED BY ... SORTED BY ... AS <query>
      // through the injected parser (GraftSqlParser → one atomic insert
      // commit that also persists the routing/sort config); read back via
      // the catalog relation
      val t = Fixtures.eventsSqlCtas(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "b35_sql_maintenance" -> ((s, d) => {
      // OPTIMIZE + VACUUM RETAIN 0 HOURS through the injected parser:
      // compaction and tombstone cleanup are pure maintenance, so the
      // post-maintenance answer must equal DuckDB over the raw source
      val t = Fixtures.eventsSqlMaintained(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "b36_sql_zorder" -> ((s, d) => {
      // OPTIMIZE ... ZORDER BY through the parser (GraftOptimizeZOrderCommand
      // → recluster): a pure rewrite, so DuckDB over the raw source is
      // the exact answer; the virtual partition column proves the catalog
      // relation survives the recluster
      val t = Fixtures.eventsSqlZordered(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "b37_sql_alter" -> ((s, d) => {
      // ALTER TABLE SORTED BY (config-only) then PARTITIONED BY (atomic
      // evolution) through the parser: both content-preserving, and the
      // post-evolution catalog read serves the NEW t= partition scheme
      val t = Fixtures.eventsSqlAltered(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT t AS event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY t ORDER BY t""")
    }),
    "b38_sql_restore" -> ((s, d) => {
      // RESTORE TABLE through the parser: the visible state hash-matches
      // the as-of read (evens only, original event_type, dv deletes
      // rolled back), while TIMESTAMP AS OF at the pre-restore head still
      // sees the mutated layout — both proven in one query
      val fx = Fixtures.eventsSqlRestored(s, d)
      val f = new java.io.File(fx.table.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id,
        (SELECT count(*) FROM graft.`${f.getName}`
           TIMESTAMP AS OF ${fx.preRestoreTs}) AS pre_restore_cnt
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "b39_sql_add_column" -> ((s, d) => {
      // declared-schema CREATE TABLE (empty) + ALTER TABLE ADD COLUMNS:
      // pre-evolution rows read the new columns as null, the
      // post-evolution insert fills them
      val t = Fixtures.eventsSqlAddColumn(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT count(*) AS cnt,
        CAST(sum(CASE WHEN score IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_scores,
        CAST(count(tag) AS BIGINT) AS tagged,
        CAST(sum(score) AS DOUBLE) AS score_sum
        FROM graft.`${f.getName}`""")
    }),
    "b31_sql_dml" -> ((s, d) => {
      // SQL DML through the catalog (IceDeleteCommand/IceUpdateCommand):
      // the fixture UPDATEd and DELETEd via spark.sql; every surviving
      // value read back through the same catalog relation
      val t = Fixtures.eventsSqlDml(s, d)
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT event_type, count(*) AS cnt,
        CAST(sum(event_id) AS BIGINT) AS sum_id
        FROM graft.`${f.getName}` GROUP BY event_type ORDER BY event_type""")
    }),
    "b29_sql_catalog" -> ((s, d) => {
      // pure-SQL access via the analyzer-resolved `graft.<name>` relation
      // (IceSqlResolution through spark.sql.extensions): the WHERE on the
      // virtual partition column prunes files inside the optimizer — the
      // reference's DuckDB-macro / CH-parameterized-view surface (B21)
      // without any file list spliced into SQL text
      val t = Fixtures.eventsIce(s, d).table
      val f = new java.io.File(t.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT d, count(*) AS cnt, count(DISTINCT user_id) AS users
        FROM graft.`${f.getName}`
        WHERE d >= '2024-01-02' AND d <= '2024-01-06'
        GROUP BY d ORDER BY d""")
    }),
    "b30_sql_time_travel" -> ((s, d) => {
      // SQL time travel: TIMESTAMP AS OF <epoch-ms> pins the MVCC snapshot
      // between the two fixture inserts — only even event_ids exist there
      val fx = Fixtures.eventsIce(s, d)
      val f = new java.io.File(fx.table.root)
      s.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      s.sql(s"""SELECT count(*) AS cnt, count(DISTINCT event_id) AS ids
        FROM graft.`${f.getName}` TIMESTAMP AS OF ${fx.betweenTs}""")
    }),
    "b28_pivot" -> ((s, d) => {
      // wide pivot: per-returnflag columns for each linestatus value
      // (explicit value list keeps the plan static — one aggregate, no
      // distinct-scan; the Catalyst pivot rewrite is CASE sums, the same
      // shape any engine uses)
      Fixtures.lineitemIce(s, d).read()
        .groupBy(col("l_returnflag").as("flag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")).cast("bigint"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("flag")
    }),
    "b27_cube" -> ((s, d) => {
      // full CUBE lattice (all 4 grouping sets) with grouping() level ids
      Fixtures.lineitemIce(s, d).read()
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
            .cast("bigint").as("lvl"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"), col("sum_qty"), col("lvl"))
        .orderBy(col("lvl"), col("flag"), col("status"))
    }),
    "b3_filename_virtual" -> ((s, d) => {
      // raw paths are run-specific, but the alive-file COUNT is pinned:
      // post-optimize it equals the partition (event-day) count
      val t = Fixtures.eventsIce(s, d).table
      t.withFileName(t.read())
        .agg(countDistinct(col("_file")).as("files"))
    }),
    "b22_scalar_udf" -> ((s, d) => {
      // scalar UDF bound into the engine (B22) — last-resort extension
      // point; everything else in this library uses codegen'd built-ins
      s.udf.register("graft_tok_count",
        (t: String) => if (t == null || t.trim.isEmpty) 0 else t.trim.split("\\s+").length)
      Fixtures.raw(s, d, "documents").createOrReplaceTempView("docs_udf")
      s.sql("""select cast(sum(graft_tok_count(text)) as bigint) as total_tokens,
              |count(*) as cnt from docs_udf""".stripMargin)
    }),
    "b24_sql_functions" -> ((s, d) => {
      // native expressions registered as SQL functions: graft_dot /
      // graft_cosine callable from plain spark.sql (and so from the HTTP
      // query API). Bit-parity basis: both engines cast float→double and
      // accumulate sequentially in IEEE double, so the rounded values
      // hash-match the DuckDB list_inner_product oracle exactly.
      org.apache.spark.sql.graft.GraftSqlFunctions.register(s)
      Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .createOrReplaceTempView("graft_emb")
      s.sql("""select c.vec_id,
              |  round(graft_dot(c.emb, q.emb), 6) as dot_q0,
              |  round(graft_cosine(c.emb, q.emb), 6) as cos_q0
              |from graft_emb c
              |cross join (select emb from graft_emb where vec_id = 0) q
              |where c.vec_id < 10
              |order by c.vec_id, dot_q0, cos_q0""".stripMargin)
    }),
    "b23_output_csv" -> ((s, d) => {
      // output-format round trip (B23): aggregate -> csv -> read back
      val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
      Fixtures.raw(s, d, "orders")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true").option("inferSchema", "true").csv(out)
        .select(col("o_orderstatus"), col("cnt").cast("bigint").as("cnt"))
        .orderBy(col("o_orderstatus"))
    }),
    "b21_catalog_view" -> ((s, d) => {
      // snapshot registered as a catalog view via IceFileIndex: WHERE on the
      // partition key prunes files inside the optimizer (B21/B22)
      val t = Fixtures.eventsIce(s, d).table
      graft.plans.IceFileIndex.registerView(s, t, "ice_events_view")
      s.sql("""select event_type, count(*) as cnt from ice_events_view
              |where d = '2024-01-15' group by event_type
              |order by event_type""".stripMargin)
    }),
    "stats_skipping" -> ((s, d) => {
      // beyond-reference: each written file's [min, max] of the cluster key
      // (ts) is recorded in its log marker at write time, so a ts-range
      // query prunes files from the log ALONE — zero footer/object-store
      // reads at plan time. Self-verifying: the pruned-scan count must
      // equal the oracle's full-table filter count, files_scanned is the
      // deterministic 11 day-files of the range, files_total the partition
      // count.
      val fx = Fixtures.eventsIce(s, d)
      val snap = fx.table.snapshot()
      def dayNs(day: Int): Long =
        java.time.LocalDate.of(2024, 1, day).toEpochDay * 86400L * 1_000_000_000L
      val lo = dayNs(10)
      val hi = dayNs(21) - 1
      val pruned = fx.table.filesInStatsRange(snap, lo.toString, hi.toString)
      fx.table.readFiles(snap, pruned)
        .where(col("ts").between(lo, hi))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("files_scanned", lit(pruned.length.toLong))
        .withColumn("files_total", lit(snap.aliveFiles.length.toLong))
    }),
    "zorder_skipping" -> ((s, d) => {
      // Z-order clustering: 16 files each bounded in BOTH (user_id,
      // event_id); a one-fifth window on EITHER dimension must prune
      // files (booleans) while the pruned read agrees exactly with the
      // full filter (counts — the DuckDB-checkable part)
      val t = Fixtures.eventsZOrder(s, d)
      val snap = t.snapshot()
      val total = snap.aliveFiles.length
      val r = Fixtures.raw(s, d, "events")
        .agg(max(col("user_id")), max(col("event_id"))).head
      val (uLim, eLim) = (r.getLong(0) / 5, r.getLong(1) / 5)
      val filesU = t.filesMatchingStats(snap,
        Map("user_id" -> (None, Some(uLim.toString))))
      val filesE = t.filesMatchingStats(snap,
        Map("event_id" -> (None, Some(eLim.toString))))
      val cntU = t.readFiles(snap, filesU)
        .where(col("user_id") <= uLim).count()
      val cntE = t.readFiles(snap, filesE)
        .where(col("event_id") <= eLim).count()
      import s.implicits._
      Seq((cntU, cntE, filesU.length < total, filesE.length < total,
        total.toLong))
        .toDF("cnt_u", "cnt_e", "pruned_u", "pruned_e", "files_total")
    }),
    "join_star_schema" -> ((s, d) => {
      // beyond-reference: Spark-native star join, dims broadcast
      val li = Fixtures.lineitemIce(s, d).read()
      val orders = Fixtures.raw(s, d, "orders")
      val cust = Fixtures.raw(s, d, "customer")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          dec(sum(dec(col("l_extendedprice")))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),
    "dpp_join" -> ((s, d) => {
      // beyond-reference: DYNAMIC partition pruning through the ice catalog
      // relation — the query has no literal predicate on the partition key,
      // yet joining a filtered dimension prunes fact files AT RUNTIME
      // (Spark's PartitionPruning rule fires because IceFileIndex routes
      // partition values through partitionSchema). Self-verifying: the
      // count must equal the oracle's, dpp_applied pins the
      // dynamicpruningexpression in the plan, files_runtime_pruned pins
      // that fewer files were read than statically selected.
      val fx = Fixtures.eventsIce(s, d)
      graft.plans.IceFileIndex.registerView(s, fx.table, "dpp_events")
      // the dim must be file-backed: an in-memory Seq folds to a
      // LocalRelation whose filter disappears before PartitionPruning runs
      val dimPath = java.nio.file.Files.createTempDirectory("dpp_dim").toString
      import s.implicits._
      (10 to 19).map(day => (f"2024-01-$day%02d", if (day <= 14) "keep" else "drop"))
        .toDF("day", "tag").write.mode("overwrite").parquet(dimPath)
      s.read.parquet(dimPath).createOrReplaceTempView("dpp_days")
      val q = s.sql(
        """select count(*) as cnt from dpp_events f
          |join dpp_days m on f.d = m.day where m.tag = 'keep'""".stripMargin)
      val cnt = q.collect().map(_.getLong(0)).head
      val scan = graft.plans.PlanScans.factScan(q)
      val dppApplied = scan.metadata("PartitionFilters").contains("dynamicpruning")
      val runtimePruned =
        scan.metrics("numFiles").value < scan.metrics("staticFilesNum").value
      Seq((cnt, dppApplied, runtimePruned))
        .toDF("cnt", "dpp_applied", "files_runtime_pruned")
    }),

    // ------------------------------------------------ LLM pipeline operators
    "llm_exact_dedup" -> ((s, d) => {
      Fixtures.raw(s, d, "documents")
        .agg(count(lit(1)).as("total_docs"),
          countDistinct(md5(col("text"))).as("distinct_docs"))
    }),
    "llm_dedup_keep" -> ((s, d) => {
      Dedup.exactDedup(Fixtures.raw(s, d, "documents"), Seq("text"), "doc_id")
        .select(col("doc_id").as("keep_id")).orderBy(col("keep_id"))
    }),
    "llm_token_stats" -> ((s, d) => {
      Fixtures.raw(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(TextFunctions.tokenCount(col("text"))).cast("bigint").as("total_tokens"),
          sum(col("n_chars")).cast("bigint").as("total_chars"))
        .orderBy(col("lang"))
    }),
    "llm_quality_buckets" -> ((s, d) => {
      Fixtures.raw(s, d, "documents")
        .groupBy(when(col("n_chars") < 150, "short")
          .when(col("n_chars") < 300, "medium")
          .otherwise("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("bucket"))
    }),
    "llm_fingerprint" -> ((s, d) => {
      Fixtures.raw(s, d, "documents")
        .agg(countDistinct(TextFunctions.fingerprint(col("text"))).as("uniq_fp"),
          count(lit(1)).as("total"))
    }),
    "llm_lang_quality" -> ((s, d) => {
      // heuristic scores, graded on their CONTRACT: every quality score in
      // [0,1], every language prediction in the model's domain, one score
      // per document — constants a SQL oracle can pin
      Fixtures.raw(s, d, "documents")
        .select(TextFunctions.langId(col("text")).as("pred_lang"),
          TextFunctions.qualityScore(col("text")).as("q"))
        .agg(count(lit(1)).as("total_docs"),
          bool_and(col("q").between(0.0, 1.0)).as("quality_in_range"),
          bool_and(col("pred_lang").isin("en", "de", "es", "fr", "zh", "und"))
            .as("lang_in_domain"))
    }),
    "llm_minhash_dedup" -> ((s, d) => {
      // planted near-dups (3 appended tokens: jaccard ≈ n/(n+3) ≈ 0.93, at
      // most 3 of 128 OPH buckets move → ≥13 of 16 bands still collide):
      // the graded row is the constant recovery count + the verifier's own
      // threshold invariant
      val pairs = Dedup.minHashDupPairs(
        docsWithPlanted(s, d, t => concat(t, lit(" planted dup marker"))),
        "doc_id", "text", threshold = 0.7)
      plantedSummary(pairs, col("jaccard") >= 0.7)
    }),
    "llm_simhash_dedup" -> ((s, d) => {
      // planted near-dups: word-order reversal keeps the distinct-token SET
      // (simhash input) identical → hamming 0, all 4 bands collide
      val pairs = Dedup.simHashDupPairs(
        docsWithPlanted(s, d,
          t => array_join(reverse(split(t, "\\s+")), " ")),
        "doc_id", "text", maxHamming = 3)
      plantedSummary(pairs, col("hamming") <= 3)
    }),
    "llm_ann_bruteforce" -> ((s, d) => {
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val queries = emb.where(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, dim = 64)
        .select(col("qid"), col("id"), col("rank").cast("bigint").as("rank"))
        .orderBy(col("qid"), col("rank"))
    }),
    "llm_minhash_index" -> ((s, d) => {
      // incremental NEAR-dup against the persisted signature index
      // (SigIndex; Dedup.incrementalDedup is the exact-hash analog): a
      // "new crawl batch" of 5 planted near-dups (the llm_minhash_dedup
      // sources, text extended) and 5 novel docs (token order reversed —
      // disjoint shingles) checks against ALL indexed history via one
      // scan + broadcast band join. Every planted doc must hit its
      // source; no novel doc may match anything.
      val (bands, sigs) = Fixtures.docsSigIndex(s, d)
      val longDocs = Fixtures.raw(s, d, "documents")
        .where(col("n_chars") >= 200).orderBy(col("doc_id")).limit(10)
      val planted = longDocs.limit(5)
        .select((col("doc_id") + PlantOffset).as("doc_id"),
          concat(col("text"), lit(" extra trailing words here")).as("text"))
      val novel = longDocs.orderBy(col("doc_id").desc).limit(5)
        .select((col("doc_id") + 2 * PlantOffset).as("doc_id"),
          concat_ws(" ", reverse(TextFunctions.tokens(col("text")))).as("text"))
      val matches = SigIndex.nearDupsAgainstIndex(bands, sigs,
        planted.unionByName(novel), "doc_id", "text", threshold = 0.5)
      matches.agg(
        countDistinct(when(col("batch_id") < 2 * PlantOffset &&
          col("hist_id") === col("batch_id") - PlantOffset,
          col("batch_id"))).cast("bigint").as("planted_found"),
        count(when(col("batch_id") >= 2 * PlantOffset, 1)).cast("bigint")
          .as("novel_matched"))
    }),
    "llm_hard_negatives" -> ((s, d) => {
      // contrastive-training negative mining (Similarity.hardNegatives):
      // for 3 anchors, the top-5 most-similar vectors of a DIFFERENT
      // language — labels ride from documents on the aligned doc_id.
      // Graded rank-by-rank (+ the negative's label) vs the DuckDB replay.
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val labeled = emb.join(
        Fixtures.raw(s, d, "documents").select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
      val anchors = labeled.where(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("lang").as("qlang"))
      Similarity.hardNegatives(labeled, "vec_id", "embedding", "lang",
          anchors, "qid", "qvec", "qlang", k = 5, dim = 64)
        .select(col("qid"), col("id"), col("neg_label"),
          col("rank").cast("bigint").as("rank"))
        .orderBy(col("qid"), col("rank"))
    }),
    "llm_ann_lsh" -> ((s, d) => {
      // self-verifying: recall@10 vs the exact brute-force top-10, in-query
      annRecall(s, d, (emb, queries) =>
        Similarity.lshTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, dim = 64, tables = 16, bits = 4))
    }),
    "llm_ann_ivf" -> ((s, d) => {
      // self-verifying: recall@10 vs the exact brute-force top-10, in-query
      // nlist=8/nprobe=5: measured 24/30 hits at sf0.001 and 23/30 at
      // sf0.01 (bar: 18) — nprobe=4 was a near-miss at sf0.001 (17/30),
      // the weakly-clustered synthetic embeddings spread true neighbors
      // across lists, so the probe fraction carries the recall
      annRecall(s, d, (emb, queries) =>
        Similarity.ivfTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, nlist = 8, nprobe = 5, dim = 64))
    }),
    "llm_ann_ivf_index" -> ((s, d) => {
      // the persistent twin of llm_ann_ivf: train once, store the inverted
      // lists as ice partitions (r=d/cid=k), search via log-side partition
      // pruning — same in-query recall bound vs exact brute force
      annRecall(s, d, (emb, queries) => {
        val root = Fixtures.scratchDir("graft_ivfidx")
        val t = IvfIndex.build(s, emb, "vec_id", "embedding", root,
          nlist = 8, lloydIterations = 2, dim = 64)
        IvfIndex.search(t, queries, "qid", "qvec", k = 10, nprobe = 5, dim = 64)
      })
    }),
    "llm_ann_sync" -> ((s, d) => {
      // Feed-synced IVF index (IvfIndex.syncFromFeed): after the corpus
      // table negated %31==2 vectors, MoR-deleted %23==5, and appended
      // fresh twins, the index followed the change feed via NATIVE
      // upsert/deleteKeys (no markers); search must track the live
      // corpus — recall vs brute force over src.read(), zero deleted ids
      val fx = Fixtures.embeddingsIvfSync(s, d)
      val live = fx.src.read()
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        .localCheckpoint()
      val queries = live.where(col("vec_id").isin(0L, 1L, 3L))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val bf = Similarity.bruteForceTopK(live, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, dim = 64)
        .select(col("qid"), col("id"), lit(1L).as("_bf"))
      IvfIndex.search(IvfIndex.open(s, fx.root), queries, "qid", "qvec",
          k = 10, nprobe = 6, dim = 64)
        .select(col("qid"), col("id"))
        .join(bf, Seq("qid", "id"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          (sum(coalesce(col("_bf"), lit(0L))) >= lit(18L)).as("recall_ok"),
          (sum(when(col("id") % 23 === 5 && col("id") < 1000000L, 1L)
            .otherwise(0L)) === 0L).as("no_deleted"))
    }),
    "llm_ann_pq" -> ((s, d) => {
      // product quantization: the 32×-compressed ANN scan (8×16 codebooks,
      // ADC lookup-table scoring, exact re-rank of the 4k shortlist) —
      // same in-query recall bound vs exact brute force
      annRecall(s, d, (emb, queries) =>
        Similarity.pqTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, m = 8, ksub = 32,
          iterations = 3, dim = 64, rerankFactor = 10))
    }),
    "llm_cosine_neardup" -> ((s, d) => {
      // planted near-dups (ε on one component: cosine ≈ 1 ≫ 0.99, bucket
      // signs essentially unchanged across all 8 tables) — the organic
      // corpus has no 0.99-pairs at small SF, so without planting this
      // grades an empty result
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantOffset).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + when(i === 0, lit(0.001)).otherwise(lit(0.0)))
            .as("embedding"))
      val pairs = Similarity.cosineDupPairs(emb.unionByName(planted),
        "vec_id", "embedding", threshold = 0.99)
      plantedSummary(pairs, col("cosine") >= 0.99)
    }),
    "llm_cluster_sample" -> ((s, d) => {
      // cluster-balanced curation: k-means assign + per-cluster exact-N
      // sample. Self-verifying — the kept count must equal
      // sum(min(perCluster, size)) over the assignment's own profile,
      // every cluster's kept count must respect the cap, and the
      // assignment sims must be true cosines (in [-1, 1])
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val assigned = Cluster.assign(emb, "vec_id", "embedding")
      val expected = Cluster.profile(assigned)
        .agg(sum(least(col("size"), lit(20L))).as("_exp"))
      val kept = Cluster.balancedSample(emb, "vec_id", "embedding",
        perCluster = 20)
      val keptStats = kept.groupBy("cid").agg(count(lit(1)).as("_k"))
        .agg(sum(col("_k")).as("_actual"), max(col("_k")).as("_maxk"))
      val simsOk = assigned
        .agg(bool_and(col("centroid_sim").between(-1.0000001, 1.0000001))
          .as("_simok"))
      emb.agg(count(lit(1)).as("docs"))
        .crossJoin(expected).crossJoin(keptStats).crossJoin(simsOk)
        .select(col("docs"),
          (col("_actual") === col("_exp")).as("sample_matches"),
          (col("_maxk") <= 20L).as("per_cluster_ok"),
          col("_simok").as("sims_ok"))
    }),
    "llm_semantic_dedup" -> ((s, d) => {
      // SemDeDup: cluster-then-neighborhood-scan near-dup detection, same
      // planted ε-pairs as llm_cosine_neardup (near-identical vectors get
      // near-identical centroid similarity, so they sort adjacent inside
      // their cluster); additionally grades the keep-set — one canonical
      // row per planted group survives, so kept == original corpus size
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantOffset).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + when(i === 0, lit(0.001)).otherwise(lit(0.0)))
            .as("embedding"))
      val corpus = emb.unionByName(planted)
      // localCheckpoint: the pair DAG (train + assign + rank + candidate
      // joins) feeds BOTH the summary and keepCanonical (whose
      // connected-components loop eagerly checkpoints its input) — as a
      // lazy plan it would execute twice
      val pairs = SemDedup.semanticDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.99).localCheckpoint()
      val kept = Dedup.keepCanonical(corpus, "vec_id", pairs)
        .agg(count(lit(1)).as("kept"))
      plantedSummary(pairs, col("cosine") >= 0.99).crossJoin(kept)
    }),
    "llm_image_dedup" -> ((s, d) => {
      // perceptual image dedup: REAL PNG payloads decoded, aHash over the
      // pixels (8x8 area-sampled grayscale, mean threshold), banded
      // hamming pairing — the multimodal twin of text simhash. 5 planted
      // exact-content copies (same payload, shifted id) must pair at
      // hamming 0, every emitted pair honors the bound, and the keep-set
      // count is pinned (packPng dims floor at the 8x8 hash grid, so organic images hash distinctly)
      val media = Fixtures.mediaPng(s, d) // packing is fixture work
      val planted = media.where(col("media_id") < 5)
        .withColumn("media_id", col("media_id") + PlantOffset)
      val all = media.unionByName(planted)
      fingerprintDedupSummary(all, Multimodal.imageAHash(all), "ahash")
    }),
    "llm_video_dedup" -> ((s, d) => {
      // video fingerprint dedup: every sampled MJPEG frame REALLY decoded,
      // per-frame aHash majority-voted into a temporal fingerprint, banded
      // hamming pairing — the trio's third leg
      val media = Multimodal.packAvi(Fixtures.raw(s, d, "documents"), "doc_id")
      val planted = media.where(col("media_id") < 5)
        .withColumn("media_id", col("media_id") + PlantOffset)
      val all = media.unionByName(planted)
      fingerprintDedupSummary(all, Multimodal.videoFingerprint(all), "vfp")
    }),
    "llm_audio_dedup" -> ((s, d) => {
      // audio fingerprint dedup: REAL WAV payloads decoded via
      // javax.sound.sampled, 64-window RMS energy envelope thresholded at
      // the mean, banded hamming pairing. 5 planted exact copies pair at
      // hamming 0; organic clips have distinct envelopes
      val media = Multimodal.packWav(Fixtures.raw(s, d, "documents"), "doc_id")
      val planted = media.where(col("media_id") < 5)
        .withColumn("media_id", col("media_id") + PlantOffset)
      val all = media.unionByName(planted)
      fingerprintDedupSummary(all, Multimodal.audioFingerprint(all), "afp")
    }),
    "llm_multimodal_meta" -> ((s, d) => {
      // REAL codec graded: payloads are actual PNGs (dims a closed-form
      // function of doc_id), decoded with javax.imageio — the oracle pins
      // the true header dimensions
      val media = Multimodal.packPng(Fixtures.raw(s, d, "documents"), "doc_id")
      Multimodal.decodeImageMetaReal(media)
        .agg(sum(col("width")).cast("bigint").as("sum_w"),
          sum(col("height")).cast("bigint").as("sum_h"),
          count(lit(1)).as("cnt"),
          bool_and(col("width") > 0).as("all_decoded"))
    }),
    "llm_multimodal_resize" -> ((s, d) => {
      // real decode → proportional resize → PNG re-encode → real re-decode;
      // the resized dimensions have a closed-form oracle
      val media = Multimodal.packPng(Fixtures.raw(s, d, "documents"), "doc_id")
      Multimodal.decodeImageMetaReal(Multimodal.resizeImageReal(media, maxDim = 6))
        .agg(sum(col("width")).cast("bigint").as("sum_w"),
          sum(col("height")).cast("bigint").as("sum_h"),
          count(lit(1)).as("cnt"))
    }),
    "llm_multimodal_audio" -> ((s, d) => {
      // REAL audio codec graded: payloads are actual 8 kHz mono PCM WAVs
      // (frame count a closed-form function of doc_id), decoded with
      // javax.sound.sampled
      val media = Multimodal.packWav(Fixtures.raw(s, d, "documents"), "doc_id")
      Multimodal.decodeAudioMetaReal(media)
        .agg(sum(col("n_frames")).cast("bigint").as("total_frames"),
          min(col("sample_rate")).as("min_rate"),
          max(col("sample_rate")).as("max_rate"),
          sum(col("channels")).cast("bigint").as("mono_channels"),
          count(lit(1)).as("cnt"))
    }),
    "llm_multimodal_mp3" -> ((s, d) => {
      // REAL MP3 metadata decode graded: payloads are actual MPEG1 Layer
      // III frame streams behind an ID3v2 tag (frame count a closed-form
      // function of doc_id); the pure-Scala frame-header walk
      // (Multimodal.CompressedAudioHeaders) recovers samples/rate/duration
      val media = Multimodal.packMp3(Fixtures.raw(s, d, "documents"), "doc_id")
      Multimodal.decodeCompressedAudioMeta(media)
        .agg(sum(col("n_frames")).cast("bigint").as("total_samples"),
          min(col("sample_rate")).as("min_rate"),
          max(col("sample_rate")).as("max_rate"),
          sum(col("channels")).cast("bigint").as("mono_channels"),
          round(max(col("duration_sec")), 6).as("max_dur"),
          count(lit(1)).as("cnt"))
    }),
    "llm_multimodal_mp4" -> ((s, d) => {
      // REAL MP4 metadata decode graded: payloads are actual ISO BMFF
      // files (spec-correct nested boxes; duration/dims/frame-count are
      // closed-form functions of doc_id); the pure-Scala box walk
      // (Multimodal.Mp4Headers) recovers them from moov/mvhd/tkhd/stsz
      val media = Multimodal.packMp4(Fixtures.raw(s, d, "documents"), "doc_id")
      Multimodal.decodeVideoMeta(media)
        .agg(sum(col("n_frames")).cast("bigint").as("total_frames"),
          min(col("width")).as("min_w"),
          max(col("height")).as("max_h"),
          round(max(col("duration_sec")), 6).as("max_dur"),
          count(lit(1)).as("cnt"))
    }),
    "llm_multimodal_video" -> ((s, d) => {
      // REAL video frame decode graded end-to-end: payloads are actual
      // MJPEG AVIs (RIFF container, every frame a true ImageIO JPEG);
      // sampling walks the container and DECODES every 2nd frame — the
      // oracle pins the closed-form per-doc dims and sampled counts,
      // which only a real decode of real JPEGs reproduces. Heavier
      // per-row than the other media queries, so it runs on a fixed
      // 500-doc slice.
      val docs = Fixtures.raw(s, d, "documents").where(col("doc_id") < 500)
      val media = Multimodal.packAvi(docs, "doc_id")
      val frames = Multimodal.sampleFramesAviReal(media, everyN = 2)
      val meta = Multimodal.decodeAviMeta(media)
      val f = frames.agg(
        count(lit(1)).as("sampled_frames"),
        sum(col("width").cast("long") * col("height")).cast("bigint")
          .as("sum_px"),
        min(col("width")).as("min_w"),
        bool_and(col("width") > 0).as("all_decoded"))
      val m = meta.agg(sum(col("n_frames")).cast("bigint").as("total_frames"),
        round(max(col("duration_sec")), 6).as("max_dur"),
        count(lit(1)).as("cnt"))
      f.crossJoin(m)
    }),
    "sessionize_events" -> ((s, d) => {
      // Gap-based sessionization (Sessions): 30-min sessions over the
      // event stream, exact integer arithmetic. DuckDB's TIMESTAMP is
      // micros (it truncates the parquet nanos), so the time axis here is
      // nanos truncated to the microsecond — bit-identical on both
      // engines. One user-key shuffle feeds both windows and the rollup.
      val ev = Fixtures.raw(s, d, "events")
        .withColumn("ts_us", col("ts") - pmod(col("ts"), lit(1000L)))
      Sessions.sessionStats(ev, "user_id", "ts_us", "event_id",
          gapNs = 1800000000000L)
        .agg(count(lit(1)).as("sessions"),
          sum("n_events").cast("bigint").as("events"),
          max("span_ns").cast("bigint").as("max_span_ns"),
          max("session_seq").cast("bigint").as("max_user_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("bigint")
            .as("single_event_sessions"))
    }),
    "ts_gapfill" -> ((s, d) => {
      // Time-series resample + gap fill (Resample): hourly event counts
      // per type over a sparsified stream (user_id % 97 keeps ~1%, so the
      // hourly grid has real holes), LOCF'd and linearly interpolated
      // over each type's dense grid. All fill arithmetic derives from
      // integer counts and integer bucket indices, so the e6-integerized
      // checksums are bit-identical under DuckDB's replay. One agg
      // shuffle + one grid join + two window scans per key.
      val step = 3600000000000L // 1h in nanos
      val ev = Fixtures.raw(s, d, "events")
        .where(pmod(col("user_id"), lit(97)) === 0)
      val res = Resample.resample(ev, "ts", step, Seq("event_type"),
        Seq(count(lit(1)).cast("double").as("v")))
      Resample.gapFill(res, "event_type", "v", step)
        .groupBy("event_type").agg(
          count(lit(1)).as("grid_n"),
          sum("present").cast("bigint").as("observed_n"),
          sum(floor(col("locf") * 1e6)).cast("bigint").as("locf_e6"),
          sum(floor(col("interp") * 1e6)).cast("bigint").as("interp_e6"))
        .orderBy("event_type")
    }),
    "ts_rolling" -> ((s, d) => {
      // the monitoring-rollup chain: resample → gap fill → 24-bucket
      // trailing rolling sum/avg/min/max over the LOCF'd series. Rolling
      // runs on the dense grid (rows = steps), so the row window is a
      // time window; all inputs are integer-derived, so the e6 checksums
      // replay bit-exactly. One sort per key serves fill AND rolling.
      val step = 3600000000000L
      val ev = Fixtures.raw(s, d, "events")
        .where(pmod(col("user_id"), lit(97)) === 0)
      val res = Resample.resample(ev, "ts", step, Seq("event_type"),
        Seq(count(lit(1)).cast("double").as("v")))
      val filled = Resample.gapFill(res, "event_type", "v", step)
      Resample.rolling(filled, "event_type", "locf", windowBuckets = 24)
        .groupBy("event_type").agg(
          sum(floor(col("roll_sum") * 1e6)).cast("bigint").as("rsum_e6"),
          sum(floor(col("roll_avg") * 1e6)).cast("bigint").as("ravg_e6"),
          sum(col("roll_min")).cast("bigint").as("rmin_sum"),
          sum(col("roll_max")).cast("bigint").as("rmax_sum"),
          max(col("roll_n")).cast("bigint").as("max_n"))
        .orderBy("event_type")
    }),
    "a27_hll_mv" -> ((s, d) => {
      // Sketch-state MV (Fixtures.eventsHllMv): three thirds inserted as
      // per-(type, day) HLL states, compacted with hll_union_agg. The MV's
      // per-type estimate (one more union across days) must land within
      // 5% of the EXACT distinct-user count from raw events, and the
      // summed cnt column must match raw count(*) exactly — proving the
      // binary aggregate state survived insert → merge → read intact.
      val mv = Fixtures.eventsHllMv(s, d).read()
      val perType = mv.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("users_hll"), lit(true)))
          .as("est"),
          sum(col("cnt")).cast("bigint").as("cnt"))
      val exact = Fixtures.raw(s, d, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("_exact"),
          count(lit(1)).as("_cnt_raw"))
      perType.join(exact, Seq("event_type"))
        .select(col("event_type"),
          col("_exact").cast("bigint").as("exact_users"),
          col("cnt"),
          (abs(col("est") - col("_exact")) <= col("_exact") * 0.05)
            .as("est_ok"),
          (col("cnt") === col("_cnt_raw")).as("cnt_ok"))
        .orderBy("event_type")
    }),
    "llm_multimodal_pipeline" -> ((s, d) => {
      // full media pipeline: pack → resize (payload cap) → frame-sample;
      // resized bytes and frame counts are deterministic functions of the
      // payload, so the totals have a closed-form DuckDB oracle
      val media = Multimodal.pack(Fixtures.raw(s, d, "documents"),
        "doc_id", "text", "video/fake")
      val resized = Multimodal.resizePayload(media, maxBytes = 256)
      Multimodal.sampleFrames(resized, frameBytes = 64, everyN = 2)
        .agg(count(lit(1)).as("frames"),
          countDistinct(col("media_id")).as("media_cnt"),
          sum(length(col("frame"))).cast("bigint").as("frame_bytes"))
    }),
    "llm_wordpiece_count" -> ((s, d) => {
      // BPE-ish subword pre-tokenizer counts (TextFunctions.wordPieceCount)
      Fixtures.raw(s, d, "documents")
        .agg(sum(TextFunctions.wordPieceCount(col("text"))).cast("bigint")
          .as("total_pieces"),
          count(lit(1)).as("cnt"))
    }),
    "llm_gopher_quality" -> ((s, d) => {
      // Gopher-style repetition/shape filters (TextFunctions): per-rule
      // violation counts + kept total, replayed exactly by DuckDB list
      // lambdas. The token and bigram arrays are materialized ONCE per row
      // and every metric derives from the attributes — the HOF metrics run
      // interpreted, and re-deriving the arrays per metric column
      // multiplied the dominant cost ~10x.
      val metrics = Fixtures.raw(s, d, "documents")
        .select(col("text"), TextFunctions.tokens(col("text")).as("tk"))
        .select(col("text"), col("tk"),
          TextFunctions.ngramsFromTokens(col("tk"), 2).as("g2"))
        .select(
          size(col("tk")).as("nt"),
          when(size(col("tk")) < 2, lit(0))
            .otherwise(TextFunctions.modeCount(col("g2"))).as("mode2"),
          TextFunctions.dupSentenceFraction(col("text")).as("dupf"),
          when(size(col("tk")) <= 0, lit(0.0))
            .otherwise(aggregate(col("tk"), lit(0L), (acc, w) => acc + length(w))
              / size(col("tk")).cast("double")).as("mwl"),
          when(size(col("tk")) <= 0, lit(0.0))
            .otherwise(coalesce(size(regexp_extract_all(col("text"),
              lit("[^A-Za-z0-9\\s.,!?'\"-]"), lit(0))), lit(0))
              / size(col("tk")).cast("double")).as("symr"))
        .withColumn("top2", when(col("nt") < 2, lit(0.0))
          .otherwise(col("mode2") * 2 / col("nt").cast("double")))
      metrics.agg(
        count(lit(1)).as("total_docs"),
        sum(when((col("mode2") < 3 || col("top2") <= 0.2) &&
            col("dupf") <= 0.3 && col("mwl").between(2.0, 12.0) &&
            col("symr") <= 0.3, 1L).otherwise(0L))
          .cast("bigint").as("kept"),
        sum(when(col("mode2") >= 3 && col("top2") > 0.2, 1L).otherwise(0L))
          .cast("bigint").as("flag_repetition"),
        sum(when(col("dupf") > 0.3, 1L).otherwise(0L))
          .cast("bigint").as("flag_dup_sentences"),
        sum(when(!col("mwl").between(2.0, 12.0), 1L).otherwise(0L))
          .cast("bigint").as("flag_word_shape"),
        sum(when(col("symr") > 0.3, 1L).otherwise(0L))
          .cast("bigint").as("flag_symbols"))
    }),
    "llm_token_budget" -> ((s, d) => {
      // token-budget corpus selection (Mixing.selectTokenBudget): fill
      // HALF the corpus's total token volume with the longest documents
      // first (priority = token count, ties by doc_id, RANGE-frame
      // semantics) — DuckDB replays the same running-sum cut exactly
      val docs = Fixtures.raw(s, d, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("tk"))
      val budget = docs.agg(sum(col("tk")).cast("long")).head.getLong(0) / 2
      Mixing.selectTokenBudget(docs, "doc_id", "tk", "tk", budget)
        .agg(count(lit(1)).as("kept_docs"),
          sum("tk").cast("bigint").as("kept_tokens"),
          sum("doc_id").cast("bigint").as("sum_ids"))
    }),
    "llm_semantic_decontam" -> ((s, d) => {
      // SEMANTIC decontamination (Decontam.contaminatedSemantic): the
      // corpus (vec_id >= 8) is seeded with scaled COPIES of the 8 eval
      // embeddings (x2: cosine exactly 1, proving scale invariance);
      // only those planted leaks reach cosine 0.99 (the organic corpus
      // has no 0.99 pairs at small SF), and DuckDB re-derives every
      // flagged (id, cosine) with list_inner_product — bit-parity per
      // b24's float->double + sequential-accumulation contract
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val eval = emb.where(col("vec_id") < 8)
      val planted = eval.select((col("vec_id") + PlantOffset).as("vec_id"),
        transform(col("embedding"), x => x * 2).as("embedding"))
      val corpus = emb.where(col("vec_id") >= 8).unionByName(planted)
      Decontam.contaminatedSemantic(corpus, eval, "vec_id", "embedding",
          minCosine = 0.99)
        .select(col("vec_id"), round(col("max_cosine"), 6).as("cos6"))
        .orderBy(col("vec_id"))
    }),
    "llm_decontam" -> ((s, d) => {
      // Benchmark decontamination (Decontam): corpus docs sharing an
      // 8-gram with the eval set (here: every 50th doc, so the planted
      // benchmark docs must at minimum contaminate themselves)
      val docs = Fixtures.raw(s, d, "documents")
      val bench = docs.where(col("doc_id") % 50 === 0)
      Decontam.contaminated(docs, bench, "doc_id", "text", n = 8)
        .agg(count(lit(1)).as("contaminated_docs"),
          sum("overlap").cast("bigint").as("total_overlap"),
          max("overlap").cast("bigint").as("max_overlap"))
    }),
    "llm_bloom_decontam" -> ((s, d) => {
      // Bloom-prefiltered decontamination (Decontam.contaminatedBloom):
      // same contaminated set as the exact operator, proven by the
      // in-query agrees_exact contract (both directions of exceptAll)
      val docs = Fixtures.raw(s, d, "documents")
      val bench = docs.where(col("doc_id") % 50 === 0)
      val viaBloom = Decontam.contaminatedBloom(docs, bench, "doc_id", "text", n = 8)
      val viaExact = Decontam.contaminated(docs, bench, "doc_id", "text", n = 8)
      val agrees =
        viaBloom.exceptAll(viaExact).isEmpty && viaExact.exceptAll(viaBloom).isEmpty
      viaBloom.agg(count(lit(1)).as("contaminated_docs"),
          sum("overlap").cast("bigint").as("total_overlap"),
          max("overlap").cast("bigint").as("max_overlap"))
        .withColumn("agrees_exact", lit(agrees))
    }),
    "llm_pii_scrub" -> ((s, d) => {
      // PII redaction (TextFunctions.scrubPii): PII shapes planted
      // deterministically per doc, per-doc md5 of the scrubbed text
      // hash-compared against DuckDB replaying the same RE2-safe patterns
      Fixtures.raw(s, d, "documents")
        .select(col("doc_id"),
          md5(TextFunctions.scrubPii(concat(
            col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com ssn 123-45-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" call 555-867-5309 card 4111111111111111 from 10.1.2."),
            (col("doc_id") % 256).cast("string")))).as("fp"))
        .orderBy("doc_id")
    }),
    "llm_shard_export" -> ((s, d) => {
      // Balanced shard export (Shards): write 8 one-file shards, read the
      // export BACK FROM DISK, grade per-shard counts/char sums; the
      // boolean pins the one-file-per-shard layout contract
      val path = java.nio.file.Files.createTempDirectory("graft_shards").toString
      val docs = Fixtures.raw(s, d, "documents")
      Shards.write(docs, path, Shards.modShard(col("doc_id"), 8), 8)
      val ok = Shards.oneFilePerShard(s, path)
      Shards.read(s, path)
        .groupBy(col("shard").cast("bigint").as("shard"))
        .agg(count(lit(1)).as("rows"),
          sum(col("n_chars")).cast("bigint").as("sum_chars"))
        .withColumn("one_file_per_shard", lit(ok))
        .orderBy("shard")
    }),
    "llm_pack_sequences" -> ((s, d) => {
      // Sequence packing (Packing.scala): concat-and-chunk pack assignment
      // via a DISTRIBUTED prefix sum (no global single-partition window) —
      // total/split counts are exact DuckDB window arithmetic. The greedy
      // no-split variant adds self-verifying invariants: every pack within
      // budget, pack count within the next-fit waste bound.
      val budget = 512L
      val docs = Fixtures.raw(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("tokens"))
      val seq = Packing.packSequential(docs, "doc_id", "tokens", budget,
        numBuckets = 16)
      val greedy = Packing.packGreedy(docs, "doc_id", "tokens", budget,
        numBuckets = 16)
      val g = greedy.groupBy("pack_id")
        .agg(sum("tokens").as("pack_tokens"))
        .agg(count(lit(1)).as("n_packs"),
          max("pack_tokens").as("max_pack"),
          sum("pack_tokens").as("g_tokens")).head
      val stats = docs.agg(sum("tokens").cast("long"),
        max("tokens").cast("long")).head
      val (total, maxTok) = (stats.getLong(0), stats.getLong(1))
      val fillFloor = budget - maxTok + 1
      val greedyBound = (total + fillFloor - 1) / fillFloor + 16
      seq.agg(
        count(lit(1)).as("total_docs"),
        sum("tokens").cast("bigint").as("total_tokens"),
        (max("pack_last") + 1).cast("bigint").as("total_packs"),
        sum(when(col("pack_first") =!= col("pack_last"), 1L).otherwise(0L))
          .cast("bigint").as("docs_split"))
        .withColumn("greedy_within_budget", lit(g.getLong(1) <= budget))
        .withColumn("greedy_bound_ok", lit(g.getLong(0) <= greedyBound))
        .withColumn("greedy_conserves", lit(g.getLong(2) == total))
    }),
    "llm_dedup_groups" -> ((s, d) => {
      // grades connectedComponents with an EXACT oracle: chain edges
      // (consecutive doc_ids within each (lang, source) shard) reach the
      // full shard group only through multi-hop transitive closure — up to
      // 15 hops at sf0.01 — and the recovered components must equal the
      // shards, which DuckDB pins exactly
      val docs = Fixtures.raw(s, d, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "source").orderBy("doc_id")
      val chain = docs
        .withColumn("_prev", lag(col("doc_id"), 1).over(w))
        .where(col("_prev").isNotNull)
        .select(col("_prev").as("idA"), col("doc_id").as("idB"))
      val grouped = Dedup.connectedComponents(chain)
        .groupBy(col("component")).agg(count(lit(1)).as("_n"))
        .agg(count(lit(1)).as("n_groups"),
          coalesce(sum(col("_n")), lit(0L)).cast("bigint").as("grouped_docs"),
          coalesce(sum(col("component")), lit(0L)).cast("bigint").as("sum_roots"))
      val kept = Dedup.keepCanonical(docs, "doc_id", chain)
        .agg(count(lit(1)).as("kept_docs"))
      grouped.crossJoin(kept)
    }),
    "asof_join" -> ((s, d) => {
      // click→purchase attribution: for each purchase, the user's latest
      // prior click (classic as-of shape). Graded against DuckDB's native
      // ASOF LEFT JOIN: unmatched purchases exercise left semantics, the
      // 24h freshness bucket exercises matchedTime, and sum(click_id)
      // pins the exact matched row set.
      // events.ts reads as epoch-nanos BIGINT (see Fixtures.evTs) — the
      // as-of time axis is the raw long, exact on both engines
      val ev = Fixtures.raw(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")) // unique (key, time) right rows
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.where(col("event_type") === "purchase")
      operators.AsOf.asofJoin(purchases, clicks,
          Seq("user_id"), Seq("user_id"), "ts", "ts", payload = Seq("click_id"))
        .agg(count(lit(1)).as("purchases"),
          count(col("click_id")).as("attributed"),
          sum(when(col("ts") - col("matchedTime") <= 86400000000000L, 1L)
            .otherwise(0L)).cast("bigint").as("within_24h"),
          sum(col("click_id")).cast("bigint").as("sum_click_id"))
    }),
    "llm_ngram_dedup" -> ((s, d) => {
      // 2-gram variant of the planted-dup harness
      val pairs = Dedup.ngramJaccardPairs(
        docsWithPlanted(s, d, t => concat(t, lit(" planted dup marker"))),
        "doc_id", "text", threshold = 0.7, shingleK = 2)
      plantedSummary(pairs, col("jaccard") >= 0.7)
    }),
    "llm_data_mixing" -> ((s, d) => {
      // Deterministic proportion-targeted mixing (Mixing): rates derived
      // from per-lang counts to hit the target mixture keeping the most
      // data; the selector is portable arithmetic, so DuckDB re-derives
      // the EXACT kept row set — rates, sampling, and counts all verified
      val targets = Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
        "fr" -> 0.15, "zh" -> 0.15)
      val docs = Fixtures.raw(s, d, "documents")
      val (mixed, _) = Mixing.mixToProportions(docs, "lang", "doc_id", targets)
      mixed.groupBy("lang")
        .agg(count(lit(1)).as("kept"),
          sum(col("n_chars")).cast("bigint").as("kept_chars"))
        .orderBy("lang")
    }),
    "llm_chunking" -> ((s, d) => {
      // Token chunking with overlap (Packing.chunkTokens): 256-token
      // windows advancing by 192. Chunk counts and token sums have a
      // closed form in n_tokens that DuckDB pins exactly; the booleans
      // prove chunk_text and chunk_tokens agree under re-tokenization
      val ch = Packing.chunkTokens(
        Fixtures.raw(s, d, "documents"), "text", chunkSize = 256, overlap = 64)
      ch.withColumn("_rtok",
          size(TextFunctions.tokens(col("chunk_text"))))
        .groupBy("source")
        .agg(count(lit(1)).as("chunks"),
          sum(col("chunk_tokens").cast("long")).cast("bigint").as("sum_tokens"),
          bool_and(col("chunk_tokens") === col("_rtok")).as("tokens_consistent"),
          bool_and(col("chunk_tokens").between(1, 256)).as("all_within_size"))
        .orderBy("source")
    }),
    "llm_ann_quantized" -> ((s, d) => {
      // int8 embedding quantization (Similarity.quantizeInt8): graded on
      // BOTH contracts in-query — reconstruction error within scale/2 per
      // component, and exact top-10 over the dequantized corpus recalling
      // >= 27/30 of the float top-10
      val (emb, queries) = annInputs(s, d)
      val quant = Similarity.quantizeInt8(emb, "embedding")
      val recon = quant.select(
          aggregate(
            zip_with(col("embedding"),
              Similarity.dequantize(col("q_vec"), col("q_scale")),
              (x, y) => abs(x.cast("double") - y)),
            lit(0.0), (acc, e) => greatest(acc, e)).as("_err"),
          col("q_scale"))
        .agg(count(lit(1)).as("n_vectors"),
          bool_and(col("_err") <= col("q_scale") * 0.5 + 1e-9).as("recon_ok"))
      val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "qid", "qvec", k = 10, dim = 64)
        .select(col("qid"), col("id"), lit(1L).as("_bf"))
      val recall = Similarity.bruteForceTopKQuantized(quant, "vec_id",
          "q_vec", "q_scale", queries, "qid", "qvec", k = 10, dim = 64)
        .select(col("qid"), col("id"))
        .join(bf, Seq("qid", "id"), "left")
        .agg((sum(coalesce(col("_bf"), lit(0L))) >= 27L).as("recall_ok"))
      recon.crossJoin(recall)
    }),
    "llm_bm25_search" -> ((s, d) => {
      // BM25 ranked retrieval (Search.bm25TopK): top-10 docs for a
      // 3-term query. The per-doc score is an explicitly ordered sum of
      // per-term contributions, so DuckDB replays it bit-for-bit from the
      // same corpus stats (scores rounded to 4 decimals on both sides)
      Search.bm25TopK(Fixtures.raw(s, d, "documents"), "doc_id", "text",
        Seq("spark", "query", "window"), k = 10)
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "llm_bm25_index" -> ((s, d) => {
      // Persisted inverted index (TextIndex): postings + stats-MV ice
      // tables built in two incremental batches then compacted; the query
      // reads ONLY the 3 terms' hash-bucket partitions (log-side pruning)
      // plus the O(1)-row stats MV — never the corpus — and must
      // reproduce the full-scan BM25 (llm_bm25_search) bit-for-bit.
      val (index, stats) = Fixtures.docsTextIndex(s, d)
      TextIndex.bm25TopK(index, stats,
        Seq("spark", "query", "window"), buckets = 64, k = 10)
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "llm_bm25_sync" -> ((s, d) => {
      // Feed-maintained index (TextIndex.syncFromFeed): the corpus table
      // took a CoW update + MoR delete + fresh inserts AFTER the initial
      // build; the index followed the change feed incrementally (gen-
      // scoped delete markers retire exactly the replaced versions) and
      // must reproduce a from-scratch BM25 over the final corpus
      // bit-for-bit — DuckDB replays that final corpus directly
      val (index, stats, dels) = Fixtures.docsTextIndexSync(s, d)
      TextIndex.bm25TopK(index, stats,
        Seq("spark", "query", "window"), buckets = 64, k = 10,
        deletes = Some(dels))
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "llm_minhash_sync" -> ((s, d) => {
      // Feed-synced signature index (SigIndex.syncFromFeed): after the
      // corpus table rewrote %31==7 long docs (reversed tokens) and
      // MoR-deleted %31==8, probes built from the ORIGINAL texts must
      // no longer match their retired sources, while probes of untouched
      // %31==9 docs must still find theirs
      val (bands, sigs, marks) = Fixtures.docsSigIndexSync(s, d)
      val docs = Fixtures.raw(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val long = length(col("text")) >= 400
      val retiredProbes = docs
        .where(long && (pmod(col("doc_id"), lit(31)) === 7 ||
          pmod(col("doc_id"), lit(31)) === 8))
        .select((col("doc_id") + PlantOffset).as("doc_id"),
          concat(col("text"), lit(" extra trailing words here")).as("text"))
      val liveProbes = docs
        .where(long && pmod(col("doc_id"), lit(31)) === 9)
        .select((col("doc_id") + 2 * PlantOffset).as("doc_id"),
          concat(col("text"), lit(" extra trailing words here")).as("text"))
      val m = SigIndex.nearDupsAgainstIndex(bands, sigs,
        retiredProbes.unionByName(liveProbes), "doc_id", "text",
        threshold = 0.5, marks = Some(marks)).cache()
      val found = m.where(col("batch_id") - lit(2 * PlantOffset) === col("hist_id"))
        .select(countDistinct("batch_id")).head.getLong(0)
      val retired = m.where(col("batch_id") - lit(PlantOffset) === col("hist_id"))
        .count()
      import s.implicits._
      Seq((found, retired)).toDF("planted_found", "retired_matched")
    }),
    "llm_text_normalize" -> ((s, d) => {
      // Web-text cleaning chain (TextFunctions.normalizeText): markup
      // strip -> entity unescape -> smart-punctuation/NBSP/control
      // normalization -> whitespace collapse, planted deterministically
      // per doc and graded by per-doc md5 against DuckDB replaying the
      // identical regexp chain.
      Fixtures.raw(s, d, "documents")
        .select(col("doc_id"),
          md5(TextFunctions.normalizeText(concat(
            col("text"),
            lit("  <p id=\"x\">Q&amp;A</p> “smart” – ‘quotes’&nbsp;"),
            col("doc_id").cast("string"),
            lit("end")))).as("fp"))
        .orderBy("doc_id")
    }),
    "llm_hybrid_search" -> ((s, d) => {
      // Hybrid retrieval (Search.rrfFuse): BM25 top-20 (sparse) fused
      // with exact-cosine top-20 for query vector 0 (dense) by
      // reciprocal-rank fusion over the shared doc/vec id space. Both
      // rankings replay bit-for-bit in DuckDB (proven separately by
      // llm_bm25_search / llm_ann_bruteforce); this grades the fusion
      // arithmetic and the final ordering.
      import org.apache.spark.sql.expressions.Window
      val docs = Fixtures.raw(s, d, "documents")
      val emb = Fixtures.raw(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val sparse = Search.bm25TopK(docs, "doc_id", "text",
          Seq("spark", "query", "window"), k = 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val q0 = emb.where(col("vec_id") === 0L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val dense = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          q0, "qid", "qvec", k = 20, dim = 64)
        .select(col("id").as("doc_id"), col("rank"))
      Search.rrfFuse(Seq(sparse, dense), "doc_id", "rank", k0 = 60, k = 10)
    }),
    "llm_vocab_coverage" -> ((s, d) => {
      // Vocabulary build + coverage (Vocab): top-25 vocabulary with the
      // deterministic (freq desc, term) tie-break, then corpus coverage
      // of it — counts and one division, all exactly replayable
      val docs = Fixtures.raw(s, d, "documents")
      val vocab = Vocab.build(docs, "text", size = 25)
      val vstats = vocab.agg(count(lit(1)).as("vocab_size"),
        min("freq").as("vocab_min_freq"),
        max("freq").as("vocab_max_freq"))
      Vocab.coverage(docs, "text", vocab).crossJoin(vstats)
    }),
    "llm_span_dedup" -> ((s, d) => {
      // Exact-substring span dedup (SpanDedup.dedupSpans): plant a
      // 10-token globally-unique span onto docs 0-4 and grade that the
      // smallest-id doc keeps it verbatim while the other four are
      // scrubbed (>= 10 tokens removed — organic cross-doc 8-gram repeats
      // exist in the fixture, so exact whole-corpus arithmetic would be
      // data-dependent; the planted invariants are not). `counts_ok`
      // re-tokenizes every clean_text and checks kept_tokens arithmetic.
      val span = (0 until 10).map(i => s"zzspanw$i").mkString(" ")
      val docs = Fixtures.raw(s, d, "documents")
      val dirty = docs.select(col("doc_id"),
        when(col("doc_id") < 5, concat(col("text"), lit(" " + span)))
          .otherwise(col("text")).as("dirty"))
      val out = SpanDedup.dedupSpans(dirty, "doc_id", "dirty", n = 8)
      out.agg(
        count(lit(1)).as("docs"),
        sum(when(col("doc_id").between(1, 4) &&
            !col("clean_text").contains("zzspanw") &&
            col("removed_tokens") >= 10, 1L).otherwise(0L))
          .as("span_scrubbed"),
        bool_and(when(col("doc_id") === 0,
            col("clean_text").endsWith(span)).otherwise(lit(true)))
          .as("canonical_intact"),
        bool_and(col("kept_tokens") ===
            TextFunctions.tokenCount(col("clean_text")).cast("bigint"))
          .as("counts_ok"))
    }),
    "llm_boilerplate_dedup" -> ((s, d) => {
      // Cross-doc boilerplate removal (Dedup.stripBoilerplate): plant two
      // boilerplate sentences on doc_id%2 / doc_id%5, strip sentences
      // appearing in >= 30 docs, and grade that every doc is restored to
      // exactly its original (normalized) text — plus removal arithmetic
      val docs = Fixtures.raw(s, d, "documents")
      val planted = docs.select(col("doc_id"), col("text"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit(". subscribe to our newsletter today")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit(". all rights reserved")).otherwise(lit(""))).as("dirty"))
      val origSents = lit(1) +
        when(col("doc_id") % 2 === 0, 1).otherwise(0) +
        when(col("doc_id") % 5 === 0, 1).otherwise(0)
      Dedup.stripBoilerplate(planted, "doc_id", "dirty", minDocs = 30)
        .join(planted, Seq("doc_id"))
        .agg(count(lit(1)).as("docs"),
          sum(col("kept_sentences")).cast("bigint").as("kept_sentences"),
          sum(origSents - col("kept_sentences")).cast("bigint")
            .as("removed_occurrences"),
          bool_and(col("clean_text") === lower(trim(col("text"))))
            .as("restored"))
    }),
    "llm_heavy_hitters" -> ((s, d) => {
      // Heavy hitters: exact threshold counts (oracle replays them) +
      // count-min estimates checked in-query against the CMS guarantees —
      // never under truth, within eps*N above it (seeded, deterministic)
      val ev = Fixtures.raw(s, d, "events").select(col("user_id"))
      val heavy = Sketches.heavyHitters(ev, "user_id", threshold = 40L)
        .persist()
      try {
        val cms = Sketches.countMin(ev, "user_id", eps = 0.0001,
          confidence = 0.99, seed = 7)
        val total = ev.count()
        val bound = math.ceil(0.0001 * total).toLong
        val rows = heavy.collect() // heavy-hitter list: small by definition
        val ok = rows.forall { r =>
          val est = cms.estimateCount(r.getLong(0))
          est >= r.getLong(1) && est <= r.getLong(1) + bound
        }
        heavy.agg(count(lit(1)).as("n_heavy"),
          max("cnt").cast("bigint").as("max_cnt"),
          sum("cnt").cast("bigint").as("sum_cnt"))
          .withColumn("cms_within_bounds", lit(ok))
      } finally heavy.unpersist()
    }),
    "llm_hll_shards" -> ((s, d) => {
      // Mergeable per-shard HLL sketches: distinct users per event_type
      // shard, merged into ONE estimate without rescanning — graded
      // against the exact global distinct count (within 5%) plus the
      // exact shard count the oracle replays
      val ev = Fixtures.raw(s, d, "events")
      val sketches = Sketches.hllPerShard(ev, "event_type", "user_id")
      val est = Sketches.hllMergedEstimate(sketches).head().getLong(0)
      ev.agg(countDistinct(col("user_id")).as("exact_distinct"),
        countDistinct(col("event_type")).as("n_shards"))
        .withColumn("hll_within_5pct",
          abs(lit(est) - col("exact_distinct")) <=
            col("exact_distinct") * 0.05)
    }),
    "llm_sample_exact" -> ((s, d) => {
      // Exact-N deterministic stratified sample (Mixing.sampleExactN):
      // 20 docs per lang by smallest multiplicative-hash draw — DuckDB
      // re-derives the identical kept set from the same arithmetic
      val got = Mixing.sampleExactN(
        Fixtures.raw(s, d, "documents"), "lang", "doc_id", n = 20)
      got.groupBy("lang")
        .agg(count(lit(1)).as("kept"),
          sum("doc_id").cast("bigint").as("sum_ids"))
        .orderBy("lang")
    }),
    "llm_tfidf" -> ((s, d) => {
      // TF-IDF vector norms (Search.tfidfNorm) for a 3-term vocabulary:
      // graded on order-independent aggregates (count, matched, max) —
      // the norm itself is a fixed-order sum DuckDB replays exactly
      val norms = Search.tfidfNorm(Fixtures.raw(s, d, "documents"),
        "doc_id", "text", Seq("spark", "query", "window"))
      norms.agg(count(lit(1)).as("n_docs"),
        sum(when(col("tfidf_norm") > 0, 1L).otherwise(0L)).cast("bigint")
          .as("matched"),
        round(max(col("tfidf_norm")), 4).as("max_norm"))
    }),
    "llm_bloom_dedup" -> ((s, d) => {
      // Bloom-membership dedup (BloomDedup): the corpus summarized as a
      // distributed bloom_filter_agg; 10 planted redeliveries must drop
      // (bloom hit → verified true dup), fresh docs keep (miss path or
      // verified false positive). `bloom_pruned` is the in-query proof the
      // bits actually shrink the verification join's left side.
      val docs = Fixtures.raw(s, d, "documents")
      val seenDocs = docs.where(col("doc_id") < 250)
      val planted = seenDocs.orderBy("doc_id").limit(10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val newBatch = docs.where(col("doc_id") >= 250)
        .select(col("doc_id"), col("text")).unionByName(planted)
      val total = newBatch.count()
      val bits = operators.BloomDedup.build(
        seenDocs, Seq("text"), expectedItems = 10000)
      val hits = newBatch.where(
        operators.BloomDedup.mightContain(bits, Seq("text"))).count()
      operators.BloomDedup.dedupAgainst(newBatch, Seq("text"), "doc_id",
          bits, operators.BloomDedup.hashes64(seenDocs, Seq("text")))
        .agg(count(lit(1)).as("kept_docs"),
          sum("doc_id").cast("bigint").as("sum_ids"))
        .withColumn("dropped", lit(total) - col("kept_docs"))
        .withColumn("bloom_pruned", lit(hits < total / 2))
    }),
    "llm_incremental_dedup" -> ((s, d) => {
      // Incremental dedup (Dedup.incrementalDedup): new batch checked
      // against the persisted content-hash index of already-ingested docs
      // — 10 planted redeliveries of seen docs must drop, the rest keep.
      // DuckDB replays the md5 index, the anti-join, and the window
      val docs = Fixtures.raw(s, d, "documents")
      val seenDocs = docs.where(col("doc_id") < 250)
      val planted = seenDocs.orderBy("doc_id").limit(10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val newBatch = docs.where(col("doc_id") >= 250)
        .select(col("doc_id"), col("text")).unionByName(planted)
      val total = newBatch.count()
      Dedup.incrementalDedup(newBatch, Seq("text"), "doc_id",
          Dedup.contentHashes(seenDocs, Seq("text")))
        .agg(count(lit(1)).as("kept_docs"),
          sum("doc_id").cast("bigint").as("sum_ids"))
        .withColumn("dropped", lit(total) - col("kept_docs"))
    }),
    "analyze_profile" -> ((s, d) => {
      // ANALYZE-style column profiler (Profile.profile): one-pass fused
      // aggregates, exact distincts; integer/string columns only so every
      // emitted stat (incl. avg = exact integer sum / count) is
      // bit-replayable
      operators.Profile.profile(
          Fixtures.raw(s, d, "events")
            .select("event_id", "user_id", "event_type"),
          exact = true)
        .orderBy("column")
    }),
    "llm_domain_cap" -> ((s, d) => {
      // Per-domain contribution cap (Mixing.capPerKey): pseudo-domains
      // from (source, doc_id%7), keep the 5 lowest doc_ids per domain —
      // DuckDB replays the identical window arithmetic for the exact
      // kept set (summed ids pin it, not just counts)
      val docs = Fixtures.raw(s, d, "documents")
        .withColumn("domain", concat(col("source"), lit("/"),
          (col("doc_id") % 7).cast("string")))
      Mixing.capPerKey(docs, "domain", "doc_id", maxPerKey = 5)
        .groupBy("source")
        .agg(count(lit(1)).as("kept"),
          sum("doc_id").cast("bigint").as("sum_ids"))
        .orderBy("source")
    }),
    "range_join" -> ((s, d) => {
      // Windowed co-occurrence join (RangeJoin.windowJoin): ALL clicks in
      // the 24h before each purchase, same user — bucketed equi-join, not
      // an inequality sort-merge. Graded pair-exactly against DuckDB's
      // native range join; ts is epoch-nanos long on the Spark side
      val ev = Fixtures.raw(s, d, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = ev.where(col("event_type") === "purchase")
      operators.RangeJoin.windowJoin(purchases, clicks,
          Seq("user_id"), Seq("user_id"), "ts", "ts",
          before = 86400000000000L, after = 0L, payload = Seq("click_id"))
        .agg(count(lit(1)).as("pairs"),
          countDistinct(col("event_id")).as("purchases_matched"),
          sum(col("click_id")).cast("bigint").as("sum_click_ids"))
    }),
    "llm_bpe_tokenizer" -> ((s, d) => {
      // Distributed BPE tokenizer (Bpe.train/encode): 40 merges learned
      // over the word-frequency table, corpus re-encoded with the learned
      // ranks. Graded on replayable word/char totals plus contract
      // invariants: exact decode(encode(text)) round trip on EVERY doc,
      // per-doc token counts within [words, chars + words], and strict
      // corpus-level compression (the top learned pair has freq >= 2 by
      // construction, so >= 1 merge must fire).
      val docs = Fixtures.raw(s, d, "documents")
      val model = Bpe.train(docs, "text", numMerges = 40)
      val enc = Bpe.encode(docs, "doc_id", "text", model)
      enc.join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          Bpe.decode(col("tokens")).as("dec"),
          concat_ws(" ", TextFunctions.tokens(col("text"))).as("norm"),
          TextFunctions.tokenCount(col("text")).cast("long").as("words"),
          length(regexp_replace(col("text"), "\\s", "")).cast("long").as("chars"))
        .agg(count(lit(1)).as("docs"),
          sum("words").cast("bigint").as("total_words"),
          sum("chars").cast("bigint").as("total_chars"),
          lit(model.merges.size.toLong).as("merges_learned"),
          bool_and(col("dec") === col("norm")).as("roundtrip_ok"),
          bool_and(col("n_tokens").between(col("words"),
            col("chars") + col("words"))).as("tokens_bounded"),
          (sum("n_tokens") < sum(col("chars") + col("words")))
            .as("compressed"))
    }),
    "llm_lm_perplexity" -> ((s, d) => {
      // CCNet-style LM quality scoring (LangModel): bigram Stupid-Backoff
      // model trained on the doc_id%5!=0 split, held-out 20% scored and
      // bucketed on fixed integer thresholds. The graded score is the
      // integer-scaled mean transition probability (floor(1e6*s) summed,
      // floored mean) — IEEE div/mul are correctly rounded, so DuckDB
      // replays the entire train+score pipeline bit-exactly.
      val docs = Fixtures.raw(s, d, "documents")
      val m = LangModel.train(docs.where(col("doc_id") % 5 =!= 0), "text")
      val scored = LangModel.scoreDocs(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text", m)
      LangModel.bucket(scored, headMin = 33900L, tailMax = 32200L)
        .agg(count(lit(1)).as("scored_docs"),
          sum("n_transitions").cast("bigint").as("sum_transitions"),
          sum(coalesce(col("prob_e6"), lit(0L))).cast("bigint")
            .as("sum_prob_e6"),
          sum(when(col("bucket") === "head", 1L).otherwise(0L))
            .cast("bigint").as("head_docs"),
          sum(when(col("bucket") === "middle", 1L).otherwise(0L))
            .cast("bigint").as("middle_docs"),
          sum(when(col("bucket") === "tail", 1L).otherwise(0L))
            .cast("bigint").as("tail_docs"))
    }),
    "llm_url_curation" -> ((s, d) => {
      // URL hygiene (UrlOps): deterministic synthetic URLs derived from
      // (doc_id, source, lang) — mixed case, www, explicit default
      // ports, tracking params, fragments, a co.uk multi-part suffix —
      // normalized + domain-extracted + blocklist-filtered. The oracle
      // knows the closed form of every input, so it re-derives the
      // expected normalized URL and registrable domain per doc directly;
      // every kept row is hash-compared.
      val docs = Fixtures.raw(s, d, "documents")
      val url = concat(
        when(col("doc_id") % 3 === 0, lit("HTTP://")).otherwise(lit("https://")),
        when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("")),
        col("source"),
        when(col("doc_id") % 4 === 1, lit(".co.uk")).otherwise(lit(".com")),
        when(col("doc_id") % 3 === 0, lit(":80")).otherwise(lit("")),
        lit("/"), col("lang"), lit("/"), col("doc_id").cast("string"),
        when(col("doc_id") % 5 === 0,
          concat(lit("?utm_source=feed&gclid=g&id="), col("doc_id").cast("string")))
          .otherwise(concat(lit("?id="), col("doc_id").cast("string"))),
        when(col("doc_id") % 7 === 0, lit("#frag")).otherwise(lit("")))
      val withUrl = docs.withColumn("url", url)
      UrlOps.filterBlocklist(withUrl, "url", Seq("src0.com", "src1.co.uk"))
        .select(col("doc_id"),
          UrlOps.registrableDomain(col("url")).as("domain"),
          UrlOps.normalize(col("url")).as("norm_url"))
        .orderBy("doc_id")
    }),
    "llm_train_order" -> ((s, d) => {
      // Deterministic, engine-portable training order
      // (Mixing.portableShuffle): global sort by the Knuth multiplicative
      // draw. Graded on the first 20 docs of the epoch WITH their draws —
      // DuckDB re-derives the identical order from the same arithmetic.
      val docs = Fixtures.raw(s, d, "documents")
      Mixing.portableShuffle(docs, "doc_id")
        .select(col("doc_id"), Mixing.uniform(col("doc_id")).as("draw"))
        .limit(20)
    }),
    "llm_nb_classifier" -> ((s, d) => {
      // Model-based quality filtering (Classifier): plant two perfectly
      // class-indicative tokens per doc (label = doc_id parity), train
      // multinomial NB on the doc_id%5!=0 split, classify the held-out
      // 20%. The planted log-ratio (~2.3 decades per token, two tokens)
      // dominates any base-text imbalance, so held-out decisions must be
      // exact; vocabulary and per-class doc counts replay in DuckDB.
      val docs = Fixtures.raw(s, d, "documents")
      val planted = docs.select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" qgooda qgoodb"))
            .otherwise(lit(" qbada qbadb"))).as("ptext"),
        when(col("doc_id") % 2 === 0, lit("good")).otherwise(lit("bad"))
          .as("label"))
      val train = planted.where(col("doc_id") % 5 =!= 0)
      val held = planted.where(col("doc_id") % 5 === 0)
      val m = Classifier.trainNaiveBayes(train, "ptext", "label")
      Classifier.classify(held, "doc_id", "ptext", m)
        .join(held.select("doc_id", "label"), Seq("doc_id"))
        .agg(count(lit(1)).as("held_docs"),
          sum(when(col("pred") === col("label"), 1L).otherwise(0L))
            .cast("bigint").as("correct"),
          sum(when(col("pred") === "good", 1L).otherwise(0L))
            .cast("bigint").as("pred_good"),
          lit(m.vocabSize).as("vocab_size"),
          lit(m.totalDocs).as("train_docs"),
          lit(m.stats("good").docs).as("train_good_docs"))
    }),
    "llm_dsir_select" -> ((s, d) => {
      // DSIR importance resampling (Dsir): target = the doc_id%7==0
      // "trusted" split, raw = the rest; hashed unigram+bigram
      // multinomials at m=1024, every raw doc scored by its summed
      // per-bucket integer log-ratio, top-20 most target-like kept.
      // Fully replayable: the oracle re-derives the portable 31-ary
      // polynomial hash, the smoothed floored log-ratio table, and the
      // exact selected head with weights.
      val docs = Fixtures.raw(s, d, "documents")
      val target = docs.where(col("doc_id") % 7 === 0)
      val raw = docs.where(col("doc_id") % 7 =!= 0)
      val model = Dsir.fit(target, raw, "text", m = 1024)
      val scored = Dsir.score(raw, "doc_id", "text", model)
      Dsir.selectTopK(scored, "doc_id", 20)
        .select(col("doc_id"), col("n_features").cast("long").as("n_features"),
          col("weight_e6").cast("long").as("weight_e6"))
    }),
    "llm_temperature_mix" -> ((s, d) => {
      // Temperature-flattened mixture (Mixing.temperatureQuotas/
      // sampleQuotas): per-lang share ~ count^0.5, Hamilton-apportioned
      // to exactly 200 rows in pure bigint arithmetic, each lang
      // contributing its smallest-draw head. DuckDB replays the weights
      // (sqrt is correctly rounded), the apportionment, and the exact
      // kept sets.
      import s.implicits._
      val docs = Fixtures.raw(s, d, "documents")
      val quotas = Mixing.temperatureQuotas(docs, "lang", total = 200L)
      val kept = Mixing.sampleQuotas(docs, "lang", "doc_id", quotas)
      val qDf = quotas.toSeq.toDF("lang", "quota")
      kept.groupBy("lang")
        .agg(count(lit(1)).as("kept"),
          sum("doc_id").cast("bigint").as("sum_ids"))
        .join(broadcast(qDf), Seq("lang"))
        .select(col("lang"), col("quota"), col("kept"), col("sum_ids"))
        .orderBy("lang")
    }),
    "llm_e2e_pipeline" -> ((s, d) => {
      // The whole curation pipeline COMPOSED end-to-end — quality filter
      // -> exact dedup -> benchmark decontamination -> per-source cap —
      // each stage an operator graded on its own elsewhere; this query
      // grades their composition (stage order, column threading, and the
      // exact surviving set). One corpus scan feeds stage 1; dedup and
      // cap are one window shuffle each; decontam joins map-side against
      // the broadcast benchmark grams.
      val docs = Fixtures.raw(s, d, "documents")
      // stage 1: Gopher-style repetition/shape keep (llm_gopher_quality's
      // exact rules, per-doc)
      val flags = docs
        .select(col("doc_id"), col("source"), col("text"),
          TextFunctions.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("source"), col("text"), col("tk"),
          TextFunctions.ngramsFromTokens(col("tk"), 2).as("g2"))
        .select(col("doc_id"), col("source"), col("text"),
          size(col("tk")).as("nt"),
          when(size(col("tk")) < 2, lit(0))
            .otherwise(TextFunctions.modeCount(col("g2"))).as("mode2"),
          TextFunctions.dupSentenceFraction(col("text")).as("dupf"),
          when(size(col("tk")) <= 0, lit(0.0))
            .otherwise(aggregate(col("tk"), lit(0L), (acc, w) => acc + length(w))
              / size(col("tk")).cast("double")).as("mwl"),
          when(size(col("tk")) <= 0, lit(0.0))
            .otherwise(coalesce(size(regexp_extract_all(col("text"),
              lit("[^A-Za-z0-9\\s.,!?'\"-]"), lit(0))), lit(0))
              / size(col("tk")).cast("double")).as("symr"))
        .withColumn("top2", when(col("nt") < 2, lit(0.0))
          .otherwise(col("mode2") * 2 / col("nt").cast("double")))
      val quality = flags.where((col("mode2") < 3 || col("top2") <= 0.2) &&
          col("dupf") <= 0.3 && col("mwl").between(2.0, 12.0) &&
          col("symr") <= 0.3)
        .select("doc_id", "source", "text")
      // stage 2: exact content dedup, keep the smallest doc_id
      val deduped = Dedup.exactDedup(quality, Seq("text"), "doc_id")
      // stage 3: drop docs sharing an 8-gram with the benchmark split
      val bench = docs.where(col("doc_id") % 50 === 0)
      val contam = Decontam.contaminated(deduped, bench, "doc_id", "text", n = 8)
      val clean = deduped.join(contam.select("doc_id"), Seq("doc_id"), "left_anti")
      // stage 4: per-source contribution cap
      val capped = Mixing.capPerKey(clean, "source", "doc_id", maxPerKey = 40)
      capped.groupBy("source")
        .agg(count(lit(1)).as("kept"),
          sum("doc_id").cast("bigint").as("sum_ids"))
        .orderBy("source")
    }),
    "llm_epoch_upsample" -> ((s, d) => {
      // Fractional-epoch upsampling (Mixing.upsampleEpochs): en seen 1.5
      // epochs, zh 2.25, de dropped, others once. Graded per lang on
      // emitted rows, distinct docs, copy-index sum, and the exact id-sum
      // of the fractional heads — DuckDB re-derives the uniform(doc_id)
      // draw that decides every extra copy.
      val docs = Fixtures.raw(s, d, "documents")
      val up = Mixing.upsampleEpochs(docs, "lang", "doc_id",
        Map("en" -> 1.5, "zh" -> 2.25, "de" -> 0.0))
      up.groupBy("lang")
        .agg(count(lit(1)).as("rows_out"),
          countDistinct(col("doc_id")).as("docs_in"),
          sum("_epoch").cast("bigint").as("sum_epoch"),
          sum(when(col("_epoch") > floor(when(col("lang") === "en", 1.5)
              .when(col("lang") === "zh", 2.25).otherwise(1.0)).cast("long"),
            col("doc_id")).otherwise(0L)).cast("bigint").as("sum_extra_ids"))
        .orderBy("lang")
    }))

  /** DuckDB oracle per query — EVERY registered query carries one: the
    * nondeterministic / LSH / heuristic operators grade constant-row
    * summaries (planted-dup recovery counts, in-query recall bounds,
    * contract invariants) instead of raw dumps. */
  def oracleSql: Map[String, String] = Map(
    "a1_insert_count" -> "SELECT count(*) AS cnt FROM events",
    "a9_time_travel" ->
      "SELECT count(*) AS cnt FROM events WHERE event_id % 2 = 0",
    "a10_merge_stability" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "a15_tombstone_cleanup" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "a31_checkpoint" ->
      ("SELECT event_type, count(*) AS cnt, true AS ckpt_consistent " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "a16_remove_partitions" ->
      "SELECT count(*) AS cnt FROM events WHERE strftime(ts, '%Y-%m-%d') > '2024-01-07'",
    "a17_rewrite_partition" ->
      "SELECT count(*) AS cnt FROM events WHERE NOT (strftime(ts, '%Y-%m-%d') = '2024-01-01' AND user_id % 10 = 0)",
    "a6_schema_evolution" ->
      "SELECT count(*) AS cnt, CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS null_props FROM events",
    "a12_agg_merge" ->
      "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "a36_upsert" ->
      ("WITH src AS (SELECT event_id, user_id, 'upserted' AS event_type FROM events WHERE user_id % 13 = 2 " +
        "UNION ALL SELECT event_id + 10000000, user_id, 'new' FROM events WHERE user_id % 13 = 2), " +
        "merged AS (SELECT event_id, event_type FROM events " +
        "WHERE event_id NOT IN (SELECT event_id FROM src) " +
        "UNION ALL SELECT event_id, event_type FROM src) " +
        "SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM merged GROUP BY event_type ORDER BY event_type"),
    "a35_row_update" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id FROM (" +
        "SELECT CASE WHEN user_id % 17 = 5 THEN 'redacted' ELSE event_type END AS event_type, " +
        "event_id FROM events WHERE user_id % 17 != 6) " +
        "GROUP BY event_type ORDER BY event_type"),
    "a34_row_deletes" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid, " +
        "true AS mor_equals_cow FROM events WHERE user_id % 10 != 3 " +
        "GROUP BY event_type ORDER BY event_type"),
    "a37_dv_visibility" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid, " +
        "true AS surfaces_agree FROM events WHERE user_id % 10 != 7 " +
        "GROUP BY event_type ORDER BY event_type"),
    "a40_manifest_export" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid, " +
        "true AS manifest_exact FROM events GROUP BY event_type ORDER BY event_type"),
    "a42_stream_change_feed" ->
      ("WITH ev AS (SELECT event_id, user_id FROM events), " +
        "changes AS (" +
        "SELECT 'insert' AS _change_type, event_id FROM ev " +
        "UNION ALL SELECT 'insert', event_id FROM ev WHERE user_id % 23 = 7 " +
        "UNION ALL SELECT 'delete', event_id FROM ev WHERE user_id % 23 = 7 " +
        "UNION ALL SELECT 'delete', event_id FROM ev WHERE user_id % 23 = 8) " +
        "SELECT _change_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM changes GROUP BY 1 ORDER BY 1"),
    "a41_change_feed" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type FROM events), " +
        "changes AS (" +
        "SELECT 'insert' AS _change_type, event_id, event_type FROM ev WHERE event_id % 2 = 1 " +
        "UNION ALL SELECT 'insert', event_id, 'redacted' FROM ev WHERE user_id % 23 = 7 " +
        "UNION ALL SELECT 'delete', event_id, event_type FROM ev WHERE user_id % 23 = 7 " +
        "UNION ALL SELECT 'delete', event_id, event_type FROM ev WHERE user_id % 23 = 8) " +
        "SELECT _change_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "count(DISTINCT event_type) AS types " +
        "FROM changes GROUP BY 1 ORDER BY 1"),
    "b41_sql_show_create" ->
      ("SELECT true AS has_partition, true AS has_sort, true AS roundtrip_ok, " +
        "CAST(3 AS BIGINT) AS n_cols"),
    "b42_meta_partitions" ->
      ("SELECT concat('m=', strftime(l_shipdate, '%Y-%m')) AS partition, " +
        "count(*) AS row_count FROM lineitem GROUP BY 1 ORDER BY 1"),
    "b43_meta_files" ->
      ("SELECT count(*) AS total_rows, " +
        "count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS n_parts, " +
        "true AS all_nonempty FROM lineitem"),
    "b44_bucket_join" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    "b45_analyze" ->
      ("WITH s AS (" +
        "SELECT 'l_orderkey' AS \"column\", count(DISTINCT l_orderkey) AS ndv, " +
        "CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count, " +
        "CAST(min(l_orderkey) AS VARCHAR) AS min, CAST(max(l_orderkey) AS VARCHAR) AS max, " +
        "count(*) AS row_count FROM lineitem " +
        "UNION ALL " +
        "SELECT 'l_returnflag', count(DISTINCT l_returnflag), " +
        "CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT), " +
        "CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR), " +
        "count(*) FROM lineitem) " +
        "SELECT \"column\", ndv, null_count, min, max, row_count FROM s " +
        "ORDER BY \"column\""),
    // DuckDB replays the proxied-mirror content from the raw events; the
    // booleans pin byte-exact transfer and manifest-exact paged listing
    "a45_s3_proxy" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS bytes_identical, true AS paged_ok " +
        "FROM events WHERE event_id % 4 = 0 " +
        "GROUP BY event_type ORDER BY event_type"),
    // DuckDB replays the content from the raw source; the boolean pins
    // that the proxy really truncated GETs and the client's retries
    // still counted every row
    "a46_s3_retry" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS retries_exercised " +
        "FROM events WHERE event_id % 4 = 1 " +
        "GROUP BY event_type ORDER BY event_type"),
    // DuckDB replays the SQL-DML'd, published branch state from raw
    // events; the booleans pin SQL≡API state equality, pre-publish
    // isolation, and the time-travel read
    "b46_sql_branch_dml" ->
      ("WITH base AS (SELECT event_id, user_id, event_type FROM events " +
        "WHERE event_id % 5 IN (0, 1)), " +
        "red AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM base WHERE user_id % 23 <> 8), " +
        "fin AS (SELECT event_id, user_id, event_type FROM red WHERE event_id % 10 <> 0 " +
        "UNION ALL SELECT event_id, user_id, 'merged' FROM events WHERE event_id % 10 = 0) " +
        "SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS sql_api_match, true AS branch_isolated, true AS time_travel_ok " +
        "FROM fin GROUP BY event_type ORDER BY event_type"),
    // the aggregate is the DuckDB-checkable part; the booleans pin that
    // persisted ANALYZE stats flipped the join to broadcast under CBO
    // while the same plan sort-merges without them
    "b47_cbo_join" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS qty, " +
        "true AS cbo_broadcast, true AS nocbo_smj " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_custkey = 7 GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // the aggregate is the DuckDB-checkable part; the boolean pins that
    // with persisted rowCount/ndv on every leaf, CBO's JoinReorderDP
    // moved the selective customer dimension off the syntactic tail
    "b48_cbo_reorder" ->
      ("SELECT c_mktsegment, count(*) AS cnt, " +
        "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS qty, " +
        "true AS reordered " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_nationkey = 3 GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    // DuckDB replays min/max/count from the raw rows; the booleans pin
    // the LocalRelation rewrite on covered columns and the scan fallback
    // on an uncovered one
    "b54_meta_minmax" ->
      ("SELECT count(*) AS cnt, min(event_id) AS min_id, max(event_id) AS max_id, " +
        "max(\"value\") AS max_val, true AS metadata_only, true AS uncovered_scans " +
        "FROM events WHERE event_id % 4 = 2"),
    // DuckDB counts the raw rows; the booleans pin the LocalRelation
    // rewrite on the bare count and the scan fallback under a filter
    "b53_meta_count" ->
      ("SELECT count(*) AS cnt, true AS metadata_only, true AS filtered_scans " +
        "FROM lineitem"),
    // the salted rewrite must be invisible in the result: DuckDB computes
    // the PLAIN join over the same skewed key
    "b51_skew_join" ->
      ("WITH ev AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 100 < 90 THEN 0 ELSE user_id % 100 END AS k FROM events), " +
        "dim AS (SELECT DISTINCT k, k * 7 AS label FROM ev) " +
        "SELECT label, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM ev JOIN dim USING (k) GROUP BY label ORDER BY label"),
    // the aggregate is the DuckDB-checkable part; the boolean pins the
    // node-typed bloom filter in the shuffling plan
    "b52_runtime_filter" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty, true AS bloom_injected " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_custkey = 7 GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // the aggregate is the DuckDB-checkable part; the booleans pin that
    // the persisted equi-height histogram pulled the optimizer's range
    // estimate within 2× of truth where the uniform estimate was off
    "b50_cbo_histogram" ->
      ("SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS hist_closer, true AS hist_tight, true AS uniform_loose " +
        "FROM events WHERE value <= 100"),
    // DuckDB replays the branch head (seed ∪ insert batch, update
    // applied); the booleans pin SQL branch TIMESTAMP AS OF and
    // table_changes('t@wap', …) hash-matching their API twins
    "b49_sql_branch_travel" ->
      ("WITH br AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 4 = 1 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE event_id % 7 = 0 OR event_id % 7 = 1) " +
        "SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS travel_ok, true AS changes_ok " +
        "FROM br GROUP BY event_type ORDER BY event_type"),
    "b40_sql_changes" ->
      ("WITH ev AS (SELECT event_id, user_id, event_type FROM events), " +
        "changes AS (" +
        "SELECT 'insert' AS _change_type, event_id, event_type FROM ev WHERE event_id % 2 = 1 " +
        "UNION ALL SELECT 'insert', event_id, 'redacted' FROM ev WHERE user_id % 23 = 7 " +
        "UNION ALL SELECT 'delete', event_id, event_type FROM ev WHERE user_id % 23 = 7 " +
        "UNION ALL SELECT 'delete', event_id, event_type FROM ev WHERE user_id % 23 = 8) " +
        "SELECT _change_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "count(DISTINCT event_type) AS types " +
        "FROM changes GROUP BY 1 ORDER BY 1"),
    "a43_cdc_apply" ->
      ("WITH final AS (SELECT event_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS in_sync FROM final GROUP BY 1 ORDER BY 1"),
    "a48_mv_incremental" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_user_id, " +
        "min(event_id) AS min_event_id, max(event_id) AS max_event_id, " +
        "true AS rebase_consistent FROM final GROUP BY 1 ORDER BY 1"),
    "a50_multi_table_txn" ->
      ("SELECT 't1' AS src, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_key, true AS atomic FROM events " +
        "UNION ALL SELECT 't2', count(*), CAST(sum(user_id) AS BIGINT), true " +
        "FROM events ORDER BY 1"),
    "b56_sql_mv" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_uid, " +
        "min(event_id) AS min_id, max(event_id) AS max_id, " +
        "avg(user_id) AS avg_uid, true AS dml_rejected " +
        "FROM final GROUP BY 1 ORDER BY 1"),
    "b61_mv_join" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8), " +
        "dim AS (SELECT DISTINCT event_type AS et, " +
        "upper(substring(event_type, 1, 1)) AS cat FROM events " +
        "UNION ALL SELECT 'redacted', 'R') " +
        "SELECT d.cat AS cat, count(*) AS cnt, " +
        "CAST(sum(f.user_id) AS BIGINT) AS sum_uid, max(f.event_id) AS max_id, " +
        "true AS fact_delta_incremental " +
        "FROM final f JOIN dim d ON f.event_type = d.et " +
        "GROUP BY 1 ORDER BY 1"),
    "b65_mv_join_manifest" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8), " +
        "dim AS (SELECT DISTINCT event_type AS et, " +
        "upper(substring(event_type, 1, 1)) AS cat FROM events " +
        "UNION ALL SELECT 'redacted', 'R') " +
        "SELECT d.cat AS cat, count(*) AS cnt, " +
        "CAST(sum(f.user_id) AS BIGINT) AS sum_uid, max(f.event_id) AS max_id, " +
        "true AS fold_sql_exported " +
        "FROM final f JOIN dim d ON f.event_type = d.et " +
        "GROUP BY 1 ORDER BY 1"),
    "b66_drop_partitions" ->
      ("SELECT event_type, count(*) AS cnt, true AS log_only FROM events " +
        "WHERE strftime(ts, '%Y-%m-%d') > '2024-01-08' " +
        "GROUP BY event_type ORDER BY event_type"),
    "b68_mv_exact_distinct" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, count(*) AS cnt, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS users, " +
        "true AS export_serves_exact " +
        "FROM final GROUP BY event_type ORDER BY event_type"),
    "b67_mv_left_join" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8), " +
        "dim AS (SELECT DISTINCT event_type AS et, " +
        "upper(substring(event_type, 1, 1)) AS cat FROM events " +
        "WHERE event_type <> 'view' " +
        "UNION ALL SELECT 'redacted', 'R') " +
        "SELECT coalesce(d.cat, '(none)') AS cat, count(*) AS cnt, " +
        "CAST(sum(f.user_id) AS BIGINT) AS sum_uid, max(f.event_id) AS max_id, " +
        "true AS fact_delta_incremental " +
        "FROM final f LEFT JOIN dim d ON f.event_type = d.et " +
        "GROUP BY 1 ORDER BY 1"),
    "b60_mv_where" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT user_id % 10 AS ub, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id, max(event_id) AS max_id " +
        "FROM final WHERE event_type <> 'redacted' GROUP BY 1 ORDER BY 1"),
    "b58_mv_distinct" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, " +
        "count(*) AS cnt, true AS est_ok, true AS cnt_ok, " +
        "true AS export_refused FROM final GROUP BY 1 ORDER BY 1"),
    "b62_mv_global" ->
      ("SELECT count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_uid, " +
        "min(event_id) AS min_id, max(event_id) AS max_id, " +
        "avg(user_id) AS avg_uid, true AS empty_reads_zero " +
        "FROM events WHERE user_id % 23 <> 8"),
    "b63_mv_multidim" ->
      ("WITH d1 AS (SELECT et, " +
        "CASE WHEN et = (SELECT min(event_type) FROM events) THEN 'Z' " +
        "WHEN et = (SELECT max(event_type) FROM events) THEN 'Q' " +
        "ELSE upper(substring(et, 1, 1)) END AS cat " +
        "FROM (SELECT DISTINCT event_type AS et FROM events)), " +
        "d2 AS (SELECT ub, CASE WHEN ub = 0 THEN 'Z0' " +
        "ELSE 'T' || CAST(ub AS VARCHAR) END AS tier " +
        "FROM (SELECT UNNEST([0, 1, 2, 3]) AS ub)) " +
        "SELECT d1.cat AS cat, d2.tier AS tier, count(*) AS cnt, " +
        "CAST(sum(f.user_id) AS BIGINT) AS sum_uid, " +
        "max(f.event_id) AS max_id, true AS fact_delta_incremental, " +
        "true AS dim_move_partial " +
        "FROM events f JOIN d1 ON f.event_type = d1.et " +
        "JOIN d2 ON f.user_id % 4 = d2.ub GROUP BY 1, 2 ORDER BY 1, 2"),
    "b64_mv_having" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_uid FROM final " +
        "GROUP BY 1 HAVING count(*) > (SELECT count(*) // 10 FROM final) " +
        "ORDER BY 1"),
    "b59_sql_txn" ->
      ("SELECT 'agg' AS src, count(*) AS cnt, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_key, true AS atomic FROM events " +
        "UNION ALL SELECT 'raw', count(*), CAST(sum(event_id) AS BIGINT), " +
        "true FROM events ORDER BY 1"),
    "b57_mv_manifest" ->
      ("WITH final AS (SELECT event_id, user_id, " +
        "CASE WHEN user_id % 23 = 7 THEN 'redacted' ELSE event_type END AS event_type " +
        "FROM events WHERE user_id % 23 <> 8) " +
        "SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(user_id) AS BIGINT) AS sum_uid, " +
        "min(event_id) AS min_id, max(event_id) AS max_id, " +
        "avg(user_id) AS avg_uid, true AS fold_sql_exported " +
        "FROM final GROUP BY 1 ORDER BY 1"),
    "b55_check_constraint" ->
      ("SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "count(CASE WHEN event_type IS NULL THEN 1 END) AS null_types, " +
        "true AS rejected_cleanly, true AS sql_altered FROM events"),
    "a49_stream_dedup" ->
      ("SELECT count(*) AS cnt, count(DISTINCT event_id) AS uniq, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id, true AS dups_dropped " +
        "FROM events"),
    "a44_wap_branch" ->
      ("SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id, true AS main_isolated " +
        "FROM events WHERE event_id % 5 IN (0, 1) AND user_id % 7 <> 0 " +
        "GROUP BY 1 ORDER BY 1"),
    "a38_format_row" ->
      ("SELECT upper(event_type) AS event_type, " +
        "'t_' || lower(event_type) AS etype_tag, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id FROM events " +
        "GROUP BY 1, 2 ORDER BY 1"),
    "a39_schema_validation" ->
      ("SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "true AS rejected_cleanly FROM events"),
    "b33_sql_insert" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "b34_sql_ctas" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "b35_sql_maintenance" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "b36_sql_zorder" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "b37_sql_alter" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "b38_sql_restore" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "(SELECT count(*) FROM events) - (SELECT count(*) FROM events " +
        "WHERE event_id % 2 = 0 AND user_id % 10 = 3) AS pre_restore_cnt " +
        "FROM events WHERE event_id % 2 = 0 GROUP BY event_type ORDER BY event_type"),
    "b39_sql_add_column" ->
      ("WITH base AS (SELECT count(*) AS n FROM events), " +
        "extra AS (SELECT count(*) AS m, CAST(sum(event_id % 7) AS DOUBLE) AS ss " +
        "FROM events WHERE user_id % 50 = 1) " +
        "SELECT n + m AS cnt, CAST(n AS BIGINT) AS null_scores, " +
        "CAST(m AS BIGINT) AS tagged, ss AS score_sum FROM base, extra"),
    "b32_sql_merge" ->
      ("WITH src AS (SELECT event_id, user_id, 'upserted' AS event_type FROM events WHERE user_id % 13 = 2 " +
        "UNION ALL SELECT event_id + 20000000, user_id, 'new' FROM events WHERE user_id % 13 = 2), " +
        "merged AS (SELECT event_id, event_type FROM events " +
        "WHERE event_id NOT IN (SELECT event_id FROM src) " +
        "UNION ALL SELECT event_id, event_type FROM src) " +
        "SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id " +
        "FROM merged GROUP BY event_type ORDER BY event_type"),
    "a33_history" ->
      ("WITH d AS (SELECT count(DISTINCT strftime(ts, '%Y-%m-%d')) AS days FROM events) " +
        "SELECT * FROM (" +
        "SELECT 1 AS seq, false AS merged, days AS files_added, CAST(0 AS BIGINT) AS files_tombstoned FROM d " +
        "UNION ALL SELECT 2, false, days, 0 FROM d " +
        "UNION ALL SELECT 3, true, days, 2 * days FROM d) ORDER BY seq"),
    "a32_final_read" ->
      ("SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, " +
        "(SELECT count(*) FROM (SELECT DISTINCT user_id, event_type FROM events)) AS n_groups " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "a12_mv" ->
      "SELECT count(*) AS raw_cnt, CAST(count(*) AS BIGINT) AS mv_cnt FROM events",
    // DuckDB's DESCRIBE of the same ts-normalized projection reproduces
    // the engine's type-string map verbatim (shared vocabulary)
    "a5_schema_introspect" ->
      ("SELECT column_name AS col_name, column_type AS col_type, " +
        "true AS accumulated_matches " +
        "FROM (DESCRIBE SELECT epoch_ns(ts) AS ts, * EXCLUDE (ts) FROM events) " +
        "ORDER BY col_name"),
    "b18_union_seed" ->
      "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "b7_approx_uniq" ->
      "SELECT count(DISTINCT l_orderkey) AS exact_uniq, true AS approx_within_5pct FROM lineitem",
    "a13_replacing_merge" ->
      "SELECT user_id, arg_max(event_type, event_id) AS event_type, max(event_id) AS last_event_id FROM events GROUP BY user_id ORDER BY user_id",
    "a14_dedup_merge" ->
      "SELECT count(*) AS cnt, count(DISTINCT event_id) AS uniq FROM events",
    "a18_partition_prune" ->
      "SELECT count(*) AS cnt FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-01'",
    // CDC window = the second insert (odd event_ids); evens=0 proves the
    // compaction that followed emitted nothing through the changelog
    "a24_incremental_read" ->
      ("SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id, " +
        "CAST(0 AS BIGINT) AS evens FROM events WHERE event_id % 2 = 1"),
    // exactly-once: replayed batches (incl. post-compaction) inserted once
    "a22_http_roundtrip" ->
      ("SELECT count(*) AS http_rows, CAST(sum(event_id) AS BIGINT) AS http_sum, " +
        "count(DISTINCT user_id) AS http_users FROM events WHERE event_id < 500"),
    "a25_stream_exactly_once" ->
      ("SELECT count(*) AS cnt, count(DISTINCT event_id) AS uniq, " +
        "CAST(1 AS BIGINT) AS last_batch FROM events"),
    // the drained ice stream == the raw source, per event_type
    "a26_stream_source" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    // hourly tumbling event-time windows, epoch-aligned exactly like
    // Spark's window(); the micros truncation (evTs) is invisible at
    // hour granularity
    "a47_stream_windows" ->
      ("SELECT event_type, " +
        "(epoch_ns(ts)//1000000) - ((epoch_ns(ts)//1000000) % 3600000) AS win_ms, " +
        "count(*) AS cnt FROM events " +
        "GROUP BY event_type, win_ms ORDER BY event_type, win_ms"),
    // writer-API round trip: the partition column comes back as `t`
    "a29_format_write" ->
      ("SELECT count(*) AS cnt, count(DISTINCT event_type) AS types, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id FROM events"),
    // batch format("ice"): full count, distinct partition days, time
    // travel to the even-ids insert, partition-pruned day-1 count
    "a28_format_read" ->
      ("SELECT (SELECT count(*) FROM events) AS cnt, " +
        "(SELECT count(DISTINCT strftime(ts, '%Y-%m-%d')) FROM events) AS days, " +
        "(SELECT count(*) FROM events WHERE event_id % 2 = 0) AS cnt_tt, " +
        "(SELECT count(*) FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-01') AS cnt_day1"),
    // partition evolution: the rewritten table's user-bucket partition key
    // re-derived row-by-row from the raw source
    "a30_repartition" ->
      ("SELECT CAST(user_id % 8 AS VARCHAR) AS u, count(*) AS cnt, " +
        "CAST(sum(user_id) AS BIGINT) AS user_sum, " +
        "count(DISTINCT event_id) AS ids FROM events GROUP BY u ORDER BY u"),
    "b2_partition_columns" ->
      "SELECT strftime(ts, '%Y-%m-%d') AS d, count(*) AS cnt FROM events GROUP BY d ORDER BY d",
    "b4_projection" ->
      "SELECT l_orderkey, l_linenumber, CAST(l_quantity * 2 AS BIGINT) AS double_qty FROM lineitem ORDER BY l_orderkey, l_linenumber, double_qty LIMIT 50",
    "b22_scalar_udf" ->
      "SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens, count(*) AS cnt FROM documents",
    // same float→double cast + sequential double accumulation on both
    // sides → bit-identical values; round(6) is only formatting safety
    "b24_sql_functions" ->
      ("SELECT c.vec_id, " +
        "round(list_inner_product(CAST(c.embedding AS DOUBLE[]), q.e), 6) AS dot_q0, " +
        "round(list_inner_product(CAST(c.embedding AS DOUBLE[]), q.e) / " +
        "(sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) * " +
        "sqrt(list_inner_product(q.e, q.e))), 6) AS cos_q0 " +
        "FROM embeddings c CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings WHERE vec_id = 0) q " +
        "WHERE c.vec_id < 10 ORDER BY c.vec_id, dot_q0, cos_q0"),
    "b23_output_csv" ->
      "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "b5_filter" ->
      "SELECT count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty FROM lineitem WHERE l_quantity < 25 AND l_discount BETWEEN 0.02 AND 0.08",
    "b6_group_agg" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price, CAST(max(l_quantity) AS BIGINT) AS max_qty FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "b7_count_distinct" ->
      "SELECT count(DISTINCT l_orderkey) AS uniq_orders, count(DISTINCT l_partkey) AS uniq_parts FROM lineitem",
    "b8_max_by" ->
      "SELECT o_orderpriority, arg_max(o_orderstatus, o_orderkey) AS last_status, max(o_orderkey) AS max_key FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "b9_any_value" ->
      "SELECT o_orderstatus, any_value(o_orderstatus) AS av, count(*) AS cnt FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "b10_quantiles" ->
      "SELECT quantile_cont(l_quantity, 0.5) AS p50, quantile_cont(l_quantity, 0.9) AS p90 FROM lineitem",
    "b11_topk" ->
      "SELECT l_orderkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue FROM lineitem GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10",
    "b12_json_extract" ->
      "SELECT CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum, count(json_extract_string(props, '$.k')) AS k_cnt FROM events",
    "b13_to_json" ->
      "SELECT event_id, to_json(struct_pack(event_id := event_id, event_type := event_type)) AS js FROM events ORDER BY event_id LIMIT 5",
    "b14_casts" ->
      "SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_long, count(DISTINCT CAST(l_orderkey AS VARCHAR)) AS key_str, CAST(max(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_pct FROM lineitem",
    "b15_datetime" ->
      "SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr, count(*) AS cnt, count(DISTINCT date_trunc('month', l_shipdate)) AS months, min(strftime(l_shipdate, '%Y-%m-%d')) AS first_day FROM lineitem GROUP BY yr ORDER BY yr",
    "b16_string_regex" ->
      "SELECT regexp_extract(p_name, '([a-z]+)', 1) AS w, count(*) AS cnt, max(upper(p_brand)) AS max_brand, min(substring(p_type, 1, 3)) AS type3 FROM part GROUP BY w ORDER BY w",
    "b19_coalesce" ->
      "SELECT CAST(sum(coalesce(CAST(json_extract_string(props, '$.missing') AS BIGINT), 1)) AS BIGINT) AS s FROM events",
    "b20_subquery" ->
      "SELECT round(avg(cnt), 6) AS avg_orders, max(cnt) AS max_orders FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)",
    "b21_catalog_view" ->
      "SELECT event_type, count(*) AS cnt FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15' GROUP BY event_type ORDER BY event_type",
    "join_star_schema" ->
      "SELECT c_mktsegment, count(*) AS cnt, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment",
    // the count is the DuckDB-checkable part; the booleans pin that the
    // plan carried a dynamicpruningexpression and that the runtime scan
    // read fewer files than were statically selected
    "dpp_join" ->
      ("SELECT (SELECT count(*) FROM events WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-14') AS cnt, " +
        "true AS dpp_applied, true AS files_runtime_pruned"),
    // post-optimize there is exactly one alive file per day partition, each
    // with tight [min,max] ts stats — an 11-day range must plan exactly 11
    // files, and the pruned scan must agree with the full-table filter
    "stats_skipping" ->
      ("SELECT (SELECT count(*) FROM events WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-20') AS cnt, " +
        "CAST(11 AS BIGINT) AS files_scanned, " +
        "(SELECT count(DISTINCT strftime(ts, '%Y-%m-%d')) FROM events) AS files_total"),
    // both dimensions' counts are exact; the pruned booleans pin that the
    // z-layout actually skipped files on each axis
    "zorder_skipping" ->
      ("SELECT " +
        "(SELECT count(*) FROM events WHERE user_id <= (SELECT CAST(floor(max(user_id) / 5) AS BIGINT) FROM events)) AS cnt_u, " +
        "(SELECT count(*) FROM events WHERE event_id <= (SELECT CAST(floor(max(event_id) / 5) AS BIGINT) FROM events)) AS cnt_e, " +
        "true AS pruned_u, true AS pruned_e, CAST(16 AS BIGINT) AS files_total"),
    "llm_exact_dedup" ->
      "SELECT count(*) AS total_docs, count(DISTINCT md5(text)) AS distinct_docs FROM documents",
    "llm_dedup_keep" ->
      "SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text) ORDER BY keep_id",
    "llm_token_stats" ->
      "SELECT lang, count(*) AS docs, CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY lang ORDER BY lang",
    "llm_quality_buckets" ->
      "SELECT CASE WHEN n_chars < 150 THEN 'short' WHEN n_chars < 300 THEN 'medium' ELSE 'long' END AS bucket, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars FROM documents GROUP BY bucket ORDER BY bucket",
    "llm_fingerprint" ->
      "SELECT count(DISTINCT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS uniq_fp, count(*) AS total FROM documents",
    "llm_ann_bruteforce" ->
      "SELECT qid, id, rank FROM (SELECT q.vec_id AS qid, c.vec_id AS id, row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank FROM embeddings c, embeddings q WHERE q.vec_id IN (0, 1, 2) AND c.vec_id != q.vec_id) WHERE rank <= 10 ORDER BY qid, rank",
    // recovery contract constants: all 5 planted near-dups hit their
    // source through the persisted index, reversed-text novels hit nothing
    "llm_minhash_index" ->
      "SELECT CAST(5 AS BIGINT) AS planted_found, CAST(0 AS BIGINT) AS novel_matched",
    // every untouched %31==9 long doc's probe finds its source; probes
    // of rewritten/deleted sources find NOTHING (their signatures retired)
    "llm_minhash_sync" ->
      ("SELECT CAST((SELECT count(*) FROM documents " +
        "WHERE length(text) >= 400 AND doc_id % 31 = 9) AS BIGINT) AS planted_found, " +
        "CAST(0 AS BIGINT) AS retired_matched"),
    // same replay as bruteforce, with the anchor-label filter applied
    // before ranking (c.vec_id != qid is implied: same id => same lang)
    "llm_hard_negatives" ->
      ("SELECT qid, id, neg_label, rank FROM (" +
        "SELECT q.vec_id AS qid, c.vec_id AS id, cd.lang AS neg_label, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank " +
        "FROM embeddings c JOIN documents cd ON cd.doc_id = c.vec_id, " +
        "embeddings q JOIN documents qd ON qd.doc_id = q.vec_id " +
        "WHERE q.vec_id IN (0, 1, 2) AND cd.lang != qd.lang) " +
        "WHERE rank <= 5 ORDER BY qid, rank"),
    "llm_multimodal_meta" ->
      "SELECT CAST(sum(8 + doc_id % 13) AS BIGINT) AS sum_w, CAST(sum(8 + doc_id % 7) AS BIGINT) AS sum_h, count(*) AS cnt, true AS all_decoded FROM documents",
    // 5 planted copies collapse onto their sources: kept == corpus size
    "llm_audio_dedup" ->
      ("SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid, " +
        "(SELECT count(*) FROM documents) AS kept"),
    "llm_video_dedup" ->
      ("SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid, " +
        "(SELECT count(*) FROM documents) AS kept"),
    "llm_image_dedup" ->
      ("SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid, " +
        "(SELECT count(*) FROM documents) AS kept"),
    // real resize parity: scale = 6 / max(w,h) computed in DOUBLE on both
    // sides, round-half-up matches for positive values
    "llm_multimodal_resize" ->
      ("SELECT CAST(sum(CASE WHEN greatest(w, h) <= 6 THEN w ELSE greatest(1, CAST(round(w * (6.0 / greatest(w, h))) AS BIGINT)) END) AS BIGINT) AS sum_w, " +
        "CAST(sum(CASE WHEN greatest(w, h) <= 6 THEN h ELSE greatest(1, CAST(round(h * (6.0 / greatest(w, h))) AS BIGINT)) END) AS BIGINT) AS sum_h, " +
        "count(*) AS cnt FROM (SELECT 8 + doc_id % 13 AS w, 8 + doc_id % 7 AS h FROM documents)"),
    "llm_multimodal_audio" ->
      ("SELECT CAST(sum(100 + doc_id % 50) AS BIGINT) AS total_frames, " +
        "CAST(8000 AS INTEGER) AS min_rate, CAST(8000 AS INTEGER) AS max_rate, " +
        "count(*) AS mono_channels, count(*) AS cnt FROM documents"),
    "llm_multimodal_mp3" ->
      ("SELECT CAST(sum((10 + doc_id % 20) * 1152) AS BIGINT) AS total_samples, " +
        "CAST(44100 AS INTEGER) AS min_rate, CAST(44100 AS INTEGER) AS max_rate, " +
        "count(*) AS mono_channels, " +
        "round(max((10 + doc_id % 20) * 1152 / 44100.0), 6) AS max_dur, " +
        "count(*) AS cnt FROM documents"),
    "llm_multimodal_mp4" ->
      ("SELECT CAST(sum(30 * (2 + doc_id % 10)) AS BIGINT) AS total_frames, " +
        "CAST(min(320 + 16 * (doc_id % 8)) AS INTEGER) AS min_w, " +
        "CAST(max(240 + 16 * (doc_id % 8)) AS INTEGER) AS max_h, " +
        "round(max(2 + doc_id % 10) * 1.0, 6) AS max_dur, " +
        "count(*) AS cnt FROM documents"),
    // MJPEG-AVI: every sampled frame must REALLY decode (ImageIO) with
    // the closed-form dims; sampled count = ceil(frames/2) per doc
    "llm_multimodal_video" ->
      ("SELECT CAST(sum((2 + doc_id % 5 + 1) // 2) AS BIGINT) AS sampled_frames, " +
        "CAST(sum(((2 + doc_id % 5 + 1) // 2) * (32 + 2 * (doc_id % 4)) * (24 + 2 * (doc_id % 3))) AS BIGINT) AS sum_px, " +
        "CAST(32 AS INTEGER) AS min_w, true AS all_decoded, " +
        "CAST(sum(2 + doc_id % 5) AS BIGINT) AS total_frames, " +
        "round((max(2 + doc_id % 5) * 100000) / 1000000.0, 6) AS max_dur, " +
        "count(*) AS cnt FROM documents WHERE doc_id < 500"),
    // sessionization replay: lag marks starts, running sum numbers them,
    // all in exact integer nanos
    "sessionize_events" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events), " +
        "m AS (SELECT user_id, tns, event_id, CASE WHEN lag(tns) OVER " +
        "(PARTITION BY user_id ORDER BY tns, event_id) IS NULL OR tns - lag(tns) OVER " +
        "(PARTITION BY user_id ORDER BY tns, event_id) > 1800000000000 THEN 1 ELSE 0 END AS st FROM e), " +
        "q AS (SELECT user_id, tns, sum(st) OVER (PARTITION BY user_id " +
        "ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS seq FROM m), " +
        "sess AS (SELECT user_id, seq, count(*) AS n_events, max(tns) - min(tns) AS span " +
        "FROM q GROUP BY user_id, seq) " +
        "SELECT count(*) AS sessions, CAST(sum(n_events) AS BIGINT) AS events, " +
        "CAST(max(span) AS BIGINT) AS max_span_ns, CAST(max(seq) AS BIGINT) AS max_user_sessions, " +
        "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS single_event_sessions " +
        "FROM sess"),
    "llm_lang_quality" ->
      "SELECT count(*) AS total_docs, true AS quality_in_range, true AS lang_in_domain FROM documents",
    "llm_minhash_dedup" ->
      "SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid",
    "llm_ngram_dedup" ->
      "SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid",
    "llm_simhash_dedup" ->
      "SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid",
    "llm_cosine_neardup" ->
      "SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid",
    "llm_semantic_dedup" ->
      ("SELECT CAST(5 AS BIGINT) AS planted_found, true AS all_pairs_valid, " +
        "(SELECT count(*) FROM embeddings) AS kept"),
    "llm_cluster_sample" ->
      ("SELECT count(*) AS docs, true AS sample_matches, " +
        "true AS per_cluster_ok, true AS sims_ok FROM embeddings"),
    "llm_ann_lsh" ->
      "SELECT CAST(3 AS BIGINT) AS n_queries, true AS recall_ok",
    "llm_ann_ivf" ->
      "SELECT CAST(3 AS BIGINT) AS n_queries, true AS recall_ok",
    "llm_ann_ivf_index" ->
      "SELECT CAST(3 AS BIGINT) AS n_queries, true AS recall_ok",
    "llm_ann_sync" ->
      "SELECT CAST(3 AS BIGINT) AS n_queries, true AS recall_ok, true AS no_deleted",
    "llm_ann_pq" ->
      "SELECT CAST(3 AS BIGINT) AS n_queries, true AS recall_ok",
    "b17_uuid" ->
      "SELECT CAST(100 AS BIGINT) AS uniq",
    // post-optimize the table holds exactly one alive file per partition,
    // and partitions are the distinct event days — a deterministic count
    "b3_filename_virtual" ->
      "SELECT count(DISTINCT strftime(ts, '%Y-%m-%d')) AS files FROM events",
    // resize cap 256, frame chunks of 64, keep every 2nd (indices 0,2):
    // closed form over L = capped utf-8 byte length
    "llm_multimodal_pipeline" ->
      ("SELECT CAST(sum(CASE WHEN L = 0 THEN 0 WHEN L > 128 THEN 2 ELSE 1 END) AS BIGINT) AS frames, " +
        "count(DISTINCT CASE WHEN L > 0 THEN doc_id END) AS media_cnt, " +
        "CAST(sum(LEAST(64, L) + CASE WHEN L > 128 THEN LEAST(64, L - 128) ELSE 0 END) AS BIGINT) AS frame_bytes " +
        "FROM (SELECT doc_id, LEAST(256, octet_length(encode(text))) AS L FROM documents)"),
    // full DuckDB replay of the resample + gap-fill pipeline: same bucket
    // truncation, same per-key dense grid (generate_series), same
    // LOCF/interp windows, same operation order in the one double
    // expression — so the e6 checksums match bit-for-bit
    "ts_gapfill" ->
      ("WITH r AS (SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS b, " +
        "CAST(count(*) AS DOUBLE) AS v FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2), " +
        "s AS (SELECT event_type, min(b) AS mn, max(b) AS mx FROM r GROUP BY 1), " +
        "g AS (SELECT event_type, unnest(generate_series(mn, mx, 3600000000000)) AS b FROM s), " +
        "j AS (SELECT g.event_type, g.b, r.v FROM g LEFT JOIN r ON r.event_type = g.event_type AND r.b = g.b), " +
        "w AS (SELECT event_type, b, v, " +
        "last_value(v IGNORE NULLS) OVER pb AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER pb AS pb_, " +
        "first_value(v IGNORE NULLS) OVER nb AS nv, " +
        "first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER nb AS nb_ " +
        "FROM j WINDOW " +
        "pb AS (PARTITION BY event_type ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "nb AS (PARTITION BY event_type ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT event_type, count(*) AS grid_n, " +
        "CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS observed_n, " +
        "CAST(sum(floor(pv * 1000000.0)) AS BIGINT) AS locf_e6, " +
        "CAST(sum(floor((CASE WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
        "WHEN nb_ = pb_ THEN pv ELSE pv + (nv - pv) * ((b - pb_) / (nb_ - pb_)) END) * 1000000.0)) AS BIGINT) AS interp_e6 " +
        "FROM w GROUP BY event_type ORDER BY event_type"),
    // the same replay chain as ts_gapfill, extended with the 24-bucket
    // trailing window over the LOCF series
    "ts_rolling" ->
      ("WITH r AS (SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS b, " +
        "CAST(count(*) AS DOUBLE) AS v FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2), " +
        "s AS (SELECT event_type, min(b) AS mn, max(b) AS mx FROM r GROUP BY 1), " +
        "g AS (SELECT event_type, unnest(generate_series(mn, mx, 3600000000000)) AS b FROM s), " +
        "j AS (SELECT g.event_type, g.b, r.v FROM g LEFT JOIN r ON r.event_type = g.event_type AND r.b = g.b), " +
        "f AS (SELECT event_type, b, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf " +
        "FROM j), " +
        "w AS (SELECT event_type, b, " +
        "count(locf) OVER win AS roll_n, sum(locf) OVER win AS roll_sum, " +
        "min(locf) OVER win AS roll_min, max(locf) OVER win AS roll_max " +
        "FROM f WINDOW win AS (PARTITION BY event_type ORDER BY b ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_type, " +
        "CAST(sum(floor(roll_sum * 1000000.0)) AS BIGINT) AS rsum_e6, " +
        "CAST(sum(floor((roll_sum / roll_n) * 1000000.0)) AS BIGINT) AS ravg_e6, " +
        "CAST(sum(roll_min) AS BIGINT) AS rmin_sum, " +
        "CAST(sum(roll_max) AS BIGINT) AS rmax_sum, " +
        "CAST(max(roll_n) AS BIGINT) AS max_n " +
        "FROM w GROUP BY event_type ORDER BY event_type"),
    // estimate/state plumbing is proven Spark-side (est_ok/cnt_ok flags);
    // the exact distinct and total counts replay directly
    "a27_hll_mv" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
        "count(*) AS cnt, true AS est_ok, true AS cnt_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "b25_window" ->
      ("WITH monthly AS (SELECT strftime(l_shipdate, '%Y-%m') AS m, count(*) AS cnt, " +
        "sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev0 FROM lineitem GROUP BY 1) " +
        "SELECT m, cnt, CAST(rev0 AS DOUBLE) AS rev, " +
        "row_number() OVER (ORDER BY m) AS rn, " +
        "CAST(lag(rev0, 1) OVER (ORDER BY m) AS DOUBLE) AS prev_rev, " +
        "CAST(sum(rev0) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev, " +
        "rank() OVER (ORDER BY rev0 DESC, m) AS rev_rank " +
        "FROM monthly ORDER BY m"),
    "b26_rollup" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status, " +
        "count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, " +
        "CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY lvl, flag, status"),
    "b27_cube" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status, " +
        "count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, " +
        "CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS lvl " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY lvl, flag, status"),
    "b28_pivot" ->
      ("SELECT l_returnflag AS flag, " +
        "CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS BIGINT) AS qty_f, " +
        "CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS BIGINT) AS qty_o " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY flag"),
    "b31_sql_dml" ->
      ("SELECT event_type, count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id FROM (" +
        "SELECT CASE WHEN user_id % 19 = 4 THEN 'redacted' ELSE event_type END AS event_type, " +
        "event_id FROM events WHERE user_id % 19 != 5) " +
        "GROUP BY event_type ORDER BY event_type"),
    "b29_sql_catalog" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS d, count(*) AS cnt, " +
        "count(DISTINCT user_id) AS users FROM events " +
        "WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-02' AND '2024-01-06' " +
        "GROUP BY d ORDER BY d"),
    "b30_sql_time_travel" ->
      ("SELECT count(*) AS cnt, count(DISTINCT event_id) AS ids " +
        "FROM events WHERE event_id % 2 = 0"),
    // components must equal the (lang, source) shards exactly
    "llm_dedup_groups" ->
      ("WITH g AS (SELECT lang, source, count(*) AS cnt, min(doc_id) AS root " +
        "FROM documents GROUP BY 1, 2 HAVING count(*) >= 2) " +
        "SELECT count(*) AS n_groups, " +
        "CAST(coalesce(sum(cnt), 0) AS BIGINT) AS grouped_docs, " +
        "CAST(coalesce(sum(root), 0) AS BIGINT) AS sum_roots, " +
        "(SELECT count(*) FROM documents) - CAST(coalesce(sum(cnt), 0) AS BIGINT) + count(*) AS kept_docs " +
        "FROM g"),
    // DuckDB's native ASOF JOIN is the oracle for the union-merge as-of
    "asof_join" ->
      ("WITH c AS (SELECT user_id, ts, max(event_id) AS click_id FROM events " +
        "WHERE event_type = 'click' GROUP BY 1, 2), " +
        "p AS (SELECT * FROM events WHERE event_type = 'purchase') " +
        "SELECT count(*) AS purchases, count(c.click_id) AS attributed, " +
        "CAST(count(*) FILTER (WHERE epoch_ns(p.ts) - epoch_ns(c.ts) <= 86400000000000) AS BIGINT) AS within_24h, " +
        "CAST(sum(c.click_id) AS BIGINT) AS sum_click_id " +
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"),
    "llm_wordpiece_count" ->
      ("SELECT CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS total_pieces, " +
        "count(*) AS cnt FROM documents"),
    // DuckDB list lambdas replay every Gopher rule: tk = tokens, bigram
    // mode count, dup-sentence fraction, mean word length, symbol ratio —
    // identical IEEE arithmetic, so the threshold comparisons agree
    "llm_gopher_quality" ->
      ("WITH t1 AS (SELECT text, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents), " +
        "t2 AS (SELECT len(tk) AS nt, " +
        "CASE WHEN len(tk) < 2 THEN 0 ELSE " +
        "list_max(list_transform(list_distinct(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])), " +
        "s -> len(list_filter(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]), x -> x = s)))) END AS mode2, " +
        "list_filter(list_transform(string_split(lower(text), '.'), s -> trim(s)), s -> len(s) > 0) AS sents, " +
        "list_sum(list_transform(tk, w -> len(w))) AS sumw, " +
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s.,!?''\"-]')) AS nsym " +
        "FROM t1), " +
        "r AS (SELECT nt, mode2, " +
        "CASE WHEN nt < 2 THEN 0.0 ELSE mode2 * 2 / CAST(nt AS DOUBLE) END AS top2, " +
        "CASE WHEN len(sents) <= 0 THEN 0.0 ELSE 1.0 - len(list_distinct(sents)) / CAST(len(sents) AS DOUBLE) END AS dupf, " +
        "CASE WHEN nt <= 0 THEN 0.0 ELSE sumw / CAST(nt AS DOUBLE) END AS mwl, " +
        "CASE WHEN nt <= 0 THEN 0.0 ELSE nsym / CAST(nt AS DOUBLE) END AS symr FROM t2) " +
        "SELECT count(*) AS total_docs, " +
        "CAST(sum(CASE WHEN (mode2 < 3 OR top2 <= 0.2) AND dupf <= 0.3 AND mwl BETWEEN 2.0 AND 12.0 AND symr <= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS kept, " +
        "CAST(sum(CASE WHEN mode2 >= 3 AND top2 > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS flag_repetition, " +
        "CAST(sum(CASE WHEN dupf > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS flag_dup_sentences, " +
        "CAST(sum(CASE WHEN NOT (mwl BETWEEN 2.0 AND 12.0) THEN 1 ELSE 0 END) AS BIGINT) AS flag_word_shape, " +
        "CAST(sum(CASE WHEN symr > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS flag_symbols FROM r"),
    "llm_token_budget" ->
      ("WITH d AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS tk FROM documents), " +
        "b AS (SELECT CAST(sum(tk) // 2 AS BIGINT) AS budget FROM d), " +
        "r AS (SELECT doc_id, tk, sum(tk) OVER (ORDER BY tk DESC, doc_id) AS run FROM d) " +
        "SELECT count(*) AS kept_docs, CAST(sum(tk) AS BIGINT) AS kept_tokens, " +
        "CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM r, b WHERE run <= budget"),
    "llm_semantic_decontam" ->
      ("WITH eval AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 8), " +
        "corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id >= 8 " +
        "UNION ALL SELECT vec_id + 1000000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) FROM embeddings WHERE vec_id < 8), " +
        "cos AS (SELECT c.vec_id, max(list_inner_product(c.v, eval.e) / " +
        "(sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(eval.e, eval.e)))) AS mc " +
        "FROM corpus c CROSS JOIN eval GROUP BY c.vec_id) " +
        "SELECT vec_id, round(mc, 6) AS cos6 FROM cos WHERE mc >= 0.99 ORDER BY vec_id"),
    "llm_decontam" ->
      ("WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')] " +
        "ELSE list_transform(range(1, len(tk) - 6), i -> array_to_string(list_slice(tk, i, i + 7), ' ')) END)) AS gram FROM t), " +
        "b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), " +
        "ov AS (SELECT g.doc_id, count(DISTINCT g.gram) AS overlap FROM g JOIN b USING (gram) GROUP BY g.doc_id) " +
        "SELECT count(*) AS contaminated_docs, CAST(sum(overlap) AS BIGINT) AS total_overlap, " +
        "CAST(max(overlap) AS BIGINT) AS max_overlap FROM ov"),
    "llm_bloom_decontam" ->
      ("WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')] " +
        "ELSE list_transform(range(1, len(tk) - 6), i -> array_to_string(list_slice(tk, i, i + 7), ' ')) END)) AS gram FROM t), " +
        "b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), " +
        "ov AS (SELECT g.doc_id, count(DISTINCT g.gram) AS overlap FROM g JOIN b USING (gram) GROUP BY g.doc_id) " +
        "SELECT count(*) AS contaminated_docs, CAST(sum(overlap) AS BIGINT) AS total_overlap, " +
        "CAST(max(overlap) AS BIGINT) AS max_overlap, true AS agrees_exact FROM ov"),
    // DuckDB replays the identical redaction chain (RE2 'g' flag = Java
    // replace-all); both engines emit lowercase-hex md5
    "llm_pii_scrub" ->
      ("SELECT doc_id, md5(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com ssn 123-45-' || " +
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
        "' call 555-867-5309 card 4111111111111111 from 10.1.2.' || CAST(doc_id % 256 AS VARCHAR), " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), " +
        "'\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'), " +
        "'\\b\\d{16}\\b', '<CC>', 'g'), " +
        "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g')) AS fp " +
        "FROM documents ORDER BY doc_id"),
    "llm_shard_export" ->
      ("SELECT CAST(doc_id % 8 AS BIGINT) AS shard, count(*) AS rows, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, true AS one_file_per_shard " +
        "FROM documents GROUP BY shard ORDER BY shard"),
    // concat-and-chunk packing is pure window arithmetic in DuckDB: the
    // exclusive running token sum gives each doc's stream interval; the
    // greedy booleans are invariants the Spark side proves in-query
    "llm_pack_sequences" ->
      ("SELECT count(*) AS total_docs, CAST(sum(tok) AS BIGINT) AS total_tokens, " +
        "CAST(floor((sum(tok) - 1) / 512) + 1 AS BIGINT) AS total_packs, " +
        "CAST(sum(CASE WHEN floor(strt / 512) != floor((strt + tok - 1) / 512) THEN 1 ELSE 0 END) AS BIGINT) AS docs_split, " +
        "true AS greedy_within_budget, true AS greedy_bound_ok, true AS greedy_conserves " +
        "FROM (SELECT tok, coalesce(sum(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt " +
        "FROM (SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents))"),
    // the mixing selector is portable arithmetic: DuckDB re-derives the
    // per-lang keep rates (largest subsample hitting the target mixture)
    // and the exact kept row set from the same doubles
    "llm_data_mixing" ->
      ("WITH tgt AS (SELECT * FROM (VALUES ('en', 0.4), ('de', 0.15), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)) t(lang, tgt)), " +
        "cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang), " +
        "tot AS (SELECT min(n / tgt) AS t FROM cnt JOIN tgt USING (lang)), " +
        "rates AS (SELECT lang, least(1.0, tgt * (SELECT t FROM tot) / n) AS r FROM cnt JOIN tgt USING (lang)) " +
        "SELECT d.lang AS lang, count(*) AS kept, CAST(sum(d.n_chars) AS BIGINT) AS kept_chars " +
        "FROM documents d JOIN rates USING (lang) " +
        "WHERE CAST((d.doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 < r " +
        "GROUP BY d.lang ORDER BY d.lang"),
    // chunk counts / token sums in closed form: c(n) = ceil((n-256)/192)+1
    // (1 when n <= 256); per-doc chunk-token sum = n + (c-1)*overlap
    "llm_chunking" ->
      ("SELECT source, CAST(sum(c) AS BIGINT) AS chunks, " +
        "CAST(sum(n + (c - 1) * 64) AS BIGINT) AS sum_tokens, " +
        "true AS tokens_consistent, true AS all_within_size " +
        "FROM (SELECT source, n, CASE WHEN n <= 256 THEN 1 ELSE CAST(ceil((n - 256) / 192.0) AS BIGINT) + 1 END AS c " +
        "FROM (SELECT source, len(regexp_split_to_array(trim(text), '\\s+')) AS n FROM documents)) " +
        "GROUP BY source ORDER BY source"),
    "llm_ann_quantized" ->
      ("SELECT count(*) AS n_vectors, true AS recon_ok, true AS recall_ok " +
        "FROM embeddings"),
    // DuckDB replays BM25 end-to-end (Bm25ReplaySql below): the
    // index-backed path must land on the IDENTICAL ranking and scores as
    // the full-scan form — one replay grades both
    "llm_bm25_index" -> Bm25ReplaySql,
    "llm_bm25_search" -> Bm25ReplaySql,
    "llm_bm25_sync" -> Bm25SyncReplaySql,
    // the identical normalization chain, step for step, RE2-side
    "llm_text_normalize" ->
      ("SELECT doc_id, md5(trim(regexp_replace(" +
        "regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(text || '  <p id=\"x\">Q&amp;A</p> “smart” – ‘quotes’&nbsp;' || CAST(doc_id AS VARCHAR) || 'end', " +
        "'<[^>]+>', ' ', 'g'), " +
        "'&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'), " +
        "'&quot;', '\"', 'g'), '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), " +
        "'[‘’]', '''', 'g'), '[“”]', '\"', 'g'), '[–—]', '-', 'g'), " +
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x{00a0}]', ' ', 'g'), " +
        "'\\s+', ' ', 'g'))) AS fp FROM documents ORDER BY doc_id"),
    // hybrid fusion replay: both rankings re-derived (bm25 + cosine),
    // fused as floor(1e9 * sum(1/(60+rank)))
    "llm_hybrid_search" ->
      ("WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t FROM documents), " +
        "pd AS (SELECT doc_id, count(*) AS dl, " +
        "sum(CASE WHEN t = 'spark' THEN 1 ELSE 0 END) AS tf0, " +
        "sum(CASE WHEN t = 'query' THEN 1 ELSE 0 END) AS tf1, " +
        "sum(CASE WHEN t = 'window' THEN 1 ELSE 0 END) AS tf2 FROM tk GROUP BY doc_id), " +
        "st AS (SELECT count(*) AS n, avg(dl) AS avgdl, " +
        "sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0, " +
        "sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1, " +
        "sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM pd), " +
        "sc AS (SELECT doc_id, " +
        "((ln(1 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))) " +
        "+ (ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)))) " +
        "+ (ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score " +
        "FROM pd, st), " +
        "bm20 AS (SELECT doc_id, score FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20), " +
        "bm AS (SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rank FROM bm20), " +
        "dn AS (SELECT doc_id, rank FROM (SELECT c.vec_id AS doc_id, " +
        "row_number() OVER (ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank " +
        "FROM embeddings c, embeddings q WHERE q.vec_id = 0 AND c.vec_id != 0) WHERE rank <= 20), " +
        "u AS (SELECT doc_id, 1.0 / (60 + rank) AS c FROM bm " +
        "UNION ALL SELECT doc_id, 1.0 / (60 + rank) AS c FROM dn) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS lists_hit, " +
        "CAST(floor(1000000000.0 * sum(c)) AS BIGINT) AS rrf_e9 " +
        "FROM u GROUP BY doc_id ORDER BY rrf_e9 DESC, doc_id LIMIT 10"),
    "llm_vocab_coverage" ->
      ("WITH tk AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term FROM documents), " +
        "wc AS (SELECT term, count(*) AS freq FROM tk GROUP BY term), " +
        "v AS (SELECT term, freq FROM wc ORDER BY freq DESC, term LIMIT 25) " +
        "SELECT count(*) AS total_tokens, " +
        "CAST(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS covered_tokens, " +
        "round(sum(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS coverage, " +
        "count(DISTINCT CASE WHEN v.term IS NULL THEN tk.term END) AS oov_terms, " +
        "(SELECT count(*) FROM v) AS vocab_size, " +
        "(SELECT min(freq) FROM v) AS vocab_min_freq, " +
        "(SELECT max(freq) FROM v) AS vocab_max_freq " +
        "FROM tk LEFT JOIN v ON tk.term = v.term"),
    // each doc keeps exactly its one original sentence (all 500 texts are
    // distinct, so no original sentence can reach the >=30-doc bar), the
    // planted boilerplate is removed everywhere it was planted, and the
    // restored check is proven Spark-side (bool_and vs the original text)
    "llm_span_dedup" ->
      ("SELECT count(*) AS docs, CAST(4 AS BIGINT) AS span_scrubbed, " +
        "true AS canonical_intact, true AS counts_ok FROM documents"),
    "llm_boilerplate_dedup" ->
      ("SELECT count(*) AS docs, count(*) AS kept_sentences, " +
        "CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END + " +
        "CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS removed_occurrences, " +
        "true AS restored FROM documents"),
    "llm_heavy_hitters" ->
      ("WITH h AS (SELECT user_id, count(*) AS cnt FROM events " +
        "GROUP BY user_id HAVING count(*) >= 40) " +
        "SELECT count(*) AS n_heavy, CAST(max(cnt) AS BIGINT) AS max_cnt, " +
        "CAST(sum(cnt) AS BIGINT) AS sum_cnt, true AS cms_within_bounds FROM h"),
    "llm_hll_shards" ->
      ("SELECT count(DISTINCT user_id) AS exact_distinct, " +
        "count(DISTINCT event_type) AS n_shards, true AS hll_within_5pct " +
        "FROM events"),
    "llm_sample_exact" ->
      ("WITH r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
        "ORDER BY CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0, doc_id) AS rn " +
        "FROM documents) " +
        "SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids " +
        "FROM r WHERE rn <= 20 GROUP BY lang ORDER BY lang"),
    // norm = sqrt(((c0 + c1) + c2)) with c_i = (tf_i * idf_i)^2 in term
    // order — the same fixed-order sum the Scala side builds; idf uses
    // the smoothed ln((N+1)/(df+1)) + 1
    "llm_tfidf" ->
      ("WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t FROM documents), " +
        "pd0 AS (SELECT doc_id, " +
        "sum(CASE WHEN t = 'spark' THEN 1 ELSE 0 END) AS tf0, " +
        "sum(CASE WHEN t = 'query' THEN 1 ELSE 0 END) AS tf1, " +
        "sum(CASE WHEN t = 'window' THEN 1 ELSE 0 END) AS tf2 FROM tk GROUP BY doc_id), " +
        "pd AS (SELECT coalesce(p.tf0, 0) AS tf0, coalesce(p.tf1, 0) AS tf1, " +
        "coalesce(p.tf2, 0) AS tf2 FROM documents d LEFT JOIN pd0 p USING (doc_id)), " +
        "st AS (SELECT (SELECT count(*) FROM documents) AS n, " +
        "sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0, " +
        "sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1, " +
        "sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM pd), " +
        "idf AS (SELECT ln((n + 1.0) / (df0 + 1.0)) + 1 AS i0, " +
        "ln((n + 1.0) / (df1 + 1.0)) + 1 AS i1, " +
        "ln((n + 1.0) / (df2 + 1.0)) + 1 AS i2 FROM st), " +
        "nm AS (SELECT sqrt((((tf0 * i0) * (tf0 * i0) + (tf1 * i1) * (tf1 * i1)) " +
        "+ (tf2 * i2) * (tf2 * i2))) AS norm FROM pd, idf) " +
        "SELECT count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN norm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS matched, " +
        "round(max(norm), 4) AS max_norm FROM nm"),
    "llm_bloom_dedup" ->
      ("WITH newb AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM " +
        "(SELECT doc_id, text FROM documents WHERE doc_id < 250 ORDER BY doc_id LIMIT 10)), " +
        "fresh AS (SELECT doc_id, text FROM newb WHERE text NOT IN " +
        "(SELECT text FROM documents WHERE doc_id < 250)), " +
        "kept AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY text ORDER BY doc_id) AS rn FROM fresh) WHERE rn = 1) " +
        "SELECT count(*) AS kept_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "(SELECT count(*) FROM newb) - count(*) AS dropped, true AS bloom_pruned FROM kept"),
    "llm_incremental_dedup" ->
      ("WITH seen AS (SELECT DISTINCT md5(text) AS hash FROM documents WHERE doc_id < 250), " +
        "newb AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM " +
        "(SELECT doc_id, text FROM documents WHERE doc_id < 250 ORDER BY doc_id LIMIT 10)), " +
        "fresh AS (SELECT doc_id, text FROM newb WHERE md5(text) NOT IN (SELECT hash FROM seen)), " +
        "kept AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER " +
        "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM fresh) WHERE rn = 1) " +
        "SELECT count(*) AS kept_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids, " +
        "(SELECT count(*) FROM newb) - count(*) AS dropped FROM kept"),
    "analyze_profile" ->
      ("SELECT * FROM (" +
        "SELECT 'event_id' AS \"column\", count(*) AS \"rows\", " +
        "CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls, " +
        "count(DISTINCT event_id) AS \"distinct\", CAST(min(event_id) AS VARCHAR) AS min, " +
        "CAST(max(event_id) AS VARCHAR) AS max, avg(event_id) AS avg FROM events " +
        "UNION ALL SELECT 'user_id', count(*), " +
        "CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT), " +
        "count(DISTINCT user_id), CAST(min(user_id) AS VARCHAR), " +
        "CAST(max(user_id) AS VARCHAR), avg(user_id) FROM events " +
        "UNION ALL SELECT 'event_type', count(*), " +
        "CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT), " +
        "count(DISTINCT event_type), CAST(min(event_type) AS VARCHAR), " +
        "CAST(max(event_type) AS VARCHAR), CAST(NULL AS DOUBLE) FROM events" +
        ") ORDER BY \"column\""),
    "llm_domain_cap" ->
      ("WITH c AS (SELECT source, doc_id, row_number() OVER " +
        "(PARTITION BY source || '/' || CAST(doc_id % 7 AS VARCHAR) ORDER BY doc_id) AS rn " +
        "FROM documents) " +
        "SELECT source, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids " +
        "FROM c WHERE rn <= 5 GROUP BY source ORDER BY source"),
    "range_join" ->
      ("WITH c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT * FROM events WHERE event_type = 'purchase') " +
        "SELECT count(*) AS pairs, count(DISTINCT p.event_id) AS purchases_matched, " +
        "CAST(sum(c.click_id) AS BIGINT) AS sum_click_ids " +
        "FROM p JOIN c ON p.user_id = c.user_id " +
        "AND epoch_ns(c.ts) BETWEEN epoch_ns(p.ts) - 86400000000000 AND epoch_ns(p.ts)"),
    // replayable word/char totals; the tokenizer contracts (round trip,
    // bounds, compression) are constants the Spark side must prove
    "llm_bpe_tokenizer" ->
      ("SELECT count(*) AS docs, " +
        "CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE " +
        "len(regexp_split_to_array(lower(trim(text)), '\\s+')) END) AS BIGINT) AS total_words, " +
        "CAST(sum(length(regexp_replace(text, '\\s', '', 'g'))) AS BIGINT) AS total_chars, " +
        "CAST(40 AS BIGINT) AS merges_learned, true AS roundtrip_ok, " +
        "true AS tokens_bounded, true AS compressed FROM documents"),
    // full train + score + bucket replay: integer-scaled probabilities
    // (floor(1e6*s)) make every aggregate order-free and engine-exact
    "llm_lm_perplexity" ->
      ("WITH tr AS (SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "w -> length(w) > 0) AS toks FROM documents WHERE doc_id % 5 <> 0), " +
        "uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(toks) AS w FROM tr) GROUP BY w), " +
        "tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni), " +
        "bi AS (SELECT w1, w2, count(*) AS c12 FROM (SELECT p.w1 AS w1, p.w2 AS w2 FROM " +
        "(SELECT unnest(list_transform(range(2, len(toks) + 1), " +
        "i -> struct_pack(w1 := toks[i - 1], w2 := toks[i]))) AS p FROM tr)) GROUP BY w1, w2), " +
        "held AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "w -> length(w) > 0) AS toks FROM documents WHERE doc_id % 5 = 0), " +
        "trans AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM " +
        "(SELECT doc_id, unnest(list_transform(range(2, len(toks) + 1), " +
        "i -> struct_pack(w1 := toks[i - 1], w2 := toks[i]))) AS p FROM held)), " +
        "sc AS (SELECT t.doc_id AS doc_id, CAST(floor(1000000.0 * " +
        "(CASE WHEN b.c12 IS NOT NULL AND u1.c1 IS NOT NULL " +
        "THEN CAST(b.c12 AS DOUBLE) / CAST(u1.c1 AS DOUBLE) " +
        "ELSE 0.4 * CAST(coalesce(u2.c1, 1) AS DOUBLE) / (SELECT n FROM tot) END)) AS BIGINT) AS s_e6 " +
        "FROM trans t LEFT JOIN bi b ON t.w1 = b.w1 AND t.w2 = b.w2 " +
        "LEFT JOIN uni u1 ON t.w1 = u1.w LEFT JOIN uni u2 ON t.w2 = u2.w), " +
        "per AS (SELECT doc_id, count(*) AS nt, " +
        "CAST(floor(CAST(sum(s_e6) AS DOUBLE) / count(*)) AS BIGINT) AS prob_e6 " +
        "FROM sc GROUP BY doc_id), " +
        "f AS (SELECT h.doc_id AS doc_id, coalesce(per.nt, 0) AS nt, per.prob_e6 AS prob_e6 " +
        "FROM (SELECT DISTINCT doc_id FROM held) h LEFT JOIN per ON h.doc_id = per.doc_id) " +
        "SELECT count(*) AS scored_docs, CAST(sum(nt) AS BIGINT) AS sum_transitions, " +
        "CAST(sum(coalesce(prob_e6, 0)) AS BIGINT) AS sum_prob_e6, " +
        "CAST(sum(CASE WHEN prob_e6 >= 33900 THEN 1 ELSE 0 END) AS BIGINT) AS head_docs, " +
        "CAST(sum(CASE WHEN prob_e6 < 33900 AND prob_e6 > 32200 THEN 1 ELSE 0 END) AS BIGINT) AS middle_docs, " +
        "CAST(sum(CASE WHEN prob_e6 IS NULL OR prob_e6 <= 32200 THEN 1 ELSE 0 END) AS BIGINT) AS tail_docs " +
        "FROM f"),
    // inputs are closed-form in (doc_id, source, lang), so the oracle
    // re-derives the expected normalized URL + registrable domain per doc
    "llm_url_curation" ->
      ("WITH u AS (SELECT doc_id, " +
        "source || (CASE WHEN doc_id % 4 = 1 THEN '.co.uk' ELSE '.com' END) AS domain, " +
        "('http' || (CASE WHEN doc_id % 3 = 0 THEN '' ELSE 's' END) || '://' || " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) || source || " +
        "(CASE WHEN doc_id % 4 = 1 THEN '.co.uk' ELSE '.com' END) || '/' || lang || '/' || " +
        "CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR)) AS norm_url " +
        "FROM documents) " +
        "SELECT doc_id, domain, norm_url FROM u " +
        "WHERE domain NOT IN ('src0.com', 'src1.co.uk') ORDER BY doc_id"),
    // the first 20 docs of the training epoch, re-derived from the same
    // Knuth multiplicative arithmetic (k/2^32 draws are exact doubles)
    "llm_train_order" ->
      ("SELECT doc_id, CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS draw " +
        "FROM documents ORDER BY draw, doc_id LIMIT 20"),
    // decisions forced by the planted tokens; vocab = distinct base-text
    // tokens of the train split + the 4 planted class markers
    "llm_nb_classifier" ->
      ("WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0), " +
        "v AS (SELECT count(DISTINCT w) AS nv FROM (SELECT unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> length(x) > 0)) AS w FROM tr)) " +
        "SELECT (SELECT count(*) FROM documents WHERE doc_id % 5 = 0) AS held_docs, " +
        "CAST((SELECT count(*) FROM documents WHERE doc_id % 5 = 0) AS BIGINT) AS correct, " +
        "CAST((SELECT count(*) FROM documents WHERE doc_id % 5 = 0 AND doc_id % 2 = 0) AS BIGINT) AS pred_good, " +
        "CAST((SELECT nv FROM v) + 4 AS BIGINT) AS vocab_size, " +
        "CAST((SELECT count(*) FROM tr) AS BIGINT) AS train_docs, " +
        "CAST((SELECT count(*) FROM tr WHERE doc_id % 2 = 0) AS BIGINT) AS train_good_docs"),
    // full DSIR replay: portable polynomial hash -> bucket counts ->
    // smoothed floored log-ratio table -> per-doc bigint weights -> top-20
    "llm_dsir_select" ->
      ("WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "w -> length(w) > 0) AS toks FROM documents), " +
        "feats AS (SELECT doc_id, unnest(toks || list_transform(range(2, len(toks) + 1), " +
        "i -> toks[i - 1] || ' ' || toks[i])) AS f FROM d), " +
        "fb AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(1, length(f) + 1), i -> CAST(unicode(f[i]) AS BIGINT))), " +
        "(h, c) -> (h * 31 + c) % 1024) AS bucket FROM feats), " +
        "tc AS (SELECT bucket, count(*) AS ct FROM fb WHERE doc_id % 7 = 0 GROUP BY bucket), " +
        "rc AS (SELECT bucket, count(*) AS cr FROM fb WHERE doc_id % 7 <> 0 GROUP BY bucket), " +
        "tt AS (SELECT coalesce(sum(ct), 0) AS n FROM tc), " +
        "rt AS (SELECT coalesce(sum(cr), 0) AS n FROM rc), " +
        "lr AS (SELECT b.bucket AS bucket, CAST(floor(1000000.0 * log10(" +
        "(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / ((SELECT n FROM tt) + 1024.0)) / " +
        "(CAST(coalesce(rc.cr, 0) + 1 AS DOUBLE) / ((SELECT n FROM rt) + 1024.0)))) AS BIGINT) AS lr_e6 " +
        "FROM (SELECT unnest(range(0, 1024)) AS bucket) b " +
        "LEFT JOIN tc ON b.bucket = tc.bucket LEFT JOIN rc ON b.bucket = rc.bucket), " +
        "sc AS (SELECT fb.doc_id AS doc_id, count(*) AS n_features, sum(lr.lr_e6) AS weight_e6 " +
        "FROM fb JOIN lr ON fb.bucket = lr.bucket WHERE fb.doc_id % 7 <> 0 GROUP BY fb.doc_id), " +
        "f AS (SELECT r.doc_id AS doc_id, coalesce(sc.n_features, 0) AS n_features, " +
        "coalesce(sc.weight_e6, 0) AS weight_e6 " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) r " +
        "LEFT JOIN sc ON r.doc_id = sc.doc_id) " +
        "SELECT doc_id, CAST(n_features AS BIGINT) AS n_features, " +
        "CAST(weight_e6 AS BIGINT) AS weight_e6 FROM f " +
        "ORDER BY weight_e6 DESC, doc_id LIMIT 20"),
    // temperature mixture replay: integer-scaled sqrt weights, Hamilton
    // apportionment in bigint arithmetic, per-lang smallest-draw heads
    "llm_temperature_mix" ->
      ("WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang), " +
        "w AS (SELECT lang, cnt, CAST(floor(1000000.0 * sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS wk FROM c), " +
        "tot AS (SELECT sum(wk) AS bw FROM w), " +
        "b AS (SELECT lang, cnt, wk, (200 * wk) // (SELECT bw FROM tot) AS base, " +
        "(200 * wk) % (SELECT bw FROM tot) AS rem FROM w), " +
        "d AS (SELECT 200 - sum(base) AS deficit FROM b), " +
        "q AS (SELECT lang, base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) " +
        "<= (SELECT deficit FROM d) THEN 1 ELSE 0 END) AS quota FROM b), " +
        "r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
        "ORDER BY CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0, doc_id) AS rn " +
        "FROM documents), " +
        "kept AS (SELECT r.lang AS lang, r.doc_id AS doc_id FROM r JOIN q ON r.lang = q.lang " +
        "WHERE r.rn <= q.quota) " +
        "SELECT q.lang AS lang, CAST(q.quota AS BIGINT) AS quota, " +
        "CAST(count(kept.doc_id) AS BIGINT) AS kept, CAST(sum(kept.doc_id) AS BIGINT) AS sum_ids " +
        "FROM q JOIN kept ON q.lang = kept.lang GROUP BY q.lang, q.quota ORDER BY lang"),
    // the composed pipeline, replayed stage by stage: gopher keep rules ->
    // min-id-per-content dedup -> 8-gram benchmark anti-join -> source cap
    "llm_e2e_pipeline" ->
      ("WITH t1 AS (SELECT doc_id, source, text, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents), " +
        "t2 AS (SELECT doc_id, source, text, len(tk) AS nt, " +
        "CASE WHEN len(tk) < 2 THEN 0 ELSE " +
        "list_max(list_transform(list_distinct(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])), " +
        "s -> len(list_filter(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]), x -> x = s)))) END AS mode2, " +
        "list_filter(list_transform(string_split(lower(text), '.'), s -> trim(s)), s -> len(s) > 0) AS sents, " +
        "list_sum(list_transform(tk, w -> len(w))) AS sumw, " +
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s.,!?''\"-]')) AS nsym FROM t1), " +
        "r AS (SELECT doc_id, source, text, nt, mode2, " +
        "CASE WHEN nt < 2 THEN 0.0 ELSE mode2 * 2 / CAST(nt AS DOUBLE) END AS top2, " +
        "CASE WHEN len(sents) <= 0 THEN 0.0 ELSE 1.0 - len(list_distinct(sents)) / CAST(len(sents) AS DOUBLE) END AS dupf, " +
        "CASE WHEN nt <= 0 THEN 0.0 ELSE sumw / CAST(nt AS DOUBLE) END AS mwl, " +
        "CASE WHEN nt <= 0 THEN 0.0 ELSE nsym / CAST(nt AS DOUBLE) END AS symr FROM t2), " +
        "q AS (SELECT doc_id, source, text FROM r WHERE (mode2 < 3 OR top2 <= 0.2) " +
        "AND dupf <= 0.3 AND mwl BETWEEN 2.0 AND 12.0 AND symr <= 0.3), " +
        "dd AS (SELECT doc_id, source, text FROM " +
        "(SELECT q.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q) WHERE rn = 1), " +
        "bt AS (SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents WHERE doc_id % 50 = 0), " +
        "bg AS (SELECT DISTINCT unnest(list_distinct(CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')] " +
        "ELSE list_transform(range(1, len(tk) - 6), i -> array_to_string(list_slice(tk, i, i + 7), ' ')) END)) AS gram FROM bt), " +
        "dg AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')] " +
        "ELSE list_transform(range(1, len(tk) - 6), i -> array_to_string(list_slice(tk, i, i + 7), ' ')) END)) AS gram " +
        "FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM dd)), " +
        "contam AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (gram)), " +
        "clean AS (SELECT dd.* FROM dd LEFT JOIN contam ON dd.doc_id = contam.doc_id WHERE contam.doc_id IS NULL), " +
        "capped AS (SELECT doc_id, source FROM " +
        "(SELECT clean.*, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM clean) WHERE rn <= 40) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids " +
        "FROM capped GROUP BY source ORDER BY source"),
    // upsample replay: copies = floor(e) + [uniform(doc_id) < frac(e)];
    // sum_epoch telescopes to cp*(cp+1)/2 per doc
    "llm_epoch_upsample" ->
      ("WITH p AS (SELECT doc_id, lang, " +
        "CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 2 WHEN 'de' THEN 0 ELSE 1 END AS wh, " +
        "CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25 ELSE 0.0 END AS fr, " +
        "CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 AS u FROM documents), " +
        "c AS (SELECT doc_id, lang, wh + (CASE WHEN u < fr THEN 1 ELSE 0 END) AS cp, " +
        "(CASE WHEN u < fr THEN 1 ELSE 0 END) AS extra FROM p) " +
        "SELECT lang, CAST(sum(cp) AS BIGINT) AS rows_out, " +
        "CAST(count(*) FILTER (WHERE cp > 0) AS BIGINT) AS docs_in, " +
        "CAST(sum((cp * (cp + 1)) // 2) AS BIGINT) AS sum_epoch, " +
        "CAST(sum(doc_id * extra) AS BIGINT) AS sum_extra_ids " +
        "FROM c GROUP BY lang HAVING sum(cp) > 0 ORDER BY lang"))

  // DuckDB replays BM25 end-to-end: same tokenization, same corpus
  // stats, same EXPLICITLY ORDERED contribution sum (term 0 first —
  // summation order is the only FP freedom), scores rounded to 4.
  // Shared by llm_bm25_search (full-scan path), llm_bm25_index (the
  // persisted-index path, which must be bit-identical to it), and
  // llm_bm25_sync (the feed-maintained index over a MUTATED corpus —
  // same replay, different corpus CTE).
  private def bm25ReplayBody(corpus: String): String =
    "tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t FROM " + corpus + "), " +
      "pd AS (SELECT doc_id, count(*) AS dl, " +
      "sum(CASE WHEN t = 'spark' THEN 1 ELSE 0 END) AS tf0, " +
      "sum(CASE WHEN t = 'query' THEN 1 ELSE 0 END) AS tf1, " +
      "sum(CASE WHEN t = 'window' THEN 1 ELSE 0 END) AS tf2 FROM tk GROUP BY doc_id), " +
      "st AS (SELECT count(*) AS n, avg(dl) AS avgdl, " +
      "sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0, " +
      "sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1, " +
      "sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM pd), " +
      "sc AS (SELECT doc_id, " +
      "((ln(1 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))) " +
      "+ (ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)))) " +
      "+ (ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score " +
      "FROM pd, st) " +
      "SELECT doc_id, round(score, 4) AS score FROM sc WHERE score > 0 " +
      "ORDER BY score DESC, doc_id LIMIT 10"

  private val Bm25ReplaySql: String = "WITH " + bm25ReplayBody("documents")

  // The feed-synced index's corpus after the fixture's DML: docs with
  // user_id-free deterministic mutations — %41==3 got ' spark spark
  // window' appended, %37==5 were MoR-deleted, and fresh docs entered at
  // doc_id+10000000 (mirrors Fixtures.docsTextIndexSync exactly).
  private val Bm25SyncReplaySql: String =
    "WITH corpus AS (" +
      "SELECT doc_id, CASE WHEN doc_id % 41 = 3 THEN text || ' spark spark window' ELSE text END AS text " +
      "FROM documents WHERE doc_id % 37 <> 5 " +
      "UNION ALL SELECT doc_id + 10000000, 'spark window fresh doc' " +
      "FROM documents WHERE doc_id % 53 = 1), " +
      bm25ReplayBody("corpus")
}
