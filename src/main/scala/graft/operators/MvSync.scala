package graft.operators

import graft.ice.{CdcApply, ChangeFeed, IceTable, IceTableConfig}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance (IVM) over the row-level
  * change feed: a GROUP BY count/sum/min/max/avg/count(distinct) view —
  * optionally filtered (WHERE), keyed by expressions, and enriched by a
  * star join against a dimension table — kept current as its base table
  * mutates through inserts, CoW updates, and merge-on-read deletes,
  * without ever re-aggregating the base.
  *
  * The reference's materialized views are ingest-time double-writes
  * (`examples/materialized-view.py:91-98` — every batch lands in the raw
  * table AND an aggregating merge table), which is exactly
  * [[graft.streaming.Streams.mvSink]]. That shape cannot follow UPDATE or
  * DELETE on the base. This operator closes the gap with textbook
  * delta-maintenance:
  *
  *  - '''count/sum are self-maintainable''': each sync window appends
  *    PARTIAL rows — per-group `(+count, +sum)` of the window's insert
  *    images. Nothing existing is read or rewritten; work is delta-sized.
  *  - '''min/max are not self-maintainable under retraction''': a deleted
  *    row may have carried the group's minimum. Any group touched by a
  *    delete image in the window gets a RESET row instead — ALL its
  *    aggregates recomputed exactly from the base AS OF the window bound.
  *    The recompute scans only the retracted groups (pushed as an `isin`
  *    literal when the set is small — partition/stats-prunable on a
  *    group-partitioned base — else a broadcast semi join), so retraction
  *    cost is affected-groups-sized, never base-sized.
  *  - '''count(distinct) maintains as mergeable HLL state''' (partial =
  *    hll_sketch_agg per window, fold = hll_union_agg); retraction by
  *    the same reset rule — a sketch cannot subtract.
  *  - '''WHERE / expression keys / star joins''' route through ONE choke
  *    point ([[MvSpec.prepare]]) applied identically to the seed scan
  *    and to every window's insert AND delete images; a dimension
  *    mutation is commit-version-detected and triggers an atomic full
  *    reseed (including cnt=0 retractions for groups it emptied).
  *
  * MV row layout: group cols, `cnt`, `sum_<c>`…, `min_<c>`…, `max_<c>`…,
  * `gen` (the window's settled bound), `is_reset`. [[read]] folds per
  * group: the newest reset (if any) plus every partial from strictly
  * later windows; groups folding to `cnt = 0` (fully retracted) vanish.
  * Compaction folds rows WITHIN a `(group, gen, is_reset)` cell (the
  * custom merge SQL) — never across generations, because a subset-of-
  * files fold across a reset boundary would not be associative.
  *
  * Exactly-once: each window's delta commits through
  * [[IceTable.insertBatch]] keyed by the window bound — the data files
  * and the watermark record are ONE atomic log PUT, and a crash-replayed
  * window is recognized from the MV's own log and skipped. Idle windows
  * commit nothing.
  *
  * Fragmentation is bounded by [[rebase]]: one fresh reset generation for
  * every live group (readers see the compacted state atomically the
  * moment it commits, because newest-reset-wins is the read rule) plus a
  * CoW cleanup of the superseded rows.
  *
  * 100 TB shape: sync cost is (window delta + retracted-group rescans);
  * the MV itself shuffles only at read (one exchange on the group key,
  * MV-sized) — for a large MV pass a group-derived `partitionExpr` to
  * [[create]] so reads prune and the read shuffle drops to touched
  * partitions.
  */
object MvSync {

  /** A star-join enrichment baked into a view definition: every
    * maintenance aggregation joins the FACT rows (base scan or feed
    * images, aliased `factAlias`) with the dimension table (aliased
    * `dimAlias`) on `condSql`, INNER — unmatched fact rows leave the
    * view, exactly like the defining query. The fact side is the
    * maintained (feed-driven) side; dimension mutations are detected by
    * commit version and maintained PARTIALLY from the dim's own change
    * feed (only the affected groups reset — see [[syncFromFeed]]), with
    * an atomic full reseed as the fallback. */
  case class MvJoinDim(dimTable: String, factAlias: String,
      dimAlias: String, condSql: String)

  /** View definition: `groupCols` keys, `sumCols` summed (count is always
    * maintained), `minMaxCols` tracked as min+max, `distinctCols` tracked
    * as mergeable HLL sketch state (`count(distinct)`). */
  case class MvSpec(
      groupCols: Seq[String],
      sumCols: Seq[String] = Nil,
      minMaxCols: Seq[String] = Nil,
      // per-column NON-NULL counts — what avg divides by (avg(x) is
      // sum(x)/count(x), not sum(x)/count(*): a null x must not deflate
      // the mean)
      countCols: Seq[String] = Nil,
      // count(distinct c): the partial is a BINARY DataSketches HLL
      // sketch per window (hll_sketch_agg), the fold an hll_union_agg —
      // associative under any subset-of-rows merge, exactly like sum.
      // Retraction is covered by the same reset rule as min/max: a
      // sketch cannot subtract, so delete-touched groups recompute their
      // sketch from the base (the reset row's hll replaces, never unions
      // across, older generations — newest-reset-wins)
      distinctCols: Seq[String] = Nil,
      // EXPRESSION group keys: (alias in groupCols) -> SQL expression
      // over base columns, materialized as a derived column by [[prepare]]
      // before every aggregation (seed, window delta, resets, rebase).
      // The MV stores the derived value under the alias, so reads and
      // folds never re-evaluate the expression
      derivedGroups: Seq[(String, String)] = Nil,
      // WHERE predicate over base columns, applied by [[prepare]] to the
      // seed scan AND to every feed window — insert and delete images
      // filter IDENTICALLY, so a row that never passed the filter also
      // never retracts, and an update moving a row across the filter
      // boundary arrives as delete(old image) + insert(new image), each
      // judged on its own values
      filterSql: Option[String] = None,
      // star-join enrichment: fact rows join the dimension snapshot
      // before filter/derive/aggregate on every maintenance path; the
      // dim DataFrame itself is a runtime argument (a pinned snapshot),
      // threaded by the caller — the spec stores only the shape
      joinDim: Option[MvJoinDim] = None) {
    require(groupCols.nonEmpty, "MvSpec needs at least one group column")
    // value-column names: aggregate args may be alias-qualified in a
    // join view (`f.v`, `d.x`); a dot inside a stored column name would
    // read back as a struct-field path, so sanitize
    private def safe(c: String): String = c.replace('.', '_')
    def sumCol(c: String): String = s"sum_${safe(c)}"
    def minCol(c: String): String = s"min_${safe(c)}"
    def maxCol(c: String): String = s"max_${safe(c)}"
    def cntCol(c: String): String = s"cnt_${safe(c)}"
    def hllCol(c: String): String = s"hll_${safe(c)}"
    /** Join + filter + derived-group-column projection of any fact
      * base/feed frame — the single choke point that keeps every
      * maintenance path's view of "the rows this MV aggregates"
      * identical. `dim` must be supplied (a pinned dimension snapshot)
      * exactly when [[joinDim]] is set. */
    private[operators] def prepare(
        df: DataFrame, dim: Option[DataFrame] = None): DataFrame = {
      val joined = joinDim match {
        case None => df
        case Some(j) =>
          val d = dim.getOrElse(throw new IllegalArgumentException(
            s"view joins dimension '${j.dimTable}' — a pinned dim " +
              "snapshot must be supplied to every maintenance call"))
          df.alias(j.factAlias)
            .join(d.alias(j.dimAlias), expr(j.condSql), "inner")
      }
      val filtered = filterSql.fold(joined)(p => joined.where(expr(p)))
      val derived = derivedGroups.foldLeft(filtered) { case (d, (name, sql)) =>
        d.withColumn(name, expr(sql)) }
      // ALIAS-QUALIFIED aggregate args (`f.v` in a join view) resolve
      // only while the join aliases are in scope — downstream stages
      // re-alias the prepared frame (the window-delta anti join), so
      // materialize each as a plain sanitized column here and aggregate
      // over that. A sanitized name colliding with a REAL input column
      // (`f.v` vs an actual `f_v`) would silently overwrite it for every
      // aggregate in the view — refuse loudly instead.
      val qualified = (sumCols ++ countCols ++ minMaxCols ++ distinctCols)
        .filter(_.contains('.')).distinct
      qualified.foreach { c =>
        require(!derived.columns.exists(_.equalsIgnoreCase(safe(c))),
          s"aggregate argument `$c` materializes as column `${safe(c)}`, " +
            "which already exists on the joined input — rename that " +
            "column or qualify differently")
      }
      qualified.foldLeft(derived) { (d, c) => d.withColumn(safe(c), expr(c)) }
    }
    // aggregate-arg reference: qualified args read their materialized
    // plain column (see prepare); plain args read themselves
    private def argCol(c: String): Column =
      if (c.contains('.')) col(safe(c)) else col(c)
    /** Aggregates of `src` rows into one partial/reset row per group. */
    private[operators] def aggExprs: Seq[Column] =
      count(lit(1)).as("cnt") +:
        (sumCols.map(c => sum(argCol(c)).as(sumCol(c))) ++
          countCols.map(c => count(argCol(c)).as(cntCol(c))) ++
          minMaxCols.flatMap(c => Seq(
            min(argCol(c)).as(minCol(c)), max(argCol(c)).as(maxCol(c)))) ++
          distinctCols.map(c => hll_sketch_agg(argCol(c)).as(hllCol(c))))
    private[operators] def valueCols: Seq[String] =
      "cnt" +: (sumCols.map(sumCol) ++ countCols.map(cntCol) ++
        minMaxCols.flatMap(c => Seq(minCol(c), maxCol(c))) ++
        distinctCols.map(hllCol))
  }

  /** One output column of a SQL-defined view: `kind` ∈ cnt | sum | min |
    * max | avg | dcnt (= `count(distinct col)`, HLL-state maintained),
    * `col` the aggregated source column ("" for cnt). */
  case class MvOutput(alias: String, kind: String, col: String)

  /** A SQL-defined materialized view: source TABLE NAME (warehouse-
    * resolved, so the definition travels with the log), group columns
    * (plain names, or aliases of `groupExprs` entries), the SELECT's
    * output list, an optional WHERE predicate, and the expression group
    * keys. Persisted as one JSON string in the MV table's config word
    * (`mvd`), so any reopened handle — and the catalog resolution rule —
    * can reconstruct both the maintenance [[MvSpec]] and the user-facing
    * projection. */
  case class MvViewDef(source: String, groupCols: Seq[String],
      outputs: Seq[MvOutput],
      filterSql: Option[String] = None,
      groupExprs: Seq[(String, String)] = Nil,
      dim: Option[MvJoinDim] = None) {
    def spec: MvSpec = MvSpec(
      groupCols,
      sumCols = outputs.collect {
        case o if o.kind == "sum" || o.kind == "avg" => o.col }.distinct,
      minMaxCols = outputs.collect {
        case o if o.kind == "min" || o.kind == "max" => o.col }.distinct,
      countCols = outputs.collect {
        case o if o.kind == "avg" => o.col }.distinct,
      distinctCols = outputs.collect {
        case o if o.kind == "dcnt" => o.col }.distinct,
      derivedGroups = groupExprs,
      filterSql = filterSql,
      joinDim = dim)
    def encode: String = {
      val base = Seq[(String, Any)](
        "src" -> source, "g" -> groupCols,
        "o" -> outputs.map(o => Seq(o.alias, o.kind, o.col)))
      val withW = filterSql.fold(base)(w => base :+ ("w" -> w))
      val withGe =
        if (groupExprs.isEmpty) withW
        else withW :+ ("ge" -> groupExprs.map { case (a, e) => Seq(a, e) })
      val withJ = dim.fold(withGe)(j => withGe :+
        ("j" -> Seq(j.dimTable, j.factAlias, j.dimAlias, j.condSql)))
      graft.ice.Json.obj(withJ: _*)
    }
  }

  object MvViewDef {
    def decode(s: String): MvViewDef = {
      val m = graft.ice.Json.parseObject(s)
      def strs(v: Any): Seq[String] = v match {
        case xs: scala.collection.Seq[_] => xs.map(_.toString).toSeq
        case _ => Seq.empty
      }
      def pairs(v: Any): Seq[(String, String)] = v match {
        case xs: scala.collection.Seq[_] => xs.map { e =>
          val f = strs(e); (f(0), f(1))
        }.toSeq
        case _ => Seq.empty
      }
      MvViewDef(
        m("src").toString,
        strs(m("g")),
        m("o") match {
          case xs: scala.collection.Seq[_] => xs.map { e =>
            val f = strs(e); MvOutput(f(0), f(1), f(2))
          }.toSeq
          case _ => Seq.empty
        },
        filterSql = m.get("w").map(_.toString),
        groupExprs = m.get("ge").map(pairs).getOrElse(Nil),
        dim = m.get("j").map { v =>
          val f = strs(v); MvJoinDim(f(0), f(1), f(2), f(3))
        })
    }
  }

  /** The user-facing shape of a SQL-defined view: [[read]]'s folded
    * state projected to the SELECT's aliases (avg derives as sum/cnt —
    * the partials never store a non-reaggregable mean). */
  def readView(mv: IceTable, d: MvViewDef,
      maxTs: Long = Long.MaxValue): DataFrame =
    projectView(read(mv, d.spec, maxTs), d)

  /** Table config for the MV: compaction folds within a
    * `(group, gen, is_reset)` cell — `cnt`/sums re-sum, min/max re-fold —
    * which is associative under any subset-of-files merge. */
  def mvConfig(spec: MvSpec,
      partitionExpr: Column = lit("all"),
      viewDef: Option[MvViewDef] = None): IceTableConfig = {
    val keys = (spec.groupCols ++ Seq("gen", "is_reset"))
      .map(c => s"`$c`").mkString(", ")
    val folds = (s"sum(`cnt`) as cnt" +:
      (spec.sumCols.map(c => s"sum(`${spec.sumCol(c)}`) as ${spec.sumCol(c)}") ++
        spec.countCols.map(c => s"sum(`${spec.cntCol(c)}`) as ${spec.cntCol(c)}") ++
        spec.minMaxCols.flatMap(c => Seq(
          s"min(`${spec.minCol(c)}`) as ${spec.minCol(c)}",
          s"max(`${spec.maxCol(c)}`) as ${spec.maxCol(c)}")) ++
        spec.distinctCols.map(c =>
          s"hll_union_agg(`${spec.hllCol(c)}`) as ${spec.hllCol(c)}")))
      .mkString(", ")
    IceTableConfig(
      partitionExpr = partitionExpr,
      sortOrder = spec.groupCols,
      customMergeSql = Some(
        s"select $keys, $folds from source_files group by $keys"),
      mvDef = viewDef.map(_.encode))
  }

  def create(spark: org.apache.spark.sql.SparkSession, root: String,
      spec: MvSpec,
      partitionExpr: Column = lit("all"),
      viewDef: Option[MvViewDef] = None): IceTable =
    new IceTable(spark, root, mvConfig(spec, partitionExpr, viewDef))

  /** Null-safe equality on the group columns between two ALIASED
    * relations (both sides of every join here share lineage through the
    * feed, so bare `df(col)` references would be ambiguous). */
  private def groupCond(lAlias: String, rAlias: String,
      cols: Seq[String]): Column =
    cols.map(c => col(s"$lAlias.`$c`") <=> col(s"$rAlias.`$c`"))
      .reduce(_ && _)

  /** The maintenance paths aggregate the source's RAW rows — a source
    * that is itself an MV would feed its partial/reset bookkeeping
    * (gen/is_reset, superseded generations) into the aggregates and
    * silently corrupt the view. Reject it everywhere, like the DML
    * surface does. */
  private def requireNotMvSource(source: IceTable): Unit =
    require(source.cfg.mvDef.isEmpty,
      s"table at ${source.root} is itself a materialized view: an MV " +
        "cannot be the source of another MV (its raw rows are partial/" +
        "reset bookkeeping, not data) — define the second view over the " +
        "original base table instead")

  /** Advance the MV to the base table's current settled state. First call
    * seeds the view with one full aggregation (every group a reset row);
    * later calls process only the feed window since the stored watermark.
    *
    * For a join view ([[MvSpec.joinDim]]) the caller supplies the
    * dimension TABLE HANDLE; the sync pins its newest snapshot and
    * version itself. A version change since the last sync maintains
    * INCREMENTALLY when possible: the dim's own row-level change feed
    * yields the changed dim rows, fact ⋈ changed-rows (old images → the
    * groups those facts LEFT, new images → the groups they ENTER) names
    * the affected groups, and only those reset — dim-change cost is
    * affected-groups-sized, not view-sized. Falls back to a full reseed
    * (one fresh reset generation + cnt=0 retractions for emptied groups,
    * readers correct throughout via newest-reset-wins) when the dim
    * delta is unattributable (cleanup horizon), oversized
    * (> maxPruneGroups changed rows — at that volume most groups are
    * affected anyway), or the recorded version cannot anchor a window.
    * Returns (partial-group rows appended, groups reset). */
  def syncFromFeed(source: IceTable, mv: IceTable, spec: MvSpec,
      replicaId: String = "default",
      maxPruneGroups: Int = 1000,
      dimTable: Option[IceTable] = None): (Long, Long) = {
    requireNotMvSource(source)
    spec.joinDim.foreach { j =>
      require(dimTable.nonEmpty,
        s"view joins dimension '${j.dimTable}': pass the dim table " +
          "handle to every sync")
      dimTable.foreach(requireNotMvSource)
    }
    // pin the dim snapshot + version once for the whole sync. The
    // version is the dim's max log-file ts — monotone, which the mark
    // channel requires (stream-commit records max-merge in the fold).
    // A dim RESTORE (version moving backwards) reads as a persistent
    // mismatch → full reseed per refresh until the clock re-passes the
    // recorded mark: degraded but always correct, self-healing. A
    // cross-host straggler landing at a ts at-or-below the recorded
    // version with no later commit is undetectable — the same
    // cross-process caveat as every settled-bound feed chain
    val (dim, dimVersion): (Option[DataFrame], Option[Long]) = dimTable match {
      case None => (None, None)
      case Some(dt) =>
        if (dt.trySnapshot(Long.MaxValue).isEmpty)
          throw new IllegalArgumentException(
            s"dimension table at ${dt.root} has no commits yet — seed it " +
              "before syncing a view that joins it")
        // FULL commit-state version (main log + dv side log): a dim-side
        // merge-on-read delete commits only to `_dv` and must be
        // detected and maintained like any other dim mutation
        val ver = dt.commitVersion()
        (Some(dt.read(ver + 1)), Some(ver))
    }
    val key = s"_mv_sync:$replicaId"
    val dimKey = s"_mv_dim:$replicaId"
    val groupCols = spec.groupCols.map(col)

    // one full aggregation landing as a reset generation at `until`;
    // the initial seed and the dim-change reseed share it exactly.
    // `retractStale`: groups live in the CURRENT view but absent from
    // the recompute (a dim move can empty a group without any fact
    // delta) must land cnt=0 resets IN THE SAME atomic commit — a
    // vanished group would otherwise keep serving its old reset forever.
    def fullResetSeed(until: Long, retractStale: Boolean): Long = {
      val fresh0 = spec.prepare(source.read(until + 1), dim)
        .groupBy(groupCols: _*).agg(spec.aggExprs.head, spec.aggExprs.tail: _*)
      // a schema-less MV (seeded while the source had no commits) has no
      // state to retract — and read(mv, spec) would refuse it
      val canRetract = retractStale &&
        mv.trySnapshot(Long.MaxValue).exists(_.schema.pairs.exists(_._1 == "gen"))
      // the stale computation references `fresh` three times (anti-join,
      // typed-null left join, union): checkpoint the group-count-sized
      // aggregate so the base scans once, not three times
      val fresh = if (canRetract) fresh0.localCheckpoint(true) else fresh0
      try {
        val withStale =
          if (!canRetract) fresh
          else {
            val staleKeys = read(mv, spec).select(groupCols: _*)
              .alias("_mvo").join(fresh.alias("_mvn"),
                groupCond("_mvo", "_mvn", spec.groupCols), "left_anti")
            // typed null value columns via the outer join against fresh
            // (no match by construction), cnt coalesced to the retraction 0
            val stale = staleKeys.alias("_mvl").join(fresh.alias("_mvr"),
                groupCond("_mvl", "_mvr", spec.groupCols), "left")
              .select(spec.groupCols.map(c => col(s"_mvl.`$c`").as(c)) ++
                (coalesce(col("_mvr.`cnt`"), lit(0L)).as("cnt") +:
                  spec.valueCols.drop(1).map(v => col(s"_mvr.`$v`").as(v))): _*)
            fresh.unionByName(stale)
          }
        val resets = withStale
          .withColumn("gen", lit(until))
          .withColumn("is_reset", lit(true))
          .localCheckpoint(true)
        try {
          val n = resets.count()
          // insert even when empty: the commit carries the view's COLUMN
          // SCHEMA, so read()/readView() work before any group exists
          mv.insertBatch(resets, key, until)
          // the dim marks commit separately AFTER: a crash in between
          // replays as "dim changed" → an extra (idempotent) reseed,
          // never a missed one
          dimVersion.foreach(v => CdcApply.commitMark(mv, dimKey, v))
          n
        } finally { resets.unpersist(); () }
      } finally { if (canRetract) { fresh.unpersist(); () } }
    }

    // count the delta's partial/reset rows, commit it (or just the
    // watermark when empty), then — only when it moved — the dim mark:
    // the one sequencing both window shapes must share
    def commitDelta(delta: DataFrame, until: Long,
        commitDim: Boolean): (Long, Long) = {
      // one job for both counts (the checkpointed delta is tiny)
      val byKind = delta.groupBy(col("is_reset")).count()
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val nPart = byKind.getOrElse(false, 0L)
      val nReset = byKind.getOrElse(true, 0L)
      if (nPart + nReset == 0) CdcApply.commitMark(mv, key, until)
      else mv.insertBatch(delta, key, until)
      if (commitDim)
        dimVersion.foreach(v => CdcApply.commitMark(mv, dimKey, v))
      (nPart, nReset)
    }

    CdcApply.readMark(mv, key) match {
      case None =>
        val until = ChangeFeed.settledNow(source)
        source.trySnapshot(until + 1) match {
          case None =>
            CdcApply.commitMark(mv, key, until)
            // record the dim baseline too: without it the next sync
            // reads "dim changed" and the retract path would trip over
            // the still-schema-less view
            dimVersion.foreach(v => CdcApply.commitMark(mv, dimKey, v))
            (0L, 0L)
          case Some(_) => (0L, fullResetSeed(until, retractStale = false))
        }

      case Some(wm) =>
        val prevDimVer = CdcApply.readMark(mv, dimKey)
        val dimChanged = spec.joinDim.nonEmpty && prevDimVer != dimVersion
        // the incremental dim path: the changed dim rows' images, bounded
        // and attributable. The window starts one ms BEFORE the recorded
        // version, so a same-millisecond commit that landed after the
        // previous pin is still captured — the commits legitimately AT
        // v0 re-appear too, which only re-resets already-correct groups
        // (over-capture is idempotent; under-capture is not). Requires a
        // strictly advanced version: a backwards move (dim RESTORE)
        // cannot anchor a window and falls back to the full reseed.
        val dimDelta: Option[DataFrame] =
          if (!dimChanged) None
          else (prevDimVer, dimVersion, dimTable) match {
            case (Some(v0), Some(v1), Some(dt)) if v1 > v0 =>
              try {
                val d = ChangeFeed.between(dt, v0 - 1, v1).localCheckpoint(true)
                if (d.count() > maxPruneGroups) { d.unpersist(); None }
                else Some(d)
              } catch { case _: Exception => None }
            case _ => None
          }
        if (dimChanged && dimDelta.isEmpty) {
          // fall back: recompute every group at a fresh settled bound
          // (covers any pending fact window too)
          val until = awaitSettledPast(source, wm,
            what = s"dim-change reseed of ${mv.root}")
          (0L, fullResetSeed(until, retractStale = true))
        } else if (dimChanged) {
          // PARTIAL dim maintenance. Affected groups come from the fact
          // base at BOTH window bounds joined with ALL changed-row
          // images: the base at the OLD watermark is the state the MV's
          // standing partials reflect — a fact row deleted inside the
          // pending window still witnessed its old dim mapping there, so
          // its old group resets (the post-window base alone could never
          // name it); the post-window base catches groups the changed
          // keys newly enter. Only that set resets; everything else
          // keeps its partials, and the pending fact window rides in the
          // same atomic delta commit. Any failure mid-computation (e.g.
          // the old-bound read racing a cleanup) falls back to the full
          // reseed, which needs no history.
          val dd = dimDelta.get
          try {
            val until = awaitSettledPast(source, wm,
              what = s"dim-delta sync of ${mv.root}")
            val images = broadcast(dd
              .where(col(ChangeFeed.ChangeTypeCol).isin("insert", "delete"))
              .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol))
            def groupsAt(bound: Long): DataFrame =
              spec.prepare(source.read(bound + 1), Some(images))
                .select(groupCols: _*)
            val affected = groupsAt(wm).unionByName(groupsAt(until))
              .distinct().localCheckpoint(true)
            try {
              val f = ChangeFeed.between(source, wm, until).localCheckpoint()
              try {
                val delta = windowDelta(source, spec, f, until,
                  maxPruneGroups, dim, extraRetracted = Some(affected))
                try commitDelta(delta, until, commitDim = true)
                finally { delta.unpersist(); () }
              } finally { f.unpersist(); () }
            } finally { affected.unpersist(); () }
          } catch { case e: Exception =>
            val until = awaitSettledPast(source, wm,
              what = s"dim-change reseed (partial path failed: " +
                s"${e.getMessage.take(120)}) of ${mv.root}")
            (0L, fullResetSeed(until, retractStale = true))
          } finally { dd.unpersist(); () }
        } else {
          val (feed, until) = ChangeFeed.betweenSettled(source, wm)
          val f = feed.localCheckpoint()
          try {
            if (f.isEmpty) return (0L, 0L) // idle window: commit nothing
            val delta = windowDelta(source, spec, f, until, maxPruneGroups, dim)
            try commitDelta(delta, until, commitDim = false)
            finally { delta.unpersist(); () }
          } finally { f.unpersist(); () }
        }
    }
  }

  /** The per-window delta at generation `gen`: insert-only groups
    * accumulate as partials; any group with a retraction in the window
    * is covered exactly by its reset (the recompute at `gen + 1` already
    * includes the window's own inserts). Returned eagerly checkpointed —
    * the caller unpersists. */
  private[graft] def windowDelta(source: IceTable, spec: MvSpec,
      feed: DataFrame, gen: Long, maxPruneGroups: Int,
      dim: Option[DataFrame] = None,
      // extra group rows to force-reset (the dim-delta path's affected
      // groups) — unioned with the feed's own retractions, so the reset
      // machinery (exact recompute, cnt=0 for emptied groups) covers both
      extraRetracted: Option[DataFrame] = None): DataFrame = {
    val groupCols = spec.groupCols.map(col)
    // join + WHERE + derived group keys apply to the feed ONCE, before
    // the insert/delete split: both image kinds enrich and filter
    // identically (a row that never passed never retracts either), and
    // the derived key is computed on each image's own values
    val fprep = spec.prepare(feed, dim)
    val feedRetracted = fprep
      .where(col(ChangeFeed.ChangeTypeCol) === "delete")
      .select(groupCols: _*)
    val retracted = extraRetracted
      .fold(feedRetracted)(e => feedRetracted.unionByName(e.select(groupCols: _*)))
      .distinct().localCheckpoint(true)
    try {
      val inserts = fprep.where(col(ChangeFeed.ChangeTypeCol) === "insert")
      val insAlive =
        if (retracted.isEmpty) inserts
        else inserts.alias("_mvi").join(broadcast(retracted.alias("_mvt")),
          groupCond("_mvi", "_mvt", spec.groupCols), "left_anti")
      val partials = insAlive
        .groupBy(groupCols: _*).agg(spec.aggExprs.head, spec.aggExprs.tail: _*)
        .withColumn("gen", lit(gen))
        .withColumn("is_reset", lit(false))
      val resets = resetRows(source, retracted, spec, gen, maxPruneGroups, dim)
      partials.unionByName(resets).localCheckpoint(true)
    } finally { retracted.unpersist(); () }
  }

  /** One STREAMING micro-batch of the source's change feed applied to
    * the MV — the foreachBatch body of
    * [[graft.streaming.Streams.mvSyncSink]]. Generation = the batch's
    * max commit ts; retraction resets time-travel the source back to
    * that instant, so they are exact even when later commits already
    * exist by the time the batch processes. Exactly-once: the delta and
    * the `(queryName, batchId)` record commit in ONE atomic log PUT
    * ([[IceTable.insertBatch]]); a crash-replayed batch is skipped. A
    * horizon-skip gap marker fails loudly — a view silently missing a
    * window is worse than a dead stream. */
  def applyFeedBatch(source: IceTable, mv: IceTable, spec: MvSpec,
      batch: DataFrame, batchId: Long, queryName: String = "_mv_stream",
      maxPruneGroups: Int = 1000,
      dimTable: Option[IceTable] = None): Unit = {
    requireNotMvSource(source)
    // a STREAMING join view maintains against a PINNED dimension: the
    // first batch records the dim version as the stream's baseline mark
    // (keyed by queryName), and any later version is a loud failure —
    // batch-sized deltas cannot absorb a dim move mid-stream. Recovery:
    // stop the query, MvSync.rebase(source, mv, spec, replicaId =
    // queryName, dimTable = …) to absorb the change (it re-records the
    // baseline), restart the stream from the rebase watermark.
    spec.joinDim.foreach { j =>
      require(dimTable.nonEmpty,
        s"view joins dimension '${j.dimTable}': pass the dim table " +
          "handle to every streaming batch")
      dimTable.foreach(requireNotMvSource)
    }
    val (dim, dimVersion): (Option[DataFrame], Option[Long]) = dimTable match {
      case None => (None, None)
      case Some(dt) =>
        // full commit-state version: main log + dv side log (a dim-side
        // MoR delete commits only to _dv)
        val ver = dt.commitVersion()
        (Some(dt.read(ver + 1)), Some(ver))
    }
    val dimKey = s"_mv_dim:$queryName"
    dimVersion.foreach { v =>
      CdcApply.readMark(mv, dimKey) match {
        case None => CdcApply.commitMark(mv, dimKey, v)
        case Some(v0) if v0 == v => ()
        case Some(v0) => throw new IllegalStateException(
          s"dimension '${spec.joinDim.get.dimTable}' changed under a " +
            s"STREAMING join view (version $v0 → $v): streaming " +
            "maintenance joins a pinned dim. Stop the query, run " +
            s"MvSync.rebase(source, mv, spec, replicaId = \"$queryName\", " +
            "dimTable = …) to absorb the change, then restart the stream " +
            "from the rebase watermark")
      }
    }
    val b = batch.localCheckpoint()
    try {
      if (b.isEmpty) return
      require(b.where(col(ChangeFeed.ChangeTypeCol) === "gap").isEmpty,
        "change-feed batch contains a horizon-skip gap marker: changes " +
          "before the feed floor are unrecoverable — rebuild the view " +
          "(drop + initial sync) instead of silently diverging")
      val gen = b.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
      val delta = windowDelta(source, spec, b, gen, maxPruneGroups, dim)
      try { mv.insertBatch(delta, queryName, batchId); () }
      finally { delta.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** Exact recompute of the retracted groups from the base as of
    * `until + 1`. Groups no longer present in the base materialize as
    * `cnt = 0` resets (so [[read]] drops them). The base scan is
    * restricted to the retracted groups: a small single-column set
    * becomes an `isin` literal (pushed to the scan — partition- and
    * stats-prunable), anything else a broadcast semi join. */
  private def resetRows(source: IceTable, retracted: DataFrame,
      spec: MvSpec, until: Long, maxPruneGroups: Int,
      dim: Option[DataFrame] = None): DataFrame = {
    val groupCols = spec.groupCols.map(col)
    val base = spec.prepare(source.read(until + 1), dim)
    def semiJoined: DataFrame =
      base.alias("_mvb").join(broadcast(retracted.alias("_mvt")),
        groupCond("_mvb", "_mvt", spec.groupCols), "left_semi")
    val touched =
      if (spec.groupCols.size == 1) {
        val c = spec.groupCols.head
        val vals = retracted.limit(maxPruneGroups + 1).collect().map(_.get(0))
        if (vals.length <= maxPruneGroups && !vals.contains(null))
          base.where(col(c).isin(vals.toIndexedSeq: _*))
        else semiJoined
      } else semiJoined
    val recomputed = touched
      .groupBy(groupCols: _*).agg(spec.aggExprs.head, spec.aggExprs.tail: _*)
    // left join from the retracted set so fully-deleted groups emit a
    // cnt = 0 reset (their older MV rows must stop counting)
    retracted.alias("_mvl").join(recomputed.alias("_mvr"),
        groupCond("_mvl", "_mvr", spec.groupCols), "left")
      .select(spec.groupCols.map(c => col(s"_mvl.`$c`").as(c)) ++
        (coalesce(col("_mvr.`cnt`"), lit(0L)).as("cnt") +:
          spec.valueCols.drop(1).map(v => col(s"_mvr.`$v`").as(v))): _*)
      .withColumn("gen", lit(until))
      .withColumn("is_reset", lit(true))
  }

  /** The view's current contents: per group, the newest reset plus every
    * strictly-later partial, folded. Groups whose live row count is zero
    * are dropped. One exchange on the group key, MV-sized. */
  def read(mv: IceTable, spec: MvSpec,
      maxTs: Long = Long.MaxValue): DataFrame = {
    val rows = mv.read(maxTs)
    require(rows.columns.contains("gen"),
      s"materialized view at ${mv.root} has no synced state yet")
    foldPartials(rows, spec)
  }

  /** The newest-reset-wins fold over raw partial rows from ANY source —
    * the snapshot read ([[read]]), or a manifest's bare file list
    * ([[graft.ice.ManifestExport]] exports the same algebra as DuckDB
    * SQL, so foreign engines see the folded view too). */
  def foldPartials(rows: DataFrame, spec: MvSpec): DataFrame = {
    val w = Window.partitionBy(spec.groupCols.map(col): _*)
    val rgen = max(when(col("is_reset"), col("gen"))).over(w)
    val live = rows.withColumn("_rgen", rgen).where(
      (col("is_reset") && col("gen") === col("_rgen")) ||
        (!col("is_reset") && col("gen") > coalesce(col("_rgen"),
          lit(Long.MinValue))))
    val folds = sum(col("cnt")).as("cnt") +:
      (spec.sumCols.map(c => sum(col(spec.sumCol(c))).as(spec.sumCol(c))) ++
        spec.countCols.map(c => sum(col(spec.cntCol(c))).as(spec.cntCol(c))) ++
        spec.minMaxCols.flatMap(c => Seq(
          min(col(spec.minCol(c))).as(spec.minCol(c)),
          max(col(spec.maxCol(c))).as(spec.maxCol(c)))) ++
        spec.distinctCols.map(c =>
          hll_union_agg(col(spec.hllCol(c)), lit(false)).as(spec.hllCol(c))))
    live.groupBy(spec.groupCols.map(col): _*)
      .agg(folds.head, folds.tail: _*)
      .where(col("cnt") > 0)
  }

  /** Project a folded frame to a view definition's output aliases —
    * [[readView]]'s projection, reusable over [[foldPartials]] of any
    * partial-row source. */
  def projectView(folded: DataFrame, d: MvViewDef): DataFrame = {
    val cols = d.groupCols.map(col) ++ d.outputs.map { o =>
      (o.kind match {
        case "cnt" => col("cnt")
        case "sum" => col(d.spec.sumCol(o.col))
        // avg = sum / NON-NULL count (all-null group → null, not an
        // ANSI divide-by-zero)
        case "avg" =>
          val nn = col(d.spec.cntCol(o.col))
          when(nn === 0, lit(null))
            .otherwise(col(d.spec.sumCol(o.col)) / nn)
        case "min" => col(d.spec.minCol(o.col))
        case "max" => col(d.spec.maxCol(o.col))
        // count(distinct): estimate off the unioned sketch state. Exact
        // while the sketch is in its sparse (coupon) regime — small
        // per-group cardinalities — and ±~2% beyond. An all-null group
        // never sketched anything (hll_sketch_agg skips nulls → null
        // state): coalesce to 0, matching ANSI count(distinct)
        case "dcnt" =>
          coalesce(hll_sketch_estimate(col(d.spec.hllCol(o.col))), lit(0L))
        case k => throw new IllegalArgumentException(s"unknown MV aggregate kind $k")
      }).as(o.alias)
    }
    folded.select(cols: _*)
  }

  /** Re-base the fragmented view onto one fresh reset generation: a full
    * recompute of the CURRENT base state lands as reset rows at a new
    * settled bound (also advancing the sync watermark — any feed activity
    * since the last sync is folded in), then the superseded older rows
    * are reclaimed with a CoW delete. Readers are correct throughout:
    * newest-reset-wins means the first commit alone already serves the
    * compacted state. Returns the number of live groups. */
  /** Wait (bounded, exponential backoff) for the source's settled clock
    * to pass `wm` — an open IceTransaction or in-flight commit can pin
    * the settled bound for its whole lifetime, and a 1 ms spin against a
    * pinned floor would burn a driver core for minutes. Bails with the
    * cause instead: the caller can retry after the transaction resolves. */
  private def awaitSettledPast(source: IceTable, wm: Long,
      timeoutMs: Long = 30_000L, what: String = "settled-bound wait"): Long = {
    val waitStart = System.currentTimeMillis()
    var sleepMs = 1L
    var until = ChangeFeed.settledNow(source)
    while (until <= wm) {
      if (System.currentTimeMillis() - waitStart >= timeoutMs)
        throw new IllegalStateException(
          s"$what: the source's settled clock ($until) has not passed " +
            s"the sync watermark ($wm) after ${timeoutMs} ms — an open " +
            "transaction or in-flight commit on the source is pinning " +
            "the settled bound; retry after it commits or aborts")
      Thread.sleep(sleepMs)
      sleepMs = math.min(sleepMs * 2, 100L)
      until = ChangeFeed.settledNow(source)
    }
    until
  }

  def rebase(source: IceTable, mv: IceTable, spec: MvSpec,
      replicaId: String = "default",
      settleTimeoutMs: Long = 30_000L,
      dimTable: Option[IceTable] = None): Long = {
    requireNotMvSource(source)
    val (dim, dimVersion): (Option[DataFrame], Option[Long]) = dimTable match {
      case None => (None, None)
      case Some(dt) =>
        // full commit-state version: main log + dv side log (a dim-side
        // MoR delete commits only to _dv)
        val ver = dt.commitVersion()
        (Some(dt.read(ver + 1)), Some(ver))
    }
    val key = s"_mv_sync:$replicaId"
    val wm = CdcApply.readMark(mv, key).getOrElse {
      // a STREAMING-maintained view has no batch-sync watermark (its
      // offsets live in the Structured Streaming checkpoint); the
      // newest applied generation bounds every batch it absorbed
      val rows = mv.read(Long.MaxValue)
      require(rows.columns.contains("gen"),
        s"materialized view at ${mv.root} was never synced")
      val m = rows.agg(max(col("gen"))).head
      require(!m.isNullAt(0),
        s"materialized view at ${mv.root} was never synced")
      m.getLong(0)
    }
    // the rebase generation must be STRICTLY past the watermark
    val until = awaitSettledPast(source, wm, settleTimeoutMs,
      what = s"rebase of ${mv.root}")
    val resets = spec.prepare(source.read(until + 1), dim)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(spec.aggExprs.head, spec.aggExprs.tail: _*)
      .withColumn("gen", lit(until))
      .withColumn("is_reset", lit(true))
      .localCheckpoint(true)
    try {
      val n = resets.count()
      if (n == 0) CdcApply.commitMark(mv, key, until)
      else mv.insertBatch(resets, key, until)
      dimVersion.foreach(v =>
        CdcApply.commitMark(mv, s"_mv_dim:$replicaId", v))
      mv.deleteWhere(col("gen") < until) // reclaim superseded generations
      n
    } finally { resets.unpersist(); () }
  }
}
