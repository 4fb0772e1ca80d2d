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
  *  - '''WHERE / expression keys / star joins''' (one or several dims)
  *    route through ONE choke point ([[MvSpec.prepare]]) applied
  *    identically to the seed scan and to every window's insert AND
  *    delete images; a dimension mutation is commit-version-detected
  *    and — when exactly one dim moved, boundedly — maintained
  *    PARTIALLY: a count/sum/avg view absorbs it as SIGNED partials
  *    (old images negate, new images credit — one isin-pruned
  *    watermark probe, zero resets, changed-keys-sized), a
  *    min/max/distinct view via isin-pruned affected-group discovery
  *    and exact resets. A recorded log-file count proves the delta
  *    window's boundary straggler-free so no re-captures are paid in
  *    the common case. The fallback is an atomic full reseed
  *    (including cnt=0 retractions for groups it emptied).
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

  /** Invoked whenever a partial-maintenance path silently degrades to a
    * correct-but-costlier one (dim-delta attempt → full reseed, fact-key
    * prune → unpruned semi join). At 100 TB that degrade is a 1000× cost
    * cliff an operator must be able to diagnose, so the default writes a
    * tagged line to stderr; tests (and embedding apps) swap in a capture.
    * The maintenance result is identical either way — this is telemetry,
    * never control flow. */
  @volatile var onFallback: String => Unit =
    msg => System.err.println(s"[mv-sync] $msg")

  private def warnFallback(what: String, reason: String): Unit = {
    val f = onFallback
    if (f != null) f(s"$what degraded to the fallback path: $reason")
  }

  /** A star-join enrichment baked into a view definition: every
    * maintenance aggregation joins the FACT rows (base scan or feed
    * images, aliased `factAlias`) with the dimension table (aliased
    * `dimAlias`) on `condSql`. INNER (default): unmatched fact rows
    * leave the view, exactly like the defining query. LEFT: unmatched
    * facts null-extend — they contribute to the group whose dim-sourced
    * key columns are null (facts arriving before their dim row, the
    * second star shape every pipeline hits). The fact side is the
    * maintained (feed-driven) side; dimension mutations are detected by
    * commit version and maintained PARTIALLY from the dim's own change
    * feed (only the affected groups reset — see [[syncFromFeed]]), with
    * an atomic full reseed as the fallback. A view may join SEVERAL
    * dimensions (a [[MvSpec.joinDims]] list): each is pinned and
    * versioned independently; a window where exactly one dim moved
    * maintains partially, several at once fall back to the reseed. */
  case class MvJoinDim(dimTable: String, factAlias: String,
      dimAlias: String, condSql: String, joinType: String = "inner") {
    require(joinType == "inner" || joinType == "left",
      s"a view dimension joins 'inner' or 'left', got '$joinType' — " +
        "RIGHT/FULL outer have no maintainable fact side")
    /** LEFT dims null-extend unmatched facts: the fact contributes to
      * the group of its dim columns as nulls — the second star shape
      * every pipeline hits (facts arriving before their dim row). */
    def isLeft: Boolean = joinType == "left"
    /** `(factKeyCol, dimKeyCol)` when `condSql` is one alias-qualified
      * equality `fact.k = dim.j` (either order) — the shape whose
      * dim-change maintenance can PRUNE the fact scans with an `isin`
      * on the changed dim keys (pushed to the parquet scan, partition-
      * and stats-prunable). None for any richer predicate: pruning is
      * then skipped, never guessed. */
    private[graft] lazy val equiKeys: Option[(String, String)] = {
      val id = "`?([A-Za-z_][A-Za-z0-9_]*)`?"
      val eq = s"^\\s*\\(?\\s*$id\\.$id\\s*=\\s*$id\\.$id\\s*\\)?\\s*$$".r
      condSql match {
        case eq(a1, c1, a2, c2) if a1 == factAlias && a2 == dimAlias =>
          Some((c1, c2))
        case eq(a1, c1, a2, c2) if a1 == dimAlias && a2 == factAlias =>
          Some((c2, c1))
        case _ => None
      }
    }
  }

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
      // star-join enrichment: fact rows join each dimension snapshot IN
      // ORDER before filter/derive/aggregate on every maintenance path;
      // the dim DataFrames themselves are runtime arguments (pinned
      // snapshots), threaded by the caller — the spec stores only the
      // shapes. All entries share one fact alias; a later entry's
      // condSql may reference any earlier alias (snowflake), though
      // only plain fact-to-dim equalities get the isin scan pruning
      joinDims: Seq[MvJoinDim] = Nil,
      // EXACT count(distinct c): maintained as a per-(group, value)
      // count SIDE TABLE under `<mvRoot>/_xd/<col>` — itself a view
      // with the value appended to the group key and only cnt
      // maintained, so the whole partial/reset/rebase algebra applies
      // recursively and the count is exact AND retractable (unlike the
      // HLL state of [[distinctCols]], and exportable to foreign
      // engines). Reads fold the side state and count live values per
      // group. Cost: side state is (group × distinct values)-sized —
      // the price of billing-grade exactness; prefer [[distinctCols]]
      // when ±2% estimates are acceptable
      exactDistinctCols: Seq[String] = Nil) {
    require(groupCols.nonEmpty,
      "MvSpec needs at least one group column — for a global (no GROUP " +
        "BY) view use MvSpec.global, which maintains under a constant " +
        "synthetic key")
    require(joinDims.map(_.factAlias).distinct.size <= 1,
      "every joined dimension must share the same fact alias")
    require(joinDims.map(_.dimAlias).distinct.size == joinDims.size &&
      !joinDims.exists(j => j.dimAlias == j.factAlias),
      "join aliases must be pairwise distinct")
    // value-column names: aggregate args may be alias-qualified in a
    // join view (`f.v`, `d.x`); a dot inside a stored column name would
    // read back as a struct-field path, so sanitize
    private def safe(c: String): String = c.replace('.', '_')
    def sumCol(c: String): String = s"sum_${safe(c)}"
    def minCol(c: String): String = s"min_${safe(c)}"
    def maxCol(c: String): String = s"max_${safe(c)}"
    def cntCol(c: String): String = s"cnt_${safe(c)}"
    def hllCol(c: String): String = s"hll_${safe(c)}"
    def xdCol(c: String): String = s"xd_${safe(c)}"
    /** The sanitized stored name of an exact-distinct VALUE column in
      * its side table (= the appended group key). */
    def xdValCol(c: String): String = safe(c)
    /** Join + filter + derived-group-column projection of any fact
      * base/feed frame — the single choke point that keeps every
      * maintenance path's view of "the rows this MV aggregates"
      * identical. `dims` must supply one pinned dimension snapshot per
      * [[joinDims]] entry, in order. */
    private[operators] def prepare(
        df: DataFrame, dims: Seq[DataFrame] = Nil): DataFrame = {
      require(dims.length == joinDims.length,
        s"view joins ${joinDims.length} dimension(s) " +
          s"(${joinDims.map(_.dimTable).mkString(", ")}) — a pinned " +
          "snapshot per dim must be supplied to every maintenance call")
      val joined =
        if (joinDims.isEmpty) df
        else joinDims.zip(dims).foldLeft(
          df.alias(joinDims.head.factAlias)) { case (acc, (j, d)) =>
            acc.join(d.alias(j.dimAlias), expr(j.condSql), j.joinType)
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

  /** The synthetic constant group key a GLOBAL (no GROUP BY) view
    * maintains under: the whole delta/reset algebra applies unchanged
    * over one constant group; reads fold the key back out. Reserved —
    * never a user column name. */
  val GlobalKey = "_mv_all"

  object MvSpec {
    /** A GLOBAL-aggregate spec (`SELECT count(*), sum(v) FROM t`, no
      * GROUP BY): one constant synthetic group key ([[GlobalKey]])
      * carries the existing maintenance algebra unchanged. */
    def global(
        sumCols: Seq[String] = Nil,
        minMaxCols: Seq[String] = Nil,
        countCols: Seq[String] = Nil,
        distinctCols: Seq[String] = Nil,
        filterSql: Option[String] = None,
        joinDims: Seq[MvJoinDim] = Nil): MvSpec =
      MvSpec(Seq(GlobalKey), sumCols, minMaxCols, countCols, distinctCols,
        derivedGroups = Seq(GlobalKey -> "1"),
        filterSql = filterSql, joinDims = joinDims)
  }

  /** One output column of a SQL-defined view: `kind` ∈ cnt | sum | min |
    * max | avg | dcnt (= `count(distinct col)` /
    * `approx_count_distinct(col)`, HLL-state maintained — reads are
    * sketch ESTIMATES, exact in the sparse regime, ±~2% beyond),
    * `col` the aggregated source column ("" for cnt). */
  case class MvOutput(alias: String, kind: String, col: String)

  /** A SQL-defined materialized view: source TABLE NAME (warehouse-
    * resolved, so the definition travels with the log), group columns
    * (plain names, or aliases of `groupExprs` entries — EMPTY for a
    * global view, which maintains under [[GlobalKey]]), the SELECT's
    * output list, an optional WHERE predicate, the expression group
    * keys, the joined dimensions in join order, and an optional HAVING
    * predicate (compiled to a read-side filter over the folded view —
    * it never changes what is maintained). Persisted as one JSON string
    * in the MV table's config word (`mvd`), so any reopened handle —
    * and the catalog resolution rule — can reconstruct both the
    * maintenance [[MvSpec]] and the user-facing projection. */
  case class MvViewDef(source: String, groupCols: Seq[String],
      outputs: Seq[MvOutput],
      filterSql: Option[String] = None,
      groupExprs: Seq[(String, String)] = Nil,
      dims: Seq[MvJoinDim] = Nil,
      havingSql: Option[String] = None) {
    def spec: MvSpec = MvSpec(
      if (groupCols.isEmpty) Seq(GlobalKey) else groupCols,
      sumCols = outputs.collect {
        case o if o.kind == "sum" || o.kind == "avg" => o.col }.distinct,
      minMaxCols = outputs.collect {
        case o if o.kind == "min" || o.kind == "max" => o.col }.distinct,
      countCols = outputs.collect {
        case o if o.kind == "avg" => o.col }.distinct,
      distinctCols = outputs.collect {
        case o if o.kind == "dcnt" => o.col }.distinct,
      exactDistinctCols = outputs.collect {
        case o if o.kind == "xdcnt" => o.col }.distinct,
      derivedGroups =
        (if (groupCols.isEmpty) Seq(GlobalKey -> "1") else Nil) ++ groupExprs,
      filterSql = filterSql,
      joinDims = dims)
    def encode: String = {
      val base = Seq[(String, Any)](
        "src" -> source, "g" -> groupCols,
        "o" -> outputs.map(o => Seq(o.alias, o.kind, o.col)))
      val withW = filterSql.fold(base)(w => base :+ ("w" -> w))
      val withGe =
        if (groupExprs.isEmpty) withW
        else withW :+ ("ge" -> groupExprs.map { case (a, e) => Seq(a, e) })
      // single dim keeps the round-13 "j" word (already-persisted views
      // decode unchanged); several encode as a "js" list. An outer dim
      // appends its join type as a 5th element; inner dims stay 4-wide
      // so every already-persisted definition round-trips byte-stable
      def enc(j: MvJoinDim): Seq[String] = {
        val base = Seq(j.dimTable, j.factAlias, j.dimAlias, j.condSql)
        if (j.joinType == "inner") base else base :+ j.joinType
      }
      val withJ = dims match {
        case Seq() => withGe
        case Seq(j) => withGe :+ ("j" -> enc(j))
        case js => withGe :+ ("js" -> js.map(enc))
      }
      val withH = havingSql.fold(withJ)(h => withJ :+ ("h" -> h))
      graft.ice.Json.obj(withH: _*)
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
      def dimOf(v: Any): MvJoinDim = {
        val f = strs(v)
        MvJoinDim(f(0), f(1), f(2), f(3),
          joinType = if (f.length > 4) f(4) else "inner")
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
        dims = m.get("j").map(v => Seq(dimOf(v))).getOrElse(
          m.get("js") match {
            case Some(xs: scala.collection.Seq[_]) => xs.map(dimOf).toSeq
            case _ => Nil
          }),
        havingSql = m.get("h").map(_.toString))
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

  /** The maintenance spec of an exact-distinct SIDE table: the value
    * column joins the group key (qualified args become a derived
    * column), only cnt is maintained — a per-(group, value) reference
    * count that the whole partial/reset/rebase algebra handles
    * recursively. */
  private[graft] def xdSideSpec(spec: MvSpec, c: String): MvSpec = {
    val v = c.replace('.', '_')
    // exact_count_distinct over a column that IS a group key: the side
    // key set is unchanged (appending would duplicate the name and break
    // every groupBy/write of the side view) — the side fold then holds
    // one live row per group and the read counts it, which is exactly
    // count(distinct g) == 1 per live group. Only an UNQUALIFIED
    // self-reference qualifies: a qualified arg (f.v) whose SANITIZED
    // name (f_v) collides with an unrelated real group column must
    // refuse loudly, not silently key the side state off the wrong
    // column
    val already = !c.contains('.') &&
      spec.groupCols.exists(_.equalsIgnoreCase(c))
    require(already || !spec.groupCols.exists(_.equalsIgnoreCase(v)),
      s"exact_count_distinct($c) materializes its value column as `$v`, " +
        "which collides with a group column of the view — qualify or " +
        "rename so the side state keys off the intended values")
    spec.copy(
      groupCols = if (already) spec.groupCols else spec.groupCols :+ v,
      sumCols = Nil, minMaxCols = Nil, countCols = Nil,
      distinctCols = Nil, exactDistinctCols = Nil,
      derivedGroups = spec.derivedGroups ++
        (if (!already && c.contains('.')) Seq(v -> c) else Nil))
  }

  /** Handle to the side table of exact-distinct column `c`: nested under
    * the view's own root (`_xd/` is invisible to the main table's data
    * and log listings, like `_dv/`), so DROP TABLE, path permissions and
    * manifest roots travel together. Materializes on first maintenance
    * touch — no separate create step. */
  private[graft] def xdTable(mv: IceTable, spec: MvSpec, c: String): IceTable =
    new IceTable(mv.spark, s"${mv.root}/_xd/${c.replace('.', '_')}",
      mvConfig(xdSideSpec(spec, c)))

  /** Run `f` for every exact-distinct side view BEFORE the caller's main
    * maintenance body (several paths return early mid-body): a crash in
    * between leaves the sides one window ahead — each column converges
    * at the next call, reads are only transiently staler on the other
    * aggregates, never wrong. */
  private def syncSides(mv: IceTable, spec: MvSpec)(
      f: (IceTable, MvSpec) => Unit): Unit =
    spec.exactDistinctCols.foreach { c =>
      f(xdTable(mv, spec, c), xdSideSpec(spec, c))
    }

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

  /** Mark key recording the view's FLAT state: set by [[rebase]] AFTER
    * its CoW cleanup, value = a millisecond STRICTLY ABOVE every commit
    * (file marker) alive at that moment — rebase spins the clock past
    * the ceiling before committing, so any later maintenance write
    * carries `createdMs >= flat` and the proof self-invalidates. While
    * every alive file's marker sits strictly below the mark, the view
    * holds exactly ONE all-reset generation with one row per group, and
    * [[read]] skips the newest-reset-wins window fold entirely — a plain
    * scan + projection, no MV-sized exchange. Fail-safe by construction:
    * partials, resets, a second rebase's rewrites, even a raw file-level
    * MV compaction all produce markers at-or-above the mark and fall
    * back to the full fold (compaction's is a false negative, and SQL
    * `OPTIMIZE` on an MV no longer hits it: the command routes to THIS
    * rebase — the view's real compaction — so it collapses generations
    * AND re-records the mark in one pass. Only a direct API
    * `mv.optimize()` can still trade the fast path for nothing; rerun
    * [[rebase]] to re-arm).
    * The one writer that could REVIVE old markers below the mark —
    * RESTORE — is refused on MV tables at the SQL surface (and is
    * already semantically broken for derived state: max-merged sync
    * watermarks cannot rewind).
    * Clock-trust model: NOT raw wall clocks — marker `createdMs` is
    * stamped inside the log append from the final commit ts, which is
    * floored strictly above every log filename ts the writing JVM has
    * listed (IceLogIO observed-ts floor). Every maintenance writer folds
    * the view's log (mark reads / preflight) before inserting, so its
    * markers land ABOVE the mark's carrying log even on a host whose
    * wall clock lags the rebasing host — the proof inherits the fold's
    * causal monotonicity. A maintenance writer racing the rebase itself
    * (fold before the mark lands, insert after) remains outside rebase's
    * contract, as for every other locked-vs-lock-free pair. */
  private[graft] val FlatKey = "_mv_flat"

  /** True when `snap` proves the post-rebase steady state (see
    * [[FlatKey]]): the read needs no fold. */
  private[graft] def isFlatSnapshot(snap: graft.ice.IceSnapshot): Boolean =
    snap.streamCommits.get(FlatKey)
      .exists(f => snap.aliveFiles.forall(_.createdMs < f))

  /** Change-mark key recording dim `i`'s pinned version for a replica
    * (or streaming query) — dim 0 keeps the single-dim key shape, so
    * round-13 views carry their recorded baseline forward. */
  private[graft] def dimMarkKey(replicaId: String, i: Int): String =
    if (i == 0) s"_mv_dim:$replicaId" else s"_mv_dim:$replicaId:$i"

  /** Companion mark recording dim `i`'s log-file COUNT at the pin: on
    * the next sync, `prevCount + commitsIn(v0, v1] == count` proves no
    * commit landed at-or-below the recorded version since the pin, so
    * the dim delta window can open at EXACTLY v0 — no boundary
    * re-capture, the signed path runs pure, discovery sees only the
    * genuinely-new images. Any mismatch (same-ms straggler, log
    * consolidation by cleanup) falls back to the boundary-inclusive
    * window, whose re-captures are idempotent. A missing mark (views
    * recorded before this existed) also falls back — always safe.
    *
    * ENCODING: the mark channel folds per-key by MAX, and a raw count
    * can legitimately SHRINK (log consolidation) — a max-merged stale
    * count would wedge the proof and, pathologically, a stale-HIGH
    * count could even compensate a straggler into a false pass. The
    * value is therefore `(pinVersion << 20) | min(count, cap)`: a later
    * pin's version strictly dominates the fold, and the proof only
    * accepts a count whose EMBEDDED version equals the version mark —
    * self-pairing, so torn/stale/foreign values all fail toward the
    * safe boundary window. Counts at or above the 2^20-1 cap record the
    * cap, which the proof rejects (a million-log dim is cleanup's
    * problem, not the proof's). */
  private def dimCountKey(replicaId: String, i: Int): String =
    if (i == 0) s"_mv_dimn:$replicaId" else s"_mv_dimn:$replicaId:$i"

  private val CountBits = 20
  private val CountCap: Long = (1L << CountBits) - 1L

  private def encodeCountMark(version: Long, count: Long): Long =
    (version << CountBits) | math.min(count, CountCap)

  /** The pinned count recorded FOR `version`, if the mark carries one. */
  private def decodeCountMark(packed: Long, version: Long): Option[Long] = {
    val ver = packed >>> CountBits
    val cnt = packed & CountCap
    if (ver == version && cnt < CountCap) Some(cnt) else None
  }

  /** Fact-base frame for the maintenance PROBES (signed partials,
    * affected-group discovery, reset recompute): the SQL-path relation
    * ([[graft.plans.IceFileIndex]]), whose scans apply the LOG-SIDE
    * stats windows — a pushed `isin`/equality on a key-clustered fact
    * then SKIPS whole files from the log alone — plus the same
    * deletion-vector overlay as [[IceTable.read]]. Full-scan paths
    * (seed, reseed, rebase) keep the plain read: they have no
    * predicate to push. */
  private def probeRead(source: IceTable, maxTs: Long): DataFrame =
    graft.plans.IceFileIndex.dataFrame(source.spark, source, maxTs)

  /** Pin each dimension's newest snapshot + FULL commit-state version
    * (main log + `_dv` side log: a dim-side merge-on-read delete commits
    * only to `_dv` and must be detected like any other dim mutation)
    * ONCE for a whole maintenance call. The version is the dim's max
    * log-file ts — monotone, which the mark channel requires. A dim
    * RESTORE (version moving backwards) reads as a persistent mismatch →
    * full reseed per refresh until the clock re-passes the recorded
    * mark: degraded but always correct, self-healing. */
  /** One pinned dimension: snapshot frame, full commit-state version,
    * and the commit-ts list behind it (count + window arithmetic for
    * the straggler proof). */
  private case class DimPin(df: DataFrame, version: Long, ts: Seq[Long]) {
    def count: Long = ts.length.toLong
    def commitsIn(from: Long, until: Long): Long =
      ts.count(t => t > from && t <= until).toLong
  }

  private def pinDims(dimTables: Seq[IceTable], requireSeeded: Boolean)
      : Seq[DimPin] =
    dimTables.map { dt =>
      if (requireSeeded && dt.trySnapshot(Long.MaxValue).isEmpty)
        throw new IllegalArgumentException(
          s"dimension table at ${dt.root} has no commits yet — seed it " +
            "before syncing a view that joins it")
      val ts = dt.commitTimestamps()
      val ver = ts.maxOption.getOrElse(0L)
      DimPin(dt.read(ver + 1), ver, ts)
    }

  private def requireDims(spec: MvSpec, dimTables: Seq[IceTable],
      what: String): Unit = {
    require(dimTables.length == spec.joinDims.length,
      s"view joins ${spec.joinDims.length} dimension(s) " +
        s"(${spec.joinDims.map(_.dimTable).mkString(", ")}): pass every " +
        s"dim table handle, in join order, to $what")
    dimTables.foreach(requireNotMvSource)
  }

  /** One full reset generation at `until`: every group's aggregates
    * recomputed exactly from the base (joined with the supplied pinned
    * dims). With `retractStale`, groups live in the CURRENT view but
    * absent from the recompute (a dim move can empty a group without
    * any fact delta) land cnt=0 resets in the SAME frame — a vanished
    * group would otherwise keep serving its old reset forever. Returned
    * eagerly checkpointed; the caller commits and unpersists. */
  private[graft] def resetSeedRows(source: IceTable, mv: IceTable,
      spec: MvSpec, until: Long, dims: Seq[DataFrame],
      retractStale: Boolean): DataFrame = {
    val groupCols = spec.groupCols.map(col)
    val fresh0 = spec.prepare(source.read(until + 1), dims)
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
      withStale
        .withColumn("gen", lit(until))
        .withColumn("is_reset", lit(true))
        .localCheckpoint(true)
    } finally { if (canRetract) { fresh.unpersist(); () } }
  }

  /** The groups one dimension's change can affect: fact rows joined
    * with the CHANGED dim-row images (old images name the groups those
    * facts LEFT; new images the groups they ENTER), evaluated against
    * the fact base at BOTH window bounds — the base at the OLD
    * watermark is the state the MV's standing partials reflect (a fact
    * row deleted inside the pending window still witnessed its old dim
    * mapping there; the post-window base alone could never name it),
    * the post-window base catches groups the changed keys newly enter.
    *
    * When the join condition is one fact-to-dim equality, both fact
    * scans are PRUNED with an `isin` on the changed dim keys — pushed
    * to the parquet scan (partition- and stats-prunable on a
    * key-clustered base), the same trick as the reset recompute — so
    * discovery READS are changed-keys-sized, never base-sized. The key
    * set is bounded: the caller's `maxPruneGroups` gate caps the image
    * count before this runs. Non-equi conditions skip the prune (the
    * unpruned scan is still correct). */
  private[graft] def dimChangeAffectedGroups(source: IceTable,
      spec: MvSpec, rawImages: DataFrame, changed: Int, wm: Long,
      until: Long, dims: Seq[DataFrame], maxPruneGroups: Int): DataFrame = {
    val j = spec.joinDims(changed)
    val groupCols = spec.groupCols.map(col)
    val images = broadcast(
      rawImages.drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol))
    val pruneKeys: Option[Seq[Any]] = j.equiKeys.flatMap { case (_, dk) =>
      val vals = images.select(col(dk)).distinct()
        .limit(maxPruneGroups + 1).collect().map(_.get(0)).toSeq
      // over the cap → unpruned scans (still correct); null keys never
      // match the equality join (inner or left) — drop them
      if (vals.length <= maxPruneGroups) Some(vals.filterNot(_ == null))
      else None
    }
    def groupsAt(bound: Long, dimDf: DataFrame): DataFrame = {
      val base = probeRead(source, bound + 1)
      val pruned = (j.equiKeys, pruneKeys) match {
        case (Some((fk, _)), Some(ks)) => base.where(col(fk).isin(ks: _*))
        case _ => base
      }
      spec.prepare(pruned, dims.updated(changed, dimDf))
        .select(groupCols: _*)
    }
    val all =
      if (!j.isLeft) groupsAt(wm, images).unionByName(groupsAt(until, images))
      else {
        // a LEFT dim's affected facts change GROUP, they never leave the
        // view: the old group of a fact whose dim row was just CREATED is
        // the null-extended group, which joining against the mixed image
        // set would miss (the fact matches the new image). Split sides:
        // delete images stand in for the dim's OLD state, insert images
        // for the NEW — a fact unmatched on a side LEFT-extends to the
        // null group on exactly that side. Both window bounds × both
        // sides: a superset of the affected groups is idempotently safe
        // (extra resets recompute already-correct groups).
        val oldSide = broadcast(rawImages
          .where(col(ChangeFeed.ChangeTypeCol) === "delete")
          .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol))
        val newSide = broadcast(rawImages
          .where(col(ChangeFeed.ChangeTypeCol) === "insert")
          .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol))
        groupsAt(wm, oldSide).unionByName(groupsAt(wm, newSide))
          .unionByName(groupsAt(until, oldSide))
          .unionByName(groupsAt(until, newSide))
      }
    all.distinct()
  }

  /** Signed dim-change partials for a SELF-MAINTAINABLE spec (count /
    * sum / avg only — no min/max, no distinct): the changed dim rows'
    * OLD images NEGATE the groups their facts leave, the NEW images
    * credit the groups they enter, computed from ONE isin-pruned probe
    * of the fact base AT THE WATERMARK (the state the MV's standing
    * partials reflect, by the maintenance invariant), appended as
    * ordinary partial rows. No affected-group discovery, no resets, no
    * group-sized recompute: dim-change cost is changed-keys-sized. A
    * group whose contributions fully negate folds to cnt = 0 and
    * vanishes under the read rule — no explicit retraction row needed.
    * Value negation preserves each aggregate's column type (negate-
    * then-sum, never multiply), so signed rows union with every other
    * partial generation. `_mv_sign` is a reserved column name on the
    * joined frame. */
  private def signedDimPartials(source: IceTable, spec: MvSpec,
      images: DataFrame, changed: Int, wm: Long, dims: Seq[DataFrame],
      gen: Long, maxPruneGroups: Int): DataFrame = {
    val j = spec.joinDims(changed)
    val groupCols = spec.groupCols.map(col)
    val signed = broadcast(images.withColumn("_mv_sign",
        when(col(ChangeFeed.ChangeTypeCol) === "delete", lit(-1L))
          .otherwise(lit(1L)))
      .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol))
    val pruneKeys: Option[Seq[Any]] = j.equiKeys.flatMap { case (_, dk) =>
      val vals = images.select(col(dk)).distinct()
        .limit(maxPruneGroups + 1).collect().map(_.get(0)).toSeq
      if (vals.length <= maxPruneGroups) Some(vals.filterNot(_ == null))
      else None
    }
    val base = probeRead(source, wm + 1)
    val pruned = (j.equiKeys, pruneKeys) match {
      case (Some((fk, _)), Some(ks)) => base.where(col(fk).isin(ks: _*))
      case _ => base
    }
    val prep =
      if (!j.isLeft)
        // INNER: one probe, the mixed signed image set IS the dim — a
        // fact matching an old image names the group it leaves (-1), a
        // new image the group it enters (+1), no match = out of the view
        spec.prepare(pruned, dims.updated(changed, signed))
      else {
        // LEFT: affected facts never leave the view, they change GROUP
        // (possibly to/from the null-extended one). Null-extension
        // depends on the FULL dim state for a key — a fact whose key
        // still matches a SURVIVING dim row never null-extends — so the
        // change images alone cannot stand in for the dim (a
        // duplicate-keyed dim would make the empty side fabricate
        // phantom null-group rows). Reconstruct both per-key states
        // from the pinned NEW dim instead:
        //   new_K = pinned dim restricted to the changed keys
        //   old_K = new_K ⊎ delete images ∖ insert images  (multiset)
        // and evaluate each affected fact under old_K (sign -1) and
        // new_K (+1) — exact null-extension on both sides, fan-out
        // duplicates included. Facts the prune could not exclude cancel
        // exactly (-1/+1 into the same group fold to zero). The caller
        // gates this branch on an equi-key join, so the key restriction
        // always exists and the image cap bounds it.
        val (_, dk) = j.equiKeys.getOrElse(throw new IllegalStateException(
          "signed LEFT dim maintenance requires an equi-key join " +
            "(caller gate missed)"))
        val ks = pruneKeys.getOrElse(throw new IllegalStateException(
          "changed-key set exceeded the cap after the image-count gate"))
        val dimCols = dims(changed).columns.toSeq.map(col)
        def imgs(kind: String): DataFrame = images
          .where(col(ChangeFeed.ChangeTypeCol) === kind)
          .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol)
          .select(dimCols: _*)
        val newK = dims(changed).where(col(dk).isin(ks: _*))
          .select(dimCols: _*)
        val oldK = newK.unionByName(imgs("delete")).exceptAll(imgs("insert"))
        // each side projects to exactly the aggregation's inputs before
        // the union: the raw joined frame carries duplicate key names
        // (f.k and d.k), which unionByName refuses
        val needed = (spec.groupCols ++ (spec.sumCols ++ spec.countCols)
          .map(c => if (c.contains('.')) c.replace('.', '_') else c)).distinct
        def side(dimK: DataFrame, sgn: Long): DataFrame =
          spec.prepare(pruned, dims.updated(changed, broadcast(dimK)))
            .select(needed.map(col): _*)
            .withColumn("_mv_sign", lit(sgn))
        side(oldK, -1L).unionByName(side(newK, 1L))
      }
    def arg(c: String): Column =
      if (c.contains('.')) col(c.replace('.', '_')) else col(c)
    def flip(c: String): Column =
      when(col("_mv_sign") < 0, -arg(c)).otherwise(arg(c))
    val aggs = sum(col("_mv_sign")).as("cnt") +:
      (spec.sumCols.map(c => sum(flip(c)).as(spec.sumCol(c))) ++
        spec.countCols.map(c => sum(when(arg(c).isNotNull,
          col("_mv_sign")).otherwise(lit(0L))).as(spec.cntCol(c))))
    prep.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
      .withColumn("gen", lit(gen))
      .withColumn("is_reset", lit(false))
  }

  /** Advance the MV to the base table's current settled state. First call
    * seeds the view with one full aggregation (every group a reset row);
    * later calls process only the feed window since the stored watermark.
    *
    * For a join view ([[MvSpec.joinDims]]) the caller supplies the
    * dimension TABLE HANDLES in join order; the sync pins each newest
    * snapshot and version itself. A version change since the last sync
    * maintains INCREMENTALLY when possible — exactly ONE dim moved and
    * its own row-level change feed yields the changed rows boundedly:
    * a count/sum/avg spec absorbs them as SIGNED partials
    * ([[signedDimPartials]] — one isin-pruned watermark probe, zero
    * resets, changed-keys-sized); a min/max/distinct spec runs
    * [[dimChangeAffectedGroups]] (isin-pruned fact probes at both
    * window bounds) and resets only the named groups. Either way
    * dim-change cost (reads AND writes) is affected-data-sized, not
    * base-sized. Falls back to a full reseed
    * (one fresh reset generation + cnt=0 retractions for emptied groups,
    * readers correct throughout via newest-reset-wins) when several
    * dims moved at once, the delta is unattributable (cleanup horizon),
    * oversized (> maxPruneGroups changed rows — at that volume most
    * groups are affected anyway), or the recorded version cannot anchor
    * a window. Returns (partial-group rows appended, groups reset).
    *
    * Cross-process caveat (same as every settled-bound feed chain): a
    * straggler dim commit landing at a ts at-or-below the recorded
    * version with no later commit is undetectable. */
  def syncFromFeed(source: IceTable, mv: IceTable, spec: MvSpec,
      replicaId: String = "default",
      maxPruneGroups: Int = 1000,
      dimTables: Seq[IceTable] = Nil): (Long, Long) = {
    requireNotMvSource(source)
    requireDims(spec, dimTables, "every sync")
    // exact-distinct side views first (the main body returns early on
    // idle windows): each recursion carries its own watermark/dim marks
    syncSides(mv, spec)((t, s) =>
      { syncFromFeed(source, t, s, replicaId, maxPruneGroups, dimTables); () })
    val pins = pinDims(dimTables, requireSeeded = true)
    val dims = pins.map(_.df)
    val dimVersions = pins.map(_.version)
    val key = s"_mv_sync:$replicaId"
    val groupCols = spec.groupCols.map(col)

    // the dim marks commit separately AFTER the data commit: a crash in
    // between replays as "dim changed" → an extra (idempotent) reseed,
    // never a missed one. The count mark rides along for the straggler
    // proof (see dimCountKey)
    // COUNT first, VERSION second: the straggler proof is consulted
    // only when the version mark matches a completed pin, so a crash
    // between the two writes leaves a stale version with a newer count
    // — the proof then over-counts the window and fails toward the
    // safe boundary-inclusive path, never toward a false match
    def commitDimMarks(): Unit = pins.zipWithIndex.foreach {
      case (pin, i) =>
        CdcApply.commitMark(mv, dimCountKey(replicaId, i),
          encodeCountMark(pin.version, pin.count))
        CdcApply.commitMark(mv, dimMarkKey(replicaId, i), pin.version)
    }

    // one full aggregation landing as a reset generation at `until`;
    // the initial seed and the dim-change reseed share it exactly
    def fullResetSeed(until: Long, retractStale: Boolean): Long = {
      val resets = resetSeedRows(source, mv, spec, until, dims, retractStale)
      try {
        val n = resets.count()
        // insert even when empty: the commit carries the view's COLUMN
        // SCHEMA, so read()/readView() work before any group exists
        mv.insertBatch(resets, key, until)
        commitDimMarks()
        n
      } finally { resets.unpersist(); () }
    }

    // count the delta's partial/reset rows, commit it (or just the
    // watermark when empty), then — only when it moved — the dim marks:
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
      if (commitDim) commitDimMarks()
      (nPart, nReset)
    }

    CdcApply.readMark(mv, key) match {
      case None =>
        val until = ChangeFeed.settledNow(source)
        source.trySnapshot(until + 1) match {
          case None =>
            CdcApply.commitMark(mv, key, until)
            // record the dim baselines too: without them the next sync
            // reads "dim changed" and the retract path would trip over
            // the still-schema-less view
            commitDimMarks()
            (0L, 0L)
          case Some(_) => (0L, fullResetSeed(until, retractStale = false))
        }

      case Some(wm) =>
        val prevVers: Seq[Option[Long]] =
          dimTables.indices.map(i => CdcApply.readMark(mv, dimMarkKey(replicaId, i)))
        val changedIdx: Seq[Int] = dimTables.indices
          .filter(i => !prevVers(i).contains(dimVersions(i)))
        // the incremental dim path applies when exactly ONE dim moved
        // and its changed rows are bounded and attributable. The window
        // starts one ms BEFORE the recorded version, so a
        // same-millisecond commit that landed after the previous pin is
        // still captured — the commits legitimately AT v0 re-appear
        // too, which only re-resets already-correct groups (over-
        // capture is idempotent; under-capture is not). Requires a
        // strictly advanced version: a backwards move (dim RESTORE)
        // cannot anchor a window and falls back to the full reseed.
        // window start: the straggler proof (recorded log-file count +
        // commits inside the window == pinned count) opens the window at
        // EXACTLY v0 — no boundary re-capture, the signed path runs
        // pure; without the proof (missing mark, same-ms straggler, log
        // consolidation) the window opens 1 ms early and the re-captured
        // images route through the idempotent reset machinery
        val dimDelta: Option[(Int, DataFrame, Long)] =
          if (changedIdx.size != 1) None
          else {
            val i = changedIdx.head
            prevVers(i) match {
              case Some(v0) if dimVersions(i) > v0 =>
                try {
                  val prevCount = CdcApply
                    .readMark(mv, dimCountKey(replicaId, i))
                    .flatMap(decodeCountMark(_, v0))
                  val noStraggler = prevCount.exists(pc =>
                    pc + pins(i).commitsIn(v0, dimVersions(i)) == pins(i).count)
                  val from = if (noStraggler) v0 else v0 - 1
                  val d = ChangeFeed.between(dimTables(i), from,
                    dimVersions(i)).localCheckpoint(true)
                  if (d.count() > maxPruneGroups) {
                    d.unpersist()
                    warnFallback(s"dim-delta sync of ${mv.root}",
                      s"dim '${spec.joinDims(i).dimTable}' changed more " +
                        s"than maxPruneGroups=$maxPruneGroups rows in " +
                        s"[$from, ${dimVersions(i)}] — full reseed")
                    None
                  } else Some((i, d, v0))
                } catch { case e: Exception =>
                  warnFallback(s"dim-delta sync of ${mv.root}",
                    s"reading dim '${spec.joinDims(i).dimTable}' change " +
                      s"feed [${v0}, ${dimVersions(i)}] failed " +
                      s"(${e.getClass.getSimpleName}: " +
                      s"${String.valueOf(e.getMessage).take(160)}) — " +
                      "full reseed")
                  None
                }
              case _ => None
            }
          }
        if (changedIdx.nonEmpty && dimDelta.isEmpty) {
          // fall back: recompute every group at a fresh settled bound
          // (covers any pending fact window too)
          val until = awaitSettledPast(source, wm,
            what = s"dim-change reseed of ${mv.root}")
          (0L, fullResetSeed(until, retractStale = true))
        } else if (changedIdx.nonEmpty) {
          // PARTIAL dim maintenance. Two shapes:
          //  - SELF-MAINTAINABLE specs (count/sum/avg only): the
          //    genuinely-new images (ts > recorded version) land as
          //    SIGNED partials from one isin-pruned watermark probe —
          //    no discovery, no resets, dim-change cost is
          //    changed-keys-sized. The v0-BOUNDARY re-captures (the
          //    window opens 1 ms early so a same-ms straggler is never
          //    missed) are NOT sign-safe — re-negating an already-
          //    reflected change would corrupt — so exactly those route
          //    through the idempotent reset machinery instead.
          //  - min/max/distinct specs: all images → isin-pruned
          //    affected-group discovery → exact resets (a sketch or
          //    extremum cannot subtract).
          // Either way the pending fact window rides in the same atomic
          // delta commit, and any failure mid-computation (e.g. the
          // old-bound read racing a cleanup) falls back to the full
          // reseed, which needs no history.
          val (ci, dd, v0) = dimDelta.get
          try {
            val until = awaitSettledPast(source, wm,
              what = s"dim-delta sync of ${mv.root}")
            // the signed path needs (a) subtractable aggregates and,
            // for a LEFT dim, (b) an equi-key join — reconstructing the
            // per-key old/new dim states (exact null-extension) needs
            // the key restriction. A non-equi LEFT dim routes through
            // the reset machinery below, which evaluates against FULL
            // pinned dims and is exact for any join shape
            val selfMaint =
              spec.minMaxCols.isEmpty && spec.distinctCols.isEmpty &&
                (!spec.joinDims(ci).isLeft ||
                  spec.joinDims(ci).equiKeys.isDefined)
            val imagesAll = dd
              .where(col(ChangeFeed.ChangeTypeCol).isin("insert", "delete"))
            val (resetImgs, signedImgs) =
              if (!selfMaint) (imagesAll, None)
              else {
                val re = imagesAll.where(col(ChangeFeed.CommitTsCol) <= v0)
                val nw = imagesAll.where(col(ChangeFeed.CommitTsCol) > v0)
                (re, Some(nw))
              }
            val signed = signedImgs
              .filter(!_.isEmpty)
              .map(nw => signedDimPartials(source, spec, nw, ci, wm,
                dims, until, maxPruneGroups).localCheckpoint(true))
            try {
              val affected: Option[DataFrame] =
                if (resetImgs.isEmpty) None
                else Some(dimChangeAffectedGroups(source, spec, resetImgs,
                  ci, wm, until, dims, maxPruneGroups).localCheckpoint(true))
              try {
                val f = ChangeFeed.between(source, wm, until).localCheckpoint()
                try {
                  val delta = windowDelta(source, spec, f, until,
                    maxPruneGroups, dims, extraRetracted = affected,
                    extraSigned = signed)
                  try commitDelta(delta, until, commitDim = true)
                  finally { delta.unpersist(); () }
                } finally { f.unpersist(); () }
              } finally { affected.foreach { a => a.unpersist(); () } }
            } finally { signed.foreach { s => s.unpersist(); () } }
          } catch { case e: Exception =>
            warnFallback(s"partial dim maintenance of ${mv.root}",
              s"${e.getClass.getSimpleName}: " +
                s"${String.valueOf(e.getMessage).take(160)} — full reseed")
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
            val delta = windowDelta(source, spec, f, until, maxPruneGroups, dims)
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
      dims: Seq[DataFrame] = Nil,
      // extra group rows to force-reset (the dim-delta path's affected
      // groups) — unioned with the feed's own retractions, so the reset
      // machinery (exact recompute, cnt=0 for emptied groups) covers both
      extraRetracted: Option[DataFrame] = None,
      // pre-aggregated SIGNED dim-change partial rows (self-maintainable
      // specs) — unioned into the delta, EXCEPT for groups being reset
      // in this same window: a reset recomputes from the post-window
      // base, which already reflects the re-mapping the signed row
      // encodes, so keeping both would double-count
      extraSigned: Option[DataFrame] = None): DataFrame = {
    val groupCols = spec.groupCols.map(col)
    // join + WHERE + derived group keys apply to the feed ONCE, before
    // the insert/delete split: both image kinds enrich and filter
    // identically (a row that never passed never retracts either), and
    // the derived key is computed on each image's own values
    val fprep = spec.prepare(feed, dims)
    // INSERT-ONLY fast path (the common steady-state window): with no
    // delete images and no forced resets, the delta is the partials
    // (plus any signed rows) alone — the retracted-set checkpoint, its
    // emptiness probe, and resetRows' prune collect are three Spark
    // jobs of pure latency that would all operate on nothing. One
    // limit(1) probe over the (checkpointed) feed decides.
    if (extraRetracted.isEmpty &&
        feed.where(col(ChangeFeed.ChangeTypeCol) === "delete").isEmpty) {
      val partials = fprep
        .where(col(ChangeFeed.ChangeTypeCol) === "insert")
        .groupBy(groupCols: _*).agg(spec.aggExprs.head, spec.aggExprs.tail: _*)
        .withColumn("gen", lit(gen))
        .withColumn("is_reset", lit(false))
      return extraSigned.fold(partials)(partials.unionByName(_))
        .localCheckpoint(true)
    }
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
      val resets = resetRows(source, retracted, spec, gen, maxPruneGroups, dims)
      val signedAlive = extraSigned.map { sgn =>
        if (retracted.isEmpty) sgn
        else sgn.alias("_mvs").join(broadcast(retracted.alias("_mvt")),
            groupCond("_mvs", "_mvt", spec.groupCols), "left_anti")
      }
      signedAlive.fold(partials)(partials.unionByName(_))
        .unionByName(resets).localCheckpoint(true)
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
    * window is worse than a dead stream.
    *
    * A STREAMING join view maintains against PINNED dimensions whose
    * baseline versions are recorded under `queryName` marks — at stream
    * setup ([[recordStreamDimBaseline]], so a dim mutation between the
    * view's seed and the first batch is DETECTED, never silently
    * adopted), by a [[rebase]] under `replicaId = queryName`, or (direct
    * API callers only) by the first batch. A later version is a loud
    * failure — batch-sized deltas cannot absorb a dim move mid-stream —
    * unless `autoRebase` is set, in which case the batch lands as ONE
    * full reset generation at the batch's own bound computed against
    * the NEW pinned dims (cnt=0 retractions included), committed with
    * the same `(queryName, batchId)` exactly-once record, and the
    * baseline marks advance; later batches apply on top. Manual
    * recovery (autoRebase off): stop the query, `MvSync.rebase(source,
    * mv, spec, replicaId = queryName, dimTables = …)`, restart the
    * stream from the rebase watermark. An EMPTY batch never absorbs a
    * dim move (it has no generation to anchor): the next non-empty
    * batch does. */
  def applyFeedBatch(source: IceTable, mv: IceTable, spec: MvSpec,
      batch: DataFrame, batchId: Long, queryName: String = "_mv_stream",
      maxPruneGroups: Int = 1000,
      dimTables: Seq[IceTable] = Nil,
      autoRebase: Boolean = false,
      // self-defragmentation cadence for long-lived streams: every Nth
      // batch lands as ONE full reset generation at the batch's own
      // bound (sound for exactly the reason the dim-move absorb is: the
      // recompute includes the batch's commits, nothing applies twice),
      // then superseded rows reclaim and the flat mark re-arms — read
      // cost stops growing with generation count without an operator
      // cron running REFRESH … FULL. 0 = off
      rebaseEveryNBatches: Int = 0): Unit = {
    requireNotMvSource(source)
    requireDims(spec, dimTables, "every streaming batch")
    // exact-distinct side views apply the SAME batch under the same
    // (queryName, batchId) exactly-once record — each side dedups its
    // own replays, so a crash between main and sides converges
    syncSides(mv, spec)((t, s) => applyFeedBatch(source, t, s, batch,
      batchId, queryName, maxPruneGroups, dimTables, autoRebase,
      rebaseEveryNBatches))
    val pins = pinDims(dimTables, requireSeeded = false)
    val dims = pins.map(_.df)
    val dimVersions = pins.map(_.version)
    val prev: Seq[Option[Long]] = dimTables.indices
      .map(i => CdcApply.readMark(mv, dimMarkKey(queryName, i)))
    // no baseline yet (direct API caller): adopt the current version
    dimTables.indices.foreach { i =>
      if (prev(i).isEmpty)
        CdcApply.commitMark(mv, dimMarkKey(queryName, i), dimVersions(i))
    }
    val moved: Seq[Int] = dimTables.indices
      .filter(i => prev(i).exists(_ != dimVersions(i)))
    if (moved.nonEmpty && !autoRebase) {
      val what = moved.map(i => s"'${spec.joinDims(i).dimTable}' " +
        s"(version ${prev(i).get} → ${dimVersions(i)})").mkString(", ")
      throw new IllegalStateException(
        s"dimension $what changed under a STREAMING join view: " +
          "streaming maintenance joins a pinned dim. Stop the query, run " +
          s"MvSync.rebase(source, mv, spec, replicaId = \"$queryName\", " +
          "dimTables = …) to absorb the change, then restart the stream " +
          "from the rebase watermark — or start the sink with " +
          "autoRebase = true to absorb dim moves in-stream")
    }
    val b = batch.localCheckpoint()
    try {
      if (b.isEmpty) return
      require(b.where(col(ChangeFeed.ChangeTypeCol) === "gap").isEmpty,
        "change-feed batch contains a horizon-skip gap marker: changes " +
          "before the feed floor are unrecoverable — rebuild the view " +
          "(drop + initial sync) instead of silently diverging")
      val gen = b.agg(max(col(ChangeFeed.CommitTsCol))).head.getLong(0)
      // cadence rebase: every Nth batch (counting from 0 — a cadence hit
      // on the first batch is just a seed-shaped recompute) takes the
      // absorb shape even with no dim move: the full reset generation
      // both applies this batch AND collapses every older generation
      val cadenceDue = rebaseEveryNBatches > 0 &&
        batchId % rebaseEveryNBatches == 0
      if (moved.nonEmpty || cadenceDue) {
        // in-stream dim-move absorption: one full reset generation at
        // the batch's own bound against the NEW dims — the recompute
        // already includes this batch's fact commits (they are in the
        // base as of gen + 1), so nothing applies twice; the marks
        // advance AFTER the data commit (a crash between replays as
        // "dim changed" → another idempotent absorb, never a miss).
        // The advance is GATED on the insert landing: a crash-replayed
        // batchId whose original delivery was a plain delta (the dim
        // moved while the stream was down) is skipped by insertBatch —
        // advancing the marks then would record the move as absorbed
        // without any reset generation existing, silently diverging
        // every later delta. Stale marks instead make the NEXT batch
        // re-detect the move; an extra absorb is idempotent, a missed
        // one is not.
        val resets = resetSeedRows(source, mv, spec, gen, dims,
          retractStale = true)
        val landed =
          try mv.insertBatch(resets, queryName, batchId)
          finally { resets.unpersist(); () }
        if (landed) {
          if (moved.nonEmpty)
            dimVersions.zipWithIndex.foreach { case (v, i) =>
              CdcApply.commitMark(mv, dimMarkKey(queryName, i), v) }
          // finish what the full reset generation enables: reclaim the
          // superseded rows and re-arm the fold-free read — an in-stream
          // absorb/cadence batch IS a rebase at the batch bound, and
          // leaving the view fragmented would forgo exactly the hygiene
          // it just paid the recompute for. Crash-safe: a replayed batch
          // is skipped above (landed = false), and a crash between the
          // insert and this reclaim only defers hygiene to the next
          // cadence batch — never correctness. The flat-mark clock spin
          // gets a SHORT budget here: this runs inside foreachBatch, and
          // a writer-skew ceiling must cost micro-batch latency ~2 s,
          // not rebase's 30 s default — skipping the mark is fail-safe
          // (the fold stays on; the next cadence batch retries)
          reclaimAndArmFlat(mv, gen, settleTimeoutMs = 2_000L)
        }
      } else {
        val delta = windowDelta(source, spec, b, gen, maxPruneGroups, dims)
        try { mv.insertBatch(delta, queryName, batchId); () }
        finally { delta.unpersist(); () }
      }
    } finally { b.unpersist(); () }
  }

  /** Record a streaming query's dim-version baselines AT SETUP — only
    * where no mark exists yet (a rebase or seed under `queryName`
    * already recorded the version its recompute actually pinned). Makes
    * a dim mutation between setup and the first batch a DETECTED move
    * rather than a silently-adopted baseline. */
  def recordStreamDimBaseline(mv: IceTable, spec: MvSpec,
      queryName: String, dimTables: Seq[IceTable]): Unit = {
    requireDims(spec, dimTables, "the stream setup")
    dimTables.zipWithIndex.foreach { case (dt, i) =>
      val k = dimMarkKey(queryName, i)
      if (CdcApply.readMark(mv, k).isEmpty)
        CdcApply.commitMark(mv, k, dt.commitVersion())
    }
  }

  /** Exact recompute of the retracted groups from the base as of
    * `until + 1`. Groups no longer present in the base materialize as
    * `cnt = 0` resets (so [[read]] drops them). The base scan is
    * restricted to the retracted groups: a small single-column set
    * becomes an `isin` literal (pushed to the scan — partition- and
    * stats-prunable), anything else a broadcast semi join. For a JOIN
    * view whose group columns live on a dimension, the semi join alone
    * cannot prune the FACT side — so when the retracted set is small,
    * the affected groups' JOIN KEYS are derived from the pinned dim
    * (dim rows matching the retracted group values → their key column)
    * and pushed into the fact scan as an `isin` too. Sound because any
    * fact row of a retracted group must join a dim row carrying that
    * group's dim-side values; a partial group-column match only widens
    * the key set (superset, never a miss). */
  private def resetRows(source: IceTable, retracted: DataFrame,
      spec: MvSpec, until: Long, maxPruneGroups: Int,
      dims: Seq[DataFrame] = Nil): DataFrame = {
    val groupCols = spec.groupCols.map(col)
    // fact-side join-key prune (join views only): one bounded driver
    // collect of dim keys per equi-joined dim whose columns carry any
    // of the retracted group values
    val factPruned: DataFrame = {
      val raw = probeRead(source, until + 1)
      if (spec.joinDims.isEmpty) raw
      else spec.joinDims.zip(dims).foldLeft(raw) {
        case (acc, (j, d)) =>
          j.equiKeys match {
            case Some((fk, dk))
                if spec.groupCols.exists(d.columns.contains) =>
              val gcs = spec.groupCols.filter(d.columns.contains)
              // a LEFT dim's NULL-extended group is made of facts with
              // NO dim row: a retracted null group cannot be keyed
              // through the dim, and an isin prune would exclude exactly
              // the unmatched facts the recompute must see — skip the
              // prune for that reset (full fact scan, still correct)
              val nullGroupRetracted = j.isLeft &&
                retracted.where(gcs.map(col(_).isNull).reduce(_ || _))
                  .limit(1).count() > 0
              val keys = if (nullGroupRetracted) None else
                try {
                  val ks = d.alias("_mvd").join(
                      broadcast(retracted.alias("_mvt")),
                      gcs.map(c => col(s"_mvd.`$c`") <=> col(s"_mvt.`$c`"))
                        .reduce(_ && _), "left_semi")
                    .select(col(dk)).distinct()
                    .limit(maxPruneGroups + 1).collect().map(_.get(0)).toSeq
                  if (ks.length <= maxPruneGroups)
                    Some(ks.filterNot(_ == null))
                  else {
                    warnFallback(s"fact-scan key prune on '${j.dimTable}'",
                      s"more than maxPruneGroups=$maxPruneGroups affected " +
                        "dim keys — reset recompute scans the fact " +
                        "unpruned (semi-join only)")
                    None
                  }
                } catch { case e: Exception =>
                  warnFallback(s"fact-scan key prune on '${j.dimTable}'",
                    s"key derivation failed " +
                      s"(${e.getClass.getSimpleName}: " +
                      s"${String.valueOf(e.getMessage).take(160)}) — " +
                      "reset recompute scans the fact unpruned")
                  None
                }
              keys.fold(acc)(ks => acc.where(col(fk).isin(ks: _*)))
            case _ => acc
          }
      }
    }
    val base = spec.prepare(factPruned, dims)
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
    * are dropped. One exchange on the group key, MV-sized — except in
    * the post-rebase steady state ([[FlatKey]] proof), where the read is
    * a plain scan + projection with NO window fold and NO exchange. */
  def read(mv: IceTable, spec: MvSpec,
      maxTs: Long = Long.MaxValue): DataFrame = {
    val snap = mv.snapshot(maxTs) // ONE fold: rows + flat proof share it
    val rows = mv.read(snap, maxTs)
    require(rows.columns.contains("gen"),
      s"materialized view at ${mv.root} has no synced state yet")
    withExactDistinct(mv, spec, foldOrFlat(rows, spec, Some(snap)), maxTs)
  }

  /** Join the exact-distinct side counts onto a folded main frame — the
    * shared tail of [[read]] and the SQL catalog resolution. Each side
    * view folds per (group, value): its live rows ARE the distinct
    * values, so the count per group is exact; non-null filter matches
    * ANSI count(distinct), the null-safe LEFT join serves 0 for groups
    * whose values are all null. Join key is group-count-sized; the side
    * fold enjoys the same flat fast path after a rebase. */
  private[graft] def withExactDistinct(mv: IceTable, spec: MvSpec,
      folded: DataFrame, maxTs: Long = Long.MaxValue): DataFrame =
    spec.exactDistinctCols.foldLeft(folded) { (acc, c) =>
      val xd = spec.xdCol(c)
      val cnts = read(xdTable(mv, spec, c), xdSideSpec(spec, c), maxTs)
        .where(col(spec.xdValCol(c)).isNotNull)
        .groupBy(spec.groupCols.map(col): _*)
        .agg(count(lit(1)).as(xd))
      acc.alias("_mva").join(cnts.alias("_mvx"),
          groupCond("_mva", "_mvx", spec.groupCols), "left")
        .select(acc.columns.map(k => col(s"_mva.`$k`").as(k)) :+
          coalesce(col(s"_mvx.`$xd`"), lit(0L)).as(xd): _*)
    }

  /** [[foldPartials]], short-circuited to scan + projection when `snap`
    * proves the flat (single all-reset generation, one row per group)
    * state. Value columns are cast to the fold's own output types (sum
    * over decimals widens), so both paths present ONE schema. */
  private[graft] def foldOrFlat(rows: DataFrame, spec: MvSpec,
      snap: Option[graft.ice.IceSnapshot]): DataFrame =
    if (!snap.exists(isFlatSnapshot)) foldPartials(rows, spec)
    else {
      val foldSchema = foldPartials(rows, spec).schema
      rows.where(col("cnt") > 0).select(
        spec.groupCols.map(col) ++ spec.valueCols.map(c =>
          col(c).cast(foldSchema(c).dataType).as(c)): _*)
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
    * partial-row source. A GLOBAL view (no group columns) folds its
    * synthetic key out here and ALWAYS reads exactly one row: when the
    * fold is empty (unseeded-but-schema'd, or fully retracted), the
    * aggregates' ANSI over-empty identities surface — count 0,
    * everything else null — never no-rows. A HAVING predicate applies
    * LAST, over the projected aliases. */
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
        // exact count(distinct): the side-state count column [[read]]
        // already joined in — exact and retractable, no estimate
        case "xdcnt" => col(d.spec.xdCol(o.col))
        case k => throw new IllegalArgumentException(s"unknown MV aggregate kind $k")
      }).as(o.alias)
    }
    val projected = folded.select(cols: _*)
    val shaped =
      if (d.groupCols.nonEmpty) projected
      else {
        // the one-row default: typed from the projection's own schema,
        // real row (priority 0) wins over the identity row (1) — both
        // frames are at most one row, so the sort is free
        val defaults = d.outputs.map { o =>
          val dt = projected.schema(o.alias).dataType
          (o.kind match {
            case "cnt" | "dcnt" | "xdcnt" => lit(0L).cast(dt)
            case _ => lit(null).cast(dt)
          }).as(o.alias)
        }
        val zero = folded.sparkSession.range(1).select(defaults: _*)
        projected.withColumn("_mv_pri", lit(0))
          .unionByName(zero.withColumn("_mv_pri", lit(1)))
          .orderBy(col("_mv_pri")).limit(1).drop("_mv_pri")
      }
    d.havingSql.fold(shaped)(h => shaped.where(expr(h)))
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
      dimTables: Seq[IceTable] = Nil): Long = {
    requireNotMvSource(source)
    requireDims(spec, dimTables, "a rebase")
    // rebase the exact-distinct side views too: their generations
    // collapse and their own flat marks re-arm alongside the main one
    syncSides(mv, spec)((t, s) =>
      { rebase(source, t, s, replicaId, settleTimeoutMs, dimTables); () })
    val pins = pinDims(dimTables, requireSeeded = false)
    val dims = pins.map(_.df)
    val key = s"_mv_sync:$replicaId"
    val wm = CdcApply.readMark(mv, key).getOrElse {
      // a brand-new table (an exact-distinct side view being seeded by
      // an ALTER … ADD rebase) starts from zero — the rebase IS the seed
      if (mv.trySnapshot(Long.MaxValue).isEmpty) 0L
      else {
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
    }
    // the rebase generation must be STRICTLY past the watermark
    val until = awaitSettledPast(source, wm, settleTimeoutMs,
      what = s"rebase of ${mv.root}")
    val resets = spec.prepare(source.read(until + 1), dims)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(spec.aggExprs.head, spec.aggExprs.tail: _*)
      .withColumn("gen", lit(until))
      .withColumn("is_reset", lit(true))
      .localCheckpoint(true)
    try {
      val n = resets.count()
      if (n == 0) CdcApply.commitMark(mv, key, until)
      else mv.insertBatch(resets, key, until)
      pins.zipWithIndex.foreach { case (pin, i) =>
        CdcApply.commitMark(mv, dimCountKey(replicaId, i),
          encodeCountMark(pin.version, pin.count))
        CdcApply.commitMark(mv, dimMarkKey(replicaId, i), pin.version)
      }
      reclaimAndArmFlat(mv, until, settleTimeoutMs)
      n
    } finally { resets.unpersist(); () }
  }

  /** The compaction tail a freshly-landed FULL reset generation enables
    * — shared by [[rebase]] and the streaming absorb/cadence paths:
    * reclaim every superseded row (CoW delete of `gen < until`), then
    * record the FLAT-STATE MARK (read fast path): every alive marker now
    * sits at or below the commit ceiling; spin the clock strictly past
    * it so the mark value upper-bounds them all AND lower-bounds every
    * later write — see [[FlatKey]]. The spin is BOUNDED: a ceiling
    * stamped by a writer whose clock ran ahead (bad NTP on an ingest
    * host) would otherwise block here for the full skew. Past the bound
    * the mark is simply SKIPPED with the reason surfaced — the collapse
    * itself is complete and correct either way; only the fold-free read
    * optimization is forgone (rerun rebase to re-arm once clocks
    * agree). */
  private def reclaimAndArmFlat(mv: IceTable, until: Long,
      settleTimeoutMs: Long = 30_000L): Unit = {
    // reclaim superseded generations AND the fresh generation's cnt=0
    // retraction rows: they exist to mask older rows of emptied groups
    // during the commit→reclaim window, and once the older generations
    // are gone (this same atomic CoW) they are pure dead weight — a
    // long-lived absorb/cadence stream would otherwise accumulate one
    // tombstone row per ever-emptied group forever
    mv.deleteWhere(col("gen") < until ||
      (col("gen") === until && col("cnt") === 0))
    val ceil = math.max(mv.commitVersion(),
      mv.trySnapshot(Long.MaxValue).toSeq
        .flatMap(_.aliveFiles.map(_.createdMs)).maxOption.getOrElse(0L))
    val spinDeadline = System.currentTimeMillis() + settleTimeoutMs
    while (System.currentTimeMillis() <= ceil &&
        System.currentTimeMillis() < spinDeadline) Thread.sleep(1)
    if (System.currentTimeMillis() > ceil)
      CdcApply.commitMark(mv, FlatKey, ceil + 1L)
    else warnFallback(s"flat-state mark after rebase of ${mv.root}",
      s"a commit timestamp ($ceil) sits ${ceil - System.currentTimeMillis()} ms " +
        "ahead of this host's clock (writer clock skew) — mark skipped, " +
        "reads keep the window fold; rerun rebase once clocks agree")
  }
}
