package graft.plans

import graft.ice.{IceTable, IceTableConfig}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, DeleteFromTable, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{NumericType, TimestampType}

/** Analyzer rule that makes ice tables first-class SQL relations:
  *
  * {{{
  *   spark.conf.set("spark.graft.warehouse", "/lake")
  *   spark.sql("SELECT d, count(*) FROM graft.events WHERE d >= '2024-01-10' GROUP BY d")
  *   spark.sql("SELECT count(*) FROM graft.events TIMESTAMP AS OF 1700000000000")
  *   spark.sql("SELECT count(*) FROM graft.events VERSION AS OF 1700000000000")
  * }}}
  *
  * The catalog name defaults to `graft` (NOT `ice`: that is the
  * datasource short name, and Spark's `ResolveSQLOnFile` claims any
  * `<datasource>.<ident>` two-part name for its SQL-on-files syntax
  * before extension resolution rules run — a catalog named after a
  * registered datasource is unreachable from SQL). Override with
  * `spark.graft.catalog`.
  *
  * `graft.<name>` resolves to the table rooted at `<warehouse>/<name>`
  * through [[IceFileIndex]], so the SQL path gets the same optimizer-side
  * partition pruning and log-stats file skipping as the DataFrame path
  * (B21) — no file lists spliced into SQL text, which is the reference's
  * DuckDB-macro / ClickHouse-parameterized-view integration surface
  * (examples/segment-webhook-sink.py:84-90, examples/clickhouse.md:30-35)
  * re-expressed as a Catalyst resolution rule.
  *
  * Time travel maps onto the table's MVCC snapshots (icedb read_at_max_time,
  * log.py:311-328): `TIMESTAMP AS OF` takes a timestamp (or an integral
  * epoch-millis value — the engine's native time unit) and pins the
  * snapshot that INCLUDES logs committed at that instant; `VERSION AS OF v`
  * treats `v` as a log timestamp in epoch millis, inclusive, matching
  * `IceTable.snapshot(v + 1)`'s strict-`<` fold.
  *
  * The full SQL DML surface routes through the engine's atomic
  * operations: `INSERT INTO` → [[IceTable.insert]] (one log commit, the
  * table's persisted routing/sort config applied), `UPDATE`/`DELETE` →
  * the CoW mutations, `MERGE INTO` → upsert/deleteKeys. `INSERT
  * OVERWRITE` alone is rejected — truncating an MVCC table is an
  * explicit maintenance decision (`removePartitions` /
  * `rewritePartition`), never a write mode's side effect.
  *
  * Every read and DML form also accepts a WAP-branch target spelled
  * ``graft.`t@branch` `` (backticked — `@` is not a bare-identifier
  * character), resolving through [[graft.ice.Branch]] handles to the
  * branch's own log: the write-audit-publish loop is expressible
  * end-to-end in SQL (`ALTER TABLE … CREATE BRANCH b`, DML on
  * ``graft.`t@b` ``, validate with SELECTs, `… PUBLISH BRANCH b`). The
  * branch must already exist — DML never creates one implicitly.
  *
  * The change feed has a SQL spelling too:
  * `SELECT * FROM table_changes('t', since_ms[, until_ms])` resolves to
  * [[graft.ice.ChangeFeed.between]]'s `(since, until]` window — Delta's
  * CDF table-valued function shape.
  *
  * Injected by [[graft.GraftExtensions]]; activates only when
  * `spark.graft.warehouse` is set, and leaves any name it cannot resolve
  * untouched so Spark's normal missing-table error still fires.
  */
final class IceSqlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  import IceSqlResolution._

  private def warehouse: Option[String] =
    spark.conf.getOption(WarehouseKey).filter(_.nonEmpty)

  private def catalogName: String =
    spark.conf.getOption(CatalogKey).getOrElse("graft")

  /** `<warehouse>/<name>` if it looks like an ice table (has a `_log/`
    * dir); names are restricted to path-safe tokens so SQL identifiers
    * can never traverse out of the warehouse. A `t@branch` name (spelled
    * backticked in SQL: ``graft.`t@audit` ``) additionally requires the
    * branch's own log directory — the WAP loop's reads AND writes are
    * then expressible end-to-end in SQL. Returns (root, branch-or-""). */
  private def tableTarget(name: String): Option[(String, String)] =
    warehouse.flatMap { w =>
      val (base, branch) = IceSqlResolution.splitBranch(name)
      if (!SafeName.matches(base)) None
      else if (branch.exists(b => !IceSqlResolution.safeBranch(b))) None
      else {
        val (root, ok) = IceSqlResolution.probeRootAt(spark, w, base)
        if (!ok) None
        else branch match {
          case None => Some((root, ""))
          case Some(b) =>
            val blog = new Path(root, s"_branch/$b/_log")
            val exists = try blog.getFileSystem(
                spark.sparkContext.hadoopConfiguration).exists(blog)
              catch { case _: Exception => false }
            if (exists) Some((root, b)) else None
        }
      }
    }

  private def tableRoot(name: String): Option[String] =
    tableTarget(name).map(_._1)

  private def resolve(name: String, maxTs: Long): Option[LogicalPlan] =
    tableTarget(name).map { case (root, branch) =>
      // open(), not a bare handle: the persisted config restores the
      // stats columns, so the SQL path gets the same log-side file
      // skipping (IceFileIndex.statsWindows) as the DataFrame path.
      // openWithSnapshot: the config fold doubles as the relation's
      // snapshot (when no time travel narrows it), so each table
      // reference costs ONE log fold
      val (t, snapOpt) = IceSqlResolution.openTargetWithSnapshot(
        spark, root, branch)
      // time travel folds ONCE too: the bounded snapshot feeds both the
      // relation and (for an MV) the flat-state proof below — two
      // independent folds could disagree if a commit raced between them,
      // and the proof must be judged against the EXACT file set it reads
      val pre =
        if (maxTs == Long.MaxValue) snapOpt else t.trySnapshot(maxTs)
      val raw = IceFileIndex.dataFrame(spark, t, maxTs, pre)
      val rel = t.cfg.mvDef match {
        // a materialized view reads as its FOLDED definition (the
        // newest-reset-wins fold + the SELECT's projection), never as
        // the raw partial rows; time travel folds the MV's own history.
        // The fold is applied over the SAME relation the snapshot fold
        // above already paid for — no second log fold per reference
        case Some(enc) =>
          val vd = graft.operators.MvSync.MvViewDef.decode(enc)
          if (!raw.columns.contains("gen")) throw new IllegalStateException(
            s"materialized view '$name' has no synced state yet — " +
              "REFRESH MATERIALIZED VIEW after its source has commits")
          // foldOrFlat: a freshly-rebased view (flat-mark proof in the
          // snapshot) reads as scan + projection — no window fold, no
          // MV-sized exchange; any later partial self-invalidates it.
          // `pre` is the SAME snapshot `raw` was built from, so the
          // proof can never be newer than the rows it vouches for
          graft.operators.MvSync.projectView(
              graft.operators.MvSync.withExactDistinct(t, vd.spec,
                graft.operators.MvSync.foldOrFlat(raw, vd.spec, pre), maxTs),
              vd)
            .queryExecution.analyzed
        case None => raw.queryExecution.analyzed
      }
      SubqueryAlias(Seq(catalogName, name), rel)
    }

  /** `TIMESTAMP AS OF` expression → exclusive snapshot bound (ms).
    * Integral values are epoch millis; anything else is cast to timestamp
    * in the session zone. Inclusive at ms granularity ⇒ `+ 1` against the
    * strict-`<` log fold. */
  private def evalMaxTs(e: Expression): Option[Long] = {
    if (!e.resolved || !e.foldable) return None
    e.dataType match {
      case _: NumericType =>
        Option(e.eval()).map(v => new java.math.BigDecimal(v.toString).longValue + 1L)
      case _ =>
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        Option(Cast(e, TimestampType, Some(zone)).eval())
          .map(micros => micros.asInstanceOf[Long] / 1000L + 1L)
    }
  }

  private object IceName {
    def unapply(p: LogicalPlan): Option[String] = p match {
      case u: UnresolvedRelation if !u.isStreaming =>
        u.multipartIdentifier match {
          case Seq(c, t) if c.equalsIgnoreCase(catalogName) => Some(t)
          case _ => None
        }
      case _ => None
    }
  }

  /** A graft relation in either state: still-unresolved name, or the
    * SubqueryAlias this same rule already produced (resolveOperators is
    * bottom-up, so a DML node's child resolves BEFORE the node itself is
    * visited). */
  private object IceRel {
    def unapply(p: LogicalPlan): Option[String] = p match {
      case IceName(t) => Some(t)
      case SubqueryAlias(org.apache.spark.sql.catalyst.AliasIdentifier(t, Seq(c)), _)
          if c.equalsIgnoreCase(catalogName) => Some(t)
      // user aliases peel: `MERGE INTO graft.t AS tgt` / `DELETE FROM
      // graft.t x` wrap the relation in another SubqueryAlias
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // `INSERT INTO graft.t [(cols)] SELECT ... | VALUES ...` → ONE atomic
    // engine insert through the transaction log (IceTable.open restores
    // the table's routing/sort config, so SQL-inserted rows land in the
    // same partition/sort shape as API inserts). INSERT OVERWRITE stays
    // rejected: truncation of an MVCC table is an explicit maintenance
    // decision (removePartitions / rewritePartition), not a write mode.
    case ins @ InsertIntoStatement(IceRel(t), partSpec, userCols, query, overwrite, _, byName)
        if tableTarget(t).isDefined && query.resolved =>
      if (overwrite) throw new UnsupportedOperationException(
        s"INSERT OVERWRITE $catalogName.$t is not supported — truncate " +
          "explicitly via removePartitions/rewritePartition, then INSERT")
      if (partSpec.nonEmpty) throw new UnsupportedOperationException(
        s"INSERT INTO $catalogName.$t PARTITION (...) is not supported — " +
          "the table's partition expression routes rows itself")
      val (insRoot, insBranch) = tableTarget(t).get
      IceInsertCommand(insRoot, s"$catalogName.$t",
        new PlanBox(query), userCols, byName, insBranch)
    // SQL DML maps onto the engine's atomic CoW mutations. The raw
    // (unresolved) expressions travel as SQL text and re-resolve against
    // the table's own DataFrame inside the command — a LeafRunnableCommand
    // must not carry unresolved attributes through CheckAnalysis. The
    // command opens the table via IceTable.open, which reconstructs the
    // persisted sortOrder/stats config from the log — SQL-path rewrites
    // produce the same sorted, stats-bearing files as the configured
    // handle's own DML.
    case DeleteFromTable(IceRel(t), cond) if tableTarget(t).isDefined =>
      val (dRoot, dBranch) = tableTarget(t).get
      IceDeleteCommand(dRoot, s"$catalogName.$t", cond.sql, dBranch)
    case UpdateTable(IceRel(t), assignments, condOpt) if tableTarget(t).isDefined =>
      val sets = assignments.map { a =>
        val name = a.key match {
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => ua.name
          case other => other.sql.stripPrefix("`").stripSuffix("`")
        }
        name -> a.value.sql
      }
      val (uRoot, uBranch) = tableTarget(t).get
      IceUpdateCommand(uRoot, s"$catalogName.$t",
        sets, condOpt.map(_.sql).getOrElse("true"), uBranch)
    // `MERGE INTO graft.t USING src ON t.k = src.k WHEN MATCHED ... WHEN
    // NOT MATCHED ...` → the engine's atomic key-based mutations
    // (IceTable.upsert / deleteKeys). Intercepted as soon as the target
    // resolved (this same bottom-up pass resolves it) so Spark's own
    // merge machinery — which star-expands `SET *` against the relation's
    // path-derived partition columns and then rejects V1 targets — never
    // gets to run. The ON condition's key equalities are extracted from
    // the still-unresolved attribute names by alias qualifier (or by
    // unqualified same-name membership); the resolved source plan rides
    // inside the command in a non-TreeNode box and re-wraps at execution.
    case m @ MergeIntoTable(tgt @ IceRel(t), source, cond, matchedActions,
        notMatchedActions, notMatchedBySourceActions, _)
        if tableTarget(t).isDefined && source.resolved =>
      import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo}
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, UpdateAction}
      def fail(msg: String): Nothing =
        throw new UnsupportedOperationException(s"MERGE INTO $catalogName.$t: $msg")
      def lastName(e: Expression): Option[String] = e match {
        case ua: UnresolvedAttribute => Some(ua.nameParts.last)
        case ar: AttributeReference => Some(ar.name)
        case _ => None
      }
      // star-equivalence: ResolveReferences may expand `SET *` / `INSERT *`
      // into same-name assignment lists before this rule sees the node
      def allSameName(assigns: Seq[Assignment]): Boolean = assigns.forall(a =>
        (lastName(a.key), lastName(a.value)) match {
          case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
          case _ => false
        })
      if (notMatchedBySourceActions.nonEmpty)
        fail("WHEN NOT MATCHED BY SOURCE is not supported")
      val insertUnmatched = notMatchedActions match {
        case Seq(InsertStarAction(None)) => true
        case Seq(InsertAction(None, assigns)) if allSameName(assigns) => true
        case Seq() => false
        case _ => fail("only an unconditional `WHEN NOT MATCHED THEN INSERT *` is supported")
      }
      val matchedMode = matchedActions match {
        case Seq(UpdateStarAction(None)) => "update"
        case Seq(UpdateAction(None, assigns, _)) if allSameName(assigns) => "update"
        case Seq(DeleteAction(None)) =>
          if (insertUnmatched) fail(
            "WHEN MATCHED THEN DELETE combined with WHEN NOT MATCHED THEN " +
              "INSERT would need two commits; run them as separate statements")
          "delete"
        case Seq() => "none"
        case _ => fail("only unconditional `UPDATE SET *` or `DELETE` matched actions are supported")
      }
      if (matchedMode == "none" && !insertUnmatched) fail("no supported action")
      // alias sets for deciding which side of an equality is which
      def aliasesOf(p: LogicalPlan): Set[String] = p.collect {
        case SubqueryAlias(id, _) => id.name.toLowerCase
        case u: UnresolvedRelation => u.multipartIdentifier.last.toLowerCase
      }.toSet
      val tgtAliases = aliasesOf(tgt) + t.toLowerCase
      val srcAliases = aliasesOf(source)
      // analyzer timing varies: the target child may still be the
      // unresolved name when this fires (its output would be empty, and
      // the unqualified same-name key branch below would spuriously
      // reject) — fall back to the table's own log schema + path-derived
      // partition keys
      val tgtCols: Set[String] =
        if (tgt.resolved) tgt.output.map(_.name.toLowerCase).toSet
        else {
          val (mRoot0, mBranch0) = tableTarget(t).get
          val ot = IceSqlResolution.openTarget(spark, mRoot0, mBranch0)
          val dataCols = ot.trySnapshot(Long.MaxValue).toSeq
            .flatMap(_.schema.pairs.map(_._1.toLowerCase))
          val partCols = ot.trySnapshot(Long.MaxValue).toSeq
            .flatMap(_.aliveFiles.map(m => ot.partitionOf(m.path)))
            .flatMap(_.split("/").toSeq).filter(_.contains("="))
            .map(_.split("=", 2)(0).toLowerCase)
          (dataCols ++ partCols).toSet
        }
      val srcCols = source.output.map(_.name.toLowerCase).toSet
      def parts(e: Expression): Option[Seq[String]] = e match {
        case ua: UnresolvedAttribute => Some(ua.nameParts)
        case ar: AttributeReference => Some(ar.qualifier :+ ar.name)
        case _ => None
      }
      def keyPairs(e: Expression): Seq[(String, String)] = e match {
        case And(l, r) => keyPairs(l) ++ keyPairs(r)
        case EqualTo(a, b) =>
          val (ap, bp) = (parts(a), parts(b)) match {
            case (Some(x), Some(y)) => (x, y)
            case _ => fail("ON condition must be a conjunction of column equalities")
          }
          def qual(ps: Seq[String]): Option[String] =
            if (ps.length > 1) Some(ps(ps.length - 2).toLowerCase) else None
          (qual(ap), qual(bp)) match {
            case (Some(qa), Some(qb))
                if tgtAliases.contains(qa) && srcAliases.contains(qb) =>
              Seq(ap.last -> bp.last)
            case (Some(qa), Some(qb))
                if srcAliases.contains(qa) && tgtAliases.contains(qb) =>
              Seq(bp.last -> ap.last)
            case (None, None)
                if ap.last.equalsIgnoreCase(bp.last) &&
                  tgtCols.contains(ap.last.toLowerCase) &&
                  srcCols.contains(ap.last.toLowerCase) =>
              Seq(ap.last -> bp.last)
            case _ => fail(
              s"cannot attribute ON equality `${ap.mkString(".")} = " +
                s"${bp.mkString(".")}` to target/source; qualify both sides " +
                "with their aliases")
          }
        case other => fail(
          s"ON condition must be a conjunction of target/source column " +
            s"equalities; got: ${other.sql}")
      }
      val (mRoot, mBranch) = tableTarget(t).get
      IceMergeCommand(mRoot, s"$catalogName.$t",
        new PlanBox(source), keyPairs(cond), matchedMode, insertUnmatched,
        mBranch)
    case tt @ RelationTimeTravel(IceName(t), tsOpt, verOpt) =>
      val maxTs: Option[Long] = (tsOpt, verOpt) match {
        case (_, Some(v)) => v.toLongOption.map(_ + 1L)
        case (Some(ts), None) => evalMaxTs(ts)
        case _ => None
      }
      maxTs.flatMap(resolve(t, _)).getOrElse(tt)
    case u @ IceName(t) =>
      resolve(t, Long.MaxValue).getOrElse(u)
  }
}

object IceSqlResolution {
  val WarehouseKey = "spark.graft.warehouse"
  val CatalogKey = "spark.graft.catalog"
  private val SafeName = "[A-Za-z0-9_][A-Za-z0-9_.-]*".r.anchored

  /** Identifier restriction shared with the DDL parser: path-safe tokens
    * only, so a SQL name can never traverse out of the warehouse. */
  private[plans] def safeName(n: String): Boolean = SafeName.matches(n)

  private val SafeBranch = "[A-Za-z0-9_-]{1,64}".r.anchored
  private[plans] def safeBranch(b: String): Boolean = SafeBranch.matches(b)

  /** ``t@branch`` name split (the branch-DML spelling; SQL writes it
    * backticked: ``graft.`t@audit` ``). No `@` → (name, None). */
  private[plans] def splitBranch(name: String): (String, Option[String]) =
    name.split("@", 2) match {
      case Array(base, br) if br.nonEmpty => (base, Some(br))
      case _ => (name, None)
    }

  /** The DML target handle: the main table, or the named WAP branch
    * (which must exist — DML never creates branches implicitly; its
    * persisted config is restored from the branch log, so branch-side
    * SQL writes route/sort exactly like API writes). */
  private[plans] def openTarget(
      session: SparkSession, root: String, branch: String): IceTable =
    if (branch.isEmpty) IceTable.open(session, root)
    else openTargetWithSnapshot(session, root, branch)._1

  /** [[openTarget]] for DML statements: a materialized view's contents
    * are derived state — direct mutation would silently diverge it from
    * its definition, so the mutable spelling rejects MV tables. */
  private[plans] def openMutable(
      session: SparkSession, root: String, branch: String): IceTable = {
    val t = openTarget(session, root, branch)
    requireNotMv(t)
    t
  }

  private[plans] def requireNotMv(t: IceTable): Unit =
    require(t.cfg.mvDef.isEmpty,
      s"${t.root} is a MATERIALIZED VIEW maintained from its source's " +
        "change feed — mutate the SOURCE table and run REFRESH " +
        "MATERIALIZED VIEW instead of writing to the view")

  /** [[openTarget]] that also returns the fold it paid, so the branch
    * log folds ONCE per reference (it used to fold in openExisting and
    * again for the relation snapshot). The main log still folds once too
    * on the branch spelling — deliberately: it restores main's persisted
    * config as the fallback for branch logs that carry none, so a
    * branch-side SQL write can never silently lose the routing layout. */
  private[plans] def openTargetWithSnapshot(
      session: SparkSession, root: String,
      branch: String): (IceTable, Option[graft.ice.IceSnapshot]) =
    if (branch.isEmpty) IceTable.openWithSnapshot(session, root)
    else graft.ice.Branch
      .openExistingWithSnapshot(IceTable.open(session, root), branch)
      .map { case (t, s) => (t, Some(s)) }
      .getOrElse(throw new IllegalArgumentException(
        s"branch '$branch' does not exist on $root — create it first " +
          "(ALTER TABLE ... CREATE BRANCH)"))

  /** The ONE `<warehouse>/<name>` → (root, has-a-`_log`) probe, shared by
    * the resolution rule and the DDL parser so the two surfaces can never
    * disagree on whether a table exists. */
  private[plans] def probeRootAt(
      session: SparkSession, warehouse: String, name: String): (String, Boolean) = {
    val root = s"$warehouse/$name"
    val log = new Path(root, "_log")
    val exists =
      try log.getFileSystem(session.sparkContext.hadoopConfiguration).exists(log)
      catch { case _: Exception => false }
    (root, exists)
  }

  /** Builder for the `table_changes('t', since[, until])` table-valued
    * function (registered by [[graft.GraftExtensions]] — a registry TVF,
    * not a resolution-rule rewrite, because the analyzer's
    * ResolveFunctions fails unknown TVFs before extension rules run):
    * Delta's CDF TVF shape over [[graft.ice.ChangeFeed.between]]'s
    * `(since, until]` window. Bounds take integral epoch millis (the
    * log's native unit, passed through raw — ChangeFeed owns the window
    * inclusivity discipline) or anything castable to timestamp. Only the
    * driver-side log fold runs at resolution; the data stays a
    * distributed plan. */
  private[graft] def tableChangesPlan(
      args: Seq[Expression]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val spark = SparkSession.active
    def fail(msg: String) = throw new IllegalArgumentException(
      s"table_changes(table, since[, until]): $msg")
    if (args.length < 2 || args.length > 3)
      fail(s"expected 2 or 3 arguments, got ${args.length}")
    val (catalog, root, branch) = tvfRoot(spark, args.head, fail)
    val since = tvfTsMs(spark, args(1), "since", fail)
    val until = args.lift(2).map(tvfTsMs(spark, _, "until", fail))
      .getOrElse(Long.MaxValue)
    val df = graft.ice.ChangeFeed.between(
      openTarget(spark, root, branch), since, until)
    SubqueryAlias(Seq(catalog, "table_changes"), df.queryExecution.analyzed)
  }

  /** Builder for the metadata-table TVFs `table_files('t'[, asOf])` /
    * `table_partitions` / `table_history` (see [[graft.ice.MetaTables]]).
    * TVFs, not 3-part relations (`graft.t.files`): the session catalog's
    * ResolveRelations rejects multi-part namespaces BEFORE extension
    * resolution rules could see the name — the same analyzer-ordering
    * constraint that made table_changes a TVF. The optional second
    * argument time-travels the metadata (inclusive ms, like
    * `TIMESTAMP AS OF`). */
  private[graft] def metaTablePlan(meta: String,
      args: Seq[Expression]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val spark = SparkSession.active
    def fail(msg: String) = throw new IllegalArgumentException(
      s"table_$meta(table[, asOf]): $msg")
    if (args.isEmpty || args.length > 2)
      fail(s"expected 1 or 2 arguments, got ${args.length}")
    val (catalog, root, branch) = tvfRoot(spark, args.head, fail)
    val maxTs = args.lift(1).map(tvfTsMs(spark, _, "asOf", fail) + 1L)
      .getOrElse(Long.MaxValue)
    val df = graft.ice.MetaTables.relation(
      openTarget(spark, root, branch), meta, maxTs)
    SubqueryAlias(Seq(catalog, s"table_$meta"), df.queryExecution.analyzed)
  }

  /** Builder for the `table_stats('t')` TVF: the latest ANALYZE result,
    * one row per column (see [[graft.ice.TableStats]]). */
  private[graft] def tableStatsPlan(
      args: Seq[Expression]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val spark = SparkSession.active
    def fail(msg: String) = throw new IllegalArgumentException(
      s"table_stats(table): $msg")
    if (args.length != 1) fail(s"expected 1 argument, got ${args.length}")
    val (catalog, root, branch) = tvfRoot(spark, args.head, fail)
    if (branch.nonEmpty) fail(
      "ANALYZE statistics are table-level; branches carry none")
    val df = graft.ice.TableStats.asDataFrame(IceTable.open(spark, root))
    SubqueryAlias(Seq(catalog, "table_stats"), df.queryExecution.analyzed)
  }

  /** Shared TVF helpers: resolve the table-name literal to a warehouse
    * root (optional `graft.` prefix peels; path-safe names only), and
    * evaluate a numeric-or-timestamp literal to epoch millis. */
  /** TVF table argument → (catalog, root, branch-or-""). Accepts the
    * same `t@branch` spelling as relation names, so the WAP loop's
    * validation queries (`table_changes('t@wap', …)`,
    * `table_files('t@wap')`) stay in pure SQL. */
  private def tvfRoot(spark: SparkSession, nameArg: Expression,
      fail: String => Nothing): (String, String, String) = {
    val catalog = spark.conf.getOption(CatalogKey).getOrElse("graft")
    val warehouse = spark.conf.getOption(WarehouseKey).filter(_.nonEmpty)
      .getOrElse(fail(s"$WarehouseKey is not set"))
    val name = nameArg match {
      case e if e.foldable && e.dataType == org.apache.spark.sql.types.StringType =>
        Option(e.eval()).map(_.toString).getOrElse(fail("table name is null"))
      case _ => fail("the table name must be a string literal")
    }
    val bare = name.split("\\.", 2) match {
      case Array(c, x) if c.equalsIgnoreCase(catalog) => x
      case _ => name
    }
    val (base, branchOpt) = splitBranch(bare)
    if (!safeName(base)) fail(s"unsafe table name: '$base'")
    branchOpt.foreach(b =>
      if (!safeBranch(b)) fail(s"unsafe branch name: '$b'"))
    val (root, ok) = probeRootAt(spark, warehouse, base)
    if (!ok) fail(s"graft table '$base' does not exist")
    (catalog, root, branchOpt.getOrElse(""))
  }

  private def tvfTsMs(spark: SparkSession, e: Expression, what: String,
      fail: String => Nothing): Long = e.dataType match {
    case _: NumericType =>
      Option(e.eval()).map(v => new java.math.BigDecimal(v.toString).longValue)
        .getOrElse(fail(s"$what is null"))
    case _ =>
      val zone = spark.sessionState.conf.sessionLocalTimeZone
      Option(Cast(e, TimestampType, Some(zone)).eval())
        .map(_.asInstanceOf[Long] / 1000L)
        .getOrElse(fail(s"$what is not a timestamp"))
  }
}

/** `DELETE FROM graft.<t> WHERE ...` → [[IceTable.deleteWhere]] (atomic
  * CoW of only the affected files). When the predicate provably covers
  * WHOLE partitions ([[IceTable.tryLogOnlyDelete]]: partition-key-only
  * refs, no data-column shadowing, no deletion vectors, exact marker
  * row counts), the delete is LOG-ONLY — one metadata commit, zero data
  * files read or written; at 100 TB that turns routine retention
  * (`DELETE … WHERE d < '…'`) from a month-sized rewrite into a PUT.
  * Returns one row: rows_deleted. */
final case class IceDeleteCommand(root: String, ident: String, condSql: String,
    branch: String = "")
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AR("rows_deleted", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val t = IceSqlResolution.openMutable(session, root, branch)
    val cond = org.apache.spark.sql.functions.expr(condSql)
    val n = t.tryLogOnlyDelete(cond).getOrElse(t.deleteWhere(cond))
    Seq(org.apache.spark.sql.Row(n))
  }
}

/** Opaque (non-TreeNode) holder for a resolved source plan riding inside
  * a LeafRunnableCommand: TreeNode's product-based transforms must not
  * recurse into it (the command is a leaf; the plan re-wraps into a
  * DataFrame only at execution). */
final class PlanBox(val plan: LogicalPlan) extends Serializable

/** `MERGE INTO graft.<t> USING src ON <key equalities> WHEN MATCHED THEN
  * UPDATE SET * / DELETE [WHEN NOT MATCHED THEN INSERT *]` → one atomic
  * engine commit:
  *
  *  - `UPDATE SET *` + `INSERT *` → [[IceTable.upsert]] (replace matched,
  *    append unmatched — the full upsert)
  *  - `UPDATE SET *` alone → upsert of the source restricted to keys that
  *    exist in the target (nothing appends)
  *  - `DELETE` alone → [[IceTable.deleteKeys]]
  *  - `INSERT *` alone → insert of the source restricted to keys NOT in
  *    the target
  *
  * Returns one row: (rows_matched, rows_copied). `keyPairs` maps target
  * key column name → source column name (renamed to align before the
  * key join). */
final case class IceMergeCommand(
    root: String, ident: String,
    sourceBox: PlanBox,
    keyPairs: Seq[(String, String)],
    matchedMode: String,
    insertUnmatched: Boolean,
    branch: String = "")
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      AR("rows_matched", org.apache.spark.sql.types.LongType, nullable = false)(),
      AR("rows_copied", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions.col
    val t = IceSqlResolution.openMutable(session, root, branch)
    var src = org.apache.spark.sql.graft.PlanBridge.ofRows(session, sourceBox.plan)
    keyPairs.foreach { case (tn, sn) =>
      if (sn != tn) src = src.withColumnRenamed(sn, tn)
    }
    val keys = keyPairs.map(_._1)
    val targetKeys = () => t.trySnapshot(Long.MaxValue)
      .map(_ => t.read().select(keys.map(col): _*).distinct())
    val row = matchedMode match {
      case "update" if insertUnmatched =>
        val (matched, copied) = t.upsert(src, keys)
        org.apache.spark.sql.Row(matched, copied)
      case "update" =>
        val restricted = targetKeys()
          .map(tk => src.join(tk, keys, "left_semi")).getOrElse(src.limit(0))
        val (matched, copied) = t.upsert(restricted, keys)
        org.apache.spark.sql.Row(matched, copied)
      case "delete" =>
        org.apache.spark.sql.Row(t.deleteKeys(src, keys), 0L)
      case _ => // insert-only merge
        val fresh = targetKeys()
          .map(tk => src.join(tk, keys, "left_anti")).getOrElse(src)
        val staged = fresh.localCheckpoint()
        val n = staged.count()
        if (n > 0) t.insert(staged)
        org.apache.spark.sql.Row(0L, n)
    }
    Seq(row)
  }
}

/** `INSERT INTO graft.<t> [(cols)] [BY NAME] <query>` → one atomic
  * [[IceTable.insert]] through the log. Column alignment: `BY NAME`
  * matches the query's output names to the table's columns
  * (case-insensitively, like Spark's resolver); an explicit column list
  * renames the query's outputs to it; otherwise, when the query's output
  * arity matches the table's log schema, outputs map POSITIONALLY to the
  * schema's column order (standard SQL INSERT semantics — `VALUES`
  * tuples have no names of their own); an arity mismatch without a
  * column list is rejected (list the target columns to insert a subset
  * or evolve the schema). On an EMPTY table the query's own output names
  * seed the schema. Every aligned name is canonicalized to the table's
  * recorded case (the log schema is exact-case; a case-variant duplicate
  * column would be unreachable under Spark's case-insensitive
  * resolution) and cast to the table's recorded type. Returns one row:
  * rows_inserted. */
final case class IceInsertCommand(
    root: String, ident: String,
    queryBox: PlanBox,
    userCols: Seq[String],
    byName: Boolean = false,
    branch: String = "")
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AR("rows_inserted", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    // one log fold: the config fold doubles as the snapshot AND seeds the
    // insert pre-flight cache (openWithSnapshot does both)
    val (t, snapOpt) =
      if (branch.isEmpty) graft.ice.IceTable.openWithSnapshot(session, root)
      else {
        val bt = IceSqlResolution.openTarget(session, root, branch)
        (bt, bt.trySnapshot(Long.MaxValue))
      }
    IceSqlResolution.requireNotMv(t)
    val q = org.apache.spark.sql.graft.PlanBridge.ofRows(session, queryBox.plan)
    val staged = IceInsertCommand
      .align(snapOpt, q, ident, userCols, byName).localCheckpoint()
    val n = staged.count()
    if (n > 0) t.insert(staged)
    Seq(org.apache.spark.sql.Row(n))
  }
}

object IceInsertCommand {
  /** SQL INSERT column alignment against a table snapshot (shared by the
    * single-statement command and the BEGIN TRANSACTION block): `BY NAME`
    * matching, explicit column lists, positional mapping, canonical-case
    * resolution, and per-column casts to the recorded types — the rules
    * documented on [[IceInsertCommand]]. */
  private[plans] def align(
      snapOpt: Option[graft.ice.IceSnapshot],
      q: org.apache.spark.sql.DataFrame,
      ident: String, userCols: Seq[String],
      byName: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    // canonical-case + type lookup, keyed lowercased: SQL resolves column
    // references case-insensitively, the log schema is exact-case
    val canon: Map[String, (String, org.apache.spark.sql.types.DataType)] =
      snapOpt.map(_.schema.toStructType.fields
        .map(f => f.name.toLowerCase -> (f.name, f.dataType)).toMap)
        .getOrElse(Map.empty)
    val targetCols: Seq[String] =
      if (byName) {
        if (userCols.nonEmpty) throw new UnsupportedOperationException(
          s"INSERT INTO $ident: a column list and BY NAME are mutually exclusive")
        q.columns.toSeq // names canonicalize below
      } else if (userCols.nonEmpty) userCols
      else snapOpt.map(_.schema.pairs.map(_._1).toSeq) match {
        case Some(cols) =>
          // standard SQL: positional mapping must cover every table column
          require(cols.length == q.columns.length,
            s"INSERT INTO $ident: table has ${cols.length} columns " +
              s"(${cols.mkString(", ")}) but the query produces " +
              s"${q.columns.length}; list the target columns explicitly")
          cols
        case None => Seq.empty // empty table: the query's own names seed it
      }
    // standard INSERT coercion: literals arrive at their own types
    // (VALUES 99 is INT); cast each aligned column to the table's
    // recorded type so the union-schema contract (conflict = error)
    // never trips on a representation difference. Unknown names (schema
    // evolution) keep their given case and type.
    if (targetCols.isEmpty) q
    else {
      require(targetCols.length == q.columns.length,
        s"INSERT INTO $ident: ${targetCols.length} target columns but " +
          s"the query produces ${q.columns.length}")
      val canonical = targetCols.map(c => canon.get(c.toLowerCase) match {
        case Some((exact, dt)) => (exact, Some(dt))
        case None => (c, None)
      })
      require(canonical.map(_._1).distinct.length == canonical.length,
        s"INSERT INTO $ident: duplicate target column after " +
          s"case-insensitive resolution: ${canonical.map(_._1).mkString(", ")}")
      q.toDF(canonical.map(_._1): _*)
        .select(canonical.map { case (exact, dtOpt) =>
          dtOpt.fold(col(s"`$exact`"))(dt => col(s"`$exact`").cast(dt).as(exact))
        }: _*)
    }
  }
}

/** `UPDATE graft.<t> SET c = e[, ...] [WHERE ...]` →
  * [[IceTable.updateWhere]]. Returns one row: rows_updated. */
final case class IceUpdateCommand(
    root: String, ident: String,
    sets: Seq[(String, String)], condSql: String,
    branch: String = "")
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AR("rows_updated", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val t = IceSqlResolution.openMutable(session, root, branch)
    // a CoW rewrite keeps each file in its partition directory, so
    // updating a column the partition path encodes — or any column the
    // partition EXPRESSION derives from — would leave the path-derived
    // value (which the catalog relation serves) stale; reject instead of
    // silently diverging. Two key sources: the Hive-style `k=` names
    // observed in alive paths, and the column references of the table's
    // persisted partition expression (which also covers an empty table
    // and non-`k=v` partition schemes — the path-derived set alone is
    // empty/meaningless there).
    // lowercased both sides: Spark resolves column references
    // case-insensitively, so `SET ID = ...` reaches the real `id` column
    // and must hit the guard too
    val pathSegs = t.trySnapshot(Long.MaxValue).toSeq
      .flatMap(_.aliveFiles.map(m => t.partitionOf(m.path)))
      .flatMap(_.split("/").toSeq).filter(_.nonEmpty)
    val pathKeys = pathSegs.filter(_.contains("="))
      .map(_.split("=", 2)(0).toLowerCase).toSet
    val exprKeys =
      try org.apache.spark.sql.graft.PlanBridge
        .eagerExpression(t.cfg.partitionExpr)
        .collect { case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          ua.name.toLowerCase }.toSet
      catch { case _: Exception => Set.empty[String] }
    // a partitionFunc CLOSURE derives the path from columns this command
    // cannot see (the closure isn't persistable; the opened handle holds
    // only its poison stand-in) — the k=v names observed in paths are the
    // ONLY trustworthy key source, so unless every observed segment is
    // k=v-shaped (and at least one file exists to observe), reject every
    // UPDATE rather than risk the silent divergence this guard exists to
    // prevent
    if (t.cfg.partitionFunc.nonEmpty &&
        (pathSegs.isEmpty || !pathSegs.forall(_.contains("="))))
      throw new UnsupportedOperationException(
        s"UPDATE on $ident: the table's partition scheme is derived by a " +
          "closure whose inputs are unknowable here; update through the " +
          "original configured handle (IceTable.updateWhere)")
    val partKeys = pathKeys ++ exprKeys
    sets.map(_._1).find(c => partKeys.contains(c.toLowerCase)).foreach { c =>
      throw new UnsupportedOperationException(
        s"UPDATE of partition-deriving column '$c' on $ident would not move " +
          "rows between partitions; use IceTable.repartitionTable or rewritePartition")
    }
    // bucket columns are placement too (the bkt= level + file tag);
    // the engine-level updateWhere guard would also trip, but failing
    // here names the SQL statement
    val bucketKeys = t.cfg.bucketBy.toSeq.flatMap(_._2).map(_.toLowerCase).toSet
    sets.map(_._1).find(c => bucketKeys.contains(c.toLowerCase)).foreach { c =>
      throw new UnsupportedOperationException(
        s"UPDATE of bucket column '$c' on $ident would strand rows in the " +
          "wrong bucket; DELETE + INSERT the rows instead")
    }
    val n = t.updateWhere(org.apache.spark.sql.functions.expr(condSql),
      sets.map { case (c, e) => c -> org.apache.spark.sql.functions.expr(e) })
    Seq(org.apache.spark.sql.Row(n))
  }
}
