package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.ice.{DeleteVectors, IceTable, IceTableConfig}

/** SQL statements Spark's grammar has no spelling for — table lifecycle
  * and maintenance against the `graft.` catalog — recognized ahead of the
  * stock parser (the standard `injectParser` chain; everything else
  * delegates untouched, so the extension can never change the meaning of
  * a statement Spark already parses):
  *
  * {{{
  *   CREATE TABLE graft.t [PARTITIONED BY (<expr>)] [SORTED BY (c1, ...)]
  *     AS <query>                                -- atomic CTAS: one insert,
  *                                               -- one log commit
  *   CREATE TABLE graft.t (c1 TYPE, ...)         -- EMPTY table, declared
  *     [PARTITIONED BY (<expr>)] [SORTED BY (…)] -- schema: one schema-only
  *                                               -- commit, config persisted
  *   ... [CLUSTERED BY (c1, ...) INTO n BUCKETS] -- hash-bucketed layout on
  *                                               -- either CREATE form:
  *                                               -- co-located joins
  *                                               -- (IceTableConfig.bucketBy)
  *   DROP TABLE [IF EXISTS] graft.t              -- removes data + log
  *   SHOW TABLES IN graft                        -- tables under the warehouse
  *   SHOW CREATE TABLE graft.t                   -- round-trippable DDL + config
  *   DESCRIBE [TABLE] graft.t                    -- union schema + partition cols
  *   DESCRIBE HISTORY graft.t                    -- per-commit deltas
  *   ALTER TABLE graft.t SORTED BY (c1, ...)     -- config-only commit
  *   ALTER TABLE graft.t PARTITIONED BY (<expr>) -- atomic partition evolution
  *   ALTER TABLE graft.t ADD COLUMN[S] (c TYPE, ...) -- union-schema evolution
  *   ALTER TABLE graft.t DROP PARTITIONS WHERE p -- log-only retention drop
  *   ALTER TABLE graft.t CREATE BRANCH b         -- WAP fork (metadata-only)
  *   ALTER TABLE graft.t PUBLISH BRANCH b        -- fast-forward, one commit
  *   ALTER TABLE graft.t DROP BRANCH b           -- release the branch
  *   SHOW BRANCHES IN graft.t                    -- live branch names
  *   RESTORE TABLE graft.t TO TIMESTAMP AS OF t  -- log-only rollback commit
  *   RESTORE TABLE graft.t TO VERSION AS OF v    -- (v = log ts, inclusive —
  *                                               --  the read side's spelling)
  *   ANALYZE TABLE graft.t COMPUTE STATISTICS    -- persisted column stats
  *     [FOR COLUMNS c1, ...] [EXACT]             -- (HLL++ ndv by default)
  *     [WITH HISTOGRAM]                          -- equi-height histograms
  *                                               -- (numeric columns)
  *   OPTIMIZE graft.t                            -- full-table compaction
  *   OPTIMIZE graft.t ZORDER BY (c1, ...)        -- Z-value recluster
  *   VACUUM graft.t [RETAIN <n> HOURS]           -- tombstone cleanup + dv vacuum
  *   CREATE MATERIALIZED VIEW graft.m AS
  *     SELECT g, count(*) AS c, ... FROM graft.t -- incremental MV (MvSync):
  *     [WHERE pred] GROUP BY g                   -- count/sum/min/max/avg/
  *                                               -- count(DISTINCT) outputs,
  *                                               -- aliased expression group
  *                                               -- keys, WHERE pushed into
  *                                               -- every maintenance path
  *   REFRESH MATERIALIZED VIEW graft.m           -- one feed-window advance
  *   REFRESH MATERIALIZED VIEW graft.m FULL      -- generation-collapsing
  *                                               -- rebase (defragmentation)
  *   ALTER MATERIALIZED VIEW graft.m             -- definition evolution:
  *     ADD (sum(x) AS sx, ...)                   -- one base scan seeds the
  *                                               -- new columns' state
  *   DROP MATERIALIZED VIEW graft.m              -- alias of DROP TABLE
  *   BEGIN TRANSACTION;                          -- multi-table atomicity:
  *     INSERT INTO graft.t1 <query>;             -- all inserts stage, ONE
  *     INSERT INTO graft.t2 <query>;             -- marker PUT flips them
  *   COMMIT | ROLLBACK                           -- together (IceTransaction)
  * }}}
  *
  * The reference drives the same lifecycle imperatively (create on first
  * insert, `merge()` / `remove_inactive_parts` crons — icedb/icedb.py:223,
  * 327); here each is one SQL statement routed to the engine's atomic
  * operation, so a SQL-gateway user never needs a JVM handle. The catalog
  * name follows `spark.graft.catalog` (default `graft`), the table root
  * `spark.graft.warehouse` — same contract as [[IceSqlResolution]].
  *
  * Parsing is anchored on the statement keyword AND the catalog prefix:
  * `OPTIMIZE delta_tbl` or `CREATE TABLE hive.t AS ...` fall through to
  * the delegate unchanged.
  */
final class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  private def catalogName: String =
    spark.conf.getOption(IceSqlResolution.CatalogKey).getOrElse("graft")

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraftStatement(sqlText, catalogName, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // `graft.name` or `graft.`name`` — the catalog prefix is spliced in per
  // statement (quotemeta'd); names themselves are re-validated against
  // IceSqlResolution.SafeName at execution, so an identifier can never
  // traverse out of the warehouse
  private def ident = """(?:`([^`]+)`|([A-Za-z0-9_.\-]+))"""
  private def name(m: java.util.regex.Matcher, g: Int): String =
    Option(m.group(g)).getOrElse(m.group(g + 1))

  private def re(pattern: String) =
    java.util.regex.Pattern.compile(
      pattern, java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)

  /** The per-catalog compiled statement patterns — built once and cached
    * (this parser fronts EVERY spark.sql call in the session, including
    * non-graft SQL, so per-parse Pattern.compile would tax the whole
    * workload; the catalog name virtually never changes). */
  private final class Patterns(catalog: String) {
    private val c = java.util.regex.Pattern.quote(catalog)
    val optimizeRe = re(s"""\\s*OPTIMIZE\\s+$c\\.$ident\\s*;?\\s*""")
    val optimizeZRe = re(
      s"""\\s*OPTIMIZE\\s+$c\\.$ident\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)\\s*;?\\s*""")
    val vacuumRe = re(
      s"""\\s*VACUUM\\s+$c\\.$ident(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS?)?\\s*;?\\s*""")
    // DROP MATERIALIZED VIEW is an alias of DROP TABLE: an MV is an ice
    // table whose config word carries the view definition
    val dropRe = re(
      s"""\\s*DROP\\s+(?:TABLE|MATERIALIZED\\s+VIEW)\\s+(IF\\s+EXISTS\\s+)?$c\\.$ident\\s*;?\\s*""")
    val showRe = re(s"""\\s*SHOW\\s+TABLES\\s+(?:IN|FROM)\\s+$c\\s*;?\\s*""")
    val showCreateRe = re(s"""\\s*SHOW\\s+CREATE\\s+TABLE\\s+$c\\.$ident\\s*;?\\s*""")
    // only the statement head is regex-matched; the PARTITIONED BY /
    // SORTED BY parenthesized bodies are scanned with a quote-aware
    // balanced-paren walk (a partition expression like
    // `concat('u=', pmod(user_id, 8))` nests arbitrarily)
    val ctasHeadRe = re(s"""\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$c\\.$ident.*""")
    val ctasNameRe = re(s"""\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$c\\.$ident""")
    val histRe = re(s"""\\s*(?:DESCRIBE|DESC)\\s+HISTORY\\s+$c\\.$ident\\s*;?\\s*""")
    val descRe = re(s"""\\s*(?:DESCRIBE|DESC)\\s+(?:TABLE\\s+)?$c\\.$ident\\s*;?\\s*""")
    val alterHeadRe = re(
      s"""\\s*ALTER\\s+TABLE\\s+$c\\.$ident\\s+(SORTED|PARTITIONED)\\s+BY\\s*\\(.*""")
    val alterAddRe = re(
      s"""\\s*ALTER\\s+TABLE\\s+$c\\.$ident\\s+ADD\\s+COLUMNS?\\s+(.+?)\\s*;?\\s*""")
    // RESTORE accepts the engine's native integral epoch-millis spelling;
    // TIMESTAMP and VERSION are synonyms here exactly as on the read side
    // (IceSqlResolution: VERSION AS OF v treats v as a log ts, inclusive)
    val restoreRe = re(
      s"""\\s*RESTORE\\s+TABLE\\s+$c\\.$ident\\s+TO\\s+(?:TIMESTAMP|VERSION)\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""")
    // ANALYZE TABLE (Spark's own spelling + a non-standard EXACT suffix
    // for small tables / grading; default ndv is HLL++, the 100 TB path)
    val analyzeRe = re(
      s"""\\s*ANALYZE\\s+TABLE\\s+$c\\.$ident\\s+COMPUTE\\s+STATISTICS(?:\\s+FOR\\s+COLUMNS\\s+([^;]+?))?(\\s+EXACT)?(\\s+WITH\\s+HISTOGRAM)?\\s*;?\\s*""")
    // WAP branches (Iceberg's ALTER TABLE spellings): see graft.ice.Branch
    val branchRe = re(
      s"""\\s*ALTER\\s+TABLE\\s+$c\\.$ident\\s+(CREATE|PUBLISH|DROP)\\s+BRANCH\\s+([A-Za-z0-9_-]+)\\s*;?\\s*""")
    // SQL-defined incremental materialized views (graft.operators.MvSync)
    val createMvRe = re(
      s"""\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$c\\.$ident\\s+AS\\s+(.+?)\\s*;?\\s*""")
    // REFRESH … advances one feed window; REFRESH … FULL runs the
    // generation-collapsing rebase (MvSync.rebase) — the SQL spelling of
    // the view's defragmentation hygiene loop
    val refreshMvRe = re(
      s"""\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+$c\\.$ident(\\s+FULL)?\\s*;?\\s*""")
    // MV definition evolution: ALTER MATERIALIZED VIEW m ADD (sum(x) AS
    // sx, …) — one base scan seeds the widened state (a rebase under the
    // NEW spec), then the definition persists; the view stays readable
    // under the OLD definition throughout
    val alterMvRe = re(
      s"""\\s*ALTER\\s+MATERIALIZED\\s+VIEW\\s+$c\\.$ident\\s+ADD\\s+\\((.+)\\)\\s*;?\\s*""")
    // the symmetric evolution: ALTER MATERIALIZED VIEW m DROP (alias, …)
    // — pure definition narrowing (a projection), no reseed, no outage
    val alterMvDropRe = re(
      s"""\\s*ALTER\\s+MATERIALIZED\\s+VIEW\\s+$c\\.$ident\\s+DROP\\s+\\(([^)]+)\\)\\s*;?\\s*""")
    // CHECK constraints (Delta's ALTER TABLE spellings): the predicate
    // body is a balanced-paren walk like partition expressions
    val constraintAddRe = re(
      s"""\\s*ALTER\\s+TABLE\\s+$c\\.$ident\\s+ADD\\s+CONSTRAINT\\s+([A-Za-z0-9_]+)\\s+CHECK\\s*\\(.*""")
    val constraintDropRe = re(
      s"""\\s*ALTER\\s+TABLE\\s+$c\\.$ident\\s+DROP\\s+CONSTRAINT\\s+([A-Za-z0-9_]+)\\s*;?\\s*""")
    // log-only retention: drop whole partitions by predicate over the
    // path-derived partition columns (IceTable.dropPartitionsWhere)
    val dropPartsRe = re(
      s"""\\s*ALTER\\s+TABLE\\s+$c\\.$ident\\s+DROP\\s+PARTITIONS\\s+WHERE\\s+(.+?)\\s*;?\\s*""")
    val showBranchesRe = re(
      s"""\\s*SHOW\\s+BRANCHES\\s+(?:IN|FROM)\\s+$c\\.$ident\\s*;?\\s*""")
    // multi-table transactions at the SQL boundary (IceTransaction):
    // BEGIN TRANSACTION; INSERT INTO graft.t …; …; COMMIT | ROLLBACK —
    // only the head is regexed; the block body splits on top-level `;`
    // and each inner statement parses through the delegate's own grammar
    val txnHeadRe = re(s"""\\s*BEGIN\\s+TRANSACTION\\s*;.*""")
  }

  private val compiledPatterns =
    new java.util.concurrent.ConcurrentHashMap[String, Patterns]()
  private def patternsFor(catalog: String): Patterns =
    compiledPatterns.computeIfAbsent(catalog, new Patterns(_))

  /** Recognize one of the graft statements; None = not ours. */
  private[plans] def parseGraftStatement(
      rawSql: String, catalog: String,
      delegate: ParserInterface): Option[LogicalPlan] = {
    // Strip `-- …` line comments (outside string literals) before
    // recognition: SHOW CREATE TABLE renders non-DDL config as trailing
    // `-- config:` lines, and its round-trip contract is that the
    // emitted statement re-executes. Comments are semantically void, so
    // dropping them from the CTAS query tail is harmless too; the
    // delegate still receives the ORIGINAL text when we return None.
    val sqlText =
      if (rawSql.contains("--")) stripLineComments(rawSql) else rawSql
    val p = patternsFor(catalog)
    import p._

    val om = optimizeRe.matcher(sqlText)
    if (om.matches()) return Some(GraftOptimizeCommand(name(om, 1)))

    val ozm = optimizeZRe.matcher(sqlText)
    if (ozm.matches())
      return Some(GraftOptimizeZOrderCommand(name(ozm, 1),
        ozm.group(3).split(",").toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)))

    val hm = histRe.matcher(sqlText)
    if (hm.matches()) return Some(GraftDescribeHistoryCommand(name(hm, 1)))

    val rm = restoreRe.matcher(sqlText)
    if (rm.matches())
      // inclusive at ms granularity ⇒ +1 against the strict-< fold, the
      // read side's evalMaxTs convention
      return Some(GraftRestoreCommand(name(rm, 1), rm.group(3).toLong + 1L))

    val anm = analyzeRe.matcher(sqlText)
    if (anm.matches()) {
      // ambiguity guard: for `FOR COLUMNS k, exact` the lazy cols group
      // backtracks to "k," and the EXACT flag eats the trailing column —
      // a comma-terminated cols group means EXACT was really a column
      var colsRaw = Option(anm.group(3))
      var exact = anm.group(4) != null
      if (exact && colsRaw.exists(_.trim.endsWith(","))) {
        colsRaw = colsRaw.map(_ + " exact")
        exact = false
      }
      val cols = colsRaw.toSeq.flatMap(_.split(",").toSeq)
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      return Some(GraftAnalyzeCommand(name(anm, 1), cols, exact,
        histogram = anm.group(5) != null))
    }

    // BEGIN TRANSACTION; INSERT INTO graft.t1 …; INSERT INTO graft.t2 …;
    // COMMIT — every staged insert becomes visible through ONE marker PUT
    // (IceTransaction), so a SQL gateway gets cross-table atomicity (the
    // reference's MV double-write pattern, examples/materialized-view.py:
    // 91-98, done atomically). ROLLBACK stages then discards: nothing
    // ever surfaces.
    if (txnHeadRe.matcher(sqlText).matches())
      return Some(parseTxnBlock(sqlText, catalog, delegate))

    val brm = branchRe.matcher(sqlText)
    if (brm.matches())
      return Some(GraftBranchCommand(name(brm, 1),
        brm.group(3).toUpperCase, brm.group(4)))

    val sbm = showBranchesRe.matcher(sqlText)
    if (sbm.matches()) return Some(GraftShowBranchesCommand(name(sbm, 1)))

    // CREATE MATERIALIZED VIEW graft.m AS SELECT … FROM graft.t GROUP BY …
    // | REFRESH MATERIALIZED VIEW graft.m — incremental maintenance
    // (MvSync): the definition is validated and compiled AT PARSE TIME
    // into a persisted view spec
    val mvm = createMvRe.matcher(sqlText)
    if (mvm.matches())
      return Some(GraftCreateMvCommand(name(mvm, 2), mvm.group(1) != null,
        extractMvDef(mvm.group(4), catalog, delegate)))
    val rfm = refreshMvRe.matcher(sqlText)
    if (rfm.matches())
      return Some(GraftRefreshMvCommand(name(rfm, 1), full = rfm.group(3) != null))
    val amv = alterMvRe.matcher(sqlText)
    if (amv.matches())
      return Some(GraftAlterMvAddCommand(name(amv, 1),
        parseMvAddList(amv.group(3), delegate)))
    val amvd = alterMvDropRe.matcher(sqlText)
    if (amvd.matches())
      return Some(GraftAlterMvDropCommand(name(amvd, 1),
        amvd.group(3).split(",").toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)))

    // ALTER TABLE graft.t ADD CONSTRAINT n CHECK (pred) | DROP CONSTRAINT n
    val cam = constraintAddRe.matcher(sqlText)
    if (cam.matches()) {
      val open = sqlText.indexOf('(', cam.end(3))
      val body = balancedParen(sqlText, open) match {
        case Some((inner, after))
            if sqlText.substring(after).trim.stripSuffix(";").trim.isEmpty =>
          inner.trim
        case _ => throw new UnsupportedOperationException(
          "ALTER TABLE … ADD CONSTRAINT requires one balanced " +
            "parenthesized CHECK predicate and nothing after it")
      }
      return Some(GraftAddConstraintCommand(name(cam, 1), cam.group(3), body))
    }
    val cdm = constraintDropRe.matcher(sqlText)
    if (cdm.matches())
      return Some(GraftDropConstraintCommand(name(cdm, 1), cdm.group(3)))

    // ALTER TABLE graft.t DROP PARTITIONS WHERE <pred> — log-only retention
    val dpm = dropPartsRe.matcher(sqlText)
    if (dpm.matches())
      return Some(GraftDropPartitionsCommand(name(dpm, 1), dpm.group(3).trim))

    // ALTER TABLE graft.t ADD COLUMN[S] (c TYPE, ...) | c TYPE — the
    // column list parses through the delegate's own schema grammar
    val aam = alterAddRe.matcher(sqlText)
    if (aam.matches()) {
      val body0 = aam.group(3).trim
      val body =
        if (body0.startsWith("(")) balancedParen(body0, 0) match {
          case Some((inner, after)) if body0.substring(after).trim.isEmpty => inner
          case _ => throw new UnsupportedOperationException(
            "ALTER TABLE … ADD COLUMNS requires one balanced parenthesized " +
              "column list and nothing after it")
        }
        else body0
      val st = delegate.parseTableSchema(body)
      return Some(GraftAlterAddColumnsCommand(name(aam, 1),
        st.fields.toSeq.map(f =>
          f.name -> graft.ice.SchemaTypes.toTypeString(f.dataType))))
    }

    // ALTER TABLE graft.t SORTED BY (cols) | PARTITIONED BY (expr) —
    // same balanced-paren walk as CTAS (partition exprs nest)
    val am = alterHeadRe.matcher(sqlText)
    if (am.matches()) {
      val tableName = name(am, 1)
      val kind = am.group(3).toUpperCase
      val open = sqlText.indexOf('(', am.end(3))
      val body = balancedParen(sqlText, open) match {
        case Some((inner, after)) if sqlText.substring(after).trim.stripSuffix(";").trim.isEmpty =>
          inner.trim
        case _ => throw new UnsupportedOperationException(
          s"ALTER TABLE $catalog.$tableName $kind BY requires one " +
            "balanced parenthesized clause and nothing after it")
      }
      return Some(
        if (kind == "SORTED")
          GraftAlterSortCommand(tableName,
            body.split(",").toSeq.map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty))
        else GraftAlterPartitionCommand(tableName, body))
    }

    val dsm = descRe.matcher(sqlText)
    if (dsm.matches()) return Some(GraftDescribeTableCommand(name(dsm, 1)))

    val vm = vacuumRe.matcher(sqlText)
    if (vm.matches()) {
      val retainMs = Option(vm.group(3)).map(_.toLong * 3600_000L)
      return Some(GraftVacuumCommand(name(vm, 1), retainMs))
    }

    val dm = dropRe.matcher(sqlText)
    if (dm.matches())
      return Some(GraftDropTableCommand(name(dm, 2), ifExists = dm.group(1) != null))

    if (showRe.matcher(sqlText).matches()) return Some(GraftShowTablesCommand())

    val scm = showCreateRe.matcher(sqlText)
    if (scm.matches()) return Some(GraftShowCreateTableCommand(name(scm, 1)))

    val cm = ctasHeadRe.matcher(sqlText)
    if (cm.matches()) {
      // walk the clauses after the table name
      val headEnd = {
        val h = ctasNameRe.matcher(sqlText)
        h.lookingAt(); h.end()
      }
      var pos = headEnd
      def skipWs(): Unit = while (pos < sqlText.length && sqlText.charAt(pos).isWhitespace) pos += 1
      def takeKeyword(words: String*): Boolean = {
        val save = pos
        for (w <- words) {
          skipWs()
          if (!sqlText.regionMatches(true, pos, w, 0, w.length) ||
            (pos + w.length < sqlText.length &&
              Character.isLetterOrDigit(sqlText.charAt(pos + w.length)))) {
            pos = save; return false
          }
          pos += w.length
        }
        true
      }
      def takeParenBody(): Option[String] = {
        skipWs()
        if (pos >= sqlText.length || sqlText.charAt(pos) != '(') None
        else balancedParen(sqlText, pos).map { case (inner, after) =>
          pos = after; inner
        }
      }
      // optional DECLARED column list — immediately after the name, like
      // standard DDL: `CREATE TABLE graft.t (a BIGINT, b VARCHAR) ...`
      val colListSql = takeParenBody().map(_.trim).filter(_.nonEmpty)
      // the optional clauses accept any order
      var partitionExprSql: Option[String] = None
      var sortCols: Seq[String] = Seq.empty
      var bucketBy: Option[(Int, Seq[String])] = None
      var progressed = true
      while (progressed) {
        progressed = false
        if (partitionExprSql.isEmpty && takeKeyword("PARTITIONED", "BY")) {
          partitionExprSql = takeParenBody().map(_.trim).filter(_.nonEmpty)
          progressed = true
        } else if (sortCols.isEmpty && takeKeyword("SORTED", "BY")) {
          sortCols = takeParenBody().toSeq.flatMap(_.split(",").toSeq)
            .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
          progressed = true
        } else if (bucketBy.isEmpty && takeKeyword("CLUSTERED", "BY")) {
          // Spark's own bucketing DDL: CLUSTERED BY (cols) INTO n BUCKETS
          // → IceTableConfig.bucketBy (co-located joins, see IceTable)
          val bCols = takeParenBody().toSeq.flatMap(_.split(",").toSeq)
            .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
          def bad() = throw new UnsupportedOperationException(
            s"CREATE TABLE $catalog.<t>: CLUSTERED BY requires " +
              "`(col, ...) INTO <n> BUCKETS`")
          if (bCols.isEmpty || !takeKeyword("INTO")) bad()
          skipWs()
          val numStart = pos
          while (pos < sqlText.length && sqlText.charAt(pos).isDigit) pos += 1
          val num = sqlText.substring(numStart, pos)
          if (num.isEmpty || !takeKeyword("BUCKETS")) bad()
          // 0 buckets would route every row to pmod(h, 0) = null; an
          // absurd count is a typo, not a layout
          val n = num.toLongOption.filter(v => v >= 1L && v <= (1L << 20))
            .getOrElse(throw new UnsupportedOperationException(
              s"CREATE TABLE $catalog.<t>: bucket count must be in " +
                s"[1, ${1 << 20}], got '$num'"))
          bucketBy = Some((n.toInt, bCols))
          progressed = true
        }
      }
      if (takeKeyword("AS")) {
        if (colListSql.isDefined) throw new UnsupportedOperationException(
          s"CREATE TABLE $catalog.<t>: CTAS derives its schema from the " +
            "query — drop the declared column list or the AS clause")
        val query = sqlText.substring(pos).trim
        if (query.nonEmpty)
          return Some(GraftCreateTableAsCommand(
            name(cm, 2),
            ifNotExists = cm.group(1) != null,
            partitionExprSql = partitionExprSql,
            sortCols = sortCols,
            bucketBy = bucketBy,
            new PlanBox(delegate.parsePlan(query))))
      }
      colListSql.foreach { cols =>
        if (sqlText.substring(pos).trim.stripSuffix(";").trim.isEmpty) {
          val st = delegate.parseTableSchema(cols)
          return Some(GraftCreateTableCommand(
            name(cm, 2),
            ifNotExists = cm.group(1) != null,
            partitionExprSql = partitionExprSql,
            sortCols = sortCols,
            bucketBy = bucketBy,
            st.fields.toSeq.map(f =>
              f.name -> graft.ice.SchemaTypes.toTypeString(f.dataType))))
        }
      }
      throw new UnsupportedOperationException(
        s"CREATE TABLE $catalog.<t> needs either AS <query> (CTAS) or a " +
          "declared column list `(name TYPE, ...)` for an empty table")
    }

    None
  }

  /** `-- …`-to-end-of-line removal, quote-aware for all three SQL quote
    * characters (`'a--b'`, `"a--b"` string literals and `` `a--b` ``
    * identifiers keep their dashes; doubled-quote escapes pass through
    * as two toggles, harmlessly) AND bracketed-comment-aware: `--`
    * inside a slash-star block comment stays put (Spark block comments
    * NEST, so a depth counter, not a flag), else a "see -- ticket"
    * note inside a block comment would truncate mid-comment and leave
    * the comment unterminated. That matters because embedded query
    * text (CTAS bodies, ADD COLUMNS lists) is substring'd from THIS
    * stripped copy before it reaches the delegate parser. */
  private def stripLineComments(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var quote: Char = 0
    var block = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != 0) {
        if (ch == quote) quote = 0
        sb.append(ch); i += 1
      } else if (block > 0) {
        if (ch == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          block -= 1; sb.append("*/"); i += 2
        } else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
          block += 1; sb.append("/*"); i += 2
        } else { sb.append(ch); i += 1 }
      } else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        block = 1; sb.append("/*"); i += 2
      } else if (ch == '\'' || ch == '"' || ch == '`') {
        quote = ch; sb.append(ch); i += 1
      } else if (ch == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** Split on top-level `;` only — semicolons inside `'…'` / `"…"`
    * string literals, `` `…` `` quoted identifiers (doubled quotes pass
    * through as two toggles, harmlessly), and (nested) slash-star block
    * comments stay put. Line comments are already stripped before
    * recognition. */
  private def splitStatements(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var quote: Char = 0
    var block = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != 0) {
        // Spark's default string grammar accepts backslash escapes —
        // \' inside '…' must not close the literal (backticked
        // identifiers have no backslash escapes)
        if (ch == '\\' && quote != '`' && i + 1 < s.length) {
          sb.append(ch).append(s.charAt(i + 1)); i += 2
        } else { if (ch == quote) quote = 0; sb.append(ch); i += 1 }
      }
      else if (block > 0) {
        if (ch == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          block -= 1; sb.append("*/"); i += 2
        } else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
          block += 1; sb.append("/*"); i += 2
        } else { sb.append(ch); i += 1 }
      }
      else if (ch == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        block = 1; sb.append("/*"); i += 2
      }
      else if (ch == '\'' || ch == '"' || ch == '`') {
        quote = ch; sb.append(ch); i += 1
      }
      else if (ch == ';') { out += sb.toString; sb.clear(); i += 1 }
      else { sb.append(ch); i += 1 }
    }
    out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Compile a `BEGIN TRANSACTION; …; COMMIT|ROLLBACK` block: every
    * inner statement must be an `INSERT INTO <catalog>.<t>` (the
    * multi-table ingest shape [[graft.ice.IceTransaction]] supports —
    * mutations stay single-table atomic via their own validated
    * commits), parsed through the DELEGATE's own INSERT grammar so
    * column lists / BY NAME / VALUES all behave exactly like the
    * standalone statement. Fails at parse time with a reason: the head
    * keyword pair is unambiguous (Spark has no BEGIN TRANSACTION), so
    * falling through to the delegate would only trade a clear error for
    * an opaque one. */
  private def parseTxnBlock(sqlText: String, catalog: String,
      delegate: ParserInterface): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
    def fail(msg: String): Nothing = throw new UnsupportedOperationException(
      s"BEGIN TRANSACTION block: $msg (supported shape: BEGIN TRANSACTION; " +
        s"INSERT INTO $catalog.<t> <query>; …; COMMIT | ROLLBACK)")
    val stmts = splitStatements(sqlText)
    if (stmts.length < 3) fail("needs at least one INSERT and a terminator")
    val rollback = stmts.last.toUpperCase match {
      case "COMMIT" => false
      case "ROLLBACK" => true
      case other => fail(s"must end with COMMIT or ROLLBACK, got '$other'")
    }
    val inserts = stmts.slice(1, stmts.length - 1).map { s =>
      delegate.parsePlan(s) match {
        case InsertIntoStatement(rel: UnresolvedRelation, partSpec, userCols,
            query, overwrite, _, byName) =>
          rel.multipartIdentifier match {
            case Seq(cat, t) if cat.equalsIgnoreCase(catalog) =>
              if (overwrite) fail(s"INSERT OVERWRITE $catalog.$t is not " +
                "supported inside a transaction")
              if (partSpec.nonEmpty) fail(s"INSERT INTO $catalog.$t " +
                "PARTITION (...) is not supported — the table's partition " +
                "expression routes rows itself")
              (t, userCols, byName, new PlanBox(query))
            case other => fail(s"every statement must target the $catalog " +
              s"catalog, got ${other.mkString(".")}")
          }
        case _ => fail(s"unsupported statement '${s.take(60)}…' — only " +
          "INSERT INTO is transactional across tables")
      }
    }
    GraftTransactionCommand(inserts, rollback)
  }

  /** `s(start)` must be `'('`; returns (inner text, index after the
    * matching close paren), skipping parens inside single-quoted SQL
    * strings (with `''` escapes passing through harmlessly). */
  private def balancedParen(s: String, start: Int): Option[(String, Int)] = {
    var depth = 0
    var i = start
    var inQuote = false
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQuote) { if (ch == '\'') inQuote = false }
      else ch match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some((s.substring(start + 1, i), i + 1))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Resolve `<warehouse>/<name>` for a DDL command at EXECUTION time
    * (`requireLog` = the table must already exist). */
  private def rootFor(
      session: SparkSession, name: String, requireLog: Boolean): Option[String] = {
    val w = session.conf.getOption(IceSqlResolution.WarehouseKey).filter(_.nonEmpty)
      .getOrElse(throw new IllegalStateException(
        s"set ${IceSqlResolution.WarehouseKey} to use graft DDL statements"))
    if (!IceSqlResolution.safeName(name))
      throw new IllegalArgumentException(s"unsafe graft table name: '$name'")
    val (root, exists) = IceSqlResolution.probeRootAt(session, w, name)
    if (requireLog && !exists) None else Some(root)
  }

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference => AR}
  import org.apache.spark.sql.execution.command.LeafRunnableCommand
  import org.apache.spark.sql.types.{LongType, StringType}

  /** `CREATE TABLE graft.<t> [PARTITIONED BY (expr)] [SORTED BY (cols)]
    * AS <query>` → one [[IceTable.insert]]: the data job and the schema
    * seed land in ONE atomic log commit (a crash mid-CTAS publishes
    * nothing), and the partition/sort config persists in that commit's
    * metadata so every later handle — SQL or API — routes identically. */
  /** Compile the CREATE MATERIALIZED VIEW query into a persistable view
    * definition: `SELECT <group cols/exprs + aliased aggregates> FROM
    * <catalog>.<table> [WHERE <pred>] GROUP BY <cols or exprs>` with
    * count(*) / sum / min / max / avg / count(distinct) outputs — the
    * shapes [[graft.operators.MvSync]] maintains incrementally. A GROUP
    * BY expression must appear ALIASED in the SELECT list (the alias
    * names the stored derived column). Anything else fails AT PARSE TIME
    * with a reason. */
  /** Compile one aliased aggregate call into an [[MvOutput]] — shared by
    * the CREATE MATERIALIZED VIEW SELECT-list compiler and ALTER
    * MATERIALIZED VIEW … ADD. count(DISTINCT c) maintains as mergeable
    * HLL sketch state (partial = hll_sketch_agg per window, fold =
    * hll_union_agg; retraction by the min/max reset rule); other
    * DISTINCT aggregates have no mergeable partial form. */
  private def mvAggOutput(
      f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction,
      aliasName: String,
      fail: String => Nothing): graft.operators.MvSync.MvOutput = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.operators.MvSync.MvOutput
    if (f.isDistinct) {
      if (f.nameParts.last.toLowerCase != "count")
        fail("only count(DISTINCT col) is incrementally " +
          "maintainable (as HLL sketch state)")
      f.arguments match {
        case Seq(a: UnresolvedAttribute) => MvOutput(aliasName, "dcnt", a.name)
        case _ => fail("count(DISTINCT …) must take exactly one " +
          "plain column")
      }
    } else {
      val kind = f.nameParts.last.toLowerCase match {
        case "count" => "cnt"
        case "sum" => "sum"
        case "min" => "min"
        case "max" => "max"
        case "avg" | "mean" => "avg"
        // the honest ANSI spelling of what the engine serves:
        // count(DISTINCT c) and approx_count_distinct(c) both
        // maintain the same HLL sketch state
        case "approx_count_distinct" => "dcnt"
        // billing-grade EXACT distinct: maintained as a per-(group,
        // value) count side view (exact, retractable, exportable) —
        // heavier than the HLL spelling, which is why it is opt-in
        case "exact_count_distinct" => "xdcnt"
        case other => fail(s"unsupported aggregate `$other`")
      }
      val colName =
        if (kind == "cnt") f.arguments match {
          case Seq(_: UnresolvedStar) => ""
          case Seq(Literal(_, _)) => ""
          case _ => fail("count must be count(*) or count(1)")
        }
        else f.arguments match {
          case Seq(a: UnresolvedAttribute) => a.name
          case _ => fail(
            s"${f.nameParts.last} must take exactly one plain column")
        }
      MvOutput(aliasName, kind, colName)
    }
  }

  /** Compile `ALTER MATERIALIZED VIEW … ADD (agg AS alias, …)`'s
    * parenthesized list through the delegate's own SELECT grammar. */
  private def parseMvAddList(body: String,
      delegate: ParserInterface): Seq[graft.operators.MvSync.MvOutput] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    def fail(msg: String): Nothing = throw new UnsupportedOperationException(
      "ALTER MATERIALIZED VIEW … ADD takes a parenthesized list of " +
        "aliased aggregates — count(*) / sum / min / max / avg / " +
        s"count(distinct) / approx_count_distinct, each AS <alias>; $msg")
    val plan =
      try delegate.parsePlan(s"SELECT $body FROM __mv_alter__")
      catch { case e: Exception => fail(
        s"the list does not parse: ${String.valueOf(e.getMessage).take(160)}") }
    plan match {
      case Project(items, _) if items.nonEmpty => items.map {
        case Alias(f: UnresolvedFunction, aliasName) =>
          mvAggOutput(f, aliasName, fail)
        case other => fail(s"unsupported output expression ${other.sql} — " +
          "alias every aggregate (… AS name)")
      }
      case _ => fail("expected a plain aggregate list")
    }
  }

  private def extractMvDef(query: String, catalog: String,
      delegate: ParserInterface): graft.operators.MvSync.MvViewDef = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, SubqueryAlias}
    import graft.operators.MvSync.{MvJoinDim, MvOutput, MvViewDef}
    def fail(msg: String): Nothing = throw new UnsupportedOperationException(
      "CREATE MATERIALIZED VIEW supports a single-table (or fact INNER/" +
        "LEFT JOIN dim(s)) [WHERE +] [GROUP BY] [+ HAVING] with count(*) / " +
        "sum / min / max / avg / count(distinct) / approx_count_distinct " +
        "outputs (the distinct aggregates maintain as HLL sketch state — " +
        s"reads are estimates, ±~2% past the sparse regime); $msg")
    // one side of a join: a bare catalog relation, optionally aliased —
    // returns (table, alias-or-table-name)
    def relOf(p: LogicalPlan): (String, String) =
      p match {
        case u: UnresolvedRelation => u.multipartIdentifier match {
          case Seq(cat, t) if cat.equalsIgnoreCase(catalog) => (t, t)
          case other => fail(
            s"join sides must reference $catalog.<table>, got ${other.mkString(".")}")
        }
        case SubqueryAlias(id, child) => (relOf(child)._1, id.name)
        case other => fail(
          s"join sides must be bare table references, got ${other.nodeName}")
      }
    // (fact table, fact alias, WHERE predicate SQL, dims in join order) —
    // the filter sits between the Aggregate and the relation/joins; its
    // raw SQL re-resolves inside MvSpec.prepare on every maintenance
    // path. Joins are LEFT-DEEP: the deepest left leaf is the maintained
    // (feed-driven) fact; every right side is a dimension, joined as a
    // pinned snapshot, each version-tracked independently (a later ON
    // may reference any earlier alias — prepare folds joins in the same
    // order)
    def sourceOf(p: LogicalPlan)
        : (String, String, Option[String], Seq[MvJoinDim]) =
      p match {
        case u: UnresolvedRelation => u.multipartIdentifier match {
          case Seq(cat, t) if cat.equalsIgnoreCase(catalog) => (t, t, None, Nil)
          case other => fail(
            s"FROM must reference $catalog.<table>, got ${other.mkString(".")}")
        }
        case Filter(cond, child) =>
          val (t, fa, inner, js) = sourceOf(child)
          if (inner.nonEmpty) fail("at most one WHERE clause is supported")
          (t, fa, Some(cond.sql), js)
        case Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _) =>
          val (ft, fa, whereSql, js) = sourceOf(l)
          if (whereSql.nonEmpty) fail("WHERE must follow every JOIN")
          val (dt, da) = relOf(r)
          val taken = fa +: js.map(_.dimAlias)
          if (taken.exists(_.equalsIgnoreCase(da)))
            fail(s"join alias `$da` is already taken — alias the sides apart")
          val joinType = if (jt == Inner) "inner" else "left"
          (ft, fa, None, js :+ MvJoinDim(dt, fa, da, cond.sql, joinType))
        case Join(_, _, Inner | LeftOuter, None, _) =>
          fail("the join needs an ON condition")
        case Join(_, _, other, _, _) =>
          fail(s"only INNER or LEFT [OUTER] JOIN ... ON is maintainable " +
            s"(the fact side must be the maintained side), got $other")
        case SubqueryAlias(id, u: UnresolvedRelation) =>
          (relOf(u)._1, id.name, None, Nil)
        case SubqueryAlias(_, child) => sourceOf(child)
        case other => fail(s"FROM must be a bare table reference, got ${other.nodeName}")
      }
    // HAVING compiles to a READ-SIDE filter over the view's output
    // aliases (maintenance is unchanged): aggregate calls that match an
    // output's (kind, column) rewrite to the output alias; whatever
    // remains must reference only group columns or aliases
    def havingOf(cond: Expression, outputs: Seq[MvOutput],
        gcols: Seq[String]): String = {
      def outFor(f: UnresolvedFunction): Option[MvOutput] = {
        val kind = f.nameParts.last.toLowerCase match {
          case "count" if f.isDistinct => "dcnt"
          case "approx_count_distinct" => "dcnt"
          case "exact_count_distinct" => "xdcnt"
          case "count" => "cnt"
          case "sum" => "sum"
          case "min" => "min"
          case "max" => "max"
          case "avg" | "mean" => "avg"
          case _ => return None
        }
        val colName = f.arguments match {
          case Seq(_: UnresolvedStar) => ""
          case Seq(Literal(_, _)) => ""
          case Seq(a: UnresolvedAttribute) => a.name
          case _ => return None
        }
        outputs.find(o => o.kind == kind && o.col == colName)
      }
      val rewritten = cond.transform {
        case f: UnresolvedFunction =>
          outFor(f).map(o => UnresolvedAttribute(Seq(o.alias)): Expression)
            .getOrElse(fail(
              s"HAVING references aggregate `${f.sql}` that is not in " +
                "the SELECT list — alias it there and reference the alias"))
      }
      val allowed = (gcols ++ outputs.map(_.alias)).map(_.toLowerCase).toSet
      rewritten.collect { case a: UnresolvedAttribute => a }.foreach { a =>
        if (a.nameParts.length != 1 || !allowed(a.name.toLowerCase))
          fail(s"HAVING may reference only group columns and SELECT " +
            s"aliases, got `${a.sql}` — or apply the predicate as a " +
            "read-side WHERE over the view instead")
      }
      rewritten.sql
    }
    val (groups0, aggs0, child0, havingCond):
        (Seq[Expression], Seq[NamedExpression], LogicalPlan, Option[Expression]) =
      delegate.parsePlan(query) match {
        case UnresolvedHaving(cond, Aggregate(groups, aggs, child, _)) =>
          (groups, aggs, child, Some(cond))
        case Aggregate(groups, aggs, child, _) => (groups, aggs, child, None)
        // a GLOBAL aggregate (`SELECT count(*) FROM t`, no GROUP BY)
        // parses as a bare Project whose outputs are function calls —
        // maintained under a constant synthetic key (MvSync.GlobalKey)
        case Project(projList, child) if projList.exists {
              case Alias(_: UnresolvedFunction, _) => true
              case _: UnresolvedFunction => true
              case _ => false } =>
          (Nil, projList, child, None)
        case other => fail(
          s"the query must be exactly SELECT … FROM … [WHERE …] [GROUP BY …] [HAVING …], got ${other.nodeName}")
      }
    (groups0, aggs0, child0, havingCond) match {
      case (groups, aggs, child, having) =>
        val (src, _, whereSql, dimJoins) = sourceOf(child)
        // expression group keys: a non-attribute GROUP BY entry must
        // appear ALIASED in the SELECT list with the same expression
        // text; the alias becomes the stored derived column's name
        def aliasFor(e: Expression): String =
          aggs.collectFirst {
            case Alias(ae, name) if ae.sql == e.sql => name
          }.getOrElse(fail(
            s"GROUP BY expression ${e.sql} must appear aliased in the " +
              "SELECT list (e.g. SELECT <expr> AS k … GROUP BY <expr>)"))
        val gcolsAndExprs = groups.map {
          // a QUALIFIED attribute (d.cat in a join view) is an
          // expression key: the stored column needs an unqualified
          // name, so it must appear aliased in the SELECT list
          case a: UnresolvedAttribute if a.nameParts.length == 1 =>
            (a.name, None)
          case _: Literal => fail("GROUP BY ordinals are not supported — " +
            "repeat the expression or name the column")
          case e => (aliasFor(e), Some(e.sql))
        }
        val gcols = gcolsAndExprs.map(_._1)
        val gexprs = gcolsAndExprs.collect { case (n, Some(s)) => (n, s) }
        val gexprAliases = gexprs.map(_._1).toSet
        val outputs = aggs.flatMap {
          // an aliased copy of a GROUP BY expression passes through as
          // the derived group column itself
          case Alias(ae, name) if gexprAliases.contains(name) &&
              gexprs.exists { case (n, s) => n == name && s == ae.sql } =>
            None
          case a: UnresolvedAttribute =>
            if (!gcols.exists(_.equalsIgnoreCase(a.name)))
              fail(s"non-aggregate output `${a.name}` is not in GROUP BY")
            None // group columns pass through under their own names
          case Alias(f: UnresolvedFunction, aliasName) =>
            Some(mvAggOutput(f, aliasName, fail))
          case _: UnresolvedFunction =>
            fail("alias every aggregate output (… AS name)")
          case other => fail(s"unsupported output expression $other")
        }
        if (outputs.isEmpty) fail("at least one aggregate output is required")
        val havingSql = having.map(h => havingOf(h, outputs, gcols))
        MvViewDef(src, gcols, outputs, whereSql, gexprs, dimJoins,
          havingSql)
    }
  }

  final case class GraftCreateTableAsCommand(
      name: String, ifNotExists: Boolean,
      partitionExprSql: Option[String], sortCols: Seq[String],
      bucketBy: Option[(Int, Seq[String])],
      queryBox: PlanBox) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("rows_inserted", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      if (rootFor(session, name, requireLog = true).isDefined) {
        if (ifNotExists) return Seq(Row(0L))
        throw new IllegalStateException(
          s"graft table '$name' already exists; DROP TABLE it first " +
            "(CTAS never overwrites an MVCC table)")
      }
      val root = rootFor(session, name, requireLog = false).get
      val cfg = IceTableConfig(
        partitionExpr = partitionExprSql
          .map(org.apache.spark.sql.functions.expr)
          .getOrElse(org.apache.spark.sql.functions.lit("")),
        sortOrder = sortCols,
        bucketBy = bucketBy)
      val t = new IceTable(session, root, cfg)
      val df = org.apache.spark.sql.graft.PlanBridge
        .ofRows(session, queryBox.plan).localCheckpoint()
      val n = df.count()
      t.insert(df)
      Seq(Row(n))
    }
  }

  /** `CREATE TABLE graft.<t> (c TYPE, ...) [PARTITIONED BY (expr)]
    * [SORTED BY (cols)]` → [[IceTable.createEmpty]]: one schema-only log
    * commit; the declared types pin the add-only union schema before any
    * data lands, and the partition/sort config persists in the same
    * commit so every later insert — SQL or API — routes identically. */
  final case class GraftCreateTableCommand(
      name: String, ifNotExists: Boolean,
      partitionExprSql: Option[String], sortCols: Seq[String],
      bucketBy: Option[(Int, Seq[String])],
      cols: Seq[(String, String)]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("created", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      if (rootFor(session, name, requireLog = true).isDefined) {
        if (ifNotExists) return Seq(Row(0L))
        throw new IllegalStateException(
          s"graft table '$name' already exists; DROP TABLE it first")
      }
      val root = rootFor(session, name, requireLog = false).get
      val cfg = IceTableConfig(
        partitionExpr = partitionExprSql
          .map(org.apache.spark.sql.functions.expr)
          .getOrElse(org.apache.spark.sql.functions.lit("")),
        sortOrder = sortCols,
        bucketBy = bucketBy)
      new IceTable(session, root, cfg)
        .createEmpty(graft.ice.Schema(cols: _*))
      Seq(Row(1L))
    }
  }

  /** `ALTER TABLE graft.<t> ADD COLUMN[S] (c TYPE, ...)` →
    * [[IceTable.addColumns]]: one schema-only union-evolution commit;
    * existing files read the new columns as null. */
  final case class GraftAlterAddColumnsCommand(
      name: String, cols: Seq[(String, String)]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("added_columns", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          IceTable.open(session, root).addColumns(cols)
          Seq(Row(cols.map { case (c, t) => s"$c $t" }.mkString(", ")))
      }
  }

  /** `RESTORE TABLE graft.<t> TO TIMESTAMP|VERSION AS OF <ms>` →
    * [[IceTable.restoreTo]] on the main table AND the `_dv` side table
    * (post-bound merge-on-read deletes must roll back with the data, or
    * the restored read would still hide their rows). A bound predating
    * the first dv commit restores the dv state to "no marks" — every
    * current mark file tombstones. */
  /** `ANALYZE TABLE graft.<t> COMPUTE STATISTICS [FOR COLUMNS c, ...]
    * [EXACT] [WITH HISTOGRAM]` → [[graft.ice.TableStats.analyze]]: one
    * scan, stats persisted beside the log, consumed by `table_stats('t')`
    * and the bloom-filter auto-sizing. WITH HISTOGRAM additionally builds
    * equi-height histograms over the numeric columns of the FOR
    * COLUMNS list (CBO range-selectivity on skewed data). Returns the
    * analyzed column rows. */
  final case class GraftAnalyzeCommand(
      name: String, cols: Seq[String], exact: Boolean,
      histogram: Boolean = false)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("column", StringType, nullable = false)(),
      AR("ndv", LongType, nullable = false)(),
      AR("null_count", LongType, nullable = false)(),
      AR("row_count", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          val histCols =
            if (!histogram) Seq.empty
            else {
              // numeric/date subset of the requested (or all-scalar) list
              val schema = t.read().schema
              val requested =
                if (cols.nonEmpty) cols
                else schema.fields.map(_.name).toSeq
              // NUMERIC only — TableStats refuses date/timestamp
              // histograms (estimator-unit mismatch; see its scaladoc)
              requested.filter(c => schema.fields.exists(f =>
                f.name.equalsIgnoreCase(c) && (f.dataType match {
                  case _: org.apache.spark.sql.types.NumericType => true
                  case _ => false
                })))
            }
          val s = graft.ice.TableStats.analyze(
            t, cols, exact, histogramColumns = histCols)
          s.columns.map(c => Row(c.column, c.ndv, c.nullCount, s.rowCount))
      }
  }

  /** `ALTER TABLE graft.<t> CREATE|PUBLISH|DROP BRANCH <b>` — the WAP
    * loop in SQL (see [[graft.ice.Branch]]): CREATE forks metadata-only,
    * writes go to the branch through its API handle (or a registered
    * view), PUBLISH fast-forwards main atomically, DROP releases the
    * branch's files to the orphan sweep. */
  final case class GraftBranchCommand(name: String, op: String, branch: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("files_added", LongType, nullable = false)(),
      AR("files_tombstoned", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          op match {
            case "CREATE" =>
              graft.ice.Branch.create(t, branch); Seq(Row(0L, 0L))
            case "PUBLISH" =>
              val (a, r) = graft.ice.Branch.publish(t, branch)
              Seq(Row(a.toLong, r.toLong))
            case "DROP" =>
              // silent success on a typo'd name would leave the REAL
              // branch pinning its files against vacuumOrphans forever
              if (!graft.ice.Branch.drop(t, branch))
                throw new IllegalArgumentException(
                  s"branch '$branch' of graft table '$name' does not exist")
              Seq(Row(0L, 0L))
          }
      }
  }

  /** `SHOW BRANCHES IN graft.<t>` — live branch names. */
  final case class GraftShowBranchesCommand(name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("branch", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          graft.ice.Branch.list(IceTable.open(session, root)).map(Row(_))
      }
  }

  final case class GraftRestoreCommand(name: String, bound: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("files_revived", LongType, nullable = false)(),
      AR("files_tombstoned", LongType, nullable = false)(),
      AR("dv_files_changed", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          // an MV cannot be RESTOREd in place: its sync watermarks and
          // dim-version marks fold by per-key MAX (they cannot rewind),
          // so a restored view would claim later windows were applied
          // and silently diverge — and revived pre-rebase markers would
          // carry createdMs below a surviving flat-state mark, falsely
          // proving the fold-free read. Restore the BASE table and
          // REFRESH (or DROP + CREATE) the view instead; time travel
          // (`SELECT … TIMESTAMP AS OF`) serves historical view states
          // without mutating anything.
          require(t.cfg.mvDef.isEmpty,
            s"$root is a MATERIALIZED VIEW — derived state cannot be " +
              "RESTOREd in place (max-merged sync watermarks cannot " +
              "rewind). RESTORE the source table and REFRESH the view, " +
              "or read the past via TIMESTAMP AS OF")
          val (revived, tombstoned) = t.restoreTo(bound)
          val dv = DeleteVectors.dvTable(t)
          val dvChanged: Long =
            if (dv.logio.currentLogFiles(dv.root).isEmpty) 0L
            else if (dv.trySnapshot(bound).isEmpty)
              // dv table postdates the bound entirely: drop every mark
              dv.removePartitions(parts => parts, maxFiles = Int.MaxValue)._3.toLong
            else { val (a, b) = dv.restoreTo(bound); (a + b).toLong }
          Seq(Row(revived.toLong, tombstoned.toLong, dvChanged))
      }
  }

  /** `DROP TABLE [IF EXISTS] graft.<t>`: removes the table directory —
    * data, log, checkpoints, and any `_dv` side table. Destructive and
    * non-MVCC by design (there is no log left to record it in); the
    * SafeName guard means the path can never escape the warehouse. */
  final case class GraftDropTableCommand(name: String, ifExists: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("dropped", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None =>
          if (ifExists) Seq(Row(0L))
          else throw new IllegalArgumentException(s"graft table '$name' does not exist")
        case Some(root) =>
          val p = new Path(root)
          p.getFileSystem(session.sparkContext.hadoopConfiguration).delete(p, true)
          Seq(Row(1L))
      }
  }

  /** `SHOW CREATE TABLE graft.<t>`: the union schema (log type
    * vocabulary) plus the persisted PARTITIONED BY / SORTED BY clauses,
    * as ONE statement this parser round-trips — executing the returned
    * text under a new name reproduces the table's routing and sort
    * config. Config with no DDL clause (merge/insert SQL, stats/bloom
    * columns, codec knobs) renders as trailing `-- config:` comment
    * lines: visible, honest, and harmless to re-execution. Closure
    * hooks (partitionFunc/formatRow) and non-SQL partition expressions
    * surface as loud comments too — the statement cannot reproduce a
    * closure, and silence would mis-route. */
  final case class GraftShowCreateTableCommand(name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("createtab_stmt", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val snap = IceTable.open(session, root).snapshot()
          val cat = session.conf.getOption(IceSqlResolution.CatalogKey)
            .getOrElse("graft")
          val cfg: Map[String, Any] = snap.tableConfig.getOrElse(Map.empty)
          def strs(k: String): Seq[String] = cfg.get(k).collect {
            case s: scala.collection.Seq[_] => s.map(_.toString).toSeq
          }.getOrElse(Seq.empty)
          // a MATERIALIZED VIEW round-trips as its defining statement —
          // re-executing it recreates AND reseeds the view; the MV
          // table's physical layout is maintenance-internal
          val mvStmt = cfg.get("mvd").map { enc =>
            val d = graft.operators.MvSync.MvViewDef.decode(enc.toString)
            val ge = d.groupExprs.toMap
            val selGroups = d.groupCols.map(g => ge.get(g) match {
              case Some(e) => s"$e AS `$g`"
              case None => s"`$g`"
            })
            val selOuts = d.outputs.map { o =>
              val agg = o.kind match {
                case "cnt" => "count(*)"
                case "dcnt" => s"count(DISTINCT ${o.col})"
                case "xdcnt" => s"exact_count_distinct(${o.col})"
                case k => s"$k(${o.col})"
              }
              s"$agg AS `${o.alias}`"
            }
            val from = d.dims.foldLeft(s"$cat.`${d.source}`" +
                d.dims.headOption.fold("")(j => s" ${j.factAlias}")) {
              (acc, j) =>
                val kw = if (j.isLeft) "LEFT JOIN" else "JOIN"
                s"$acc $kw $cat.`${j.dimTable}` ${j.dimAlias} " +
                  s"ON ${j.condSql}"
            }
            val where = d.filterSql.fold("")(w => s"\nWHERE $w")
            val gby =
              if (d.groupCols.isEmpty) "" // a GLOBAL view has no GROUP BY
              else "\nGROUP BY " + d.groupCols
                .map(g => ge.getOrElse(g, s"`$g`")).mkString(", ")
            val hav = d.havingSql.fold("")(h => s"\nHAVING $h")
            // the estimate contract travels with the statement: the
            // DISTINCT outputs serve HLL sketch ESTIMATES, not the exact
            // ANSI count the same SELECT would return against the base
            val dcntNote =
              if (d.outputs.exists(_.kind == "dcnt"))
                "\n-- note: count(DISTINCT …) is maintained as HLL " +
                  "sketch state; reads are estimates (exact in the " +
                  "sparse regime, ±~2% beyond)"
              else ""
            s"CREATE MATERIALIZED VIEW $cat.`$name` AS\n" +
              s"SELECT ${(selGroups ++ selOuts).mkString(", ")}\n" +
              s"FROM $from$where$gby$hav$dcntNote"
          }
          if (mvStmt.isDefined) return Seq(Row(mvStmt.get))
          // Spark DDL type spellings (the CREATE grammar's vocabulary —
          // bare VARCHAR would not re-parse), via the same log-type →
          // Spark mapping every read path uses
          val cols = snap.schema.toStructType.fields
            .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
          val sb = new StringBuilder(s"CREATE TABLE $cat.`$name` ($cols)")
          cfg.get("prt").foreach(p => sb.append(s"\nPARTITIONED BY ($p)"))
          val srt = strs("srt")
          if (srt.nonEmpty)
            sb.append(s"\nSORTED BY (${srt.map(c => s"`$c`").mkString(", ")})")
          cfg.get("bkn").foreach { n =>
            val bc = strs("bkc").map(c => s"`$c`").mkString(", ")
            sb.append(s"\nCLUSTERED BY ($bc) INTO $n BUCKETS")
          }
          val comments = Seq(
            cfg.get("ins").map(v => s"custom insert sql: $v"),
            cfg.get("mrg").map(v => s"custom merge sql: $v"),
            cfg.get("stc").map(v => s"stats column: $v"),
            Option(strs("sta")).filter(_.nonEmpty)
              .map(v => s"stats columns: ${v.mkString(", ")}"),
            Option(strs("blc")).filter(_.nonEmpty)
              .map(v => s"bloom filter columns: ${v.mkString(", ")}"),
            cfg.get("bln").map(v => s"bloom filter ndv: $v"),
            cfg.get("cdc").map(v => s"compression codec: $v"),
            cfg.get("pbb").map(v => s"parquet block bytes: $v"),
            cfg.get("rgr").map(v => s"row group rows: $v"),
            cfg.get("cpc").map(v => s"checkpoint every commits: $v"),
            cfg.get("pp").collect { case true => "preserve _partition column" },
            cfg.get("shf").collect { case false => "shuffle on insert: off" },
            cfg.get("som").collect { case true => "sort on merge" },
            cfg.get("pf").collect { case true =>
              "partitionFunc CLOSURE (not reproducible from SQL)" },
            cfg.get("fr").collect { case true =>
              "formatRow CLOSURE (not reproducible from SQL)" },
            cfg.get("prtx").collect { case true =>
              "partition expression has NO SQL rendering (not reproducible)" })
            .flatten
          comments.foreach(cmt => sb.append(s"\n-- config: $cmt"))
          // CHECK constraints re-apply via their own ALTER statements —
          // loud comments carrying the exact spelling, since the CREATE
          // grammar has no CHECK clause
          strs("chn").zip(strs("chx")).foreach { case (n, x) =>
            sb.append(s"\n-- constraint: ALTER TABLE $cat.`$name` " +
              s"ADD CONSTRAINT $n CHECK ($x)")
          }
          Seq(Row(sb.toString))
      }
  }

  /** `SHOW TABLES IN graft`: every warehouse child with a `_log/` —
    * driver-side listing, one row per table. */
  final case class GraftShowTablesCommand() extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("namespace", StringType, nullable = false)(),
        AR("tableName", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val w = session.conf.getOption(IceSqlResolution.WarehouseKey).filter(_.nonEmpty)
        .getOrElse(throw new IllegalStateException(
          s"set ${IceSqlResolution.WarehouseKey} to use graft DDL statements"))
      val cat = session.conf.getOption(IceSqlResolution.CatalogKey).getOrElse("graft")
      val wp = new Path(w)
      val fs = wp.getFileSystem(session.sparkContext.hadoopConfiguration)
      if (!fs.exists(wp)) return Seq.empty
      fs.listStatus(wp).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(n => IceSqlResolution.safeName(n) &&
          (try fs.exists(new Path(s"$w/$n", "_log")) catch { case _: Exception => false }))
        .sorted
        .map(n => Row(cat, n))
    }
  }

  /** `ALTER TABLE graft.<t> SORTED BY (cols)` → one config-only commit
    * ([[IceTable.persistConfig]]): every later insert — SQL or API —
    * writes files clustered by the new order; existing files are
    * untouched (re-sort them with OPTIMIZE / recluster). */
  final case class GraftAlterSortCommand(name: String, sortCols: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("sort_order", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          new IceTable(session, root, t.cfg.copy(sortOrder = sortCols))
            .persistConfig()
          Seq(Row(sortCols.mkString(", ")))
      }
  }

  /** Resolve a join view's dimension table handles in join order
    * (syncFromFeed pins each snapshot + version and decides
    * delta-vs-reseed from the dims' change feeds). */
  private def dimArgs(session: SparkSession,
      d: graft.operators.MvSync.MvViewDef): Seq[IceTable] =
    d.dims.map { j =>
      val root = rootFor(session, j.dimTable, requireLog = true).getOrElse(
        throw new IllegalArgumentException(
          s"dimension table '${j.dimTable}' of the view does not exist"))
      val t = IceTable.open(session, root)
      IceSqlResolution.requireNotMv(t)
      if (t.trySnapshot(Long.MaxValue).isEmpty)
        throw new IllegalArgumentException(
          s"dimension table '${j.dimTable}' has no commits yet — seed " +
            "it before creating or refreshing a view that joins it")
      t
    }

  /** `CREATE MATERIALIZED VIEW graft.<m> AS SELECT …` → an MV table
    * ([[graft.operators.MvSync]]) whose config word persists the view
    * definition, seeded with one initial full aggregation. Reading
    * `graft.<m>` resolves to the FOLDED view (IceSqlResolution);
    * `REFRESH MATERIALIZED VIEW` advances it incrementally from the
    * source's change feed. */
  final case class GraftCreateMvCommand(name: String, ifNotExists: Boolean,
      d: graft.operators.MvSync.MvViewDef) extends LeafRunnableCommand {
    import graft.operators.MvSync
    override val output: Seq[Attribute] =
      Seq(AR("groups_seeded", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      if (rootFor(session, name, requireLog = true).isDefined) {
        if (ifNotExists) return Seq(Row(0L))
        throw new IllegalStateException(
          s"graft table '$name' already exists; DROP TABLE it first")
      }
      val srcRoot = rootFor(session, d.source, requireLog = true).getOrElse(
        throw new IllegalArgumentException(
          s"source table '${d.source}' does not exist"))
      val src = IceTable.open(session, srcRoot)
      // reject BEFORE the view table is created, so a refused definition
      // leaves no half-made MV behind (MvSync re-checks at every sync)
      IceSqlResolution.requireNotMv(src)
      val dimT = dimArgs(session, d)
      // an expression group key materializes under its alias via
      // withColumn — an alias shadowing a real source (or joined dim)
      // column would silently overwrite it for every aggregate in the
      // same view
      val srcCols = src.trySnapshot(Long.MaxValue)
        .map(_.schema.pairs.map(_._1.toLowerCase).toSet).getOrElse(Set.empty) ++
        dimT.flatMap(_.trySnapshot(Long.MaxValue).toSeq
          .flatMap(_.schema.pairs.map(_._1.toLowerCase)))
      d.groupExprs.foreach { case (alias, e) =>
        // a PURE column reference under its own name (`d.cat AS cat`) is
        // the identity — shadowing is harmless and the natural join-view
        // idiom; only a computed expression stealing a real column's
        // name is dangerous
        val pureSelfRef = e.replace("`", "").split('.')
          .lastOption.exists(_.equalsIgnoreCase(alias))
        if (!pureSelfRef && srcCols.contains(alias.toLowerCase))
          throw new UnsupportedOperationException(
            s"CREATE MATERIALIZED VIEW: group expression alias `$alias` " +
              s"(= $e) shadows a column of '${d.source}'" +
              (if (d.dims.isEmpty) ""
               else d.dims.map(j => s"'${j.dimTable}'")
                 .mkString(" or ", " or ", "")) +
              " — pick an alias that is not a source column name")
      }
      // a GLOBAL view maintains under the reserved synthetic key: a real
      // source column with that name would be silently overwritten by
      // the derived constant on every maintenance aggregation
      if (d.groupCols.isEmpty &&
          srcCols.contains(graft.operators.MvSync.GlobalKey))
        throw new UnsupportedOperationException(
          s"CREATE MATERIALIZED VIEW: a global (no GROUP BY) view " +
            s"reserves the column name `${graft.operators.MvSync.GlobalKey}`, " +
            s"which '${d.source}' already has — rename that column")
      val root = rootFor(session, name, requireLog = false).get
      val mv = MvSync.create(session, root, d.spec, viewDef = Some(d))
      val (_, seeded) = MvSync.syncFromFeed(src, mv, d.spec,
        dimTables = dimT)
      Seq(Row(seeded))
    }
  }

  /** `REFRESH MATERIALIZED VIEW graft.<m>` → one incremental
    * [[graft.operators.MvSync.syncFromFeed]] window: count/sum deltas
    * appended, delete-touched groups recomputed, exactly-once.
    *
    * `REFRESH MATERIALIZED VIEW graft.<m> FULL` →
    * [[graft.operators.MvSync.rebase]]: every live group lands as ONE
    * fresh reset generation (readers see the compacted state atomically
    * — newest-reset-wins) and the superseded older rows are reclaimed.
    * The SQL spelling of the view's defragmentation hygiene loop — the
    * reference's analog is the periodic merge/OPTIMIZE pass
    * (`examples/api-flask.py:92-101`); without it a SQL-only operator
    * could never collapse a long-lived view's partial-generation tail. */
  final case class GraftRefreshMvCommand(name: String, full: Boolean = false)
      extends LeafRunnableCommand {
    import graft.operators.MvSync
    override val output: Seq[Attribute] = Seq(
      AR("partial_groups", LongType, nullable = false)(),
      AR("reset_groups", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft materialized view '$name' does not exist")
        case Some(root) =>
          val mv = IceTable.open(session, root)
          val d = mv.cfg.mvDef.map(MvSync.MvViewDef.decode).getOrElse(
            throw new IllegalArgumentException(
              s"graft table '$name' is not a materialized view"))
          val srcRoot = rootFor(session, d.source, requireLog = true).getOrElse(
            throw new IllegalArgumentException(
              s"source table '${d.source}' of materialized view '$name' " +
                "no longer exists"))
          val dimT = dimArgs(session, d)
          val src = IceTable.open(session, srcRoot)
          if (full) {
            val n = MvSync.rebase(src, mv, d.spec, dimTables = dimT)
            Seq(Row(0L, n))
          } else {
            val (p, r) = MvSync.syncFromFeed(src, mv, d.spec,
              dimTables = dimT)
            Seq(Row(p, r))
          }
      }
  }

  /** `ALTER MATERIALIZED VIEW graft.<m> ADD (sum(x) AS sx, …)` — MV
    * definition evolution without DROP+CREATE. The widened state seeds
    * with ONE base scan: a [[graft.operators.MvSync.rebase]] under the
    * NEW spec lands every live group as a reset generation carrying the
    * new columns (and collapses fragmentation as a side effect), THEN
    * the new definition persists. Readers are never broken: until the
    * config commit they project the OLD definition over rows that merely
    * carry extra columns; after it, every stored row has the new state.
    * A crash in between leaves a correct old-definition view and an
    * idempotent re-run. Rejected: alias collisions with existing outputs
    * or group columns (case-insensitive) — and a new aggregate over a
    * column the source lacks fails the seed scan's analysis BEFORE
    * anything commits.
    *
    * CONCURRENT-MAINTAINER CAVEATS: a live
    * [[graft.streaming.Streams.mvSyncSink]] must STOP before the ALTER —
    * a live sink holds the OLD spec in its closure and would keep
    * landing old-shaped partials after the command returns, silently
    * undercounting the new column for every later batch; restart it
    * with the new spec. A concurrent SQL `REFRESH` from another session
    * (which decoded the OLD definition) racing into the seed→persist
    * window is DETECTED and absorbed: persistConfig writes no data
    * files, so any alive-data-set change since the seed is a foreign
    * maintenance write, and the command re-rebases under the
    * now-persisted definition before returning (idempotent; only the
    * race pays the second scan). That narrows the exposure to a REFRESH
    * still in flight at re-check time (it decoded the old definition
    * before the persist and commits after the check) — sequencing out
    * concurrent maintainers during schema evolution remains the
    * operator's contract, now with a self-repairing common case and a
    * post-ALTER `REFRESH … FULL` as the universal repair. SQL `REFRESH`
    * issued AFTER the command returns needs nothing: it re-decodes the
    * persisted definition on every call. */
  final case class GraftAlterMvAddCommand(name: String,
      adds: Seq[graft.operators.MvSync.MvOutput])
      extends LeafRunnableCommand {
    import graft.operators.MvSync
    override val output: Seq[Attribute] = Seq(
      AR("columns_added", LongType, nullable = false)(),
      AR("groups_reseeded", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft materialized view '$name' does not exist")
        case Some(root) =>
          val mv = IceTable.open(session, root)
          val d = mv.cfg.mvDef.map(MvSync.MvViewDef.decode).getOrElse(
            throw new IllegalArgumentException(
              s"graft table '$name' is not a materialized view — ALTER " +
                "MATERIALIZED VIEW only evolves view definitions"))
          val taken = (d.outputs.map(_.alias) ++ d.groupCols)
            .map(_.toLowerCase).toSet
          adds.foreach { o =>
            if (taken(o.alias.toLowerCase))
              throw new UnsupportedOperationException(
                s"ALTER MATERIALIZED VIEW: output alias `${o.alias}` " +
                  s"already exists on '$name' — pick a fresh alias")
          }
          adds.groupBy(_.alias.toLowerCase).collect {
            case (a, os) if os.size > 1 =>
              throw new UnsupportedOperationException(
                s"ALTER MATERIALIZED VIEW: alias `$a` appears twice in ADD")
          }
          val newDef = d.copy(outputs = d.outputs ++ adds)
          val srcRoot = rootFor(session, d.source, requireLog = true).getOrElse(
            throw new IllegalArgumentException(
              s"source table '${d.source}' of materialized view '$name' " +
                "no longer exists"))
          val dimT = dimArgs(session, newDef)
          // seed the widened state FIRST (a failed/crashed seed leaves a
          // correct old-definition view), persist the definition LAST
          val n = MvSync.rebase(IceTable.open(session, srcRoot), mv,
            newDef.spec, dimTables = dimT)
          new IceTable(session, root, mv.cfg.copy(
            sortOrder = newDef.spec.groupCols,
            customMergeSql = MvSync.mvConfig(newDef.spec,
              viewDef = Some(newDef)).customMergeSql,
            mvDef = Some(newDef.encode))).persistConfig()
          // CLOSE the seed→persist window: a concurrent OLD-definition
          // maintainer (a racing SQL REFRESH from another session that
          // decoded the old spec) landing between the rebase and the
          // config commit writes old-shaped partials AFTER the new reset
          // generation — the added columns would permanently undercount
          // that window. The detector is the rebase's own FLAT-STATE
          // proof: the rebase records its mark strictly above every
          // marker it left alive, and the causal commit floor puts ANY
          // later maintenance write — even one landing before we could
          // list — at or above the mark, so a surviving proof means no
          // foreign data write exists anywhere in the window
          // (persistConfig appends no file markers and cannot
          // invalidate it). A broken proof → one idempotent re-rebase
          // under the now-persisted definition; a skew-skipped mark
          // costs the same single extra rebase, never a loop
          val reopened = IceTable.open(session, root)
          val stillFlat = reopened.trySnapshot(Long.MaxValue)
            .exists(MvSync.isFlatSnapshot)
          if (!stillFlat) {
            MvSync.rebase(IceTable.open(session, srcRoot), reopened,
              newDef.spec, dimTables = dimT)
            ()
          }
          Seq(Row(adds.length.toLong, n))
      }
  }

  /** `ALTER MATERIALIZED VIEW graft.<m> DROP (alias, …)` — the symmetric
    * evolution to ADD, and strictly CHEAPER: dropping an aggregate is a
    * projection, so the command narrows the persisted definition (and
    * the compaction merge SQL) in ONE config commit — no reseed, no base
    * scan, the view readable throughout. Stored state columns that only
    * the dropped outputs used become dead weight in already-written rows
    * (reads never project them) and are physically reclaimed at the next
    * rebase (REFRESH … FULL / OPTIMIZE), whose reset rows carry only the
    * narrowed spec's columns. Shared state survives automatically: the
    * maintenance spec derives from the REMAINING outputs, so dropping
    * `sum(x)` while `avg(x)` remains keeps `sum_x` maintained.
    * Refused: dropping a GROUP column (that reshapes the key — use
    * DROP + CREATE), an alias the stored HAVING references (reads would
    * break), an unknown alias, or every last output. A concurrent
    * old-definition maintainer (streaming sink, racing REFRESH) keeps
    * writing the wider state harmlessly — extra columns are ignored,
    * never wrong, which is why DROP needs none of ADD's sequencing —
    * with ONE exception: dropping the last output over an
    * `exact_count_distinct` column also reclaims its `_xd/` side
    * table, and a live OLD-spec streaming sink would recreate and keep
    * feeding it; stop the sink before dropping exact-distinct outputs
    * (other drops remain sequencing-free). */
  final case class GraftAlterMvDropCommand(name: String, drops: Seq[String])
      extends LeafRunnableCommand {
    import graft.operators.MvSync
    override val output: Seq[Attribute] =
      Seq(AR("columns_dropped", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft materialized view '$name' does not exist")
        case Some(root) =>
          val mv = IceTable.open(session, root)
          val d = mv.cfg.mvDef.map(MvSync.MvViewDef.decode).getOrElse(
            throw new IllegalArgumentException(
              s"graft table '$name' is not a materialized view — ALTER " +
                "MATERIALIZED VIEW only evolves view definitions"))
          require(drops.nonEmpty, "DROP needs at least one alias")
          drops.groupBy(_.toLowerCase).collect { case (a, os) if os.size > 1 =>
            throw new UnsupportedOperationException(
              s"ALTER MATERIALIZED VIEW: alias `$a` appears twice in DROP")
          }
          val outByAlias = d.outputs.map(o => o.alias.toLowerCase -> o).toMap
          val gset = d.groupCols.map(_.toLowerCase).toSet
          drops.foreach { a =>
            val lc = a.toLowerCase
            if (gset(lc)) throw new UnsupportedOperationException(
              s"ALTER MATERIALIZED VIEW: `$a` is a GROUP column of " +
                s"'$name' — dropping it reshapes the key; DROP + CREATE " +
                "the view instead")
            if (!outByAlias.contains(lc)) throw new IllegalArgumentException(
              s"ALTER MATERIALIZED VIEW: '$name' has no output `$a` " +
                s"(outputs: ${d.outputs.map(_.alias).mkString(", ")})")
          }
          val dropSet = drops.map(_.toLowerCase).toSet
          val remaining = d.outputs.filterNot(o => dropSet(o.alias.toLowerCase))
          if (remaining.isEmpty) throw new UnsupportedOperationException(
            s"ALTER MATERIALIZED VIEW: dropping every output of '$name' " +
              "leaves nothing to read — DROP MATERIALIZED VIEW instead")
          d.havingSql.foreach { h =>
            val refs = org.apache.spark.sql.graft.PlanBridge.eagerExpression(
              org.apache.spark.sql.functions.expr(h)).collect {
                case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
                  a.name.toLowerCase
              }.toSet
            val hit = drops.filter(a => refs(a.toLowerCase))
            if (hit.nonEmpty) throw new UnsupportedOperationException(
              s"ALTER MATERIALIZED VIEW: the view's HAVING ($h) references " +
                s"${hit.mkString(", ")} — drop or rewrite the HAVING first " +
                "(DROP + CREATE)")
          }
          val newDef = d.copy(outputs = remaining)
          new IceTable(session, root, mv.cfg.copy(
            customMergeSql = MvSync.mvConfig(newDef.spec,
              viewDef = Some(newDef)).customMergeSql,
            mvDef = Some(newDef.encode))).persistConfig()
          // exact-distinct side tables whose LAST referencing output was
          // dropped are dead state sized (group × distinct values) —
          // unlike dead columns in main rows, no later rebase would ever
          // visit them again. Reclaim now. NOTE: this is the one DROP
          // that inherits ADD's sequencing caveat — a live OLD-spec
          // streaming sink would recreate (and keep feeding) the side
          // table on its next batch; stop it first. Other drops stay
          // sequencing-free (extra state columns are harmless). A failed
          // delete surfaces through the maintenance-fallback hook so the
          // operator never believes dead state was reclaimed when it
          // was not
          val stillUsed = newDef.spec.exactDistinctCols
            .map(_.replace('.', '_').toLowerCase).toSet
          d.spec.exactDistinctCols
            .map(_.replace('.', '_'))
            .filterNot(v => stillUsed(v.toLowerCase))
            .foreach { v =>
              val p = new org.apache.hadoop.fs.Path(s"$root/_xd/$v")
              try {
                p.getFileSystem(session.sparkContext.hadoopConfiguration)
                  .delete(p, true); ()
              } catch { case e: Exception =>
                val f = MvSync.onFallback
                if (f != null) f(s"ALTER MATERIALIZED VIEW DROP on $root: " +
                  s"reclaim of side table _xd/$v failed " +
                  s"(${e.getClass.getSimpleName}: " +
                  s"${String.valueOf(e.getMessage).take(160)}) — dead " +
                  "state remains on disk; delete the directory manually")
              }
            }
          Seq(Row(drops.length.toLong))
      }
  }

  /** `BEGIN TRANSACTION; INSERT INTO graft.<t> …; …; COMMIT|ROLLBACK` →
    * one [[graft.ice.IceTransaction]]: every insert stages (data files +
    * a txn-tagged log now, visible to no reader), then ONE marker PUT
    * flips them all at once — or ROLLBACK / any failure discards the
    * stage and nothing ever surfaces. Column alignment per statement is
    * [[IceInsertCommand.align]], identical to the standalone INSERT.
    * Returns one row per insert: (table, rows_staged, outcome). */
  final case class GraftTransactionCommand(
      inserts: Seq[(String, Seq[String], Boolean, PlanBox)],
      rollback: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("table", StringType, nullable = false)(),
      AR("rows_staged", LongType, nullable = false)(),
      AR("outcome", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val txn = graft.ice.IceTransaction.begin(session)
      val stagedCounts =
        try inserts.map { case (name, userCols, byName, box) =>
          val root = rootFor(session, name, requireLog = true).getOrElse(
            throw new IllegalArgumentException(
              s"graft table '$name' does not exist"))
          val (t, snapOpt) = IceTable.openWithSnapshot(session, root)
          IceSqlResolution.requireNotMv(t)
          val q = org.apache.spark.sql.graft.PlanBridge.ofRows(session, box.plan)
          val staged = IceInsertCommand
            .align(snapOpt, q, s"graft.$name", userCols, byName)
            .localCheckpoint()
          val n = staged.count()
          txn.insert(t, staged)
          (name, n)
        } catch { case e: Throwable =>
          // a failed stage (schema conflict, CHECK violation, missing
          // table) aborts the WHOLE block: partial-success would be the
          // exact anomaly the transaction exists to prevent
          try txn.abort() catch { case _: Exception => () }
          throw e
        }
      if (rollback) txn.abort() else txn.commit()
      val outcome = if (rollback) "rolled_back" else "committed"
      stagedCounts.map { case (n, c) => Row(n, c, outcome) }
    }
  }

  /** `ALTER TABLE graft.<t> ADD CONSTRAINT n CHECK (pred)` →
    * [[IceTable.addCheckConstraint]]: existing rows are validated (one
    * scan — a constraint is a whole-table guarantee), then the predicate
    * persists as a config-only commit; every write path (SQL or API,
    * any reopened handle) pre-flights batches against it BEFORE any
    * file lands. */
  final case class GraftAddConstraintCommand(
      name: String, cName: String, checkSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("constraint", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          IceTable.open(session, root).addCheckConstraint(cName, checkSql)
          Seq(Row(s"$cName CHECK ($checkSql)"))
      }
  }

  /** `ALTER TABLE graft.<t> DROP CONSTRAINT n` → one config-only commit. */
  final case class GraftDropConstraintCommand(name: String, cName: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("constraint", StringType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          IceTable.open(session, root).dropCheckConstraint(cName)
          Seq(Row(cName))
      }
  }

  /** `ALTER TABLE graft.<t> PARTITIONED BY (expr)` → partition EVOLUTION
    * ([[IceTable.repartitionTable]]): the whole table rewrites under the
    * new scheme in one Spark job + one atomic merged-log commit that also
    * persists the new expression; time travel to before the statement
    * still resolves the old layout. */
  final case class GraftAlterPartitionCommand(name: String, partitionExprSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("files_written", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          val n = t.repartitionTable(
            org.apache.spark.sql.functions.expr(partitionExprSql))
          Seq(Row(n.toLong))
      }
  }

  /** `ALTER TABLE graft.<t> DROP PARTITIONS WHERE <pred>` →
    * [[IceTable.dropPartitionsWhere]]: the reference's retention
    * operation (icedb/icedb.py:435-501, README.md:536-551) as SQL — a
    * PURE-METADATA commit chain that tombstones every file of every
    * matching partition directory, reading and writing ZERO data files.
    * The predicate sees the path-derived STRING partition columns
    * exactly as the catalog scan serves them; anything else is refused
    * loudly (DROP PARTITIONS must be incapable of silently becoming a
    * rewrite — row predicates belong to DELETE). Refused on MV tables:
    * dropping derived-state partitions under the sync's feet would
    * diverge the view (REFRESH/DROP the view instead). */
  final case class GraftDropPartitionsCommand(name: String, predSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("partitions_dropped", LongType, nullable = false)(),
      AR("files_tombstoned", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          require(t.cfg.mvDef.isEmpty,
            s"$root is a MATERIALIZED VIEW — its partitions are derived " +
              "state maintained by the sync; dropping them in place would " +
              "silently diverge the view. REFRESH … FULL or DROP the view " +
              "instead")
          val (parts, files) = t.dropPartitionsWhere(
            org.apache.spark.sql.functions.expr(predSql))
          Seq(Row(parts.toLong, files.toLong))
      }
  }

  /** `DESCRIBE HISTORY graft.<t>` → [[IceTable.history]]: one row per
    * log commit with files/bytes-added and tombstone deltas — the
    * lakehouse `DESCRIBE HISTORY` shape over the reference's plain
    * JSONL log listing. Metadata-scale (one row per commit). */
  final case class GraftDescribeHistoryCommand(name: String)
      extends LeafRunnableCommand {
    import org.apache.spark.sql.types.{BooleanType, IntegerType}
    override val output: Seq[Attribute] = Seq(
      AR("commit_ts", LongType, nullable = false)(),
      AR("log_file", StringType, nullable = false)(),
      AR("merged", BooleanType, nullable = false)(),
      AR("files_added", IntegerType, nullable = false)(),
      AR("bytes_added", LongType, nullable = false)(),
      AR("files_tombstoned", IntegerType, nullable = false)(),
      AR("log_tombstones", IntegerType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          IceTable.open(session, root).history().collect().toSeq
      }
  }

  /** `DESCRIBE [TABLE] graft.<t>`: the log's union schema plus the
    * path-derived partition columns the catalog relation serves. */
  final case class GraftDescribeTableCommand(name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("col_name", StringType, nullable = false)(),
      AR("data_type", StringType, nullable = false)(),
      AR("comment", StringType, nullable = true)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val (t, snapOpt) = IceTable.openWithSnapshot(session, root)
          val snap = snapOpt.getOrElse(
            throw new IllegalArgumentException(s"graft table '$name' has no commits"))
          val dataCols = snap.schema.pairs.map { case (n, ty) => Row(n, ty, null) }
          val partCols = IceFileIndex.partitionKeys(t, snap)
            .map(k => Row(k, "STRING", "partition (path-derived)"))
          val constraints = t.cfg.checkConstraints.map { case (n, x) =>
            Row(s"# constraint $n", "CHECK", x)
          }
          val mvRow = t.cfg.mvDef.toSeq.map(d =>
            Row("# materialized view", "MV", d))
          dataCols ++ partCols ++ constraints ++ mvRow
      }
  }

  /** `OPTIMIZE graft.<t>` → [[IceTable.optimize]] (greedy full-table
    * compaction, one atomic merged-log commit per round).
    *
    * On a MATERIALIZED VIEW, OPTIMIZE routes to the view's REAL
    * compaction — [[graft.operators.MvSync.rebase]] (the REFRESH … FULL
    * path): the file-level merge would only fold within (group, gen,
    * is_reset) cells, leaving superseded generations on disk AND
    * invalidating the flat-state proof, so a delta-fragmented view would
    * silently lose its fold-free scan-only read until someone ran
    * REFRESH … FULL anyway. The rebase collapses every generation,
    * CoW-cleans superseded rows, and re-records the flat mark in the
    * same pass — OPTIMIZE on a view always re-arms the fast path, never
    * degrades it. Returned count = live groups rebased. */
  final case class GraftOptimizeCommand(name: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("merges", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          import graft.operators.MvSync
          val t = IceTable.open(session, root)
          t.cfg.mvDef match {
            case Some(enc) =>
              val d = MvSync.MvViewDef.decode(enc)
              val srcRoot = rootFor(session, d.source, requireLog = true)
                .getOrElse(throw new IllegalArgumentException(
                  s"source table '${d.source}' of materialized view " +
                    s"'$name' no longer exists"))
              val n = MvSync.rebase(IceTable.open(session, srcRoot), t,
                d.spec, dimTables = dimArgs(session, d))
              Seq(Row(n))
            case None => Seq(Row(t.optimize().toLong))
          }
      }
  }

  /** `OPTIMIZE graft.<t> ZORDER BY (c1, ...)` → [[IceTable.recluster]]
    * with a Z-value over the named NUMERIC columns: each dimension scales
    * into `[0, 2^bits)` from its observed min/max (one cheap aggregate —
    * exact bounds affect clustering quality, never correctness), the
    * interleaved Z-value range-partitions the rewrite, and every
    * partition commits in ONE atomic merged-log append. Multi-column
    * stats skipping then prunes on EVERY named dimension. */
  final case class GraftOptimizeZOrderCommand(name: String, cols: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AR("partitions_reclustered", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          import org.apache.spark.sql.functions.{col, count => fcount, lit => flit, max => fmax, min => fmin}
          require(cols.nonEmpty, "ZORDER BY needs at least one column")
          require(cols.length <= 31,
            s"too many ZORDER BY columns (${cols.length}; max 31 — the " +
              "interleaved Z-value carries 62 bits)")
          val (t, snapOpt) = IceTable.openWithSnapshot(session, root)
          // a Z-ordered MV would keep its rows but lose the flat-state
          // proof (all rewrites invalidate it) for zero pruning benefit —
          // the view's own reads are group-key folds, not range scans
          require(t.cfg.mvDef.isEmpty,
            s"$root is a MATERIALIZED VIEW — ZORDER would invalidate its " +
              "fold-free read proof for no benefit; use OPTIMIZE (which " +
              "rebases the view) instead")
          val snap = snapOpt.getOrElse(return Seq(Row(0L)))
          if (snap.aliveFiles.isEmpty) return Seq(Row(0L))
          val fields = snap.schema.toStructType.fields
          val canon = cols.map { c =>
            val f = fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
              throw new IllegalArgumentException(
                s"ZORDER BY column '$c' is not in the table schema"))
            if (!f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
              throw new UnsupportedOperationException(
                s"ZORDER BY column '$c' is ${f.dataType}; Z-ordering needs " +
                  "numeric dimensions (hash or encode strings into one first)")
            f.name
          }
          // observed per-dimension bounds + surviving-row count: ONE
          // aggregate scan (the recluster rewrites everything anyway)
          val aggExprs = fcount(flit(1)) +: canon.flatMap(c => Seq(
            fmin(col(s"`$c`")).cast("double"), fmax(col(s"`$c`")).cast("double")))
          val stats = t.read().agg(aggExprs.head, aggExprs.tail: _*).head
          if (stats.getLong(0) == 0L) return Seq(Row(0L)) // zero surviving rows
          val bits = math.min(12, 62 / canon.length) // >= 2 (<= 31 dims)
          val dims = canon.zipWithIndex.map { case (c, i) =>
            // an all-null or constant dimension contributes nothing to the
            // ordering: emit a constant 0 instead of scaling (scaled needs
            // hi > lo, and `lo + 1.0` is a double no-op past 2^53 — the
            // engine's own epoch-nanos magnitudes)
            val (loI, hiI) = (1 + 2 * i, 2 + 2 * i)
            if (stats.isNullAt(loI) || !(stats.getDouble(hiI) > stats.getDouble(loI)))
              flit(0L)
            else graft.functions.ZOrder.scaled(
              col(s"`$c`"), stats.getDouble(loI), stats.getDouble(hiI), bits)
          }
          val z = graft.functions.ZOrder.zvalue(bits, dims: _*)
          Seq(Row(t.recluster(z).toLong))
      }
  }

  /** `VACUUM graft.<t> [RETAIN n HOURS]` → [[IceTable.tombstoneCleanup]]
    * (default retention 7 days, the usual lakehouse floor) plus
    * [[DeleteVectors.vacuum]] when a dv side table exists. */
  final case class GraftVacuumCommand(name: String, retainMs: Option[Long])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AR("logs_cleaned", LongType, nullable = false)(),
      AR("data_files_deleted", LongType, nullable = false)(),
      AR("dv_marks_dropped", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      rootFor(session, name, requireLog = true) match {
        case None => throw new IllegalArgumentException(
          s"graft table '$name' does not exist")
        case Some(root) =>
          val t = IceTable.open(session, root)
          val r = t.tombstoneCleanup(retainMs.getOrElse(7L * 24 * 3600_000L))
          val dvDropped = DeleteVectors.vacuum(t)
          Seq(Row(r.cleanedLogFiles.length.toLong,
            r.deletedDataFiles.length.toLong, dvDropped))
      }
  }
}
