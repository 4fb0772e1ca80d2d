package graft.plans

import graft.ice.{IceTable, IceTableConfig}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, SubqueryAlias, UpdateTable}
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
  * Writes through this surface are rejected: an `INSERT INTO graft.t` would
  * bypass the transaction log (Spark would drop parquet files into the
  * table dir with no log commit — invisible at best, corrupting at worst).
  * The supported write paths are `IceTable.insert` and
  * `df.write.format("ice")`.
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
    * can never traverse out of the warehouse. */
  private def tableRoot(name: String): Option[String] = warehouse.flatMap { w =>
    if (!SafeName.matches(name)) None
    else {
      val root = s"$w/$name"
      val log = new Path(root, "_log")
      val ok =
        try log.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(log)
        catch { case _: Exception => false }
      if (ok) Some(root) else None
    }
  }

  private def resolve(name: String, maxTs: Long): Option[LogicalPlan] =
    tableRoot(name).map { root =>
      val t = new IceTable(spark, root, IceTableConfig(lit(""), Seq.empty))
      val rel = IceFileIndex.dataFrame(spark, t, maxTs).queryExecution.analyzed
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
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case InsertIntoStatement(IceName(t), _, _, _, _, _, _) =>
      throw new UnsupportedOperationException(
        s"INSERT INTO $catalogName.$t would bypass the ice transaction log; " +
          "write with IceTable.insert or df.write.format(\"ice\")")
    // SQL DML maps onto the engine's atomic CoW mutations. The raw
    // (unresolved) expressions travel as SQL text and re-resolve against
    // the table's own DataFrame inside the command — a LeafRunnableCommand
    // must not carry unresolved attributes through CheckAnalysis. Caveat
    // (documented): the catalog's bare table handle has no sortOrder /
    // statsColumn config, so SQL-path rewrites produce unsorted, stats-less
    // replacement files; the next compaction by a configured handle
    // restores both.
    case DeleteFromTable(IceRel(t), cond) if tableRoot(t).isDefined =>
      IceDeleteCommand(tableRoot(t).get, s"$catalogName.$t", cond.sql)
    case UpdateTable(IceRel(t), assignments, condOpt) if tableRoot(t).isDefined =>
      val sets = assignments.map { a =>
        val name = a.key match {
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => ua.name
          case other => other.sql.stripPrefix("`").stripSuffix("`")
        }
        name -> a.value.sql
      }
      IceUpdateCommand(tableRoot(t).get, s"$catalogName.$t",
        sets, condOpt.map(_.sql).getOrElse("true"))
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

  private[plans] def bareTable(
      spark: SparkSession, root: String): IceTable =
    new IceTable(spark, root, IceTableConfig(lit(""), Seq.empty))
}

/** `DELETE FROM graft.<t> WHERE ...` → [[IceTable.deleteWhere]] (atomic
  * CoW of only the affected files). Returns one row: rows_deleted. */
final case class IceDeleteCommand(root: String, ident: String, condSql: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AR("rows_deleted", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val n = IceSqlResolution.bareTable(session, root)
      .deleteWhere(org.apache.spark.sql.functions.expr(condSql))
    Seq(org.apache.spark.sql.Row(n))
  }
}

/** `UPDATE graft.<t> SET c = e[, ...] [WHERE ...]` →
  * [[IceTable.updateWhere]]. Returns one row: rows_updated. */
final case class IceUpdateCommand(
    root: String, ident: String,
    sets: Seq[(String, String)], condSql: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AR("rows_updated", org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val t = IceSqlResolution.bareTable(session, root)
    // a CoW rewrite keeps each file in its partition directory, so
    // updating a column the partition path encodes would leave the
    // path-derived value (which the catalog relation serves) stale —
    // reject instead of silently diverging
    val partKeys = t.trySnapshot(Long.MaxValue).toSeq
      .flatMap(_.aliveFiles.map(m => t.partitionOf(m.path)))
      .flatMap(_.split("/").toSeq).map(_.split("=", 2)(0)).toSet
    sets.map(_._1).find(partKeys.contains).foreach { c =>
      throw new UnsupportedOperationException(
        s"UPDATE of partition key '$c' on $ident would not move rows between " +
          "partitions; use IceTable.repartitionTable or rewritePartition")
    }
    val n = t.updateWhere(org.apache.spark.sql.functions.expr(condSql),
      sets.map { case (c, e) => c -> org.apache.spark.sql.functions.expr(e) })
    Seq(org.apache.spark.sql.Row(n))
  }
}
