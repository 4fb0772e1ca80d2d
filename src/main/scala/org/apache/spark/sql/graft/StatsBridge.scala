package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, NumericType, TimestampNTZType, TimestampType}

/** In-package shim feeding persisted ANALYZE statistics to Catalyst's
  * cost-based optimizer: `LogicalRelation.computeStats` consults ONLY its
  * `catalogTable.stats` for rowCount/column statistics, and both the
  * [[LogicalRelation]] constructor surface and
  * `CatalogColumnStat.fromExternalString` are `private[sql]`. Same bridge
  * pattern as [[PlanBridge]] / [[StreamBridge]] / [[ColumnBridge]].
  *
  * With `spark.sql.cbo.enabled=false` (the default) the attached stats
  * are inert by construction: `toPlanStats` then surfaces only
  * `sizeInBytes`, which callers pass as the exact same file-bytes sum the
  * bare relation would report — plans are bit-identical until CBO is
  * switched on. */
object StatsBridge {

  /** A plan-stats column entry. min/max are VALIDATED: a bound must
    * round-trip Spark's external-string codec for the column type or it
    * is dropped — a malformed bound would otherwise throw mid-planning
    * on every query touching the relation. String/binary bounds are
    * never attached (Catalyst plan stats do not model them). */
  def columnStat(
      name: String, dt: DataType, ndv: Long, nullCount: Long,
      min: Option[String], max: Option[String],
      avgLen: Option[Long], maxLen: Option[Long]): CatalogColumnStat = {
    def ok(v: Option[String]): Option[String] = dt match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType |
          BooleanType =>
        v.filter(s => scala.util.Try(
          CatalogColumnStat.fromExternalString(s, name, dt, 1)).isSuccess)
      case _ => None
    }
    CatalogColumnStat(
      distinctCount = Some(BigInt(ndv)),
      min = ok(min), max = ok(max),
      nullCount = Some(BigInt(nullCount)),
      avgLen = avgLen, maxLen = maxLen,
      histogram = None, version = 1)
  }

  /** `relation` as a DataFrame whose [[LogicalRelation]] carries a
    * minimal synthetic [[CatalogTable]] holding the statistics — the
    * vehicle `computeStats` actually reads. Analysis runs eagerly, so
    * session extension rules (the dv overlay) see the node exactly as
    * they would from `baseRelationToDataFrame`. */
  def planWithStats(
      spark: SparkSession, relation: HadoopFsRelation, ident: String,
      sizeInBytes: BigInt, rowCount: Option[BigInt],
      colStats: Map[String, CatalogColumnStat]): DataFrame = {
    val ct = CatalogTable(
      identifier = TableIdentifier(ident, Some("graft")),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = relation.schema,
      provider = Some("parquet"),
      stats = Some(CatalogStatistics(sizeInBytes, rowCount, colStats)))
    PlanBridge.ofRows(spark, LogicalRelation(relation, ct))
  }

  /** Ordered catalog idents of `df`'s optimized plan's
    * [[LogicalRelation]] leaves — the node-typed join-ORDER probe for
    * reorder assertions ([[LogicalRelation]] is `private[sql]`, so the
    * walk lives in the bridge; plan-string matching truncates and is
    * banned). Leaves without a catalog table report as "?". */
  def leafTables(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.identifier.table).getOrElse("?")
    }
}
