package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
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
  /** One-pass per-interval ndv aggregate over `c` against sorted DOUBLE
    * `endpoints` — the same internal aggregate Spark's own
    * `ANALYZE ... FOR COLUMNS` uses to build equi-height histograms
    * ([[ApproxCountDistinctForIntervals]] is catalyst-internal; this is
    * its in-package exposure). Returns `endpoints.length - 1` ndvs. */
  def ndvForIntervals(c: Column, endpoints: Seq[Double]): Column =
    ColumnBridge.column(
      ApproxCountDistinctForIntervals(
        ColumnBridge.expression(c.cast("double")),
        CreateArray(endpoints.map(Literal(_))), 0.05, 0, 0)
        .toAggregateExpression())

  /** Catalyst equi-height histogram from (lo, hi, ndv) bins. */
  def histogram(height: Double, bins: Seq[(Double, Double, Long)]): Histogram =
    Histogram(height, bins.map(b => HistogramBin(b._1, b._2, b._3)).toArray)

  def columnStat(
      name: String, dt: DataType, ndv: Long, nullCount: Long,
      min: Option[String], max: Option[String],
      avgLen: Option[Long], maxLen: Option[Long],
      histogram: Option[Histogram] = None): CatalogColumnStat = {
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
      histogram = histogram, version = 1)
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
