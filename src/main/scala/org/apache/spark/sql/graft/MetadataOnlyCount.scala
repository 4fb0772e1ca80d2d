package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Metadata-only `count(*)`: a groupless, filterless count over an ice
  * snapshot relation is answered from the LOG ALONE — every insert /
  * merge / rewrite records the file's physical row count in its marker
  * (`FileMarker.rowCount`, from the parquet footer at write time), so the
  * count is the sum the snapshot fold already holds. At 100 TB this is
  * `SELECT count(*) FROM t` in one driver-side fold with ZERO data-file
  * I/O and zero tasks — the Delta/Iceberg metadata-count fast path,
  * planned as a [[LocalRelation]].
  *
  * Safety comes from the PLAN SHAPE, not bookkeeping:
  *  - any `WHERE` leaves a `Filter` node → no match;
  *  - live deletion vectors overlay the scan as an anti-join → no match
  *    (only dv-free tables plan as a bare [[LogicalRelation]]);
  *  - merge-on-read FINAL, change feeds, etc. are all non-bare plans;
  *  - any alive marker WITHOUT a recorded row count (reference-written
  *    logs, pre-field history) disables the rewrite for that snapshot
  *    ([[graft.plans.IceFileIndex.metadataRowCount]] returns None);
  *  - `count(col)` (null-sensitive) does not match — only `count(1)` /
  *    `count(*)` literals do.
  *
  * Time-traveled relations carry their as-of snapshot in the same
  * FileIndex, so `SELECT count(*) ... TIMESTAMP AS OF ts` takes the fast
  * path against the historical file set. In-package because
  * [[LogicalRelation]] is `private[sql]` (same shim pattern as
  * [[StatsBridge]]).
  */
final class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Per-output-column value producer given the metadata count `n`:
    * `count(1)` / `count(*)` (non-distinct, unfiltered, literal child —
    * row-count semantics, never null-aware) yields `n`; a FOLDABLE
    * aggregate-free constant (CollapseProject folds `withColumn(lit(…))`
    * INTO the aggregate list) yields its evaluated value; anything else
    * blocks the rewrite. */
  /** Typed reconstruction of a marker's footer-stat string for the
    * EXACT numeric types (footer min/max are exact there; strings can be
    * TRUNCATED by the parquet writer and dates/timestamps are stored in
    * physical units — both refused). */
  private def typedStat(s: String,
      dt: org.apache.spark.sql.types.DataType): Option[Any] =
    try dt match {
      case LongType => Some(s.toLong)
      case IntegerType => Some(s.toInt)
      case ShortType => Some(s.toShort)
      case ByteType => Some(s.toByte)
      case DoubleType => Some(s.toDouble)
      case FloatType => Some(s.toFloat)
      case _ => None
    } catch { case _: NumberFormatException => None }

  private def valueFor(
      e: org.apache.spark.sql.catalyst.expressions.NamedExpression,
      n: => Option[Long],
      ix: graft.plans.IceFileIndex): Option[Any] =
    e match {
      case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete, false, None, _), _) =>
        n
      // min/max over a stats-covered EXACT-numeric column: the fold's
      // markers already hold every file's footer [min, max] — at 100 TB
      // `max(event_ts)`-style freshness probes cost zero data I/O
      case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _) =>
        ix.metadataMinMax(a.name).flatMap(mm => typedStat(mm._1, a.dataType))
      case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _) =>
        ix.metadataMinMax(a.name).flatMap(mm => typedStat(mm._2, a.dataType))
      case Alias(child, _)
          if child.foldable && child.deterministic &&
            !child.exists(_.isInstanceOf[AggregateExpression]) =>
        Some(child.eval())
      case _ => None
    }

  /** A metadata-answerable aggregate (cheap pre-filter before the
    * relation is even resolved). */
  private def isMetadataAgg(e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean =
    e match {
      case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete, false, None, _), _) => true
      case Alias(AggregateExpression(Min(_: AttributeReference), Complete, false, None, _), _) => true
      case Alias(AggregateExpression(Max(_: AttributeReference), Complete, false, None, _), _) => true
      case _ => false
    }

  /** Projections and aliases never change row COUNT; anything else
    * (Filter, Join, Generate, ...) must block the rewrite. */
  private def stripCountNeutral(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, child) => stripCountNeutral(child)
    case SubqueryAlias(_, child) => stripCountNeutral(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.exists(isMetadataAgg) =>
      stripCountNeutral(child) match {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location match {
            case ix: graft.plans.IceFileIndex =>
              lazy val n = ix.metadataRowCount
              val values = aggExprs.map(e => valueFor(e, n, ix))
              if (values.forall(_.isDefined))
                LocalRelation(agg.output,
                  Seq(InternalRow.fromSeq(values.map(_.get))))
              else agg
            case _ => agg
          }
          case _ => agg
        }
        case _ => agg
      }
  }
}
