package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  private def valueFor(
      e: org.apache.spark.sql.catalyst.expressions.NamedExpression,
      n: Long): Option[Any] =
    e match {
      case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete, false, None, _), _) =>
        Some(n)
      case Alias(child, _)
          if child.foldable && child.deterministic &&
            !child.exists(_.isInstanceOf[AggregateExpression]) =>
        Some(child.eval())
      case _ => None
    }

  private def isCountStar(e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean =
    e match {
      case Alias(AggregateExpression(Count(Seq(_: Literal)), Complete, false, None, _), _) => true
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
        if aggExprs.exists(isCountStar) &&
          aggExprs.forall(e => valueFor(e, 0L).isDefined) =>
      stripCountNeutral(child) match {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location match {
            case ix: graft.plans.IceFileIndex => ix.metadataRowCount match {
              case Some(n) =>
                LocalRelation(agg.output,
                  Seq(InternalRow.fromSeq(
                    aggExprs.map(e => valueFor(e, n).get))))
              case None => agg
            }
            case _ => agg
          }
          case _ => agg
        }
        case _ => agg
      }
  }
}
