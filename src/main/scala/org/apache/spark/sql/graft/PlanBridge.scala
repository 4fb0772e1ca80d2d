package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** In-package shim for the one plan-level call an analyzer rule needs:
  * wrapping an already-resolved [[LogicalPlan]] node back into a
  * DataFrame (`Dataset.ofRows` is `private[sql]`). Same bridge pattern as
  * [[StreamBridge]] / [[ColumnBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** A Column's Catalyst expression, EAGERLY converted (no session
    * needed): `ExpressionUtils.expression` returns a lazy
    * `ColumnNodeExpression` wrapper whose `.sql`/`.references` are
    * meaningless until resolution — this runs the standard converter so
    * the unresolved tree (and its round-trippable `.sql`) is available
    * driver-side, e.g. to persist a partition expression in the log. */
  def eagerExpression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
