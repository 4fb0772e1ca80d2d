package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Physical-plan inspection helpers shared by specs and the graded
  * self-verifying queries: AQE hides executed subtrees inside
  * [[QueryStageExec]] leaves, so a naive `plan.collect` misses every scan
  * after execution — this recurses through stages and reused exchanges. */
object PlanScans {

  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
    case s: FileSourceScanExec => Seq(s)
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case qs: QueryStageExec => fileScans(qs.plan)
    case r: ReusedExchangeExec => fileScans(r.child)
  }.flatten

  def fileScans(df: DataFrame): Seq[FileSourceScanExec] =
    fileScans(df.queryExecution.executedPlan)

  /** The scan over the largest static file set — in a star join, the fact
    * table's. */
  def factScan(df: DataFrame): FileSourceScanExec = {
    val scans = fileScans(df)
    require(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.maxBy(_.relation.location.inputFiles.length)
  }
}
