package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of event streams — the standard product-
  * analytics operator (a session is a maximal run of a user's events with
  * inter-event gaps <= `gapNs`), expressed as two stacked window
  * functions: a lag to mark session starts, a running sum to number them.
  *
  * Scale shape: ONE shuffle on the user key; both windows and the
  * per-session aggregate reuse that partitioning (Catalyst plans a single
  * exchange). Timestamps stay integer nanos end to end, so session
  * boundaries are exact and engine-portable. Hot users (10^6-event
  * histories landing on one task) are the documented skew caveat shared
  * with the as-of join — `Skew.saltedJoin`'s sharding composes here by
  * splitting a user's history at day boundaries first (sessions never
  * span the split when the gap threshold is below the split granularity).
  */
object Sessions {

  /** Tag each event with its user's 1-based session ordinal
    * (`session_seq`). Ties on the timestamp break on `tieCol` so the
    * numbering is a pure function of the data. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapNs: Long): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(order)
    val starts = when(prev.isNull || col(tsCol) - prev > gapNs, 1L)
      .otherwise(0L)
    df.withColumn("session_seq", sum(starts).over(run))
  }

  /** Per-session rollup: (user, session_seq, n_events, start_ns, end_ns,
    * span_ns). Same key partitioning as [[sessionize]] — no extra
    * shuffle beyond the user exchange. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapNs: Long): DataFrame =
    sessionize(df, userCol, tsCol, tieCol, gapNs)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ns"),
        max(col(tsCol)).as("end_ns"),
        (max(col(tsCol)) - min(col(tsCol))).as("span_ns"))
}
