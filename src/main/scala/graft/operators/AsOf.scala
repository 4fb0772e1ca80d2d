package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) joins for time-series enrichment: for each left
  * row, attach the payload of the temporally nearest right row with the
  * same key — the classic "last known quote for this trade" / "latest
  * profile state at event time" operator. Spark has no built-in as-of
  * join; the naive formulations both collapse at scale:
  *
  *  - range join (`l.key = r.key AND r.ts <= l.ts` + per-row max) explodes
  *    to O(|matches|) intermediate rows before the aggregate — a user with
  *    10⁴ right rows multiplies every left row by 10⁴;
  *  - per-key `collect_list` + binary-search UDF moves whole histories
  *    through a shuffle as arrays and gives up codegen.
  *
  * This implementation is the union-merge shape (the one production
  * systems use — e.g. Flink temporal joins): tag both inputs, union them,
  * and run ONE window over (key, time, side). `last(payload, ignoreNulls)`
  * over rows-between(unboundedPreceding, current) then fills each left row
  * with the most recent right payload in scan order. Cost at any scale:
  * one shuffle on the key + one per-key sort — identical to a single
  * groupBy, with no row multiplication anywhere.
  *
  * Hot keys: one key's whole history lands in ONE window partition (one
  * task — AQE splits shuffle partitions, never a window partition). The
  * work stays strictly LINEAR in that key's row count (sort + one scan,
  * spilling if needed) — a 10⁶-row single-key history completes in
  * seconds (SkewSpec) where the range-join formulation would do 10¹²
  * comparisons. For histories beyond what one task should sort, shard
  * time-ranges explicitly: process left by time-slice with the right side
  * pre-filtered to `[sliceStart - maxLookback, sliceEnd]`, or
  * pre-aggregate the right side to the per-(key, slice) last row first —
  * both compose from this operator unchanged. Key-salting
  * ([[Skew.saltedJoin]]) does NOT apply here: as-of needs the full
  * per-key time order, and a salted split would lose cross-shard
  * lookback.
  *
  * Direction semantics match pandas `merge_asof` / DuckDB `ASOF JOIN`:
  *  - backward (default): latest right row with `r.ts <= l.ts`
  *  - forward: earliest right row with `r.ts >= l.ts`
  * Ties on (key, time) between left and right are inclusive. If multiple
  * right rows share one (key, time), the payload is taken from the one
  * sorting last on `(time, payload-struct)` — deterministic, but callers
  * wanting a specific rule should pre-aggregate the right side to unique
  * (key, time) rows.
  */
object AsOf {

  /** Left as-of join.
    *
    * @param left left (probe) table; all its columns pass through
    * @param right right (reference) table
    * @param leftKeys / rightKeys equality key columns (positionally paired)
    * @param leftTime / rightTime event-time columns (any orderable type)
    * @param payload right columns to attach; emitted under their own names
    *   (plus `matchedTime` = the matched right row's time). Must not clash
    *   with left column names.
    * @param direction "backward" (r.ts <= l.ts, latest) or "forward"
    *   (r.ts >= l.ts, earliest)
    * @param tolerance optional closeness predicate on (earlierTime,
    *   laterTime) — (matchedTime, leftTime) for backward, swapped for
    *   forward — e.g. for timestamps
    *   `(a, b) => b.cast("long") - a.cast("long") <= 3600`.
    *   Out-of-tolerance matches are nulled (left semantics preserved).
    * @param joinType "left" (keep unmatched left rows with null payload) or
    *   "inner" (drop them)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      direction: String = "backward",
      tolerance: Option[(Column, Column) => Column] = None,
      joinType: String = "left"): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "as-of join needs at least one positionally-paired key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(joinType == "left" || joinType == "inner",
      s"joinType must be left|inner, got $joinType")
    require(payload.nonEmpty, "as-of join needs at least one payload column")

    val keyCols = leftKeys.indices.map(i => s"_k$i")
    val t = "_t"; val side = "_side"
    val pCols = payload.map(p => s"_r_$p")
    val mt = "_r_time"

    // Right rows carry only (keys, time, payload): the union is as narrow
    // as the payload, not as wide as the left row.
    val rightPart = right.select(
      rightKeys.zip(keyCols).map { case (c, k) => col(c).as(k) } ++
        Seq(col(rightTime).as(t), lit(0).as(side), col(rightTime).as(mt)) ++
        payload.zip(pCols).map { case (c, p) => col(c).as(p) }: _*)
    val leftPart = left.select(
      left.columns.map(col) ++
        leftKeys.zip(keyCols).map { case (c, k) => col(c).as(k) } ++
        Seq(col(leftTime).as(t), lit(1).as(side),
          lit(null).cast(rightPart.schema(mt).dataType).as(mt)) ++
        payload.zip(pCols).map { case (c, p) =>
          lit(null).cast(rightPart.schema(p).dataType).as(p) }: _*)
    val unioned = rightPart
      .select(leftPart.columns.map(c =>
        if (rightPart.columns.contains(c)) col(c)
        else lit(null).cast(leftPart.schema(c).dataType).as(c)): _*)
      .unionByName(leftPart)

    // Scan order: by time (reversed for forward), right-before-left on
    // equal times so ties are inclusive in both directions.
    // Tiebreak on the payload struct makes duplicate-(key, time) right
    // rows resolve deterministically (the struct sorting last wins).
    val timeOrd = if (direction == "backward") col(t).asc else col(t).desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrd, col(side).asc, struct(pCols.map(col): _*).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn(mt, last(col(mt), ignoreNulls = true).over(w))
      .withColumns(pCols.map(p =>
        p -> last(col(p), ignoreNulls = true).over(w)).toMap)
      .where(col(side) === 1)

    // Tolerance: null the payload (not the row) when the match is too far.
    val inTol = tolerance match {
      case None => col(mt).isNotNull
      case Some(pred) => col(mt).isNotNull &&
        (if (direction == "backward") pred(col(mt), col(t))
         else pred(col(t), col(mt)))
    }
    val withPayload = filled.select(
      left.columns.map(col) ++
        Seq(when(inTol, col(mt)).otherwise(lit(null)).as("matchedTime")) ++
        payload.zip(pCols).map { case (out, p) =>
          when(inTol, col(p)).otherwise(lit(null)).as(out) }: _*)

    if (joinType == "inner") withPayload.where(col("matchedTime").isNotNull)
    else withPayload
  }
}
