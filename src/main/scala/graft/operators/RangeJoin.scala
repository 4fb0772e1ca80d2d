package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-window range joins: match each left row with every right row
  * sharing its key whose time falls in `[l.ts - before, l.ts + after]` —
  * the "clicks within the hour before each purchase" / "sensor readings
  * around each alarm" co-occurrence shape.
  *
  * Spark's native plan for `l.key = r.key AND r.ts BETWEEN l.ts - x AND
  * l.ts + y` is a sort-merge join on the key with the range as a residual
  * filter: every (key) group still produces |L_k|×|R_k| comparison work,
  * which a hot key turns quadratic. ([[AsOf]] covers the nearest-ONE
  * variant; this operator returns ALL in-window matches.)
  *
  * Implementation: time bucketing. Both sides are assigned to fixed-width
  * time buckets (`width = before + after`, so a window spans at most two
  * buckets); the right side is exploded into each bucket it can serve
  * (exactly 2 rows per right row); the join is a plain EQUI-join on
  * (key, bucket) with the precise window as a cheap post-filter. The
  * shuffle carries (key, bucket) — per-group work is bounded by the
  * bucket's population, not the key's, so a hot key spread over time no
  * longer goes quadratic. Output cardinality equals the true match count
  * (dedup-free: each (left, right) pair meets in exactly one bucket —
  * the LEFT row's bucket, which the right row was exploded into).
  */
object RangeJoin {

  /** Windowed co-occurrence join on long (e.g. epoch) time values.
    *
    * @param left probe table; all columns pass through
    * @param right match table; `payload` columns are attached per match
    * @param leftKeys / rightKeys equality keys (positionally paired)
    * @param leftTime / rightTime long-typed time columns
    * @param before / after window bounds: matches satisfy
    *   `l.ts - before <= r.ts <= l.ts + after`; both >= 0, not both 0
    * @param payload right columns to attach (must not clash with left)
    * @return one row per (left row, in-window right row) pair, with
    *   `matchedTime` = the matched right row's time
    */
  def windowJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      before: Long,
      after: Long,
      payload: Seq[String]): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
      "range join needs at least one positionally-paired key")
    require(before >= 0 && after >= 0 && before + after > 0,
      "window must be non-degenerate: before, after >= 0, width > 0")
    val width = before + after

    val keyCols = leftKeys.indices.map(i => s"_k$i")
    // Bucket id = the window-width floor-multiple of the time, in PURE
    // LONG arithmetic (pmod floors correctly for negatives): a double
    // division would wobble at epoch-nanos magnitudes (> 2^53).
    def bucketOf(c: Column): Column = c - pmod(c, lit(width))

    val lt = col(leftTime)
    // Left row's bucket anchors the window start: bucket of (l.ts - before).
    val l = left.select(
      left.columns.map(col) ++
        leftKeys.zip(keyCols).map { case (c, k) => col(c).as(k) } :+
        bucketOf(lt - before).as("_b"): _*)

    // A right row at time t can serve left windows starting in
    // [t - width, t]: explode into bucket(t) and the one before it.
    val rt = col(rightTime)
    val r = right.select(
      rightKeys.zip(keyCols).map { case (c, k) => col(c).as(k) } ++
        Seq(rt.as("_rt"),
          explode(array(bucketOf(rt), bucketOf(rt) - width)).as("_b")) ++
        payload.map(col): _*)

    l.join(r, keyCols :+ "_b")
      .where(col("_rt") >= lt - before && col("_rt") <= lt + after)
      .select(left.columns.map(col) ++
        Seq(col("_rt").as("matchedTime")) ++ payload.map(col): _*)
  }
}
