package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed-step
  * grid and fill the gaps (last-observation-carried-forward and linear
  * interpolation) — the standard pre-processing step for monitoring
  * rollups, sensor fusion, and feature windows over an irregular stream.
  * (Reference scope: icedb delegates all query compute to engines; a
  * gap-aware resample is part of the analytics surface this engine adds,
  * like [[Sessions]] and [[AsOf]].)
  *
  * Scale shape: bucketing is a map-only integer truncation on the numeric
  * time axis (no double arithmetic — epoch-nanos exceed 2^53, so
  * `floor(ts / step)` through a double would corrupt the bucket). The
  * spine (every key × every step in the key's own [min, max] span) is
  * generated DISTRIBUTED — one row per key carries only (min, max), the
  * grid explodes from a `sequence()` on the executors, and values join
  * back on (key, bucket): one aggregation shuffle + one join shuffle on
  * the same key, regardless of corpus size. Fills are per-key window
  * scans (`last`/`first` with ignoreNulls) — one sort per key partition,
  * the same cost class as [[Sessions.sessionize]].
  *
  * Determinism: all fill arithmetic derives from integer counts and
  * integer bucket indices; interpolation divides two exactly-representable
  * longs in IEEE double, so any engine reproduces the bits (the oracle
  * replays LOCF and interpolation in DuckDB; see `ts_gapfill`).
  */
object Resample {

  /** Truncate a (long, e.g. epoch-nanos) time axis to its step-aligned
    * bucket start. Pure integer arithmetic: `ts - (ts mod step)`, exact at
    * any epoch magnitude. Negative inputs floor toward -inf (pmod). */
  def bucketStart(ts: Column, step: Long): Column =
    (ts - pmod(ts, lit(step))).cast("long")

  /** Aggregate to a regular grid: one row per (keys, bucket) that has at
    * least one input row, with the caller's aggregates applied. The
    * partial-aggregate (map-side combine) shape survives any corpus size:
    * the shuffle carries one row per populated bucket, not per event. */
  def resample(df: DataFrame, tsCol: String, step: Long,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.withColumn("_bucket", bucketStart(col(tsCol), step))
      .groupBy((keys :+ "_bucket").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_bucket", "bucket")

  /** Trailing rolling-window aggregates over a (key, bucket, value) grid:
    * for each row, sum/min/max/avg and the observation count over the
    * last `windowBuckets` grid points (current included). Meant to run on
    * [[gapFill]] output (a DENSE grid, so "last k rows" = "last k steps";
    * on a sparse series the row window would silently span gaps). One
    * window scan per key partition — same exchange the fill already paid,
    * so chaining resample → gapFill → rolling plans a single sort.
    *
    * Determinism: sum/min/max over integer-derived doubles are exact;
    * `roll_avg` divides the exact sum by the window row count (one
    * correctly-rounded division), so any engine replays the bits. */
  def rolling(grid: DataFrame, keyCol: String, valueCol: String,
      windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, "window must cover at least one bucket")
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(-(windowBuckets - 1L), Window.currentRow)
    val v = col(valueCol)
    grid
      .withColumn("roll_n", count(v).over(w))
      .withColumn("roll_sum", sum(v).over(w))
      .withColumn("roll_min", min(v).over(w))
      .withColumn("roll_max", max(v).over(w))
      .withColumn("roll_avg", col("roll_sum") / col("roll_n"))
  }

  /** Gap-fill one value column of a [[resample]] output over each key's
    * dense grid. Adds:
    *  - `present`  — 1 where the bucket had observations, else 0
    *  - `locf`     — last observation carried forward (leading gap: NULL)
    *  - `interp`   — linear interpolation between the surrounding
    *                 observations; leading/trailing gaps clamp to the
    *                 nearest observation (back-/forward-fill).
    * One aggregation shuffle (spans), one join shuffle (values onto the
    * grid), two window scans per key — no driver-side state. */
  def gapFill(resampled: DataFrame, keyCol: String, valueCol: String,
      step: Long, maxGridPerKey: Long = 10000000L): DataFrame = {
    val spans = resampled.groupBy(keyCol)
      .agg(min("bucket").as("_mn"), max("bucket").as("_mx"))
    // one key spanning years at a fine step would explode one enormous
    // array on one executor: fail loudly (lazily, inside the plan) with
    // the offending key instead of OOMing the task
    val gridLen = (col("_mx") - col("_mn")) / lit(step) + 1
    val guarded = spans.withColumn("_mn",
      when(gridLen > maxGridPerKey, raise_error(concat(
        lit(s"gapFill: grid exceeds $maxGridPerKey points for key "),
        col(keyCol).cast("string"),
        lit(" — widen step or split the key range")))
        .cast("long"))
        .otherwise(col("_mn")))
    val grid = guarded.select(col(keyCol),
      explode(sequence(col("_mn"), col("_mx"), lit(step))).as("bucket"))
    val joined = grid.join(
      resampled.select(col(keyCol), col("bucket"), col(valueCol)),
      Seq(keyCol, "bucket"), "left")
    val back = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsB = when(v.isNotNull, col("bucket"))
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevB = last(obsB, ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextB = first(obsB, ignoreNulls = true).over(fwd)
    // exact-long numerator/denominator; the one double division is
    // correctly rounded, so every engine agrees bit-for-bit
    val frac = (col("_b") - col("_pb")).cast("double") /
      (col("_nb") - col("_pb")).cast("double")
    joined
      .withColumn("present", when(v.isNotNull, 1).otherwise(0))
      .withColumn("locf", prevV)
      .withColumn("_pv", prevV).withColumn("_pb", prevB)
      .withColumn("_nv", nextV).withColumn("_nb", nextB)
      .withColumn("_b", col("bucket"))
      .withColumn("interp",
        when(col("_pv").isNull, col("_nv"))
          .when(col("_nv").isNull, col("_pv"))
          .when(col("_nb") === col("_pb"), col("_pv"))
          .otherwise(col("_pv") +
            (col("_nv") - col("_pv")) * frac))
      .drop("_pv", "_pb", "_nv", "_nb", "_b")
  }
}
