package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, InterleaveBits}

/** Z-order (Morton) clustering keys: interleave N scaled dimensions into
  * one long so a range-partitioned write
  * ([[graft.ice.IceTable.insertClustered]]) gives every file a bounded
  * range in EVERY dimension — multi-column data skipping from the same
  * log-side min/max stats that single-key clustering uses.
  *
  * Usage shape:
  * {{{
  *   val z = ZOrder.zvalue(16,
  *     ZOrder.scaled(col("user_id"), 0, 1000, 16),
  *     ZOrder.scaled(col("ts"), t0, t1, 16))
  *   table.insertClustered(batch, z, numFiles = 64)
  * }}}
  */
object ZOrder {

  /** Morton interleave of pre-scaled long dimensions (each in
    * `[0, 2^bits)`): one codegen'd expression, not a `bits × dims` tree of
    * interpreted shift/or Columns. `dims * bits` must be ≤ 63. */
  def zvalue(bits: Int, dims: Column*): Column =
    ColumnBridge.column(
      InterleaveBits(dims.map(ColumnBridge.expression), bits))

  /** Scale a numeric column from `[lo, hi]` into `[0, 2^bits)`, clamped at
    * both ends (out-of-range values cluster at the edges rather than
    * wrapping). `lo`/`hi` come from domain knowledge or a cheap
    * `agg(min, max)` — exact bounds are NOT required for correctness, only
    * for clustering quality: stats pruning reads the real per-file
    * min/max, never the scale. */
  def scaled(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"scaled needs hi > lo, got [$lo, $hi]")
    require(bits > 0 && bits < 63, s"bits out of range: $bits")
    val top = (1L << bits) - 1
    val unit = (c.cast("double") - lit(lo)) / lit(hi - lo)
    // clamp in DOUBLE space before the long cast: an out-of-range (or NaN
    // — NaN orders above every double in Spark, so least() pins it to top)
    // value could otherwise overflow the ANSI cast into a query error
    greatest(lit(0.0), least(lit(top.toDouble), unit * lit(top.toDouble)))
      .cast("long")
  }
}
