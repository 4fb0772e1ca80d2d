package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{AdcDot, ColumnBridge, DotProduct, PqEncode}

/** Public surface for the native vector expressions (the expression class
  * itself lives in `org.apache.spark.sql.graft` — see the note on
  * [[org.apache.spark.sql.graft.ColumnBridge]]). */
object VectorExpressions {
  /** Codegen'd native dot product over two numeric array columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd product-quantization encode: vector → array<smallint> of
    * per-subspace nearest-cell ids, against a driver-sized codebook
    * (`codebook(j)(k)` = cell k of subspace j). One generated loop —
    * see [[org.apache.spark.sql.graft.PqEncode]]. */
  def pqEncodeNative(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebook))

  /** Codegen'd ADC lookup sum `Σ_j lut[j][code[j]]` — see
    * [[org.apache.spark.sql.graft.AdcDot]]. */
  def adcDotNative(code: Column, lut: Column): Column =
    ColumnBridge.column(AdcDot(
      ColumnBridge.expression(code), ColumnBridge.expression(lut)))
}
