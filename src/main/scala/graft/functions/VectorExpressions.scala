package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, DotProduct}

/** Public surface for the native vector expressions (the expression class
  * itself lives in `org.apache.spark.sql.graft` — see the note on
  * [[org.apache.spark.sql.graft.ColumnBridge]]). */
object VectorExpressions {
  /** Codegen'd native dot product over two numeric array columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
