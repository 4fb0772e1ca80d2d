package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bridge between the public Column API and Catalyst Expressions: the
  * `Column(expr)` constructor became `private[sql]` with Spark 4's connect
  * split, and libraries shipping native expressions use exactly this
  * in-package shim (same pattern as Delta/Sedona). Confined to this
  * package — everything else in graft stays on public API. (The custom
  * expression below also lives here because `AbstractDataType`, required
  * to declare `inputTypes`, is `private[sql]` in Spark 4.)
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Native Catalyst expression for the embedding dot product: a single
  * `while` loop over the two `ArrayData` buffers, generated into
  * whole-stage codegen via [[doGenCode]]. This is extension level (b) of
  * the build plan — used where composing built-ins is measurably worse:
  * the higher-order `aggregate(zip_with(...))` form evaluates interpreted,
  * and a fixed-dim `element_at` unroll re-checks bounds per element and
  * needs the dimension at plan time. The native loop handles any dimension
  * at codegen speed.
  *
  * Null elements inside a vector are skipped (zero contribution); a null
  * vector yields null (BinaryExpression's default null intolerance).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
