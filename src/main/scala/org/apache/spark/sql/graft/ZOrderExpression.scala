package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) bit interleave of N pre-scaled dimensions: bit `i` of
  * dimension `j` lands at output bit `i*N + j`, so a lexicographic sort on
  * the result is a space-filling-curve sort in N dimensions. Each input is
  * masked to its low `bits` bits (callers scale values into `[0, 2^bits)`
  * first — see `graft.functions.ZOrder.scaled`).
  *
  * Why a native expression (extension level (b) of the build plan): the
  * equivalent built-in composition is `bits × N` shift/and/or Column ops —
  * a ~100-node expression tree interpreted per row at clustering time,
  * exactly where 100 TB of rows flow through. Here it is one generated
  * nested loop inside whole-stage codegen.
  *
  * Z-ordered files give EVERY interleaved dimension a bounded value range
  * per file, so log-side min/max stats prune files for predicates on any
  * of the dimensions — not just the leading sort key. (Same design as the
  * public lakehouse engines' OPTIMIZE ZORDER BY.)
  */
case class InterleaveBits(children: Seq[Expression], bits: Int)
    extends Expression with ImplicitCastInputTypes {

  require(children.nonEmpty, "interleave needs at least one dimension")
  require(bits > 0 && children.size * bits <= 63,
    s"${children.size} dims × $bits bits must fit in a positive long")

  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zvalue"

  private val mask = (1L << bits) - 1

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long] & mask
      var i = 0
      while (i < bits) {
        z |= ((x >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val x = ctx.freshName("x")
    val i = ctx.freshName("i")
    val anyNull = evals.map(_.isNull.toString).filter(_ != "false") match {
      case Nil => "false"
      case some => some.mkString(" || ")
    }
    val accumulate = evals.zipWithIndex.map { case (e, j) =>
      s"""
         |$x = ${e.value} & ${mask}L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  ${ev.value} |= (($x >>> $i) & 1L) << ($i * $n + $j);
         |}
       """.stripMargin
    }.mkString
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childCode = evals.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
         |$childCode
         |boolean ${ev.isNull} = $anyNull;
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  long $x;
         |  $accumulate
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
