package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native product-quantization expressions (see [[ColumnBridge]] for why
  * they live in this package): the PQ encode step used to be a
  * posexplode → broadcast join → two hash aggregates pipeline (8× row
  * multiplication plus two exchanges per corpus scan); at 100 TB the
  * encode is a pure per-row function of the vector and a driver-sized
  * codebook, so it belongs in ONE generated loop inside whole-stage
  * codegen — the same argument that produced [[DotProduct]].
  *
  * Semantics are identical to the DataFrame pipeline they replace
  * (the posexplode/min_by cell assignment): per subspace `j`, the chosen cell
  * minimizes `‖c‖² − 2·s·c` (the self-dot of the subvector is constant
  * across candidates), ties pick the smallest cell id, null vector
  * elements contribute zero, and a vector shorter than `j·dsub` yields
  * an empty slice (the cell with the smallest `‖c‖²` wins).
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private def m: Int = codebook.length
  private def ksub: Int = if (m == 0) 0 else codebook.head.length
  private def dsub: Int =
    codebook.iterator.flatten.map(_.length).maxOption.getOrElse(0)

  /** Cells flattened to (m·ksub·dsub) with zero padding — a short cell
    * (a ragged training row's prefix slice) dots identically when padded
    * with zeros, so the flat layout is exact, not approximate. */
  @transient private lazy val cells: Array[Double] = {
    val flat = new Array[Double](m * ksub * dsub)
    for (j <- 0 until m; k <- 0 until ksub) {
      val cell = codebook(j)(k)
      var i = 0
      while (i < cell.length) { flat((j * ksub + k) * dsub + i) = cell(i); i += 1 }
    }
    flat
  }
  /** Per-cell self dots ‖c‖², indexed j·ksub + k. */
  @transient private lazy val cc: Array[Double] = {
    val out = new Array[Double](m * ksub)
    for (j <- 0 until m; k <- 0 until ksub) {
      val cell = codebook(j)(k)
      var s = 0.0; var i = 0
      while (i < cell.length) { s += cell(i) * cell(i); i += 1 }
      out(j * ksub + k) = s
    }
    out
  }

  private def encode(v: ArrayData): Array[Short] = {
    val out = new Array[Short](m)
    var j = 0
    while (j < m) {
      val off = j * dsub
      val end = math.min(off + dsub, v.numElements())
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < ksub) {
        var dot = 0.0
        val base = (j * ksub + k) * dsub
        var i = off
        while (i < end) {
          if (!v.isNullAt(i)) dot += v.getDouble(i) * cells(base + (i - off))
          i += 1
        }
        val d2 = cc(j * ksub + k) - 2.0 * dot
        if (d2 < bestD) { bestD = d2; best = k } // strict <: ties keep smallest
        k += 1
      }
      out(j) = best.toShort
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(encode(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("pqCells", cells, "double[]")
    val ccRef = ctx.addReferenceObj("pqCc", cc, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val end = ctx.freshName("end")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dotv = ctx.freshName("dotv")
      val d2 = ctx.freshName("d2")
      val base = ctx.freshName("base")
      s"""
         |short[] $out = new short[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $dsub;
         |  int $end = java.lang.Math.min($off + $dsub, $v.numElements());
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $k = 0; $k < $ksub; $k++) {
         |    double $dotv = 0.0;
         |    int $base = ($j * $ksub + $k) * $dsub;
         |    for (int $i = $off; $i < $end; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $dotv += $v.getDouble($i) * $cellsRef[$base + ($i - $off)];
         |      }
         |    }
         |    double $d2 = $ccRef[$j * $ksub + $k] - 2.0 * $dotv;
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $k; }
         |  }
         |  $out[$j] = (short) $best;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC (asymmetric-distance) lookup sum: `Σ_j lut[j][code[j]]` — the PQ
  * scoring inner loop. The higher-order `aggregate(zip_with(element_at))`
  * form it replaces evaluated interpreted (three closure dispatches per
  * subspace per candidate); this is one generated loop. A null or
  * out-of-range code entry contributes zero (the HOF form poisoned the
  * whole sum to null — unreachable on well-formed codes either way). */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ShortType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(code.numElements(), lut.numElements())
    var s = 0.0
    var j = 0
    while (j < n) {
      if (!code.isNullAt(j) && !lut.isNullAt(j)) {
        val row = lut.getArray(j)
        val idx = code.getShort(j).toInt
        if (idx >= 0 && idx < row.numElements() && !row.isNullAt(idx))
          s += row.getDouble(idx)
      }
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val idx = ctx.freshName("idx")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j) && !$b.isNullAt($j)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($j);
         |    int $idx = (int) $a.getShort($j);
         |    if ($idx >= 0 && $idx < $row.numElements() && !$row.isNullAt($idx)) {
         |      $s += $row.getDouble($idx);
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
