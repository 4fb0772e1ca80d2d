package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 word-k-shingle hashes of a text column, in ONE
  * generated call — the tokenize→shingle→hash front of MinHash dedup.
  *
  * Replaces the pipeline `posexplode(tokens(text))` → window `lead(k−1)`
  * (a full shuffle + per-doc sort of every token STRING) → multi-arg
  * `xxhash64` → `distinct` (a second shuffle) with a per-row loop: the
  * text is tokenized once, each k-window is hashed with the exact
  * seed-chained xxhash64 the builtin computes, and the per-doc distinct
  * happens in a local hash set — no token ever leaves the scan task.
  *
  * Bit-exact contract with the pipeline it replaces (pinned by
  * ShingleHashSpec against the old DataFrame shape):
  *  - tokens = `split(lower(trim(text)), "\\s+")` — the same
  *    UTF8String.trim / toLowerCase / split(regex, -1) calls the
  *    builtins make under the default collation;
  *  - docs with ≥ k tokens emit one hash per FULL window (positions
  *    0 .. n−k); shorter docs emit exactly one hash of the tokens
  *    padded to k with "" (the pipeline's `coalesce(lead(j), "")` on
  *    the `_p = 0` row);
  *  - hash = xxhash64(t_p, …, t_{p+k−1}): seed 42, each argument
  *    chained as the next seed — [[XxHash64Function]] itself computes
  *    every step;
  *  - first-occurrence order, duplicates dropped (the pipeline's
  *    global distinct on (id, hash) — per-doc distinct is the same set
  *    because the id rides alongside).
  */
case class ShingleHash(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  private val splitPattern = UTF8String.fromString("\\s+")

  /** The whole per-document computation; public so generated code can
    * call it (whole-stage codegen emits one invocation per row). */
  def shingle(text: UTF8String): ArrayData = {
    val parts: Array[UTF8String] =
      text.trim().toLowerCase().split(splitPattern, -1)
    val n = parts.length
    val empty = UTF8String.EMPTY_UTF8
    if (n < k) {
      var h = 42L
      var j = 0
      while (j < k) {
        val tok = if (j < n) parts(j) else empty
        h = XxHash64Function.hash(tok, StringType, h)
        j += 1
      }
      return UnsafeArrayData.fromPrimitiveArray(Array(h))
    }
    val out = new Array[Long](n - k + 1)
    var m = 0
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, 4096))
    var p = 0
    while (p <= n - k) {
      var h = 42L
      var j = 0
      while (j < k) {
        h = XxHash64Function.hash(parts(p + j), StringType, h)
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  override protected def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleHash].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.shingle($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}
