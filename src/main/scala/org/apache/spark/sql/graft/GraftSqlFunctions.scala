package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor, Divide, Expression, Multiply, Sqrt}

/** SQL surface for the native graft expressions: after `register(spark)`,
  * plain `spark.sql(...)` (and therefore the HTTP query API, B22-style
  * bound UDFs, and any SQL-speaking client) can call
  *
  *   - `graft_dot(a, b)`      — codegen'd array dot product ([[DotProduct]])
  *   - `graft_cosine(a, b)`   — cosine similarity composed from three
  *                              native dots (norms computed per row)
  *   - `graft_hamming64(a, b)`— Hamming distance of two 64-bit fingerprints
  *
  * These register as session temp functions straight into the analyzer's
  * [[org.apache.spark.sql.catalyst.analysis.FunctionRegistry]] — the same
  * mechanism `SparkSessionExtensions.injectFunction` uses at session build
  * time, usable on an already-running session. Everything stays inside
  * whole-stage codegen: no UDF boxing anywhere (the reference binds scalar
  * Python UDFs into DuckDB for the same purpose, examples/custom-udf.py —
  * this is the Catalyst-native equivalent).
  *
  * Lives in the `org.apache.spark.sql` package tree because
  * `sessionState` is `private[sql]` in Spark 4 (see [[ColumnBridge]]).
  */
object GraftSqlFunctions {

  private def dot(a: Expression, b: Expression): Expression = DotProduct(a, b)

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_dot",
      (es: Seq[Expression]) => dot(es(0), es(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_cosine",
      (es: Seq[Expression]) =>
        Divide(dot(es(0), es(1)),
          Multiply(Sqrt(dot(es(0), es(0))), Sqrt(dot(es(1), es(1))))),
      "built-in")
    registry.createOrReplaceTempFunction("graft_hamming64",
      (es: Seq[Expression]) => BitwiseCount(BitwiseXor(es(0), es(1))), "built-in")
    // bloom build/probe (see GraftExtensions for the injected twins)
    registry.createOrReplaceTempFunction("graft_bloom_agg",
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2)), "built-in")
    registry.createOrReplaceTempFunction("graft_might_contain",
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1)),
      "built-in")
  }
}
