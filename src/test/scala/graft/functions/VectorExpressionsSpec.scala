package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native DotProduct expression must agree exactly with the
  * higher-order-function reference form, in both whole-stage-codegen and
  * interpreted evaluation, including null/edge shapes. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0), Array(0.0, 0.0)),
    (3L, Array(-1.5, 2.5, 0.5, 1.0), Array(2.0, -3.0, 4.0, 0.25)),
    (4L, Array.empty[Double], Array.empty[Double])
  ).toDF("id", "a", "b")

  test("native dot == HOF dot (codegen on and off)") {
    Seq("true", "false").foreach { codegen =>
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val rows = vecs
          .select($"id",
            VectorExpressions.dotNative($"a", $"b").as("native"),
            Similarity.dot($"a", $"b").as("hof"))
          .collect()
        rows.foreach { r =>
          assert(r.getDouble(1) == r.getDouble(2),
            s"id=${r.getLong(0)} codegen=$codegen: ${r.getDouble(1)} vs ${r.getDouble(2)}")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("null vector yields null; float arrays implicitly cast") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (2L, None: Option[Array[Float]], Some(Array(1.0f)))
    ).toDF("id", "fa", "fb")
    val out = df.select($"id",
      VectorExpressions.dotNative($"fa", $"fb").as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty)
  }

  test("expression survives a full ANN query (plan uses graft_dot)") {
    val emb = (0L until 50L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j)))).toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, dim = 8)
    assert(top.count() == 10)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan.take(1500))
  }
}
