package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.graft.GraftSqlFunctions

/** SQL-registered native functions: graft_dot / graft_cosine /
  * graft_hamming64 callable from plain `spark.sql`, evaluated as native
  * Catalyst expressions (no UDF boxing). */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot / graft_cosine / graft_hamming64 from plain SQL") {
    GraftSqlFunctions.register(spark)
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0))
    ).toDF("id", "a", "b").createOrReplaceTempView("vecs")

    val r = spark.sql(
      """select id, graft_dot(a, b) as d, round(graft_cosine(a, b), 9) as c
        |from vecs order by id""".stripMargin)
      .as[(Long, Double, Double)].collect().toSeq
    assert(r(0)._2 == 32.0) // 4 + 10 + 18
    assert(math.abs(r(0)._3 - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-9)
    assert(r(1)._2 == 1.0 && r(1)._3 == 1.0)

    val h = spark.sql(
      "select graft_hamming64(5, 6) as h").as[Int].head() // 101 vs 110
    assert(h == 2)

    // float arrays coerce via ImplicitCastInputTypes, like the Column form
    Seq((1L, Array(1.0f, 2.0f))).toDF("id", "f")
      .createOrReplaceTempView("fvecs")
    assert(spark.sql("select graft_dot(f, f) as d from fvecs")
      .as[Double].head() == 5.0)

    // the SQL form IS the native expression: same plan as dotNative
    val sqlPlan = spark.sql("select graft_dot(a, b) from vecs")
      .queryExecution.optimizedPlan.toString
    assert(sqlPlan.contains("graft_dot"), s"expected native expr in: $sqlPlan")
    assert(!sqlPlan.toLowerCase.contains("scalaudf"), "no UDF boxing")
  }
}
