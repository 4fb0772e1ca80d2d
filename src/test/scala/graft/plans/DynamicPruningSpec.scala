package graft.plans

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dynamic partition pruning through the ice catalog relation: a join
  * against a filtered dimension on the partition key prunes ice files AT
  * RUNTIME — the fact-side scan never reads partitions the dim filter
  * eliminated, even though no literal predicate on the partition column
  * exists in the query. This is what makes star-schema joins on a 100 TB
  * fact table viable: the scan is bounded by the dim selectivity, not the
  * table size. Spark's PartitionPruning rule applies to any
  * HadoopFsRelation with a non-empty partitionSchema, which is exactly
  * what IceFileIndex exposes — no extra code, but the capability only
  * exists because the index routes partition values through
  * partitionSchema instead of baking file lists into the plan.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  private def factTable(): IceTable = {
    val days = (1 to 20).map(d => f"2024-01-$d%02d")
    val df = days.zipWithIndex.flatMap { case (day, i) =>
      (0 until 50).map(j => (i * 50L + j, day, (i * 50 + j) % 7))
    }.toDF("id", "day", "v")
    val table = new IceTable(spark, tmpDir("dpp_fact"), IceTableConfig(
      partitionExpr = concat(lit("d="), col("day")),
      sortOrder = Seq("id")))
    table.insert(df)
    table
  }

  private def scanOf(q: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    PlanScans.factScan(q)

  test("join against a filtered dim dynamically prunes ice partition files") {
    val table = factTable()
    IceFileIndex.registerView(spark, table, "dpp_fact")
    // the dim must be file-backed: an in-memory Seq constant-folds into a
    // LocalRelation whose filter disappears before PartitionPruning runs
    val dimPath = tmpDir("dpp_dim_pq")
    Seq(("2024-01-03", "keep"), ("2024-01-11", "keep"), ("2024-01-17", "drop"))
      .toDF("day", "tag").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("dpp_dim")

    val q = spark.sql(
      """select count(*) as cnt
        |from dpp_fact f join dpp_dim m on f.d = m.day
        |where m.tag = 'keep'""".stripMargin)
    // execute q itself (.as[Long] would build a new QueryExecution whose
    // scan instance never runs, leaving all metrics zero)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(100L)) // 2 kept days x 50 rows

    val scan = scanOf(q)
    val pf = scan.metadata("PartitionFilters")
    assert(pf.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression in PartitionFilters, got: $pf")

    // runtime effect: of 20 static day partitions, only the 2 the dim
    // filter kept were actually read
    val numFiles = scan.metrics("numFiles").value
    val staticFiles = scan.metrics.get("staticFilesNum").map(_.value)
      .getOrElse(scan.relation.location.inputFiles.length.toLong)
    assert(numFiles < staticFiles,
      s"dynamic pruning read $numFiles of $staticFiles files — no runtime skip")
    assert(numFiles <= 2L, s"expected <=2 files read, got $numFiles")
  }

  test("dynamically pruned join returns the same rows as the unpruned plan") {
    val table = factTable()
    IceFileIndex.registerView(spark, table, "dpp_fact2")
    val dimPath = tmpDir("dpp_dim2_pq")
    Seq(("2024-01-05", 1), ("2024-01-06", 2)).toDF("day", "w")
      .write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("dpp_dim2")
    val q = spark.sql(
      """select f.d, sum(f.v * m.w) as s, count(*) as cnt
        |from dpp_fact2 f join dpp_dim2 m on f.d = m.day
        |group by f.d order by f.d""".stripMargin)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // oracle computed without the ice path
    val expect = spark.sql(
      """select day as d, sum(v * w) as s, count(*) as cnt from (
        |  select f.day, f.v, m.w
        |  from (select id, day, v from dpp_fact2) f
        |  join dpp_dim2 m on f.day = m.day) group by day order by day""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq && got.length == 2)
  }
}
