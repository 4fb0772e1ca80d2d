package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The materialized-view double-write recipe (reference:
  * examples/materialized-view.py:44-98) and the union-by-name seeding idiom
  * over an evolved schema (README.md:672-687). The reference's oracle: the
  * MV's `sum(cnt)` equals the raw table's `count(*)` at every lifecycle
  * point — after each double-write, after the raw table compacts, and after
  * the MV compacts (materialized-view.py:112-118).
  */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range): DataFrame =
    ids.map(i => (i.toLong, i % 7L, s"type_${i % 3}"))
      .toDF("event_id", "user_id", "event_type")

  test("MV double-write: sum(cnt) == raw count(*) across both compactions") {
    val rawTable = new IceTable(spark, tmpDir("mv_raw"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod($"user_id", lit(4))),
      sortOrder = Seq("user_id", "event_id")))
    val mvTable = new IceTable(spark, tmpDir("mv_agg"), IceTableConfig(
      partitionExpr = concat(lit("e="), $"event_type"),
      sortOrder = Seq("user_id"),
      customInsertSql = Some(
        "select user_id, event_type, cast(count(*) as bigint) as cnt " +
          "from _rows group by user_id, event_type"),
      customMergeSql = Some(
        "select user_id, event_type, cast(sum(cnt) as bigint) as cnt " +
          "from source_files group by user_id, event_type")))

    def rawCount(): Long = rawTable.read().count()
    def mvSum(): Long = mvTable.read().agg(sum($"cnt")).collect()(0).getLong(0)

    Seq(batch(0 until 40), batch(40 until 90)).foreach { b =>
      rawTable.insert(b) // app-side double-write (materialized-view.py:91-98)
      mvTable.insert(b)
      assert(mvSum() == rawCount())
    }
    assert(rawCount() == 90L)

    rawTable.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(mvSum() == rawCount())
    mvTable.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(mvSum() == rawCount())

    // per-key totals also survive: MV groups == raw group-by
    val mvByType = mvTable.read().groupBy($"event_type")
      .agg(sum($"cnt").as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rawByType = rawTable.read().groupBy($"event_type")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mvByType == rawByType)
  }

  test("B18 seeding: custom merge over evolved schema defaults cnt to 1") {
    val table = new IceTable(spark, tmpDir("seeded"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod($"user_id", lit(4))),
      sortOrder = Seq("user_id"),
      customMergeSql = Some(
        "select user_id, event_type, cast(sum(coalesce(cnt, 1)) as bigint) as cnt " +
          "from source_files group by user_id, event_type")))

    // pre-evolution rows: no cnt column
    table.insert(batch(0 until 40))
    // post-evolution rows: pre-aggregated with cnt
    table.insert(batch(40 until 90)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).cast("bigint").as("cnt")))

    // query-time seeding (unmerged pre-evolution files read cnt as null)
    def total(): Long = table.read()
      .agg(sum(coalesce($"cnt", lit(1L)))).collect()(0).getLong(0)
    assert(total() == 90L)

    table.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(total() == 90L)
    // after full compaction every row carries a real cnt
    assert(table.read().where($"cnt".isNull).count() == 0L)
  }
}
