package graft.plans

import graft.SparkSpec
import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.functions._

/** `MERGE INTO graft.<t>` through the catalog (round 8): the DML trio is
  * complete — matched keys replaced / deleted, unmatched appended, one
  * atomic engine commit per statement. */
class SqlMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): (IceTable, String) = {
    val dir = tmpDir(name)
    val t = new IceTable(spark, dir, IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))
    t.insert((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val f = new java.io.File(dir)
    spark.conf.set(IceSqlResolution.WarehouseKey, f.getParent)
    (t, s"graft.`${f.getName}`")
  }

  test("UPDATE SET * + INSERT * = full upsert, atomically") {
    val (t, ident) = freshTable("merge_full")
    (90L until 110L).map(i => (i, "m")).toDF("id", "v")
      .createOrReplaceTempView("merge_src")
    val logsBefore = t.logio.currentLogFiles(t.root).length
    val r = spark.sql(
      s"""MERGE INTO $ident AS tgt USING merge_src AS src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(r.head.getLong(0) == 10L, s"matched ${r.head.getLong(0)}") // 90..99
    assert(r.head.getLong(1) == 20L) // whole source copied
    assert(t.logio.currentLogFiles(t.root).length == logsBefore + 1,
      "must be ONE atomic commit")
    assert(t.read().count() == 110)
    assert(t.read().where(col("v") === "m").count() == 20)
    assert(t.read().where(col("id") === 95L).select("v").head.getString(0) == "m")
  }

  test("UPDATE SET * alone touches only matched keys") {
    val (t, ident) = freshTable("merge_upd")
    (95L until 105L).map(i => (i, "u")).toDF("id", "v")
      .createOrReplaceTempView("merge_src_u")
    spark.sql(
      s"""MERGE INTO $ident USING merge_src_u AS src
         |ON `${new java.io.File(t.root).getName}`.id = src.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    assert(t.read().count() == 100, "unmatched source rows must NOT insert")
    assert(t.read().where(col("v") === "u").count() == 5) // 95..99
  }

  test("WHEN MATCHED THEN DELETE removes the matched keys") {
    val (t, ident) = freshTable("merge_del")
    (40L until 60L).map(i => (i, "x")).toDF("id", "v")
      .createOrReplaceTempView("merge_src_d")
    val r = spark.sql(
      s"""MERGE INTO $ident AS tgt USING merge_src_d AS src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN DELETE""".stripMargin).collect()
    assert(r.head.getLong(0) == 20L)
    assert(t.read().count() == 80)
    assert(t.read().where(col("id").between(40, 59)).count() == 0)
  }

  test("INSERT * alone appends only unmatched keys") {
    val (t, ident) = freshTable("merge_ins")
    (90L until 120L).map(i => (i, "n")).toDF("id", "v")
      .createOrReplaceTempView("merge_src_i")
    val r = spark.sql(
      s"""MERGE INTO $ident AS tgt USING merge_src_i AS src
         |ON tgt.id = src.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(r.head.getLong(1) == 20L) // 100..119
    assert(t.read().count() == 120)
    assert(t.read().where(col("id") === 95L).select("v").head.getString(0) == "v95",
      "matched rows untouched")
  }

  test("unqualified same-name ON keys resolve against the log schema") {
    val (t, ident) = freshTable("merge_unq")
    (95L until 105L).map(i => (i, "u")).toDF("id", "v")
      .createOrReplaceTempView("merge_src_unq")
    // no aliases anywhere: the key must come from name membership on both
    // sides (target side = the table's log schema when still unresolved)
    val r = spark.sql(
      s"""MERGE INTO $ident USING merge_src_unq
         |ON id = id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(r.head.getLong(0) == 5L) // 95..99 matched
    assert(t.read().count() == 105)
    assert(t.read().where(col("v") === "u").count() == 10)
  }

  test("unsupported merge shapes are rejected loudly") {
    val (_, ident) = freshTable("merge_bad")
    (0L until 5L).map(i => (i, "x")).toDF("id", "v")
      .createOrReplaceTempView("merge_src_b")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $ident AS tgt USING merge_src_b AS src
           |ON tgt.id = src.id
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("two commits")), e)
  }
}
