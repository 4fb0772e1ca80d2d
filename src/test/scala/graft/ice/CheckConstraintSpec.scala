package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(cs: (String, String)*) = IceTableConfig(
    partitionExpr = concat(lit("p="), pmod(col("id"), lit(2))),
    sortOrder = Seq("id"),
    checkConstraints = cs.toSeq)

  test("violating insert is rejected before any write; table unchanged") {
    val t = new IceTable(spark, tmpDir("chk"), cfg(
      "pos_v" -> "v > 0", "known_k" -> "k in ('a','b')"))
    t.insert(Seq((1L, 5L, "a"), (2L, 1L, "b")).toDF("id", "v", "k"))
    val e = intercept[IllegalArgumentException] {
      t.insert(Seq((3L, -1L, "a"), (4L, 2L, "zzz")).toDF("id", "v", "k"))
    }
    assert(e.getMessage.contains("pos_v") || e.getMessage.contains("known_k"))
    assert(t.read().count() == 2L) // nothing landed
    assert(t.history().count() == 1L) // no commit either
  }

  test("NULL predicate passes (SQL CHECK semantics)") {
    val t = new IceTable(spark, tmpDir("chk"), cfg("pos_v" -> "v > 0"))
    t.insert(Seq((1L, Some(5L)), (2L, None)).toDF("id", "v"))
    assert(t.read().count() == 2L)
  }

  test("a constraint over a column absent from the batch sees nulls") {
    val t = new IceTable(spark, tmpDir("chk"), cfg("later" -> "extra >= 0"))
    // schema evolution: this batch has no `extra` — it reads back null,
    // and CHECK-over-null passes; the constraint bites once the column
    // arrives with a bad value
    t.insert(Seq((1L, 5L)).toDF("id", "v"))
    assert(t.read().count() == 1L)
    intercept[IllegalArgumentException] {
      t.insert(Seq((2L, 5L, -3L)).toDF("id", "v", "extra"))
    }
  }

  test("UPDATE that would violate is rejected; valid update passes") {
    val t = new IceTable(spark, tmpDir("chk"), cfg("pos_v" -> "v > 0"))
    t.insert(Seq((1L, 5L), (2L, 7L)).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      t.updateWhere(col("id") === 1L, Seq("v" -> lit(-9L)))
    }
    assert(t.read().where($"v" === -9L).isEmpty)
    t.updateWhere(col("id") === 1L, Seq("v" -> lit(42L)))
    assert(t.read().where($"v" === 42L).count() == 1L)
  }

  test("MERGE/upsert source is validated up front") {
    val t = new IceTable(spark, tmpDir("chk"), cfg("pos_v" -> "v > 0"))
    t.insert(Seq((1L, 5L)).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, -2L)).toDF("id", "v"), Seq("id"))
    }
    assert(t.read().head.getAs[Long]("v") == 5L)
  }

  test("constraints persist in the log: a reopened handle enforces them") {
    val root = tmpDir("chk")
    val t = new IceTable(spark, root, cfg("pos_v" -> "v > 0"))
    t.insert(Seq((1L, 5L)).toDF("id", "v"))
    val reopened = IceTable.open(spark, root)
    assert(reopened.cfg.checkConstraints == Seq("pos_v" -> "v > 0"))
    intercept[IllegalArgumentException] {
      reopened.insert(Seq((2L, -1L)).toDF("id", "v"))
    }
  }

  test("addCheckConstraint validates existing rows; drop stops enforcing") {
    val t0 = new IceTable(spark, tmpDir("chk"), cfg())
    t0.insert(Seq((1L, 5L), (2L, -1L)).toDF("id", "v"))
    // existing data violates: the ADD must refuse
    intercept[IllegalArgumentException] { t0.addCheckConstraint("pos_v", "v > 0") }
    val t1 = t0.addCheckConstraint("bounded", "v > -100")
    intercept[IllegalArgumentException] {
      t1.insert(Seq((3L, -500L)).toDF("id", "v"))
    }
    // the persisted word governs reopened handles
    val re = IceTable.open(spark, t0.root)
    assert(re.cfg.checkConstraints.map(_._1) == Seq("bounded"))
    val t2 = t1.dropCheckConstraint("bounded")
    t2.insert(Seq((3L, -500L)).toDF("id", "v")) // no longer enforced
    assert(IceTable.open(spark, t0.root).cfg.checkConstraints.isEmpty)
  }
}
