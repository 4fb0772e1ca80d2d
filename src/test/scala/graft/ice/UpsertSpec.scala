package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE INTO / upsert ([[IceTable.upsert]], replacing semantics): the
  * table becomes (rows with key ∉ source) ∪ source in one atomic commit,
  * with only matched-key files rewritten. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String): IceTable =
    new IceTable(spark, tmpDir(name), IceTableConfig(
      partitionExpr = concat(lit("p="), (col("id") % 4).cast("string")),
      sortOrder = Seq("id")))

  private def batch(lo: Int, hi: Int, tag: String = "base") =
    (lo until hi).map(i => (i.toLong, tag)).toDF("id", "v")

  test("upsert replaces matched keys and appends the rest, atomically") {
    val t = mkTable("ups")
    t.insert(batch(0, 400))   // files A (4)
    t.insert(batch(400, 800)) // files B (4) — no ids < 100, untouched below
    val before = t.snapshot().aliveFiles.map(_.path).toSet
    val logsBefore = t.logio.currentLogFiles(t.root).length

    // source: update ids 0..99, add ids 1000..1049
    val src = batch(0, 100, "updated").unionByName(batch(1000, 1050, "new"))
    val (replaced, inserted) = t.upsert(src, Seq("id"))
    assert(replaced == 100 && inserted == 150)

    assert(t.logio.currentLogFiles(t.root).length == logsBefore + 1, "one commit")
    val after = t.snapshot().aliveFiles.map(_.path).toSet
    // files B survive; files A (all four held ids 0..99? ids 0..99 span
    // all 4 partitions of the FIRST insert) rewritten
    assert((before intersect after).size == 4, "unmatched files must survive")
    assert(t.read().count() == 850)
    assert(t.read().where($"v" === "updated").count() == 100)
    assert(t.read().where($"v" === "new").count() == 50)
    assert(t.read().where($"id" < 100 && $"v" === "base").count() == 0)
    assert(t.read().select("id").distinct().count() == 850)
  }

  test("upsert into an empty/no-match table is a plain append") {
    val t = mkTable("ups_empty")
    val (r0, i0) = t.upsert(batch(0, 50), Seq("id"))
    assert(r0 == 0 && i0 == 50)
    assert(t.read().count() == 50)
    val (r1, i1) = t.upsert(batch(100, 150), Seq("id")) // disjoint keys
    assert(r1 == 0 && i1 == 50)
    assert(t.read().count() == 100)
    assert(t.read().select("id").distinct().count() == 100)
  }

  test("empty-source upsert commits nothing; routing honors table hooks") {
    val t = mkTable("ups_noop")
    t.insert(batch(0, 40))
    val logsBefore = t.logio.currentLogFiles(t.root).length
    val (r, i) = t.upsert(batch(0, 0), Seq("id"))
    assert(r == 0 && i == 0)
    assert(t.logio.currentLogFiles(t.root).length == logsBefore, "no empty commit")

    // a partitionFunc-configured table must route upserted rows through it
    val tf = new IceTable(spark, tmpDir("ups_pf"), IceTableConfig(
      partitionExpr = lit("unused"),
      sortOrder = Seq("id"),
      partitionFunc = Some(r => s"f=${r.getAs[Long]("id") % 2}")))
    tf.insert(batch(0, 10))
    tf.upsert(batch(10, 12), Seq("id"))
    val parts = tf.snapshot().aliveFiles.map(m => tf.partitionOf(m.path)).toSet
    assert(parts == Set("f=0", "f=1"), s"got $parts") // never "unused"
    assert(tf.read().count() == 12)
  }

  test("upsert with an evolved source schema grows the union schema") {
    val t = mkTable("ups_evolve")
    t.insert(batch(0, 100))
    val src = (0 until 10).map(i => (i.toLong, "updated", i * 1.5))
      .toDF("id", "v", "score")
    val (replaced, inserted) = t.upsert(src, Seq("id"))
    assert(replaced == 10 && inserted == 10)
    val r = t.read()
    assert(r.columns.contains("score"))
    assert(r.where($"score".isNotNull).count() == 10)
    assert(r.where($"score".isNull).count() == 90) // untouched rows read null
    assert(r.count() == 100)
  }
}
