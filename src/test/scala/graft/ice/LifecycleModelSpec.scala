package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Model-based randomized lifecycle check: a table driven by a random
  * sequence of engine operations must always answer exactly like a plain
  * in-memory multiset model. This is the generalized form of the
  * reference's same-answer-across-lifecycle oracle
  * (integration_test.py:199-426) — instead of one scripted sequence, any
  * interleaving of insert / merge / optimize / cleanup / checkpoint /
  * remove / rewrite must preserve the model.
  */
class LifecycleModelSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long)]) = rows.toDF("id", "v")

  test("read() == model under random op sequences (3 seeded runs)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val t = new IceTable(spark, tmpDir(s"model$seed"), IceTableConfig(
        partitionExpr = concat(lit("p="), pmod(col("id"), lit(3))), sortOrder = Seq("id")))
      // model: multiset of (id, v); partitions are id % 3
      var model = Vector.empty[(Long, Long)]
      var nextId = 0L
      var checks = 0
      (0 until 14).foreach { step =>
        rnd.nextInt(8) match {
          case 0 | 1 | 2 => // insert a fresh batch (weighted: most common op)
            val n = 5 + rnd.nextInt(40)
            val rows = (0 until n).map(i => (nextId + i, rnd.nextLong(1000)))
            nextId += n
            t.insert(df(rows))
            model ++= rows
          case 3 =>
            t.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
          case 4 =>
            t.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
          case 5 =>
            if (model.nonEmpty) t.tombstoneCleanup(0)
          case 6 =>
            if (model.nonEmpty) { t.writeCheckpoint(); () }
          case 7 =>
            if (model.nonEmpty && rnd.nextBoolean()) {
              // drop partition p=2 (log-only)
              t.removePartitions(parts => parts.filter(_ == "p=2"))
              model = model.filterNot { case (id, _) => id % 3 == 2 }
            } else if (model.nonEmpty) {
              // GDPR-style rewrite of p=0: drop even v
              t.rewritePartition("p=0", "select * from _rows where v % 2 != 0")
              model = model.filterNot { case (id, v) => id % 3 == 0 && v % 2 == 0 }
            }
        }
        if (model.nonEmpty && step % 3 == 2) {
          val got = t.read().select("id", "v").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toVector.sorted
          assert(got == model.sorted,
            s"seed=$seed step=$step: ${got.size} rows vs model ${model.size}")
          checks += 1
        }
      }
      if (model.nonEmpty) {
        val got = t.read().select("id", "v").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toVector.sorted
        assert(got == model.sorted, s"seed=$seed final")
        // seeded and raw folds agree at the end of every run
        val s1 = t.snapshot(); val s2 =
          t.logio.readAtMaxTime(t.root, s1.timestamp, useCheckpoints = false)
        assert(s1.files.map(m => (m.path, m.tombstone)).toSet ==
          s2.files.map(m => (m.path, m.tombstone)).toSet)
      }
      assert(checks >= 2, s"seed=$seed exercised too few mid-run checks")
    }
  }
}
