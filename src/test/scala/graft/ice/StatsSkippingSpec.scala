package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Beyond-reference data skipping: write-time footer [min, max] of the
  * stats column recorded in log markers, range pruning from the log alone.
  * Invariants: stats survive merge/optimize log rewrites, pruned reads
  * agree with full-scan filters, and stats-less markers are conservatively
  * kept (never a false negative).
  */
class StatsSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) = (0 until n)
    .map(i => (i.toLong, s"name_$i"))
    .toDF("v", "name")

  private def newTable(dir: String): IceTable =
    new IceTable(spark, tmpDir(dir), IceTableConfig(
      // partition = v-range quartile → disjoint [min, max] per file
      partitionExpr = concat(lit("q="), floor(col("v") / 25)),
      sortOrder = Seq("v"),
      statsColumn = Some("v")))

  test("insert records footer min/max per file; range read prunes by log") {
    val table = newTable("stats_ins")
    table.insert(rows(100)) // 4 files: v in [0,24] [25,49] [50,74] [75,99]
    val snap = table.snapshot()
    assert(snap.aliveFiles.length == 4)
    assert(snap.aliveFiles.forall(_.stats.isDefined), "every marker has stats")
    val byPart = snap.aliveFiles
      .map(m => table.partitionOf(m.path) -> m.stats.get).toMap
    assert(byPart("q=0") == ("0", "24"))
    assert(byPart("q=3") == ("75", "99"))

    val pruned = table.filesInStatsRange(snap, "30", "40")
    assert(pruned.length == 1, s"expected 1 file, got ${pruned.length}")
    val cnt = table.readFiles(snap, pruned)
      .where(col("v").between(30, 40)).count()
    assert(cnt == 11L)
    // numeric compare, not lexicographic: "100" > "99" numerically
    val t2 = newTable("stats_numeric")
    t2.insert((95 until 105).map(i => (i.toLong, s"n$i")).toDF("v", "name"))
    val s2 = t2.snapshot()
    assert(t2.filesInStatsRange(s2, "100", "104").nonEmpty)
  }

  test("stats survive optimize's log rewrite; merged file gets fresh stats") {
    val table = newTable("stats_opt")
    table.insert(rows(100))
    table.insert(rows(100)) // second copy: 2 files per partition
    table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    val snap = table.snapshot()
    assert(snap.aliveFiles.length == 4)
    assert(snap.aliveFiles.forall(_.stats.isDefined),
      "merged files carry fresh footer stats")
    // tombstoned originals carried through the rewrite keep THEIR stats
    assert(snap.files.filter(!_.alive).forall(_.stats.isDefined),
      "carried-forward markers keep stats through the log rewrite")
    val pruned = table.filesInStatsRange(snap, "30", "40")
    assert(pruned.length == 1)
    assert(table.readFiles(snap, pruned)
      .where(col("v").between(30, 40)).count() == 22L)
  }

  test("markers without stats are conservatively kept; json round-trips") {
    val table = newTable("stats_mixed")
    table.insert(rows(50)) // 2 files with stats
    // a stats-less marker (older writer) appended manually
    val snap0 = table.snapshot()
    table.logio.append(table.root, 1, snap0.schema,
      Seq(FileMarker("_data/q=9/legacy.parquet", 1L, 10L)),
      timestamp = Some(System.currentTimeMillis() + 10))
    val snap = table.snapshot()
    val pruned = table.filesInStatsRange(snap, "100", "200")
    // both real files pruned out; the stats-less marker survives
    assert(pruned.map(_.path) == Seq("_data/q=9/legacy.parquet"))

    // the one shared comparator: strings order by unsigned UTF-8 bytes
    // (parquet's binary-stats order), NOT UTF-16 code units; unparseable
    // numerics are "unknown", never a verdict
    val supplementary = new String(Character.toChars(0x10000)) // UTF-8 F0 90 80 80
    assert(supplementary.compareTo("\uFFFD") < 0, "UTF-16 order disagrees here")
    assert(IceTable.statsTryCmp(numeric = false, supplementary, "\uFFFD").exists(_ > 0))
    assert(IceTable.statsTryCmp(numeric = true, "Infinity", "1").isEmpty)
    assert(IceTable.statsIntersects(numeric = true, "Infinity", "Infinity",
      Some("0"), Some("10")), "unparseable stats intersect everything")

    val m = FileMarker("_data/p/x.parquet", 5L, 9L, stats = Some(("1", "42")))
    assert(FileMarker.fromJson(m.json) == m)
    val legacy = FileMarker("_data/p/y.parquet", 5L, 9L)
    assert(!legacy.json.contains("st"), "stats-less marker bytes unchanged")
    assert(FileMarker.fromJson(legacy.json) == legacy)
  }
}
