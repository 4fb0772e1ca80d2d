package graft

import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end smoke drive of the engine over the driver's sf0.001 fixtures:
  * ingest → snapshot query → merge → time travel → partition-range prune →
  * GDPR rewrite. Run: `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which the Spark 4 reader
      // rejects; read as epoch-nanos BIGINT (the reference stores epoch
      // timestamps as BIGINT too — SURVEY.md §1.2)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_demo").toString
    // ts is epoch-nanos BIGINT (see nanosAsLong above)
    val tsCol = timestamp_micros((col("ts") / 1000L).cast("long"))
    val table = new IceTable(spark, root, IceTableConfig(
      partitionExpr = concat(lit("d="), date_format(tsCol, "yyyy-MM-dd")),
      sortOrder = Seq("ts", "event_id"),
      statsColumn = Some("ts"))) // log-side [min,max] per file → data skipping

    val events = Fixtures.raw(spark, sfDir, "events") // ts → epoch-nanos BIGINT
    println(s"== insert ${events.count()} events from $sfDir")
    val markers = table.insert(events)
    println(s"== wrote ${markers.length} data parts (one per day)")
    val between = System.currentTimeMillis() + 1

    println("== second insert (same batch) and optimize (all partitions, one commit)")
    table.insert(events)
    val nMerges = table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    val snap = table.snapshot()
    println(s"== $nMerges partition merges in one log append; " +
      s"alive files=${snap.aliveFiles.length} " +
      s"logs=${snap.logFiles.length} markers=${snap.files.length}")

    println("== count by event_type over the snapshot (should be 2x source)")
    table.read().groupBy("event_type").count().orderBy("event_type").show()

    println("== time travel to after first insert only")
    println(s"   count=${table.read(between).count()} (expect ${events.count()})")

    val minDay = "d=2024-01-01"
    println(s"== partition-range pruned read [$minDay, $minDay]")
    val pruned = table.readPartitionRange(minDay, minDay)
    println(s"   files=${table.filesInPartitionRange(table.snapshot(), minDay, minDay).length} rows=${pruned.count()}")

    println("== stats skipping: ts-range read plans files from the log alone")
    val day10 = java.time.LocalDate.of(2024, 1, 10).toEpochDay * 86400L * 1_000_000_000L
    val day13 = java.time.LocalDate.of(2024, 1, 13).toEpochDay * 86400L * 1_000_000_000L - 1
    val statsSnap = table.snapshot()
    val statsFiles = table.filesInStatsRange(statsSnap, day10.toString, day13.toString)
    println(s"   3-day ts range plans ${statsFiles.length} of " +
      s"${statsSnap.aliveFiles.length} files (zero footer reads); rows=" +
      table.readFiles(statsSnap, statsFiles)
        .where(col("ts").between(day10, day13)).count())

    println("== rewrite partition: purge user_id=7 from " + minDay)
    table.rewritePartition(minDay, "select * from _rows where user_id != 7")
    val after = table.read()
    println(s"   rows with user_id=7 on day 1: " +
      after.where(col("user_id") === 7 &&
        date_format(timestamp_micros((col("ts") / 1000L).cast("long")),
          "yyyy-MM-dd") === "2024-01-01").count())
    println(s"   total rows now: ${after.count()}")

    println("== OPTIMIZE ZORDER: recluster day 2 by (user_id, event_id)")
    val day2 = "d=2024-01-02"
    val zmax = table.read().agg(max("user_id"), max("event_id")).head
    val z = graft.functions.ZOrder.zvalue(8,
      graft.functions.ZOrder.scaled(col("user_id"), 0, zmax.getLong(0), 8),
      graft.functions.ZOrder.scaled(col("event_id"), 0, zmax.getLong(1), 8))
    val reclustered = table.recluster(z, filesPer = 2,
      partitions = Some(Set(day2)))
    println(s"   partitions reclustered=$reclustered; " +
      s"alive files now=${table.snapshot().aliveFiles.length}; " +
      s"rows unchanged=${table.read().count()}")

    println("== snapshot checkpoint: seeded fold == raw fold, O(tail) reads")
    println(s"   checkpoint=${table.writeCheckpoint().getOrElse("(already current)")}")
    val seeded = table.snapshot()
    val rawFold = table.logio.readAtMaxTime(table.root, seeded.timestamp,
      useCheckpoints = false)
    println(s"   seeded==raw: ${seeded.files.map(m => (m.path, m.tombstone)).toSet ==
      rawFold.files.map(m => (m.path, m.tombstone)).toSet} " +
      s"(markers=${seeded.files.length})")

    println("== commit history (per-commit deltas from the log fold)")
    table.history().orderBy("commit_ts").show(10, truncate = false)

    println("== merge-on-read FINAL over an uncompacted aggregating table")
    val aggT = new graft.ice.IceTable(spark,
      java.nio.file.Files.createTempDirectory("demo_agg").toString,
      graft.ice.IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("user_id"),
        customInsertSql = Some("select user_id, cast(count(*) as bigint) as cnt " +
          "from _rows group by user_id"),
        customMergeSql = Some("select user_id, cast(sum(cnt) as bigint) as cnt " +
          "from source_files group by user_id")))
    aggT.insert(events.select("event_id", "user_id"))
    aggT.insert(events.select("event_id", "user_id"))
    println(s"   raw rows=${aggT.read().count()} final rows=${aggT.readFinal().count()} " +
      s"final total=${aggT.readFinal().agg(sum("cnt")).head.getLong(0)} " +
      s"(expect ${2 * events.count()})")

    println("== LLM pipeline ops over documents/embeddings")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"   docs=${docs.count()} exact-deduped=" +
      graft.operators.Dedup.exactDedup(docs, Seq("text"), "doc_id").count())
    val dups = graft.operators.Dedup.minHashDupPairs(docs, "doc_id", "text", 0.5)
    println(s"   minhash-LSH near-dup pairs (j>=0.5): ${dups.count()}")
    val queries = emb.limit(2).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queries, "qid", "qvec", 3)
      .show()
    docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("tokens"),
      graft.functions.TextFunctions.langId(col("text")).as("lang_pred"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
      .show(5)

    println("== physical plan of pruned aggregate (pushdown check)")
    table.readPartitionRange(minDay, minDay)
      .where(col("event_type") === "click").groupBy("event_type").count()
      .explain("formatted")

    spark.stop()
  }
}
