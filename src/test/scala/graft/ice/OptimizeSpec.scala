package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.{Signaler, TimeLimits}
import org.scalatest.time.{Seconds, Span}

/** `optimize` (multi-partition compaction, one merged-log commit) must
  * preserve exactly the invariants the reference's per-partition merge loop
  * guarantees: one alive file per fully-merged partition, stable query
  * answers, merged paths tombstoned, source logs log-tombstoned, and
  * cleanup-compatible state.
  */
class OptimizeSpec extends SparkSpec with TimeLimits {
  import spark.implicits._
  private implicit val signaler: Signaler =
    org.scalatest.concurrent.ThreadSignaler

  private def events(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, i % 5L, s"type_${i % 3}"))
      .toDF("event_id", "user_id", "event_type")

  private def newTable(
      dir: String,
      mergeSql: Option[String] = None,
      sortOrder: Seq[String] = Seq("event_id")): IceTable =
    new IceTable(spark, tmpDir(dir), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod($"user_id", lit(5))),
      sortOrder = sortOrder,
      customMergeSql = mergeSql))

  test("optimize compacts every partition in one commit; answers stable") {
    val table = newTable("opt")
    (0 until 4).foreach(_ => table.insert(events(100)))
    val before = table.read().groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    var snap = table.snapshot()
    assert(snap.logFiles.length == 4)
    assert(snap.aliveFiles.length == 20) // 5 partitions × 4 inserts

    val merges = table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(merges == 5) // one merge per partition, single round

    snap = table.snapshot()
    assert(snap.logFiles.length == 5) // 4 inserts + ONE merged log
    assert(snap.aliveFiles.length == 5) // one file per partition
    assert(snap.files.count(_.tombstone.isDefined) == 20)
    // all four insert logs are log-tombstoned by the single commit
    assert(snap.tombstones.map(_.path).toSet == snap.logFiles.take(4).toSet)

    val after = table.read().groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)

    // cleanup collapses to one log and deletes the merged-away data files
    table.tombstoneCleanup(0)
    snap = table.snapshot()
    assert(snap.logFiles.length == 1)
    assert(snap.aliveFiles.length == 5)
    val after2 = table.read().groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after2 == before)
  }

  test("optimize applies custom merge SQL per partition (agg totals kept)") {
    val table = newTable("opt_agg", Some(
      "select user_id, event_type, cast(sum(coalesce(cnt, 1)) as bigint) as cnt " +
        "from source_files group by user_id, event_type"),
      sortOrder = Seq("user_id")) // both batch shapes carry user_id
    table.insert(events(120)) // raw rows: no cnt column yet
    table.insert(events(120) // pre-aggregated rows carry cnt (seeded idiom)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).cast("bigint").as("cnt")))
    table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    val total = table.read()
      .agg(sum(coalesce($"cnt", lit(1L)))).collect()(0).getLong(0)
    assert(total == 240L)
    assert(table.snapshot().aliveFiles.length == 5)
  }

  test("shuffle-free insert writes per-task files; optimize compacts them") {
    val table = new IceTable(spark, tmpDir("noshuffle"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod($"user_id", lit(5))),
      sortOrder = Seq("event_id"),
      shuffleOnInsert = false))
    // 4-slice input → up to 4 files per partition from one insert
    table.insert(events(200).repartition(4))
    val snap = table.snapshot()
    assert(snap.aliveFiles.length > 5, s"expected >1 file/partition, got ${snap.aliveFiles.length}")
    assert(table.read().count() == 200L)
    table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(table.snapshot().aliveFiles.length == 5)
    assert(table.read().count() == 200L)
  }

  test("optimize ≡ mergeAll: same answers, same alive-file shape (seeded runs)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val batches = (0 until 2 + rnd.nextInt(2)).map { _ =>
        val n = 50 + rnd.nextInt(150)
        val off = rnd.nextInt(1000)
        events(n).withColumn("event_id", $"event_id" + off)
      }
      val viaLoop = newTable(s"eq_loop_$seed")
      val viaOpt = newTable(s"eq_opt_$seed")
      batches.foreach { b => viaLoop.insert(b); viaOpt.insert(b) }
      viaLoop.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      viaOpt.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)

      def dump(t: IceTable) = t.read()
        .orderBy($"event_id", $"user_id", $"event_type").collect().toSeq
      assert(dump(viaLoop) == dump(viaOpt), s"seed $seed: rows diverge")
      assert(viaLoop.snapshot().aliveFiles.length ==
        viaOpt.snapshot().aliveFiles.length, s"seed $seed: file shape diverges")
    }
  }

  test("optimize handles 500 partitions in one commit") {
    val table = new IceTable(spark, tmpDir("opt_wide"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod($"event_id", lit(500))),
      sortOrder = Seq("event_id"),
      compressionCodec = "none"))
    table.insert(events(1000))
    table.insert(events(1000))
    assert(table.snapshot().aliveFiles.length == 1000)
    val merges = table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(merges == 500)
    val snap = table.snapshot()
    assert(snap.aliveFiles.length == 500)
    assert(snap.logFiles.length == 3) // 2 inserts + one optimize commit
    assert(table.read().count() == 2000L)
  }

  test("empty-batch insert commits an empty log, read unaffected") {
    // reference parity: insert([]) writes a log with zero file markers
    // (icedb.py:183-221 has no empty guard); reads must be unchanged
    val table = newTable("empty_insert")
    table.insert(events(30))
    assert(table.read().count() == 30L)
    table.insert(events(0))
    val snap = table.snapshot()
    assert(snap.logFiles.length == 2)
    assert(snap.aliveFiles.length == table.snapshot().aliveFiles.length)
    assert(table.read().count() == 30L)
  }

  test("insert concurrent with optimize loses nothing (MVCC)") {
    // the reference's lock contract covers merge-vs-merge only; inserts
    // are safe concurrently with compaction because a merge tombstones
    // exactly the files its snapshot read and an insert only adds — the
    // log fold is last-writer-wins per path, so both commits compose
    val table = newTable("concurrent_ins")
    (0 until 3).foreach(_ => table.insert(events(100)))
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val opt = Future(table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100))
    val ins = Future(table.insert(events(100).withColumn("event_id", $"event_id" + 5000)))
    Await.result(Future.sequence(Seq(opt, ins)), 120.seconds)
    assert(table.read().count() == 400L)
    // a follow-up optimize folds the late insert in as well
    table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(table.read().count() == 400L)
    assert(table.snapshot().aliveFiles.length == 5)
  }

  test("optimize with a frozen clock sees its own commit (no re-merge)") {
    // Regression: the round loop snapshots with a strict-< timestamp
    // filter; when a round finished inside the same millisecond, the
    // just-committed merged log was invisible to the next snapshot and the
    // same candidates merged again — duplicated rows (and with a frozen
    // clock, an infinite loop). The fix floors the next snapshot at the
    // committed log's returned timestamp + 1.
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val table = new IceTable(spark, tmpDir("opt_frozen"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod($"user_id", lit(5))),
      sortOrder = Seq("event_id")), () => clock.get())
    table.insert(events(100))
    table.insert(events(100)) // same-ms append: filename bumps to ts+1
    clock.set(1700000000002L) // both insert logs become visible
    val merges = failAfter(Span(120, Seconds)) {
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    }
    assert(merges == 5)
    assert(table.read().count() == 200L)
    assert(table.snapshot().aliveFiles.length == 5)
  }

  test("mergeAll with a frozen clock sees each commit (no re-merge)") {
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val table = new IceTable(spark, tmpDir("mergeall_frozen"), IceTableConfig(
      partitionExpr = concat(lit("u="), pmod($"user_id", lit(5))),
      sortOrder = Seq("event_id")), () => clock.get())
    table.insert(events(100))
    table.insert(events(100))
    clock.set(1700000000002L)
    val merges = failAfter(Span(120, Seconds)) {
      table.mergeAll(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    }
    assert(merges == 5)
    assert(table.read().count() == 200L)
    assert(table.snapshot().aliveFiles.length == 5)
  }

  test("rowGroupRows caps parquet row groups in rows (A-row-group parity)") {
    // reference row_group_size (icedb/icedb.py:53): row-count-based sizing
    // is the pruning knob its chicago_taxis tuning showed 5× gains from
    val table = new IceTable(spark, tmpDir("rowgroup"), IceTableConfig(
      partitionExpr = lit("p=1"), sortOrder = Seq("event_id"),
      rowGroupRows = Some(100)))
    table.insert(events(1000))
    val marker = table.snapshot().aliveFiles.head
    val path = new org.apache.hadoop.fs.Path(table.root, marker.path)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, spark.sparkContext.hadoopConfiguration))
    try {
      val blocks = reader.getFooter.getBlocks
      assert(blocks.size() >= 10, s"expected >=10 row groups, got ${blocks.size()}")
      blocks.forEach(b => assert(b.getRowCount <= 100, s"row group of ${b.getRowCount}"))
    } finally reader.close()
    // merged output honors the cap too (writeSingleFile path)
    table.insert(events(1000))
    table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
    assert(table.read().count() == 2000L)
  }

  test("optimize converges over rounds under the file-count cap") {
    val table = newTable("opt_rounds")
    (0 until 4).foreach(_ =>
      table.insert(events(40).where($"user_id" === 0)))
    assert(table.snapshot().aliveFiles.length == 4)
    // cap 2 → one pairwise merge per round: 4→3→2→1 files, 3 rounds
    val merges = table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 2)
    assert(merges == 3)
    assert(table.snapshot().aliveFiles.length == 1)
    // events(40) filtered to user_id==0 keeps i % 5 == 0 → 8 rows × 4
    assert(table.read().count() == 32L)
  }
}
