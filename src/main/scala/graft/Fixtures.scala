package graft

import graft.ice.{IceTable, IceTableConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Ice-backed fixture tables built from the driver's parquet testdata, so
  * every registered query exercises the engine's own write → log → snapshot
  * → read path rather than reading the raw files. Builders are memoized per
  * (sfDir, variant) within the JVM — Verify/Bench build once, query many.
  */
object Fixtures {

  private val cache = TrieMap.empty[String, Any]
  private def memo[T](key: String)(f: => T): T =
    cache.getOrElseUpdate(key, f).asInstanceOf[T]

  /** The engine-wide contract for `events.ts` is epoch-nanos BIGINT (the
    * numeric time axis every gap/as-of/window query computes on, and what
    * DuckDB's `epoch_ns(ts)` yields on the oracle side). Early testdata
    * drops carried TIMESTAMP(NANOS) — which Spark 4 can only read as
    * epoch-nanos BIGINT (`spark.sql.legacy.parquet.nanosAsLong`) — while
    * later drops carry TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ.
    * [[raw]] normalizes both shapes to the BIGINT-nanos contract, so
    * downstream code is identical either way. Session TZ is pinned to UTC
    * in every main, making the NTZ conversion exact. */
  def evTs(c: Column): Column = timestamp_micros((c / 1000L).cast("long"))

  def ensureConf(spark: SparkSession): Unit =
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () } // immutable in this session: pre-set

  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureConf(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(t) if t.typeName.startsWith("timestamp") =>
        df.withColumn("ts",
          (unix_micros(col("ts").cast("timestamp")) * 1000L).cast("long"))
      case _ => df // already epoch-nanos BIGINT (nanosAsLong path)
    }
  }

  /** Scratch dir for fixture/bench tables: prefer tmpfs (`/dev/shm`) when
    * present so harness-local table builds measure ENGINE work, not the
    * host's disk-writeback behavior (some virtualized hosts throttle
    * buffered writers to ~10 MB/s, which would bill disk stalls to every
    * timed section). Tables here are small (fixtures) or deleted right
    * after their bench section. Override with SPARK_GRAFT_TMP. */
  def scratchDir(prefix: String): String = {
    // tmpfs only qualifies with real headroom: containers often mount a
    // 64 MB /dev/shm, where a bench table would die on ENOSPC
    val base = sys.env.get("SPARK_GRAFT_TMP")
      .orElse(Some("/dev/shm").filter { p =>
        val f = new java.io.File(p)
        f.isDirectory && f.canWrite && f.getUsableSpace > 16L * 1024 * 1024 * 1024
      })
    base match {
      case Some(b) => java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(b), prefix).toString
      case None => java.nio.file.Files.createTempDirectory(prefix).toString
    }
  }

  /** The medium [[scratchDir]] resolves to right now — recorded in the
    * bench JSON (and echoed in README's bench tables) so RAM-backed runs
    * are never silently compared against disk-based baselines: the
    * reference's own perf numbers were measured against local disk, and a
    * tmpfs-backed ingest figure is a different experiment. */
  def scratchMedium: String = sys.env.get("SPARK_GRAFT_TMP") match {
    case Some(p) if p.startsWith("/dev/shm") => s"tmpfs ($p, via SPARK_GRAFT_TMP)"
    case Some(p) => s"override ($p, via SPARK_GRAFT_TMP)"
    case None =>
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite &&
        shm.getUsableSpace > 16L * 1024 * 1024 * 1024) "tmpfs (/dev/shm)"
      else s"disk (${sys.props.getOrElse("java.io.tmpdir", "/tmp")})"
  }

  /** Free space (GiB) on the scratch medium at call time — recorded at
    * bench END so a run that drained tmpfs (ENOSPC-adjacent stalls) is
    * diagnosable from the artifact. */
  def scratchFreeGb: Long = {
    val d = scratchDir("graft_probe")
    val free = new java.io.File(d).getUsableSpace / (1L << 30)
    new java.io.File(d).delete()
    free
  }

  private[graft] def newRoot(tag: String): String = scratchDir(s"graft_$tag")

  /** Build every fixture table concurrently (they are independent roots;
    * Spark schedules the jobs side by side). Verify calls this once so the
    * per-query map order doesn't serialize ~10 table builds.
    *
    * Bounded: each build is individually recovered (a failed fixture costs
    * only its own queries — they'll retry lazily and report their own
    * error), and the whole wait is time-boxed so a stuck build can never
    * hang the caller forever (round 2 lost all 45 queries to one
    * `Duration.Inf` await here).
    */
  def prewarm(
      spark: SparkSession,
      sfDir: String,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(30, "min")): Unit = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(8, r => {
        val t = new Thread(r, "fixture-prewarm"); t.setDaemon(true); t
      }))
    val builds: Seq[(String, () => Any)] = Seq(
      "events" -> (() => eventsIce(spark, sfDir)),
      "lineitem" -> (() => lineitemIce(spark, sfDir)),
      "cleaned" -> (() => eventsCleaned(spark, sfDir)),
      "removed" -> (() => eventsRemoved(spark, sfDir)),
      "rewritten" -> (() => eventsRewritten(spark, sfDir)),
      "evolved" -> (() => eventsEvolved(spark, sfDir)),
      "agg" -> (() => eventsAgg(spark, sfDir)),
      "replacing" -> (() => eventsReplacing(spark, sfDir)),
      "dedup" -> (() => eventsDedup(spark, sfDir)),
      "mv" -> (() => eventsMv(spark, sfDir)),
      "seeded" -> (() => eventsSeeded(spark, sfDir)),
      "incremental" -> (() => eventsIncremental(spark, sfDir)),
      "stream" -> (() => eventsStream(spark, sfDir)),
      "zorder" -> (() => eventsZOrder(spark, sfDir)))
    val all = Future.traverse(builds) { case (name, b) =>
      Future(b()).recover { case e =>
        System.err.println(s"[prewarm] fixture $name failed: ${e.getMessage}")
      }
    }
    try Await.result(all, timeout)
    catch { case _: scala.concurrent.TimeoutException =>
      System.err.println(s"[prewarm] timed out after $timeout; " +
        "unfinished fixtures will build lazily per query")
    }
    ()
  }

  /** Packed PNG media over the documents table, materialized once: the
    * image-dedup bench query measures DECODE + fingerprint + pairing, not
    * the synthetic payload packing (which is fixture work, like every
    * other table build). Payloads are tiny (tens of KB total). */
  def mediaPng(spark: SparkSession, sfDir: String) =
    memo(s"$sfDir#mediapng") {
      graft.operators.Multimodal
        .packPng(raw(spark, sfDir, "documents"), "doc_id")
        .localCheckpoint()
    }

  /** Z-order-clustered events: one logical partition, 16 files range-
    * partitioned on the Morton value of (user_id, event_id), per-file
    * min/max recorded for BOTH dimensions — range predicates on either
    * prune files from the log alone (graded by `zorder_skipping`). */
  def eventsZOrder(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#zorder") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("zorder"), IceTableConfig(
        partitionExpr = lit("all"),
        sortOrder = Seq("user_id", "event_id"),
        statsColumn = Some("user_id"),
        statsColumns = Seq("event_id")))
      val r = ev.agg(max(col("user_id")), max(col("event_id"))).head
      val (uMax, eMax) = (r.getLong(0), r.getLong(1))
      val z = graft.functions.ZOrder.zvalue(12,
        graft.functions.ZOrder.scaled(col("user_id"), 0, uMax.toDouble, 12),
        graft.functions.ZOrder.scaled(col("event_id"), 0, eMax.toDouble, 12))
      table.insertClustered(ev, z, numFiles = 16)
      table
    }

  // ------------------------------------------------------------ events ice

  final case class EventsIce(
      table: IceTable, betweenTs: Long,
      insertSec: Double, mergeSec: Double)

  /** Main events table: two inserts (even then odd event_id — a stable
    * time-travel split), then full compaction. Exercises A1/A3/A7/A9/A10.
    * Insert and merge are timed separately so the bench can report a clean
    * ingest-only rows/s against BASELINE.md's load band. */
  def eventsIce(spark: SparkSession, sfDir: String): EventsIce =
    memo(s"$sfDir#events") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("events"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id"),
        statsColumn = Some("ts"))) // log-side min/max → stats_skipping query
      val t0 = System.nanoTime()
      table.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(2)
      val between = System.currentTimeMillis()
      Thread.sleep(2)
      table.insert(ev.where(col("event_id") % 2 === 1))
      val t1 = System.nanoTime()
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      val t2 = System.nanoTime()
      EventsIce(table, between, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

  /** Merged + vacuumed variant (A15): query answers must be unchanged. */
  def eventsCleaned(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#cleaned") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("cleaned"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table.tombstoneCleanup(0)
      table
    }

  /** Deletion-vector variant: rows marked deleted via one dv-table commit
    * (NO data rewrite) — the merge-on-read fixture for a34_row_deletes. */
  def eventsDv(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#dv") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("dv"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      graft.ice.DeleteVectors.deleteWhere(table, pmod(col("user_id"), lit(10)) === 3)
      table
    }

  /** Deletion-vector VISIBILITY variant (a37): rows marked deleted via a
    * dv commit and NEVER materialized — every read surface must still
    * agree. Kept separate from [[eventsDv]] because a34 materializes that
    * fixture; this one's dv table must stay populated. */
  def eventsDvVis(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#dvvis") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("dvvis"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      graft.ice.DeleteVectors.deleteWhere(table, pmod(col("user_id"), lit(10)) === 7)
      table
    }

  /** SQL MERGE INTO variant (b32): the a36 upsert shape driven entirely
    * through `spark.sql("MERGE INTO graft.<t> ...")` — matched keys
    * replaced, unmatched appended, one atomic commit. */
  def eventsSqlMerged(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqlmerged") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqlmerged"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("event_id")))
      table.insert(ev)
      val slice = ev.where(pmod(col("user_id"), lit(13)) === 2)
      slice.withColumn("event_type", lit("upserted"))
        .unionByName(slice.select((col("event_id") + 20000000L).as("event_id"),
          col("user_id"), lit("new").as("event_type")))
        .createOrReplaceTempView("b32_merge_src")
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(
        s"""MERGE INTO graft.`${f.getName}` AS tgt USING b32_merge_src AS src
           |ON tgt.event_id = src.event_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      table
    }

  /** SQL INSERT variant (b33): half the rows seeded through the API, the
    * other half committed by `INSERT INTO graft.<t> SELECT ...` — the
    * statement must route/sort through the table's persisted config and
    * land in ONE log commit. */
  def eventsSqlInserted(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqlinserted") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqlinserted"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      ev.where(col("event_id") % 2 === 1).createOrReplaceTempView("b33_ins_src")
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(s"INSERT INTO graft.`${f.getName}` " +
        "SELECT event_id, user_id, event_type FROM b33_ins_src").collect()
      table
    }

  /** DML variant: atomic copy-on-write UPDATE then DELETE applied to the
    * assembled table (only affected files rewrite) — a35_row_update. */
  def eventsMutated(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#mutated") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("mutated"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.updateWhere(pmod(col("user_id"), lit(17)) === 5,
        Seq("event_type" -> lit("redacted")))
      table.deleteWhere(pmod(col("user_id"), lit(17)) === 6)
      table
    }

  /** SQL-DML variant: the table mutated through `spark.sql` UPDATE and
    * DELETE statements via the graft catalog — b31_sql_dml. */
  def eventsSqlDml(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqldml") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqldml"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("event_id")))
      table.insert(ev)
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(s"UPDATE graft.`${f.getName}` SET event_type = 'redacted' " +
        "WHERE user_id % 19 = 4").collect()
      spark.sql(s"DELETE FROM graft.`${f.getName}` WHERE user_id % 19 = 5").collect()
      table
    }

  /** SQL log-only retention variant (b66): `ALTER TABLE … DROP
    * PARTITIONS WHERE` drops the first week, then a whole-partition
    * `DELETE` drops one more day through the auto-routed log-only fast
    * path. `logOnly` pins that BOTH drops touched ZERO physical data
    * files (the `_data` listing — name, size, mtime — is byte-identical
    * before and after) and that the DELETE's reported row count is
    * exact. The reference's retention op is pure metadata
    * (icedb/icedb.py:435-501); this is its SQL spelling. */
  final case class DroppedFixture(table: IceTable, logOnly: Boolean)
  def eventsSqlDropped(spark: SparkSession, sfDir: String): DroppedFixture =
    memo(s"$sfDir#sqldropped") {
      val ev = raw(spark, sfDir, "events")
      val root = newRoot("sqldropped")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val table = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev)
      def listing(): Set[(String, Long, Long)] = {
        val base = java.nio.file.Paths.get(root, "_data")
        val out = Set.newBuilder[(String, Long, Long)]
        java.nio.file.Files.walk(base).forEach { p =>
          if (java.nio.file.Files.isRegularFile(p) &&
              !p.getFileName.toString.startsWith("."))
            out += ((base.relativize(p).toString, java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis))
        }
        out.result()
      }
      val day8Rows = table.read()
        .where(date_format(evTs(col("ts")), "yyyy-MM-dd") === "2024-01-08").count()
      val before = listing()
      val alter = spark.sql(s"ALTER TABLE graft.`${f.getName}` " +
        "DROP PARTITIONS WHERE d <= '2024-01-07'").head
      val del = spark.sql(
        s"DELETE FROM graft.`${f.getName}` WHERE d = '2024-01-08'").head
      val logOnly = listing() == before &&
        alter.getLong(0) > 0L && del.getLong(0) == day8Rows
      DroppedFixture(table, logOnly)
    }

  /** Change-feed variant (a41): a window spanning an append, a CoW
    * UPDATE (delete+insert pairs) and a merge-on-read delete; `sinceTs`
    * excludes the seed insert. */
  final case class EventsCdc(table: IceTable, sinceTs: Long)
  def eventsChangeFeed(spark: SparkSession, sfDir: String): EventsCdc =
    memo(s"$sfDir#cdc") {
      import graft.ice.{DeleteVectors, IceLogIO}
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("cdc"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      val sinceTs = table.logio.currentLogFiles(table.root)
        .map(f => IceLogIO.logFileInfo(f)._1).max
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(table, pmod(col("user_id"), lit(23)) === 8)
      EventsCdc(table, sinceTs)
    }

  final case class CdcReplica(source: IceTable, target: IceTable)

  /** CDC consumer fixture (CdcApply): a source table seeded, then
    * replicated into a DIFFERENTLY-partitioned target via initial sync,
    * then mutated (append + CoW update + merge-on-read delete) and
    * caught up incrementally — the target must equal the source's final
    * state without ever reading the source's files directly. */
  final case class WapFixture(table: IceTable, isolated: Boolean)

  /** WAP branch fixture: main seeded with the even-fifth of events, a
    * branch forked, the odd-fifth inserted + a CoW delete applied ON THE
    * BRANCH (main count provably unchanged meanwhile — `isolated`), then
    * published fast-forward and dropped. Final table =
    * events where event_id % 5 IN (0,1) AND user_id % 7 <> 0. */
  def wapBranch(spark: SparkSession, sfDir: String): WapFixture =
    memo(s"$sfDir#wap") {
      import graft.ice.Branch
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val t = new IceTable(spark, newRoot("wap_main"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id")))
      t.insert(ev.where(col("event_id") % 5 === 0))
      val base = t.read().count()
      val b = Branch.create(t, "wap")
      b.insert(ev.where(col("event_id") % 5 === 1))
      b.deleteWhere(pmod(col("user_id"), lit(7)) === 0)
      val isolated = t.read().count() == base
      Branch.publish(t, "wap")
      Branch.drop(t, "wap")
      WapFixture(t, isolated)
    }

  final case class SqlBranchFixture(table: IceTable, apiMatch: Boolean,
      branchIsolated: Boolean, timeTravelOk: Boolean)

  /** Branch DML through SQL (b46): the full WAP loop expressed as SQL —
    * CREATE BRANCH, then INSERT / UPDATE / DELETE / MERGE targeting
    * ``graft.`t@wap` ``, validated against an API-path twin (same ops via
    * Branch handles — the states must match row-for-row), then PUBLISH
    * BRANCH and a time-travel read of the pre-publish main. Final main =
    * events(id%5 ∈ {0,1}) with user%23==7 redacted, minus user%23==8,
    * with id%10==0 replaced by 'merged' rows (the MERGE re-inserts ones
    * the DELETE removed). */
  def sqlBranchDml(spark: SparkSession, sfDir: String): SqlBranchFixture =
    memo(s"$sfDir#sqlbranch") {
      import graft.ice.Branch
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      def mk(tag: String) = new IceTable(spark, newRoot(tag), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id")))
      val t = mk("sqlbr_main")
      t.insert(ev.where(col("event_id") % 5 === 0))
      val baseCount = t.read().count()
      val seedCount = baseCount
      // API twin: the same mutation sequence through Branch handles
      val t2 = mk("sqlbr_twin")
      t2.insert(ev.where(col("event_id") % 5 === 0))
      val b2 = Branch.create(t2, "wap")
      b2.insert(ev.where(col("event_id") % 5 === 1))
      b2.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      b2.deleteWhere(pmod(col("user_id"), lit(23)) === 8)
      val mergeSrc = ev.where(col("event_id") % 10 === 0)
        .withColumn("event_type", lit("merged"))
      b2.upsert(mergeSrc, Seq("event_id"))

      val f = new java.io.File(t.root)
      val (name, wh) = (f.getName, f.getParent)
      val saved = spark.conf.getOption(graft.plans.IceSqlResolution.WarehouseKey)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
      try {
        spark.sql(s"ALTER TABLE graft.`$name` CREATE BRANCH wap").collect()
        ev.where(col("event_id") % 5 === 1).createOrReplaceTempView("sqlbr_new")
        spark.sql(s"INSERT INTO graft.`$name@wap` SELECT * FROM sqlbr_new")
          .collect()
        spark.sql(s"UPDATE graft.`$name@wap` SET event_type = 'redacted' " +
          "WHERE user_id % 23 = 7").collect()
        spark.sql(s"DELETE FROM graft.`$name@wap` WHERE user_id % 23 = 8")
          .collect()
        mergeSrc.createOrReplaceTempView("sqlbr_merge")
        spark.sql(s"""MERGE INTO graft.`$name@wap` tgt USING sqlbr_merge src
          ON tgt.event_id = src.event_id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""").collect()
        // SQL-written branch state == the API twin's, row for row
        def setOf(df: org.apache.spark.sql.DataFrame) = df
          .select("event_id", "user_id", "event_type").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        val sqlBranch = setOf(
          spark.sql(s"SELECT * FROM graft.`$name@wap`"))
        val apiMatch = sqlBranch == setOf(Branch.open(t2, "wap").read()) &&
          sqlBranch.nonEmpty
        // main untouched until publish
        val branchIsolated = t.read().count() == baseCount
        Thread.sleep(3)
        val preTs = System.currentTimeMillis()
        Thread.sleep(3)
        spark.sql(s"ALTER TABLE graft.`$name` PUBLISH BRANCH wap").collect()
        spark.sql(s"ALTER TABLE graft.`$name` DROP BRANCH wap").collect()
        // publish landed the exact branch state; time travel still sees
        // the pre-publish main
        val timeTravelOk = setOf(t.read()) == sqlBranch &&
          t.read(preTs + 1).count() == seedCount
        SqlBranchFixture(t, apiMatch, branchIsolated, timeTravelOk)
      } finally saved match {
        case Some(v) =>
          spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, v)
        case None =>
          spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
      }
    }

  final case class SqlBranchTravelFixture(table: IceTable,
      travelOk: Boolean, changesOk: Boolean)

  /** b49: branch TIME TRAVEL and table_changes through pure SQL — the
    * WAP validation loop's read side. A branch takes two SQL mutations
    * with a timestamp captured between them; then
    * `graft.`t@wap` TIMESTAMP AS OF ts` must hash-match the API branch
    * handle's own time-traveled read (and differ from the branch head,
    * proving the travel narrowed), and `table_changes('t@wap', since)`
    * must match the API change feed over the same branch window. */
  def sqlBranchTravel(spark: SparkSession, sfDir: String): SqlBranchTravelFixture =
    memo(s"$sfDir#sqlbrtravel") {
      import graft.ice.{Branch, ChangeFeed}
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val t = new IceTable(spark, newRoot("sqlbrt"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id")))
      t.insert(ev.where(col("event_id") % 7 === 0))
      val f = new java.io.File(t.root)
      val saved = spark.conf.getOption(graft.plans.IceSqlResolution.WarehouseKey)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      try {
        val name = f.getName
        spark.sql(s"ALTER TABLE graft.`$name` CREATE BRANCH wap").collect()
        // ms-granularity fences around each commit: the feed window is
        // (since, until] and the snapshot fold strict-<, so a same-ms
        // commit would straddle the bound
        Thread.sleep(3); val sinceTs = System.currentTimeMillis(); Thread.sleep(3)
        ev.where(col("event_id") % 7 === 1).createOrReplaceTempView("sqlbrt_new")
        spark.sql(s"INSERT INTO graft.`$name@wap` SELECT * FROM sqlbrt_new")
          .collect()
        Thread.sleep(3); val midTs = System.currentTimeMillis(); Thread.sleep(3)
        spark.sql(s"UPDATE graft.`$name@wap` SET event_type = 'redacted' " +
          "WHERE user_id % 4 = 1").collect()

        def setOf(df: org.apache.spark.sql.DataFrame) = df
          .select("event_id", "user_id", "event_type").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        val br = Branch.open(t, "wap")
        // SQL branch time travel ≡ API branch read at the same bound,
        // and ≠ the branch head (the update really is outside the bound)
        val sqlAsOf = setOf(spark.sql(
          s"SELECT * FROM graft.`$name@wap` TIMESTAMP AS OF $midTs"))
        val travelOk = sqlAsOf == setOf(br.read(midTs + 1)) &&
          sqlAsOf != setOf(br.read()) && sqlAsOf.nonEmpty
        // SQL table_changes on the branch spelling ≡ the API feed over
        // the same (since, now] window, change-type and all
        def feedSet(df: org.apache.spark.sql.DataFrame) = df
          .select("_change_type", "event_id", "user_id", "event_type")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
          .groupBy(identity).view.mapValues(_.length).toMap
        val sqlFeed = feedSet(spark.sql(
          s"SELECT * FROM table_changes('$name@wap', $sinceTs)"))
        val changesOk =
          sqlFeed == feedSet(ChangeFeed.between(br, sinceTs)) && sqlFeed.nonEmpty
        SqlBranchTravelFixture(t, travelOk, changesOk)
      } finally saved match {
        case Some(v) =>
          spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, v)
        case None =>
          spark.conf.unset(graft.plans.IceSqlResolution.WarehouseKey)
      }
    }

  final case class S3ProxyFixture(dataUri: String, bytesIdentical: Boolean,
      pagedOk: Boolean)

  /** S3-proxy fixture (a45): serve an ice table as a virtual bucket and
    * read it back DIRECTLY off the live endpoint — `s3g://bucket/_data`
    * through [[graft.sources.GraftS3FileSystem]], a client that speaks
    * only the S3 REST protocol (paged delimiter LIST + HEAD + ranged
    * GET). The graded frame's every byte crosses the wire protocol at
    * query time: Spark's file index walks the bucket via delimiter
    * listings (page size 2, so paging is real) and its parquet reader's
    * footer/chunk seeks become live ranged GETs — no mirror, no graft
    * log code on the read path. The proxy stays up for the session (the
    * graded query re-reads the endpoint on every run).
    * `bytesIdentical` separately pins byte-exact transfer (plain GETs
    * against source files), `pagedOk` that a raw max-keys=2 LIST walk
    * reproduces the snapshot manifest exactly. */
  def s3Proxy(spark: SparkSession, sfDir: String): S3ProxyFixture =
    memo(s"$sfDir#s3proxy") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .where(col("event_id") % 4 === 0)
      val t = new IceTable(spark, newRoot("s3px"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id")))
      t.insert(ev)
      val proxy = new graft.sources.IceS3Proxy(t)
      val addr = proxy.start()
      sys.addShutdownHook(proxy.stop())
      val base = s"http://localhost:${addr.getPort}/${proxy.bucket}"
      val client = java.net.http.HttpClient.newHttpClient()
      def fetch(url: String): Array[Byte] = {
        val r = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
            .GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        require(r.statusCode() == 200, s"GET $url -> ${r.statusCode()}")
        r.body()
      }
      // raw protocol walk (independent of the FileSystem client): paged
      // flat LIST must reproduce the snapshot manifest, and every object
      // must transfer byte-for-byte
      var keys = Vector.empty[String]
      var token = ""
      var pages = 0
      var done = false
      while (!done) {
        val url = s"$base?list-type=2&max-keys=2" +
          (if (token.nonEmpty) s"&continuation-token=" +
            java.net.URLEncoder.encode(token, "UTF-8") else "")
        val xml = new String(fetch(url), "UTF-8")
        keys ++= "<Key>([^<]+)</Key>".r.findAllMatchIn(xml).map(_.group(1))
        pages += 1
        val next = "<NextContinuationToken>([^<]+)</NextContinuationToken>".r
          .findFirstMatchIn(xml).map(_.group(1))
        done = next.isEmpty
        next.foreach(token = _)
      }
      val identical = keys.forall { k =>
        java.util.Arrays.equals(fetch(s"$base/$k"),
          java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"${t.root}/$k")))
      }
      val pagedOk = pages > 1 &&
        keys.sorted == t.snapshot().aliveFiles.map(_.path).sorted
      // register the s3g:// protocol client for the direct read
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3g.impl", classOf[graft.sources.GraftS3FileSystem].getName)
      hc.set("fs.s3g.impl.disable.cache", "true")
      hc.set("fs.s3g.endpoint", s"http://localhost:${addr.getPort}")
      hc.setInt("fs.s3g.list.max.keys", 2)
      S3ProxyFixture(s"s3g://${proxy.bucket}/_data", identical, pagedOk)
    }

  final case class S3RetryFixture(dataUri: String, retriesExercised: Boolean)

  /** a46: the S3 client's RETRY contract (reference icedb/s3.py wires
    * `Retry(3)` into its client config; A19) graded end-to-end — the
    * proxy runs in chaos mode (every 2nd data GET truncated mid-body,
    * capped at 3 injections: the cap sits BELOW the client's 4-attempt
    * budget, so success is deterministic while ≥1 retry is guaranteed).
    * A probe read must survive the truncations and count exactly the
    * inserted rows; the graded aggregate then re-reads the same flaky
    * endpoint live. */
  def s3Retry(spark: SparkSession, sfDir: String): S3RetryFixture =
    memo(s"$sfDir#s3retry") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .where(col("event_id") % 4 === 1)
      val t = new IceTable(spark, newRoot("s3rt"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id")))
      t.insert(ev)
      val proxy = new graft.sources.IceS3Proxy(t, chaosEveryN = 2, chaosMax = 3)
      val addr = proxy.start()
      sys.addShutdownHook(proxy.stop())
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3g.impl", classOf[graft.sources.GraftS3FileSystem].getName)
      hc.set("fs.s3g.impl.disable.cache", "true")
      // per-bucket endpoint: must not clobber the a45 proxy's global one
      hc.set(s"fs.s3g.endpoint.${proxy.bucket}",
        s"http://localhost:${addr.getPort}")
      val uri = s"s3g://${proxy.bucket}/_data"
      val expected = ev.count()
      val got = spark.read.parquet(uri).count()
      S3RetryFixture(uri,
        retriesExercised = proxy.chaosHits > 0 && got == expected)
    }

  def eventsCdcApply(spark: SparkSession, sfDir: String): CdcReplica =
    memo(s"$sfDir#cdcapply") {
      import graft.ice.{CdcApply, DeleteVectors}
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val source = new IceTable(spark, newRoot("cdcsrc"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      // the replica's layout is its own business: different partition
      // axis + sort prove replication carries ROWS, not files
      val target = new IceTable(spark, newRoot("cdctgt"), IceTableConfig(
        partitionExpr = concat(lit("e="), substring(col("event_type"), 1, 2)),
        sortOrder = Seq("user_id")))
      source.insert(ev.where(col("event_id") % 2 === 0))
      val seeded = CdcApply.applyTo(source, target, Seq("event_id"))
      require(seeded.initialSync, "first apply must seed")
      source.insert(ev.where(col("event_id") % 2 === 1))
      source.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(source, pmod(col("user_id"), lit(23)) === 8)
      // settled bounds are now-1: let the last commit's millisecond pass
      // so one catch-up loop suffices
      Thread.sleep(5)
      CdcApply.catchUp(source, target, Seq("event_id"))
      CdcReplica(source, target)
    }

  final case class TxnFixture(t1: IceTable, t2: IceTable, atomic: Boolean)

  /** Atomic multi-table commit (a50): two differently-shaped tables are
    * seeded with half the events each, then ONE transaction stages the
    * other half into both — invisible on every surface until the single
    * marker PUT, then visible on both at once. A second transaction
    * stages garbage into both and ABORTS — it must never surface. The
    * carried boolean proves the pending stage was invisible and the
    * commit flipped both tables together. */
  def eventsTxn(spark: SparkSession, sfDir: String): TxnFixture =
    memo(s"$sfDir#txn") {
      import graft.ice.IceTransaction
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val parent = newRoot("txnpair")
      val t1 = new IceTable(spark, s"$parent/t1", IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      val t2 = new IceTable(spark, s"$parent/t2", IceTableConfig(
        partitionExpr = concat(lit("e="), substring(col("event_type"), 1, 2)),
        sortOrder = Seq("user_id")))
      t1.insert(ev.where(col("event_id") % 2 === 0))
      t2.insert(ev.where(col("event_id") % 2 === 0))
      val preT1 = t1.read().count(); val preT2 = t2.read().count()
      val txn = IceTransaction.begin(spark)
      txn.insert(t1, ev.where(col("event_id") % 2 === 1))
      txn.insert(t2, ev.where(col("event_id") % 2 === 1))
      val pendingInvisible =
        t1.read().count() == preT1 && t2.read().count() == preT2
      txn.commit()
      val committedBoth =
        t1.read().count() > preT1 && t2.read().count() > preT2
      // an aborted transaction must never surface anywhere
      val bad = IceTransaction.begin(spark)
      bad.insert(t1, ev.limit(7).withColumn("event_id",
        col("event_id") + 10_000_000L))
      bad.insert(t2, ev.limit(7).withColumn("event_id",
        col("event_id") + 10_000_000L))
      bad.abort()
      val abortClean =
        t1.read().where(col("event_id") >= 10_000_000L).isEmpty &&
          t2.read().where(col("event_id") >= 10_000_000L).isEmpty
      TxnFixture(t1, t2,
        atomic = pendingInvisible && committedBoth && abortClean)
    }

  final case class SqlMvFixture(viewName: String, mvRoot: String,
    dmlRejected: Boolean)

  /** SQL materialized view (b56): `CREATE MATERIALIZED VIEW` compiles
    * the GROUP BY into a persisted view spec and seeds it; the base then
    * takes an append + a CoW redaction update + a MoR delete; one
    * `REFRESH MATERIALIZED VIEW` follows all three incrementally (the
    * base is never re-aggregated — retracted groups alone rescan);
    * `SELECT ... FROM graft.<view>` resolves to the folded view. The
    * carried boolean proves direct DML on the view is rejected. */
  def eventsSqlMv(spark: SparkSession, sfDir: String): SqlMvFixture =
    memo(s"$sfDir#sqlmv") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvsqlbase")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val base = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT event_type, count(*) AS cnt, sum(user_id) AS sum_uid,
               min(event_id) AS min_id, max(event_id) AS max_id,
               avg(user_id) AS avg_uid
        FROM graft.`${f.getName}` GROUP BY event_type""").collect()
      base.insert(ev.where(col("event_id") % 2 === 1))
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      val dmlRejected =
        try { spark.sql(s"INSERT INTO graft.`$view` VALUES ('x', 1, 1, 1, 1, 1.0)"); false }
        catch { case e: Exception => e.getMessage.contains("MATERIALIZED VIEW") }
      SqlMvFixture(view, s"${f.getParent}/$view", dmlRejected)
    }

  final case class SqlMvDistinctFixture(viewName: String, whDir: String,
    exportRefused: Boolean)

  /** SQL MV with `count(DISTINCT …)` (b58): the view's distinct-user
    * aggregate maintains as mergeable HLL sketch state — window partials
    * union, delete-touched groups recompute their sketch exactly from
    * the base (the min/max reset rule), and OPTIMIZE folds sketches
    * within a `(group, gen, is_reset)` cell via hll_union_agg. The base
    * takes an append + a CoW redaction (groups change!) + a MoR delete,
    * then one REFRESH. The carried boolean pins the foreign-engine
    * contract: a DuckDB view export must REFUSE (HLL binaries don't
    * fold outside the engine) rather than silently drop the column. */
  def eventsSqlMvDistinct(spark: SparkSession, sfDir: String): SqlMvDistinctFixture =
    memo(s"$sfDir#sqlmvdcnt") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvdcntbase")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val base = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT event_type, count(*) AS cnt,
               count(DISTINCT user_id) AS uniq_users
        FROM graft.`${f.getName}` GROUP BY event_type""").collect()
      base.insert(ev.where(col("event_id") % 2 === 1))
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      // compaction folds the binary sketch state within cells
      spark.sql(s"OPTIMIZE graft.`$view`").collect()
      val exportRefused =
        try {
          graft.ice.ManifestExport.writeDuckDbView(
            IceTable.open(spark, s"${f.getParent}/$view"),
            s"${f.getParent}/$view/_export/view.sql", "mv_view")
          false
        } catch { case e: UnsupportedOperationException =>
          e.getMessage.contains("HLL") }
      SqlMvDistinctFixture(view, f.getParent, exportRefused)
    }

  final case class SqlMvWhereFixture(viewName: String, whDir: String)

  /** Filtered, expression-grouped SQL MV (b60): `WHERE event_type <>
    * 'redacted'` with a `pmod(user_id, 10)` group KEY — the predicate is
    * applied identically to the seed scan and every feed window's insert
    * AND delete images, and the derived key is materialized as a stored
    * column. The redaction UPDATE moves rows OUT of the filter (their
    * delete images retract, their insert images never land); the MoR
    * delete retracts under the filter; one REFRESH follows all of it. */
  def eventsSqlMvWhere(spark: SparkSession, sfDir: String): SqlMvWhereFixture =
    memo(s"$sfDir#sqlmvwhere") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvwherebase")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val base = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT pmod(user_id, 10) AS ub, count(*) AS cnt,
               sum(event_id) AS sum_id, max(event_id) AS max_id
        FROM graft.`${f.getName}` WHERE event_type <> 'redacted'
        GROUP BY pmod(user_id, 10)""").collect()
      base.insert(ev.where(col("event_id") % 2 === 1))
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      SqlMvWhereFixture(view, f.getParent)
    }

  final case class SqlMvJoinFixture(viewName: String, whDir: String,
    factOnlyDelta: Boolean)

  /** Star-join SQL MV (b61): `fact JOIN dim ON … GROUP BY d.cat` — fact
    * deltas join the PINNED dim snapshot (a fact-only append refreshes
    * with zero resets: true IVM), unmatched fact rows stay out (inner
    * join), and a DIMENSION mutation is detected by commit version and
    * triggers a full reseed — including cnt=0 retractions for groups the
    * dim move emptied. The dim maps event_type → its first letter; the
    * redaction UPDATE moves rows to an event_type with NO dim row (they
    * leave the view), then a dim insert for 'redacted' brings them back
    * under a new group. */
  def eventsSqlMvJoin(spark: SparkSession, sfDir: String): SqlMvJoinFixture =
    memo(s"$sfDir#sqlmvjoin") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvjoinfact")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val fact = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      fact.insert(ev.where(col("event_id") % 2 === 0))
      val dimName = s"${f.getName}_dim"
      val dim = new IceTable(spark, s"${f.getParent}/$dimName", IceTableConfig(
        partitionExpr = lit("all"), sortOrder = Seq("et")))
      dim.insert(ev.select(col("event_type").as("et")).distinct()
        .withColumn("cat", upper(substring(col("et"), 1, 1))))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT d.cat AS cat, count(*) AS cnt, sum(f.user_id) AS sum_uid,
               max(f.event_id) AS max_id
        FROM graft.`${f.getName}` f JOIN graft.`$dimName` d
          ON f.event_type = d.et
        GROUP BY d.cat""").collect()
      // insert-only fact window first: a true window delta lands as
      // partials with ZERO resets — the IVM claim, pinned as a boolean
      // (a reseed would emit everything as resets)
      fact.insert(ev.where(col("event_id") % 2 === 1))
      Thread.sleep(5)
      val r1 = spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").head
      val factOnlyDelta = r1.getLong(0) > 0L && r1.getLong(1) == 0L
      // then the retraction window: redaction update (moves rows to an
      // event_type with NO dim row → they leave the view) + MoR delete
      fact.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(fact, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      // dim mutation: 'redacted' gains a dim row under category 'R' — the
      // version change forces a reseed that brings those rows back
      dim.insert {
        import spark.implicits._
        Seq(("redacted", "R")).toDF("et", "cat")
      }
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      SqlMvJoinFixture(view, f.getParent, factOnlyDelta)
    }

  final case class SqlMvLeftJoinFixture(viewName: String, whDir: String,
    factOnlyDelta: Boolean)

  /** LEFT-JOIN star view (b67): the dim is seeded WITHOUT the 'view'
    * event type, so those facts NULL-EXTEND into the (none) group
    * instead of leaving the view — the facts-before-dims shape.
    * Maintained through an insert-only fact window (partials, zero
    * resets — pinned as a boolean), a redaction update that moves rows
    * to a dim-less type (into the null group), a MoR delete, and a dim
    * ARRIVAL ('redacted' gains a row) that moves the null group's rows
    * into 'R' via the affected-group reset path (max is not
    * self-maintainable). DuckDB re-derives the final state with the
    * same LEFT JOIN. */
  def eventsSqlMvLeftJoin(spark: SparkSession, sfDir: String): SqlMvLeftJoinFixture =
    memo(s"$sfDir#sqlmvleftjoin") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvljfact")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val fact = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      fact.insert(ev.where(col("event_id") % 2 === 0))
      val dimName = s"${f.getName}_dim"
      val dim = new IceTable(spark, s"${f.getParent}/$dimName", IceTableConfig(
        partitionExpr = lit("all"), sortOrder = Seq("et")))
      dim.insert(ev.select(col("event_type").as("et")).distinct()
        .where(col("et") =!= "view") // 'view' facts have NO dim row
        .withColumn("cat", upper(substring(col("et"), 1, 1))))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT d.cat AS cat, count(*) AS cnt, sum(f.user_id) AS sum_uid,
               max(f.event_id) AS max_id
        FROM graft.`${f.getName}` f LEFT JOIN graft.`$dimName` d
          ON f.event_type = d.et
        GROUP BY d.cat""").collect()
      fact.insert(ev.where(col("event_id") % 2 === 1))
      Thread.sleep(5)
      val r1 = spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").head
      val factOnlyDelta = r1.getLong(0) > 0L && r1.getLong(1) == 0L
      // redaction moves rows to a type with NO dim row: under LEFT they
      // move INTO the null group (an inner view would drop them)
      fact.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(fact, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      // dim ARRIVAL: 'redacted' gains a row — its facts move null → 'R'
      dim.insert {
        import spark.implicits._
        Seq(("redacted", "R")).toDF("et", "cat")
      }
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      SqlMvLeftJoinFixture(view, f.getParent, factOnlyDelta)
    }

  final case class SqlMvXdFixture(viewName: String, whDir: String,
    exportOk: Boolean)

  /** EXACT count(distinct) SQL view (b68): `exact_count_distinct(user_id)`
    * maintained as a per-(group, value) count side table — exact and
    * retractable, unlike the HLL spelling — driven through an insert
    * window, a redaction update (moves users across groups) and a MoR
    * delete. `exportOk` pins that the DuckDB export SERVES the exact
    * distinct (side-table fold CTE over real file lists; the HLL
    * spelling refuses instead) — the executable DuckDB run of the same
    * export shape lives in `graft.Scratch` + tools/check_duckdb_export.py.
    * DuckDB re-derives every count(DISTINCT) exactly. */
  def eventsSqlMvXd(spark: SparkSession, sfDir: String): SqlMvXdFixture =
    memo(s"$sfDir#sqlmvxd") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvxdbase")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val base = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT event_type, count(*) AS cnt,
               exact_count_distinct(user_id) AS users
        FROM graft.`${f.getName}` GROUP BY event_type""").collect()
      base.insert(ev.where(col("event_id") % 2 === 1))
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      val mv = IceTable.open(spark, s"${f.getParent}/$view")
      val sql = graft.ice.ManifestExport.duckDbViewSql(mv, "xd_view")
      val exportOk = sql.contains("_xd_user_id") &&
        sql.contains("\"xd_user_id\"") && sql.contains("read_parquet")
      SqlMvXdFixture(view, f.getParent, exportOk)
    }

  final case class SqlMvGlobalFixture(viewName: String, whDir: String,
    emptyReadsZero: Boolean)

  /** GLOBAL (no GROUP BY) SQL MV (b62): `SELECT count(*), sum(…) FROM t`
    * — the single most common dashboard shape — maintained under the
    * synthetic constant group key through an append, a CoW update and a
    * MoR delete (the delete exercises the reset path on the one global
    * group). The carried boolean pins the empty edge: a second global
    * view over a fully-deleted base reads ONE row with cnt 0, never
    * no-rows. */
  def eventsSqlMvGlobal(spark: SparkSession, sfDir: String): SqlMvGlobalFixture =
    memo(s"$sfDir#sqlmvglobal") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvglobase")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val base = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT count(*) AS cnt, sum(user_id) AS sum_uid,
               min(event_id) AS min_id, max(event_id) AS max_id,
               avg(user_id) AS avg_uid
        FROM graft.`${f.getName}`""").collect()
      base.insert(ev.where(col("event_id") % 2 === 1))
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      // the empty edge, pinned as a boolean: a global view whose base
      // fully retracts still reads exactly one row with cnt = 0
      val emptyBase = new IceTable(spark, s"${f.getParent}/${f.getName}_e",
        IceTableConfig(partitionExpr = lit("all"), sortOrder = Seq("event_id")))
      emptyBase.insert(ev.limit(3))
      Thread.sleep(5)
      val ev2 = s"${f.getName}_ev"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$ev2` AS
        SELECT count(*) AS cnt FROM graft.`${f.getName}_e`""").collect()
      emptyBase.deleteWhere(lit(true))
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$ev2`").collect()
      val er = spark.sql(s"SELECT cnt FROM graft.`$ev2`").collect()
      val emptyReadsZero = er.length == 1 && er.head.getLong(0) == 0L
      SqlMvGlobalFixture(view, f.getParent, emptyReadsZero)
    }

  final case class SqlMvMultiDimFixture(viewName: String, whDir: String,
    factOnlyDelta: Boolean, dimMovePartial: Boolean)

  /** Multi-dimension star SQL MV (b63): `fact ⋈ d1 ⋈ d2` — the normal
    * star schema — with each dim pinned and versioned independently.
    * Fact-only windows land delta partials (zero resets, pinned as a
    * boolean). A SINGLE dim move maintains partially: only the groups
    * the changed keys touch reset (pinned as resets < live groups —
    * d1 is seeded in two commits so the version anchor is the small
    * second commit, keeping the delta window attributable). Moving BOTH
    * dims in one window falls back to the atomic full reseed. All
    * mutations are deterministic functions of the raw events so DuckDB
    * re-derives the final join aggregation. */
  def eventsSqlMvMultiDim(spark: SparkSession, sfDir: String): SqlMvMultiDimFixture =
    memo(s"$sfDir#sqlmvmultidim") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .withColumn("ub", pmod(col("user_id"), lit(4)).cast("int"))
      val root = newRoot("mvmdfact")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val fact = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      fact.insert(ev.where(col("event_id") % 2 === 0))
      val d1Name = s"${f.getName}_d1"
      val d1 = new IceTable(spark, s"${f.getParent}/$d1Name", IceTableConfig(
        partitionExpr = lit("all"), sortOrder = Seq("et")))
      d1.insert(ev.select(col("event_type").as("et")).distinct()
        .withColumn("cat", upper(substring(col("et"), 1, 1))))
      // second, SMALL d1 commit: belt-and-braces for the version
      // anchor. With the straggler-proof log-count marks the first
      // move's window opens clean anyway; without the proof (older
      // marks) the re-capture would be this one dummy row, never the
      // whole seed — partial maintenance stays group-sized either way
      d1.insert {
        import spark.implicits._
        Seq(("zzz_unused", "ZZ")).toDF("et", "cat")
      }
      val d2Name = s"${f.getName}_d2"
      val d2 = new IceTable(spark, s"${f.getParent}/$d2Name", IceTableConfig(
        partitionExpr = lit("all"), sortOrder = Seq("ub")))
      d2.insert {
        import spark.implicits._
        Seq(0, 1, 2, 3).toDF("ub")
          .withColumn("tier", concat(lit("T"), col("ub")))
      }
      Thread.sleep(5)
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT da.cat AS cat, db.tier AS tier, count(*) AS cnt,
               sum(f.user_id) AS sum_uid, max(f.event_id) AS max_id
        FROM graft.`${f.getName}` f
          JOIN graft.`$d1Name` da ON f.event_type = da.et
          JOIN graft.`$d2Name` db ON f.ub = db.ub
        GROUP BY da.cat, db.tier""").collect()
      // fact-only window: true IVM over two pinned dims
      fact.insert(ev.where(col("event_id") % 2 === 1))
      Thread.sleep(5)
      val r1 = spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").head
      val factOnlyDelta = r1.getLong(0) > 0L && r1.getLong(1) == 0L
      val groupsBefore = spark.sql(s"SELECT count(*) FROM graft.`$view`")
        .head.getLong(0)
      // ONE dim moves: the lexicographically-smallest event type's
      // category becomes 'Z' — only its groups (old cat + 'Z', per
      // tier) reset
      val minEt = ev.agg(min(col("event_type"))).head.getString(0)
      d1.updateWhere(col("et") === minEt, Seq("cat" -> lit("Z")))
      Thread.sleep(5)
      val r2 = spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").head
      val dimMovePartial = r2.getLong(0) == 0L && r2.getLong(1) > 0L &&
        r2.getLong(1) < groupsBefore
      // BOTH dims move in one window → atomic full reseed
      val maxEt = ev.agg(max(col("event_type"))).head.getString(0)
      d1.updateWhere(col("et") === maxEt, Seq("cat" -> lit("Q")))
      d2.updateWhere(col("ub") === 0, Seq("tier" -> lit("Z0")))
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      SqlMvMultiDimFixture(view, f.getParent, factOnlyDelta, dimMovePartial)
    }

  final case class SqlMvHavingFixture(viewName: String, whDir: String)

  /** SQL MV with HAVING (b64): the post-aggregate predicate compiles to
    * a READ-SIDE filter over the folded view (maintenance is unchanged
    * — a group crossing the threshold appears/disappears at read). The
    * threshold is floor(final-row-count / 10), derivable by DuckDB from
    * the raw events, so groups under 10% of rows (the 'redacted'
    * slice) stay filtered. */
  def eventsSqlMvHaving(spark: SparkSession, sfDir: String): SqlMvHavingFixture =
    memo(s"$sfDir#sqlmvhaving") {
      import graft.ice.DeleteVectors
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("mvhavbase")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val base = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      // the final state's row count is a pure function of the raw data
      val threshold = ev.where(pmod(col("user_id"), lit(23)) =!= 8)
        .count() / 10L
      val view = s"${f.getName}_v"
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.`$view` AS
        SELECT event_type, count(*) AS cnt, sum(user_id) AS sum_uid
        FROM graft.`${f.getName}`
        GROUP BY event_type HAVING count(*) > $threshold""").collect()
      base.insert(ev.where(col("event_id") % 2 === 1))
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
      SqlMvHavingFixture(view, f.getParent)
    }

  final case class SqlTxnFixture(whDir: String, atomic: Boolean)

  /** SQL multi-table transaction (b59): the reference's MV double-write
    * pattern (`examples/materialized-view.py:91-98` — every batch lands
    * in the raw table AND an aggregate rollup) done ATOMICALLY at the
    * SQL boundary. Two `BEGIN TRANSACTION; INSERT raw; INSERT agg;
    * COMMIT` blocks land the even then odd halves of the events in both
    * tables through one marker PUT each; a ROLLBACK block stages garbage
    * into both and must never surface; a block whose SECOND insert fails
    * must leave the first invisible too. The carried boolean pins all
    * three behaviors. */
  def eventsSqlTxn(spark: SparkSession, sfDir: String): SqlTxnFixture =
    memo(s"$sfDir#sqltxn") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val wh = newRoot("sqltxnwh")
      new java.io.File(wh).mkdirs()
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, wh)
      spark.sql("""CREATE TABLE graft.txr (event_id BIGINT, user_id BIGINT,
        event_type STRING) PARTITIONED BY (concat('u=', pmod(user_id, 8)))
        SORTED BY (event_id)""").collect()
      spark.sql("""CREATE TABLE graft.txa (event_type STRING, cnt BIGINT,
        sum_uid BIGINT)""").collect()
      def doubleWrite(terminator: String): Array[org.apache.spark.sql.Row] =
        spark.sql(s"""BEGIN TRANSACTION;
          INSERT INTO graft.txr SELECT event_id, user_id, event_type
            FROM txn_batch;
          INSERT INTO graft.txa SELECT event_type, count(*),
            CAST(sum(user_id) AS BIGINT) FROM txn_batch GROUP BY event_type;
          $terminator""").collect()
      ev.where(col("event_id") % 2 === 0).createOrReplaceTempView("txn_batch")
      val c1 = doubleWrite("COMMIT")
      ev.where(col("event_id") % 2 === 1).createOrReplaceTempView("txn_batch")
      val c2 = doubleWrite("COMMIT")
      val committed = (c1 ++ c2).forall(_.getString(2) == "committed")
      def rawCount() =
        spark.sql("SELECT count(*) FROM graft.txr").head.getLong(0)
      val preRaw = rawCount()
      // ROLLBACK: both stages really ran (rows_staged > 0), nothing surfaced
      ev.limit(7).withColumn("event_id", col("event_id") + 10_000_000L)
        .createOrReplaceTempView("txn_batch")
      val rb = doubleWrite("ROLLBACK")
      val rolledBack = rb.forall(_.getString(2) == "rolled_back") &&
        rb.map(_.getLong(1)).sum > 0
      // a mid-block failure (agg insert arity mismatch) must also leave
      // the first, already-staged insert invisible
      val failedCleanly =
        try {
          spark.sql("""BEGIN TRANSACTION;
            INSERT INTO graft.txr SELECT event_id, user_id, event_type
              FROM txn_batch;
            INSERT INTO graft.txa SELECT 1;
            COMMIT""").collect()
          false
        } catch { case _: Exception => true }
      val clean = rawCount() == preRaw &&
        spark.sql("""SELECT count(*) FROM graft.txr
          WHERE event_id >= 10000000""").head.getLong(0) == 0L
      SqlTxnFixture(wh, atomic = committed && rolledBack && failedCleanly && clean)
    }

  final case class ConstraintFixture(table: IceTable, rejectedCleanly: Boolean,
    sqlAltered: Boolean)

  /** CHECK constraints (b55): a config-level constraint enforced on
    * every write path — one declared at create time, one added through
    * `ALTER TABLE … ADD CONSTRAINT` (which validates the EXISTING rows
    * first). A violating insert and a violating UPDATE through a
    * REOPENED handle (enforcement comes from the log's persisted word,
    * not the original in-memory config) must both reject BEFORE any
    * file lands — the carried boolean proves the table is unchanged. */
  def eventsConstrained(spark: SparkSession, sfDir: String): ConstraintFixture =
    memo(s"$sfDir#constrained") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val root = newRoot("chktbl")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      val t = new IceTable(spark, root, IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id"),
        checkConstraints = Seq("valid_id" -> "event_id >= 0")))
      t.insert(ev)
      val sqlAltered =
        spark.sql(s"ALTER TABLE graft.`${f.getName}` ADD CONSTRAINT " +
          "known_type CHECK (event_type IS NOT NULL)")
          .head.getString(0).contains("known_type")
      val re = IceTable.open(spark, root)
      val badInsert =
        try { re.insert(ev.limit(5).withColumn("event_id", lit(-1L))); false }
        catch { case _: IllegalArgumentException => true }
      val badUpdate =
        try {
          re.updateWhere(pmod(col("user_id"), lit(23)) === 7,
            Seq("event_type" -> lit(null).cast("string")))
          false
        } catch { case _: IllegalArgumentException => true }
      ConstraintFixture(re, rejectedCleanly = badInsert && badUpdate, sqlAltered)
    }

  final case class StreamDedupFixture(target: IceTable, dupsDropped: Boolean)

  /** Streaming key-dedup (a49): an at-least-once feed (a third of the
    * events delivered twice) streamed through `format("ice")`,
    * deduplicated with WATERMARK-BOUNDED state
    * ([[graft.streaming.Streams.dedupWithinWatermark]] — state evicts as
    * event time passes, the only shape that survives an unbounded feed),
    * landed exactly-once into a second ice table. The target must equal
    * the ORIGINAL events exactly; the carried boolean proves the source
    * really contained duplicates. */
  def eventsStreamDedup(spark: SparkSession, sfDir: String): StreamDedupFixture =
    memo(s"$sfDir#streamdedup") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val src = new IceTable(spark, newRoot("sdsrc"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      src.insert(ev.unionAll(ev.where(pmod(col("user_id"), lit(3)) === 0)))
      val tgt = new IceTable(spark, newRoot("sdtgt"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      val stream = spark.readStream.format("ice")
        .option("path", src.root).load()
        .withColumn("ev_ts", evTs(col("ts")))
      // horizon ≥ the data's event-time span: at test scale nothing may
      // drop as late; production tunes `delay` to its redelivery window
      val deduped = graft.streaming.Streams.dedupWithinWatermark(
        stream, Seq("event_id"), "ev_ts", delay = "3650 days").drop("ev_ts")
      val q = graft.streaming.Streams.iceSinkExactlyOnce(
        deduped, tgt, checkpoint = newRoot("sdckpt"), queryName = "sdq",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      StreamDedupFixture(tgt,
        dupsDropped = src.read().count() > tgt.read().count())
    }

  final case class MvSyncFixture(base: IceTable, mv: IceTable,
    spec: graft.operators.MvSync.MvSpec, rebaseConsistent: Boolean)

  /** Incremental materialized view (a48): a GROUP BY
    * count/sum/min/max view over an events-backed base is seeded, then
    * maintained through an append window (partials only), a CoW
    * redaction update (cross-group move: old groups reset, `redacted`
    * accumulates), and a merge-on-read delete (retraction resets) —
    * never re-aggregating the base. A final [[graft.operators.MvSync.rebase]]
    * collapses the generations; the carried boolean proves the read is
    * IDENTICAL before and after. The oracle re-derives the final state
    * from the raw events. */
  def eventsMvSync(spark: SparkSession, sfDir: String): MvSyncFixture =
    memo(s"$sfDir#mvsync") {
      import graft.ice.DeleteVectors
      import graft.operators.MvSync
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      // partition axis independent of the updated column (updateWhere's
      // contract: never assign a partition-deriving column)
      val base = new IceTable(spark, newRoot("mvbase"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      val spec = MvSync.MvSpec(groupCols = Seq("event_type"),
        sumCols = Seq("user_id"), minMaxCols = Seq("event_id"))
      val mv = MvSync.create(spark, newRoot("mvagg"), spec)
      base.insert(ev.where(col("event_id") % 2 === 0))
      Thread.sleep(5)
      MvSync.syncFromFeed(base, mv, spec) // initial: full aggregation
      base.insert(ev.where(col("event_id") % 2 === 1))
      Thread.sleep(5)
      MvSync.syncFromFeed(base, mv, spec) // insert-only: partials
      base.updateWhere(pmod(col("user_id"), lit(23)) === 7,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(base, pmod(col("user_id"), lit(23)) === 8)
      Thread.sleep(5)
      MvSync.syncFromFeed(base, mv, spec) // retraction resets + partials
      val before = MvSync.read(mv, spec).localCheckpoint(true)
      MvSync.rebase(base, mv, spec)
      val after = MvSync.read(mv, spec).select(before.columns.map(col): _*)
      val drift = before.exceptAll(after).count() + after.exceptAll(before).count()
      MvSyncFixture(base, mv, spec, rebaseConsistent = drift == 0L)
    }

  /** CREATE TABLE ... AS variant (b34): the table does not exist before
    * the statement — one atomic CTAS commit seeds schema AND persists the
    * PARTITIONED BY / SORTED BY config, so the reopened handle routes
    * exactly like an API-configured one. */
  def eventsSqlCtas(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqlctas") {
      raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .createOrReplaceTempView("b34_ctas_src")
      val root = newRoot("sqlctas") // reserves a unique warehouse sibling
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(
        s"""CREATE TABLE graft.`${f.getName}`
           |PARTITIONED BY (concat('u=', pmod(user_id, 8)))
           |SORTED BY (event_id)
           |AS SELECT event_id, user_id, event_type FROM b34_ctas_src""".stripMargin)
        .collect()
      IceTable.open(spark, root)
    }

  /** SQL maintenance variant (b35): four small commits compacted by
    * `OPTIMIZE graft.t` and their tombstones reclaimed by `VACUUM ...
    * RETAIN 0 HOURS`, both through the parser surface — contents must be
    * byte-identical before and after. */
  def eventsSqlMaintained(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqlmaint") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqlmaint"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id")))
      (0 until 4).foreach(i =>
        table.insert(ev.where(pmod(col("event_id"), lit(4)) === i)))
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(s"OPTIMIZE graft.`${f.getName}`").collect()
      spark.sql(s"VACUUM graft.`${f.getName}` RETAIN 0 HOURS").collect()
      table
    }

  /** SQL Z-order variant (b36): `OPTIMIZE ... ZORDER BY` through the
    * parser — a pure recluster, so contents must equal the raw source. */
  def eventsSqlZordered(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqlzorder") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqlzorder"), IceTableConfig(
        partitionExpr = lit("all"), sortOrder = Seq.empty,
        statsColumns = Seq("event_id", "user_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(s"OPTIMIZE graft.`${f.getName}` ZORDER BY (event_id, user_id)")
        .collect()
      table
    }

  /** SQL ALTER variant (b37): sort-order change (config-only commit) then
    * partition evolution (atomic whole-table rewrite) through the parser
    * — both content-preserving, so contents must equal the raw source. */
  def eventsSqlAltered(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqlalter") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqlalter"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("event_id")))
      table.insert(ev)
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(s"ALTER TABLE graft.`${f.getName}` SORTED BY (user_id, event_id)")
        .collect()
      spark.sql(s"ALTER TABLE graft.`${f.getName}` " +
        "PARTITIONED BY (concat('t=', event_type))").collect()
      table
    }

  /** RESTORE variant (b38): evens committed (the restore target), then
    * odds + a CoW update + a MoR delete on top, then `RESTORE TABLE … TO
    * TIMESTAMP AS OF` rolls the VISIBLE state back to exactly the evens —
    * reviving CoW-tombstoned files and dropping the post-bound dv marks —
    * while time travel to the pre-restore head still sees the mutated
    * layout (both layouts live in one log). */
  final case class EventsRestored(table: IceTable, preRestoreTs: Long)
  def eventsSqlRestored(spark: SparkSession, sfDir: String): EventsRestored =
    memo(s"$sfDir#sqlrestore") {
      import graft.ice.{DeleteVectors, IceLogIO}
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("sqlrestore"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(8))),
        sortOrder = Seq("event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      val restoreTs = table.logio.currentLogFiles(table.root)
        .map(f => IceLogIO.logFileInfo(f)._1).max
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.updateWhere(pmod(col("user_id"), lit(29)) === 3,
        Seq("event_type" -> lit("redacted")))
      DeleteVectors.deleteWhere(table,
        col("event_id") % 2 === 0 && pmod(col("user_id"), lit(10)) === 3)
      val dvRoot = DeleteVectors.dvTable(table).root
      val preRestoreTs = (table.logio.currentLogFiles(table.root) ++
        table.logio.currentLogFiles(dvRoot))
        .map(f => IceLogIO.logFileInfo(f)._1).max
      val f = new java.io.File(table.root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(
        s"RESTORE TABLE graft.`${f.getName}` TO TIMESTAMP AS OF $restoreTs")
        .collect()
      EventsRestored(table, preRestoreTs)
    }

  /** Declared-schema CREATE + ADD COLUMN variant (b39): the table is born
    * EMPTY via `CREATE TABLE graft.t (cols…)` (schema-only commit, config
    * persisted), filled by SQL INSERT, evolved with `ALTER TABLE … ADD
    * COLUMNS`, and the post-evolution INSERT carries the new columns
    * while pre-evolution rows read them as null. */
  def eventsSqlAddColumn(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#sqladdcol") {
      raw(spark, sfDir, "events")
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"), col("event_type"))
        .createOrReplaceTempView("b39_addcol_src")
      val root = newRoot("sqladdcol")
      val f = new java.io.File(root)
      spark.conf.set(graft.plans.IceSqlResolution.WarehouseKey, f.getParent)
      spark.sql(s"CREATE TABLE graft.`${f.getName}` " +
        "(event_id BIGINT, user_id BIGINT, event_type STRING) " +
        "PARTITIONED BY (concat('u=', user_id % 16)) SORTED BY (event_id)")
        .collect()
      spark.sql(s"INSERT INTO graft.`${f.getName}` SELECT * FROM b39_addcol_src")
        .collect()
      spark.sql(s"ALTER TABLE graft.`${f.getName}` " +
        "ADD COLUMNS (score DOUBLE, tag STRING)").collect()
      spark.sql(s"INSERT INTO graft.`${f.getName}` " +
        "SELECT event_id + 100000000, user_id, 'scored', " +
        "CAST(event_id % 7 AS DOUBLE), 'tagged' " +
        "FROM b39_addcol_src WHERE user_id % 50 = 1").collect()
      IceTable.open(spark, root)
    }

  /** Upsert variant: a modified slice + brand-new rows merged in atomically
    * by event_id key (replacing semantics) — a36_upsert. */
  def eventsUpserted(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#upserted") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("upserted"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      val slice = ev.where(pmod(col("user_id"), lit(13)) === 2)
      val src = slice.withColumn("event_type", lit("upserted"))
        .unionByName(slice.select((col("event_id") + 10000000L).as("event_id"),
          col("user_id"), lit("new").as("event_type")))
      table.upsert(src, Seq("event_id"))
      table
    }

  /** Checkpointed variant: half the data committed, a snapshot checkpoint
    * written, the rest committed, then compaction + cleanup (which
    * auto-refreshes the checkpoint). Every read after this seeds its fold
    * from the checkpoint and fetches only the tail logs. */
  def eventsCheckpointed(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#checkpointed") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("ckpt"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.writeCheckpoint()
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table.tombstoneCleanup(0) // deletes covered logs; refreshes checkpoint
      table
    }

  /** Partition-evolution variant ([[IceTable.repartitionTable]]): the
    * day-partitioned insert atomically rewritten to user-hash buckets. */
  def eventsRepartitioned(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#repart") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("repart"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev)
      table.repartitionTable(
        concat(lit("u="), (col("user_id") % 8).cast("string")))
      table
    }

  /** Partition-removal variant (A16): first week dropped log-only. */
  def eventsRemoved(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#removed") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("removed"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev)
      table.removePartitions(parts => parts.filter(_ <= "d=2024-01-07"))
      table
    }

  /** Partition-rewrite variant (A17): GDPR purge of user_id%10==0 on day 1. */
  def eventsRewritten(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#rewritten") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("rewritten"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev)
      table.rewritePartition("d=2024-01-01",
        "select * from _rows where user_id % 10 != 0")
      table
    }

  /** Schema-evolution variant (A6/B18): first batch lacks `props`. */
  def eventsEvolved(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#evolved") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("evolved"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0).drop("props"))
      table.insert(ev.where(col("event_id") % 2 === 1))
      table
    }

  /** AggregatingMergeTree variant (A12 + A4): custom insert seeds cnt=1,
    * merge sums it; grand totals must match raw count(*). */
  def eventsAgg(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#agg") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("agg"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("user_id"),
        customInsertSql = Some(
          """select user_id, event_type, max(event_id) as last_event_id,
            |cast(count(*) as bigint) as cnt
            |from _rows group by user_id, event_type""".stripMargin),
        customMergeSql = Some(
          """select user_id, event_type, max(last_event_id) as last_event_id,
            |cast(sum(cnt) as bigint) as cnt
            |from source_files group by user_id, event_type""".stripMargin)))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table
    }

  /** NOT-compacted aggregating table ([[IceTable.readFinal]] target):
    * three overlapping seeded batches left unmerged, so only the
    * merge-on-read path can produce final totals. */
  def eventsAggHot(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#agghot") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("agghot"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("user_id"),
        customInsertSql = Some(
          """select user_id, event_type, cast(count(*) as bigint) as cnt
            |from _rows group by user_id, event_type""".stripMargin),
        customMergeSql = Some(
          """select user_id, event_type, cast(sum(cnt) as bigint) as cnt
            |from source_files group by user_id, event_type""".stripMargin)))
      table.insert(ev.where(col("event_id") % 3 === 0))
      table.insert(ev.where(col("event_id") % 3 === 1))
      table.insert(ev.where(col("event_id") % 3 === 2))
      table // deliberately NO optimize: the raw read holds partial states
    }

  /** Sketch-state MV (A12 variant): the ClickHouse uniqState/uniqMerge
    * analog, with Datasketches HLL as the binary aggregate state. Custom
    * insert collapses each batch to ONE hll_sketch_agg state per
    * (event_type, day); custom merge re-unions states with hll_union_agg
    * — so distinct-user estimates keep composing through arbitrary
    * compaction without ever re-reading raw events. At 100 TB this is the
    * only affordable shape for incremental count-distinct rollups: state
    * size is fixed (~2^lgK bytes/group), merges touch sketch rows only. */
  def eventsHllMv(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#hllmv") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val table = new IceTable(spark, newRoot("hllmv"), IceTableConfig(
        // routing runs on the PRE-rewrite rows (reference semantics: the
        // part func buckets raw rows, then the custom insert SQL rewrites
        // each bucket) — so the day comes from ts here and again as the
        // MV's own `d` column in the insert SQL, by construction equal
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("event_type"),
        customInsertSql = Some(
          """select event_type,
            |date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd') as d,
            |hll_sketch_agg(user_id, 14) as users_hll,
            |cast(count(*) as bigint) as cnt
            |from _rows group by event_type, d""".stripMargin),
        customMergeSql = Some(
          """select event_type, d,
            |hll_union_agg(users_hll, true) as users_hll,
            |cast(sum(cnt) as bigint) as cnt
            |from source_files group by event_type, d""".stripMargin)))
      table.insert(ev.where(col("event_id") % 3 === 0))
      table.insert(ev.where(col("event_id") % 3 === 1))
      table.insert(ev.where(col("event_id") % 3 === 2))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table
    }

  /** Inverted-index pair (TextIndex): postings + stats-MV ice tables over
    * the documents corpus, built incrementally (two batches) and then
    * compacted — the persisted-search-index fixture for llm_bm25_index. */
  def docsTextIndex(spark: SparkSession, sfDir: String): (IceTable, IceTable) =
    memo(s"$sfDir#textindex") {
      val docs = raw(spark, sfDir, "documents")
      val index = new IceTable(spark, newRoot("tidx"),
        graft.operators.TextIndex.indexConfig(buckets = 64))
      val stats = new IceTable(spark, newRoot("tstat"),
        graft.operators.TextIndex.statsConfig)
      graft.operators.TextIndex.indexBatch(index, stats,
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.operators.TextIndex.indexBatch(index, stats,
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text")
      index.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      stats.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      (index, stats)
    }

  /** Feed-synced text index (TextIndex.syncFromFeed): the corpus lives in
    * an ice table, the index follows its CHANGE FEED — initial build,
    * then a DML window (CoW update appending query terms, MoR delete,
    * fresh inserts) applied incrementally; the query must match a
    * from-scratch BM25 over the final corpus. Mutations mirror
    * SparkEntry.Bm25SyncReplaySql exactly. */
  def docsTextIndexSync(
      spark: SparkSession, sfDir: String): (IceTable, IceTable, IceTable) =
    memo(s"$sfDir#textsync") {
      import graft.ice.DeleteVectors
      import graft.operators.TextIndex
      val docs = raw(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val src = new IceTable(spark, newRoot("tsyncsrc"), IceTableConfig(
        partitionExpr = concat(lit("p="), pmod(col("doc_id"), lit(8))),
        sortOrder = Seq("doc_id")))
      src.insert(docs)
      val index = new IceTable(spark, newRoot("tsynci"),
        TextIndex.indexConfig(buckets = 64))
      val stats = new IceTable(spark, newRoot("tsyncs"), TextIndex.statsConfig)
      val dels = new IceTable(spark, newRoot("tsyncd"), TextIndex.deleteConfig)
      TextIndex.syncFromFeed(src, index, stats, dels, "doc_id", "text")
      src.updateWhere(pmod(col("doc_id"), lit(41)) === 3,
        Seq("text" -> concat(col("text"), lit(" spark spark window"))))
      DeleteVectors.deleteWhere(src, pmod(col("doc_id"), lit(37)) === 5)
      src.insert(docs.where(pmod(col("doc_id"), lit(53)) === 1)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          lit("spark window fresh doc").as("text")))
      Thread.sleep(5) // settled bounds are now-1
      TextIndex.syncFromFeed(src, index, stats, dels, "doc_id", "text")
      (index, stats, dels)
    }

  /** Feed-synced signature index (SigIndex.syncFromFeed): the corpus
    * lives in an ice table; after the initial build, long docs with
    * `doc_id % 31 == 7` are REWRITTEN to reversed-token text (their
    * shingle sets break — old signatures must retire) and those with
    * `% 31 == 8` are MoR-deleted; the index follows the change feed.
    * Probes against the ORIGINAL texts prove retirement; probes against
    * untouched docs prove the index still finds live content. */
  def docsSigIndexSync(spark: SparkSession, sfDir: String)
      : (IceTable, IceTable, IceTable) =
    memo(s"$sfDir#sigsync") {
      import graft.ice.DeleteVectors
      import graft.operators.SigIndex
      val docs = raw(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val src = new IceTable(spark, newRoot("sigsyncsrc"), IceTableConfig(
        partitionExpr = concat(lit("p="), pmod(col("doc_id"), lit(8))),
        sortOrder = Seq("doc_id")))
      src.insert(docs)
      val bands = new IceTable(spark, newRoot("sigsyncb"), SigIndex.bandConfig)
      val sigs = new IceTable(spark, newRoot("sigsyncg"), SigIndex.sigConfig)
      val marks = new IceTable(spark, newRoot("sigsyncm"), SigIndex.marksConfig)
      SigIndex.syncFromFeed(src, bands, sigs, marks, "doc_id", "text")
      val long = length(col("text")) >= 400
      src.updateWhere(long && pmod(col("doc_id"), lit(31)) === 7,
        Seq("text" -> concat_ws(" ",
          reverse(graft.functions.TextFunctions.tokens(col("text"))))))
      DeleteVectors.deleteWhere(src,
        long && pmod(col("doc_id"), lit(31)) === 8)
      Thread.sleep(5) // settled bounds are now-1
      SigIndex.syncFromFeed(src, bands, sigs, marks, "doc_id", "text")
      (bands, sigs, marks)
    }

  final case class IvfSync(src: IceTable, root: String)

  /** Feed-synced IVF ANN index (IvfIndex.syncFromFeed): the embeddings
    * corpus lives in an ice table; after the initial build, `%31==2`
    * vectors are negated (CoW update — they move across the space),
    * `%23==5` are MoR-deleted, and fresh twins of `%29==1` enter at
    * vec_id+1000000. The synced index must search the FINAL corpus:
    * recall vs brute force over the live table, zero deleted ids. */
  def embeddingsIvfSync(spark: SparkSession, sfDir: String): IvfSync =
    memo(s"$sfDir#ivfsync") {
      import graft.ice.DeleteVectors
      import graft.operators.IvfIndex
      val emb = raw(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val src = new IceTable(spark, newRoot("ivfsyncsrc"), IceTableConfig(
        partitionExpr = concat(lit("p="), pmod(col("vec_id"), lit(8))),
        sortOrder = Seq("vec_id")))
      src.insert(emb)
      val root = newRoot("ivfsyncidx")
      IvfIndex.syncFromFeed(src, root, "vec_id", "embedding",
        nlist = 8, lloydIterations = 2, dim = 64)
      src.updateWhere(pmod(col("vec_id"), lit(31)) === 2,
        Seq("embedding" -> transform(col("embedding"), x => -x)))
      DeleteVectors.deleteWhere(src, pmod(col("vec_id"), lit(23)) === 5)
      src.insert(emb.where(pmod(col("vec_id"), lit(29)) === 1)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
      Thread.sleep(5) // settled bounds are now-1
      IvfIndex.syncFromFeed(src, root, "vec_id", "embedding",
        nlist = 8, lloydIterations = 2, dim = 64)
      IvfSync(src, root)
    }

  /** MinHash signature-index pair (SigIndex): band + signature ice tables
    * over the documents corpus, built in two incremental appends then
    * compacted — the continuous-crawl near-dup fixture for
    * llm_minhash_index. */
  def docsSigIndex(spark: SparkSession, sfDir: String): (IceTable, IceTable) =
    memo(s"$sfDir#sigindex") {
      val docs = raw(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val bands = new IceTable(spark, newRoot("sigb"),
        graft.operators.SigIndex.bandConfig)
      val sigs = new IceTable(spark, newRoot("sigs"),
        graft.operators.SigIndex.sigConfig)
      graft.operators.SigIndex.append(bands, sigs,
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.operators.SigIndex.append(bands, sigs,
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text")
      bands.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      sigs.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      (bands, sigs)
    }

  /** ReplacingMergeTree variant (A13): latest row per user survives. */
  def eventsReplacing(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#replacing") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("replacing"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("user_id", "event_id"),
        customMergeSql = Some(
          """select user_id, max_by(event_type, event_id) as event_type,
            |max(event_id) as event_id
            |from source_files group by user_id""".stripMargin)))
      table.insert(ev.where(col("event_id") % 2 === 0))
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table
    }

  /** Dedup-merge variant (A14): the same batch inserted twice, collapsed by
    * deterministic `_row_id` at merge. */
  def eventsDedup(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#dedup") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .withColumn("_row_id", md5(col("event_id").cast("string")))
      val table = new IceTable(spark, newRoot("dedup"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("_row_id"),
        customMergeSql = Some(
          """select any_value(event_id) as event_id,
            |any_value(user_id) as user_id,
            |any_value(event_type) as event_type, _row_id
            |from source_files group by _row_id""".stripMargin)))
      table.insert(ev)
      table.insert(ev)
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table
    }

  /** Materialized-view recipe (reference examples/materialized-view.py:44-98,
    * README.md:625-634): the app double-writes every batch to a raw table
    * AND a second aggregating table with its own partition function +
    * custom insert/merge. The MV's `sum(cnt)` must equal the raw table's
    * `count(*)` at every lifecycle point. */
  final case class MvPair(raw: IceTable, mv: IceTable)

  def eventsMv(spark: SparkSession, sfDir: String): MvPair =
    memo(s"$sfDir#mv") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val rawTable = new IceTable(spark, newRoot("mvraw"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("user_id", "event_id")))
      val mvTable = new IceTable(spark, newRoot("mvagg"), IceTableConfig(
        partitionExpr = concat(lit("e="), col("event_type")),
        sortOrder = Seq("user_id"),
        customInsertSql = Some(
          """select user_id, event_type, cast(count(*) as bigint) as cnt
            |from _rows group by user_id, event_type""".stripMargin),
        customMergeSql = Some(
          """select user_id, event_type, cast(sum(cnt) as bigint) as cnt
            |from source_files group by user_id, event_type""".stripMargin)))
      Seq(ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1)).foreach { batch =>
        rawTable.insert(batch) // the app-side double-write
        mvTable.insert(batch)
      }
      rawTable.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      mvTable.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      MvPair(rawTable, mvTable)
    }

  /** B18 union-by-name seeding over an evolved schema (README.md:672-687):
    * early batches predate the `cnt` column (raw rows, one event each);
    * later batches arrive pre-aggregated with `cnt`. The custom merge seeds
    * the missing column with `coalesce(cnt, 1)` — the union-schema read
    * supplies the nulls, exactly the `union all by name` idiom. */
  def eventsSeeded(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#seeded") {
      val ev = raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val table = new IceTable(spark, newRoot("seeded"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(16))),
        sortOrder = Seq("user_id"),
        customMergeSql = Some(
          """select user_id, event_type,
            |cast(sum(coalesce(cnt, 1)) as bigint) as cnt
            |from source_files group by user_id, event_type""".stripMargin)))
      // pre-evolution batch: no cnt column (each row is one event)
      table.insert(ev.where(col("event_id") % 2 === 0))
      // post-evolution batch: pre-aggregated rows carry cnt
      table.insert(ev.where(col("event_id") % 2 === 1)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("cnt")))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      table
    }

  /** Incremental-read (CDC) variant: even events in commit 1, odd in
    * commit 2 (the window target), then a full compaction — which must NOT
    * re-emit anything through the changelog. */
  def eventsIncremental(spark: SparkSession, sfDir: String): (IceTable, Long) =
    memo(s"$sfDir#incremental") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("incr"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      table.insert(ev.where(col("event_id") % 2 === 0))
      val sinceTs = table.logio.currentLogFiles(table.root)
        .map(f => graft.ice.IceLogIO.logFileInfo(f)._1).max
      Thread.sleep(2)
      table.insert(ev.where(col("event_id") % 2 === 1))
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      (table, sinceTs)
    }

  /** Exactly-once streaming-sink variant: two micro-batches committed via
    * insertBatch, then BOTH replayed (foreachBatch's crash re-delivery) —
    * the replays must be skipped, and compaction must not forget that. */
  def eventsStream(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#stream") {
      val ev = raw(spark, sfDir, "events")
      val table = new IceTable(spark, newRoot("stream"), IceTableConfig(
        partitionExpr = concat(lit("d="), date_format(evTs(col("ts")), "yyyy-MM-dd")),
        sortOrder = Seq("ts", "event_id")))
      val b0 = ev.where(col("event_id") % 2 === 0)
      val b1 = ev.where(col("event_id") % 2 === 1)
      require(table.insertBatch(b0, "evstream", 0L))
      require(table.insertBatch(b1, "evstream", 1L))
      require(!table.insertBatch(b1, "evstream", 1L), "replay must skip")
      require(!table.insertBatch(b0, "evstream", 0L), "stale replay must skip")
      table.optimize(maxFileSize = 1_000_000_000L, maxFileCount = 100)
      require(!table.insertBatch(b1, "evstream", 1L),
        "replay after compaction must still skip")
      table
    }

  // ---------------------------------------------------------- lineitem ice

  /** orders + lineitem CO-BUCKETED on the order key (8 buckets each,
    * Spark-compatible placement): the co-located-join fixture — joins
    * and aggregations on the key plan with ZERO shuffle exchanges
    * (IceTableConfig.bucketBy). */
  def bucketedPair(spark: SparkSession, sfDir: String): (IceTable, IceTable) =
    memo(s"$sfDir#bucketed_pair") {
      val ot = new IceTable(spark, newRoot("bkt_orders"), IceTableConfig(
        partitionExpr = lit(""), sortOrder = Seq("o_orderkey"),
        bucketBy = Some((8, Seq("o_orderkey")))))
      ot.insert(raw(spark, sfDir, "orders"))
      val lt = new IceTable(spark, newRoot("bkt_lineitem"), IceTableConfig(
        partitionExpr = lit(""), sortOrder = Seq("l_orderkey"),
        bucketBy = Some((8, Seq("l_orderkey")))))
      lt.insert(raw(spark, sfDir, "lineitem"))
      (ot, lt)
    }

  /** orders through the engine, single-partition and ANALYZE'd: the CBO
    * fixture — its catalog relation carries persisted rowCount / ndv /
    * min-max / null-count plan statistics (IceFileIndex.dataFrame +
    * StatsBridge), so cost-based broadcast decisions and join reordering
    * plan from analyzed numbers. */
  def cboOrders(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#cbo_orders") {
      val t = new IceTable(spark, newRoot("cbo_orders"), IceTableConfig(
        partitionExpr = lit(""), sortOrder = Seq("o_orderkey")))
      t.insert(raw(spark, sfDir, "orders"))
      graft.ice.TableStats.analyze(t)
      t
    }

  /** CBO join-REORDER triple: customer + lineitem ANALYZE'd alongside
    * [[cboOrders]], so `JoinReorderDP` has persisted rowCount/ndv for
    * every leaf of a 3-table join (the DP rule only fires when ALL
    * items carry row counts). Dedicated roots — attaching catalog stats
    * to the shared fixtures would perturb every other query's plans. */
  def cboTriple(spark: SparkSession, sfDir: String)
      : (IceTable, IceTable, IceTable) =
    memo(s"$sfDir#cbo_triple") {
      val c = new IceTable(spark, newRoot("cbo_cust"), IceTableConfig(
        partitionExpr = lit(""), sortOrder = Seq("c_custkey")))
      c.insert(raw(spark, sfDir, "customer"))
      graft.ice.TableStats.analyze(c)
      val l = new IceTable(spark, newRoot("cbo_li"), IceTableConfig(
        partitionExpr = lit(""), sortOrder = Seq("l_orderkey")))
      l.insert(raw(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")))
      graft.ice.TableStats.analyze(l)
      (c, cboOrders(spark, sfDir), l)
    }

  /** b54: metadata min/max fixture — an events subset with per-file
    * footer stats recorded for (event_id, value), so groupless min/max
    * over those columns answers from the log markers alone. */
  def metaStatsEvents(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#metastats") {
      val t = new IceTable(spark, newRoot("metast"), IceTableConfig(
        partitionExpr = concat(lit("u="), pmod(col("user_id"), lit(4))),
        sortOrder = Seq("event_id"),
        statsColumns = Seq("event_id", "value")))
      t.insert(raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .where(col("event_id") % 4 === 2))
      t
    }

  /** b50: histogram-CBO fixture — events (event_id, user_id, value) in a
    * dedicated root. `value` is strongly right-skewed (p50 ≈ 35 against
    * max ≈ 490), exactly where a uniform min/max interpolation
    * mis-estimates range selectivity by the skew factor and an
    * equi-height histogram does not. Analyses run inside the query (the
    * estimate flip is the graded behavior). */
  def cboEvents(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#cbo_events") {
      val t = new IceTable(spark, newRoot("cbo_ev"), IceTableConfig(
        partitionExpr = lit(""), sortOrder = Seq("event_id")))
      t.insert(raw(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("value")))
      t
    }

  /** lineitem through the engine, hive-partitioned by ship month (83
    * partitions) and clustered by (shipdate, orderkey) for row-group
    * pruning. */
  def lineitemIce(spark: SparkSession, sfDir: String): IceTable =
    memo(s"$sfDir#lineitem") {
      val li = raw(spark, sfDir, "lineitem")
      val table = new IceTable(spark, newRoot("lineitem"), IceTableConfig(
        partitionExpr = concat(lit("m="), date_format(col("l_shipdate"), "yyyy-MM")),
        sortOrder = Seq("l_shipdate", "l_orderkey")))
      table.insert(li)
      table
    }
}
