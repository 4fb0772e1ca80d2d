package graft.streaming

import graft.ice.{IceLogIO, IceTable, IceTableConfig}
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.StreamBridge
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over an ice table's transaction log:
  * `spark.readStream.format("ice").option("path", root).load()` tails the
  * append-only changelog — the reader-side dual of the exactly-once sink
  * ([[Streams.iceSinkExactlyOnce]]). Together they close the loop the
  * reference approximates app-side with interval-flushed buffers
  * (examples/api-flask.py:51-141): ice table → stream → transform →
  * ice table, with end-to-end exactly-once from the engine.
  *
  * Semantics (the same contract as [[IceTable.addedFiles]]):
  *  - An offset is a log timestamp; a micro-batch is every file marker
  *    committed by a NON-merged log file in `(start, end]`. Merge and
  *    cleanup rewrite existing rows into new files but never produce new
  *    rows, so their logs are excluded — a consumer never sees a row
  *    twice no matter how aggressively the table compacts behind it.
  *  - Offsets are data-independent (pure log timestamps), so checkpoint
  *    recovery replays exactly the uncommitted window. Retention caveat:
  *    tombstone cleanup must lag the slowest consumer, or replayed
  *    markers may point at deleted parts (documented on `addedFiles`).
  *  - The schema is pinned at query start (the snapshot's accumulated
  *    union schema); files written before a later column was added read
  *    it as null — one consistent shape for the whole run.
  *
  * At 100 TB this stays driver-light: discovering a batch is one log
  * LIST plus fetches of only the new log files (KB-scale JSONL), never a
  * data-file listing; the data plane is a normal pruned parquet scan of
  * exactly the new files, executed distributed.
  *
  * Options: `path` (table root, required); `startingTimestamp` — `0`
  * (default) replays the table from the beginning, `latest` starts at the
  * current log head, any long starts strictly after that log timestamp;
  * `changeFeed` — `true` switches to the row-level change feed
  * ([[IceChangeFeedSource]]); `allowHorizonSkip` — change-feed only,
  * opt-in recovery when a tombstone cleanup overtakes the consumer (see
  * [[IceChangeFeedSource]]'s recovery notes); `branch` — read (or batch
  * write) a WAP branch's log instead of main ([[graft.ice.Branch]]; a
  * branch write requires the branch to already exist — writes never
  * imply a fork).
  *
  * The SAME short name is also the BATCH reader:
  * `spark.read.format("ice").option("path", root).load()` resolves a
  * catalog-grade snapshot relation ([[graft.plans.IceFileIndex]]) —
  * partition keys become queryable columns, WHERE clauses on them prune
  * files in the optimizer, and `option("snapshotTs", ts)` is time travel
  * (the strict `<` fold the reference documents). One format string,
  * both halves of the surface, like every production lakehouse format.
  */
class IceStreamProvider extends StreamSourceProvider with RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "ice"

  /** Batch read: `spark.read.format("ice")` → pinned-snapshot relation. */
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val table = tableFor(sqlContext, parameters)
    val maxTs = parameters.get("snapshotTs").map(_.toLong).getOrElse(Long.MaxValue)
    graft.plans.IceFileIndex.relation(sqlContext.sparkSession, table, maxTs)
  }

  /** Batch WRITE: `df.write.format("ice").option("path", root).save()` —
    * one atomic ice insert. Options: `partitionExpr` (a SQL expression
    * producing the partition path string, e.g.
    * `concat('d=', date_format(ts_col, 'yyyy-MM-dd'))`; default one
    * `all` partition), `sortOrder` (comma-separated intra-file sort
    * columns), `bucketBy` (`"<n>:<col>[,<col>...]"` — the co-located-join
    * hash-bucket layout, [[IceTableConfig.bucketBy]]). SaveMode semantics
    * against a log-based table:
    * Append = insert (the native operation); ErrorIfExists errors iff the
    * table already has commits; Ignore no-ops then; Overwrite is
    * REJECTED — truncation of an MVCC table is an explicit maintenance
    * decision (`removePartitions` / `rewritePartition`), not a write
    * mode's side effect. */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "ice batch sink requires option 'path' (table root URI)"))
    // WRITE to a WAP branch: the branch must already exist (Branch.create
    // records the fast-forward base — a write must never imply a fork),
    // and its persisted config is authoritative (no layout options here)
    parameters.get("branch").foreach { name =>
      Seq("partitionExpr", "sortOrder", "bucketBy").find(parameters.contains)
        .foreach(o => throw new IllegalArgumentException(
          s"ice: option '$o' cannot be combined with 'branch' — a branch " +
            "inherits its table's persisted config"))
      val main = IceTable.open(sqlContext.sparkSession, root)
      val b = graft.ice.Branch.openExisting(main, name).getOrElse(
        throw new IllegalArgumentException(
          s"ice: branch '$name' does not exist — Branch.create it first " +
            "(a write must not silently fork)"))
      // same SaveMode contract as the main-table path: a branch by
      // definition already has commits, so ErrorIfExists errors and
      // Ignore no-ops — only Append writes
      mode match {
        case SaveMode.Overwrite => throw new UnsupportedOperationException(
          "ice: SaveMode.Overwrite is not supported on a branch either")
        case SaveMode.ErrorIfExists => throw new IllegalStateException(
          s"ice: branch '$name' already has commits (SaveMode.ErrorIfExists)")
        case SaveMode.Ignore => ()
        case _ => b.insert(data); ()
      }
      return createRelation(sqlContext, parameters)
    }
    // an EXISTING table's persisted config is authoritative unless the
    // caller explicitly reconfigures: a bare append must not stamp the
    // provider defaults (partition 'all', no sort/stats) over the
    // creator's config — the log fold is last-writer-wins, so that would
    // silently re-route every later insert and drop stats skipping
    // one fold for config + existence + the insert pre-flight seed (the
    // hot batcher path pays per-append log reads otherwise)
    val (opened, snap) = IceTable.openWithSnapshot(sqlContext.sparkSession, root)
    val exists = snap.isDefined
    val base =
      if (exists) opened.cfg
      else IceTableConfig(partitionExpr = lit("all"), sortOrder = Seq.empty)
    val withPart = parameters.get("partitionExpr")
      .map(e => base.copy(partitionExpr = org.apache.spark.sql.functions.expr(e)))
      .getOrElse(base)
    val withSort = parameters.get("sortOrder")
      .map(so => withPart.copy(
        sortOrder = so.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
      .getOrElse(withPart)
    // `bucketBy` = "<n>:<col>[,<col>...]" — the co-located-join layout
    // (IceTableConfig.bucketBy) from the writer-option surface
    val cfg = parameters.get("bucketBy").map { spec =>
      spec.split(":", 2) match {
        case Array(n, cols) if n.trim.toIntOption.exists(_ >= 1) &&
            cols.split(",").exists(_.trim.nonEmpty) =>
          withSort.copy(bucketBy = Some((n.trim.toInt,
            cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)))
        case _ => throw new IllegalArgumentException(
          s"ice: option 'bucketBy' must be '<n>:<col>[,<col>...]', got '$spec'")
      }
    }.getOrElse(withSort)
    val table = new IceTable(sqlContext.sparkSession, root, cfg)
    snap.foreach(s => table.seedPreflight(s.schema)) // same fold, no re-read
    mode match {
      case SaveMode.Overwrite =>
        throw new UnsupportedOperationException(
          "ice: SaveMode.Overwrite is not supported — truncate explicitly " +
            "via removePartitions/rewritePartition, then Append")
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"ice: table at $root already has commits (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => () // no-op by contract
      case _ => table.insert(data); ()
    }
    createRelation(sqlContext, parameters)
  }

  private def tableFor(sqlContext: SQLContext, parameters: Map[String, String]): IceTable = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "ice stream source requires option 'path' (table root URI)"))
    // `branch` reads a WAP branch's log instead of main (graft.ice.Branch)
    val logRel = parameters.get("branch")
      .map(graft.ice.Branch.logRelFor).getOrElse("_log")
    // config is write-side only; reads need just the root + log
    new IceTable(sqlContext.sparkSession, root,
      IceTableConfig(partitionExpr = lit("all"), sortOrder = Seq.empty),
      logRel = logRel)
  }

  private def wantsChangeFeed(parameters: Map[String, String]): Boolean =
    parameters.get("changeFeed").exists(_.toBoolean)

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      tableFor(sqlContext, parameters).snapshot().schema.toStructType)
    (shortName(),
      if (wantsChangeFeed(parameters)) IceChangeFeedSource.withMeta(base) else base)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableFor(sqlContext, parameters)
    val pinned = schema.getOrElse(table.snapshot().schema.toStructType)
    val cdc = wantsChangeFeed(parameters)
    // `latest` must be the head THIS source's offsets advance over: for a
    // change feed that includes the _dv log (a MoR delete committed just
    // before start is history, not a first-batch event)
    val headFn: IceTable => Option[Long] =
      if (cdc) IceChangeFeedSource.headTs else IceStreamSource.maxLogTs
    val startTs = IceStreamSource.resolveStartTs(
      sqlContext, metadataPath, parameters, table, headFn)
    if (cdc) new IceChangeFeedSource(table, pinned, startTs,
      allowHorizonSkip = parameters.get("allowHorizonSkip").exists(_.toBoolean))
    else new IceStreamSource(table, pinned, startTs)
  }
}

object IceStreamSource {
  /** Head of the log: max timestamp over ALL log files (merged included —
    * the offset must cover every filename the next LIST can return, and an
    * empty micro-batch for a merge-only window is harmless). */
  def maxLogTs(table: IceTable): Option[Long] = {
    val logs = table.logio.currentLogFiles(table.root)
    if (logs.isEmpty) None
    else Some(logs.map(f => IceLogIO.logFileInfo(f)._1).max)
  }

  /** Never expose an offset inside the STILL-OPEN millisecond: a commit
    * whose filename shares the head's ms can land after the head was
    * read (a merged log never filename-collides with a non-merged one,
    * so the appender's same-ms bump does not serialize them; a second
    * host never collides by construction but shares the clock contract)
    * — consuming through that ms would skip the late commit FOREVER.
    * Capping at the settled bound ([[graft.ice.IceLogIO.settledTs]]:
    * now-1, AND below every in-flight same-process commit of the table
    * or its `_dv` log — a commit fixes its ts before its file is
    * visible, and serving that gap would lose it) means every served
    * window lies wholly in the settled past. Bumped-into-the-future
    * logs are simply served once the clock passes them — a delay,
    * never a loss. */
  def settledOffset(table: graft.ice.IceTable,
      head: Option[Long], startTs: Long): Option[Long] = {
    val settled = graft.ice.IceLogIO.settledTs(
      Seq(table.root, s"${table.root}/_dv"))
    head.map(h => math.min(h, settled)).filter(_ > startTs)
  }

  /** Monotone wrapper for a source's served offsets: a backwards clock
    * step (NTP) must never shrink the exposed offset — Spark requires
    * non-decreasing offsets, and the now-1 settling cap is clock-derived.
    * (Commit stamps themselves are already monotone via `max(now,
    * last+1)`.) [[observe]] additionally seeds the floor from getBatch's
    * checkpoint-recovered offsets, so a RESTART into a stepped-back
    * clock keeps the committed position once the engine replays its
    * uncommitted batch. Residual edge (documented, same as Spark's own
    * file source): a restart with everything committed AND a backwards
    * clock can serve one regressed empty batch before getBatch re-seeds;
    * that costs duplicate delivery of the regressed span, never loss. */
  final class MonotoneOffset {
    private var last = Long.MinValue
    def observe(v: Option[Long]): Unit = synchronized {
      v.foreach(x => last = math.max(last, x))
    }
    def apply(v: Option[Long]): Option[Long] = synchronized {
      v.foreach(x => last = math.max(last, x))
      if (last == Long.MinValue) None else Some(last)
    }
  }

  /** Resolve the start timestamp ONCE per checkpoint, not once per
    * (re)start: `latest` captured at first start is persisted under the
    * source's metadata path, so a query restarted tomorrow resumes from
    * its original head instead of silently skipping everything inserted
    * while it was down (the same reason Kafka's source writes its initial
    * offsets to the checkpoint). */
  def resolveStartTs(
      sqlContext: SQLContext,
      metadataPath: String,
      parameters: Map[String, String],
      table: IceTable,
      headFn: IceTable => Option[Long] = maxLogTs): Long = {
    import org.apache.hadoop.fs.Path
    val p = new Path(metadataPath, "ice-start-ts")
    val fs = p.getFileSystem(sqlContext.sparkSession.sparkContext.hadoopConfiguration)
    def read(): Long = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    if (fs.exists(p)) read()
    else {
      val computed = parameters.get("startingTimestamp") match {
        case Some("latest") => headFn(table).getOrElse(0L)
        case Some(v) => v.toLong
        case None => 0L
      }
      fs.mkdirs(p.getParent)
      try {
        val out = fs.create(p, false) // no-overwrite: first writer wins
        try out.write(computed.toString.getBytes("UTF-8")) finally out.close()
        computed
      } catch { case _: java.io.IOException => read() }
    }
  }
}

class IceStreamSource(table: IceTable, pinnedSchema: StructType, startTs: Long)
    extends Source {

  override def schema: StructType = pinnedSchema

  private val monotone = new IceStreamSource.MonotoneOffset

  override def getOffset: Option[Offset] =
    monotone(IceStreamSource.settledOffset(table,
      IceStreamSource.maxLogTs(table), startTs)).map(LongOffset(_))

  private def ts(o: Offset): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    monotone.observe(start.map(ts)); monotone.observe(Some(ts(end)))
    val since = start.map(ts).getOrElse(startTs)
    val spark = table.spark
    val files = table.addedFiles(since, ts(end))
    val batch =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], pinnedSchema)
      else
        // explicit file list + pinned schema: no directory listing (and
        // no DataFrameReader bulk-listing job — see IceTable.scanMarkers),
        // and pre-schema-evolution files surface later columns as null
        table.scanMarkers(pinnedSchema, files)
    StreamBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"IceStreamSource[${table.root}]"
}

object IceChangeFeedSource {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}
  /** The base schema plus the feed's (`_change_type`, `_commit_ts`). */
  def withMeta(base: StructType): StructType =
    StructType(base.fields.toSeq ++ Seq(
      StructField(graft.ice.ChangeFeed.ChangeTypeCol, StringType, nullable = false),
      StructField(graft.ice.ChangeFeed.CommitTsCol, LongType, nullable = false)))

  /** Max ts across main AND dv logs (a MoR delete must advance the
    * offset; merged logs included — empty windows are harmless). A
    * missing `_dv` dir is the non-throwing empty list; a REAL listing
    * failure propagates — swallowing it would emit a batch missing its
    * delete events while the engine commits the offset past them. */
  def headTs(table: IceTable): Option[Long] = {
    val main = IceStreamSource.maxLogTs(table)
    val dv = IceStreamSource.maxLogTs(graft.ice.DeleteVectors.dvTable(table))
    (main.toSeq ++ dv.toSeq).maxOption
  }
}

/** Streaming CHANGE-DATA feed: `spark.readStream.format("ice")
  * .option("path", root).option("changeFeed", "true").load()` tails
  * [[graft.ice.ChangeFeed]] — every micro-batch is the exact row-level
  * change multiset of `(start, end]`: inserts, copy-on-write UPDATE
  * image pairs, and merge-on-read deletes with recovered content, while
  * compaction windows are EMPTY batches (content-preserving rewrites
  * cancel). Offsets cover the main log AND the `_dv` side log, so a
  * merge-on-read delete advances the offset even though it commits no
  * main-table log. Same retention caveat as the append source, one
  * stronger: tombstone cleanup must lag the slowest consumer, or the
  * attribution floor rejects the replayed window loudly (never silently
  * under-reports). Schema is pinned at query start; late-evolved columns
  * surface when the query restarts.
  *
  * RECOVERY after a tombstone cleanup overtakes the consumer (the next
  * batch throws "history ... was consolidated", permanently — the
  * checkpointed offset is below the floor on every restart). Two
  * documented paths:
  *  - restart the query with a FRESH checkpoint directory and
  *    `option("startingTimestamp", f)` where
  *    `f >= ChangeFeed.consolidationFloor(table)` (`"latest"` also
  *    works) — explicit, at the cost of abandoning the old checkpoint;
  *  - opt in to `option("allowHorizonSkip", "true")`: a batch whose
  *    start fell below the floor resumes FROM the floor and prepends one
  *    GAP MARKER row — `_change_type = "gap"`, `_commit_ts` = the floor,
  *    all data columns null — so the skipped span is visible in-band,
  *    never silently dropped. Changes after the floor arrive exactly as
  *    usual.
  */
class IceChangeFeedSource(table: IceTable, baseSchema: StructType, startTs: Long,
    allowHorizonSkip: Boolean = false)
    extends Source {

  private val pinned = IceChangeFeedSource.withMeta(baseSchema)

  override def schema: StructType = pinned

  private val monotone = new IceStreamSource.MonotoneOffset

  override def getOffset: Option[Offset] =
    monotone(IceStreamSource.settledOffset(table,
      IceChangeFeedSource.headTs(table), startTs)).map(LongOffset(_))

  private def ts(o: Offset): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    monotone.observe(start.map(ts)); monotone.observe(Some(ts(end)))
    val since0 = start.map(ts).getOrElse(startTs)
    val spark = table.spark
    // horizon-skip recovery: resume from the consolidation floor and say
    // so in-band. The floor read costs one metadata fetch and happens
    // only under the opt-in.
    val floor =
      if (allowHorizonSkip) graft.ice.ChangeFeed.consolidationFloor(table)
      else Long.MinValue
    val skipped = allowHorizonSkip && since0 < floor
    val since = if (skipped) floor else since0
    val feed = graft.ice.ChangeFeed.between(table, since, ts(end))
    val batch =
      if (!pinned.fieldNames.forall(feed.columns.contains))
        // no-log edge (ChangeFeed's meta-only empty shape): empty batch
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], pinned)
      else
        // pin the query-start schema: a column added mid-run stays
        // invisible until restart (feed columns only ever grow)
        feed.select(pinned.fieldNames.toSeq.map(c =>
          org.apache.spark.sql.functions.col(s"`$c`")): _*)
    val withGap =
      if (!skipped) batch
      else {
        val gapRow = Row.fromSeq(
          baseSchema.fields.toSeq.map(_ => null) ++ Seq("gap", floor))
        spark.createDataFrame(
          java.util.Collections.singletonList(gapRow), pinned)
          .unionByName(batch)
      }
    StreamBridge.asStreamingBatch(withGap)
  }

  override def stop(): Unit = ()

  override def toString: String = s"IceChangeFeedSource[${table.root}]"
}
