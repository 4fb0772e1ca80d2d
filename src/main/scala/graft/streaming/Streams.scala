package graft.streaming

import graft.ice.IceTable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface: the reference's only streaming story is a
  * wall-clock batcher (examples/api-flask.py:51-141 — covered by
  * [[IceTable.insert]] inside `foreachBatch`, see StreamingIngestSpec);
  * these operators extend it with the event-time primitives a real stream
  * pipeline needs — watermarked windowed aggregation, session windows, and
  * custom keyed state — all on the engine's tables.
  */
object Streams {

  /** Watermarked tumbling/sliding event-time counts per key. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String = "1 minute",
      slideDuration: Option[String] = None,
      watermark: String = "2 minutes"): DataFrame = {
    val w = slideDuration.fold(window(col(tsCol), windowDuration))(s =>
      window(col(tsCol), windowDuration, s))
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), w.as("win"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), col("win.start").as("win_start"),
        col("win.end").as("win_end"), col("cnt"))
  }

  /** Event-time sessionization with a gap timeout — Spark's native
    * `session_window` (declarative; Catalyst owns the state store). */
  def sessionized(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sess"))
      .agg(count(lit(1)).as("events"),
        min(tsCol).as("first_ts"), max(tsCol).as("last_ts"))
      .select(col(keyCol), col("sess.start").as("sess_start"),
        col("sess.end").as("sess_end"), col("events"))

  /** Custom keyed state via mapGroupsWithState: running per-key event count
    * and latest value across micro-batches (the escape hatch when built-in
    * windows can't express the state machine). Emits one updated row per
    * key per batch — use OutputMode.Update. */
  def runningState(
      events: Dataset[(String, Long)]): Dataset[(String, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Long, Long)]) =>
          val (prevCnt, _) = state.getOption.getOrElse((0L, 0L))
          var cnt = prevCnt
          var latest = state.getOption.map(_._2).getOrElse(0L)
          rows.foreach { case (_, v) => cnt += 1; latest = math.max(latest, v) }
          state.update((cnt, latest))
          (key, cnt, latest)
      }
  }

  /** The materialized-view double-write as a streaming sink (reference:
    * examples/materialized-view.py:91-98 — the app writes every batch to
    * the raw table AND the aggregating MV table). Each micro-batch lands
    * in both tables; per-table inserts stay individually atomic (one log
    * PUT each), matching the reference's crash semantics: a crash between
    * the two writes can leave one batch ahead, reconciled by replay since
    * foreachBatch re-delivers the same batch id on restart. */
  def mvSink(
      stream: DataFrame,
      rawTable: IceTable,
      mvTable: IceTable,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds"),
      mergeEveryBatches: Int = 10): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val cached = batch.cache() // both inserts consume this batch
          try {
            rawTable.insert(cached)
            mvTable.insert(cached)
          } finally cached.unpersist()
          if (mergeEveryBatches > 0 && id > 0 && id % mergeEveryBatches == 0) {
            rawTable.merge()
            mvTable.merge()
          }
        }
        ()
      }
      .start()

  /** [[iceSink]] upgraded to exactly-once: each micro-batch commits its
    * data files and its `(queryName, batchId)` record in ONE atomic log
    * PUT via [[IceTable.insertBatch]], so the batch foreachBatch re-delivers
    * after a crash/restart is recognized from the table's own log and
    * skipped — no duplicate rows, no reliance on the checkpoint dir alone.
    * `queryName` must be stable across restarts (it IS the idempotence
    * key) and unique per (query, table) pair. */
  def iceSinkExactlyOnce(
      stream: DataFrame,
      table: IceTable,
      checkpoint: String,
      queryName: String,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds"),
      mergeEveryBatches: Int = 10): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // empty batches are skipped entirely: replaying them cannot
        // duplicate data, and recording them would append a log file per
        // idle trigger
        if (!batch.isEmpty) {
          val inserted = table.insertBatch(batch, queryName, id)
          if (inserted && mergeEveryBatches > 0 && id > 0 &&
              id % mergeEveryBatches == 0)
            table.merge()
        }
        ()
      }
      .start()

  /** Streaming deduplication bounded by event time: drop rows whose keys
    * were already seen within the watermark horizon. Unlike plain
    * `dropDuplicates` on a stream (whose state grows forever — every key
    * ever seen is held), `dropDuplicatesWithinWatermark` evicts key state
    * once the watermark passes it, so state size is bounded by the key
    * arrival rate × `delay`, not by stream lifetime — the only shape that
    * survives an unbounded ingest feed. Use upstream of an ice sink to
    * make at-least-once sources (HTTP retries, queue redeliveries)
    * effectively exactly-once per key within the horizon. */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** The reference's batcher loop as a streaming sink: every micro-batch is
    * one atomic ice insert; optional compaction every `mergeEveryBatches`. */
  def iceSink(
      stream: DataFrame,
      table: IceTable,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds"),
      mergeEveryBatches: Int = 10): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          table.insert(batch)
          if (mergeEveryBatches > 0 && id > 0 && id % mergeEveryBatches == 0)
            table.merge()
        }
        ()
      }
      .start()

  /** CONTINUOUS incremental view maintenance: tail the source's change
    * feed and fold every micro-batch into the MV — the streaming form of
    * [[graft.operators.MvSync.syncFromFeed]]. Count/sum land as
    * append-only delta partials; delete-touched groups recompute exactly
    * against the source AS OF the batch's own generation (time travel),
    * so the view converges no matter how far the stream lags the table.
    * Start shapes (the [[cdcReplicaSink]] contract): an EMPTY view with
    * `startingTimestamp = 0` (the replayed feed builds it from scratch),
    * or a [[graft.operators.MvSync.syncFromFeed]]-seeded view with the
    * stream started from its watermark. Exactly-once per batch via
    * [[IceTable.insertBatch]]; a gap marker fails the query loudly. */
  def mvSyncSink(
      source: IceTable,
      mv: IceTable,
      spec: graft.operators.MvSync.MvSpec,
      checkpoint: String,
      startingTimestamp: Long = 0L,
      queryName: String = "_mv_stream",
      trigger: Trigger = Trigger.ProcessingTime("3 seconds"),
      // star-join views: the dim handles in join order, re-pinned per
      // batch. The stream's dim-version BASELINES are recorded at setup
      // (below) — a dim mutation between the view's seed and the first
      // batch is detected, never silently adopted — and a later dim
      // mutation FAILS the query loudly with the rebase-and-restart
      // recipe (batch deltas cannot absorb a dim move) unless
      // `autoRebase` is set, in which case the next non-empty batch
      // absorbs it as one full reset generation against the new dim
      // state and the stream continues (see MvSync.applyFeedBatch)
      dimTables: Seq[IceTable] = Nil,
      autoRebase: Boolean = false,
      // opt-in self-defragmentation: every Nth non-empty batch lands as
      // one full reset generation (a rebase at the batch's own bound),
      // reclaims superseded rows, and re-arms the fold-free read — a
      // long-lived streaming view's read cost stops growing with
      // generation count without an operator cron running
      // REFRESH … FULL. Exactly-once holds across the cadence batch
      // (same (queryName, batchId) record). 0 = off
      rebaseEveryNBatches: Int = 0): StreamingQuery = {
    if (spec.joinDims.nonEmpty)
      graft.operators.MvSync.recordStreamDimBaseline(
        mv, spec, queryName, dimTables)
    source.spark.readStream
      .format("ice")
      .option("path", source.root)
      .option("changeFeed", "true")
      .option("startingTimestamp", startingTimestamp.toString)
      .load()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.MvSync.applyFeedBatch(
          source, mv, spec, batch, id, queryName,
          dimTables = dimTables, autoRebase = autoRebase,
          rebaseEveryNBatches = rebaseEveryNBatches)
        ()
      }
      .start()
  }

  /** CONTINUOUS replication: tail the source's streaming change feed and
    * apply every micro-batch onto the replica — the streaming form of
    * [[graft.ice.CdcApply.applyTo]]. Offsets live in the Structured
    * Streaming checkpoint (no watermark record on the target); a crash
    * replays the last batch, and [[graft.ice.CdcApply.applyChanges]] is
    * idempotent, so the replica converges — the same effectively-once
    * contract as the batch path. The replica must START in sync with the
    * stream's first offset: either an empty target with the stream
    * reading from `startingTimestamp = 0`, or a
    * [[graft.ice.CdcApply.applyTo]] initial sync with the stream started
    * from that watermark. A horizon-skip gap marker in a batch fails the
    * query loudly (a forked replica is worse than a dead stream).
    *
    * Scale shape: each micro-batch is one window-bounded collapse
    * shuffle plus affected-file-bounded rewrites — batch size, never
    * table size. */
  def cdcReplicaSink(
      source: IceTable,
      target: IceTable,
      keyCols: Seq[String],
      checkpoint: String,
      startingTimestamp: Long = 0L,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds")): StreamingQuery =
    source.spark.readStream
      .format("ice")
      .option("path", source.root)
      .option("changeFeed", "true")
      .option("startingTimestamp", startingTimestamp.toString)
      .load()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ice.CdcApply.applyChanges(batch, target, keyCols)
        ()
      }
      .start()
}
