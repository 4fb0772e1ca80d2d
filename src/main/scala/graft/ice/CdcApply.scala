package graft.ice

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Downstream replication: apply a [[ChangeFeed]] window onto another
  * [[IceTable]] — the consumer half of the CDC surface (the reference
  * exposes only the producer side; Delta calls this pattern "CDF +
  * MERGE into the replica"). One call = one settled window:
  *
  *   1. read the source's changes since the replica's recorded
  *      watermark ([[ChangeFeed.betweenSettled]]);
  *   2. collapse the window to ONE final change per key — the latest
  *      `_commit_ts` wins, and within a commit an update's
  *      ('delete','insert') image pair resolves to the insert;
  *   3. apply final deletes via [[IceTable.deleteKeys]] and final
  *      upserts via [[IceTable.upsert]] (both rewrite only affected
  *      files);
  *   4. record the window's settled bound as a `streamCommits`
  *      watermark on the target — the same per-query-max record that
  *      makes [[IceTable.insertBatch]] exactly-once, so it survives
  *      compaction and cleanup log rewrites.
  *
  * A missing watermark triggers an INITIAL SYNC: a truly fresh target
  * (no commits) takes the DIRECT INSERT path — no key-join against an
  * empty replica — while a target with prior commits (including a
  * crash-replay of the initial insert itself) upserts the snapshot
  * wholesale (idempotent); incremental windows chain from that bound.
  *
  * Effectively-once, not atomically-once: the delete/upsert/watermark
  * commits are separate, but every step is an idempotent function of
  * the (immutable) window — deleteKeys of already-absent keys is a
  * no-op, upsert of identical finals replaces byte-equal content — so
  * a crash anywhere replays the same window and converges. This is the
  * standard CDF-consumer contract.
  *
  * Scale shape: the collapse is ONE key-shuffle over the window (not
  * the table); apply cost is bounded by affected files, exactly like
  * interactive MERGE. The replica watermark read is a metadata fold.
  *
  * Failure surface inherited from the feed: a source tombstone cleanup
  * that consolidates past the watermark makes the next window
  * unattributable and [[ChangeFeed.between]] throws — re-seed with
  * [[reseed]] (drops the watermark, forcing a fresh initial sync).
  */
object CdcApply {

  /** @param watermark  the settled bound now recorded on the target
    * @param upserted   rows written as final inserts/updates
    * @param deleted    rows removed from the target
    * @param initialSync true when this call seeded the replica */
  final case class ApplyResult(
      watermark: Long, upserted: Long, deleted: Long, initialSync: Boolean)

  private def wmKey(replicaId: String) = s"_cdc_apply:$replicaId"

  /** The replica's last applied settled bound, if it has ever synced. */
  def watermark(target: IceTable, replicaId: String = "default"): Option[Long] =
    readMark(target, wmKey(replicaId))

  /** The raw mark channel, for OTHER feed consumers (e.g. the text-index
    * sync) that keep their own progress on one of their tables under
    * their own key namespace. */
  private[graft] def readMark(t: IceTable, key: String): Option[Long] =
    t.trySnapshot(Long.MaxValue).flatMap(_.streamCommits.get(key))

  /** Recovery after a source cleanup consolidated history past the
    * watermark (the next [[applyTo]] throws unattributable): stream
    * commit records are per-key MAX across the fold, so a watermark can
    * never be lowered in place — re-seeding starts a NEW generation key
    * instead. Pass the returned id to future [[applyTo]] calls; its
    * missing watermark forces a fresh initial sync, which is correct
    * after history loss (upsert converges the replica to the snapshot). */
  def reseed(replicaId: String): String = {
    // generation suffix keeps the max-merge watermark semantics intact:
    // the old key's record stays true (it WAS applied through there);
    // the new generation simply starts from scratch
    val gen = replicaId.split("#gen", 2)(0)
    val n = replicaId.split("#gen", 2).lift(1).flatMap(_.toIntOption).getOrElse(0)
    s"$gen#gen${n + 1}"
  }

  /** Apply everything the source committed since the replica watermark.
    * `keyCols` identify rows across images (the same contract as
    * [[IceTable.upsert]]: the source must keep keys unique). */
  def applyTo(
      source: IceTable,
      target: IceTable,
      keyCols: Seq[String],
      replicaId: String = "default"): ApplyResult = {
    require(keyCols.nonEmpty, "applyTo requires at least one key column")
    watermark(target, replicaId) match {
      case None =>
        // initial sync at a settled bound: commits after `until` belong
        // to the first incremental window, commits at or before it are
        // all in this snapshot — no seam
        val until = ChangeFeed.settledNow(source)
        val n = source.trySnapshot(until + 1) match {
          case None => 0L // source empty: an empty replica is in sync
          case Some(_) if target.trySnapshot(Long.MaxValue).isEmpty =>
            // FRESH replica (no commits at all): the snapshot routes
            // straight to insert — a key-join against an empty target
            // would shuffle the whole corpus for nothing. A crash after
            // this insert but before the watermark leaves commits on the
            // target, so the retry takes the upsert branch and converges.
            // The count reads the freshly-committed replica (parquet
            // row-group metadata — no data pages), never a checkpoint of
            // the whole corpus just to count it. Replicas are
            // single-consumer by contract; a foreign writer racing this
            // window could only skew the REPORTED count, never the data.
            target.insert(source.read(until + 1))
            target.read().count()
          case Some(_) =>
            val rows = source.read(until + 1)
            target.upsert(rows, keyCols)._2 // idempotent on crash-replay
        }
        commitWatermark(target, replicaId, until)
        ApplyResult(until, n, 0L, initialSync = true)

      case Some(wm) =>
        val (feed, until) = ChangeFeed.betweenSettled(source, wm)
        applyChanges(feed, target, keyCols) match {
          case None =>
            // nothing changed: leave the watermark alone so an idle poll
            // loop writes NOTHING to the target log (the unmoved bound
            // just means the next window re-folds a little more
            // metadata; replay of an already-applied prefix is
            // idempotent anyway)
            ApplyResult(wm, 0L, 0L, initialSync = false)
          case Some((upserted, deleted)) =>
            commitWatermark(target, replicaId, until)
            ApplyResult(until, upserted, deleted, initialSync = false)
        }
    }
  }

  /** The apply core: collapse a change frame (`_change_type` +
    * `_commit_ts` + data columns, any window or micro-batch) to ONE
    * final change per key, then apply. None = the frame was empty
    * (callers decide whether to move their own bookkeeping); otherwise
    * (upserted, deleted). Idempotent: re-applying the same frame
    * converges. Also the foreachBatch body of the STREAMING replica
    * ([[graft.streaming.Streams.cdcReplicaSink]]), whose offsets live in
    * the Structured Streaming checkpoint instead of the watermark
    * record. A `'gap'` marker row (horizon-skip recovery) means changes
    * were irrecoverably missed — applying it would silently fork the
    * replica, so it throws; re-seed instead. */
  def applyChanges(
      changes: DataFrame,
      target: IceTable,
      keyCols: Seq[String]): Option[(Long, Long)] = {
    require(keyCols.nonEmpty, "applyChanges requires at least one key column")
    // collapse: latest commit wins per key; an update's same-ts image
    // pair resolves to its insert half. One shuffle, window-bounded.
    // localCheckpoint: finals feed BOTH the delete and the upsert branch
    // — never recompute the upstream (log-diff or stream) DAG twice
    val pri = when(col(ChangeFeed.ChangeTypeCol) === "insert", 1).otherwise(0)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ChangeFeed.CommitTsCol).desc, pri.desc)
    val finals = changes
      .withColumn("_cdc_rn", row_number().over(w))
      .where(col("_cdc_rn") === 1)
      .drop("_cdc_rn")
      .localCheckpoint()
    val counts: Map[String, Long] = finals
      .groupBy(ChangeFeed.ChangeTypeCol).count().collect()
      .map((r: Row) => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return None
    require(!counts.contains("gap"),
      "change frame contains a horizon-skip gap marker: changes before " +
        "the consolidation floor are unrecoverable, the replica must be " +
        "re-seeded (CdcApply.reseed / a fresh initial sync)")
    val deleted =
      if (counts.getOrElse("delete", 0L) == 0L) 0L
      else target.deleteKeys(
        finals.where(col(ChangeFeed.ChangeTypeCol) === "delete")
          .select(keyCols.map(col): _*), keyCols)
    val upserted =
      if (counts.getOrElse("insert", 0L) == 0L) 0L
      else target.upsert(
        finals.where(col(ChangeFeed.ChangeTypeCol) === "insert")
          .drop(ChangeFeed.ChangeTypeCol, ChangeFeed.CommitTsCol),
        keyCols)._2
    Some((upserted, deleted))
  }

  /** Run [[applyTo]] until a window comes back empty — catch-up /
    * backfill loop for a replica that fell behind. Returns the summed
    * result at the final watermark. */
  def catchUp(
      source: IceTable,
      target: IceTable,
      keyCols: Seq[String],
      replicaId: String = "default",
      maxWindows: Int = 1000): ApplyResult = {
    var acc = applyTo(source, target, keyCols, replicaId)
    // loop on the LAST round's outcome, not the accumulator — the sum
    // stays positive forever once anything applied
    var last = acc
    var rounds = 1
    while ((last.upserted > 0 || last.deleted > 0 || last.initialSync) &&
        rounds < maxWindows) {
      last = applyTo(source, target, keyCols, replicaId)
      acc = ApplyResult(last.watermark, acc.upserted + last.upserted,
        acc.deleted + last.deleted, acc.initialSync)
      rounds += 1
    }
    acc
  }

  /** The watermark rides the same log-fold `streamCommits` channel as
    * streaming exactly-once batch ids: per-key max across the fold,
    * carried through merge/cleanup rewrites. A files-empty commit —
    * the log format has no objection; the fold sees no markers and one
    * (idempotent) schema re-accumulation. */
  private def commitWatermark(
      target: IceTable, replicaId: String, until: Long): Unit =
    commitMark(target, wmKey(replicaId), until)

  private[graft] def commitMark(t: IceTable, key: String, ts: Long): Unit = {
    val sch = new Schema
    t.trySnapshot(Long.MaxValue)
      .foreach(s => sch.accumulate(s.schema.columns, s.schema.types))
    t.logio.append(t.root, 1, sch, Seq.empty,
      streamCommits = Map(key -> ts),
      tableCfg = t.persistedCfg)
  }
}
