package graft.ice

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** ATOMIC MULTI-TABLE COMMIT: stage inserts to any number of ice tables,
  * then make them ALL visible with ONE atomic marker PUT — no reader ever
  * observes a partial transaction. The reference has no cross-table
  * atomicity at all (each table's log append is its own transaction,
  * `/root/reference/ARCHITECTURE.md:19-100`); this closes the classic
  * fact+dimension / data+index ingest gap.
  *
  * Mechanics (Percolator-style deferred visibility, adapted to the
  * filename-is-identity log):
  *
  *  1. '''stage''': each `insert(table, df)` writes ordinary data files
  *     plus a log file named `{ts}_{host}_x{txnId}.jsonl`. Tagged logs
  *     are EXCLUDED from [[IceLogIO.currentLogFiles]] — the single
  *     listing choke point every reader surface folds through
  *     (snapshots, checkpoints, change feeds, streaming source,
  *     maintenance) — until the transaction confirms.
  *  2. '''commit''': one PUT of `<parent>/_txn/<txnId>.commit`. From that
  *     instant every staged log joins every listing — all tables at
  *     once. Confirmed ids cache process-wide (a marker never
  *     un-commits), so the steady-state listing cost is zero.
  *  3. '''abort / crash''': no marker — staged logs stay invisible
  *     forever; [[IceTable.vacuumOrphans]] reclaims expired unconfirmed
  *     stages (log + data files). [[commit]] refuses past the TTL, so a
  *     zombie commit can never race the vacuum's reclaim, the same
  *     clock-lease discipline as [[TableLock]].
  *
  * All tables in one transaction must share a parent directory — the
  * marker's location is derived from each table's root alone, which is
  * what lets any reader check it with no side channel (the SQL
  * warehouse layout gives this for free).
  *
  * Visibility timing: a committed transaction appears AT ITS STAGED
  * TIMESTAMPS. In-process change-feed/streaming consumers are protected
  * by the commit-visibility registry (the staged ts registers as an
  * in-flight floor until commit/abort, so no settled window closes past
  * an open transaction). Cross-process consumers have the same contract
  * as any cross-process commit: keep stage→commit short.
  *
  * Scope: inserts (the multi-table ingest shape). Mutations stay
  * single-table atomic via their own validated commits.
  *
  * 100 TB shape: staging IS the normal distributed insert (one shuffle
  * per table, executors write parquet); the commit adds exactly one
  * small PUT regardless of table count or data volume.
  */
final class IceTransaction private (
    val spark: SparkSession, val id: String,
    ttlMs: Long = IceTransaction.TtlMs,
    // test seam: runs between the marker PUT and the post-PUT
    // verifications, where a GC pause / slow store can park the commit
    private[ice] val afterMarkerPut: () => Unit = () => ()) {

  private sealed trait State
  private case object Pending extends State
  private case object Committed extends State
  private case object Aborted extends State

  @volatile private var state: State = Pending
  // (table, staged markers, staged ts, staged log rel) in stage order
  private val staged =
    mutable.Buffer.empty[(IceTable, Seq[FileMarker], Long, String)]
  private var parentDir: Option[Path] = None
  private val beganAt = System.currentTimeMillis()
  // every settled-floor pin this transaction takes is tagged with this
  // deadline, so an ABANDONED transaction (never commit()/abort()) stops
  // pinning change-feed/streaming windows the moment its TTL lapses —
  // the same instant commit() starts refusing, so an expired pin can
  // never hide a commit that still lands
  private val floorDeadline = beganAt + ttlMs

  private def requirePending(op: String): Unit =
    require(state == Pending, s"cannot $op: transaction $id is $state")

  /** Stage one insert. Data files + the tagged log land now (the
    * distributed write happens here); visibility waits for [[commit]].
    * Pre-flight failures (schema conflict, CHECK violation) throw and
    * leave the transaction pending — stage a fixed batch or [[abort]]. */
  def insert(table: IceTable, df: DataFrame): this.type = synchronized {
    requirePending("insert")
    val p = Option(new Path(table.root).getParent).getOrElse(new Path("/"))
    parentDir match {
      case None => parentDir = Some(p)
      case Some(q) => require(q.toString == p.toString,
        s"all tables in a transaction must share one parent directory " +
          s"(marker location): ${q} vs ${p}")
    }
    // hold the settled floor from the moment the staged ts exists until
    // commit/abort (or, if abandoned, until the TTL deadline lapses):
    // no in-process feed window may close past it
    val regTs = IceLogIO.registerCommitFloor(
      table.root, System.currentTimeMillis(), deadline = floorDeadline)
    var ok = false
    try {
      val (markers, ts, logRelPath) = table.stageTxnInsert(df, id)
      // re-pin at the ACTUAL staged ts (append may have bumped forward);
      // the entry registered above covered the gap
      IceLogIO.registerCommitFloor(table.root, ts, deadline = floorDeadline)
      staged += ((table, markers, ts, logRelPath))
      ok = true
    } finally {
      IceLogIO.endCommit(table.root, regTs, deadline = floorDeadline)
      if (!ok) () // staged nothing; the pre-registration is already ended
    }
    this
  }

  /** The atomic commit point: one marker PUT makes every staged insert
    * visible to every reader at once. Refuses past [[IceTransaction.TtlMs]]
    * (an expired transaction may already have been vacuum-reclaimed).
    *
    * The TTL self-check alone is a clock-lease COMPROMISE: a skewed clock
    * (or a pause between the check and the PUT) could land the marker
    * while a vacuum is mid-reclaim. Two post-PUT verifications close it:
    *
    *  1. '''abort-intent handshake''' ([[IceLogIO.txnAbortPath]]): the
    *     vacuum PUTs `<id>.abort` before touching any expired stage, and
    *     re-probes the commit marker after; commit probes the intent
    *     right after its own PUT. On a strongly-consistent store exactly
    *     one side wins — if the intent is present here, the vacuum's
    *     post-intent probe could not have seen our marker, so it is (or
    *     will be) reclaiming: delete our marker and die.
    *  2. '''staged-log re-verification''': every staged log must still
    *     exist after the PUT — belt-and-braces against a reclaim that
    *     predates the handshake (e.g. an aged-out intent marker).
    *
    * Either failure deletes the marker and throws: a skewed clock can
    * KILL a transaction (all-invisible, files left to the vacuum), never
    * partially commit one. */
  def commit(): Unit = synchronized {
    requirePending("commit")
    def releaseFloors(): Unit =
      staged.foreach { case (t, _, ts, _) =>
        IceLogIO.endCommit(t.root, ts, deadline = floorDeadline) }
    if (System.currentTimeMillis() - beganAt >= ttlMs) {
      // the stage may already be vacuum-reclaimed: the transaction is
      // dead. Release the settled-floor pins NOW (a floor held past this
      // throw would wedge every change-feed window for the staged tables
      // until its deadline lapses); the staged files are the vacuum's job.
      state = Aborted
      releaseFloors()
      throw new IllegalStateException(
        s"transaction $id exceeded its ${ttlMs} ms TTL and " +
          "may have been vacuum-reclaimed; it is now aborted — retry with " +
          "a fresh transaction")
    }
    if (staged.nonEmpty) {
      val marker = IceLogIO.txnMarkerPath(staged.head._1.root, id)
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(marker, false) // create-if-absent: ids are unique
      try out.write(graft.ice.Json.obj(
        "id" -> id, "t" -> System.currentTimeMillis(),
        "tables" -> staged.map(_._1.root).distinct).getBytes("UTF-8"))
      finally out.close()
      def die(reason: String): Nothing = {
        // un-commit while the reclaim is still holding the other side of
        // the handshake; without the delete, later probes would cache a
        // marker whose stage is gone. Also drop any same-process cache
        // entry a reader may have primed during the marker's transient
        // existence.
        try fs.delete(marker, false) catch { case _: Exception => () }
        IceLogIO.unprimeTxnConfirmed(marker)
        state = Aborted
        releaseFloors()
        throw new IllegalStateException(
          s"transaction $id was reclaimed by a concurrent vacuum " +
            s"($reason); it is now aborted — nothing became visible. " +
            "Retry with a fresh transaction (check cross-process clock " +
            s"skew: the stage was classified older than the " +
            s"${IceTransaction.TtlMs} ms TTL)")
      }
      afterMarkerPut()
      // the entry TTL gate ran BEFORE the marker PUT: a slow store or a
      // GC pause can land the PUT past floorDeadline, by which time
      // purgeExpired has released the settled-floor pins and an
      // in-process feed window may already have closed past the staged
      // ts — the commit would surface BELOW the watermark and feed/MV
      // consumers would permanently miss it. Re-check and un-commit:
      // past the deadline the transaction dies, never lands late.
      if (System.currentTimeMillis() >= floorDeadline)
        die(s"the ${ttlMs} ms TTL lapsed during the marker PUT, after " +
          "the settled-floor pins expired")
      val abortIntent = IceLogIO.txnAbortPath(staged.head._1.root, id)
      if (fs.exists(abortIntent)) die("reclaim-intent marker present")
      staged.foreach { case (t, _, _, rel) =>
        if (!t.logio.fs(t.root).exists(new Path(t.root, rel)))
          die(s"staged log $rel missing from ${t.root}")
      }
      IceLogIO.primeTxnConfirmed(marker)
    }
    state = Committed
    releaseFloors()
  }

  /** Discard every staged insert: delete the tagged logs and their data
    * files. Idempotent-ish (a crash mid-abort leaves the rest to the
    * vacuum — with no marker they were never visible). */
  def abort(): Unit = synchronized {
    requirePending("abort")
    state = Aborted
    staged.foreach { case (t, markers, ts, rel) =>
      IceLogIO.endCommit(t.root, ts, deadline = floorDeadline)
      try {
        val fsys = t.logio.fs(t.root)
        fsys.delete(new Path(t.root, rel), false)
        markers.foreach(m =>
          fsys.delete(new Path(t.root, m.path), false))
      } catch { case _: Exception => () } // vacuum finishes the job
    }
  }
}

object IceTransaction {

  /** A pending transaction older than this is reclaimable by
    * [[IceTable.vacuumOrphans]] and refuses to commit — the clock-lease
    * compromise that keeps reclaim and commit from racing. */
  val TtlMs: Long = 3_600_000L

  def begin(spark: SparkSession): IceTransaction =
    new IceTransaction(spark, newId())

  /** Test seam: a transaction with a shortened TTL (floor deadline +
    * commit refusal move together, exactly like the production value),
    * and optionally a pause injected between the marker PUT and the
    * post-PUT verifications (the GC-pause / slow-store window). */
  private[ice] def beginWithTtl(spark: SparkSession, ttlMs: Long,
      afterMarkerPut: () => Unit = () => ()): IceTransaction =
    new IceTransaction(spark, newId(), ttlMs, afterMarkerPut)

  private def newId(): String = {
    val u = java.util.UUID.randomUUID()
    f"${u.getMostSignificantBits}%016x".takeRight(8) +
      f"${u.getLeastSignificantBits}%016x".takeRight(8)
  }
}
