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
    val spark: SparkSession, val id: String) {

  private sealed trait State
  private case object Pending extends State
  private case object Committed extends State
  private case object Aborted extends State

  @volatile private var state: State = Pending
  // (table, staged markers, staged ts) in stage order
  private val staged = mutable.Buffer.empty[(IceTable, Seq[FileMarker], Long)]
  private var parentDir: Option[Path] = None
  private val beganAt = System.currentTimeMillis()

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
    // commit/abort: no in-process feed window may close past it
    val regTs = IceLogIO.registerCommitFloor(table.root, System.currentTimeMillis())
    var ok = false
    try {
      val (markers, ts) = table.stageTxnInsert(df, id)
      // re-pin at the ACTUAL staged ts (append may have bumped forward);
      // the entry registered above covered the gap
      IceLogIO.registerCommitFloor(table.root, ts)
      staged += ((table, markers, ts))
      ok = true
    } finally {
      IceLogIO.endCommit(table.root, regTs)
      if (!ok) () // staged nothing; the pre-registration is already ended
    }
    this
  }

  /** The atomic commit point: one marker PUT makes every staged insert
    * visible to every reader at once. Refuses past [[IceTransaction.TtlMs]]
    * (an expired transaction may already have been vacuum-reclaimed). */
  def commit(): Unit = synchronized {
    requirePending("commit")
    if (System.currentTimeMillis() - beganAt >= IceTransaction.TtlMs) {
      // the stage may already be vacuum-reclaimed: the transaction is
      // dead. Release the settled-floor pins NOW (a floor held past this
      // throw would wedge every change-feed window for the staged tables
      // for the JVM's lifetime); the staged files are the vacuum's job.
      state = Aborted
      staged.foreach { case (t, _, ts) => IceLogIO.endCommit(t.root, ts) }
      throw new IllegalStateException(
        s"transaction $id exceeded its ${IceTransaction.TtlMs} ms TTL and " +
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
      IceLogIO.primeTxnConfirmed(marker)
    }
    state = Committed
    staged.foreach { case (t, _, ts) => IceLogIO.endCommit(t.root, ts) }
  }

  /** Discard every staged insert: delete the tagged logs and their data
    * files. Idempotent-ish (a crash mid-abort leaves the rest to the
    * vacuum — with no marker they were never visible). */
  def abort(): Unit = synchronized {
    requirePending("abort")
    state = Aborted
    staged.foreach { case (t, markers, ts) =>
      IceLogIO.endCommit(t.root, ts)
      try {
        val fsys = t.logio.fs(t.root)
        t.logio.stagedLogFiles(t.root).collect {
          case (rel, sid) if sid == id =>
            fsys.delete(new Path(t.root, rel), false)
        }
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

  private def newId(): String = {
    val u = java.util.UUID.randomUUID()
    f"${u.getMostSignificantBits}%016x".takeRight(8) +
      f"${u.getLeastSignificantBits}%016x".takeRight(8)
  }
}
