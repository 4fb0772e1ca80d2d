package graft.ice

import org.apache.hadoop.fs.Path

/** BRANCHES: write-audit-publish (WAP) over the transaction log, zero
  * data copy.
  *
  * A branch is a second log directory under the SAME table root —
  * `{root}/_branch/{name}/_log/` — seeded by ONE metadata-only commit
  * re-listing the main snapshot's alive file markers. Data files are
  * shared (`_data/...` paths are root-relative in both logs), so
  * creating a branch costs one log write regardless of table size, and
  * every engine operation — insert, CoW UPDATE/DELETE/upsert,
  * compaction, time travel, SQL through a registered handle — works on
  * the branch handle unchanged, isolated from main readers.
  *
  * The WAP loop:
  * {{{
  *   val b = Branch.create(main, "audit")   // metadata-only fork
  *   b.insert(batch); b.deleteWhere(bad)    // write + fix on the branch
  *   // ... validate b.read() ...
  *   Branch.publish(main, "audit")          // ONE atomic main commit
  *   Branch.drop(main, "audit")
  * }}}
  *
  * Publish is FAST-FORWARD ONLY: it requires main's log head to still be
  * the branch's recorded base — a concurrent main commit fails the
  * publish with a conflict (re-create the branch from the new head and
  * replay; an automatic rebase would silently reorder writes). The
  * publish commit is the branch-vs-base marker diff (new files added,
  * base files the branch dropped tombstoned), so the change feed reports
  * a publish exactly like the batched write it is, and replicas follow.
  *
  * Contracts and edges:
  *  - branch-written data files live under the shared `_data/`;
  *    [[IceTable.vacuumOrphans]] folds every live branch's log before
  *    sweeping, and [[drop]] is what releases a branch's files to the
  *    next sweep;
  *  - main-side tombstone CLEANUP treats every live branch as a
  *    retention PIN: a file a branch's log still references is never
  *    reclaimed, however aggressive `min_age_ms` is — its tombstoned
  *    marker is carried forward, and the first cleanup after [[drop]]
  *    reclaims it normally (the same fold-every-branch rule as
  *    [[IceTable.vacuumOrphans]]);
  *  - merge-on-read deletes are NOT branch-isolated (the `_dv` side
  *    table is keyed by the shared root) — [[DeleteVectors.deleteWhere]]
  *    rejects branch handles; use the branch's CoW
  *    [[IceTable.deleteWhere]], which is isolated by construction.
  *
  * Reference analog: none — the reference has a single linear log; this
  * is the Iceberg-branch / WAP workflow the format's MVCC makes nearly
  * free.
  */
object Branch {

  /** streamCommits key recording the main log head the branch forked at. */
  private[ice] val BaseKey = "_branch_base"

  /** streamCommits key recording the `_dv` log head at fork: merge-on-read
    * deletes land in a SEPARATE log the main-head check cannot see, yet a
    * publish that swaps a base file for a branch rewrite would silently
    * resurrect rows a post-fork dv delete killed (branch rewrites carry
    * no dv marks). The dv head is therefore part of the fast-forward
    * base. */
  private[ice] val DvBaseKey = "_branch_base_dv"

  /** Max `_dv` log filename ts, 0 when the dv table has no commits. */
  private def dvHead(main: IceTable): Long =
    main.logio.currentLogFiles(s"${main.root}/_dv").iterator
      .map(p => IceLogIO.logFileInfo(p)._1).maxOption.getOrElse(0L)

  private val SafeBranch = "[A-Za-z0-9_-]{1,64}".r.anchored
  private def requireSafe(name: String): Unit =
    require(SafeBranch.matches(name), s"unsafe branch name: '$name'")
  private def requireMain(t: IceTable): Unit =
    require(t.logRel == "_log",
      "branch operations take the MAIN table handle (branches do not nest)")

  private def branchLogRel(name: String) = s"_branch/$name/_log"

  /** Validated log-directory path for branch `name` — the
    * `format("ice")` surface's `option("branch", ...)` hook. */
  private[graft] def logRelFor(name: String): String = {
    requireSafe(name); branchLogRel(name)
  }

  /** Fork `name` from main's CURRENT snapshot: one metadata-only merged
    * commit in the branch log re-listing the alive markers (stats and
    * create times carried), plus the base head ts for the fast-forward
    * check. Returns the branch handle. */
  def create(main: IceTable, name: String): IceTable = {
    requireMain(main); requireSafe(name)
    IceTable.withTableLock(main.root, main.hadoopConf) {
      val b = open(main, name)
      if (b.trySnapshot(Long.MaxValue).isDefined)
        throw new IllegalStateException(s"branch '$name' already exists")
      val snap = main.trySnapshot(Long.MaxValue).getOrElse(
        throw new IllegalStateException("cannot branch a table with no commits"))
      val baseTs = snap.logFiles.iterator
        .map(p => IceLogIO.logFileInfo(p)._1).max
      b.logio.append(b.root, 1, snap.schema,
        snap.aliveFiles.map(_.copy(virSourceLogFile = None)),
        merged = true,
        streamCommits = LogMetadata.mergeCommits(
          snap.streamCommits,
          Map(BaseKey -> baseTs, DvBaseKey -> dvHead(main))),
        tableCfg = snap.tableConfig)
      b
    }
  }

  /** A handle onto branch `name`: same root, the branch's log directory,
    * config restored from the branch log when it has one. */
  def open(main: IceTable, name: String): IceTable =
    openExisting(main, name).getOrElse {
      new IceTable(main.spark, main.root, main.cfg,
        logRel = branchLogRel(name))
    }

  /** [[open]] that also answers EXISTENCE with the same single log fold
    * (None = the branch has no commits, i.e. was never created). */
  def openExisting(main: IceTable, name: String): Option[IceTable] =
    openExistingWithSnapshot(main, name).map(_._1)

  /** [[openExisting]] that also RETURNS the fold it paid — the SQL
    * resolver threads it through as the relation's snapshot so each
    * branch reference costs ONE fold, exactly like the main-table arm
    * (the snapshot is log-content-derived, so it is valid for the
    * config-restored handle too). */
  private[graft] def openExistingWithSnapshot(
      main: IceTable, name: String): Option[(IceTable, IceSnapshot)] = {
    requireMain(main); requireSafe(name)
    val rel = branchLogRel(name)
    val probe = new IceTable(main.spark, main.root, main.cfg, logRel = rel)
    probe.trySnapshot(Long.MaxValue).map { snap =>
      (snap.tableConfig.map(c => new IceTable(main.spark, main.root,
        IceTable.configFromPersisted(c), logRel = rel)).getOrElse(probe), snap)
    }
  }

  /** Live branch names (directory listing of `{root}/_branch/`). */
  def list(main: IceTable): Seq[String] = {
    val dir = new Path(main.root, "_branch")
    val fs = main.logio.fs(main.root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(SafeBranch.matches).sorted
  }

  /** FAST-FORWARD publish: if main's head is still the branch's base,
    * append ONE merged commit to main carrying the branch-vs-base diff —
    * new files in, base files the branch dropped tombstoned. The branch's
    * exactly-once stream-commit records carry over (max-folded), so a
    * WAP ingestion pipeline keeps its replay guarantee across the
    * publish. Returns (files added, files tombstoned); throws
    * [[CommitConflictException]] if main moved. The branch itself is
    * left intact — [[drop]] it when done. */
  def publish(main: IceTable, name: String): (Int, Int) = {
    requireMain(main)
    IceTable.withTableLock(main.root, main.hadoopConf) {
      val b = open(main, name)
      val bSnap = b.trySnapshot(Long.MaxValue).getOrElse(
        throw new IllegalStateException(s"branch '$name' does not exist"))
      val baseTs = bSnap.streamCommits.getOrElse(BaseKey,
        throw new IllegalStateException(
          s"branch '$name' carries no base record — not created by Branch.create?"))
      // plain inserts do not take the commit lock: one may have FIXED a
      // ts but not yet be visible to the fold below. Any in-flight main
      // commit conflicts (retry when it lands — the head check then sees
      // it); a commit starting after this check gets a later ts and
      // serializes AFTER the publish
      if (IceLogIO.hasInFlight(main.root))
        throw new CommitConflictException(
          s"publish of branch '$name': a main-table commit is in flight; " +
            "retry once it lands")
      // same guard for the `_dv` log: today DeleteVectors.deleteWhere
      // commits inside commitLock(main.root) so it cannot race us, but
      // that invariant lives in another file — a future dv write path
      // committing outside the lock would fix a ts invisible to the
      // dvNow head check below and be silently undone by this publish
      if (IceLogIO.hasInFlight(s"${main.root}/_dv"))
        throw new CommitConflictException(
          s"publish of branch '$name': a _dv commit is in flight; " +
            "retry once it lands")
      val mSnap = main.snapshot(Long.MaxValue)
      val mainHead = mSnap.logFiles.iterator
        .map(p => IceLogIO.logFileInfo(p)._1).max
      if (mainHead != baseTs) throw new CommitConflictException(
        s"branch '$name' forked at main head $baseTs but main is now at " +
          s"$mainHead: fast-forward publish only — re-create the branch " +
          "from the current head and replay its writes")
      // dv commits live in their own log: a post-fork merge-on-read
      // delete would be silently UNDONE by publishing a branch rewrite
      // of the file it marks (the rewrite carries no dv positions) —
      // same fast-forward rule, separate head
      val dvBase = bSnap.streamCommits.getOrElse(DvBaseKey, 0L)
      val dvNow = dvHead(main)
      if (dvNow != dvBase) throw new CommitConflictException(
        s"branch '$name' forked at dv head $dvBase but the _dv log is now " +
          s"at $dvNow: merge-on-read deletes landed on main after the " +
          "fork — re-create the branch from the current head and replay")
      // registered in flight for the whole diff window (IceLogIO registry):
      // the publish EMITS change events replicas must not lose
      val pubTs = IceLogIO.registerCommitFloor(main.root,
        math.max(System.currentTimeMillis(), mainHead + 1))
      try {
        val baseAlive = mSnap.aliveFiles.map(_.path).toSet
        val brAlive = bSnap.aliveFiles.map(_.path).toSet
        val added = bSnap.aliveFiles.filterNot(m => baseAlive(m.path))
          .map(_.copy(virSourceLogFile = None))
        val removed = mSnap.aliveFiles.filterNot(m => brAlive(m.path))
          .map(_.copy(tombstone = Some(pubTs), virSourceLogFile = None))
        if (added.isEmpty && removed.isEmpty) return (0, 0)
        main.logio.append(main.root, 1, bSnap.schema, added ++ removed,
          merged = true, timestamp = Some(pubTs),
          streamCommits = bSnap.streamCommits - BaseKey - DvBaseKey,
          tableCfg = bSnap.tableConfig.orElse(mSnap.tableConfig))
        (added.length, removed.length)
      } finally IceLogIO.endCommit(main.root, pubTs)
    }
  }

  /** Delete branch `name` (its log directory). Branch-only data files
    * become orphans and are reclaimed by the next
    * [[IceTable.vacuumOrphans]] past its age grace. */
  def drop(main: IceTable, name: String): Boolean = {
    requireMain(main); requireSafe(name)
    val dir = new Path(main.root, s"_branch/$name")
    main.logio.fs(main.root).delete(dir, true)
  }
}
