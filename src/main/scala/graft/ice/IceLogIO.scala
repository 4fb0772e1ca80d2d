package graft.ice

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Append-only JSONL transaction log over the Hadoop FileSystem API
  * (local fs in tests, s3a in production — a single-object PUT is the
  * atomicity unit, matching the reference's S3 PUT commit,
  * icedb/log.py:330-358).
  *
  * Layout under a table root URI:
  *   {root}/_log/{unix_ms}[_m]_{hostname}.jsonl
  *   {root}/_data/{partition}/{uuid}.parquet
  *
  * Marker paths stored in the log are *root-relative* (start with
  * `_data/`); the bucket+prefix of the reference collapses into the root
  * URI.
  */
final class IceLogIO(pathSafeHostname: String, private[ice] val conf: Configuration,
    logRel: String = "_log") {
  // `logRel` relocates the whole log (commits + checkpoints) under an
  // alternate directory of the SAME root — the branch mechanism
  // ([[Branch]]): data files stay root-relative `_data/...` and shared,
  // only the fold's source of truth moves.

  def fs(root: String): FileSystem = new Path(root).getFileSystem(conf)

  def logDir(root: String): Path = new Path(root, logRel)

  /** Concurrent GET of log files → raw lines, keyed by root-relative path.
    *
    * LEAF-ONLY concurrency contract: the futures submitted to the shared
    * bounded [[IceLogIO.ioPool]] do nothing but read bytes — they never call
    * back into any method that itself blocks on the pool. Round 2 nested
    * `readLogForward` (which Awaits on the pool) inside pool futures from
    * `tombstoneCleanup`; with more outer tasks than threads, every thread sat
    * in an outer `Await` waiting for inner work that could never be
    * scheduled. All callers now fan out through this method only.
    */
  def fetchLogLines(root: String, logPaths: Seq[String]): Map[String, Array[String]] = {
    val filesystem = fs(root)
    implicit val ec: ExecutionContext = IceLogIO.ioPool
    Await.result(
      Future.traverse(logPaths.distinct) { logFile =>
        Future(logFile -> readLines(filesystem, new Path(root, logFile)))
      }, Duration.Inf).toMap
  }

  /** Parse one fetched log file (pure, in-memory): line 1 metadata, schema
    * line, optional tombstone lines, file-marker lines
    * (reference: icedb/log.py:232-279 per-file body). */
  def parseLog(logFile: String, lines: Array[String])
      : (Schema, Seq[FileMarker], Seq[LogTombstone]) = {
    val meta = LogMetadata.fromJson(lines(0))
    val schema = Schema.fromJson(lines(meta.schemaLineIndex))
    val tombstones = meta.tombstoneLineIndex.toSeq.flatMap { tmbIdx =>
      (tmbIdx until meta.fileLineIndex).map(i => LogTombstone.fromJson(lines(i)))
    }
    val markers = (meta.fileLineIndex until lines.length).map { i =>
      FileMarker.fromJson(lines(i)).copy(virSourceLogFile = Some(logFile))
    }
    (schema, markers, tombstones)
  }

  /** Fold a set of log files into (schema, markers, tombstones):
    * lexicographic (=timestamp) order, schema union, last-writer-wins per
    * marker path, tombstone collect (reference: icedb/log.py:232-279).
    *
    * GETs run concurrently via [[fetchLogLines]] (the reference reads
    * sequentially and its merge latency was log-read-bound at thousands of
    * S3 objects — perf_tests/chicago_taxis/README.md:381-387); the fold
    * itself stays sequential in lexicographic order so semantics are
    * unchanged.
    */
  def readLogForward(root: String, logPaths: Seq[String])
      : (Schema, Seq[FileMarker], Seq[LogTombstone]) =
    readLogForwardWithCommits(root, logPaths)._1

  /** [[readLogForward]] plus the max-folded per-query stream-commit map
    * from the logs' metadata lines (exactly-once sink bookkeeping). */
  def readLogForwardWithCommits(root: String, logPaths: Seq[String])
      : ((Schema, Seq[FileMarker], Seq[LogTombstone]), Map[String, Long]) =
    readLogForwardFull(root, logPaths) match {
      case (state, commits, _) => (state, commits)
    }

  /** [[readLogForwardWithCommits]] plus the last-writer-wins persisted
    * table config from the logs' metadata lines. */
  def readLogForwardFull(root: String, logPaths: Seq[String])
      : ((Schema, Seq[FileMarker], Seq[LogTombstone]), Map[String, Long],
        Option[Map[String, Any]]) = {
    val totalSchema = new Schema
    val markers = mutable.LinkedHashMap.empty[String, FileMarker]
    val tombstones = mutable.LinkedHashMap.empty[String, LogTombstone]
    var commits = Map.empty[String, Long]
    var tableCfg: Option[Map[String, Any]] = None
    val sorted = logPaths.sorted

    if (sorted.isEmpty) throw new NoLogFilesException

    val fetched = fetchLogLines(root, sorted)

    sorted.foreach { logFile =>
      val lines = fetched(logFile)
      val (schema, fileMs, tmbs) = parseLog(logFile, lines)
      val meta = LogMetadata.fromJson(lines(0))
      commits = LogMetadata.mergeCommits(commits, meta.streamCommits)
      meta.tableCfg.foreach(c => tableCfg = Some(c))
      totalSchema.accumulate(schema.columns, schema.types)
      tmbs.foreach(t => tombstones(t.path) = t)
      fileMs.foreach(fm => markers(fm.path) = fm)
    }
    ((totalSchema, markers.values.toSeq, tombstones.values.toSeq), commits, tableCfg)
  }

  /** List current log files (root-relative paths), lexicographically
    * sorted (reference: icedb/log.py:281-309).
    *
    * Local-FS fast path: Hadoop's RawLocalFileSystem materializes a full
    * FileStatus per entry (~35 µs each — 0.7 s on a 20k-log directory,
    * measured), but the fold needs only NAMES; a java.nio directory
    * stream lists the same entries in ~20 ms. Object-store schemes keep
    * the normal paged LIST (one request per 1000 keys — already
    * names-only there). The LIST is the one linear-in-log-count cost a
    * checkpoint cannot remove; tombstone cleanup's log consolidation is
    * what bounds it in production. */
  def currentLogFiles(root: String): Seq[String] = {
    val dir = logDir(root)
    val filesystem = fs(root)
    // a `_x<txnId>`-tagged commit belongs to a multi-table transaction
    // (IceTransaction): it exists in `_log/` from stage time but joins
    // EVERY listing-derived view (snapshots, checkpoints, feeds, streams,
    // maintenance) only once its transaction's single commit marker
    // lands — the one listing-level gate that makes the cross-table
    // commit atomic for all readers
    def visible(n: String): Boolean = IceLogIO.txnIdOf(n) match {
      case None => true
      case Some(id) => IceLogIO.txnConfirmed(this, root, id)
    }
    if ("file".equalsIgnoreCase(filesystem.getUri.getScheme)) {
      val p = java.nio.file.Paths.get(dir.toUri.getPath)
      if (!java.nio.file.Files.isDirectory(p)) return Seq.empty
      val out = Seq.newBuilder[String]
      val ds = java.nio.file.Files.newDirectoryStream(p)
      try ds.forEach { e =>
        val n = e.getFileName.toString
        if (!n.startsWith(".") && !n.startsWith("_") &&
            java.nio.file.Files.isRegularFile(e) && visible(n))
          out += s"$logRel/$n"
      } finally ds.close()
      return IceLogIO.observeListing(root, logRel, out.result().sorted)
    }
    if (!filesystem.exists(dir)) return Seq.empty
    IceLogIO.observeListing(root, logRel, filesystem.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_") && visible(st.getPath.getName))
      .map(st => s"$logRel/${st.getPath.getName}")
      .sorted)
  }

  /** Root-relative paths of STAGED (txn-tagged, still-unconfirmed) log
    * files — the vacuum sweep's input: their referenced data files are
    * protected while the transaction is young, reclaimed with the staged
    * log once it expires unconfirmed. */
  private[ice] def stagedLogFiles(root: String): Seq[(String, String)] =
    taggedLogFiles(root).filterNot { case (_, id) =>
      IceLogIO.txnConfirmed(this, root, id) }

  /** ALL txn-tagged log files, confirmed or not — the vacuum's
    * protection-set input. A tagged log's data files must survive the
    * generic orphan sweep regardless of confirmation state: a marker
    * that lands between the sweep's snapshot read and this listing
    * makes the transaction COMMITTED while the snapshot's `known` set
    * still misses its files. */
  private[ice] def taggedLogFiles(root: String): Seq[(String, String)] = {
    val dir = logDir(root)
    val filesystem = fs(root)
    if (!filesystem.exists(dir)) return Seq.empty
    filesystem.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .flatMap { st =>
        val n = st.getPath.getName
        IceLogIO.txnIdOf(n).map(id => (s"$logRel/$n", id))
      }
  }

  /** Snapshot at max time: strict `<` filename-timestamp filter
    * (reference: icedb/log.py:311-328). When a checkpoint whose covered
    * logs all pass the filter exists (and `useCheckpoints`), the fold is
    * seeded from it and only the uncovered TAIL logs are fetched — the
    * snapshot cost drops from O(all commits ever) to O(commits since last
    * checkpoint), which is what keeps cold reads affordable on a table
    * with 10⁵-10⁶ lifetime commits. Semantics are unchanged: the fold is
    * associative (schema union, last-writer-wins markers, tombstone
    * collect), so fold(ckptState, tail) == fold(all logs) as long as log
    * timestamps are monotone per the commit protocol (append() bumps on
    * collision; maintenance stamps with the current clock).
    */
  def readAtMaxTime(
      root: String,
      timestamp: Long,
      useCheckpoints: Boolean = true): IceSnapshot = {
    val logs = currentLogFiles(root)
      .filter(p => IceLogIO.logFileInfo(p)._1 < timestamp)
    if (logs.isEmpty) throw new NoLogFilesException
    val ckpt =
      if (useCheckpoints) latestCheckpointBefore(root, timestamp) else None
    ckpt match {
      case Some(c) if logs.filterNot(c.coveredLogs.toSet)
          .exists(p => IceLogIO.logFileInfo(p)._1 <= c.ckptTs) =>
        // an uncovered log whose filename ts is <= the checkpoint's
        // covered-max would fold AFTER the checkpoint state here but
        // BEFORE some covered logs in the raw lexicographic fold (clock
        // skew across writers); last-writer-wins could then diverge —
        // fall back to the canonical raw fold, which is always correct
        val ((schema, markers, tombstones), commits, cfg) =
          readLogForwardFull(root, logs)
        IceSnapshot(schema, markers, tombstones, logs, timestamp, commits, cfg)
      case Some(c) =>
        val covered = c.coveredLogs.toSet
        val tail = logs.filterNot(covered)
        val totalSchema = new Schema
        totalSchema.accumulate(c.schema.columns, c.schema.types)
        val markers = mutable.LinkedHashMap.empty[String, FileMarker]
        c.markers.foreach(m => markers(m.path) = m)
        val tombstones = mutable.LinkedHashMap.empty[String, LogTombstone]
        c.tombstones.foreach(t => tombstones(t.path) = t)
        var commits = c.streamCommits
        var tableCfg = c.tableCfg
        if (tail.nonEmpty) {
          val fetched = fetchLogLines(root, tail.sorted)
          tail.sorted.foreach { logFile =>
            val lines = fetched(logFile)
            val (schema, fileMs, tmbs) = parseLog(logFile, lines)
            val meta = LogMetadata.fromJson(lines(0))
            commits = LogMetadata.mergeCommits(commits, meta.streamCommits)
            meta.tableCfg.foreach(cfg => tableCfg = Some(cfg))
            totalSchema.accumulate(schema.columns, schema.types)
            tmbs.foreach(t => tombstones(t.path) = t)
            fileMs.foreach(fm => markers(fm.path) = fm)
          }
        }
        IceSnapshot(totalSchema, markers.values.toSeq,
          tombstones.values.toSeq, logs, timestamp, commits, tableCfg)
      case None =>
        val ((schema, markers, tombstones), commits, cfg) =
          readLogForwardFull(root, logs)
        IceSnapshot(schema, markers, tombstones, logs, timestamp, commits, cfg)
    }
  }

  // ------------------------------------------------------------ checkpoints

  def chkDir(root: String): Path = new Path(root, s"$logRel/_chk")

  /** Persist a folded snapshot as a checkpoint under `_log/_chk/` (a
    * beyond-reference extension; normal log listing skips the subdirectory
    * so non-checkpoint-aware readers are unaffected). File shape mirrors a
    * log file with one extra line: metadata, covered-log array, schema,
    * tombstones?, markers (markers keep `vsl` so merge's source-log
    * rewrite works from a checkpoint-seeded snapshot). The checkpoint
    * timestamp is the max covered log timestamp; writes are atomic and
    * exclusive (an identical concurrent checkpoint simply loses the
    * rename and is discarded). Returns the root-relative path, or None if
    * a checkpoint for this exact ts+host already exists. */
  def writeCheckpoint(root: String, snap: IceSnapshot): Option[String] = {
    val covered = snap.logFiles.sorted
    if (covered.isEmpty) return None
    val ckptTs = covered.map(f => IceLogIO.logFileInfo(f)._1).max
    val rel = s"$logRel/_chk/${ckptTs}_$pathSafeHostname.ckpt.jsonl"
    val filesystem = fs(root)
    val dest = new Path(root, rel)
    if (filesystem.exists(dest)) return None
    val tombstones = snap.tombstones
    val meta = LogMetadata(
      version = 1,
      schemaLineIndex = 2,
      fileLineIndex = if (tombstones.isEmpty) 3 else 3 + tombstones.length,
      tombstoneLineIndex = if (tombstones.isEmpty) None else Some(3),
      timestamp = ckptTs,
      streamCommits = snap.streamCommits,
      tableCfg = snap.tableConfig)
    val lines = Seq(
      meta.json,
      Json.obj("logs" -> (covered: Any)),
      snap.schema.toJson) ++
      tombstones.map(_.json) ++ snap.files.map(_.json)
    writeAtomic(filesystem, dest, lines.mkString("\n"))
    Some(rel)
  }

  /** Root-relative checkpoint paths, sorted ascending by timestamp. */
  def listCheckpoints(root: String): Seq[String] = {
    val dir = chkDir(root)
    val filesystem = fs(root)
    if (!filesystem.exists(dir)) return Seq.empty
    filesystem.listStatus(dir).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .map(st => s"$logRel/_chk/${st.getPath.getName}")
      .sorted
  }

  def readCheckpoint(root: String, rel: String): IceCheckpoint = {
    val lines = readLines(fs(root), new Path(root, rel))
    val meta = LogMetadata.fromJson(lines(0))
    val covered = Json.parseObject(lines(1))("logs") match {
      case s: scala.collection.Seq[_] => s.map(_.toString).toSeq
      case other => throw new java.io.IOException(
        s"malformed checkpoint covered-log line: $other")
    }
    val schema = Schema.fromJson(lines(meta.schemaLineIndex))
    val tombstones = meta.tombstoneLineIndex.toSeq.flatMap { tmbIdx =>
      (tmbIdx until meta.fileLineIndex).map(i => LogTombstone.fromJson(lines(i)))
    }
    // markers restore their own `vsl` — NOT overridden with the checkpoint
    // path (unlike parseLog): the marker's source is its original log.
    // Large checkpoints parse their marker lines in parallel chunks on
    // the log-IO pool: the checkpoint is ONE file, so unlike the raw fold
    // (whose parallelism is per-log-file) a sequential parse here was the
    // whole snapshot latency of a big table — ~19 µs/marker means a 10⁶-
    // marker table pays ~19 s single-threaded vs ~2 s chunked. Callers
    // are always driver-side (never inside a pool task), so chunk futures
    // cannot deadlock the bounded pool.
    val markerIdx = meta.fileLineIndex until lines.length
    val markers: IndexedSeq[FileMarker] =
      if (markerIdx.length < 8192)
        markerIdx.map(i => FileMarker.fromJson(lines(i)))
      else {
        implicit val ec: ExecutionContext = IceLogIO.ioPool
        Await.result(
          Future.traverse(markerIdx.grouped(8192).toIndexedSeq)(chunk =>
            Future(chunk.map(i => FileMarker.fromJson(lines(i))))),
          scala.concurrent.duration.Duration.Inf).flatten
      }
    IceCheckpoint(meta.timestamp, covered, schema, markers, tombstones,
      meta.streamCommits, meta.tableCfg)
  }

  /** Newest checkpoint whose covered logs ALL satisfy the strict `<`
    * snapshot filter (covered-max ts < requested ts); unreadable or
    * ineligible checkpoints are skipped, never fatal — a checkpoint is a
    * cache, the raw fold is always the fallback. */
  def latestCheckpointBefore(root: String, timestamp: Long): Option[IceCheckpoint] = {
    val eligible = listCheckpoints(root)
      .filter(p => IceLogIO.logFileInfo(p.stripSuffix(".ckpt.jsonl"))._1 < timestamp)
    eligible.reverseIterator
      .map(p => try Some(readCheckpoint(root, p)) catch { case _: Exception => None })
      .collectFirst { case Some(c) => c }
  }

  /** Delete all but the newest `keep` checkpoints. */
  def pruneCheckpoints(root: String, keep: Int): Seq[String] = {
    val all = listCheckpoints(root)
    val drop = all.dropRight(keep)
    drop.foreach(p => delete(root, p))
    drop
  }

  /** Append one log file: line order version-metadata, schema,
    * tombstones?, files (reference: icedb/log.py:330-358). Returns
    * (root-relative log path, metadata). */
  def append(
      root: String,
      version: Int,
      schema: Schema,
      files: Seq[FileMarker],
      tombstones: Seq[LogTombstone] = Seq.empty,
      merged: Boolean = false,
      timestamp: Option[Long] = None,
      streamCommits: Map[String, Long] = Map.empty,
      tableCfg: Option[Map[String, Any]] = None,
      cleanedHorizon: Option[Long] = None,
      txnTag: Option[String] = None,
      stampCreatedTs: Boolean = false): (String, LogMetadata) = {
    // The filename IS the commit identity: two commits in the same
    // millisecond from one writer would collide on `{ts}_{host}.jsonl`
    // (rename then fails — or silently replaces, store-dependent).
    // Concurrent inserts are a normal pattern (HTTP batcher, streaming
    // double-writes), so on collision bump the millisecond and retry;
    // cross-host uniqueness comes from the hostname suffix as in the
    // reference. A same-JVM reservation set closes the local check-then-
    // write race; cross-process races on the same host are left to the
    // store's rename atomicity, as in the reference.
    val filesystem = fs(root)
    val entryNow = System.currentTimeMillis()
    // in-flight floor: callers that pre-registered via registerCommitFloor
    // (validated rewrites, restore) hold their own entry too — a second
    // one here is harmless and keeps the no-caller-registration paths
    // covered from the moment the ts is fixed until the file is visible
    val regTs = IceLogIO.registerCommitFloor(
      root, math.min(timestamp.getOrElse(entryNow), entryNow), logRel)
    try {
      // cross-process fencing (TableLock): when this process holds the
      // table lease, verify it was not stolen after a TTL expiry (throws
      // CommitConflictException before anything becomes visible) and
      // stamp the lease's fencing token into the commit metadata; the
      // lock-free insert path costs one map probe and stamps nothing
      val fenceTok = TableLock.checkAndFence(root)
      // Observed-log floor: commit STRICTLY ABOVE every log filename ts
      // this JVM has listed (or itself appended) for this (root, logRel).
      // Listing is observation — a writer that folded the log is causally
      // later than every commit it saw, so ordering by ts here is real
      // order, not clock trust. This is what lets derived-state proofs
      // (MvSync's flat mark) compare createdMs against a mark written by
      // another host without assuming synchronized clocks: every insert
      // path folds the log at least once (preflight / mark reads) before
      // writing, so its commit lands above the mark's carrying log even
      // when its wall clock lags. Validated rewrites already floor at
      // maxLogTs+1 under the table lock; this extends the same guarantee
      // to the lock-free insert path at zero extra I/O.
      var ts = math.max(timestamp.getOrElse(entryNow),
        IceLogIO.observedFloor(root, logRel) + 1L)
      var attempts = 0
      while (attempts < 1000) {
        // the txn tag suffixes the name: STAGED commits are listed by
        // currentLogFiles only once their transaction's commit marker
        // exists (IceLogIO.txnConfirmed) — the multi-table atomicity hook
        val fileId = s"$ts${if (merged) "_m" else ""}_$pathSafeHostname" +
          txnTag.fold("")(t => s"_x$t")
        val rel = s"$logRel/$fileId.jsonl"
        val dest = new Path(root, rel)
        val reserved = IceLogIO.reserve(root, fileId)
        if (reserved) {
          // the reservation only needs to cover the check-then-write window:
          // once the file is durably on disk the exists() check takes over,
          // and on any other outcome the id must be freed — a held entry per
          // commit for the JVM's lifetime is a memory leak in a long-running
          // ingest service
          try {
            if (!filesystem.exists(dest)) {
              val meta = LogMetadata(
                version,
                schemaLineIndex = 1,
                fileLineIndex = if (tombstones.isEmpty) 2 else 2 + tombstones.length,
                tombstoneLineIndex = if (tombstones.isEmpty) None else Some(2),
                timestamp = ts,
                streamCommits = streamCommits,
                tableCfg = tableCfg,
                cleanedHorizon = cleanedHorizon,
                fence = fenceTok)
              // stampCreatedTs: new-file markers inherit the FINAL (bumped,
              // floored) commit ts as createdMs, so marker time equals
              // commit time — rebuilt each attempt because ts can move
              val stamped =
                if (stampCreatedTs) files.map(_.copy(createdMs = ts)) else files
              val lines = Seq(meta.json, schema.toJson) ++
                tombstones.map(_.json) ++ stamped.map(_.json)
              writeAtomic(filesystem, dest, lines.mkString("\n"))
              IceLogIO.observe(root, logRel, ts)
              return (rel, meta)
            }
          } finally IceLogIO.unreserve(root, fileId)
        }
        ts += 1
        attempts += 1
      }
      throw new java.io.IOException(
        s"could not find a free log timestamp after $attempts attempts")
    } finally IceLogIO.endCommit(root, regTs, logRel)
  }

  def delete(root: String, relPath: String): Boolean =
    fs(root).delete(new Path(root, relPath), false)

  private def readLines(filesystem: FileSystem, p: Path): Array[String] = {
    // Local-FS fast path (same rationale as currentLogFiles' nio listing):
    // Hadoop's LocalFileSystem is a ChecksumFileSystem, so open() pays a
    // stat plus a .crc-sidecar probe per file (~0.5 ms CPU each) before a
    // byte is read. A snapshot fold reads tens of thousands of KB-scale
    // log files — measured 6-12 CPU-s of pure open() overhead on a
    // 20k-log fold — while one java.nio read of the same file costs ~20 µs.
    // Object-store schemes keep the streaming read below. NoSuchFile is
    // translated to Hadoop's FileNotFoundException so callers see the
    // exact exception the slow path throws.
    val u = p.toUri
    if ((u.getScheme == null || u.getScheme == "file") && u.getAuthority == null) {
      val bytes =
        try java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(u.getPath))
        catch { case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile) }
      return new String(bytes, StandardCharsets.UTF_8).split("\n")
    }
    val in = filesystem.open(p)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      new String(bytes, StandardCharsets.UTF_8).split("\n")
    } finally in.close()
  }

  /** Atomic single-object commit. On an object store (s3a) the PUT happens
    * at close, which is the reference's atomicity unit (icedb/log.py:330-358).
    * On rename-capable filesystems (local/HDFS) a direct create would expose
    * partially-written log files to concurrent readers, so we stage under a
    * dot-prefixed temp name (hidden from [[currentLogFiles]]) and rename into
    * place — rename is atomic there.
    */
  private def writeAtomic(filesystem: FileSystem, p: Path, body: String): Unit = {
    // Local-FS fast path, mirror of readLines': ChecksumFileSystem.create
    // writes a .crc sidecar and stats the parent per call (~ms each);
    // java.nio write + ATOMIC_MOVE is the same stage-then-rename protocol
    // through one syscall pair. Same-directory rename is atomic on POSIX,
    // identical to what RawLocalFileSystem.rename does underneath.
    val u = p.toUri
    if ((u.getScheme == null || u.getScheme == "file") && u.getAuthority == null) {
      val dst = java.nio.file.Paths.get(u.getPath)
      // Hadoop's create() makes parent dirs implicitly; match that
      Option(dst.getParent).foreach(java.nio.file.Files.createDirectories(_))
      val tmp = dst.resolveSibling(
        s".tmp.${java.util.UUID.randomUUID()}.${dst.getFileName}")
      java.nio.file.Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try {
        java.nio.file.Files.move(tmp, dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        return
      } catch { case e: java.io.IOException =>
        try java.nio.file.Files.deleteIfExists(tmp)
        catch { case _: Exception => () }
        throw new java.io.IOException(s"failed to commit log file $p", e)
      }
    }
    val tmp = new Path(p.getParent, s".tmp.${java.util.UUID.randomUUID()}.${p.getName}")
    val out = filesystem.create(tmp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!filesystem.rename(tmp, p)) {
      filesystem.delete(tmp, false)
      throw new java.io.IOException(s"failed to commit log file $p")
    }
  }
}

object IceLogIO {
  private val reservedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Same-JVM reservation of a (root, log file id): closes the local
    * check-then-write race between concurrent appenders (see append). */
  private def reserve(root: String, fileId: String): Boolean =
    reservedIds.add(s"$root#$fileId")

  private def unreserve(root: String, fileId: String): Unit =
    reservedIds.remove(s"$root#$fileId")

  // ---------------- same-JVM in-flight commit registry -------------------
  //
  // A commit's timestamp is FIXED some time before its log file becomes
  // VISIBLE (the rewrite fold, marker stamping, and the atomic write all
  // happen in between). A settled-bound consumer (change feed, streaming
  // source) computing `now-1` inside that window would consume PAST the
  // chosen ts and then exclude the commit from every later window — a
  // silently lost change (caught by CdcApplySpec's concurrent
  // writer+poller). Writers therefore register a LOWER BOUND of their
  // eventual filename ts before any of that work, and settled bounds cap
  // below the oldest in-flight registration. Same-JVM only, matching the
  // engine's concurrency contract everywhere (same-process linearizable;
  // cross-process writers need the external lock, as in the reference).
  private val inFlightLock = new Object
  // per (root, logRel): filename-ts floor -> multiset of holder DEADLINES
  // (Long.MaxValue for ordinary commits, which always endCommit in a
  // finally; a finite deadline marks an IceTransaction's stage pin, which
  // auto-expires if the transaction is abandoned — commit() refuses past
  // the same TTL, so an expired pin can never hide a commit that still
  // lands)
  private val inFlightTs =
    new java.util.HashMap[String, java.util.TreeMap[java.lang.Long, java.util.ArrayList[java.lang.Long]]]()
  private var settledClock = 0L

  /** Registrations are keyed by (root, log directory): a branch handle's
    * in-flight rewrite must not pin the MAIN feed's settled bound (its
    * commit lands in `_branch/<name>/_log`, invisible to main windows). */
  private def inFlightKey(root: String, logRel: String) = s"$root#$logRel"

  // Max log filename ts this JVM has LISTED or APPENDED per (root, logRel):
  // the causal floor [[append]] commits strictly above. Same-JVM precise;
  // cross-JVM writers inherit it the moment they fold the log (every
  // insert path does at least once). Monotone max-merge, never trimmed —
  // one Long per table handle root ever touched by this JVM.
  private val observedTsMax =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[ice] def observe(root: String, logRel: String, ts: Long): Unit = {
    observedTsMax.merge(inFlightKey(root, logRel), java.lang.Long.valueOf(ts),
      (a, b) => if (a >= b) a else b)
    ()
  }

  /** Record the newest filename ts of a listing (no-op for empty). */
  private[ice] def observeListing(
      root: String, logRel: String, listing: Seq[String]): Seq[String] = {
    var mx = Long.MinValue
    listing.foreach { p =>
      try { val t = logFileInfo(p)._1; if (t > mx) mx = t }
      catch { case _: Exception => } // foreign name: not a commit, skip
    }
    if (mx != Long.MinValue) observe(root, logRel, mx)
    listing
  }

  private[ice] def observedFloor(root: String, logRel: String): Long = {
    val v = observedTsMax.get(inFlightKey(root, logRel))
    if (v == null) 0L else v.longValue()
  }

  /** Register `ts` as a lower bound of a commit that is about to be
    * written to `root`'s `logRel` directory (append only ever bumps
    * timestamps UP). MUST be paired with [[endCommit]] after the log
    * file is visible (or the attempt failed). A finite `deadline` makes
    * the registration SELF-EXPIRING: past it the floor no longer pins
    * settled bounds even if the holder never calls endCommit (the
    * abandoned-transaction shape). */
  private[graft] def registerCommitFloor(
      root: String, ts: Long, logRel: String = "_log",
      deadline: Long = Long.MaxValue): Long = {
    inFlightLock.synchronized {
      val m = inFlightTs.computeIfAbsent(inFlightKey(root, logRel),
        (_: String) => new java.util.TreeMap[java.lang.Long, java.util.ArrayList[java.lang.Long]])
      m.computeIfAbsent(ts, (_: java.lang.Long) => new java.util.ArrayList[java.lang.Long])
        .add(java.lang.Long.valueOf(deadline))
    }
    ts
  }

  private[graft] def endCommit(
      root: String, ts: Long, logRel: String = "_log",
      deadline: Long = Long.MaxValue): Unit =
    inFlightLock.synchronized {
      val key = inFlightKey(root, logRel)
      val m = inFlightTs.get(key)
      if (m != null) {
        val ds = m.get(ts)
        if (ds != null) {
          // remove THIS holder's deadline. For a NON-expiring holder a
          // missing entry means a mismatched pairing — fall back to any
          // entry so the multiset still decrements. For an EXPIRING
          // holder (finite deadline) a missing entry means purgeExpired
          // already released it: falling back would steal a DIFFERENT
          // holder's registration at the same ts and let a feed window
          // close past a commit whose file is not yet visible.
          if (!ds.remove(java.lang.Long.valueOf(deadline)) &&
              deadline == Long.MaxValue && !ds.isEmpty)
            ds.remove(ds.size() - 1)
          if (ds.isEmpty) m.remove(ts)
        }
        if (m.isEmpty) inFlightTs.remove(key)
      }
    }

  /** Drop registrations whose deadline has lapsed (callers hold
    * inFlightLock). An abandoned IceTransaction's pins release here the
    * first time any settled bound is computed past its TTL. */
  private def purgeExpired(
      m: java.util.TreeMap[java.lang.Long, java.util.ArrayList[java.lang.Long]],
      now: Long): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getValue.removeIf((d: java.lang.Long) => d.longValue <= now)
      if (e.getValue.isEmpty) it.remove()
    }
  }

  /** Whether any same-process commit to `root`'s `logRel` log is
    * currently in flight (registered, file not yet visible) — the
    * fast-forward publish pre-check. */
  private[graft] def hasInFlight(root: String, logRel: String = "_log"): Boolean =
    inFlightLock.synchronized {
      val m = inFlightTs.get(inFlightKey(root, logRel))
      if (m != null) purgeExpired(m, System.currentTimeMillis())
      m != null && !m.isEmpty
    }

  /** The settled timestamp across `roots`' MAIN (`_log`) directories:
    * every commit from THIS process with filename ts at or below the
    * returned value is already VISIBLE (its append returned), and no new
    * same-process commit can land at or below it — safe as an inclusive
    * feed/offset bound. The clock is monotone-guarded so one backwards
    * NTP step cannot re-open a served window. */
  def settledTs(roots: Seq[String]): Long = inFlightLock.synchronized {
    val now = System.currentTimeMillis()
    settledClock = math.max(settledClock, now)
    val floor = roots.iterator.map { r =>
      val m = inFlightTs.get(inFlightKey(r, "_log"))
      if (m == null) Long.MaxValue
      else {
        purgeExpired(m, now)
        if (m.isEmpty) { inFlightTs.remove(inFlightKey(r, "_log")); Long.MaxValue }
        else m.firstKey.longValue
      }
    }.min
    // A DURABLE commit must never sit above the settled bound: commit
    // timestamps are floor-bumped strictly above every observed log, so
    // a fast same-millisecond commit streak stamps logs past the wall
    // clock — the observed floor lifts the bound to cover them (any
    // LATER commit will land strictly above the floor by the same
    // bump rule, so the lift can never run ahead of a pending write;
    // the in-flight cap below still bounds everything mid-commit).
    val observed = roots.iterator
      .map(r => observedFloor(r, "_log")).maxOption.getOrElse(0L)
    math.min(math.max(settledClock - 1, observed), floor - 1)
  }

  /** Shared bounded pool for concurrent log GETs (daemon threads). */
  private[ice] lazy val ioPool: ExecutionContext =
    ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(
      16,
      (r: Runnable) => {
        val t = new Thread(r, "ice-log-io")
        t.setDaemon(true)
        t
      }))

  // ------------------------------------------- multi-table transactions
  // A staged commit's filename carries `_x<txnId>`; the transaction's
  // single marker file lives at `<parent-of-root>/_txn/<txnId>.commit`.
  // One marker PUT is the atomic commit point for every staged table.

  // FULLY-ANCHORED parse: ts, optional _m, then the hostname — which the
  // sanitizer restricts to [A-Za-z0-9.-], so it can never CONTAIN an
  // underscore — then the tag. A host literally named `x<16hex>` writes
  // `{ts}_x<16hex>.jsonl`, which this pattern rejects (no second
  // underscore): only a real `{ts}_{host}_x{id}` staged name matches.
  private val TxnName =
    """^[0-9]+(?:_m)?_[A-Za-z0-9.\-]+_x([0-9a-f]{16})\.jsonl$""".r

  /** Transaction id of a staged log filename, None for ordinary logs. */
  private[ice] def txnIdOf(name: String): Option[String] =
    if (!name.contains("_x")) None
    else TxnName.findFirstMatchIn(name).map(_.group(1))

  /** `<parent-of-root>/_txn/<id>.commit` — derivable from the root alone,
    * which is what lets every reader check it with no side channel. All
    * tables in one transaction must share a parent directory. */
  private[ice] def txnMarkerPath(root: String, id: String): Path = {
    val parent = Option(new Path(root).getParent).getOrElse(new Path("/"))
    new Path(new Path(parent, "_txn"), s"$id.commit")
  }

  /** `<parent-of-root>/_txn/<id>.abort` — the vacuum's RECLAIM-INTENT
    * marker. Written (create-if-absent) BEFORE any expired stage is
    * touched; [[IceTransaction.commit]] checks it right after its own
    * marker PUT. On a strongly-consistent store exactly one side wins:
    * if the vacuum's post-intent commit-marker probe saw no marker, the
    * commit PUT came later and its abort probe sees the intent (commit
    * self-aborts, marker deleted); if the commit's abort probe saw no
    * intent, the intent came later and the vacuum's probe sees the
    * commit marker (reclaim skipped, intent deleted). A skewed clock can
    * therefore KILL a transaction, never partially commit one. */
  private[ice] def txnAbortPath(root: String, id: String): Path = {
    val parent = Option(new Path(root).getParent).getOrElse(new Path("/"))
    new Path(new Path(parent, "_txn"), s"$id.abort")
  }

  /** Confirmed = the commit marker exists. Positive results cache
    * process-wide (a marker never un-commits); pending ids re-probe on
    * every listing until confirmed, so the steady-state cost is zero and
    * the pending-state cost is one existence probe per distinct open
    * transaction per listing. */
  private val confirmedTxns =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[ice] def txnConfirmed(io: IceLogIO, root: String, id: String): Boolean = {
    val marker = txnMarkerPath(root, id)
    val key = marker.toString
    if (confirmedTxns.contains(key)) return true
    // a probe FAILURE must propagate, never default to "unconfirmed":
    // defaulting would hide half a committed transaction from one
    // table's listing (breaking the cross-table atomicity the marker
    // exists for) and — worse — let the vacuum classify a COMMITTED
    // stage as reclaimable and delete its data
    val ok = marker.getFileSystem(io.conf).exists(marker)
    if (ok) confirmedTxns.add(key)
    ok
  }

  /** Prime the confirmed cache right after a marker PUT (same-process
    * readers skip the first probe). */
  private[ice] def primeTxnConfirmed(marker: Path): Unit = {
    confirmedTxns.add(marker.toString); ()
  }

  /** Invalidate a cached confirmation: the ONE case a marker un-commits
    * is a commit self-aborting after losing the reclaim handshake — a
    * same-process reader that probed during the marker's transient
    * existence must not stay confirmed forever. */
  private[ice] def unprimeTxnConfirmed(marker: Path): Unit = {
    confirmedTxns.remove(marker.toString); ()
  }

  /** Filename codec: `{ts}[_m]_{hostname}.jsonl` → (ts, merged)
    * (reference: icedb/log.py:360-371). */
  def logFileInfo(fileName: String): (Long, Boolean) = {
    val name = fileName.split("/").last
    val parts = name.split("_")
    val ts = parts(0).toLong
    val merged = parts.length > 2 && parts(1) == "m"
    (ts, merged)
  }
}
