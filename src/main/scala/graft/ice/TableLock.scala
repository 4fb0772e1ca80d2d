package graft.ice

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => NioPath, Paths, StandardCopyOption}

/** Cross-process commit fencing — the missing half of the OCC story.
  *
  * [[IceTable.commitLock]] linearizes same-JVM commits and the in-flight
  * registry ([[IceLogIO.settledTs]]) protects same-JVM consumers, but both
  * are process-local. The reference's contract for multi-writer tables is
  * an EXTERNAL exclusive lock around merge-class operations
  * (reference ARCHITECTURE.md:158-165, README.md:600-616: "wrap the
  * operation in an exclusive distributed lock"); without one, two
  * processes can each validate a copy-on-write rewrite against the same
  * snapshot and both land, silently losing one update (both tombstone the
  * same source file, both re-list their own rewrite of it).
  *
  * This is that lock, built from the store's own primitives so no lock
  * service is required where the filesystem can arbitrate:
  *
  *   - '''mutual exclusion''': a lock FILE at `<root>/.graft.lock`,
  *     acquired by atomic create-if-absent (`O_EXCL` via
  *     [[Files.createFile]] on local roots; `FileSystem.create(p, false)`
  *     on HDFS-class stores, where create-no-overwrite is atomic).
  *   - '''liveness (TTL lease)''': a crashed holder's lock goes stale
  *     after `ttlMs` judged by the lock file's mtime (content-independent,
  *     so a holder that died mid-write still expires). Takeover is
  *     arbitrated by RENAME of the stale file to a unique graveyard name —
  *     rename of a missing source fails, so exactly one contender wins
  *     the steal and proceeds to the normal create path.
  *   - '''fencing''': each acquisition gets a strictly increasing fencing
  *     token from `<root>/.graft.fence` (read+1, persisted while the lock
  *     is held — monotonic across clean releases AND steals). Every log
  *     append made while the process holds the lease re-verifies ownership
  *     first ([[checkAndFence]]) and stamps the token into the commit's
  *     metadata line (`"fnc"`), so a writer whose lease was stolen
  *     mid-commit fails with [[CommitConflictException]] instead of
  *     landing a stale rewrite, and the log itself records which lease
  *     each fenced commit ran under.
  *
  * Scope: the lease wraps the VALIDATE→APPEND window of read-modify-write
  * commits (rewrites, dv marks, restore, maintenance, branch publish) via
  * [[IceTable.withTableLock]]. Plain inserts stay lock-free — they append
  * fresh uniquely-named files and cannot lose anyone's update, exactly the
  * reference's distinction (its README requires the external lock for
  * merge/tombstone-clean, not for inserts).
  *
  * Object-store caveat, stated loudly: raw S3 has no atomic
  * create-if-absent (outside conditional-PUT preview features), so on
  * `s3a://` roots this degrades to best-effort — the reference's own
  * answer there is an external lock service, and ours is the same.
  * Local and HDFS-class roots get the full guarantee, which is what the
  * two-process spec proves.
  */
object TableLock {

  final case class Lease(root: String, owner: String, fence: Long,
      acquiredMs: Long, ttlMs: Long)

  private def prop(name: String): Option[String] =
    sys.props.get(name).orElse(sys.env.get(name.toUpperCase.replace('.', '_')))

  /** `graft.table.lock=off` / `GRAFT_TABLE_LOCK=off` disables the
    * cross-process lease (single-writer deployments that want zero lock
    * I/O); the JVM-wide commit lock always stays on. */
  val enabled: Boolean =
    !prop("graft.table.lock").exists(v =>
      v.equalsIgnoreCase("off") || v.equalsIgnoreCase("false"))

  val DefaultTtlMs: Long =
    prop("graft.table.lock.ttl.ms").flatMap(_.toLongOption).getOrElse(60_000L)
  val AcquireTimeoutMs: Long =
    prop("graft.table.lock.timeout.ms").flatMap(_.toLongOption)
      .getOrElse(30_000L)

  private val ownerId =
    s"${java.util.UUID.randomUUID().toString.take(13)}@${ProcessHandle.current.pid}"

  /** Live leases held by THIS process, keyed by table root, with the
    * thread inside [[IceTable.withTableLock]] — only appends made BY THAT
    * THREAD ran under the lease and get fenced; a concurrent lock-free
    * insert from another thread of the same process is neither stamped
    * nor failed. Read by [[checkAndFence]] on every log append; absent
    * key (the insert path) costs one map probe. The [[LockIO]] rides
    * along so release/verify I/O reuses the SAME FileSystem the lease
    * was acquired through (same Hadoop Configuration — credentials,
    * endpoint overrides, fs impl bindings), never a default-config one. */
  private val held =
    new java.util.concurrent.ConcurrentHashMap[String, (Lease, Thread, LockIO)]

  // ------------------------------------------------------------ lock I/O

  /** Storage primitives the lease needs, per scheme class. */
  private sealed trait LockIO {
    /** Atomic create-if-absent with content; false if it already exists. */
    def tryCreate(content: String): Boolean
    def read(): Option[String]
    def mtimeMs(): Option[Long]
    def touch(): Unit
    /** Atomic rename to a unique graveyard name; false if lost the race. */
    def stealRename(): Boolean
    def delete(): Unit
    def readFence(): Long
    def writeFence(v: Long): Unit
    /** Release iff `owner` still holds the lock, by ATOMIC RENAME to a
      * private graveyard name followed by a content check — never a bare
      * check-then-delete of the shared path. If the renamed file turns
      * out to be a thief's (the lease was TTL-stolen between the owner
      * check and the rename), restore it; a failed restore (someone
      * re-created the path in the gap) leaves the displaced thief to
      * fail its own [[checkAndFence]] — a safe abort, never a lost
      * update. Best-effort on I/O errors: an unreleased lock expires on
      * its TTL. */
    def releaseIfOwner(owner: String): Unit
  }

  private final class NioLockIO(rootDir: NioPath) extends LockIO {
    private val lock = rootDir.resolve(".graft.lock")
    private val fence = rootDir.resolve(".graft.fence")
    def tryCreate(content: String): Boolean =
      try {
        Files.createDirectories(rootDir)
        Files.createFile(lock) // O_EXCL: the atomicity point
        Files.write(lock, content.getBytes(StandardCharsets.UTF_8))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    def read(): Option[String] =
      try Some(new String(Files.readAllBytes(lock), StandardCharsets.UTF_8))
      catch { case _: Exception => None }
    def mtimeMs(): Option[Long] =
      try Some(Files.getLastModifiedTime(lock).toMillis)
      catch { case _: Exception => None }
    def touch(): Unit =
      try Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: Exception => () }
    def stealRename(): Boolean =
      try {
        Files.move(lock,
          rootDir.resolve(s".graft.lock.stale.${java.util.UUID.randomUUID()}"),
          StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: Exception => false }
    def delete(): Unit =
      try { Files.deleteIfExists(lock); () } catch { case _: Exception => () }
    def readFence(): Long =
      try new String(Files.readAllBytes(fence), StandardCharsets.UTF_8)
        .trim.toLong
      catch { case _: Exception => 0L }
    def writeFence(v: Long): Unit = {
      val tmp = rootDir.resolve(s".graft.fence.tmp.${java.util.UUID.randomUUID()}")
      Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, fence, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    def releaseIfOwner(owner: String): Unit =
      try {
        if (read().flatMap(ownerOf).contains(owner)) {
          val grave = rootDir.resolve(
            s".graft.lock.stale.${java.util.UUID.randomUUID()}")
          Files.move(lock, grave, StandardCopyOption.ATOMIC_MOVE)
          val got = new String(Files.readAllBytes(grave), StandardCharsets.UTF_8)
          if (ownerOf(got).contains(owner)) { Files.deleteIfExists(grave); () }
          else
            try { Files.move(grave, lock, StandardCopyOption.ATOMIC_MOVE); () }
            catch { case _: Exception => Files.deleteIfExists(grave); () }
        }
      } catch { case _: Exception => () }
  }

  private final class HadoopLockIO(root: String,
      conf: org.apache.hadoop.conf.Configuration) extends LockIO {
    import org.apache.hadoop.fs.{FileSystem, Path}
    private val fs: FileSystem = new Path(root).getFileSystem(conf)
    private val lock = new Path(root, ".graft.lock")
    private val fence = new Path(root, ".graft.fence")
    def tryCreate(content: String): Boolean =
      try {
        // overwrite=false: atomic on HDFS-class stores (the namenode
        // arbitrates); this is the same primitive HDFS leases use
        val out = fs.create(lock, false)
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    def read(): Option[String] =
      try {
        val in = fs.open(lock)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8))
        finally in.close()
      } catch { case _: Exception => None }
    def mtimeMs(): Option[Long] =
      try Some(fs.getFileStatus(lock).getModificationTime)
      catch { case _: Exception => None }
    def touch(): Unit =
      try fs.setTimes(lock, System.currentTimeMillis(), -1)
      catch { case _: Exception => () }
    def stealRename(): Boolean =
      try fs.rename(lock,
        new Path(root, s".graft.lock.stale.${java.util.UUID.randomUUID()}"))
      catch { case _: Exception => false }
    def delete(): Unit =
      try { fs.delete(lock, false); () } catch { case _: Exception => () }
    def readFence(): Long =
      try {
        val in = fs.open(fence)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      } catch { case _: Exception => 0L }
    def writeFence(v: Long): Unit = {
      val tmp = new Path(root, s".graft.fence.tmp.${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, fence)) { fs.delete(fence, false); fs.rename(tmp, fence) }
      ()
    }
    def releaseIfOwner(owner: String): Unit =
      try {
        if (read().flatMap(ownerOf).contains(owner)) {
          val grave =
            new Path(root, s".graft.lock.stale.${java.util.UUID.randomUUID()}")
          if (fs.rename(lock, grave)) {
            val in = fs.open(grave)
            val got = try new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
              StandardCharsets.UTF_8) finally in.close()
            if (ownerOf(got).contains(owner)) { fs.delete(grave, false); () }
            else if (!fs.rename(grave, lock)) { fs.delete(grave, false); () }
          }
        }
      } catch { case _: Exception => () }
  }

  /** The lock/fence I/O resolves its FileSystem through the TABLE'S Hadoop
    * configuration (threaded from [[IceTable.withTableLock]]), not a
    * default `new Configuration()` — on stores needing credentials,
    * endpoint overrides, or fs impl bindings, the lease must hit the same
    * store the commits do. */
  private def io(root: String,
      conf: org.apache.hadoop.conf.Configuration): LockIO = {
    // scheme detection must accept the SINGLE-SLASH URI form too
    // ("s3:/bucket/x", "flakydv:/tmp/x"): a bare `://` probe routed
    // those through the nio branch, where Paths.get treats the whole
    // string as a RELATIVE path and the lock/fence land under the
    // process working directory instead of beside the table
    val scheme = "^([A-Za-z][A-Za-z0-9+.-]*):".r.findPrefixMatchOf(root)
      .map(_.group(1))
    scheme match {
      case None => new NioLockIO(Paths.get(root))
      case Some("file") =>
        new NioLockIO(Paths.get(java.net.URI.create(root)))
      case Some(_) => new HadoopLockIO(root, conf)
    }
  }

  // ------------------------------------------------------------- leasing

  private def leaseJson(owner: String, fence: Long, acquiredMs: Long,
      ttlMs: Long): String =
    s"""{"o":"$owner","f":$fence,"t":$acquiredMs,"ttl":$ttlMs}"""

  private def ownerOf(content: String): Option[String] =
    """"o"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(content).map(_.group(1))

  private def ttlOf(content: String): Option[Long] =
    """"ttl"\s*:\s*(\d+)""".r.findFirstMatchIn(content).map(_.group(1).toLong)

  private def defaultConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Acquire the cross-process lease for `root`, spinning with jittered
    * backoff up to `timeoutMs` and stealing leases whose mtime is older
    * than their TTL. Throws [[CommitConflictException]] on timeout — the
    * caller's commit must not proceed unfenced. `conf` is the table's
    * Hadoop configuration (the lease must hit the same store the commits
    * do); the default only covers direct test callers. */
  def acquire(root: String, ttlMs: Long = DefaultTtlMs,
      timeoutMs: Long = AcquireTimeoutMs,
      conf: org.apache.hadoop.conf.Configuration = defaultConf()): Lease = {
    val lio = io(root, conf)
    val deadline = System.currentTimeMillis() + timeoutMs
    val rnd = new java.util.Random()
    while (true) {
      val nowMs = System.currentTimeMillis()
      // the lock file carries owner/ttl; the token is assigned AFTER the
      // create is won (f:-1 = "pending") — reading the counter before
      // the create would race another acquirer into a duplicate token
      if (lio.tryCreate(leaseJson(ownerId, -1L, nowMs, ttlMs))) {
        // fence AFTER winning the create: under mutual exclusion the
        // persisted value is exactly the last ISSUED token (every holder
        // writes its own before releasing or being stealable), so +1 is
        // strictly higher and unique — no two leases can share a token
        val fence =
          try {
            val f = lio.readFence() + 1
            lio.writeFence(f)
            f
          } catch { case e: Exception => lio.delete(); throw e }
        val lease = Lease(root, ownerId, fence, nowMs, ttlMs)
        held.put(root, (lease, Thread.currentThread(), lio))
        return lease
      }
      // held by someone: stale if its mtime exceeded the HOLDER'S declared
      // TTL (from the lock content — each lease expires on its own terms;
      // a holder that crashed before writing content expires on the
      // acquirer's TTL). mtime, not content timestamps, judges age: a
      // holder that died mid-write still expires.
      val holderTtl = lio.read().flatMap(ttlOf).getOrElse(ttlMs)
      lio.mtimeMs() match {
        case Some(m) if nowMs - m > holderTtl =>
          // rename arbitration: exactly one stealer wins; the winner
          // loops back to the create path and contends fairly
          lio.stealRename()
        case _ => ()
      }
      if (System.currentTimeMillis() > deadline)
        throw new CommitConflictException(
          s"could not acquire cross-process table lock for $root within " +
            s"${timeoutMs} ms (holder: ${lio.read().getOrElse("unknown")})")
      Thread.sleep(2 + rnd.nextInt(9).toLong)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Release `root`'s lease if this process still owns it (a stolen lock
    * belongs to the thief — never delete theirs). Rename-arbitrated, not
    * check-then-delete: see [[LockIO.releaseIfOwner]]. */
  def release(root: String): Unit = {
    val entry = held.remove(root)
    if (entry != null) entry._3.releaseIfOwner(entry._1.owner)
  }

  /** Called by [[IceLogIO.append]] on EVERY log write: when this process
    * holds `root`'s lease, re-verify ownership (the lease may have been
    * stolen after a TTL expiry mid-commit) and return the fencing token to
    * stamp into the commit's metadata; when it doesn't (the lock-free
    * insert path), return None at the cost of one map probe. A failed
    * verification throws [[CommitConflictException]] BEFORE the log file
    * becomes visible — the lost-update path is cut at the last possible
    * moment. */
  def checkAndFence(root: String): Option[Long] = {
    val entry = held.get(root)
    if (entry == null || (entry._2 ne Thread.currentThread())) None
    else {
      val lease = entry._1
      val lio = entry._3
      val owner = lio.read().flatMap(ownerOf)
      if (!owner.contains(lease.owner))
        throw new CommitConflictException(
          s"cross-process table lock for $root was ${owner.fold("released")(o =>
            s"taken over by $o")} after this lease's TTL " +
            s"(${lease.ttlMs} ms) expired mid-commit; aborting the append " +
            "to prevent a lost update")
      lio.touch() // renew: long multi-append commits keep the lease fresh
      Some(lease.fence)
    }
  }

  /** Test hook: current lease registry size (leak detection). */
  private[ice] def heldCount: Int = held.size
}
