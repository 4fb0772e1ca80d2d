package graft.ice

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-process commit fencing ([[TableLock]]): lease semantics at the
  * file level, and the headline two-process test — a forked second JVM
  * racing CoW `updateWhere` increments against this one, where any lost
  * update is immediately visible as a short count or duplicate rows. */
class TableLockSpec extends SparkSpec {

  private def lockFile(root: String) =
    java.nio.file.Paths.get(root, ".graft.lock")

  test("lease: exclusive while held, timeout surfaces as commit conflict") {
    val root = tmpDir("lockx")
    val l1 = TableLock.acquire(root)
    assert(java.nio.file.Files.exists(lockFile(root)))
    val e = intercept[CommitConflictException] {
      TableLock.acquire(root, timeoutMs = 300)
    }
    assert(e.getMessage.contains("could not acquire"))
    TableLock.release(root)
    assert(!java.nio.file.Files.exists(lockFile(root)))
    val l2 = TableLock.acquire(root)
    assert(l2.fence > l1.fence, "fencing token must increase across clean release")
    TableLock.release(root)
  }

  test("lease: stale holder is stolen after TTL; token strictly increases") {
    val root = tmpDir("locksteal")
    val l1 = TableLock.acquire(root, ttlMs = 150)
    // simulate the holder dying: stop renewing and let the mtime age out
    Thread.sleep(400)
    val l2 = TableLock.acquire(root, ttlMs = 60_000, timeoutMs = 5_000)
    assert(l2.fence > l1.fence, "steal must advance the fencing token")
    TableLock.release(root)
  }

  test("lease stolen mid-commit: the holder's next append fails, not lands") {
    val root = tmpDir("lockfence")
    TableLock.acquire(root)
    // a thief (another process, simulated byte-for-byte) replaced the
    // lock after our TTL expired: ownership check must abort the append
    java.nio.file.Files.write(lockFile(root),
      """{"o":"thief@999","f":99,"t":0,"ttl":60000}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[CommitConflictException] { TableLock.checkAndFence(root) }
    assert(e.getMessage.contains("taken over"))
    // release must NOT delete the thief's lock — it is not ours anymore
    TableLock.release(root)
    assert(java.nio.file.Files.exists(lockFile(root)))
  }

  test("fenced commits stamp the token into log metadata; inserts do not") {
    val root = tmpDir("lockmeta")
    val t = new IceTable(spark, root, IceTableConfig(lit("p=1"), Seq.empty))
    t.insert(spark.range(5).select(col("id").as("k"), col("id").as("v")))
    t.updateWhere(col("k") === 1L, Seq("v" -> lit(100L)))
    val metas = t.logio.currentLogFiles(root).map(p => LogMetadata.fromJson(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(root, p)).get(0)))
    val (fenced, unfenced) = metas.partition(_.fence.isDefined)
    assert(unfenced.nonEmpty, "the plain insert commit must carry no fence")
    assert(fenced.nonEmpty, "the CoW rewrite commit must carry the fence token")
    assert(fenced.forall(_.fence.get > 0))
  }

  test("release leaves no debris; vacuumOrphans sweeps aged lock graveyards") {
    val root = tmpDir("lockgrave")
    val t = new IceTable(spark, root, IceTableConfig(lit("p=1"), Seq.empty))
    t.insert(spark.range(3).select(col("id").as("k"), col("id").as("v")))
    // a clean acquire/release cycle must not accumulate graveyard files
    TableLock.acquire(root); TableLock.release(root)
    def debris() = new java.io.File(root).list().toSeq.filter(n =>
      n.startsWith(".graft.lock.stale.") || n.startsWith(".graft.fence.tmp."))
    assert(debris().isEmpty, s"release left: ${debris()}")
    // steal/crash debris (simulated) ages out through vacuumOrphans
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, ".graft.lock.stale.deadbeef"), "x")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, ".graft.fence.tmp.deadbeef"), "9")
    Thread.sleep(5)
    t.vacuumOrphans(minAgeMs = 1)
    assert(debris().isEmpty, s"vacuum kept: ${debris()}")
    // the live fence counter survives the sweep (it is no debris)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, ".graft.fence")))
  }

  test("two processes racing CoW updates: serialized or conflicted, never lost") {
    val root = tmpDir("lock2proc")
    val t = new IceTable(spark, root, IceTableConfig(lit("p=1"), Seq.empty))
    t.insert(spark.range(1).select(lit(1L).as("k"), lit(0L).as("v")))

    val nChild = 3
    val nParent = 3
    // fork a REAL second JVM on the same classpath: its commitLock map,
    // settledTs registry, and held-lease map are all its own — only the
    // lock FILE is shared, which is the point
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
      .toSeq
    // --add-opens may arrive as one token or two; pass through verbatim
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"),
      "graft.ice.LockChildMain", root, nChild.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val outBuf = new StringBuilder
    val drain = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = r.readLine()
      while (line != null) { outBuf.append(line).append('\n'); line = r.readLine() }
    })
    drain.setDaemon(true); drain.start()

    var parentDone = 0
    var attempts = 0
    while (parentDone < nParent && attempts < nParent * 50) {
      attempts += 1
      try {
        t.updateWhere(col("k") === 1L, Seq("v" -> (col("v") + 1L)))
        parentDone += 1
      } catch {
        case _: CommitConflictException => Thread.sleep(20L)
      }
    }
    assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      s"child did not finish; output so far:\n$outBuf")
    drain.join(2000)
    assert(proc.exitValue() == 0,
      s"child failed (exit ${proc.exitValue()}):\n$outBuf")
    assert(outBuf.toString.contains(s"CHILD_DONE $nChild"), outBuf.toString)
    assert(parentDone == nParent, s"parent applied only $parentDone/$nParent")

    val rows = t.read().collect()
    assert(rows.length == 1,
      s"duplicate rows — a lost-update rewrite landed twice: ${rows.mkString(",")}")
    assert(rows.head.getAs[Long]("v") == (nChild + nParent).toLong,
      s"expected v=${nChild + nParent}, got ${rows.head.getAs[Long]("v")} — " +
        "an increment was lost")
    // every CoW commit in the log carries a distinct, increasing fence
    val fences = t.logio.currentLogFiles(root).flatMap(p => LogMetadata.fromJson(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(root, p)).get(0)).fence)
    assert(fences.size == fences.distinct.size,
      s"fencing tokens must be unique per lease: $fences")
    assert(fences.size >= nChild + nParent)
  }
}
