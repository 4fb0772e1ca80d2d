package graft.ice

/** Test FileSystem: local storage under the `flakydv:` scheme whose
  * `listStatus` fails ONCE (when armed) for paths under a `_dv` side
  * table — the injected transient-blip seam proving
  * [[IceTable.commitVersion]] PROPAGATES listing failures instead of
  * reading them as "no dv commits" (which would pin a stale dim version
  * and let a dim-side merge-on-read delete slip through join-view
  * maintenance undetected). */
class FlakyDvFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("flakydv:///")
  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    if (p.toString.contains("/_dv/") &&
        FlakyDvFileSystem.failNext.compareAndSet(true, false))
      throw new java.io.IOException("injected transient _dv listing failure")
    super.listStatus(p)
  }
}

object FlakyDvFileSystem {
  private val failNext = new java.util.concurrent.atomic.AtomicBoolean(false)
  def armFailure(): Unit = failNext.set(true)
}
