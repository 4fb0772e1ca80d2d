package graft.sources

import org.apache.hadoop.conf.Configuration

/** A19: the reference's boto3 client plumbing (icedb/log.py:32-56 —
  * endpoint, path-style, credentials) and its insert retry loop
  * (icedb/icedb.py:146-172 — ≤3 retries with linear backoff on 5xx/429)
  * map onto Hadoop s3a configuration: s3a retries transient failures
  * itself, governed by `fs.s3a.retry.*`, and every IceTable/Spark read or
  * write then inherits it. Apply to `spark.sparkContext.hadoopConfiguration`
  * (or pass as `spark.hadoop.*` session configs).
  */
object S3Config {

  final case class S3Options(
      endpoint: Option[String] = None,
      region: Option[String] = None,
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      pathStyleAccess: Boolean = false,
      retryLimit: Int = 3,
      retryIntervalMs: Long = 300L)

  /** Mutates `conf` in place and returns it. */
  def applyS3a(conf: Configuration, opts: S3Options): Configuration = {
    opts.endpoint.foreach(conf.set("fs.s3a.endpoint", _))
    opts.region.foreach(conf.set("fs.s3a.endpoint.region", _))
    opts.accessKey.foreach(conf.set("fs.s3a.access.key", _))
    opts.secretKey.foreach(conf.set("fs.s3a.secret.key", _))
    if (opts.pathStyleAccess) conf.set("fs.s3a.path.style.access", "true")
    // the reference's linear-backoff retry loop, expressed as s3a policy
    conf.set("fs.s3a.retry.limit", opts.retryLimit.toString)
    conf.set("fs.s3a.retry.interval", s"${opts.retryIntervalMs}ms")
    conf.set("fs.s3a.attempts.maximum", opts.retryLimit.toString)
    // single-object PUTs commit atomically at close (the log's atomicity
    // unit); disable multipart for small log objects via threshold default
    conf
  }
}
