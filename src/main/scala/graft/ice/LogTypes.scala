package graft.ice

/** One immutable data part (a Parquet file). Serialized as
  * `{"p": path, "b": bytes, "t": createdMs[, "tmb": tombstoneMs]
  * [, "st": [min, max]]}` (reference: icedb/log.py:111-158,
  * ARCHITECTURE.md:86-100).
  *
  * @param virSourceLogFile which log file this marker was read from; used by
  *   merge to rewrite exactly the source logs (icedb/log.py:117-125,273).
  *   Never serialized.
  * @param stats beyond-reference extension (opt-in via
  *   `IceTableConfig.statsColumn`): the file's [min, max] of the stats
  *   column, read once from the parquet footer at write time, so range
  *   queries on the cluster key skip files from the LOG alone — zero
  *   footer/object-store reads at plan time. Absent on stats-less writers;
  *   readers that don't know the field ignore it (the reference format's
  *   fields are untouched).
  * @param multiStats [min, max] per ADDITIONAL stats column
  *   (`IceTableConfig.statsColumns` beyond the primary), serialized as
  *   `"stm": {col: [min, max]}` with sorted keys (log bytes must not
  *   depend on map iteration order). Separate from `stats` so tables
  *   using only the single-column knob keep byte-identical logs.
  */
final case class FileMarker(
    path: String,
    createdMs: Long,
    fileBytes: Long,
    tombstone: Option[Long] = None,
    virSourceLogFile: Option[String] = None,
    stats: Option[(String, String)] = None,
    multiStats: Map[String, (String, String)] = Map.empty,
    /** `"rc"`: the file's PHYSICAL row count from its parquet footer,
      * captured at write time — the metadata-only `count(*)` input.
      * Optional like `st`/`stm`: reference-written logs (and pre-field
      * history) parse as None, and any alive rc-less file disables the
      * fast count rather than corrupting it. */
    rowCount: Option[Long] = None) {

  def json: String = {
    val base = Seq("p" -> (path: Any), "b" -> (fileBytes: Any), "t" -> (createdMs: Any))
    val withRc = rowCount.fold(base)(n => base :+ ("rc" -> (n: Any)))
    val withTmb = tombstone.fold(withRc)(t => withRc :+ ("tmb" -> (t: Any)))
    val withSt = stats.fold(withTmb)(s =>
      withTmb :+ ("st" -> (Seq(s._1, s._2): Any)))
    val withStm =
      if (multiStats.isEmpty) withSt
      else withSt :+ ("stm" -> (scala.collection.immutable.ListMap(
        multiStats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          c -> (Seq(mn, mx): Any)
        }: _*): Any))
    // `vsl` appears only in CHECKPOINT files (IceLogIO.writeCheckpoint):
    // every normal log append strips virSourceLogFile first, so reference
    // log bytes are untouched. Checkpoint-seeded snapshots need the source
    // log preserved because merge rewrites exactly its markers' source logs.
    Json.obj(
      virSourceLogFile.fold(withStm)(v => withStm :+ ("vsl" -> (v: Any))): _*)
  }
  def alive: Boolean = tombstone.isEmpty
}

object FileMarker {
  def fromJson(line: String): FileMarker = fromMap(Json.parseObject(line))
  def fromMap(m: scala.collection.Map[String, Any]): FileMarker =
    FileMarker(
      m("p").toString,
      m("t").asInstanceOf[Long],
      m("b").asInstanceOf[Long],
      m.get("tmb").map(_.asInstanceOf[Long]),
      virSourceLogFile = m.get("vsl").map(_.toString),
      rowCount = m.get("rc").map(_.asInstanceOf[Long]),
      stats = m.get("st").collect {
        case s: scala.collection.Seq[_] if s.length == 2 =>
          (s(0).toString, s(1).toString)
      },
      multiStats = m.get("stm").collect {
        case sm: scala.collection.Map[_, _] =>
          sm.collect {
            case (k, v: scala.collection.Seq[_]) if v.length == 2 =>
              k.toString -> (v(0).toString, v(1).toString)
          }.toMap
      }.getOrElse(Map.empty))
}

/** A log file superseded by a merge; `{"p": logPath, "t": tombstonedMs}`
  * (reference: icedb/log.py:160-182, ARCHITECTURE.md:66-85). */
final case class LogTombstone(path: String, createdMs: Long) {
  def json: String = Json.obj("p" -> path, "t" -> createdMs)
}

object LogTombstone {
  def fromJson(line: String): LogTombstone = fromMap(Json.parseObject(line))
  def fromMap(m: scala.collection.Map[String, Any]): LogTombstone =
    LogTombstone(m("p").toString, m("t").asInstanceOf[Long])
}

/** Log-file line 1: `{"v": version, "sch": schemaLine, "f": fileLine,
  * "t": timestampMs[, "tmb": tombstoneLine][, "sc": {query: batchId}]}` —
  * line *indices* into the JSONL body (reference: icedb/log.py:185-223,
  * ARCHITECTURE.md:30-43).
  *
  * @param streamCommits beyond-reference extension for exactly-once
  *   Structured Streaming sinks: the highest micro-batch id this log
  *   commits per stream query name. An insert carrying `{q: 7}` and the
  *   log append are ONE atomic PUT, so a foreachBatch replay of batch 7
  *   after a crash is detected from the fold and skipped — the classic
  *   transactional-sink idempotence contract. Merged-log rewrites carry
  *   the per-query max forward so the record outlives log compaction and
  *   cleanup. Absent (and unserialized) everywhere streaming isn't used —
  *   the reference format's bytes are untouched.
  */
final case class LogMetadata(
    version: Int,
    schemaLineIndex: Int,
    fileLineIndex: Int,
    tombstoneLineIndex: Option[Int] = None,
    timestamp: Long = System.currentTimeMillis(),
    streamCommits: Map[String, Long] = Map.empty,
    tableCfg: Option[Map[String, Any]] = None,
    // "cln": marks a tombstone-cleanup consolidation — the ONE commit kind
    // that DELETES source log files — and carries the CONSOLIDATION
    // HORIZON: the max filename timestamp of the logs it deleted. History
    // at or before the horizon can no longer be reconstructed per-commit
    // (ChangeFeed's attribution floor); a consumer caught up past the
    // horizon is unaffected, even though the cleanup commit itself is
    // newer. Additive beyond-reference field like "sc"/"cfg".
    cleanedHorizon: Option[Long] = None,
    // "fnc": the cross-process fencing token the commit ran under
    // (TableLock) — present only on commits made while a table lease was
    // held (rewrites, dv marks, restore, maintenance), strictly
    // increasing across lease acquisitions, so the log records which
    // lease every fenced commit belonged to. Additive beyond-reference
    // field; lock-free inserts never emit it.
    fence: Option[Long] = None) {

  def json: String = {
    val base0 = Seq(
      "v" -> (version: Any),
      "sch" -> (schemaLineIndex: Any),
      "f" -> (fileLineIndex: Any),
      "t" -> (timestamp: Any))
    val baseC = cleanedHorizon.fold(base0)(h => base0 :+ ("cln" -> (h: Any)))
    val base = fence.fold(baseC)(n => baseC :+ ("fnc" -> (n: Any)))
    val withTmb = tombstoneLineIndex.fold(base)(t => base :+ ("tmb" -> (t: Any)))
    val withSc =
      if (streamCommits.isEmpty) withTmb
      // sorted: log bytes must not depend on map iteration order
      else withTmb :+ ("sc" ->
        (scala.collection.immutable.ListMap(streamCommits.toSeq.sortBy(_._1): _*): Any))
    // "cfg": persisted table configuration (sort order, stats columns,
    // partition expression SQL, merge SQL, ...) — a beyond-reference
    // additive field like "sc"; readers that don't know it ignore it, and
    // default-config tables never emit it (their log bytes are untouched).
    // Last writer wins across the fold. Sorted keys: log bytes must not
    // depend on map iteration order.
    Json.obj(
      tableCfg.filter(_.nonEmpty).fold(withSc)(c => withSc :+ ("cfg" ->
        (scala.collection.immutable.ListMap(c.toSeq.sortBy(_._1): _*): Any))): _*)
  }
}

object LogMetadata {
  def fromJson(line: String): LogMetadata = {
    val m = Json.parseObject(line)
    LogMetadata(
      m("v").asInstanceOf[Long].toInt,
      m("sch").asInstanceOf[Long].toInt,
      m("f").asInstanceOf[Long].toInt,
      m.get("tmb").map(_.asInstanceOf[Long].toInt),
      m("t").asInstanceOf[Long],
      streamCommits = m.get("sc").collect {
        case sc: scala.collection.Map[_, _] =>
          sc.map { case (k, v) => k.toString -> v.asInstanceOf[Long] }.toMap
      }.getOrElse(Map.empty),
      tableCfg = m.get("cfg").collect {
        case c: scala.collection.Map[_, _] =>
          c.map { case (k, v) => k.toString -> v }.toMap
      },
      cleanedHorizon = m.get("cln").map(_.asInstanceOf[Long]),
      fence = m.get("fnc").map(_.asInstanceOf[Long]))
  }

  /** Max-merge of per-query committed batch ids (fold across logs). */
  def mergeCommits(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (q, id)) =>
      acc.updated(q, math.max(acc.getOrElse(q, Long.MinValue), id))
    }
}

/** A persisted fold of the log up to `ckptTs` (max covered log-file ts) —
  * the beyond-reference snapshot accelerator (see
  * [[IceLogIO.writeCheckpoint]]). `coveredLogs` is the exact log-file set
  * folded in, so readers take `current logs minus covered` as the tail;
  * logs deleted after coverage (tombstone cleanup) never need re-reading.
  */
final case class IceCheckpoint(
    ckptTs: Long,
    coveredLogs: Seq[String],
    schema: Schema,
    markers: Seq[FileMarker],
    tombstones: Seq[LogTombstone],
    streamCommits: Map[String, Long],
    tableCfg: Option[Map[String, Any]] = None)

/** Full MVCC state at a point in time (reference: icedb/log.py:311-328).
  *
  * @param streamCommits highest committed micro-batch id per stream query
  *   name, max-folded across the snapshot's logs (see
  *   [[LogMetadata.streamCommits]]). */
final case class IceSnapshot(
    schema: Schema,
    files: Seq[FileMarker],
    tombstones: Seq[LogTombstone],
    logFiles: Seq[String],
    timestamp: Long,
    streamCommits: Map[String, Long] = Map.empty,
    tableConfig: Option[Map[String, Any]] = None) {
  def aliveFiles: Seq[FileMarker] = files.filter(_.alive)
}
