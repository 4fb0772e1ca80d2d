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
  */
final case class FileMarker(
    path: String,
    createdMs: Long,
    fileBytes: Long,
    tombstone: Option[Long] = None,
    virSourceLogFile: Option[String] = None,
    stats: Option[(String, String)] = None) {

  def json: String = {
    val base = Seq("p" -> (path: Any), "b" -> (fileBytes: Any), "t" -> (createdMs: Any))
    val withTmb = tombstone.fold(base)(t => base :+ ("tmb" -> (t: Any)))
    Json.obj(stats.fold(withTmb)(s =>
      withTmb :+ ("st" -> (Seq(s._1, s._2): Any))): _*)
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
      stats = m.get("st").collect {
        case s: scala.collection.Seq[_] if s.length == 2 =>
          (s(0).toString, s(1).toString)
      })
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
  * "t": timestampMs[, "tmb": tombstoneLine]}` — line *indices* into the
  * JSONL body (reference: icedb/log.py:185-223, ARCHITECTURE.md:30-43).
  */
final case class LogMetadata(
    version: Int,
    schemaLineIndex: Int,
    fileLineIndex: Int,
    tombstoneLineIndex: Option[Int] = None,
    timestamp: Long = System.currentTimeMillis()) {

  def json: String = {
    val base = Seq(
      "v" -> (version: Any),
      "sch" -> (schemaLineIndex: Any),
      "f" -> (fileLineIndex: Any),
      "t" -> (timestamp: Any))
    Json.obj(tombstoneLineIndex.fold(base)(t => base :+ ("tmb" -> (t: Any))): _*)
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
      m("t").asInstanceOf[Long])
  }
}

/** Full MVCC state at a point in time (reference: icedb/log.py:311-328). */
final case class IceSnapshot(
    schema: Schema,
    files: Seq[FileMarker],
    tombstones: Seq[LogTombstone],
    logFiles: Seq[String],
    timestamp: Long) {
  def aliveFiles: Seq[FileMarker] = files.filter(_.alive)
}
