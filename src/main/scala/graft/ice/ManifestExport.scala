package graft.ice

import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Foreign-engine access: export a snapshot's alive-file list as a static
  * JSON manifest (plus a ready-to-run DuckDB view definition), so any
  * parquet-reading engine can query a graft table WITHOUT folding the
  * JSONL log itself.
  *
  * This is the answer to the reference's transparent-proxy / `get_files`
  * integrations (README.md:28-31 "Query engines such as DuckDB,
  * ClickHouse, ...", ch/user_scripts/main.go:44-73): where the reference
  * ships a Go UDF per engine, a graft snapshot exports once and every
  * engine reads the same manifest. The manifest is a point-in-time
  * artifact — MVCC isolation holds for as long as tombstone cleanup's
  * retention keeps the listed files (same contract as any reader pinning
  * a snapshot; re-export to advance).
  *
  * Deletion vectors are exported too: `delete_files` lists the dv side
  * table's alive parquet files of `(path, row_index)` marks, and the
  * generated DuckDB view applies the anti-join via
  * `file_row_number`/`filename`, so merge-on-read deletes are invisible
  * to foreign readers exactly as they are to every Spark surface.
  */
object ManifestExport {

  /** Write `<dest>` (a JSON file) describing the snapshot at `maxTs`:
    * version, qualified root, snapshot timestamp, the union schema
    * (log type-strings), each alive file's root-relative and absolute
    * path with bytes/created-ms, and any deletion-vector files. Returns
    * the number of data files listed. */
  def writeManifest(
      table: IceTable, dest: String, maxTs: Long = Long.MaxValue): Int = {
    val (json, nFiles) = manifestJson(table, maxTs)
    val p = new Path(dest)
    val fs = p.getFileSystem(table.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((json + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    nFiles
  }

  /** The manifest JSON itself (one line) plus the data-file count —
    * shared by [[writeManifest]] and the LIVE `GET /manifest` endpoint
    * ([[graft.sources.IceHttpApi]]), so a static export and the served
    * form are byte-identical for the same snapshot. */
  def manifestJson(
      table: IceTable, maxTs: Long = Long.MaxValue): (String, Int) = {
    val snap = table.snapshot(maxTs)
    val root = table.qualifiedRoot
    val files = snap.aliveFiles.sortBy(_.path)
    val dv = DeleteVectors.dvTable(table)
    val dvFiles = dv.trySnapshot(maxTs).map(_.aliveFiles.sortBy(_.path))
      .getOrElse(Seq.empty)
    val json = Json.obj(
      "version" -> 1,
      "root" -> root,
      "snapshot_ts" -> snap.timestamp,
      "schema" -> snap.schema.pairs.toMap,
      "files" -> files.map(m => Json.parseObject(Json.obj(
        "path" -> m.path,
        "absolute" -> s"$root/${m.path}",
        "bytes" -> m.fileBytes,
        "created_ms" -> m.createdMs)): Any),
      "delete_files" -> dvFiles.map(m =>
        s"${dv.qualifiedRoot}/${m.path}": Any))
    (json, files.length)
  }

  /** The DuckDB SQL that queries the snapshot with NO graft code at all:
    * a view over `read_parquet` of the manifest's absolute paths
    * (union_by_name matches the add-only union-schema contract), with the
    * deletion-vector anti-join applied when marks exist. Write it next to
    * the manifest and `duckdb -c ".read manifest.sql"`. */
  def duckDbViewSql(
      table: IceTable, viewName: String, maxTs: Long = Long.MaxValue): String = {
    val snap = table.snapshot(maxTs)
    val root = table.qualifiedRoot
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val fileList = snap.aliveFiles.sortBy(_.path)
      .map(m => lit(stripScheme(s"$root/${m.path}"))).mkString("[", ", ", "]")
    val dv = DeleteVectors.dvTable(table)
    val dvFiles = dv.trySnapshot(maxTs).map(_.aliveFiles.sortBy(_.path))
      .getOrElse(Seq.empty)
    val rawBody =
      if (dvFiles.isEmpty)
        s"SELECT * FROM read_parquet($fileList, union_by_name=true)"
      else {
        val dvList = dvFiles
          .map(m => lit(stripScheme(s"${dv.qualifiedRoot}/${m.path}")))
          .mkString("[", ", ", "]")
        s"""SELECT * EXCLUDE (filename, file_row_number)
           |FROM read_parquet($fileList, union_by_name=true,
           |                  filename=true, file_row_number=true) t
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM read_parquet($dvList) d
           |  WHERE ends_with(t.filename, d.path) AND t.file_row_number = d.row_index)""".stripMargin
      }
    val body = table.cfg.mvDef match {
      case None => rawBody
      case Some(enc) =>
        val d = graft.operators.MvSync.MvViewDef.decode(enc)
        // exact-distinct side tables export alongside: their alive file
        // lists feed per-column fold CTEs, so a foreign engine serves
        // the EXACT distinct (unlike the HLL spelling, which refuses)
        val xdBodies = d.spec.exactDistinctCols.map { c =>
          val side = graft.operators.MvSync.xdTable(table, d.spec, c)
          val fs = side.trySnapshot(maxTs)
            .map(_.aliveFiles.sortBy(_.path)).getOrElse(Seq.empty)
          val b =
            if (fs.isEmpty) ""
            else {
              val l = fs.map(m =>
                lit(stripScheme(s"${side.qualifiedRoot}/${m.path}")))
                .mkString("[", ", ", "]")
              s"SELECT * FROM read_parquet($l, union_by_name=true)"
            }
          (c, b)
        }
        mvFoldSql(rawBody, d, xdBodies)
    }
    s"""CREATE OR REPLACE VIEW $viewName AS
       |$body;
       |""".stripMargin
  }

  /** For a MATERIALIZED VIEW table, foreign engines must see the FOLDED
    * view, never the raw delta partials — this wraps the raw-file select
    * in the exact newest-reset-wins algebra
    * [[graft.operators.MvSync.read]] applies (latest reset generation
    * per group, plus strictly-later partials, summed/min/maxed, empty
    * groups dropped) followed by the definition's output projection,
    * spelled in DuckDB SQL. */
  private def mvFoldSql(
      rawBody: String, d: graft.operators.MvSync.MvViewDef,
      xdBodies: Seq[(String, String)] = Nil): String = {
    val spec = d.spec
    // count(distinct) partials are DataSketches HLL binaries — a foreign
    // engine without the sketch library cannot fold them. Refuse with the
    // columns named rather than export a view that silently drops them.
    if (spec.distinctCols.nonEmpty) throw new UnsupportedOperationException(
      "cannot export a DuckDB view for a materialized view with " +
        s"count(DISTINCT ${spec.distinctCols.mkString(", ")}): the " +
        "partial state is DataSketches HLL, which DuckDB cannot fold — " +
        "read the view through the engine, or export the folded RESULT")
    def q(c: String) = s""""${c.replace("\"", "\"\"")}""""
    // fold keys come from the SPEC (a GLOBAL view folds under its
    // stored synthetic key, which the projection then drops); only the
    // user-declared group columns reach the output list
    val gCols = d.spec.groupCols.map(q).mkString(", ")
    val folds = (s"sum(cnt) AS cnt" +:
      (spec.sumCols.map(c => s"sum(${q(spec.sumCol(c))}) AS ${q(spec.sumCol(c))}") ++
        spec.countCols.map(c => s"sum(${q(spec.cntCol(c))}) AS ${q(spec.cntCol(c))}") ++
        spec.minMaxCols.flatMap(c => Seq(
          s"min(${q(spec.minCol(c))}) AS ${q(spec.minCol(c))}",
          s"max(${q(spec.maxCol(c))}) AS ${q(spec.maxCol(c))}")))).mkString(", ")
    // exact-distinct columns fold their per-(group, value) SIDE tables:
    // one CTE chain per column (same newest-reset-wins algebra with the
    // value in the key), counted per group and LEFT-joined to the fold.
    // A side table with no commits yet contributes an empty relation —
    // the coalesce serves 0, matching the engine's read
    def xdCte(c: String): String = s"_xd_${spec.xdValCol(c)}"
    val xdKey = (spec.groupCols ++ Seq.empty).map(q) // group key, quoted
    val xdCtes = xdBodies.map { case (c, b) =>
      val cte = xdCte(c)
      val v = q(spec.xdValCol(c))
      // distinct: exact_count_distinct over a GROUP column keeps the
      // side key set unchanged (mirrors MvSync.xdSideSpec) — a repeated
      // name would be an ambiguous reference in DuckDB's binder
      val gv = (spec.groupCols.map(q) :+ v).distinct.mkString(", ")
      val gOnly = xdKey.mkString(", ")
      if (b.isEmpty)
        s"""$cte AS (
           |  SELECT ${(xdKey.map(g => s"NULL AS $g") :+
                 s"CAST(0 AS BIGINT) AS ${q(spec.xdCol(c))}").mkString(", ")}
           |  WHERE 1 = 0)""".stripMargin
      else
        s"""$cte AS (
           |  SELECT $gOnly, count(*) AS ${q(spec.xdCol(c))}
           |  FROM (
           |    SELECT $gv, sum(cnt) AS cnt FROM (
           |      SELECT * FROM (
           |        SELECT *, max(CASE WHEN is_reset THEN gen END)
           |          OVER (PARTITION BY $gv) AS _rgen
           |        FROM ($b) _xr) _xg
           |      WHERE (is_reset AND gen = _rgen)
           |         OR ((NOT is_reset) AND gen > coalesce(_rgen, -9223372036854775807 - 1))
           |    ) _xl GROUP BY $gv HAVING sum(cnt) > 0) _xf
           |  WHERE $v IS NOT NULL GROUP BY $gOnly)""".stripMargin
    }
    val xdJoins = xdBodies.map { case (c, _) =>
      val cte = xdCte(c)
      val on =
        if (xdKey.isEmpty) "TRUE"
        else xdKey.map(g => s"_fold.$g IS NOT DISTINCT FROM $cte.$g")
          .mkString(" AND ")
      s" LEFT JOIN $cte ON $on"
    }.mkString
    val outs = (d.groupCols.map(g => s"_fold.${q(g)} AS ${q(g)}") ++
      d.outputs.map { o =>
      val e = o.kind match {
        case "cnt" => "cnt"
        case "sum" => q(spec.sumCol(o.col))
        // avg = sum / NON-NULL count, double arithmetic to match Spark;
        // an all-null group yields NULL, never a divide-by-zero
        case "avg" =>
          val nn = q(spec.cntCol(o.col))
          s"CASE WHEN $nn = 0 THEN NULL ELSE " +
            s"CAST(${q(spec.sumCol(o.col))} AS DOUBLE) / CAST($nn AS DOUBLE) END"
        case "min" => q(spec.minCol(o.col))
        case "max" => q(spec.maxCol(o.col))
        case "xdcnt" =>
          s"coalesce(${xdCte(o.col)}.${q(spec.xdCol(o.col))}, 0)"
        case k => throw new IllegalArgumentException(s"unknown MV aggregate kind $k")
      }
      s"$e AS ${q(o.alias)}"
    }).mkString(", ")
    // HAVING applies over the projected aliases, exactly like the
    // engine's read rule (MvSync.projectView) — translated to DuckDB
    // dialect first: the stored predicate is Spark-rendered expression
    // text (backtick-quoted identifiers, typed literal suffixes like
    // 1.5BD / 2L), which is not valid DuckDB SQL verbatim
    val havingSql = d.havingSql.fold("")(h => s" WHERE ${havingToDuckDb(h)}")
    // a GLOBAL (no GROUP BY) view always reads exactly ONE row in the
    // engine — the ANSI aggregate-over-empty identities when the base
    // is empty or fully retracted. Foreign engines must agree: union in
    // the identity row exactly when the fold is empty (cnt/dcnt → 0,
    // everything else NULL), BEFORE the HAVING filter, matching
    // projectView's order
    val projected = s"SELECT $outs FROM _fold$xdJoins"
    val withIdentity =
      if (d.groupCols.nonEmpty) projected
      else {
        val ids = d.outputs.map { o =>
          val v = o.kind match {
            case "cnt" | "dcnt" | "xdcnt" => "CAST(0 AS BIGINT)"
            case _ => "NULL"
          }
          s"$v AS ${q(o.alias)}"
        }.mkString(", ")
        s"""$projected
           |  UNION ALL
           |  SELECT $ids WHERE NOT EXISTS (SELECT 1 FROM _fold)""".stripMargin
      }
    val xdWith = xdCtes.map(c => s",\n$c").mkString
    s"""WITH _raw AS (
       |$rawBody),
       |_rg AS (
       |  SELECT *, max(CASE WHEN is_reset THEN gen END)
       |    OVER (PARTITION BY $gCols) AS _rgen
       |  FROM _raw),
       |_live AS (
       |  SELECT * FROM _rg
       |  WHERE (is_reset AND gen = _rgen)
       |     OR ((NOT is_reset) AND gen > coalesce(_rgen, -9223372036854775807 - 1))),
       |_fold AS (
       |  SELECT $gCols, $folds FROM _live
       |  GROUP BY $gCols HAVING sum(cnt) > 0)$xdWith
       |SELECT * FROM ($withIdentity) _v$havingSql""".stripMargin
  }

  /** Translate a Spark-rendered predicate (`Expression.sql` output) to
    * DuckDB dialect: backtick-quoted identifiers become double-quoted
    * (`` `a``b` `` → `"a``b"`… i.e. doubled backticks un-escape, inner
    * double quotes re-escape), and the typed numeric literal suffixes
    * Spark renders (`1.5BD` decimal, `1.5D` double, `2L` bigint, `2S`
    * smallint, `2Y` tinyint, with optional exponent) are stripped —
    * DuckDB types bare literals compatibly for comparison predicates.
    * The scan is quote-aware: nothing inside a single-quoted string is
    * touched. Anything that still looks non-portable afterwards — an
    * unbalanced backtick, a function spelling outside the known-portable
    * set, a CAST target type DuckDB does not share — refuses loudly at
    * WRITE time ([[validatePortable]]), matching the HLL-state refusal
    * pattern: an export that only breaks when a foreign engine executes
    * it is worse than no export. */
  private[graft] def havingToDuckDb(h: String): String = {
    val out = new StringBuilder(h.length)
    var i = 0
    val n = h.length
    while (i < n) {
      h.charAt(i) match {
        case '\'' => // string literal: copy verbatim incl. '' escapes
          out.append('\'')
          i += 1
          var closed = false
          while (i < n && !closed) {
            val c = h.charAt(i)
            out.append(c)
            if (c == '\'') {
              if (i + 1 < n && h.charAt(i + 1) == '\'') { out.append('\''); i += 1 }
              else closed = true
            }
            i += 1
          }
          if (!closed) throw new UnsupportedOperationException(
            s"cannot export HAVING predicate to DuckDB (unterminated string): $h")
        case '`' => // identifier: `a``b` → "a`b" → re-quote for DuckDB
          i += 1
          val ident = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val c = h.charAt(i)
            if (c == '`') {
              if (i + 1 < n && h.charAt(i + 1) == '`') { ident.append('`'); i += 1 }
              else closed = true
            } else ident.append(c)
            i += 1
          }
          if (!closed) throw new UnsupportedOperationException(
            s"cannot export HAVING predicate to DuckDB (unbalanced backtick): $h")
          out.append('"').append(ident.toString.replace("\"", "\"\"")).append('"')
        case c if c.isDigit &&
            (i == 0 || !h.charAt(i - 1).isLetterOrDigit && h.charAt(i - 1) != '_') =>
          // numeric literal: digits [.digits] [E[+-]digits] [suffix]
          val start = i
          while (i < n && h.charAt(i).isDigit) i += 1
          if (i < n && h.charAt(i) == '.') {
            i += 1
            while (i < n && h.charAt(i).isDigit) i += 1
          }
          if (i < n && (h.charAt(i) == 'E' || h.charAt(i) == 'e') &&
              i + 1 < n && (h.charAt(i + 1).isDigit ||
                ((h.charAt(i + 1) == '+' || h.charAt(i + 1) == '-') &&
                  i + 2 < n && h.charAt(i + 2).isDigit))) {
            i += 1
            if (h.charAt(i) == '+' || h.charAt(i) == '-') i += 1
            while (i < n && h.charAt(i).isDigit) i += 1
          }
          out.append(h.substring(start, i))
          // strip a Spark type suffix iff it ends the token
          val suffix =
            if (h.regionMatches(true, i, "BD", 0, 2)) 2
            else if (i < n && "DLSYdlsy".indexOf(h.charAt(i)) >= 0) 1
            else 0
          val after = i + suffix
          if (suffix > 0 &&
              (after >= n || (!h.charAt(after).isLetterOrDigit && h.charAt(after) != '_')))
            i = after // drop it
        case c =>
          out.append(c)
          i += 1
      }
    }
    val translated = out.toString
    validatePortable(translated, h)
    translated
  }

  /** Refuse-at-write guard over the TRANSLATED predicate: any function
    * spelling outside a known-portable set, or a CAST target type DuckDB
    * does not spell the same way, refuses loudly — a view.sql that only
    * fails when someone executes it in DuckDB is worse than no export
    * (same posture as the HLL-state refusal). Quote-aware: nothing
    * inside string literals or double-quoted identifiers is judged. */
  private def validatePortable(s: String, orig: String): Unit = {
    def refuse(what: String): Nothing = throw new UnsupportedOperationException(
      s"cannot export HAVING predicate to DuckDB ($what) — read the view " +
        s"through the engine, or rewrite the HAVING: $orig")
    val portableFns = Set(
      "cast", "coalesce", "nullif", "abs", "round", "floor", "ceil",
      "ceiling", "upper", "lower", "length", "substring", "substr",
      "concat", "trim", "ltrim", "rtrim", "greatest", "least", "power",
      "pow", "sqrt", "exp", "ln", "log10", "mod", "sign", "left",
      "right", "replace", "contains", "starts_with", "ends_with")
    val keywords = Set("and", "or", "not", "in", "exists", "any", "all",
      "some", "case", "when", "then", "else", "end", "between", "like",
      "is", "null", "true", "false", "distinct", "from")
    val typeRe = ("(?i)^(BIGINT|INT|INTEGER|SMALLINT|TINYINT|DOUBLE|" +
      "FLOAT|REAL|BOOLEAN|DATE|TIMESTAMP|VARCHAR|STRING|TEXT|" +
      "DECIMAL(\\s*\\(\\s*\\d+\\s*,\\s*\\d+\\s*\\))?)$").r
    val n = s.length
    // matching close paren from an opener, quote-aware
    def closeOf(open: Int): Int = {
      var k = open + 1; var depth = 1
      while (k < n && depth > 0) {
        s.charAt(k) match {
          case '\'' | '"' =>
            val q = s.charAt(k); k += 1
            while (k < n && s.charAt(k) != q) k += 1
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => ()
        }
        k += 1
      }
      if (depth != 0) refuse("unbalanced parentheses") else k - 1
    }
    var i = 0
    while (i < n) {
      s.charAt(i) match {
        case '\'' | '"' =>
          val q = s.charAt(i); i += 1
          while (i < n && s.charAt(i) != q) i += 1
          i += 1 // doubled escapes read as close+reopen: fine for skipping
        case c if c.isLetter || c == '_' =>
          val st = i
          while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_'))
            i += 1
          val word = s.substring(st, i)
          var j = i
          while (j < n && s.charAt(j) == ' ') j += 1
          // a word preceded by AS is a CAST target type (possibly
          // parameterized, DECIMAL(10,2)) — judged by the cast branch,
          // never as a function call
          val afterAs = {
            var p = st - 1
            while (p >= 0 && s.charAt(p) == ' ') p -= 1
            p >= 1 && s.regionMatches(true, p - 1, "AS", 0, 2) &&
              (p - 2 < 0 || !s.charAt(p - 2).isLetterOrDigit)
          }
          if (j < n && s.charAt(j) == '(' && !afterAs &&
              !keywords.contains(word.toLowerCase)) {
            val f = word.toLowerCase
            if (!portableFns(f))
              refuse(s"function `$word` has no known portable spelling")
            if (f == "cast") {
              val close = closeOf(j)
              val body = s.substring(j + 1, close)
              // the LAST top-level " AS " names the target type
              var last = -1; var depth = 0; var m = 0
              while (m < body.length) {
                body.charAt(m) match {
                  case '\'' | '"' =>
                    val q = body.charAt(m); m += 1
                    while (m < body.length && body.charAt(m) != q) m += 1
                  case '(' => depth += 1
                  case ')' => depth -= 1
                  case _ => ()
                }
                if (depth == 0 && m + 4 <= body.length &&
                    body.regionMatches(true, m, " AS ", 0, 4)) last = m
                m += 1
              }
              if (last < 0) refuse("CAST without AS")
              val tpe = body.substring(last + 4).trim
              if (!typeRe.pattern.matcher(tpe).matches())
                refuse(s"CAST target type `$tpe` is not portable to DuckDB")
            }
          }
        case _ => i += 1
      }
    }
  }

  /** Write [[duckDbViewSql]] to `<dest>`. Returns the SQL. */
  def writeDuckDbView(
      table: IceTable, dest: String, viewName: String,
      maxTs: Long = Long.MaxValue): String = {
    val sql = duckDbViewSql(table, viewName, maxTs)
    val p = new Path(dest)
    val fs = p.getFileSystem(table.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(sql.getBytes(StandardCharsets.UTF_8)) finally out.close()
    sql
  }

  /** Parse a manifest written by [[writeManifest]]: (schema pairs,
    * absolute data paths, absolute delete-file paths). */
  def readManifest(table: IceTable, src: String)
      : (Map[String, String], Seq[String], Seq[String]) = {
    val p = new Path(src)
    val fs = p.getFileSystem(table.spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    val m = Json.parseObject(body.linesIterator.next())
    val schema = m("schema") match {
      case sm: scala.collection.Map[_, _] =>
        sm.map { case (k, v) => k.toString -> v.toString }.toMap
      case _ => Map.empty[String, String]
    }
    val files = m("files") match {
      case fseq: scala.collection.Seq[_] => fseq.collect {
        case fm: scala.collection.Map[_, _] =>
          fm.asInstanceOf[scala.collection.Map[String, Any]]("absolute").toString
      }.toSeq
      case _ => Seq.empty
    }
    val dels = m("delete_files") match {
      case dseq: scala.collection.Seq[_] => dseq.map(_.toString).toSeq
      case _ => Seq.empty
    }
    (schema, files, dels)
  }

  /** DuckDB/localfs-friendly form of a `file:` URI (foreign engines want
    * plain paths for local files; non-file schemes pass through). */
  private def stripScheme(uri: String): String =
    if (uri.startsWith("file:")) uri.stripPrefix("file:") else uri
}
