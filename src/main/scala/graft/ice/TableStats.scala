package graft.ice

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style TABLE STATISTICS, persisted beside the log.
  *
  * One scan computes the table row count and, per requested column,
  * (ndv, null_count, min, max) — ndv via HyperLogLog++
  * (`approx_count_distinct`, the 100 TB path: one pass, no
  * per-column shuffle) or exactly on request. The result lands as ONE
  * JSON object under `{root}/{log}/_stats/{ts}_{host}.stats.json` —
  * the checkpoint pattern: a `_`-prefixed subpath the log listing
  * ignores, written atomically, latest-by-timestamp wins, surviving
  * every log rewrite because it is not part of the fold at all.
  *
  * Consumers:
  *  - `table_stats('t')` (SQL TVF) / [[read]] — one row per column;
  *  - [[IceTable.insert]]'s bloom-filter sizing: when
  *    `bloomFilterColumns` is configured without an explicit
  *    `bloomFilterNdv`, the latest analyzed ndv of the column sizes the
  *    filter (an upper bound per file — a bloom sized for more keys
  *    than a file holds only costs bits, never false negatives).
  *
  * Reference analog: none — the reference delegates planning entirely
  * to its engines; this is the `ANALYZE TABLE` surface those engines
  * have natively. */
object TableStats {

  /** avgLen/maxLen are byte lengths, tracked for string columns only
    * (fixed-width types use their Catalyst defaultSize at plan time). */
  final case class ColumnStats(
      column: String, ndv: Long, nullCount: Long,
      min: Option[String], max: Option[String],
      avgLen: Option[Long] = None, maxLen: Option[Long] = None,
      bins: Option[Seq[HistBin]] = None)
  /** One equi-height histogram bin: [lo, hi] value window with its ndv.
    * Bin height (rows per bin) is not stored — it is exactly
    * `(rowCount - nullCount) / bins.size` by construction. */
  final case class HistBin(lo: Double, hi: Double, ndv: Long)
  final case class Stats(
      analyzedAtMs: Long, rowCount: Long, exact: Boolean,
      columns: Seq[ColumnStats])

  private def statsDir(t: IceTable): Path =
    new Path(t.logio.logDir(t.root), "_stats")

  /** Compute and persist statistics over the CURRENT snapshot. Columns
    * default to every scalar column of the union schema (arrays/structs
    * and binary payloads are skipped — min/max over them is
    * meaningless). Returns the persisted stats. */
  /** `histogramColumns`: NUMERIC columns additionally get an
    * EQUI-HEIGHT histogram (CBO's selectivity input for range predicates
    * on skewed data — a uniform min/max interpolation on an exponential
    * column mis-estimates by the skew factor). Costs two extra scans,
    * exactly like Spark's own `ANALYZE`: one `percentile_approx` pass for
    * the bin endpoints, one [[org.apache.spark.sql.graft.StatsBridge
    * .ndvForIntervals]] pass for per-bin ndv. */
  def analyze(t: IceTable, columns: Seq[String] = Seq.empty,
      exact: Boolean = false, histogramColumns: Seq[String] = Seq.empty,
      histogramBins: Int = 64): Stats = {
    val df = t.read()
    val scalar = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.StructType => false
      case _: org.apache.spark.sql.types.MapType => false
      case org.apache.spark.sql.types.BinaryType => false
      case _ => true
    }).map(_.name).toSeq
    val cols =
      if (columns.isEmpty) scalar
      else {
        val missing = columns.filterNot(c =>
          df.columns.exists(_.equalsIgnoreCase(c)))
        require(missing.isEmpty,
          s"analyze: unknown column(s) ${missing.mkString(", ")}")
        columns
      }
    val stringCols = df.schema.fields.filter(
      _.dataType == org.apache.spark.sql.types.StringType).map(_.name).toSet
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"_ndv_$c"),
        // coalesce: sum over ZERO rows is SQL NULL, and an analyzed
        // snapshot can legitimately be empty (all rows dv-deleted)
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"_nul_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c")) ++
        // byte lengths for strings: CBO's row-width input (same single scan)
        (if (stringCols(c)) Seq(
          ceil(avg(octet_length(col(c)))).cast("long").as(s"_alen_$c"),
          max(octet_length(col(c))).cast("long").as(s"_mlen_$c"))
         else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // None = no non-null values — distinguishable from a legitimate
    // empty-string minimum
    def str(name: String): Option[String] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getString(i))
    }
    def lng(name: String): Option[Long] = {
      if (!row.schema.fieldNames.contains(name)) return None
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getLong(i))
    }
    // histograms: two more scans over just the requested columns
    val histByCol: Map[String, Seq[HistBin]] =
      if (histogramColumns.isEmpty) Map.empty
      else {
        require(histogramBins >= 1,
          s"analyze: histogramBins must be >= 1, got $histogramBins")
        // NUMERIC columns only: the endpoint pass casts to double (a cast
        // Spark forbids for DATE), and Catalyst's estimator reads
        // timestamp predicates in internal MICROSECONDS — a seconds-based
        // histogram would misestimate by 1e6×. Date/time histograms need
        // their own unit mapping; refuse rather than silently mislead.
        val hCols = histogramColumns.distinct
        val bad = hCols.filterNot(c => df.schema.fields.exists(f =>
          f.name.equalsIgnoreCase(c) && (f.dataType match {
            case _: org.apache.spark.sql.types.NumericType => true
            case _ => false
          })))
        require(bad.isEmpty,
          s"analyze: histogram column(s) not numeric: ${bad.mkString(", ")}")
        val unanalyzed = hCols.filterNot(h =>
          cols.exists(_.equalsIgnoreCase(h)))
        require(unanalyzed.isEmpty, "analyze: histogram column(s) not in " +
          s"the analyzed column set: ${unanalyzed.mkString(", ")}")
        val qs = (0 to histogramBins).map(_.toDouble / histogramBins)
        val pctAggs = hCols.map(c => percentile_approx(
          col(c).cast("double"), lit(qs.toArray), lit(10000)).as(s"_pct_$c"))
        val pctRow = df.agg(pctAggs.head, pctAggs.tail: _*).head()
        val endpoints: Map[String, Seq[Double]] = hCols.flatMap { c =>
          val i = pctRow.fieldIndex(s"_pct_$c")
          if (pctRow.isNullAt(i)) None // all-null column: no histogram
          else Some(c -> pctRow.getSeq[Double](i))
        }.toMap
        if (endpoints.isEmpty) Map.empty
        else {
          val hc2 = endpoints.keys.toSeq
          val ndvAggs = hc2.map(c => org.apache.spark.sql.graft.StatsBridge
            .ndvForIntervals(col(c), endpoints(c)).as(s"_indv_$c"))
          val ndvRow = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
          hc2.map { c =>
            val eps = endpoints(c)
            val ndvs = ndvRow.getSeq[Long](ndvRow.fieldIndex(s"_indv_$c"))
            c -> eps.sliding(2).toSeq.zip(ndvs).map {
              case (Seq(lo, hi), n) => HistBin(lo, hi, n)
            }
          }.toMap
        }
      }
    val stats = Stats(
      analyzedAtMs = System.currentTimeMillis(),
      rowCount = row.getLong(row.fieldIndex("_n")),
      exact = exact,
      columns = cols.map(c => ColumnStats(c,
        ndv = row.getLong(row.fieldIndex(s"_ndv_$c")),
        nullCount = row.getLong(row.fieldIndex(s"_nul_$c")),
        min = str(s"_min_$c"), max = str(s"_max_$c"),
        avgLen = lng(s"_alen_$c"), maxLen = lng(s"_mlen_$c"),
        // case-insensitive like the validation above — an exact-match
        // lookup would silently drop a case-differing histogram request
        bins = histByCol.collectFirst {
          case (k, v) if k.equalsIgnoreCase(c) => v
        })))
    write(t, stats)
    stats
  }

  private def write(t: IceTable, s: Stats): Unit = {
    val fs = t.logio.fs(t.root)
    val dir = statsDir(t)
    fs.mkdirs(dir)
    val json = Json.obj(
      "ts" -> (s.analyzedAtMs: Any),
      "rows" -> (s.rowCount: Any),
      "exact" -> (s.exact: Any),
      "cols" -> (s.columns.map(c => Map(
        "c" -> c.column, "ndv" -> c.ndv, "nul" -> c.nullCount,
        "min" -> c.min.orNull, "max" -> c.max.orNull) ++
        c.avgLen.map("alen" -> _) ++ c.maxLen.map("mlen" -> _) ++
        c.bins.map(bs => "hist" -> bs.map(b =>
          Map("l" -> b.lo, "h" -> b.hi, "n" -> b.ndv)))): Any))
    val tmp = new Path(dir, s".tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // same-ms re-analysis bumps the filename like the log appender
    var ts = s.analyzedAtMs
    var renamed = false
    var attempts = 0
    while (!renamed && attempts < 1000) {
      val dest = new Path(dir,
        s"${ts}_${IceTable.pathSafeHostname}.stats.json")
      if (!fs.exists(dest) && fs.rename(tmp, dest)) renamed = true
      else { ts += 1; attempts += 1 }
    }
    if (!renamed) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"failed to persist table stats under $dir")
    }
    // GC superseded analyses: keep the two newest (the winner plus one
    // for readers concurrently holding the previous listing) — a
    // scheduled ANALYZE would otherwise grow the directory forever
    val all = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".stats.json"))
      .map(_.getPath).sortBy(_.getName)
    all.dropRight(2).foreach(p => fs.delete(p, false))
    t.invalidateStatsCache()
  }

  /** Latest persisted stats, if the table was ever analyzed. */
  def read(t: IceTable): Option[Stats] = {
    val fs = t.logio.fs(t.root)
    val dir = statsDir(t)
    if (!fs.exists(dir)) return None
    val latest = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".stats.json"))
      .map(_.getPath).sortBy(_.getName).lastOption
    latest.map { p =>
      val in = fs.open(p)
      val raw = try {
        val b = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { b.write(buf, 0, n); n = in.read(buf) }
        b.toString("UTF-8")
      } finally in.close()
      val m = Json.parseObject(raw)
      def long(v: Any): Long = v match {
        case l: java.lang.Long => l
        case d: java.lang.Double => d.toLong
        case other => other.toString.toLong
      }
      Stats(
        analyzedAtMs = long(m("ts")),
        rowCount = long(m("rows")),
        exact = m.get("exact").contains(true),
        columns = m("cols").asInstanceOf[Seq[Any]].map { cAny =>
          val c = cAny.asInstanceOf[scala.collection.Map[String, Any]]
          def s(k: String): Option[String] =
            c.get(k).filter(_ != null).map(_.toString)
          def dbl(v: Any): Double = v match {
            case d: java.lang.Double => d
            case l: java.lang.Long => l.toDouble
            case other => other.toString.toDouble
          }
          ColumnStats(c("c").toString, long(c("ndv")), long(c("nul")),
            s("min"), s("max"),
            avgLen = c.get("alen").filter(_ != null).map(long),
            maxLen = c.get("mlen").filter(_ != null).map(long),
            bins = c.get("hist").map(_.asInstanceOf[Seq[Any]].map { bAny =>
              val b = bAny.asInstanceOf[scala.collection.Map[String, Any]]
              HistBin(dbl(b("l")), dbl(b("h")), long(b("n")))
            }.toSeq))
        }.toSeq)
    }
  }

  /** One (column, ndv, null_count, min, max) row per analyzed column,
    * plus the table row count — the `table_stats('t')` TVF body. */
  def asDataFrame(t: IceTable): DataFrame = {
    val spark = t.spark
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("ndv", LongType, nullable = false),
      StructField("null_count", LongType, nullable = false),
      StructField("min", StringType, nullable = true),
      StructField("max", StringType, nullable = true),
      StructField("row_count", LongType, nullable = false),
      StructField("analyzed_at_ms", LongType, nullable = false),
      StructField("exact", BooleanType, nullable = false),
      StructField("hist_bins", LongType, nullable = false)))
    val rows = read(t).toSeq.flatMap(s => s.columns.map(c =>
      org.apache.spark.sql.Row(c.column, c.ndv, c.nullCount,
        c.min.orNull, c.max.orNull, s.rowCount, s.analyzedAtMs, s.exact,
        c.bins.map(_.size.toLong).getOrElse(0L))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
