package graft.plans

import graft.ice.{FileMarker, IceSnapshot, IceTable}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{NumericType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A Catalyst [[FileIndex]] backed by an ice snapshot: the table becomes a
  * first-class catalog relation whose Hive-style partition keys (parsed
  * from `_data/{k=v/...}/uuid.parquet` marker paths) are *real queryable
  * columns*, and `WHERE` clauses on them prune files inside the optimizer
  * (`PartitionFilters` in the plan) — no files are even listed for pruned
  * partitions. This is the catalog-integrated complement to
  * `IceTable.readPartitionRange` (A18) and subsumes the reference's
  * `get_files` UDF / parameterized-view integrations
  * (ch/user_scripts/main.go:44-73, examples/segment-webhook-sink.py:84-90 —
  * B21/B22): instead of splicing file lists into SQL text, the resolver IS
  * the table.
  *
  * The snapshot is pinned at construction — MVCC isolation holds for the
  * lifetime of the DataFrame, exactly like the explicit-file-list path.
  */
final class IceFileIndex(
    spark: SparkSession,
    val table: IceTable,
    val snap: IceSnapshot,
    val partitionSchema: StructType) extends FileIndex {

  /** partition string → (values row, markers + file statuses), built once
    * driver-side from the marker list (metadata-scale: no FS listing). */
  private lazy val partitions: Seq[(InternalRow, Seq[(FileMarker, FileStatus)])] = {
    snap.aliveFiles
      .groupBy(m => table.partitionOf(m.path))
      .toSeq.sortBy(_._1)
      .map { case (part, markers) =>
        val kv = IceTable.partitionKvOf(part) // THE shared k=v semantics
        val row = InternalRow.fromSeq(partitionSchema.map(f =>
          UTF8String.fromString(kv.getOrElse(f.name, ""))))
        // sizes come from the log markers — no S3 HEAD/LIST needed.
        // Paths are FS-QUALIFIED (scheme + authority) so `_metadata
        // .file_path` carries the same prefix as every other scan — the
        // deletion-vector overlay strips `table.qualifiedRoot` off it
        val files = markers.map(m => m -> new FileStatus(
          m.fileBytes, false, 1, 128L * 1024 * 1024, m.createdMs,
          new Path(table.qualifiedRoot + "/" + m.path)))
        (row, files)
      }
  }

  // ------------------------------------------------- stats-based skipping
  //
  // The optimizer hands listFiles the non-partition conjuncts as
  // dataFilters; when the table records log-side [min, max] stats for a
  // column, simple comparisons against it turn into a conservative
  // [lo, hi] window and files whose stats interval cannot intersect it are
  // never listed — the SQL-path twin of IceTable.readStatsRange, still
  // with zero plan-time object-store reads.

  private val statsCols: Seq[String] =
    (table.cfg.statsColumn.toSeq ++ table.cfg.statsColumns).distinct
  private val statsNumeric: Map[String, Boolean] = {
    val types = snap.schema.pairs.toMap
    statsCols.map(c =>
      c -> types.get(c).exists(IceTable.statsTypeIsNumeric)).toMap
  }

  /** Conservative per-column [lo, hi] windows for every stats column, from
    * conjunctive comparison filters; anything unrecognized just widens.
    *
    * A comparison only qualifies when it is against the bare attribute, or
    * against a numeric→numeric cast of it on a numeric stats column (the
    * widening casts Spark inserts for type coercion — order-preserving, and
    * the cast literal still compares correctly as BigDecimal against the
    * raw stats). Any other cast (e.g. a string column implicitly cast to
    * DOUBLE by `WHERE k > 5`) moves the literal into a different ordering
    * domain than the recorded stats, so pruning on it would be wrong —
    * those filters are ignored. */
  private def statsWindows(
      dataFilters: Seq[Expression]): Map[String, (Option[String], Option[String])] = {
    if (statsCols.isEmpty) return Map.empty
    def colOf(e: Expression): Option[String] = e match {
      case a: Attribute if statsNumeric.contains(a.name) => Some(a.name)
      case Cast(child, dt, _, _)
          if dt.isInstanceOf[NumericType] &&
            child.dataType.isInstanceOf[NumericType] =>
        colOf(child).filter(statsNumeric(_)) // numeric→numeric widening only
      case _ => None
    }
    def litStr(l: Literal): Option[String] =
      Option(l.value).map(_.toString)
    val lo = scala.collection.mutable.Map.empty[String, String]
    val hi = scala.collection.mutable.Map.empty[String, String]
    // an unparseable comparison keeps the current bound (wider window = safe)
    def tightenLo(c: String, v: String): Unit =
      lo(c) = lo.get(c).fold(v)(cur =>
        if (IceTable.statsTryCmp(statsNumeric(c), v, cur).exists(_ > 0)) v else cur)
    def tightenHi(c: String, v: String): Unit =
      hi(c) = hi.get(c).fold(v)(cur =>
        if (IceTable.statsTryCmp(statsNumeric(c), v, cur).exists(_ < 0)) v else cur)
    // [min, max] cover of a value set. EVERY value must parse under the
    // column's comparator (an unparseable element would make the reduce
    // pick an arbitrary endpoint and tighten WRONGLY — a false skip);
    // string columns always compare, numeric columns via BigDecimal.
    // Empty or partly-unparseable sets tighten nothing (safe).
    def tightenToCover(c: String, vals: Seq[String]): Unit = {
      val isNum = statsNumeric(c)
      if (vals.nonEmpty &&
          vals.forall(v => IceTable.statsTryCmp(isNum, v, v).isDefined)) {
        val mn = vals.reduce((x, y) =>
          if (IceTable.statsTryCmp(isNum, y, x).exists(_ < 0)) y else x)
        val mx = vals.reduce((x, y) =>
          if (IceTable.statsTryCmp(isNum, y, x).exists(_ > 0)) y else x)
        tightenLo(c, mn); tightenHi(c, mx)
      }
    }
    dataFilters.foreach {
      case GreaterThanOrEqual(a, l: Literal) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenLo(c, _)))
      case GreaterThan(a, l: Literal) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenLo(c, _)))
      case LessThanOrEqual(a, l: Literal) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenHi(c, _)))
      case LessThan(a, l: Literal) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenHi(c, _)))
      case EqualTo(a, l: Literal) if colOf(a).isDefined =>
        colOf(a).foreach(c =>
          litStr(l).foreach { v => tightenLo(c, v); tightenHi(c, v) })
      case GreaterThanOrEqual(l: Literal, a) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenHi(c, _)))
      case GreaterThan(l: Literal, a) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenHi(c, _)))
      case LessThanOrEqual(l: Literal, a) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenLo(c, _)))
      case LessThan(l: Literal, a) =>
        colOf(a).foreach(c => litStr(l).foreach(tightenLo(c, _)))
      case EqualTo(l: Literal, a) if colOf(a).isDefined =>
        colOf(a).foreach(c =>
          litStr(l).foreach { v => tightenLo(c, v); tightenHi(c, v) })
      // IN-lists (the dim-change probes, any isin pushdown): a SOUND
      // interval cover — [min, max] of the list's non-null values. A
      // matching row must equal one of those values, so it lies inside
      // the cover; null list entries match nothing and drop out. On a
      // key-clustered layout a small IN prunes to the few files whose
      // stats window intersects the list's span
      case org.apache.spark.sql.catalyst.expressions.In(a, list)
          if colOf(a).isDefined && list.nonEmpty &&
            list.forall(_.isInstanceOf[Literal]) =>
        val c = colOf(a).get
        tightenToCover(c,
          list.collect { case l: Literal => litStr(l) }.flatten)
      case s: org.apache.spark.sql.catalyst.expressions.InSet
          if colOf(s.child).isDefined =>
        val c = colOf(s.child).get
        tightenToCover(c, s.hset.toSeq.collect {
          case v if v != null => v.toString })
      case _ => ()
    }
    (lo.keySet ++ hi.keySet).map(c => c -> (lo.get(c), hi.get(c))).toMap
  }

  private def statsKeep(
      m: FileMarker,
      windows: Map[String, (Option[String], Option[String])]): Boolean =
    windows.forall { case (c, (lo, hi)) =>
      table.markerStats(m, c).forall { case (mn, mx) =>
        IceTable.statsIntersects(statsNumeric(c), mn, mx, lo, hi)
      }
    }

  override def rootPaths: Seq[Path] = Seq(new Path(table.root))

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pruned = if (partitionFilters.isEmpty) partitions else {
      val attrs = partitionSchema.zipWithIndex.map { case (f, i) =>
        f.name -> BoundReference(i, f.dataType, nullable = true)
      }.toMap
      val bound = partitionFilters.map(_.transform {
        case a: Attribute => attrs(a.name)
      })
      val predicate = Predicate.create(bound.reduce(
        org.apache.spark.sql.catalyst.expressions.And))
      partitions.filter { case (row, _) => predicate.eval(row) }
    }
    val windows = statsWindows(dataFilters)
    pruned.map { case (row, files) =>
      val kept =
        if (windows.isEmpty) files
        else files.filter { case (m, _) => statsKeep(m, windows) }
      PartitionDirectory(row, kept.map(f => FileStatusWithMetadata(f._2)))
    }
  }

  override def inputFiles: Array[String] =
    snap.aliveFiles.map(m => s"${table.root}/${m.path}").toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = snap.aliveFiles.map(_.fileBytes).sum

  /** Sum of the alive files' recorded physical row counts, defined only
    * when EVERY alive marker carries one — the metadata-only `count(*)`
    * input ([[org.apache.spark.sql.graft.MetadataOnlyCount]]). A single
    * rc-less file (reference-written log, pre-field history) disables
    * the fast path rather than corrupting it; an empty snapshot is a
    * legitimate zero. */
  def metadataRowCount: Option[Long] = {
    val fs = snap.aliveFiles
    if (fs.forall(_.rowCount.isDefined)) Some(fs.iterator.flatMap(_.rowCount).sum)
    else None
  }

  /** Numeric-compared (min, max) of `colName` across the alive files'
    * footer stats markers, defined iff EVERY alive file records stats for
    * that column (a file whose rows are all-null there records none —
    * blocking is the conservative, correct answer; footer min/max skip
    * nulls exactly like SQL `min`/`max`). Values returned as the stored
    * strings; the caller owns typed reconstruction. Empty snapshot →
    * None (SQL yields NULL there — let the scan say so). */
  def metadataMinMax(colName: String): Option[(String, String)] = {
    val fs = snap.aliveFiles
    if (fs.isEmpty) return None
    def statOf(m: graft.ice.FileMarker): Option[(String, String)] =
      if (table.cfg.statsColumn.contains(colName)) m.stats
      else m.multiStats.get(colName)
    val all = fs.map(statOf)
    if (all.exists(_.isEmpty)) return None
    try {
      val parsed = all.flatten.map { case (mn, mx) =>
        (BigDecimal(mn) -> mn, BigDecimal(mx) -> mx)
      }
      Some((parsed.minBy(_._1._1)._1._2, parsed.maxBy(_._2._1)._2._2))
    } catch { case _: NumberFormatException => None }
  }
}

/** Zero-listing [[FileIndex]] over an EXPLICIT marker list: the planner
  * twin of `spark.read.schema(s).parquet(paths: _*)` minus the listing.
  * DataFrameReader resolves a multi-path read through InMemoryFileIndex,
  * which above `spark.sql.sources.parallelPartitionDiscovery.threshold`
  * (default 32) paths runs a DISTRIBUTED listing job with one task per
  * path — and every one of those tasks re-deserializes the full Hadoop
  * Configuration from the task binary (gzip-per-entry: measured 15-20 ms
  * CPU per task, ~35 CPU-s ahead of a 2000-file compaction scan, an
  * 83-task job ahead of every query on the 83-partition lineitem
  * fixture). The log already records every path and exact byte size at
  * commit time (`FileMarker.fileBytes` = `getFileStatus(dest).getLen`),
  * so the listing discovers nothing — this index serves the plan straight
  * from the markers, the same trust [[IceFileIndex]] (the catalog
  * relation) has always placed in them. At object-store scale the same
  * construction replaces per-file HEAD/LIST round-trips with zero I/O.
  *
  * No partition columns: the relation's schema is exactly the passed
  * dataSchema, matching the explicit-file-list read contract
  * ([[graft.ice.IceTable.readFiles]]); partition values stay derivable
  * from the path. Deliberately NOT an [[IceFileIndex]] subclass: the
  * [[IceDvOverlay]] rule keys on that type, and explicit-list readers
  * apply deletion vectors themselves. */
final class MarkerFileIndex(
    qualifiedRoot: String,
    markers: Seq[FileMarker]) extends FileIndex {
  private lazy val dir = PartitionDirectory(InternalRow.empty,
    markers.map(m => FileStatusWithMetadata(new FileStatus(
      m.fileBytes, false, 1, 128L * 1024 * 1024, m.createdMs,
      new Path(qualifiedRoot + "/" + m.path)))))
  override def rootPaths: Seq[Path] = Seq(new Path(qualifiedRoot))
  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = Seq(dir)
  override def inputFiles: Array[String] =
    markers.map(m => s"$qualifiedRoot/${m.path}").toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = markers.map(_.fileBytes).sum
  override def partitionSchema: StructType = StructType(Nil)
}

object IceFileIndex {

  /** Partition keys present in a snapshot's marker paths, in first-seen
    * order (all typed string — the partition path is a string codec). */
  def partitionKeys(table: IceTable, snap: IceSnapshot): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    snap.aliveFiles.foreach { m =>
      table.partitionOf(m.path).split("/").foreach { seg =>
        val i = seg.indexOf('=')
        if (i > 0) seen += seg.substring(0, i)
      }
    }
    // the bucket directory level of a bucketed table is routing detail
    // (surfaced through the relation's BucketSpec), not a queryable
    // partition column — exposing it would also collide across joined
    // bucketed tables
    if (table.cfg.bucketBy.isDefined) (seen - "bkt").toSeq else seen.toSeq
  }

  /** Snapshot → the catalog-grade [[HadoopFsRelation]] (partition columns
    * queryable, optimizer-side file pruning, zero plan-time object-store
    * reads). Also the batch half of the `format("ice")` reader
    * ([[graft.streaming.IceStreamProvider]] returns it from
    * `createRelation`). */
  def relation(spark: SparkSession, table: IceTable,
      maxTs: Long = Long.MaxValue): HadoopFsRelation =
    relationFor(spark, table, table.snapshot(maxTs))

  /** [[relation]] over an already-pinned snapshot. */
  def relationFor(spark: SparkSession, table: IceTable,
      snap: IceSnapshot): HadoopFsRelation = {
    val pSchema = StructType(partitionKeys(table, snap)
      .map(StructField(_, StringType, nullable = true)))
    val index = new IceFileIndex(spark, table, snap, pSchema)
    HadoopFsRelation(
      location = index,
      partitionSchema = pSchema,
      dataSchema = snap.schema.toStructType,
      // co-located joins/aggs on the bucket columns plan WITHOUT an
      // exchange when the table is bucketed (see IceTableConfig.bucketBy)
      bucketSpec = table.bucketSpecFor(snap),
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
  }

  /** Snapshot → catalog-grade DataFrame with queryable partition columns
    * and optimizer-side file pruning. Deletion vectors are APPLIED (same
    * contract as [[graft.ice.IceTable.read]]): the SQL catalog, temp
    * views, and the DataFrame API always agree after a
    * [[graft.ice.DeleteVectors.deleteWhere]]. No-dv tables pay one
    * existence probe and keep the bare relation plan. */
  def dataFrame(spark: SparkSession, table: IceTable,
      maxTs: Long = Long.MaxValue,
      preSnap: Option[graft.ice.IceSnapshot] = None): DataFrame = {
    // preSnap: a caller that just folded the log (IceTable.openWithSnapshot
    // in the SQL resolver) passes its snapshot so resolution costs ONE
    // fold, not two — only valid for the same maxTs it was folded at
    val snap = preSnap.getOrElse(table.snapshot(maxTs))
    val rel = relationFor(spark, table, snap)
    // persisted ANALYZE statistics ride the relation as catalog plan
    // stats so CBO join reordering / broadcast decisions use analyzed
    // rowCount + ndv/min/max/nullCount (inert while cbo.enabled=false:
    // the attached sizeInBytes IS the bare relation's file-bytes sum).
    // The standard ANALYZE staleness contract applies — estimates from
    // the last analysis, exact only until the table moves. Time-traveled
    // reads get NO stats: pairing the current analysis's rowCount with an
    // as-of file set is not staleness but a cross-version contradiction
    // (a grown table would refuse to broadcast its tiny historical self).
    val df = (if (maxTs == Long.MaxValue) table.cachedStats else None) match {
      case Some(st) =>
        val types = snap.schema.toStructType.fields
          .map(f => f.name -> f.dataType).toMap
        val colStats = st.columns.flatMap { cs =>
          types.get(cs.column).map { dt =>
            // equi-height histogram (if analyzed): bin height is exactly
            // non-null rows / bins by construction, so it is recomputed
            // here rather than persisted
            val hist = cs.bins.filter(_.nonEmpty).map { bs =>
              org.apache.spark.sql.graft.StatsBridge.histogram(
                math.max(0L, st.rowCount - cs.nullCount).toDouble / bs.size,
                bs.map(b => (b.lo, b.hi, b.ndv)))
            }
            cs.column -> org.apache.spark.sql.graft.StatsBridge.columnStat(
              cs.column, dt, cs.ndv, cs.nullCount, cs.min, cs.max,
              cs.avgLen, cs.maxLen, hist)
          }
        }.toMap
        org.apache.spark.sql.graft.StatsBridge.planWithStats(
          spark, rel, new Path(table.root).getName,
          sizeInBytes = BigInt(snap.aliveFiles.map(_.fileBytes).sum),
          rowCount = Some(BigInt(st.rowCount)), colStats)
      case None => spark.baseRelationToDataFrame(rel)
    }
    // baseRelationToDataFrame analyzes EAGERLY: when the session has the
    // IceDvOverlay extension rule, the overlay is already in `df`'s
    // analyzed plan — stacking a second anti-join here would both waste a
    // join and fail analysis (the rule's projection hides `_metadata`).
    // Only sessions WITHOUT the extension need the inline overlay.
    val ruleActive = spark.sessionState.analyzer.extendedResolutionRules
      .exists(_.isInstanceOf[IceDvOverlay])
    if (ruleActive) df else overlayDeletes(table, snap, df)
  }

  /** LEFT ANTI-join `df` (a scan of `snap`'s files) against the table's
    * deletion-vector positions pinned at the same snapshot time; identity
    * when no dv table exists. The dv side is position-pair sized so AQE
    * broadcasts it on its own — and a pathological dv is still allowed to
    * sort-merge instead of OOMing. */
  private[plans] def overlayDeletes(
      table: IceTable, snap: IceSnapshot, df: DataFrame): DataFrame =
    table.dvPositions(snap.aliveFiles.map(_.path), snap.timestamp) match {
      case None => df
      case Some(del) =>
        val cols = df.columns.map(org.apache.spark.sql.functions.col).toSeq
        df.withColumn("_dv_path", table.relPathCol)
          .withColumn("_dv_row",
            org.apache.spark.sql.functions.col("_metadata.row_index"))
          .join(del, Seq("_dv_path", "_dv_row"), "left_anti")
          .select(cols: _*)
    }

  /** Register the snapshot as a temp view: `spark.sql("... FROM name WHERE
    * d = '2024-01-01'")` prunes partitions in the optimizer (B21: the
    * parameterized-view shape without SQL splicing). */
  def registerView(spark: SparkSession, table: IceTable, name: String,
      maxTs: Long = Long.MaxValue): DataFrame = {
    val df = dataFrame(spark, table, maxTs)
    df.createOrReplaceTempView(name)
    df
  }
}
