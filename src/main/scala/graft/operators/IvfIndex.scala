package graft.operators

import graft.ice.{IceSnapshot, IceTable, IceTableConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF (inverted-file) ANN index stored IN the table format —
  * the train-once / serve-many counterpart of [[Similarity.ivfTopK]]
  * (which retrains its coarse quantizer on every call: right for one-shot
  * analysis, wrong for a 100 TB corpus that answers queries all day).
  *
  * Layout: one ice table whose PARTITION IS THE INVERTED LIST —
  * `r=d/cid=<k>` holds the (id, vec) rows assigned to centroid k,
  * `r=c/cid=<k>` holds centroid k itself. That turns every piece of ANN
  * index maintenance into a table-format operation the engine already
  * has:
  *
  *  - **probe = partition pruning**: a search reads only the probed
  *    lists' files, resolved from the transaction log alone (A18 —
  *    zero file listings, zero footer reads for the skipped lists);
  *  - **incremental adds = insert**: [[append]] assigns new vectors to
  *    the EXISTING centroids and commits one atomic insert into their
  *    list partitions — no retrain, readers see the index grow
  *    atomically (MVCC), and time travel serves the pre-append index;
  *  - **small-file hygiene = compaction**: many appends fragment a list
  *    into many files; the ordinary `merge`/`optimize` policy coalesces
  *    them per partition without touching the index semantics.
  *
  * Reference analog: the reference delegates similarity work entirely to
  * external engines over its tables (README.md:28-31); this closes that
  * gap natively, reusing [[Similarity]]'s training/probing/scoring ops.
  */
object IvfIndex {

  private val DataPart = "r=d"
  private val CentroidPart = "r=c"

  private def indexTable(spark: SparkSession, root: String): IceTable =
    new IceTable(spark, root, IceTableConfig(
      partitionExpr = concat(lit("r="), col("role"), lit("/cid="), col("cid")),
      sortOrder = Seq("id")))

  /** Train centroids on the corpus and materialize the index: one atomic
    * commit of nlist data partitions + nlist centroid partitions.
    *
    * @param corpus (idCol, vecCol) rows; vecCol is array<double-castable>
    * @return the index table handle (reopen later with [[open]])
    */
  def build(
      spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      root: String, nlist: Int = 16, lloydIterations: Int = 2,
      dim: Int = 0): IceTable = {
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("_v"))
    val centroids = Similarity.trainCentroids(c, nlist, lloydIterations, dim)
    val assigned = Similarity.nearestCid(c, centroids, dim)
      .select(col("id"), col("_v").as("vec"), col("cid").cast("int").as("cid"),
        lit("d").as("role"))
    val centroidRows = centroids
      .select(col("cid").cast("long").as("id"), col("_c").as("vec"),
        col("cid").cast("int").as("cid"), lit("c").as("role"))
    val t = indexTable(spark, root)
    t.insert(assigned.unionByName(centroidRows))
    t
  }

  /** Reopen an existing index table. */
  def open(spark: SparkSession, root: String): IceTable =
    indexTable(spark, root)

  /** Incremental add: assign new vectors to the EXISTING centroids (no
    * retrain — the IVF contract) and commit one atomic insert into their
    * list partitions. Lists drift as the corpus grows; rebuild when
    * recall degrades, exactly like any IVF deployment. */
  def append(
      index: IceTable, rows: DataFrame, idCol: String, vecCol: String,
      dim: Int = 0): Unit = {
    val snap = index.snapshot()
    val centroids = loadCentroids(index, snap)
    val c = rows.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("_v"))
    val assigned = Similarity.nearestCid(c, centroids, dim)
      .select(col("id"), col("_v").as("vec"), col("cid").cast("int").as("cid"),
        lit("d").as("role"))
    index.insert(assigned)
  }

  /** Keep the IVF index CURRENT as its corpus table mutates — the ANN
    * member of the feed-sync trilogy ([[TextIndex.syncFromFeed]],
    * [[SigIndex.syncFromFeed]]), and the SIMPLEST: the index is ONE ice
    * table whose rows are keyed by (id, role), so updates and deletes
    * are the engine's own native [[IceTable.upsert]]/[[
    * IceTable.deleteKeys]] — no generation markers, no query-side kill
    * rule; [[search]] just reads the current snapshot.
    *
    * Per window (CdcApply's collapse): ONE final change per id — the
    * latest insert image re-assigns the vector to the EXISTING centroids
    * and upserts (the old row leaves whatever list partition it lived
    * in, the new one routes to its list), a final delete removes the
    * row. Centroids never retrain on sync (the IVF contract — rebuild
    * when recall degrades).
    *
    * Effectively-once: the initial build pins its bound first and
    * commits as ONE `insertBatch` (training is deterministic, so a
    * crash-replayed build is byte-identical and skips); incremental
    * windows are idempotent upsert/deleteKeys with the watermark mark
    * committed last. Scale note: the upsert/delete probe is a
    * column-pruned (key columns + metadata only) scan of the index —
    * bounded rewrites, but a very hot sync cadence on a huge index
    * would motivate an id→cid lookup side table.
    *
    * Returns (index, vectors upserted, vectors deleted). */
  def syncFromFeed(source: IceTable, indexRoot: String,
      idCol: String, vecCol: String,
      nlist: Int = 16, lloydIterations: Int = 2, dim: Int = 0,
      replicaId: String = "default"): (IceTable, Long, Long) = {
    import graft.ice.{CdcApply, ChangeFeed}
    import org.apache.spark.sql.expressions.Window
    val spark = source.spark
    val index = indexTable(spark, indexRoot)
    val key = s"_ivf_sync:$replicaId"
    CdcApply.readMark(index, key) match {
      case None =>
        val until = CdcApply.readMark(index, s"$key:init").getOrElse {
          val u = ChangeFeed.settledNow(source)
          CdcApply.commitMark(index, s"$key:init", u)
          u
        }
        val n = source.trySnapshot(until + 1) match {
          case None => CdcApply.commitMark(index, key, until); 0L
          case Some(_) =>
            val c = source.read(until + 1).select(col(idCol).as("id"),
              col(vecCol).cast("array<double>").as("_v")).localCheckpoint()
            val centroids = Similarity.trainCentroids(c, nlist, lloydIterations, dim)
            val assigned = Similarity.nearestCid(c, centroids, dim)
              .select(col("id"), col("_v").as("vec"),
                col("cid").cast("int").as("cid"), lit("d").as("role"))
            val centroidRows = centroids
              .select(col("cid").cast("long").as("id"), col("_c").as("vec"),
                col("cid").cast("int").as("cid"), lit("c").as("role"))
            index.insertBatch(assigned.unionByName(centroidRows), key, until)
            c.count()
        }
        (index, n, 0L)
      case Some(wm) =>
        val (feed, until) = ChangeFeed.betweenSettled(source, wm)
        val pri = when(col(ChangeFeed.ChangeTypeCol) === "insert", 1).otherwise(0)
        val w = Window.partitionBy(col(idCol))
          .orderBy(col(ChangeFeed.CommitTsCol).desc, pri.desc)
        val finals = feed.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
          .localCheckpoint()
        val nIns = finals.where(col(ChangeFeed.ChangeTypeCol) === "insert").count()
        val nDel = finals.where(col(ChangeFeed.ChangeTypeCol) === "delete").count()
        if (nIns == 0 && nDel == 0) return (index, 0L, 0L) // idle: no commits
        val deleted =
          if (nDel == 0) 0L
          else index.deleteKeys(
            finals.where(col(ChangeFeed.ChangeTypeCol) === "delete")
              .select(col(idCol).as("id"), lit("d").as("role")),
            Seq("id", "role"))
        val upserted =
          if (nIns == 0) 0L
          else {
            val snap = index.snapshot()
            val c = finals.where(col(ChangeFeed.ChangeTypeCol) === "insert")
              .select(col(idCol).as("id"),
                col(vecCol).cast("array<double>").as("_v"))
            val hasCentroids = snap.aliveFiles.exists(m =>
              index.partitionOf(m.path).startsWith(CentroidPart))
            // Late bootstrap: the initial build ran over an EMPTY corpus
            // (table created after the index, or the same-ms race where
            // the init bound settled before the first commit became
            // visible) and committed only the watermark. Everything live
            // is then inside this window's collapsed inserts, so training
            // on them IS the full build. Centroids commit FIRST: a crash
            // before the vector upsert replays this window, finds them,
            // and takes the ordinary path (training is deterministic, so
            // the replayed assignment matches).
            val centroids =
              if (hasCentroids) loadCentroids(index, snap)
              else {
                val trained =
                  Similarity.trainCentroids(c, nlist, lloydIterations, dim)
                index.insert(trained.select(
                  col("cid").cast("long").as("id"), col("_c").as("vec"),
                  col("cid").cast("int").as("cid"), lit("c").as("role")))
                trained
              }
            val assigned = Similarity.nearestCid(c, centroids, dim)
              .select(col("id"), col("_v").as("vec"),
                col("cid").cast("int").as("cid"), lit("d").as("role"))
            index.upsert(assigned, Seq("id", "role"))._2
          }
        CdcApply.commitMark(index, key, until)
        (index, upserted, deleted)
    }
  }

  private def loadCentroids(index: IceTable, snap: IceSnapshot): DataFrame = {
    val files = snap.aliveFiles.filter(m =>
      index.partitionOf(m.path).startsWith(CentroidPart))
    index.readFiles(snap, files).select(col("cid"), col("vec").as("_c"))
  }

  /** The file markers a search with these probes would read — exposed for
    * plan audits: the pruning is log-metadata-only. */
  private[operators] def probedDataFiles(
      index: IceTable, snap: IceSnapshot, cids: Set[Int]): Seq[graft.ice.FileMarker] =
    snap.aliveFiles.filter { m =>
      val p = index.partitionOf(m.path)
      p.startsWith(DataPart) &&
        cids.contains(p.stripPrefix(s"$DataPart/cid=").toInt)
    }

  /** ANN search against the persisted index: probe the nprobe nearest
    * lists per query, read ONLY those partitions' files (pruned from the
    * log — the skipped lists cost nothing, not even a listing), score
    * exactly, return per-query top-k as (qid, id, sim, rank). */
  def search(
      index: IceTable, queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10, nprobe: Int = 4, dim: Int = 0): DataFrame = {
    val snap = index.snapshot()
    val centroids = loadCentroids(index, snap)
    val q = queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("_q"))
    val probes = Similarity.probeCids(q, centroids, nprobe, dim)
    // probed cids to the driver: nprobe × |queries| ints — metadata-scale
    val cids = probes.select("cid").distinct()
      .collect().map(_.getInt(0)).toSet
    val lists = index.readFiles(snap, probedDataFiles(index, snap, cids))
      .select(col("id"), col("vec").as("_v"), col("cid"))
    Similarity.scoreLists(lists, probes, k, dim)
  }
}
