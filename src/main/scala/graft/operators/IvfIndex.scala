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
