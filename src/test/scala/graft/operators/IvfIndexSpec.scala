package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persistent IVF index over the ice table format: build → search recall,
  * probe-time partition pruning straight from the log, incremental append
  * as one atomic insert into existing list partitions. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .selectExpr("vec_id", "cast(embedding as array<double>) as embedding")
    .cache()

  test("build + search reaches >=60% recall@10 of brute force") {
    val queries = embeddings.limit(5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val index = IvfIndex.build(spark, embeddings, "vec_id", "embedding",
      tmpDir("ivfidx"), nlist = 8, lloydIterations = 2, dim = 64)
    val exact = Similarity.bruteForceTopK(
      embeddings, "vec_id", "embedding", queries, "qid", "qvec", k = 10)
    val approx = IvfIndex.search(index, queries, "qid", "qvec",
      k = 10, nprobe = 5, dim = 64)
    val e = exact.select("qid", "id").as[(Long, Long)].collect().toSet
    val a = approx.select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (e intersect a).size.toDouble / e.size
    assert(recall >= 0.6, s"persistent-IVF recall@10 = $recall")
    // identical training → identical results to the transient ivfTopK
    val transient = Similarity.ivfTopK(embeddings, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10, nlist = 8, nprobe = 5, dim = 64)
    assert(transient.select("qid", "id").as[(Long, Long)].collect().toSet == a)
  }

  test("search reads only the probed lists' files — pruned from the log") {
    val index = IvfIndex.build(spark, embeddings, "vec_id", "embedding",
      tmpDir("ivfidx_prune"), nlist = 8, lloydIterations = 1, dim = 64)
    val snap = index.snapshot()
    val dataFiles = snap.aliveFiles
      .filter(m => index.partitionOf(m.path).startsWith("r=d"))
    assert(dataFiles.length == 8) // one file per list after one commit
    // probing 2 of 8 lists must resolve exactly those lists' files, from
    // log metadata alone (this is A18 partition pruning wearing ANN hats)
    val probed = IvfIndex.probedDataFiles(index, snap, Set(0, 3))
    assert(probed.length == 2)
    assert(probed.map(m => index.partitionOf(m.path)).toSet ==
      Set("r=d/cid=0", "r=d/cid=3"))
  }

  test("append assigns to existing centroids in one atomic commit; new row findable") {
    val index = IvfIndex.build(spark, embeddings, "vec_id", "embedding",
      tmpDir("ivfidx_app"), nlist = 8, lloydIterations = 2, dim = 64)
    val logsBefore = index.snapshot().logFiles.length
    val partsBefore = index.snapshot().aliveFiles
      .map(m => index.partitionOf(m.path)).toSet

    // append a copy of vector 0 under a fresh id
    val newRow = embeddings.where($"vec_id" === 0L)
      .select(lit(999999L).as("vec_id"), $"embedding")
    IvfIndex.append(index, newRow, "vec_id", "embedding", dim = 64)

    val after = index.snapshot()
    assert(after.logFiles.length == logsBefore + 1) // ONE atomic commit
    // no new partitions: the row joined an existing inverted list
    assert(after.aliveFiles.map(m => index.partitionOf(m.path)).toSet ==
      partsBefore)

    // searching with vector 0 as the query finds its appended twin first
    // (sim ~= 1; the query's own id is excluded by the self-guard)
    val q = embeddings.where($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val top = IvfIndex.search(index, q, "qid", "qvec",
      k = 3, nprobe = 3, dim = 64)
      .orderBy($"rank").select("id").as[Long].collect()
    assert(top.head == 999999L, s"expected appended twin first, got ${top.toSeq}")
  }

  test("syncFromFeed: native upsert/deleteKeys follow the corpus table's DML") {
    import graft.ice.{DeleteVectors, IceTable, IceTableConfig}
    val src = new IceTable(spark, tmpDir("ivfsync_src"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("vec_id"), lit(4))),
      sortOrder = Seq("vec_id")))
    src.insert(embeddings)
    val root = tmpDir("ivfsync_idx")
    val (index, built, _) = IvfIndex.syncFromFeed(src, root,
      "vec_id", "embedding", nlist = 8, lloydIterations = 2, dim = 64)
    assert(built === embeddings.count())

    // probe = vector 0's twin: finds vec 0 before the mutations
    val q0 = embeddings.where($"vec_id" === 0L)
      .select(lit(7000L).as("qid"), $"embedding".as("qvec"))
    def topIds(q: org.apache.spark.sql.DataFrame) =
      IvfIndex.search(index, q, "qid", "qvec", k = 5, nprobe = 8, dim = 64)
        .orderBy($"rank").select("id").as[Long].collect().toSeq
    assert(topIds(q0).head === 0L)

    // DML: vec 0's embedding REPLACED by vec 1's negation (moves across
    // space), vec 2 MoR-deleted, a twin of vec 3 appended
    val neg1 = embeddings.where($"vec_id" === 1L)
      .select(transform($"embedding", x => -x).as("e")).head.getSeq[Double](0)
    src.updateWhere($"vec_id" === 0L,
      Seq("embedding" -> typedLit(neg1)))
    DeleteVectors.deleteWhere(src, $"vec_id" === 2L)
    src.insert(embeddings.where($"vec_id" === 3L)
      .select(lit(888888L).as("vec_id"), $"embedding"))
    Thread.sleep(3)
    val (_, ups, dels) = IvfIndex.syncFromFeed(src, root,
      "vec_id", "embedding", nlist = 8, lloydIterations = 2, dim = 64)
    assert(ups === 2L && dels === 1L)

    // deleted vector is gone from results entirely
    val q2 = embeddings.where($"vec_id" === 2L)
      .select(lit(7002L).as("qid"), $"embedding".as("qvec"))
    assert(!topIds(q2).contains(2L))
    // vec 0 moved: its OLD location no longer returns it...
    assert(topIds(q0).head != 0L)
    // ...and its NEW location (≈ -vec1) does
    val qNeg = Seq((7001L, neg1)).toDF("qid", "qvec")
    assert(topIds(qNeg).head === 0L)
    // the appended twin of vec 3 ranks at/above its source
    val q3 = embeddings.where($"vec_id" === 3L)
      .select(lit(7003L).as("qid"), $"embedding".as("qvec"))
    assert(topIds(q3).take(2).toSet === Set(3L, 888888L))

    // idle sync commits nothing
    val logs = index.logio.currentLogFiles(index.root).size
    val (_, u2, d2) = IvfIndex.syncFromFeed(src, root,
      "vec_id", "embedding", nlist = 8, lloydIterations = 2, dim = 64)
    assert(u2 === 0L && d2 === 0L)
    assert(index.logio.currentLogFiles(index.root).size === logs)
  }

  test("syncFromFeed bootstraps late when the init build saw an empty corpus") {
    import graft.ice.{IceTable, IceTableConfig}
    // source table EXISTS but has no commits when the index first syncs —
    // the empty-table bootstrap (or the same-ms init race). The watermark
    // commits with zero centroids; the next window must self-heal by
    // training on its own inserts, not wedge forever.
    val src = new IceTable(spark, tmpDir("ivfboot_src"), IceTableConfig(
      partitionExpr = concat(lit("p="), pmod(col("vec_id"), lit(4))),
      sortOrder = Seq("vec_id")))
    val root = tmpDir("ivfboot_idx")
    val (index, built0, _) = IvfIndex.syncFromFeed(src, root,
      "vec_id", "embedding", nlist = 8, lloydIterations = 2, dim = 64)
    assert(built0 === 0L)

    src.insert(embeddings)
    Thread.sleep(3)
    val (_, ups, dels) = IvfIndex.syncFromFeed(src, root,
      "vec_id", "embedding", nlist = 8, lloydIterations = 2, dim = 64)
    assert(ups === embeddings.count() && dels === 0L)
    // centroids exist now and the index answers
    assert(index.snapshot().aliveFiles.exists(m =>
      index.partitionOf(m.path).startsWith("r=c")))
    val q0 = embeddings.where($"vec_id" === 0L)
      .select(lit(9000L).as("qid"), $"embedding".as("qvec"))
    val top = IvfIndex.search(index, q0, "qid", "qvec",
      k = 5, nprobe = 8, dim = 64)
      .orderBy($"rank").select("id").as[Long].collect().toSeq
    assert(top.head === 0L)
  }
}
