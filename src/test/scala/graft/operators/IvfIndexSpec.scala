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
}
