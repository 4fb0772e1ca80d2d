package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding clustering as a curation surface: assignment coherence,
  * profile arithmetic, balanced-sample cap and determinism. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .selectExpr("vec_id as id", "cast(embedding as array<double>) as _v")
    .cache()

  test("assignment covers every row once with true cosine sims") {
    val a = Cluster.assign(embeddings, "id", "_v", dim = dim).cache()
    assert(a.count() == embeddings.count())
    assert(a.select("id").distinct().count() == embeddings.count())
    assert(a.where(!$"centroid_sim".between(-1.0000001, 1.0000001)).count() == 0)
    assert(a.select("cid").distinct().count() <= 16)
    a.unpersist()
  }

  test("two well-separated blobs land in different clusters") {
    // blob A near +e0, blob B near +e1 (orthogonal): k-means with
    // nlist=2 must not mix them
    def blob(base: Int, offset: Long) = spark.range(50)
      .select(($"id" + offset).as("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          p => when(p === base, lit(10.0))
            .otherwise((rand(42 + base) - 0.5) * 0.01)).as("_v"))
    val corpus = blob(0, 0L).unionByName(blob(1, 1000L))
    val a = Cluster.assign(corpus, "id", "_v", nlist = 2,
      lloydIterations = 3, dim = dim)
    val purity = a.groupBy("cid")
      .agg(countDistinct(when($"id" < 1000L, 0L).otherwise(1L)).as("blobs"))
    assert(purity.where($"blobs" =!= 1L).count() == 0)
    assert(a.select("cid").distinct().count() == 2)
  }

  test("profile sizes sum to corpus; balanced sample caps and matches") {
    val a = Cluster.assign(embeddings, "id", "_v", dim = dim)
    val prof = Cluster.profile(a).cache()
    assert(prof.agg(sum($"size")).as[Long].head() == embeddings.count())
    val perCluster = 7
    val kept = Cluster.balancedSample(embeddings, "id", "_v",
      perCluster, dim = dim).cache()
    val byCid = kept.groupBy("cid").agg(count(lit(1)).as("k"))
    assert(byCid.where($"k" > perCluster).count() == 0)
    val expected = prof.agg(sum(least($"size", lit(perCluster.toLong))))
      .as[Long].head()
    assert(kept.count() == expected)
    // deterministic: a re-run keeps the identical id set
    val again = Cluster.balancedSample(embeddings, "id", "_v",
      perCluster, dim = dim)
    assert(kept.select("id").except(again.select("id")).count() == 0)
    prof.unpersist(); kept.unpersist()
  }
}
