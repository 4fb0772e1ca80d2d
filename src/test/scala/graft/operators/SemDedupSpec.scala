package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic dedup: cluster + within-cluster neighborhood
  * scan. Planted near-identical vectors must be found; the candidate set
  * must stay linear even when the whole corpus collapses to one point. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .selectExpr("vec_id as id", "cast(embedding as array<double>) as _v")
    .cache()

  test("planted epsilon-duplicates are recovered with exact cosines") {
    val planted = embeddings.where($"id" < 5)
      .select(($"id" + 1000000L).as("id"),
        transform($"_v", (x, i) =>
          x + when(i === 0, lit(0.001)).otherwise(lit(0.0))).as("_v"))
    val corpus = embeddings.unionByName(planted)
    val pairs = SemDedup.semanticDupPairs(corpus, "id", "_v",
      threshold = 0.99, dim = dim)
    val hits = pairs
      .where($"idB" - $"idA" === 1000000L && $"idA" < 5).count()
    assert(hits == 5, s"expected all 5 planted pairs, got $hits")
    // reported cosines are true cosines (spot-check against direct calc)
    val bad = pairs.join(embeddings.select($"id".as("idA"), $"_v".as("_va")), Seq("idA"))
      .join(corpus.select($"id".as("idB"), $"_v".as("_vb")), Seq("idB"))
      .withColumn("_true", Similarity.dotN($"_va", $"_vb", dim) /
        (Similarity.normN($"_va", dim) * Similarity.normN($"_vb", dim)))
      .where(abs($"cosine" - $"_true") > 1e-12).count()
    assert(bad == 0)
  }

  test("keep-set drops exactly one of each planted pair") {
    val planted = embeddings.where($"id" < 5)
      .select(($"id" + 1000000L).as("id"),
        transform($"_v", (x, i) =>
          x + when(i === 0, lit(0.001)).otherwise(lit(0.0))).as("_v"))
    val corpus = embeddings.unionByName(planted)
    val kept = SemDedup.semanticDedupKeep(corpus, "id", "_v",
      threshold = 0.99, dim = dim)
    // canonical (smallest id) survives: all originals, none of the clones
    assert(kept.where($"id" >= 1000000L).count() == 0)
    assert(kept.count() == embeddings.count())
  }

  test("mega-cluster of identical vectors: candidate volume stays n*w") {
    // 10k identical embeddings — the hot-bucket case that is quadratic
    // for an uncapped bucket join. Here every row lands in one cluster
    // and the neighborhood scan emits exactly (n - i) ∧ w successors per
    // row: bounded, and the run completes quickly.
    val n = 10000
    val w = 8
    val same = spark.range(n)
      .select($"id", array(Seq.tabulate(dim)(i => lit(i.toDouble)): _*).as("_v"))
    val pairs = SemDedup.semanticDupPairs(same, "id", "_v",
      threshold = 0.999, nlist = 4, dim = dim, neighborhood = w)
    // every emitted pair is a true dup; count is exactly sum min(w, n-1-r)
    val expected = (0 until n).map(r => math.min(w, n - 1 - r)).sum
    assert(pairs.count() == expected)
  }
}
