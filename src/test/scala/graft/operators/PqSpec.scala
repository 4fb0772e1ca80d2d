package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: codebook training, 32×-compressed encoding,
  * ADC-scored ANN with exact re-rank. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .selectExpr("vec_id as id", "cast(embedding as array<double>) as _v")
    .cache()

  test("codebook shape: m × ksub cells of dsub doubles, deterministic") {
    val cb = Similarity.pqTrain(embeddings, m = 8, ksub = 16,
      iterations = 1, dim = dim)
    val rows = cb.select($"_j", $"cid", size($"_c").as("n"))
      .as[(Int, Int, Int)].collect()
    assert(rows.length == 8 * 16)
    assert(rows.forall(_._3 == dim / 8))
    assert(rows.map(r => (r._1, r._2)).toSet ==
      (for (j <- 0 until 8; c <- 0 until 16) yield (j, c)).toSet)
    // same inputs → identical codebook (deterministic seeds + argmin ties)
    val again = Similarity.pqTrain(embeddings, m = 8, ksub = 16,
      iterations = 1, dim = dim)
    assert(cb.orderBy("_j", "cid").collect().toSeq ==
      again.orderBy("_j", "cid").collect().toSeq)
  }

  test("codes are m smallint cells in [0, ksub) with the exact norm") {
    val cb = Similarity.pqTrain(embeddings, m = 8, ksub = 16,
      iterations = 1, dim = dim)
    val codes = Similarity.pqEncode(embeddings, cb, m = 8, dim = dim)
    assert(codes.schema("code").dataType.simpleString == "array<smallint>")
    val bad = codes.where(size($"code") =!= 8 ||
      exists($"code", c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    assert(codes.count() == embeddings.count())
    // stored norm is the true vector norm
    val normErr = codes.join(embeddings, Seq("id"))
      .select(abs($"_nv" - sqrt(aggregate($"_v", lit(0.0d),
        (a, x) => a + x * x))).as("e"))
      .agg(max($"e")).as[Double].head()
    assert(normErr < 1e-9)
  }

  test("empty codebook cells keep their previous centroid") {
    // 8 rows but only 4 distinct vectors (duplicate pairs): all 8 get
    // seeded as cells, but each duplicate's subvectors tie with its
    // twin's and the argmin tie-break sends both members to the smaller
    // cid — the other cell loses every member on iteration 1 and must
    // survive with its seed centroid instead of vanishing or nulling
    val tiny = Seq.tabulate(8)(i =>
      (i.toLong, Array.tabulate(dim)(p => ((i % 4) * dim + p).toDouble)))
      .toDF("id", "_v")
    val cb = Similarity.pqTrain(tiny, m = 4, ksub = 8,
      iterations = 2, dim = dim)
    assert(cb.count() == 4 * 8)
    assert(cb.where($"_c".isNull || size($"_c") =!= dim / 4).count() == 0)
  }

  test("pqTopK reaches >=60% recall@10 of brute force on the fixture") {
    val queries = embeddings.limit(5)
      .select($"id".as("qid"), $"_v".as("qvec"))
    val exact = Similarity.bruteForceTopK(
      embeddings, "id", "_v", queries, "qid", "qvec", k = 10, dim = dim)
    val approx = Similarity.pqTopK(
      embeddings, "id", "_v", queries, "qid", "qvec",
      k = 10, m = 8, ksub = 16, iterations = 2, dim = dim)
    val e = exact.select("qid", "id").as[(Long, Long)].collect().toSet
    val a = approx.select("qid", "id").as[(Long, Long)].collect().toSet
    assert(a.size == e.size)
    val recall = (e intersect a).size.toDouble / e.size
    assert(recall >= 0.6, s"PQ recall@10 = $recall")
    // re-ranked sims are EXACT cosines: every returned pair's sim matches
    // brute force bit-for-bit where the pair appears in both
    val bfSims = exact.select($"qid", $"id", $"sim".as("_bs"))
    val simErr = approx.join(bfSims, Seq("qid", "id"))
      .agg(max(abs($"sim" - $"_bs"))).as[Double].head()
    assert(simErr == 0.0d)
  }
}
