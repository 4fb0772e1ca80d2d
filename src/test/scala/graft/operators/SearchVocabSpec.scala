package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchVocabSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark engine for big data processing"),
    (1L, "spark spark spark tuning guide"),
    (2L, "cooking recipes for winter evenings"),
    (3L, "data engine internals and query planning"),
    (4L, "gardening tips for spring")
  ).toDF("id", "text")

  test("bm25TopK ranks term-dense short docs first and drops non-matches") {
    val got = Search.bm25TopK(corpus, "id", "text",
      Seq("spark", "data"), k = 10).collect()
    val ids = got.map(_.getLong(0)).toSeq
    // docs 2 and 4 share no query term -> absent
    assert(!ids.contains(2L) && !ids.contains(4L))
    assert(ids.toSet == Set(0L, 1L, 3L))
    // doc 0 (spark + data, one each) must outrank doc 1 (spark x3): idf
    // weights are equal here (df=2 for both terms) and tf saturation caps
    // the repeated term — covering two query terms beats repeating one
    // (2 * 0.94*idf vs 1.58*idf), which is exactly BM25's point
    assert(ids.head == 0L)
    // scores strictly positive and sorted descending
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores.forall(_ > 0) && scores == scores.sorted.reverse)
  }

  test("bm25TopK hand-checked score for a single-term query") {
    // terms=["engine"]: df=2, N=5 -> idf = ln(1 + 3.5/2.5)
    // doc 0: tf=1, dl=6; avgdl = (6+5+5+6+4)/5 = 5.2
    val got = Search.bm25TopK(corpus, "id", "text", Seq("engine"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = math.log(1.0 + 3.5 / 2.5)
    val expected0 = idf * 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 6 / 5.2))
    assert(got.keySet == Set(0L, 3L))
    assert(math.abs(got(0L) - (math.rint(expected0 * 1e4) / 1e4)) < 1e-9)
  }

  test("tfidfNorm is zero iff no query term matches, positive otherwise") {
    val got = Search.tfidfNorm(corpus, "id", "text", Seq("spark", "data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) == 0.0 && got(4L) == 0.0)
    assert(got(0L) > 0 && got(1L) > 0 && got(3L) > 0)
    // doc 1 has tf(spark)=3 vs doc 3's tf(data|engine...)=1 each: same
    // idf weights, so the 3x term dominates the norm
    assert(got(1L) > got(3L))
  }

  test("tfidfNorm keeps token-less docs: norm 0, and N counts the full corpus") {
    // doc 9 has null text: tokens() is null, the explode emits no row, and
    // the groupBy would silently drop it — it must still appear (norm 0),
    // and the idf N must be 6 (all docs), not 5 (tokenized docs): with
    // N=6, idf(spark) = ln(7/3)+1; doc 1 norm = 3 * idf
    val withEmpty = corpus.union(Seq((9L, null.asInstanceOf[String]))
      .toDF("id", "text"))
    val got = Search.tfidfNorm(withEmpty, "id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 9L))
    assert(got(9L) == 0.0)
    val idf = math.log(7.0 / 3.0) + 1.0
    assert(math.abs(got(1L) - 3.0 * idf) < 1e-9)
  }

  test("vocab build is deterministic under frequency ties and coverage adds up") {
    val vocab = Vocab.build(corpus, "text", size = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "spark" 4x, "for" 3x, then freq-2 terms tie-broken alphabetically:
    // "data" and "engine" both 2x -> "data" wins the last slot
    assert(vocab.toSeq == Seq(("spark", 4L), ("for", 3L), ("data", 2L)))

    val cov = Vocab.coverage(corpus, "text",
      Vocab.build(corpus, "text", 3)).head()
    val total = cov.getLong(0); val covered = cov.getLong(1)
    assert(total == 26L, s"tokens: $total")
    assert(covered == 9L) // 4 spark + 3 for + 2 data
    assert(math.abs(cov.getDouble(2) - 9.0 / 26) < 1e-6)
    // distinct OOV terms = distinct terms not in vocab
    val distinctTerms = corpus.select(explode(split(lower(col("text")), "\\s+")))
      .distinct().count()
    assert(cov.getLong(3) == distinctTerms - 3)
  }

  test("stripBoilerplate removes cross-doc sentences and preserves order") {
    val docs = Seq(
      (0L, "Unique thoughts here. All rights reserved. More unique prose"),
      (1L, "Something else entirely. All rights reserved. Subscribe now"),
      (2L, "All rights reserved. Subscribe now. Original content"),
      (3L, "Subscribe now. All rights reserved"),
      (4L, "Nothing shared in this one at all")
    ).toDF("id", "text")
    // "all rights reserved" in 4 docs, "subscribe now" in 3
    val got = Dedup.stripBoilerplate(docs, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(0L) == ("unique thoughts here. more unique prose", 2L))
    assert(got(1L) == ("something else entirely", 1L))
    assert(got(2L) == ("original content", 1L))
    assert(got(3L) == ("", 0L), "all-boilerplate doc keeps an empty row")
    assert(got(4L) == ("nothing shared in this one at all", 1L))
  }

  test("count-min sketch over-estimates never under-estimate; heavy hitters exact") {
    val keys = (1 to 50).flatMap(i => Seq.fill(i)(s"k$i")) // k_i appears i times
    val df = keys.toDF("k")
    val cms = Sketches.countMin(df, "k", eps = 0.01, confidence = 0.99, seed = 7)
    (1 to 50).foreach { i =>
      val est = cms.estimateCount(s"k$i")
      assert(est >= i, s"CMS must never under-estimate (k$i: $est < $i)")
      assert(est <= i + math.ceil(0.01 * keys.size).toLong + 1,
        s"k$i estimate $est far above truth $i")
    }
    val hh = Sketches.heavyHitters(df, "k", threshold = 45L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == (45 to 50).map(i => s"k$i" -> i.toLong).toMap)
  }

  test("per-shard HLL sketches merge to the global distinct count") {
    val df = (0 until 10000).map(i => (s"s${i % 4}", i % 700)).toDF("shard", "uid")
    val sketches = Sketches.hllPerShard(df, "shard", "uid")
    assert(sketches.count() == 4)
    val est = Sketches.hllMergedEstimate(sketches).head().getLong(0)
    assert(math.abs(est - 700.0) / 700.0 < 0.05,
      s"merged HLL estimate $est vs exact 700")
  }

  test("rrfFuse: closed-form fusion of two rankings, integer-exact") {
    import spark.implicits._
    // list A ranks docs 1,2,3; list B ranks 3,2,9
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((3L, 1), (2L, 2), (9L, 3)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(a, b), "id", "rank", k0 = 60, k = 10)
      .as[(Long, Long, Long)].collect()
    def e9(rs: Seq[Int]): Long =
      math.floor(1e9 * rs.map(r => 1.0 / (60.0 + r)).sum).toLong
    val expect = Map(
      1L -> (1L, e9(Seq(1))), 2L -> (2L, e9(Seq(2, 2))),
      3L -> (2L, e9(Seq(3, 1))), 9L -> (1L, e9(Seq(3))))
    assert(got.length == 4)
    got.foreach { case (id, hits, s) =>
      assert(expect(id) == ((hits, s)), s"id=$id") }
    // both-list docs outrank single-list docs; ordering is score desc
    val order = got.map(_._1).toSeq
    assert(order.take(2).toSet == Set(2L, 3L))
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
  }
}
