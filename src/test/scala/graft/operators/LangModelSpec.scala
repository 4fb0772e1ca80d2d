package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("counts and closed-form scores on a tiny corpus") {
    // train corpus: "a b a b" + "a c" -> N=6
    // unigrams: a:3 b:2 c:1; bigrams: (a,b):2 (b,a):1 (a,c):1
    val train = Seq("a b a b", "a c").toDF("text")
    val m = LangModel.train(train, "text")
    assert(m.total == 6L)
    assert(m.unigrams.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(m.bigrams.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))

    // doc "a b": one transition, s = c(a,b)/c(a) = 2/3
    // doc "a z": OOV z -> s = 0.4 * 1/6
    // doc "c a": seen words, unseen bigram -> s = 0.4 * c(a)/6 = 0.2
    val docs = Seq((0L, "a b"), (1L, "a z"), (2L, "c a"), (3L, "solo"),
      (4L, "")).toDF("doc_id", "text")
    val got = LangModel.scoreDocs(docs, "doc_id", "text", m, alpha = 0.4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("prob_e6") == math.floor(1e6 * 2.0 / 3.0).toLong)
    assert(got(1L).getAs[Long]("prob_e6") ==
      math.floor(1e6 * 0.4 * 1.0 / 6.0).toLong)
    assert(got(2L).getAs[Long]("prob_e6") ==
      math.floor(1e6 * 0.4 * 3.0 / 6.0).toLong)
    // single-token and empty docs appear with zero transitions, null score
    assert(got(3L).getAs[Long]("n_transitions") == 0L && got(3L).isNullAt(2))
    assert(got(4L).getAs[Long]("n_transitions") == 0L)
    // ppl = 10^(-log10 s): doc 0 -> 1/s = 1.5
    assert(math.abs(got(0L).getAs[Double]("ppl") - 1.5) < 1e-9)
  }

  test("per-doc average over multiple transitions is the floored mean") {
    val train = Seq("x y x y x z").toDF("text")
    // unigrams x:3 y:2 z:1, N=6; bigrams (x,y):2 (y,x):2 (x,z):1
    val m = LangModel.train(train, "text")
    // doc "x y x": s1=(x,y)=2/3, s2=(y,x)=2/2=1
    val got = LangModel.scoreDocs(
      Seq((7L, "x y x")).toDF("doc_id", "text"), "doc_id", "text", m)
      .head()
    val e1 = math.floor(1e6 * 2.0 / 3.0).toLong
    val e2 = math.floor(1e6 * 1.0).toLong
    assert(got.getAs[Long]("prob_e6") ==
      math.floor((e1 + e2).toDouble / 2.0).toLong)
    assert(got.getAs[Long]("n_transitions") == 2L)
  }

  test("bucket splits head/middle/tail on fixed thresholds") {
    val scored = Seq(
      (1L, 2L, Some(900000L)), (2L, 2L, Some(500000L)),
      (3L, 2L, Some(100L)), (4L, 0L, None)
    ).toDF("doc_id", "n_transitions", "prob_e6")
    val b = LangModel.bucket(scored, headMin = 800000L, tailMax = 1000L)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(b == Map(1L -> "head", 2L -> "middle", 3L -> "tail", 4L -> "tail"))
  }

  test("held-out scoring never produces null for multi-token docs (OOV floor)") {
    val m = LangModel.train(Seq("p q r").toDF("text"), "text")
    val got = LangModel.scoreDocs(
      Seq((1L, "unseen words entirely")).toDF("doc_id", "text"),
      "doc_id", "text", m)
    val r: Row = got.head()
    assert(r.getAs[Long]("n_transitions") == 2L)
    assert(r.getAs[Long]("prob_e6") == math.floor(1e6 * 0.4 / 3.0).toLong)
  }
}
