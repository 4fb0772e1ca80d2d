package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("portableBucket is the 31-ary codepoint fold mod m") {
    def ref(s: String, m: Int): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % m)
    val got = Seq("a", "ab", "hello world", "z9!").toDF("f")
      .select(col("f"), Dsir.portableBucket(col("f"), 1024).as("b"))
      .as[(String, Long)].collect().toMap
    Seq("a", "ab", "hello world", "z9!").foreach { s =>
      assert(got(s) == ref(s, 1024), s"hash mismatch for '$s'")
    }
  }

  test("featureArray is unigrams ++ bigrams; degenerate docs are empty") {
    val got = Seq("a b c", "solo", " ", "").toDF("t")
      .select(Dsir.featureArray(col("t")).as("f"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a", "b", "c", "a b", "b c"))
    assert(got(1) == Seq("solo"))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("fit: closed-form log-ratio with Laplace smoothing over the spine") {
    // m=4 so every bucket is enumerable. target: one doc "a" (1 feature),
    // raw: one doc "a a" (features a, a, "a a" -> 3 features).
    val m = 4
    val target = Seq("a").toDF("text")
    val raw = Seq("a a").toDF("text")
    val model = Dsir.fit(target, raw, "text", m)
    assert(model.targetFeatures == 1 && model.rawFeatures == 3)
    val aB = "a".foldLeft(0L)((h, c) => (h * 31 + c.toInt) % m)
    val aaB = "a a".foldLeft(0L)((h, c) => (h * 31 + c.toInt) % m)
    val lr = model.logRatio.as[(Long, Long)].collect().toMap
    assert(lr.size == m) // full spine, absent buckets included
    def e(ct: Long, cr: Long): Long =
      math.floor(1e6 * math.log10(
        ((ct + 1).toDouble / (1 + m)) / ((cr + 1).toDouble / (3 + m)))).toLong
    val expect = Map(aB -> e(1, 2), aaB -> e(0, 1))
      .withDefaultValue(e(0, 0))
    (0L until m).foreach(b => assert(lr(b) == expect(b), s"bucket $b"))
  }

  test("score + selectTopK rank target-like docs first, weight additive") {
    val target = Seq.fill(8)("good text here").toDF("text")
    val raw = Seq(
      (1L, "good text here"),        // pure target language
      (2L, "junk spam junk spam"),   // pure non-target
      (3L, "good text"),             // partial target
      (4L, "")                       // featureless -> weight 0
    ).toDF("doc_id", "text")
    val model = Dsir.fit(target, raw, "text")
    val scored = Dsir.score(raw, "doc_id", "text", model)
    val rows = scored.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(4L) == ((0L, 0L)))
    assert(rows(1L)._2 > rows(3L)._2, "more target evidence, higher weight")
    assert(rows(3L)._2 > rows(2L)._2 && rows(2L)._2 < 0,
      "non-target features penalize")
    val kept = Dsir.selectTopK(scored, "doc_id", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("weights replay as exact bigint sums of the floored table") {
    // independently recompute one doc's weight from the model table
    val target = Seq("alpha beta").toDF("text")
    val raw = Seq((9L, "alpha gamma")).toDF("doc_id", "text")
    val model = Dsir.fit(target, raw, "text", 64)
    val lr = model.logRatio.as[(Long, Long)].collect().toMap
    def b(s: String) = s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 64)
    val expected = Seq("alpha", "gamma", "alpha gamma").map(f => lr(b(f))).sum
    val got = Dsir.score(raw, "doc_id", "text", model)
      .where(col("doc_id") === 9L).head()
    assert(got.getAs[Long]("weight_e6") == expected)
    assert(got.getAs[Long]("n_features") == 3L)
  }
}
