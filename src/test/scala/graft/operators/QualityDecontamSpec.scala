package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class QualityDecontamSpec extends SparkSpec {
  import spark.implicits._

  test("repetition metrics match hand-computed values") {
    val rows = Seq(
      (0L, "buy now buy now buy now buy now"),            // 2-gram "buy now" x4
      (1L, "a perfectly ordinary sentence about weather"),
      (2L, "one. two. one. three. one."),                 // dup sentences
      (3L, "### $$$ %%% ^^^ &&&"),                        // symbols
      (4L, "")
    ).toDF("id", "text")
    val got = rows.select(col("id"),
      TextFunctions.topNgramFraction(col("text"), 2).as("top2"),
      TextFunctions.dupSentenceFraction(col("text")).as("dup"),
      TextFunctions.meanWordLength(col("text")).as("mwl"),
      TextFunctions.symbolWordRatio(col("text")).as("sym"),
      TextFunctions.gopherKeep(col("text")).as("keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap

    // doc 0: 8 words, 7 bigrams, "buy now" occurs 4x -> 4*2/8 = 1.0
    assert(math.abs(got(0L)._1 - 1.0) < 1e-9)
    assert(!got(0L)._5, "pure repetition must be dropped")
    // doc 1: all bigrams unique -> 2/6
    assert(math.abs(got(1L)._1 - 2.0 / 6) < 1e-9)
    assert(got(1L)._5, "ordinary prose must be kept")
    // doc 2: sentences one,two,one,three,one -> 1 - 3/5
    assert(math.abs(got(2L)._2 - 0.4) < 1e-9)
    assert(!got(2L)._5)
    // doc 3: 15 symbol chars / 5 words = 3.0
    assert(math.abs(got(3L)._4 - 3.0) < 1e-9)
    assert(!got(3L)._5)
    // doc 4: empty -> all zeros, mean word length 0 fails the shape rule
    assert(got(4L)._1 == 0.0 && got(4L)._2 == 0.0 && got(4L)._3 == 0.0)
    assert(!got(4L)._5)
  }

  test("contaminated finds exactly the docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "an entirely different document with no overlap at all here"),
      (2L, "prefix words then the quick brown fox jumps over the lazy dog and more"),
      (3L, "quick brown fox jumps over the lazy cat instead today yes")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")

    val got = Decontam.contaminated(corpus, benchmark, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // docs 0 and 2 contain the benchmark's full 8-gram windows; doc 3
    // shares only shorter runs (its 8-grams differ at "cat"), doc 1 nothing
    assert(got.keySet == Set(0L, 2L), s"got $got")
    assert(got(0L) >= 1 && got(2L) >= 1)

    // minOverlap raises the bar
    val strict = Decontam.contaminated(corpus, benchmark, "doc_id", "text",
      n = 3, minOverlap = 5).collect().map(_.getLong(0)).toSet
    assert(strict.contains(0L) && !strict.contains(1L))
  }

  test("contaminatedBloom == contaminated on a real corpus slice") {
    // every token embeds the doc id, so no 8-gram crosses documents except
    // through the planted verbatim benchmark copies
    val corpus = (0 until 300).map { i =>
      (i.toLong, (0 until 16).map(j => s"w${i}t$j").mkString(" "))
    }.toDF("doc_id", "text")
    // benchmark = 6 corpus docs verbatim (planted leakage) + 1 novel doc
    val benchmark = corpus.where($"doc_id" % 50 === 0)
      .unionByName(Seq((999L, "totally novel benchmark question nobody leaked "
        + "anywhere in the training corpus at all")).toDF("doc_id", "text"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = norm(Decontam.contaminated(corpus, benchmark, "doc_id", "text", n = 8))
    val bloom = norm(Decontam.contaminatedBloom(corpus, benchmark, "doc_id", "text", n = 8))
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    assert(exact.keySet == (0 until 300 by 50).map(_.toLong).toSet)
  }

  test("contaminatedSemantic flags embedding leaks, is scale-invariant, skips zero norms") {
    // eval = 2 orthogonal unit vectors; corpus = a scaled eval copy
    // (cosine 1), a paraphrase-like near copy (cos ~0.995), an unrelated
    // orthogonal doc, and a zero vector (NaN cosine must never flag)
    val eval = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
    val corpus = Seq(
      (10L, Array(3.0, 0.0, 0.0, 0.0)),      // eval 0 scaled: cos = 1
      (11L, Array(1.0, 0.1, 0.0, 0.0)),      // near copy: cos ~ 0.995
      (12L, Array(0.0, 0.0, 1.0, 0.0)),      // orthogonal: cos 0
      (13L, Array(0.0, 0.0, 0.0, 0.0))).toDF("id", "v") // zero norm
    val flagged = Decontam
      .contaminatedSemantic(corpus, eval, "id", "v", minCosine = 0.99)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(flagged.keySet === Set(10L, 11L))
    assert(math.abs(flagged(10L) - 1.0) < 1e-12)
    val kept = Decontam
      .decontaminateSemantic(corpus, eval, "id", "v", minCosine = 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(12L, 13L))
  }
}
