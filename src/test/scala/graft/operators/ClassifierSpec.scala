package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("training counts, vocab, and class stats are exact") {
    val df = Seq(
      ("spam buy now buy", "spam"),
      ("hello dear friend", "ham"),
      ("buy cheap now", "spam")).toDF("text", "label")
    val m = Classifier.trainNaiveBayes(df, "text", "label")
    assert(m.classes == Seq("ham", "spam"))
    assert(m.vocabSize == 7) // spam buy now hello dear friend cheap
    assert(m.stats("spam") == Classifier.ClassStats(tokens = 7, docs = 2))
    assert(m.stats("ham") == Classifier.ClassStats(tokens = 3, docs = 1))
    val wide = m.wide.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wide("buy") == ((0L, 3L))) // (c_ham, c_spam)
    assert(wide("hello") == ((1L, 0L)))
  }

  test("classify recovers clearly separated classes, smooths OOV") {
    val train = Seq(
      ("buy cheap pills now", "spam"), ("cheap pills buy", "spam"),
      ("meeting notes attached", "ham"), ("notes from the meeting", "ham")
    ).toDF("text", "label")
    val m = Classifier.trainNaiveBayes(train, "text", "label")
    val test = Seq(
      (1L, "cheap pills unseen"), // OOV word smoothed, spam signal wins
      (2L, "meeting notes"),
      (3L, "")).toDF("doc_id", "text")
    val got = Classifier.classify(test, "doc_id", "text", m)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "spam")
    assert(got(2L) == "ham")
    // empty doc: prior-only argmax; equal priors tie-break on class name
    assert(got(3L) == "spam") // struct max: equal score, "spam" > "ham"
  }

  test("closed-form posterior for a one-token doc") {
    val train = Seq(("a a a", "x"), ("b", "y")).toDF("text", "label")
    val m = Classifier.trainNaiveBayes(train, "text", "label")
    // vocab = {a, b} -> V=2; class x: 3 tokens, class y: 1 token
    val got = Classifier.classify(
      Seq((0L, "a")).toDF("doc_id", "text"), "doc_id", "text", m).head()
    val sx = math.log10((3.0 + 1.0) / (3.0 + 2.0)) + math.log10(0.5)
    val sy = math.log10((0.0 + 1.0) / (1.0 + 2.0)) + math.log10(0.5)
    assert(math.abs(got.getAs[Double]("score_x") - sx) < 1e-12)
    assert(math.abs(got.getAs[Double]("score_y") - sy) < 1e-12)
    assert(got.getAs[String]("pred") == "x")
  }
}
