package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the expected merges on a closed-form corpus") {
    // "low low low lower lowest": pair counts over (word, freq) make the
    // merge order fully predictable with lexicographic tie-breaks.
    val df = Seq("low low low lower lowest").toDF("text")
    val m = Bpe.train(df, "text", numMerges = 3)
    // (l,o) freq 5 wins round 1; then (lo,w) freq 5; then (low,EOW) 3.
    assert(m.merges == Seq(("l", "o"), ("lo", "w"), ("low", Bpe.EndOfWord)))
  }

  test("encode replays training merges; decode round-trips") {
    val df = Seq("low low low lower lowest").toDF("text")
    val m = Bpe.train(df, "text", numMerges = 3)
    val enc = Bpe.encode(df.withColumn("id", lit(0L)), "id", "text", m)
    val toks = enc.select("tokens").as[Seq[String]].head()
    val lowEow = "low" + Bpe.EndOfWord
    assert(toks == Seq(lowEow, lowEow, lowEow,
      "low", "e", "r", Bpe.EndOfWord, "low", "e", "s", "t", Bpe.EndOfWord))
    val dec = enc.select(Bpe.decode(col("tokens")).as("d")).as[String].head()
    assert(dec == "low low low lower lowest")
  }

  test("round trip + compression bounds on a multi-doc corpus") {
    val docs = Seq(
      (0L, "the merge engine merges parquet files"),
      (1L, "the engine merges the files"),
      (2L, "parquet files merge well"),
      (3L, ""),
      (4L, "  spaced   out   words  ")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 20)
    assert(m.merges.nonEmpty && m.merges.size <= 20)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
    val joined = enc.join(docs, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        Bpe.decode(col("tokens")).as("dec"),
        concat_ws(" ",
          graft.functions.TextFunctions.tokens(col("text"))).as("norm"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("words"),
        length(regexp_replace(col("text"), "\\s", "")).as("chars"))
      .collect()
    joined.foreach { r =>
      assert(r.getAs[String]("dec") == r.getAs[String]("norm"))
      val (n, w, c) = (r.getAs[Int]("n_tokens"),
        r.getAs[Int]("words"), r.getAs[Int]("chars"))
      assert(n >= w, s"tokens >= words: $r")
      assert(n <= c + w, s"tokens <= chars + one sentinel per word: $r")
    }
  }

  test("text containing a literal </w> (or the sentinel char) round-trips") {
    // Regression: with a forgeable multi-char sentinel, the chars
    // '<','/','w','>' concatenate back to the sentinel in decode and the
    // global replace corrupts the word. The control-char sentinel plus
    // strip-at-tokenization makes both inputs safe.
    val docs = Seq(
      (0L, "markup remnant </w> and <w>tag</w> soup"),
      (1L, "control" + Bpe.EndOfWord + "char inside"),
      (2L, "plain words here")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 10)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
    val got = enc.join(docs, "doc_id")
      .select(col("doc_id"), Bpe.decode(col("tokens")).as("dec"),
        concat_ws(" ", graft.functions.TextFunctions.tokens(
          translate(col("text"), Bpe.EndOfWord, ""))).as("norm"))
      .collect()
    got.foreach(r =>
      assert(r.getAs[String]("dec") == r.getAs[String]("norm"), r.toString))
  }

  test("stops early when no pair reaches minPairFreq") {
    val df = Seq("ab cd ef").toDF("text") // every pair unique (freq 1)
    val m = Bpe.train(df, "text", numMerges = 10, minPairFreq = 2)
    assert(m.merges.isEmpty)
  }

  test("encodeWord merges lowest rank first, left to right") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    assert(Bpe.encodeWord("abc", ranks) == List("abc", Bpe.EndOfWord))
    assert(Bpe.encodeWord("abab", ranks) == List("ab", "ab", Bpe.EndOfWord))
    assert(Bpe.encodeWord("", Map.empty) == List(Bpe.EndOfWord))
  }
}
