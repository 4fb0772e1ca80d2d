package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the native [[TextFunctions.shingleHashes]] expression bit-exact
  * against the exploded-window pipeline it replaced in minHashDupPairs
  * (posexplode(tokens) → lead(k−1) windows → multi-arg xxhash64 →
  * distinct): same tokens, same seed chaining, same short-doc padding,
  * same distinct set. */
class ShingleHashSpec extends SparkSpec {

  /** The pre-round-16 pipeline, verbatim. */
  private def legacyTok(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("_id").orderBy("_p")
    val leads = (1 until k).map(j =>
      coalesce(lead(col("_t"), j).over(w), lit("")).as(s"_t$j"))
    val lastLead = lead(col("_t"), k - 1).over(w)
    df.select(col("_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("_p", "_t")))
      .select(Seq(col("_id"), col("_p"), col("_t"),
        lastLead.isNotNull.as("_full")) ++ leads: _*)
      .where(col("_full") || col("_p") === 0)
      .select(col("_id"),
        xxhash64(col("_t") +: (1 until k).map(j => col(s"_t$j")): _*).as("_h"))
      .distinct()
  }

  private def nativeTok(df: DataFrame, k: Int): DataFrame =
    df.select(col("_id"),
      explode(TextFunctions.shingleHashes(col("text"), k)).as("_h"))

  private def assertSame(df: DataFrame, k: Int): Unit = {
    val a = legacyTok(df, k).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = nativeTok(df, k).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq,
      s"k=$k: legacy ${a.length} rows vs native ${b.length} rows; " +
        s"first diff: ${a.toSeq.diff(b.toSeq).take(3)} / ${b.toSeq.diff(a.toSeq).take(3)}")
  }

  test("adversarial strings: empty, whitespace forms, short docs, dups, unicode") {
    import spark.implicits._
    val docs = Seq(
      1L -> "",
      2L -> " ",
      3L -> "\t",                       // \s but not trimmed by trim()
      4L -> "one",
      5L -> "one two",
      6L -> "one two three",
      7L -> "one two three four five",
      8L -> "a a a a a a",              // heavy duplicate shingles
      9L -> "  Leading and Trailing  ",
      10L -> "MiXeD CaSe ÄÖÜ Straße 中文 токен",
      11L -> "tab\tseparated\nnewline\r\ncrlf tokens here",
      12L -> "ends with whitespace \t",
      13L -> "x " * 2000,               // long doc
      14L -> "unique1 unique2 unique3 unique1 unique2 unique3 unique1 unique2"
    ).toDF("_id", "text")
    Seq(1, 2, 3, 5).foreach(k => assertSame(docs, k))
  }

  test("documents fixture sample matches") {
    val docs = graft.Fixtures.raw(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("_id"), col("text"))
    assertSame(docs, 3)
  }
}
