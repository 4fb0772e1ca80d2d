package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, 1L + (i * 37 % 96))).toDF("id", "tokens")

  test("withStreamStart equals the driver-computed exclusive cumsum") {
    val n = 500
    val df = docs(n)
    val got = Packing.withStreamStart(df, "id", "tokens", numBuckets = 7)
      .select("id", "seq_start").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    var acc = 0L
    (0 until n).foreach { i =>
      val tokens = 1L + (i * 37 % 96)
      assert(got(i.toLong) == acc, s"doc $i: got ${got(i.toLong)}, want $acc")
      acc += tokens
    }
  }

  test("withStreamStart is stable when recomputed (deterministic bucketing)") {
    val df = docs(300)
    val packed = Packing.withStreamStart(df, "id", "tokens", numBuckets = 5)
    val a = packed.collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val b = packed.collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("packSequential: chunk arithmetic, conservation, split detection") {
    val budget = 128L
    val df = docs(400)
    val packed = Packing.packSequential(df, "id", "tokens", budget, numBuckets = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // (id, tokens, seq_start, pack_first, pack_last)
    val totalTokens = packed.map(_._2).sum
    val maxPack = packed.map(_._5).max
    assert(maxPack == (totalTokens - 1) / budget, "stream chunking leaves no gap")
    packed.foreach { case (id, tokens, start, first, last) =>
      assert(first == start / budget)
      assert(last == math.max(first, (start + tokens - 1) / budget))
      assert(last - first <= tokens / budget + 1, s"doc $id spans too many packs")
    }
    val splits = packed.count(p => p._4 != p._5)
    assert(splits > 0, "with avg tokens ~48 and budget 128 some docs must straddle")
  }

  test("packSequential handles zero-token documents") {
    val df = Seq((0L, 10L), (1L, 0L), (2L, 5L)).toDF("id", "tokens")
    val packed = Packing.packSequential(df, "id", "tokens", 8L, numBuckets = 2)
      .orderBy("id").collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed(1)._2 == packed(1)._3, "zero-token doc occupies one pack index")
  }

  test("packGreedy: budget respected, all docs packed, packs reasonably full") {
    val budget = 256L
    val df = docs(1000)
    val packed = Packing.packGreedy(df, "id", "tokens", budget, numBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.length == 1000, "every document assigned")
    assert(packed.map(_._1).toSet.size == 1000)
    val byPack = packed.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    byPack.foreach { case (pack, tokens) =>
      assert(tokens <= budget, s"pack $pack holds $tokens > $budget tokens")
    }
    // next-fit waste bound: a pack only closes when the next doc overflows,
    // so every pack except the last per bucket holds > budget - maxTokens
    val totalTokens = packed.map(_._2).sum
    val maxTokens = packed.map(_._2).max
    val fillFloor = budget - maxTokens + 1
    val bound = (totalTokens + fillFloor - 1) / fillFloor + 8
    assert(byPack.size <= bound, s"${byPack.size} packs vs next-fit bound $bound")
  }

  test("packGreedy gives an oversized document its own pack") {
    val df = Seq((0L, 10L), (1L, 999L), (2L, 10L)).toDF("id", "tokens")
    val packed = Packing.packGreedy(df, "id", "tokens", 100L, numBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(packed(1L) != packed(0L) && packed(1L) != packed(2L))
  }

  test("chunkTokens cuts overlapping windows that tile the document exactly") {
    // 10 tokens, chunkSize 4, overlap 1 -> step 3 -> chunks at 0,3,6 cover
    // [0,4) [3,7) [6,10): the last chunk reaches the end exactly
    val text = (0 until 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val out = Packing.chunkTokens(df, "text", chunkSize = 4, overlap = 1)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "chunk_tokens")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      (0, "t0 t1 t2 t3", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t6 t7 t8 t9", 4)))
  }

  test("chunkTokens short final chunk and single-chunk docs") {
    val df = Seq(
      (1L, (0 until 11).map(i => s"w$i").mkString(" ")), // 11 toks: 4,4,4,2
      (2L, "just three tokens"),                          // <= chunkSize
      (3L, "one")
    ).toDF("id", "text")
    val out = Packing.chunkTokens(df, "text", chunkSize = 4, overlap = 1)
      .groupBy("id")
      .agg(count(lit(1)).as("c"), sum("chunk_tokens").as("t"),
        min("chunk_tokens").as("mn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3).toLong)).toMap
    // 11 tokens, step 3: chunks at 0,3,6,9 -> sizes 4,4,4,2
    assert(out(1L) == ((4L, 14L, 2L)))
    assert(out(2L) == ((1L, 3L, 3L)))
    assert(out(3L) == ((1L, 1L, 1L)))
  }

  test("chunkTokens preserves input columns and every original token position is covered") {
    val df = Seq((7L, "a", (0 until 23).map(i => s"x$i").mkString(" ")))
      .toDF("id", "tag", "text")
    val chunks = Packing.chunkTokens(df, "text", chunkSize = 8, overlap = 2)
    assert(chunks.columns.toSet ==
      Set("id", "tag", "text", "chunk_id", "chunk_text", "chunk_tokens"))
    assert(chunks.select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    // union of chunk tokens = original token multiset restricted to overlap
    val toks = chunks.orderBy("chunk_id").collect()
      .flatMap(_.getAs[String]("chunk_text").split(" ")).distinct
    assert(toks.length == 23) // every position reached at least once
  }
}
