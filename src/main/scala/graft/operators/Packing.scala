package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-data pipelines: assign every document a
  * token interval in one global concatenated stream, then cut the stream
  * into fixed-budget packs ("concat-and-chunk", the standard LLM
  * pretraining shape — documents may straddle pack boundaries), plus a
  * no-split greedy first-fit variant for the pack-whole-documents case.
  *
  * The global running sum is the scale problem: a naive
  * `sum().over(Window.orderBy(id))` collapses 100 TB into ONE window
  * partition. This implementation is a distributed two-phase prefix sum:
  *
  *   1. bucket rows by an EXPLICIT deterministic range of the order key
  *      (computed from its min/max — one cheap agg), NOT
  *      `repartitionByRange`, whose sampled bounds change between the two
  *      passes (the sampler is seeded by the RDD id) and would silently
  *      mis-assign offsets on recomputation;
  *   2. aggregate per-bucket token totals (metadata-scale: `buckets` rows
  *      on the driver), prefix-sum them driver-side, and broadcast the
  *      offsets back as a join on the bucket id;
  *   3. running-sum WITHIN each bucket (`Window.partitionBy(bucket)`) —
  *      parallel across buckets, each 1/buckets of the data.
  *
  * Everything stays in native column expressions (codegen'd); no stage
  * touches more than one bucket of data at a time.
  */
object Packing {

  /** df + `startCol`: the exclusive global running sum of `tokensCol` in
    * ascending `orderCol` order (the document's first token position in
    * the concatenated stream). `orderCol` must be unique and numeric;
    * bucket balance follows the key distribution (dense ids → balanced). */
  def withStreamStart(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      startCol: String = "seq_start",
      numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val buckets =
      if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions
    val mm = df.agg(min(col(orderCol)).cast("double"),
      max(col(orderCol)).cast("double")).head
    if (mm.isNullAt(0)) return df.withColumn(startCol, lit(0L)) // empty input
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val span = math.max(hi - lo, 1e-9)
    // deterministic bucket id in [0, buckets): pure arithmetic on the key
    val bucketExpr = least(lit(buckets - 1),
      floor((col(orderCol).cast("double") - lit(lo)) / lit(span) * lit(buckets))
        .cast("int"))
    val bucketed = df.withColumn("_bucket", bucketExpr)
    // per-bucket totals: `buckets` rows — metadata-scale on the driver
    val totals = bucketed.groupBy("_bucket")
      .agg(sum(col(tokensCol).cast("long")).as("_btokens"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets).scanLeft(0L) {
      case (acc, b) => acc + totals.getOrElse(b, 0L)
    }
    val offsetCol = element_at(
      array(offsets.take(buckets).map(lit): _*), col("_bucket") + 1)
    val w = Window.partitionBy("_bucket").orderBy(orderCol)
    bucketed
      .withColumn(startCol,
        offsetCol + sum(col(tokensCol).cast("long")).over(w) -
          col(tokensCol).cast("long"))
      .drop("_bucket")
  }

  /** Concat-and-chunk pack assignment: every document gets its first/last
    * pack index under a fixed `budget`; `pack_first != pack_last` means the
    * document straddles a boundary and is split across packs. */
  def packSequential(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long,
      numBuckets: Int = 0): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val started = withStreamStart(df, orderCol, tokensCol, "seq_start", numBuckets)
    started
      .withColumn("pack_first", floor(col("seq_start") / budget).cast("long"))
      .withColumn("pack_last",
        greatest(col("pack_first"), // zero-token docs occupy no interval
          floor((col("seq_start") + col(tokensCol).cast("long") - 1) / budget)
            .cast("long")))
  }

  /** Fixed-size token chunking with overlap — the RAG/context-window
    * preprocessing shape: each document's token stream is cut into windows
    * of `chunkSize` tokens advancing by `chunkSize - overlap`, so
    * consecutive chunks share `overlap` tokens and the final (possibly
    * short) chunk always reaches the end of the document. Documents with
    * at most `chunkSize` tokens yield exactly one chunk.
    *
    * Map-only: the chunk list is built per row with array expressions and
    * exploded — no shuffle, scales with partitions. The per-doc transform
    * evaluates interpreted (HOF), but over ~n/step elements per doc, each
    * a bounded slice+join — linear, off any shuffle path.
    *
    * All input columns are preserved; adds `chunk_id` (0-based),
    * `chunk_text` (tokens re-joined with single spaces; tokenization is
    * [[graft.functions.TextFunctions.tokens]], i.e. lowercased), and
    * `chunk_tokens`.
    */
  def chunkTokens(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val n = size(toks)
    // ceil((n - chunkSize) / step) + 1 full-coverage chunks; only the last
    // may be short, and it still starts within the previous chunk's span
    val tail = floor((n - lit(chunkSize) + lit(step - 1)).cast("double") / step)
      .cast("int") + lit(1)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(tail)
    val chunks = transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.cast("int").as("chunk_id"),
        array_join(slice(toks, i * step + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), n - i * step).cast("int").as("chunk_tokens")))
    df.select(col("*"), explode(chunks).as("_chunk"))
      .select(col("*"), col("_chunk.chunk_id").as("chunk_id"),
        col("_chunk.chunk_text").as("chunk_text"),
        col("_chunk.chunk_tokens").as("chunk_tokens"))
      .drop("_chunk")
  }

  private val greedySchema = StructType(Seq(
    StructField("id", LongType), StructField("tokens", LongType),
    StructField("pack_id", LongType)))

  /** No-split greedy first-fit: documents are packed whole, opening a new
    * pack when the next document would overflow the budget. Rows are
    * hash-bucketed (deterministic, balanced for any key distribution) and
    * each bucket packs its documents independently in `orderCol` order —
    * packs never cross bucket boundaries, which is what makes the operator
    * embarrassingly parallel; the cost is at most one underfilled pack per
    * bucket. Oversized single documents get a pack of
    * their own rather than failing. Returns (id, tokens, pack_id). */
  def packGreedy(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long,
      numBuckets: Int = 0): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val spark = df.sparkSession
    val buckets =
      if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions
    val slim = df.select(
      col(orderCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("tokens"))
    val enc = RowEncoder.encoderFor(greedySchema)
    slim
      .repartition(buckets, col("id"))
      .sortWithinPartitions("id")
      .mapPartitions { rows =>
        var packInBucket = -1L
        var used = budget + 1L // forces a new pack on the first row
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        rows.map { r =>
          val tokens = r.getLong(1)
          if (used + tokens > budget) { packInBucket += 1; used = 0L }
          used += tokens
          // bucket-namespaced pack id keeps ids globally unique without
          // any cross-partition coordination
          Row(r.getLong(0), tokens, pid * (1L << 40) + packInBucket)
        }
      }(enc)
  }
}
