package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed batch-wise with `mapPartitions`
  * (the Scala analog of `mapInPandas` — one iterator pass per partition, no
  * per-row driver involvement, arbitrary native/JNI decode inside).
  *
  * The actual codec step is STUBBED with a deterministic fake (this
  * container has no image/audio libraries): [[FakeCodec]] derives metadata
  * from payload bytes. The Spark-side contract — schema, batch shape,
  * partitioning, null behavior — is real and tested; swap [[FakeCodec]]
  * for a real decoder (javacv, TwelveMonkeys, ffmpeg-cli) without touching
  * the plumbing.
  */
object Multimodal {

  /** Media row contract: payload + media_type + open string metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Pack arbitrary rows into the media contract (payload = utf-8 of a
    * source column; stands in for image/audio bytes in fixtures). */
  def pack(df: DataFrame, idCol: String, contentCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(contentCol), "UTF-8").as("payload"),
      map(lit("origin"), lit(contentCol)).as("meta"))

  /** STUB codec — deterministic fake "decode". A real implementation
    * replaces exactly these three functions. */
  object FakeCodec {
    /** "Decode" image dimensions from payload bytes (deterministic). */
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      if (payload == null || payload.isEmpty) (0, 0)
      else {
        val w = 64 + (math.abs(payload.head.toInt) % 192) * 8
        val h = 64 + (math.abs(payload.last.toInt) % 108) * 8
        (w, h)
      }
    }
    /** "Resize": truncate/pad payload to the target byte budget. */
    def resize(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      if (payload == null) Array.emptyByteArray
      else if (payload.length <= maxBytes) payload
      else payload.take(maxBytes)
    /** "Frame sample": every nth slice of the payload as a frame. */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, everyN: Int): Seq[Array[Byte]] =
      if (payload == null || payload.isEmpty) Seq.empty
      else payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % everyN == 0 => chunk }.toSeq
  }

  private val decodedSchema: StructType = mediaSchema
    .add("width", IntegerType).add("height", IntegerType)
    .add("n_bytes", LongType)

  /** Feature-extract pass: one `mapPartitions` over payload batches adding
    * (width, height, n_bytes). Runs wherever the scan runs — the decode
    * cost scales out with partitions, which is the point of the contract. */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h) = FakeCodec.imageDims(payload)
          Row.fromSeq(r.toSeq ++ Seq(w, h,
            if (payload == null) 0L else payload.length.toLong))
        }
      }(enc)
  }

  /** Resize pass: payload capped at `maxBytes`, batch-wise. */
  def resizePayload(media: DataFrame, maxBytes: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val resized = FakeCodec.resize(r.getAs[Array[Byte]]("payload"), maxBytes)
          Row(r.get(0), r.get(1), resized, r.get(3))
        }
      }(enc)
  }

  private val framesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame-sampling pass: explode each payload into sampled frame chunks
    * (1:N flatMap inside the partition iterator — the video shape). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 1024, everyN: Int = 2): DataFrame = {
    val enc = RowEncoder.encoderFor(framesSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          FakeCodec.sampleFrames(r.getAs[Array[Byte]]("payload"), frameBytes, everyN)
            .zipWithIndex.map { case (f, i) => Row(r.getLong(0), i, f) }
        }
      }(enc)
  }
}
