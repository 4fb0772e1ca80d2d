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
  * Images have a REAL codec ([[JdkImageCodec]], `javax.imageio` — in the
  * JDK, zero dependencies): true header dimensions, proportional resize,
  * PNG re-encode. Audio metadata is REAL for WAV/AIFF/AU
  * ([[decodeAudioMetaReal]], `javax.sound.sampled`): sample rate,
  * channels, frames, duration. Video and compressed-audio codecs don't
  * exist in the JDK, so those paths use [[FakeCodec]], a deterministic
  * stand-in deriving metadata from payload bytes; the Spark-side contract
  * — schema, batch shape, partitioning, null behavior — is identical, so
  * swapping in javacv/ffmpeg touches only the codec object.
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

  // ------------------------------------------------------- real image codec

  /** REAL image codec on `javax.imageio` (ships with the JDK — no external
    * libraries): decodes PNG/JPEG/GIF/BMP payloads, resizes with
    * Graphics2D, re-encodes PNG. Audio/video remain behind [[FakeCodec]]
    * (the JDK has no such codecs); swap in javacv/ffmpeg there.
    */
  object JdkImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Decode payload → image, None when bytes aren't a supported format. */
    def decode(payload: Array[Byte]): Option[BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else Option(ImageIO.read(new ByteArrayInputStream(payload)))

    /** Proportional resize so max(width, height) == maxDim; no-op when
      * already within budget. Returns PNG-encoded bytes. */
    def resizePng(img: BufferedImage, maxDim: Int): Array[Byte] = {
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val out =
        if (scale >= 1.0) img
        else {
          val w = math.max(1, (img.getWidth * scale).round.toInt)
          val h = math.max(1, (img.getHeight * scale).round.toInt)
          val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
          finally g.dispose()
          dst
        }
      val buf = new ByteArrayOutputStream()
      ImageIO.write(out, "png", buf)
      buf.toByteArray
    }
  }

  /** Pack each row as a REAL PNG payload whose dimensions derive
    * deterministically from the id — `w = 4 + id % 13`, `h = 3 + id % 7` —
    * so a decode of the actual image header has a closed-form oracle.
    * Encoding happens inside `mapPartitions`, same contract as every
    * codec pass. */
  def packPng(df: DataFrame, idCol: String): DataFrame = {
    import java.awt.image.BufferedImage
    val enc = RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (4 + id % 13).toInt
          val h = (3 + id % 7).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id * 31 + x * 7 + y * 13) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          Row(id, "image/png", buf.toByteArray,
            Map("w" -> w.toString, "h" -> h.toString))
        }
      }(enc)
  }

  /** Pack each row as a REAL 16-bit mono PCM WAV at 8 kHz with
    * `100 + id % 50` frames of deterministic samples — real
    * `javax.sound.sampled` metadata decode gets a closed-form oracle. */
  def packWav(df: DataFrame, idCol: String): DataFrame = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val enc = RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val frames = (100 + id % 50).toInt
          val data = new Array[Byte](frames * 2)
          var i = 0
          while (i < frames) {
            val v = (((id + i) % 256) - 128).toShort
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new AudioFormat(8000f, 16, 1, true, false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val buf = new java.io.ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
          Row(id, "audio/wav", buf.toByteArray,
            Map("frames" -> frames.toString))
        }
      }(enc)
  }

  /** Real decode pass: (width, height) from actual image headers; rows
    * whose payload isn't a decodable image get (-1, -1) rather than being
    * dropped (the pipeline decides what to do with undecodables). Same
    * mapPartitions shape as [[decodeImageMeta]]. */
  def decodeImageMetaReal(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2) // positional: schema-less rows
          val (w, h) = JdkImageCodec.decode(payload)
            .map(i => (i.getWidth, i.getHeight)).getOrElse((-1, -1))
          Row.fromSeq(r.toSeq ++ Seq(w, h,
            if (payload == null) 0L else payload.length.toLong))
        }
      }(enc)
  }

  /** Real resize pass: decodable payloads are proportionally resized to
    * `maxDim` and re-encoded PNG; undecodable payloads pass through. */
  def resizeImageReal(media: DataFrame, maxDim: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2) // positional: schema-less rows
          val resized = JdkImageCodec.decode(payload)
            .map(JdkImageCodec.resizePng(_, maxDim)).getOrElse(payload)
          Row(r.get(0), r.get(1), resized, r.get(3))
        }
      }(enc)
  }

  private val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_sec", DoubleType)))

  /** REAL audio metadata via `javax.sound.sampled` (in the JDK): sample
    * rate, channels, frame count, duration for WAV/AIFF/AU payloads.
    * Undecodable payloads yield (-1, -1, -1, -1.0). Compressed formats
    * (mp3/ogg) need an external decoder behind the same contract. */
  def decodeAudioMetaReal(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val meta =
            try {
              val in = new java.io.ByteArrayInputStream(payload)
              val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(in)
              val fmt = aff.getFormat
              val frames = aff.getFrameLength.toLong
              val dur =
                if (fmt.getFrameRate > 0) frames / fmt.getFrameRate.toDouble
                else -1.0
              (fmt.getSampleRate.toInt, fmt.getChannels, frames, dur)
            } catch { case _: Exception => (-1, -1, -1L, -1.0) }
          Row(r.getLong(0), meta._1, meta._2, meta._3, meta._4)
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
