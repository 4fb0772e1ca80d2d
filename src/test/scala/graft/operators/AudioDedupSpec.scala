package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio fingerprint dedup: RMS-energy-envelope fingerprints over REAL
  * decoded PCM + banded hamming pairing — the audio twin of the image
  * aHash. */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Multimodal.packWav(spark.range(40).toDF("id"), "id")

  test("exact audio copies pair at hamming 0; organic clips stay distinct") {
    val planted = base.where(col("media_id") < 5)
      .withColumn("media_id", col("media_id") + 1000L)
    val media = base.unionByName(planted)
    val fps = Multimodal.audioFingerprint(media)
    assert(fps.where(col("afp").isNull).count() == 0, "all WAVs decode")
    val pairs = Multimodal.audioDupPairs(media, maxHamming = 0).cache()
    assert(pairs.where(col("idB") === col("idA") + 1000L && col("idA") < 5)
      .count() == 5, "all planted copies recovered")
    assert(pairs.where(col("hamming") =!= 0).count() == 0)
    // distinct ids produce distinct envelopes — no organic hamming-0 pairs
    assert(pairs.where(col("idA") < 40 && col("idB") < 40).count() == 0,
      "organic fingerprint collision")
  }

  test("uniform gain change preserves the fingerprint") {
    // halve every sample of one clip: RMS scales uniformly, the
    // mean-thresholded envelope is gain-invariant
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val one = base.where(col("media_id") === 7).collect().head
    val payload = one.getAs[Array[Byte]](2)
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val bytes = ais.readAllBytes()
    var i = 0
    while (i < bytes.length / 2) {
      val v = (((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort / 2).toShort
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, bytes.length / 2),
      AudioFileFormat.Type.WAVE, out)
    val quiet = spark.createDataFrame(Seq(
      (2007L, "audio/wav", out.toByteArray, Map.empty[String, String])))
      .toDF("media_id", "media_type", "payload", "meta")
    val media = spark.createDataFrame(Seq(
      (one.getLong(0), one.getString(1), payload, Map.empty[String, String])))
      .toDF("media_id", "media_type", "payload", "meta")
      .unionByName(quiet)
    val fp = Multimodal.audioFingerprint(media)
      .orderBy("media_id").select("afp").as[Long].collect()
    val hamming = java.lang.Long.bitCount(fp(0) ^ fp(1))
    assert(hamming <= 4, s"gain change moved the fingerprint by $hamming bits")
  }

  test("undecodable payloads fingerprint to null and never pair") {
    val junk = spark.range(2).select(
      (col("id") + 500L).as("media_id"), lit("application/junk").as("media_type"),
      lit(Array[Byte](9, 9, 9)).as("payload"),
      typedLit(Map.empty[String, String]).as("meta"))
    val media = base.unionByName(junk)
    assert(Multimodal.audioFingerprint(media)
      .where(col("afp").isNull).count() == 2)
    val pairs = Multimodal.audioDupPairs(media, maxHamming = 0)
    assert(pairs.where(col("idA") >= 500L || col("idB") >= 500L).count() == 0)
  }
}
