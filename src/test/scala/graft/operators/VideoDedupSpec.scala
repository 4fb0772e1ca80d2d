package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Video fingerprint dedup: per-frame aHash of REALLY decoded MJPEG
  * frames, majority-voted across sampled frames, banded hamming pairing —
  * the third leg of the multimodal dedup trio. */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Multimodal.packAvi(spark.range(40).toDF("id"), "id")

  test("exact video copies pair at hamming 0; organic clips stay distinct") {
    val planted = base.where(col("media_id") < 5)
      .withColumn("media_id", col("media_id") + 1000L)
    val media = base.unionByName(planted)
    val fps = Multimodal.videoFingerprint(media)
    assert(fps.where(col("vfp").isNull).count() == 0, "all AVIs decode")
    val pairs = Multimodal.videoDupPairs(media, maxHamming = 0).cache()
    assert(pairs.where(col("idB") === col("idA") + 1000L && col("idA") < 5)
      .count() == 5, "all planted copies recovered")
    assert(pairs.where(col("idA") < 40 && col("idB") < 40).count() == 0,
      "organic fingerprint collision")
  }

  test("a single corrupt frame does not move the majority-vote fingerprint far") {
    val one = base.where(col("media_id") === 9).collect().head
    val payload = one.getAs[Array[Byte]](2)
    // corrupt the LAST frame chunk's JPEG body (it fails to decode and
    // simply drops out of the vote)
    val frames = Multimodal.AviMjpeg.frameChunks(payload)
    val last = frames.last
    val mutated = payload.clone()
    // find the last frame's bytes inside the container and zero them
    val idx = {
      var i = mutated.length - last.length
      while (i > 0 && !mutated.slice(i, i + last.length).sameElements(last)) i -= 1
      i
    }
    java.util.Arrays.fill(mutated, idx, idx + last.length, 0.toByte)
    val media = spark.createDataFrame(Seq(
      (9L, "video/x-msvideo", payload, Map.empty[String, String]),
      (2009L, "video/x-msvideo", mutated, Map.empty[String, String])))
      .toDF("media_id", "media_type", "payload", "meta")
    val fp = Multimodal.videoFingerprint(media, everyN = 1)
      .orderBy("media_id").select("vfp").as[Long].collect()
    val hamming = java.lang.Long.bitCount(fp(0) ^ fp(1))
    // packAvi frames are NOISE (the worst case for a majority vote: with
    // ~6 frames many bits sit at the 3-3 margin, so removing one vote
    // flips several); real video's temporally-correlated frames vote with
    // wide margins. The bound here is "well under the ~32 bits two
    // unrelated fingerprints differ by", not perceptual closeness.
    assert(hamming <= 20, s"one corrupt frame moved the fingerprint by $hamming bits")
  }

  test("payloads with no decodable frames fingerprint to null") {
    val junk = spark.range(2).select(
      (col("id") + 500L).as("media_id"), lit("video/junk").as("media_type"),
      lit(Array[Byte](0, 1, 2, 3)).as("payload"),
      typedLit(Map.empty[String, String]).as("meta"))
    val fps = Multimodal.videoFingerprint(base.unionByName(junk))
    assert(fps.where(col("vfp").isNull).count() == 2)
  }
}
