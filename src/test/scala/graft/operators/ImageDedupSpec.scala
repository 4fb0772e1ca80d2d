package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual image dedup: aHash over REAL decoded pixels + banded
  * hamming pairing. Exact copies pair at hamming 0; a resized/re-encoded
  * variant stays within a few bits; undecodable payloads never hash. */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Multimodal.packPng(spark.range(40).toDF("id"), "id")

  test("exact content copies pair at hamming 0 regardless of id") {
    val planted = base.where(col("media_id") < 5)
      .withColumn("media_id", col("media_id") + 1000L)
    val media = base.unionByName(planted)
    val hashes = Multimodal.imageAHash(media)
    assert(hashes.where(col("ahash").isNull).count() == 0, "all PNGs decode")
    val pairs = Multimodal.imageDupPairs(media, maxHamming = 0).cache()
    val plantedPairs = pairs
      .where(col("idB") === col("idA") + 1000L && col("idA") < 5)
    assert(plantedPairs.count() == 5, "all planted copies recovered")
    assert(pairs.where(col("hamming") =!= 0).count() == 0)
    assert(pairs.where(col("idA") < 40 && col("idB") < 40).count() == 0,
      "organic fingerprint collision")
  }

  test("a resized re-encoded image stays within the hamming budget") {
    // a STRUCTURED image (smooth gradient): aHash is resize-robust on
    // low-frequency content — noise images (packPng) rightly are not
    import java.awt.image.BufferedImage
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 5) << 8) | 128)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val media = spark.createDataFrame(Seq(
      (7L, "image/png", buf.toByteArray, Map.empty[String, String])))
      .toDF("media_id", "media_type", "payload", "meta")
    val resized = Multimodal.resizeImageReal(media, maxDim = 16)
      .withColumn("media_id", lit(2007L))
    val h = Multimodal.imageAHash(media.unionByName(resized))
      .orderBy("media_id").select("ahash").as[Long].collect()
    val hamming = java.lang.Long.bitCount(h(0) ^ h(1))
    assert(hamming <= 8, s"resize moved the aHash by $hamming bits")
  }

  test("undecodable payloads hash to null and never pair") {
    val junk = spark.range(2).select(
      (col("id") + 500L).as("media_id"), lit("application/junk").as("media_type"),
      lit(Array[Byte](1, 2, 3)).as("payload"),
      typedLit(Map.empty[String, String]).as("meta"))
    val media = base.unionByName(junk)
    val hashes = Multimodal.imageAHash(media)
    assert(hashes.where(col("ahash").isNull).count() == 2)
    val pairs = Multimodal.imageDupPairs(media, maxHamming = 0)
    assert(pairs.where(col("idA") >= 500L || col("idB") >= 500L).count() == 0)
  }
}
