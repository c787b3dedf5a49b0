package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageIOCodec, MediaAsset}

/**
 * Perceptual-hash (aHash) near-dup over REAL decoded pixels: a re-encoded
 * or mildly-edited image must land within Hamming ≤ 3 of its original,
 * a structurally different image must not, and the banded candidate join
 * must find exactly the verified pairs.
 */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._
  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private def card(w: Int, h: Int, noise: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(w - 1, 1)
      val g = (y * 255) / math.max(h - 1, 1)
      val b = if (x < w / 2 ^ y < h / 2) 200 else 40
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    // Mild edit: overwrite a `noise`-pixel square corner with white.
    for (y <- 0 until math.min(noise, h); x <- 0 until math.min(noise, w))
      img.setRGB(x, y, 0xffffff)
    img
  }

  private def inverted(w: Int, h: Int): BufferedImage = {
    val base = card(w, h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ~base.getRGB(x, y) & 0xffffff)
    img
  }

  private def enc(img: BufferedImage, fmt: String): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos))
    baos.toByteArray
  }

  private def assets = Seq(
    MediaAsset(1L, "image", enc(card(64, 64), "png")),
    MediaAsset(2L, "image", enc(card(64, 64), "bmp")),  // re-encode of 1
    MediaAsset(3L, "image", enc(card(64, 64, noise = 6), "png")), // mild edit
    MediaAsset(4L, "image", enc(inverted(64, 64), "png"))).toDS()

  test("re-encoded image hashes identically; mild edit stays within Hamming 3") {
    val h = Multimodal.perceptualHashes(assets, ImageIOCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "png vs bmp re-encode must hash identically")
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 3, "mild edit too far")
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 3, "inverse too close")
  }

  test("banded near-dup finds exactly the verified pairs") {
    val hashes = Multimodal.perceptualHashes(assets, ImageIOCodec)
    // Pre-collapse (1 and 2 tie): min-id representative per hash.
    val reps = hashes.groupBy("phash")
      .agg(org.apache.spark.sql.functions.min("asset_id").as("asset_id"))
      .select("asset_id", "phash")
    val pairs = Multimodal.phashNearDup(reps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"got $pairs")
    val groups = Multimodal.phashExactGroups(hashes).collect()
    assert(groups.length == 1 &&
      groups.head.getSeq[Long](2) == Seq(1L, 2L))
  }

  test("exhaustive check: banded pairs equal brute-force pairs on synthetic hashes") {
    // 64 hashes around two centers plus random fills — banding must equal
    // the all-pairs Hamming filter exactly (recall AND precision).
    val rnd = new scala.util.Random(3)
    val center1 = rnd.nextLong(); val center2 = rnd.nextLong()
    def flip(h: Long, k: Int): Long =
      (1 to k).foldLeft(h)((a, _) => a ^ (1L << rnd.nextInt(64)))
    val hs = (0 until 20).map(i => (i.toLong, flip(center1, i % 4))) ++
      (20 until 40).map(i => (i.toLong, flip(center2, i % 4))) ++
      (40 until 64).map(i => (i.toLong, rnd.nextLong()))
    val distinctHs = hs.groupBy(_._2).map(_._2.head).toSeq // unique phash reps
    val expected = (for {
      (i1, h1) <- distinctHs; (i2, h2) <- distinctHs
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    val got = Multimodal.phashNearDup(distinctHs.toDF("asset_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }
}
