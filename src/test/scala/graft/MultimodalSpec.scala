package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageIOCodec, MediaAsset}

/**
 * ImageIO codec path: REAL decode of PNG/JPEG/BMP/GIF bytes via the
 * JDK-built-in javax.imageio (fixtures are generated deterministically
 * in-test — no binary files in the repo), with the HashCodec fallback for
 * undecodable bytes.
 */
class MultimodalSpec extends SparkSpec {

  /** A deterministic w×h RGB test card (diagonal gradient + quadrant tint). */
  private def testCard(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(w - 1, 1)
      val g = (y * 255) / math.max(h - 1, 1)
      val b = if (x < w / 2 ^ y < h / 2) 200 else 40
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"ImageIO lacks $fmt writer")
    baos.toByteArray
  }

  test("decode: real width/height/format for png, jpeg, bmp, gif") {
    for ((fmt, expected) <- Seq("png" -> "png", "jpg" -> "jpeg",
        "bmp" -> "bmp", "gif" -> "gif")) {
      val meta = ImageIOCodec.decode(
        MediaAsset(1L, "image", encode(testCard(37, 23), fmt)))
      assert(meta.width == 37 && meta.height == 23, s"$fmt dims")
      assert(meta.media_type == expected, s"$fmt format name")
      assert(meta.n_frames == 1 && meta.duration_ms == 0L)
    }
  }

  test("decode: undecodable bytes fall back to the deterministic HashCodec") {
    val junk = MediaAsset(2L, "audio", Array.tabulate[Byte](64)(i => (i * 7).toByte))
    val viaImage = ImageIOCodec.decode(junk)
    val viaHash = Multimodal.HashCodec.decode(junk)
    assert(viaImage == viaHash, "fallback must equal HashCodec exactly")
  }

  test("embed: pooled grayscale grid reflects actual pixel values") {
    // Uniform white vs uniform black: embeddings must be ~1.0 vs 0.0.
    val white = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) white.setRGB(x, y, 0xffffff)
    val black = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    val ew = ImageIOCodec.embed(MediaAsset(3L, "image", encode(white, "png")), 16)
    val eb = ImageIOCodec.embed(MediaAsset(4L, "image", encode(black, "png")), 16)
    assert(ew.length == 16 && eb.length == 16)
    assert(ew.forall(v => v > 0.99f), s"white card: ${ew.mkString(",")}")
    assert(eb.forall(v => v < 0.01f), s"black card: ${eb.mkString(",")}")
    // Deterministic.
    assert(ImageIOCodec.embed(MediaAsset(3L, "image", encode(white, "png")), 16)
      .sameElements(ew))
  }

  test("resize: output re-decodes at the target resolution") {
    val resized = ImageIOCodec.resize(
      MediaAsset(5L, "image", encode(testCard(64, 48), "png")), 20, 10)
    val meta = ImageIOCodec.decode(MediaAsset(5L, "image", resized))
    assert(meta.media_type == "png" && meta.width == 20 && meta.height == 10)
  }

  test("mapPartitions plumbing runs the ImageIO codec distributed") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val assets = (0L until 12L)
      .map(i => MediaAsset(i, "image",
        encode(testCard(8 + i.toInt, 6 + i.toInt), "png")))
      .toDS()
    val meta = Multimodal.decodeMeta(assets, ImageIOCodec)
      .collect().map(m => m.asset_id -> m).toMap
    assert(meta.size == 12)
    meta.foreach { case (id, m) =>
      assert(m.width == 8 + id.toInt && m.height == 6 + id.toInt)
      assert(m.media_type == "png")
    }
    val feats = Multimodal.extractFeatures(assets, dim = 9, ImageIOCodec).collect()
    assert(feats.length == 12 && feats.forall(_.feature.length == 9))
  }
}
