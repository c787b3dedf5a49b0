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

  // ---- AudioCodec: REAL JDK decode of WAV (PCM) bytes, generated in-test.

  /** 16-bit LE mono WAV at `rate` Hz from [-1,1] samples. */
  private def wav(samples: Array[Double], rate: Float = 8000f,
      channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val bytes = Array.ofDim[Byte](samples.length * 2 * channels)
    samples.zipWithIndex.foreach { case (v, i) =>
      val s = math.round(math.max(-1.0, math.min(1.0, v)) * 32767).toShort
      for (c <- 0 until channels) {
        val o = (i * channels + c) * 2
        bytes(o) = (s & 0xff).toByte
        bytes(o + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  import javax.sound.sampled.{AudioFileFormat, AudioInputStream, AudioSystem}
  import graft.operators.Multimodal.{AudioCodec, JdkCodec}

  test("audio decode: real channels/bits/duration/frames from WAV bytes") {
    val samples = Array.tabulate(16000)(i => math.sin(i * 0.05)) // 2 s @ 8 kHz
    val meta = AudioCodec.decode(MediaAsset(10L, "audio", wav(samples)))
    assert(meta.media_type == "audio")
    assert(meta.width == 1 && meta.height == 16) // channels, bits
    assert(meta.n_frames == 16000)
    assert(meta.duration_ms == 2000L)
    // Stereo: channel count reflected, frame count unchanged.
    val st = AudioCodec.decode(MediaAsset(11L, "audio",
      wav(samples.take(8000), channels = 2)))
    assert(st.width == 2 && st.n_frames == 8000 && st.duration_ms == 1000L)
  }

  test("audio embed: RMS energy envelope tracks the actual signal") {
    // Silent first half, full-scale square second half → first dim/2
    // windows ~0, last dim/2 windows ~1.
    val samples = Array.tabulate(8000)(i =>
      if (i < 4000) 0.0 else { if ((i / 50) % 2 == 0) 1.0 else -1.0 })
    val e = AudioCodec.embed(MediaAsset(12L, "audio", wav(samples)), 8)
    assert(e.length == 8)
    assert(e.take(4).forall(_ < 0.01f), e.mkString(","))
    assert(e.drop(4).forall(_ > 0.9f), e.mkString(","))
  }

  test("audio resize + sampleFrames: real resample lengths and segments") {
    val samples = Array.tabulate(20000)(i => math.sin(i * 0.01)) // 2.5 s
    val a = MediaAsset(13L, "audio", wav(samples))
    // Linear resample to exactly w*h samples of 16-bit PCM.
    assert(AudioCodec.resize(a, 10, 10).length == 100 * 2)
    // 1-second segments at 8 kHz → ceil(20000/8000) = 3; every=1 keeps all.
    val frames = AudioCodec.sampleFrames(a, 1).toList
    assert(frames.map(_.frame_idx) == List(0, 1, 2))
    assert(frames.head.frame.length == 8000 * 2)
    assert(frames.last.frame.length == 4000 * 2) // 0.5 s tail
  }

  test("audio fallback + JdkCodec routing") {
    val garbage = MediaAsset(14L, "audio", Array.fill(64)(7.toByte))
    assert(AudioCodec.decode(garbage) ==
      Multimodal.HashCodec.decode(garbage))
    // JdkCodec routes by media_type: audio bytes decode as audio, image
    // bytes as image, video falls back to the hash stand-in.
    val aud = MediaAsset(15L, "audio", wav(Array.tabulate(800)(_ => 0.5)))
    assert(JdkCodec.decode(aud).n_frames == 800)
    val img = MediaAsset(16L, "image", encode(testCard(9, 7), "png"))
    assert(JdkCodec.decode(img).width == 9)
    val vid = MediaAsset(17L, "video", Array.fill(32)(3.toByte))
    assert(JdkCodec.decode(vid) == Multimodal.HashCodec.decode(vid))
  }
}
