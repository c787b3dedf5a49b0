package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed per-partition with lazily-initialized
 * decoders. The Spark-side machinery — schema, partition-batched execution,
 * deterministic outputs — is real and tested. Codecs behind the
 * [[MediaCodec]] seam: [[ImageIOCodec]] (REAL JDK decode for
 * PNG/JPEG/BMP/GIF), [[AudioCodec]] (REAL JDK decode for WAV/AIFF/AU PCM),
 * [[JdkCodec]] routing by media_type, and the deterministic hash-derived
 * [[HashCodec]] stand-in for formats this container ships no codec for
 * (mp3/ogg/video) and for q50's engine-portable oracle.
 *
 * At scale: assets live in parquet/object storage as (asset_id, media_type,
 * content, meta); decode/feature stages are `mapPartitions` over
 * `Dataset[MediaAsset]` so a decoder loads once per partition (the same
 * per-executor-singleton pattern the reference needs for its NER model —
 * /root/reference/src/EntityExtractor.groovy:13,23 — and the Scala analog
 * of a Python `mapInPandas` batch UDF).
 */
object Multimodal {

  case class MediaAsset(asset_id: Long, media_type: String, content: Array[Byte])
  case class DecodedMeta(asset_id: Long, media_type: String, width: Int,
      height: Int, duration_ms: Long, n_frames: Int)
  case class MediaFeature(asset_id: Long, feature: Array[Float])
  case class FrameSample(asset_id: Long, frame_idx: Int, frame: Array[Byte])
  case class ResizedAsset(asset_id: Long, media_type: String, width: Int,
      height: Int, content: Array[Byte])

  /**
   * The codec seam. Replace `decode` with a real Tika/ImageIO/ffmpeg call
   * in production; the fake derives metadata deterministically from content
   * bytes so tests and oracle runs are stable.
   */
  trait MediaCodec extends Serializable {
    def decode(a: MediaAsset): DecodedMeta
    def embed(a: MediaAsset, dim: Int): Array[Float]
    def sampleFrames(a: MediaAsset, every: Int): Iterator[FrameSample]
    def resize(a: MediaAsset, width: Int, height: Int): Array[Byte]
  }

  /** Deterministic stand-in codec (STUB — see class doc). All fake values
    * derive from md5 of the content bytes, so a SQL engine with `md5` can
    * replicate them exactly — which puts the mapPartitions plumbing behind
    * q50 under the driver's DuckDB hash-compare instead of a rows-only
    * check (a wrap-around LCG would not be portable: DuckDB BIGINT
    * arithmetic errors on overflow). */
  object HashCodec extends MediaCodec {
    private def md5hex(prefix: String, bytes: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(prefix.getBytes("UTF-8"))
      md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
    }
    private def hexLong(hex: String, from: Int, len: Int): Long =
      java.lang.Long.parseLong(hex.substring(from, from + len), 16)
    def decode(a: MediaAsset): DecodedMeta = {
      val h = md5hex("", a.content)
      DecodedMeta(a.asset_id, a.media_type,
        width = 64 + (hexLong(h, 0, 8) % 1024).toInt,
        height = 64 + (hexLong(h, 8, 8) % 1024).toInt,
        duration_ms = if (a.media_type == "image") 0L
          else hexLong(h, 16, 12) % 600000L,
        n_frames = if (a.media_type == "video")
          1 + (hexLong(h, 28, 4) % 512).toInt else 1)
    }
    def embed(a: MediaAsset, dim: Int): Array[Float] =
      Array.tabulate(dim)(i =>
        (hexLong(md5hex(s"$i|", a.content), 0, 15) % 1000) / 1000.0f)
    def sampleFrames(a: MediaAsset, every: Int): Iterator[FrameSample] = {
      val meta = decode(a)
      (0 until meta.n_frames by every).iterator.map(i =>
        FrameSample(a.asset_id, i, a.content.take(16)))
    }
    // Deterministic stand-in: real codecs re-encode; the fake emits a
    // width*height/64-byte payload derived from content + target dims so
    // output size tracks the target resolution.
    def resize(a: MediaAsset, width: Int, height: Int): Array[Byte] = {
      val n = math.max(1, width * height / 64)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$width|$height|".getBytes("UTF-8") ++ a.content)
      Array.tabulate(n)(i => digest(i % digest.length))
    }
  }

  /**
   * Real image decode via JDK-built-in `javax.imageio` — no external jars:
   * width/height/format for PNG/JPEG/BMP/GIF content bytes (n_frames counts
   * GIF animation frames), [[HashCodec]] fallback for bytes ImageIO cannot
   * read (audio/video/garbage — this container ships no codecs for those;
   * the fallback keeps pipelines total and deterministic). `embed` is a
   * real pixel computation: the image is average-pooled onto a
   * ceil(sqrt(dim))-sided grid of mean grayscale values (row-major, zero
   * padding past the grid) — a genuine, deterministic visual feature.
   * `resize` re-encodes a bilinear-scaled frame as PNG. ImageIO readers
   * are allocated per call inside mapPartitions-driven iteration —
   * stream/reader instances are NOT thread-safe and must not be shared.
   */
  object ImageIOCodec extends MediaCodec {
    import java.io.ByteArrayInputStream

    private def withReader[T](content: Array[Byte])(
        f: (javax.imageio.ImageReader) => T): Option[T] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(content))
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try Some(f(r)) finally r.dispose()
        }
      } catch { case _: Exception => None } finally if (iis != null) iis.close()
    }

    def decode(a: MediaAsset): DecodedMeta =
      withReader(a.content) { r =>
        val frames =
          try r.getNumImages(true) catch { case _: Exception => 1 }
        DecodedMeta(a.asset_id, r.getFormatName.toLowerCase,
          width = r.getWidth(0), height = r.getHeight(0),
          duration_ms = 0L, n_frames = math.max(frames, 1))
      }.getOrElse(HashCodec.decode(a))

    private def readImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(content)))
      catch { case _: Exception => None }

    def embed(a: MediaAsset, dim: Int): Array[Float] =
      readImage(a.content).map { img =>
        val grid = math.ceil(math.sqrt(dim.toDouble)).toInt
        val out = Array.ofDim[Float](dim)
        val (w, h) = (img.getWidth, img.getHeight)
        var gy = 0
        while (gy < grid) {
          var gx = 0
          while (gx < grid) {
            val i = gy * grid + gx
            if (i < dim) {
              val x0 = gx * w / grid; val x1 = math.max((gx + 1) * w / grid, x0 + 1)
              val y0 = gy * h / grid; val y1 = math.max((gy + 1) * h / grid, y0 + 1)
              var sum = 0.0; var n = 0
              var y = y0
              while (y < math.min(y1, h)) {
                var x = x0
                while (x < math.min(x1, w)) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                  n += 1; x += 1
                }
                y += 1
              }
              out(i) = if (n == 0) 0f else (sum / n / 255.0).toFloat
            }
            gx += 1
          }
          gy += 1
        }
        out
      }.getOrElse(HashCodec.embed(a, dim))

    /** Sampled-frame bound per asset: the single-reader pass materializes
      * its PNG re-encodes before the reader is disposed, so an unbounded
      * animation would hold every sampled frame in memory at once — cap
      * it (same guard philosophy as the LSH bucket caps; raise only with
      * the memory budget to match). */
    val MaxSampledFrames = 256

    // One reader scope for ALL sampled frames: reopening the container per
    // frame would re-parse from byte 0 each time (and GIF delta frames can
    // force decoding 0..i), turning an N-frame sample quadratic.
    def sampleFrames(a: MediaAsset, every: Int): Iterator[FrameSample] =
      withReader(a.content) { r =>
        val frames = math.max(
          try r.getNumImages(true) catch { case _: Exception => 1 }, 1)
        (0 until frames by every).take(MaxSampledFrames).flatMap { i =>
          // A frame that fails to read/re-encode is SKIPPED, not
          // substituted: emitting placeholder bytes here would hand
          // downstream resize/embed stages garbage indistinguishable
          // from a real PNG.
          try {
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(r.read(i), "png", baos)
            Some(FrameSample(a.asset_id, i, baos.toByteArray))
          } catch { case _: Exception => None }
        }.toList // materialize inside the reader scope (disposed on exit)
      } match {
        // Reader failed to open, OR it opened but EVERY frame failed
        // (e.g. a truncated container with a parseable header): fall back
        // to HashCodec so the asset stays visible to frame-level
        // consumers instead of silently vanishing.
        case Some(fs) if fs.nonEmpty => fs.iterator
        case _ => HashCodec.sampleFrames(a, every)
      }

    def resize(a: MediaAsset, width: Int, height: Int): Array[Byte] =
      readImage(a.content).map { img =>
        val dst = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", baos)
        baos.toByteArray
      }.getOrElse(HashCodec.resize(a, width, height))
  }

  /**
   * Real audio decode via JDK-built-in `javax.sound.sampled` — no external
   * jars: WAV/AIFF/AU (PCM) content bytes. [[HashCodec]] fallback for
   * anything the JDK cannot parse (mp3/ogg/video/garbage — codecs this
   * container doesn't ship), keeping pipelines total and deterministic.
   *
   * [[DecodedMeta]] field mapping for audio (the schema is shared with
   * images): `width` = channels, `height` = bits per sample,
   * `duration_ms` = real clip duration, `n_frames` = PCM frame count.
   *
   * `embed` is a real signal feature: the RMS energy envelope — PCM
   * samples split into `dim` equal windows, root-mean-square per window,
   * normalized to [0, 1] by full scale. `sampleFrames` emits every-th
   * one-second PCM segment (raw little-endian 16-bit mono-mixed bytes).
   * `resize(w, h)` = naive linear-interpolation resample of the mono mix
   * to exactly w*h samples (16-bit LE) — the real length-normalization
   * shape an audio feature pipeline needs before fixed-input models.
   */
  object AudioCodec extends MediaCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    /** Decode to a mono double stream in [-1, 1] plus the source format;
      * None when the JDK has no parser for the bytes. */
    private def pcm(content: Array[Byte]): Option[(Array[Double], AudioFormat)] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          // Normalize to signed 16-bit PCM (the JDK converts U8/big-endian).
          val target = new AudioFormat(fmt.getSampleRate, 16,
            fmt.getChannels, true, false)
          val conv = AudioSystem.getAudioInputStream(target, in)
          try {
            val bytes = conv.readAllBytes()
            val ch = target.getChannels
            val nFrames = bytes.length / (2 * ch)
            val mono = Array.ofDim[Double](nFrames)
            var i = 0
            while (i < nFrames) {
              var sum = 0.0
              var c = 0
              while (c < ch) {
                val o = (i * ch + c) * 2
                sum += ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
                c += 1
              }
              mono(i) = sum / ch / 32768.0
              i += 1
            }
            Some((mono, fmt))
          } finally conv.close()
        } finally in.close()
      } catch { case _: Exception => None }

    def decode(a: MediaAsset): DecodedMeta =
      pcm(a.content).map { case (mono, fmt) =>
        DecodedMeta(a.asset_id, "audio",
          width = fmt.getChannels,
          height = if (fmt.getSampleSizeInBits > 0) fmt.getSampleSizeInBits else 16,
          duration_ms = math.round(mono.length * 1000.0 / fmt.getSampleRate),
          n_frames = mono.length)
      }.getOrElse(HashCodec.decode(a))

    def embed(a: MediaAsset, dim: Int): Array[Float] =
      pcm(a.content).map { case (mono, _) =>
        val out = Array.ofDim[Float](dim)
        if (mono.nonEmpty) {
          var w = 0
          while (w < dim) {
            val s = w.toLong * mono.length / dim
            val e = math.max(((w + 1).toLong * mono.length / dim).toInt, s.toInt + 1)
            var sum = 0.0
            var i = s.toInt
            while (i < math.min(e, mono.length)) { sum += mono(i) * mono(i); i += 1 }
            val n = math.max(math.min(e, mono.length) - s.toInt, 1)
            out(w) = math.sqrt(sum / n).toFloat
            w += 1
          }
        }
        out
      }.getOrElse(HashCodec.embed(a, dim))

    def sampleFrames(a: MediaAsset, every: Int): Iterator[FrameSample] =
      pcm(a.content) match {
        case Some((mono, fmt)) if mono.nonEmpty =>
          val seg = math.max(fmt.getSampleRate.toInt, 1) // 1-second segments
          val nSeg = (mono.length + seg - 1) / seg
          (0 until nSeg by math.max(every, 1)).iterator.map { s =>
            val slice = mono.slice(s * seg, math.min((s + 1) * seg, mono.length))
            FrameSample(a.asset_id, s, toPcm16(slice))
          }
        case _ => HashCodec.sampleFrames(a, every)
      }

    def resize(a: MediaAsset, width: Int, height: Int): Array[Byte] =
      pcm(a.content).map { case (mono, _) =>
        val n = math.max(width * height, 1)
        val out = Array.ofDim[Double](n)
        if (mono.nonEmpty) {
          var i = 0
          while (i < n) {
            val pos = if (n == 1) 0.0 else i.toDouble * (mono.length - 1) / (n - 1)
            val lo = pos.toInt
            val hi = math.min(lo + 1, mono.length - 1)
            out(i) = mono(lo) + (mono(hi) - mono(lo)) * (pos - lo)
            i += 1
          }
        }
        toPcm16(out)
      }.getOrElse(HashCodec.resize(a, width, height))

    private def toPcm16(samples: Array[Double]): Array[Byte] = {
      val out = Array.ofDim[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val v = math.max(-1.0, math.min(1.0, samples(i)))
        val s = math.round(v * 32767).toShort
        out(2 * i) = (s & 0xff).toByte
        out(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** JDK-native composite codec: images via [[ImageIOCodec]], audio via
    * [[AudioCodec]], everything else (video, unknown) the deterministic
    * [[HashCodec]] — routed by `media_type`, so one codec instance serves
    * a mixed asset table inside one mapPartitions pass. */
  object JdkCodec extends MediaCodec {
    private def route(a: MediaAsset): MediaCodec = a.media_type match {
      case "image" => ImageIOCodec
      case "audio" => AudioCodec
      case _       => HashCodec
    }
    def decode(a: MediaAsset): DecodedMeta = route(a).decode(a)
    def embed(a: MediaAsset, dim: Int): Array[Float] = route(a).embed(a, dim)
    def sampleFrames(a: MediaAsset, every: Int): Iterator[FrameSample] =
      route(a).sampleFrames(a, every)
    def resize(a: MediaAsset, width: Int, height: Int): Array[Byte] =
      route(a).resize(a, width, height)
  }

  /**
   * Decode metadata for every asset. `mapPartitions` so the codec is
   * constructed once per partition, not per row.
   */
  def decodeMeta(assets: Dataset[MediaAsset], codec: MediaCodec = HashCodec)
      (implicit s: SparkSession): Dataset[DecodedMeta] = {
    import s.implicits._
    assets.mapPartitions { it =>
      val c = codec // per-partition init point (real codecs open contexts here)
      it.map(c.decode)
    }
  }

  /** Feature extraction (embedding) per asset, batched per partition. */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 16,
      codec: MediaCodec = HashCodec)(implicit s: SparkSession): Dataset[MediaFeature] = {
    import s.implicits._
    assets.mapPartitions { it =>
      val c = codec
      it.map(a => MediaFeature(a.asset_id, c.embed(a, dim)))
    }
  }

  /** Frame sampling: 1 row per sampled frame (flatMap shape — a generator). */
  def sampleFrames(assets: Dataset[MediaAsset], every: Int = 10,
      codec: MediaCodec = HashCodec)(implicit s: SparkSession): Dataset[FrameSample] = {
    import s.implicits._
    assets.mapPartitions { it =>
      val c = codec
      it.flatMap(a => c.sampleFrames(a, every))
    }
  }

  /** Resize every asset to a target resolution (batched per partition —
    * the real transform is the expensive re-encode; the plumbing here is
    * the production shape: opaque bytes in, opaque bytes + typed dims out). */
  def resizeAssets(assets: Dataset[MediaAsset], width: Int, height: Int,
      codec: MediaCodec = HashCodec)(implicit s: SparkSession): Dataset[ResizedAsset] = {
    import s.implicits._
    assets.mapPartitions { it =>
      val c = codec
      it.map(a => ResizedAsset(a.asset_id, a.media_type, width, height,
        c.resize(a, width, height)))
    }
  }

  /** Lift any (id, string) table into a fake binary asset table (dev/test). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String,
      mediaType: String = "image")(implicit s: SparkSession): Dataset[MediaAsset] = {
    import s.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("content")).as[MediaAsset]
  }

  /**
   * 64-bit average-hash (aHash) per asset: the codec's 8×8 grid-mean
   * embedding thresholded at its own mean, packed little-endian into one
   * long — the classic perceptual image fingerprint (robust to re-encode,
   * resize, and mild edits; cheap enough to run inline with decode). On
   * the [[ImageIOCodec]] path this is a REAL perceptual hash of decoded
   * pixels; on [[HashCodec]] it degrades to a deterministic content hash
   * (exact-dup only), keeping the pipeline total where codecs are absent.
   */
  def perceptualHashes(assets: Dataset[MediaAsset],
      codec: MediaCodec = HashCodec)(implicit s: SparkSession): DataFrame = {
    import s.implicits._
    assets.mapPartitions { it =>
      val c = codec
      it.map { a =>
        val g = c.embed(a, 64)
        val mean = g.sum / 64f
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (g(i) > mean) bits |= (1L << i)
          i += 1
        }
        (a.asset_id, bits)
      }
    }.toDF("asset_id", "phash")
  }

  /**
   * Near-duplicate image pairs from a (asset_id, phash) table: Hamming
   * distance ≤ `maxHamming` (≤ 3), found by banding — each 64-bit hash
   * splits into four 16-bit bands, and by pigeonhole any pair within
   * Hamming 3 shares at least one INTACT band, so candidates are an
   * equi-join on (band_idx, band_value), never all-pairs (the SimHash
   * banding discipline, Dedup.scala's cap rationale applies at 100 TB:
   * pre-collapse identical hashes first — [[phashExactGroups]] — so a
   * million re-posts of one image cost one representative here).
   * Candidates verify with a codegen'd `bit_count(xor)`.
   */
  def phashNearDup(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band pigeonhole guarantees recall only up to Hamming 3")
    val bands = hashes.select(col("asset_id"), col("phash"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("band",
        expr("shiftrightunsigned(phash, b * 16) & 65535"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.band") === col("y.band") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("id1"), col("y.asset_id").as("id2"),
        col("x.phash").as("h1"), col("y.phash").as("h2"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(h1 ^ h2) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Identical-hash groups (the pre-collapse for [[phashNearDup]]):
    * phash → member count + sorted members, groups of ≥ 2 only. */
  def phashExactGroups(hashes: DataFrame): DataFrame =
    hashes.groupBy(col("phash"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("asset_id"))).as("members"))
      .filter(col("n") >= 2)
}
