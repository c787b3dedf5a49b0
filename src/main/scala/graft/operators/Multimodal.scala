package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed per-partition with lazily-initialized
 * decoders. The Spark-side machinery — schema, partition-batched execution,
 * deterministic outputs — is real and tested; the actual codec call is
 * STUBBED behind [[MediaCodec]] (this container ships no image/audio libs),
 * with a deterministic hash-derived fake so pipelines are reproducible.
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
}
