package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark side is real — schema, partition-preserving mapPartitions
  * batches, deterministic outputs. The MEDIA DECODE ITSELF IS A STUB
  * (`StubDecoder`): this container has no image/audio libraries, so the
  * decoder derives deterministic fake dimensions/features from the
  * payload bytes. Swapping in a real decoder (e.g. javacv/TwelveMonkeys)
  * changes only `StubDecoder`'s body, not the pipeline plumbing.
  *
  * Scale: payloads never shuffle except where explicitly repartitioned;
  * decode runs partition-local with a per-partition decoder instance
  * (the real-world pattern for native-lib decoders); features are small
  * fixed-size vectors so downstream joins/aggs never carry the blobs.
  */
object Multimodal {

  /** One media asset: opaque payload + typed envelope. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedMeta(asset_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long)

  final case class AssetFeatures(asset_id: Long, features: Array[Float])

  final case class Frame(asset_id: Long, frame_idx: Int, frame_ts_ms: Long,
      payload: Array[Byte])

  /** STUB decode: a real implementation would hand `payload` to an image
    * /audio codec here. The fake is a pure function of the bytes, so
    * tests and reruns are deterministic.
    */
  object StubDecoder {
    def dims(payload: Array[Byte]): (Int, Int) = {
      val h = bytesHash(payload)
      (64 + (Math.floorMod(h, 16L) * 64).toInt,
        64 + (Math.floorMod(h >> 8, 16L) * 64).toInt)
    }
    def durationMs(payload: Array[Byte]): Long =
      1000L + Math.floorMod(bytesHash(payload), 60000L)
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val h = bytesHash(payload)
      Array.tabulate(dim)(i => (Math.floorMod(h * (i + 1), 1000L) / 1000.0f))
    }
    /** STUB resize: output bytes shrink with the pixel-area ratio (a
      * real codec would decode, scale, re-encode); strided sampling
      * keeps it a pure deterministic function of (payload, scale).
      */
    def resize(payload: Array[Byte], scale: Double): Array[Byte] =
      if (payload.isEmpty) payload // empty-text assets stay empty
      else {
        val outLen = math.max(1, (payload.length * scale * scale).toInt)
        Array.tabulate(outLen)(i =>
          payload((i.toLong * payload.length / outLen).toInt))
      }
    private def bytesHash(b: Array[Byte]): Long =
      b.foldLeft(1125899906842597L)((acc, x) => acc * 31 + x)
  }

  /** Wrap a text/doc table as a binary asset table (fixture builder:
    * payload = UTF-8 bytes; kind round-robins image/audio/video).
    */
  def assetsFromDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Decode metadata, partition-local batches (mapPartitions so a real
    * decoder amortizes per-partition init).
    */
  def decodeMeta(spark: SparkSession, assets: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val (w, h) = StubDecoder.dims(a.payload)
        DecodedMeta(a.asset_id, a.kind, a.payload.length, w, h,
          if (a.kind == "image") 0L else StubDecoder.durationMs(a.payload))
      }
    }
  }

  /** Fixed-size feature vectors per asset (the embedding-extraction
    * slot of a training pipeline; joins downstream carry 16 floats, not
    * the payload).
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame,
      dim: Int = 16): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map(a => AssetFeatures(a.asset_id, StubDecoder.features(a.payload, dim)))
    }
  }

  final case class ResizedImage(asset_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize image assets into a bounding box, aspect-preserving,
    * partition-local; images already inside the box pass through at
    * scale 1. The byte transform is [[StubDecoder.resize]] — swapping
    * in a real codec changes only that body, the plumbing (kind filter,
    * batch shape, envelope schema) is the production shape.
    */
  def resizeImages(spark: SparkSession, assets: DataFrame,
      maxW: Int = 256, maxH: Int = 256): Dataset[ResizedImage] = {
    import spark.implicits._
    assets.as[Asset].filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        val (w, h) = StubDecoder.dims(a.payload)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / w, maxH.toDouble / h))
        ResizedImage(a.asset_id,
          math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt),
          StubDecoder.resize(a.payload, scale))
      }
    }
  }

  /** Sample n frames per video asset (explode stays partition-local;
    * frame payloads here are byte slices — a real decoder would seek).
    */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
      n: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    assets.as[Asset].filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        val dur = StubDecoder.durationMs(a.payload)
        (0 until n).iterator.map { i =>
          val ts = dur * i / n
          val sliceStart = (a.payload.length * i / n).min(a.payload.length)
          Frame(a.asset_id, i, ts,
            a.payload.slice(sliceStart, (sliceStart + 16).min(a.payload.length)))
        }
      }
    }
  }
}
