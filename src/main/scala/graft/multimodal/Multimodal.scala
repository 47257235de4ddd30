package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark side — schema, partition-preserving `mapPartitions`, batched
  * iteration shape, deterministic outputs — is real and tested. The codec
  * step itself is a clearly marked STUB (this container has no image/audio
  * libraries): `StubCodec` derives deterministic fake dimensions/features
  * from the bytes, so every pipeline stage downstream of decode exercises
  * the true data flow. Swapping in a real codec changes only `StubCodec`.
  */
object Multimodal {

  /** Typed metadata carried next to the blob. */
  final case class MediaMeta(mediaType: String, format: String, nBytes: Long)

  final case class MediaRow(media_id: Long, media_type: String,
                            content: Array[Byte])

  final case class DecodedFrame(media_id: Long, frame_idx: Int,
                                frame_digest: String)

  final case class MediaFeatures(media_id: Long, width: Int, height: Int,
                                 features: Array[Float])

  /** Attach a binary content column + metadata struct. In production this is
    * the parquet/LOB scan; here media bytes are synthesized from a text
    * column (deterministic) so the full pipeline is runnable in tests.
    */
  def withMediaColumns(df: DataFrame, idCol: String, textCol: String,
                       mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))
      .withColumn("meta", struct(
        col("media_type").as("mediaType"),
        lit("stub/v1").as("format"),
        length(col("content")).cast("long").as("nBytes")))

  /** STUB decode: a real implementation would hand `content` to an image
    * codec (javax.imageio / ffmpeg bindings); none exist in this container,
    * so dimensions are derived deterministically from the first bytes. The
    * call signature, batching and schema are the real ones.
    */
  object StubCodec {
    def decodeDims(content: Array[Byte]): (Int, Int) = {
      val b0 = if (content.nonEmpty) content(0) & 0xff else 0
      val b1 = if (content.length > 1) content(1) & 0xff else 0
      (64 + (b0 % 192), 64 + (b1 % 192)) // fake width/height
    }

    /** Fake feature vector: 8 bucketed byte-histogram floats (deterministic,
      * content-sensitive — downstream similarity math is exercised for real).
      */
    def features(content: Array[Byte], dims: Int = 8): Array[Float] = {
      val hist = new Array[Float](dims)
      content.foreach(b => hist((b & 0xff) % dims) += 1f)
      val n = math.max(content.length, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** Decode + feature-extract, batched via `mapPartitions`: each task pulls
    * rows in `batchSize` groups (the shape a vectorized codec / model-server
    * client needs), emits fixed-width feature rows. Partitioning of the
    * input is preserved — no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would decode `batch` in one vectorized call here
        batch.map { r =>
          val (w, h) = StubCodec.decodeDims(r.content)
          MediaFeatures(r.media_id, w, h, StubCodec.features(r.content))
        }
      }
    }
  }

  /** Frame sampling for video-like blobs: split content into `nFrames`
    * even chunks and digest each — the real operator's shape (explode to
    * frame grain) with the stub codec.
    */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int)
                  (implicit spark: SparkSession): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.flatMap { r =>
      val step = math.max(r.content.length / nFrames, 1)
      (0 until nFrames).iterator.takeWhile(i => i * step < r.content.length)
        .map { i =>
          val chunk = r.content.slice(i * step, math.min((i + 1) * step, r.content.length))
          DecodedFrame(r.media_id, i,
            java.security.MessageDigest.getInstance("MD5").digest(chunk)
              .map("%02x".format(_)).mkString)
        }
    }
  }
}
