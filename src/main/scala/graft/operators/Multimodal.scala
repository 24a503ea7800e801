package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (engine extension — builder brief): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extraction as *batched per-partition* functions —
  * the Scala analogue of `mapInPandas` (one iterator of rows per partition,
  * amortized setup per batch, no per-row UDF dispatch).
  *
  * The decode step itself is STUBBED (this container ships no image/audio
  * codecs): `FakeDecoder` produces deterministic features from the bytes so
  * the Spark-side plumbing — schema, partitioning, batch shape, feature
  * columns — is real and oracle-testable. Swap `FakeDecoder` for a real codec
  * (JNI/JavaCV) without touching the plumbing.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaBlob(doc_id: Long, payload: Array[Byte], media_type: String, lang: String)

  /** Extracted features — what a real decoder would emit (dimensions, frame
    * counts, …); the fake decoder derives them deterministically. */
  case class MediaFeatures(doc_id: Long, payload_bytes: Long, fake_width: Long,
                           payload_sha256: String, lang: String)

  /** STUB decoder: deterministic fake features in place of a real image/audio
    * decode. `???`-equivalent marked per builder brief — the real
    * implementation would decode `blob.payload` here. */
  object FakeDecoder {
    def decode(blob: MediaBlob): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val sha = md.digest(blob.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = blob.doc_id,
        payload_bytes = blob.payload.length.toLong,
        fake_width = blob.payload.length.toLong % 640L, // stand-in for decoded width
        payload_sha256 = sha,
        lang = blob.lang)
    }
  }

  /** Wrap a text table as a multimodal table: payload = utf-8 bytes. At 100 TB
    * the payload column stays columnar parquet binary; metadata columns allow
    * predicate pushdown without touching payload bytes. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"),
      col("lang"))

  /** Batched per-partition feature extraction — the mapInPandas-shaped hot
    * path. One decoder instance per partition, rows streamed through it. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      // per-partition (per-batch) setup would init the real codec here
      rows.map(FakeDecoder.decode)
    }
  }

  /** A resized media payload (decode → scale → re-encode in a real codec). */
  case class ResizedMedia(doc_id: Long, payload: Array[Byte], media_type: String,
                          width: Long, height: Long)

  /** Resize plumbing: batched per-partition transform preserving the opaque
    * payload column. The pixel scaling itself is STUBBED (no codecs in this
    * container) — the fake deterministically truncates the payload to
    * width*height bytes so output sizes are checkable; a real codec swaps in
    * behind the same row iterator without touching schema or partitioning. */
  def resize(spark: SparkSession, media: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(width > 0 && height > 0, s"invalid target size ${width}x$height")
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { blob =>
        // long product: width*height in Int overflows at 46341^2 and would
        // silently truncate every payload to empty
        val n = math.min(blob.payload.length.toLong, width.toLong * height).toInt
        ResizedMedia(blob.doc_id, blob.payload.take(n), blob.media_type,
          width.toLong, height.toLong)
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, frame_index: Long, frame_bytes: Array[Byte])

  /** Frame-sampling plumbing: each payload fans out to every `stride`-th
    * fixed-size chunk — the iterator-to-iterator flatMap shape a real video
    * demuxer needs (one row in, N frame rows out, streamed; no
    * per-partition buffering). The chunking stands in for frame decode. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0)
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        blob.payload.grouped(frameBytes).zipWithIndex
          .collect { case (chunk, i) if i % stride == 0 =>
            Frame(blob.doc_id, i.toLong, chunk)
          }
      }
    }
  }
}
