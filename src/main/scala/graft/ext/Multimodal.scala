package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension, SURVEY §7.4).
  *
  * Media is carried as an opaque `BINARY` column plus typed metadata —
  * the schema/partitioning/batching layer is real; the actual codec is
  * STUBBED with a deterministic fake (this container ships no image/audio
  * libraries), clearly marked below. At scale the pattern is: media bytes
  * stay in parquet binary columns, partitioned by a content-addressed
  * prefix; decode/feature-extract runs per-partition so codec state is
  * reused across rows of a task (mapPartitions, not per-row UDF).
  */
object Multimodal {

  /** One media row: opaque payload + metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], fmt: String)

  /** Extracted features. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int,
      n_frames: Int)

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — the
    * harness has no binary testdata; this exercises the same binary-column
    * plumbing a real corpus would use. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"), lit("txt").as("fmt"))
      .as[MediaRow]
  }

  /** Per-partition "decode" + feature extraction.
    *
    * STUB: a real implementation opens a codec per partition and decodes
    * `media` (image pixels / audio samples / video frames). Deterministic
    * fake used instead: frame count derived from payload length. The
    * partition-wise iteration, closure shape, and output schema are the
    * real, scale-relevant parts.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (once per task, not per row)
      rows.map { r =>
        val nBytes = r.media.length
        val firstByte = if (nBytes > 0) r.media(0) & 0xff else -1
        val nFrames = nBytes % 7 + 1 // deterministic fake "decode"
        MediaFeatures(r.doc_id, nBytes, firstByte, nFrames)
      }
    }
  }

  /** Stubbed resize / frame-sample: keeps every k-th "frame" index —
    * demonstrates the sampled-explode shape (`posexplode` + modulo filter)
    * used for frame-level datasets. */
  def sampleFrames(features: Dataset[MediaFeatures], every: Int = 2): DataFrame =
    features.toDF()
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1))
          .as("frame_idx"))
      .filter(col("frame_idx") % every === 0)
}
