package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension, SURVEY §7.4).
  *
  * Media is carried as an opaque `BINARY` column plus typed metadata —
  * the schema/partitioning/batching layer is real. Codec status per
  * modality (round 5): **images decode for real** via `javax.imageio`
  * (PNG/JPEG/GIF/BMP — part of the JDK, no external library), see
  * [[decodeImages]]; audio/video remain STUBBED with a deterministic
  * fake (no JDK codec exists for them), clearly marked below. At scale
  * the pattern is: media bytes stay in parquet binary columns,
  * partitioned by a content-addressed prefix; decode/feature-extract
  * runs per-partition so codec state is reused across rows of a task
  * (mapPartitions, not per-row UDF).
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

  /** Decoded image features: dimensions, band count, BT.601 mean luma. */
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      n_channels: Int, mean_luma: Double)

  /** REAL image decode — the image modality needs no external codec:
    * `javax.imageio.ImageIO` ships in the JDK and reads PNG/JPEG/GIF/BMP
    * payloads from the binary column. Per-partition iteration (codec
    * registry lookups and buffers amortize across a task's rows);
    * non-image / undecodable payloads are DROPPED, not errored — a 100 TB
    * media corpus always contains corrupt blobs, and a poison row must
    * not kill the stage. Mean luma (BT.601 Y = .299R+.587G+.114B,
    * rounded at 3) walks a deterministic pixel grid with a stride that
    * caps sampled pixels at ~64k per image, so giant images cost O(64k)
    * not O(pixels) — same answer every run, bounded work per row. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          catch { case _: java.io.IOException => null }
        Option(img).map { im =>
          val (w, h) = (im.getWidth, im.getHeight)
          val stride = math.max(1,
            math.sqrt(w.toLong * h / 65536.0).ceil.toInt)
          var (sum, n) = (0.0, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              n += 1
              x += stride
            }
            y += stride
          }
          ImageFeatures(r.doc_id, w, h, im.getRaster.getNumBands,
            math.rint(sum / n * 1000) / 1000)
        }
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
