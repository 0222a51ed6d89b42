package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension, SURVEY §7.4).
  *
  * Media is carried as an opaque `BINARY` column plus typed metadata —
  * the schema/partitioning/batching layer is real. Codec status per
  * modality (round 5): **images decode for real** via `javax.imageio`
  * (PNG/JPEG/GIF/BMP — part of the JDK, no external library), see
  * [[decodeImages]]; **PCM WAV audio decodes for real** via a
  * self-contained RIFF chunk walker, see [[decodeAudio]]; video remains
  * STUBBED with a deterministic fake (no JDK video codec exists),
  * clearly marked below. Images also get perceptual near-dup dedup:
  * [[imageDHash]] + [[imageNearDupPairs]]. At scale
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

  /** Per-partition decode + feature extraction, dispatched on `fmt`.
    *
    * The REAL decoders own their modalities: image formats go through
    * the [[decodeImages]] machinery (a decoded still is `n_frames` = 1;
    * undecodable payloads DROP, per the corpus-hygiene contract), `wav`
    * goes through [[parseWav]] (`n_frames` = actual PCM frame count).
    * Only `video` (no JDK codec exists — labeled stub) and unknown
    * formats (e.g. the harness's `txt` wrapping) keep the round-1
    * deterministic fake (`n_bytes % 7 + 1`), so no caller can mistake
    * the fake for a real decode on a modality we can actually read. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val imageFmts = Set("png", "jpg", "jpeg", "gif", "bmp")
    media.mapPartitions { rows =>
      // per-partition: ImageIO registry lookups amortize across the task
      rows.flatMap { r =>
        val nBytes = r.media.length
        val firstByte = if (nBytes > 0) r.media(0) & 0xff else -1
        val fmt = Option(r.fmt).map(_.toLowerCase).getOrElse("")
        if (imageFmts(fmt)) {
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
            catch { case scala.util.control.NonFatal(_) => null }
          Option(img).map(_ => MediaFeatures(r.doc_id, nBytes, firstByte, 1))
        } else if (fmt == "wav") {
          parseWav(r.media, r.doc_id, 0.01).map(af => MediaFeatures(
            r.doc_id, nBytes, firstByte,
            math.min(af.n_frames, Int.MaxValue.toLong).toInt))
        } else {
          // video / unknown: deterministic fake "decode" (labeled stub)
          Some(MediaFeatures(r.doc_id, nBytes, firstByte, nBytes % 7 + 1))
        }
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
        // NonFatal, not just IOException: corrupt/truncated payloads can
        // make codec plugins throw RuntimeExceptions (IllegalArgument,
        // CMMException, ArrayIndexOutOfBounds) — a poison blob must DROP,
        // not kill the stage
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          catch { case scala.util.control.NonFatal(_) => null }
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

  // ------------------------------------------------------------- audio

  /** Decoded audio features over PCM WAV payloads. `rms` and
    * `silence_ratio` are over samples normalized to [-1, 1] (channels
    * mixed to mono per frame), rounded at 6. */
  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
      n_channels: Int, bits_per_sample: Int, n_frames: Long,
      duration_ms: Double, rms: Double, silence_ratio: Double)

  /** REAL audio decode for the WAV modality — RIFF/WAVE is a plain
    * byte-layout container, so PCM WAV needs no codec library at all:
    * this is a self-contained little-endian chunk walker (`"RIFF"` …
    * `"WAVE"`, then `fmt ` + `data` chunks), supporting the two raw PCM
    * layouts (16-bit signed, 8-bit unsigned offset binary), mono or
    * multi-channel. Compressed formats (MP3/AAC/Opus) stay out of scope —
    * those DO need external codecs the container doesn't ship.
    *
    * Same scale contract as [[decodeImages]]: per-partition iteration,
    * corrupt/foreign payloads DROPPED not errored, and per-row work
    * bounded — energy stats walk a deterministic frame stride capping
    * sampled frames at ~64k, so an hour-long recording costs the same
    * as a clip (`n_frames`/`duration_ms` still reflect the full data
    * chunk). A frame is silent when its mono-mixed |amplitude| <
    * `silenceThreshold`. */
  def decodeAudio(media: Dataset[MediaRow],
      silenceThreshold: Double = 0.01): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r => parseWav(r.media, r.doc_id, silenceThreshold) }
    }
  }

  /** Parse one WAV payload; None for anything that is not clean PCM WAV. */
  private[graft] def parseWav(bytes: Array[Byte], docId: Long,
      silenceThreshold: Double): Option[AudioFeatures] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def ascii(b: ByteBuffer, n: Int): String = {
      val a = new Array[Byte](n); b.get(a); new String(a, "US-ASCII")
    }
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (buf.remaining < 12 || ascii(buf, 4) != "RIFF") return None
      buf.getInt // declared RIFF size; trust actual buffer bounds instead
      if (ascii(buf, 4) != "WAVE") return None
      var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
      var data: Option[(Int, Int)] = None          // offset, length
      while (buf.remaining >= 8) {
        val id = ascii(buf, 4)
        val len = buf.getInt
        if (len < 0 || len > buf.remaining) return None
        val at = buf.position()
        if (id == "fmt " && len >= 16) {
          val audioFormat = buf.getShort & 0xffff
          val channels = buf.getShort & 0xffff
          val rate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort & 0xffff
          fmt = Some((audioFormat, channels, rate, bits))
        } else if (id == "data") {
          data = Some((at, len))
        }
        // chunks are word-aligned; clamp — a final odd-length chunk may
        // omit its pad byte, which must not invalidate the file
        buf.position(math.min(buf.limit(), at + len + (len & 1)))
      }
      for {
        (audioFormat, channels, rate, bits) <- fmt
        (off, len) <- data
        if audioFormat == 1 && (bits == 16 || bits == 8) &&
          channels >= 1 && rate > 0
      } yield {
        val bytesPerFrame = channels * (bits / 8)
        val nFrames = len.toLong / bytesPerFrame
        val stride = math.max(1L, math.ceil(nFrames / 65536.0).toLong)
        var (sumSq, silent, sampled) = (0.0, 0L, 0L)
        var f = 0L
        while (f < nFrames) {
          var ch = 0
          var acc = 0.0
          val base = off + (f * bytesPerFrame).toInt
          while (ch < channels) {
            acc += (if (bits == 16)
              buf.getShort(base + ch * 2) / 32768.0
            else ((bytes(base + ch) & 0xff) - 128) / 128.0)
            ch += 1
          }
          val v = acc / channels
          sumSq += v * v
          if (math.abs(v) < silenceThreshold) silent += 1
          sampled += 1
          f += stride
        }
        val rms = if (sampled == 0) 0.0 else math.sqrt(sumSq / sampled)
        val sil = if (sampled == 0) 0.0 else silent.toDouble / sampled
        AudioFeatures(docId, rate, channels, bits, nFrames,
          math.rint(nFrames * 1000.0 / rate * 1000) / 1000,
          math.rint(rms * 1e6) / 1e6, math.rint(sil * 1e6) / 1e6)
      }
    } catch { case _: RuntimeException => None }
  }

  // --------------------------------------------- perceptual image dedup

  /** 64-bit perceptual difference hash of an image. */
  final case class ImageHash(doc_id: Long, dhash: Long)

  /** Perceptual dHash over the decoded-image path: downscale to a 9×8
    * luma grid, set bit (row*8+cx) when cell[cx] < cell[cx+1] — 64 bits
    * of horizontal gradient signs. Scale- and brightness-invariant by
    * construction (cells are relative positions; bits compare, not
    * measure), which is exactly what near-duplicate image dedup needs:
    * a resized or re-brightened copy hashes identically, a different
    * picture differs in ~half its bits.
    *
    * Deterministic and bounded: each cell's luma is the mean of a fixed
    * 4×4 sub-grid of sample points at relative positions (area-sampling
    * approximation) — 9·8·16 = 1152 pixel reads per image regardless of
    * resolution. Undecodable payloads are dropped, as in
    * [[decodeImages]]. */
  def imageDHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // NonFatal for the same reason as decodeImages: codec plugins
        // throw RuntimeExceptions on corrupt payloads
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          catch { case scala.util.control.NonFatal(_) => null }
        Option(img).map(im => ImageHash(r.doc_id, dHashOf(im)))
      }
    }
  }

  /** The dHash core over a decoded frame — shared by [[imageDHash]] and
    * the per-frame hashing in [[videoFrameHashes]]. */
  private[ext] def dHashOf(im: java.awt.image.BufferedImage): Long = {
    val (w, h) = (im.getWidth, im.getHeight)
    val cells = Array.ofDim[Double](8, 9)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        var s = 0.0
        var j = 0
        while (j < 4) {
          var i = 0
          while (i < 4) {
            val x = math.min(w - 1, ((cx + (i + 0.5) / 4) / 9.0 * w).toInt)
            val y = math.min(h - 1, ((cy + (j + 0.5) / 4) / 8.0 * h).toInt)
            val rgb = im.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            i += 1
          }
          j += 1
        }
        cells(cy)(cx) = s / 16
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      val (row, cx) = (b / 8, b % 8)
      if (cells(row)(cx) < cells(row)(cx + 1)) hash |= (1L << b)
      b += 1
    }
    hash
  }

  /** Near-duplicate pairs over any 64-bit fingerprint column, by banded
    * Hamming LSH — the 64-bit generalization of
    * [[Dedup.simhashPairs]]: band into 4×16 bits, equi-join per band
    * (pigeonhole: Hamming ≤ 3 ⇒ ≥1 band agrees exactly, so recall is
    * total for `maxDist` ≤ 3), verify candidates with
    * `bit_count(xor)`. Same scale shape as every dedup join in
    * [[Dedup]]: candidates are bounded by band-bucket size, never
    * corpus², and the verify runs on candidates only. */
  def hammingNearDupPairs64(hashes: DataFrame, idCol: String,
      hashCol: String, maxDist: Int = 3): DataFrame = {
    val banded = hashes.select(col(idCol), col(hashCol).as("fp"),
      posexplode(array((0 until 4).map(j =>
        expr(s"shiftrightunsigned($hashCol, ${j * 16}) & 65535")): _*))
        .as(Seq("band_idx", "band_val")))
    val a = banded.select(col(idCol).as("id_a"), col("fp").as("fp_a"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col(idCol).as("id_b"), col("fp").as("fp_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Image near-duplicate pairs: [[imageDHash]] → banded-Hamming join.
    * The multimodal twin of text MinHash dedup — a resized, recompressed,
    * or brightness-shifted copy of an image lands within a few Hamming
    * bits of the original and surfaces here without any pairwise scan. */
  def imageNearDupPairs(media: Dataset[MediaRow], maxDist: Int = 3): DataFrame =
    hammingNearDupPairs64(imageDHash(media).toDF(), "doc_id", "dhash", maxDist)
}
