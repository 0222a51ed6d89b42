package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension, SURVEY §7.4).
  *
  * Media is carried as an opaque `BINARY` column plus typed metadata —
  * the schema/partitioning/batching layer is real. Codec status per
  * modality (round 7): **images decode for real** via `javax.imageio`
  * (PNG/JPEG/GIF/BMP — part of the JDK, no external library), see
  * [[decodeImages]]; **PCM WAV audio decodes for real** via a
  * self-contained RIFF chunk walker, see [[decodeAudio]]; **AVI video
  * parses for real** via the same RIFF walker ([[decodeVideo]]: dims,
  * frame count, fps, codec fourcc from `avih`/`strh`/`strf`), with
  * actual per-frame decode for MJPEG (each frame is a JPEG — the JDK
  * reads it) and uncompressed 24-bit DIB payloads ([[videoFrameHashes]]).
  * Codec-compressed containers (MP4/H.264 etc.) stay out of scope — the
  * JDK ships no such codec, and those payloads DROP like corrupt blobs
  * rather than receive a fake. Images also get perceptual near-dup
  * dedup: [[imageDHash]] + [[imageNearDupPairs]]. At scale
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

  /** Decompression-bomb guard for every untrusted image decode: read the
    * DIMENSIONS from the codec header first (no pixel allocation) and
    * refuse payloads above `maxPixels` BEFORE `ImageIO.read` materializes
    * the raster. Without this, a crafted 24-byte BMP header declaring
    * 60000×60000 makes the decoder allocate a multi-GB raster — and the
    * resulting `OutOfMemoryError` is not `NonFatal`, so one poison blob
    * in a 100 TB corpus would kill the executor instead of dropping.
    * 64 MP admits any real photograph; bombs drop like corrupt blobs. */
  private[graft] def boundedImageRead(bytes: Array[Byte],
      maxPixels: Long = 64L << 20): java.awt.image.BufferedImage = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > maxPixels) null
          else reader.read(0)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

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
    * goes through [[parseWav]] (`n_frames` = actual PCM frame count),
    * `avi` goes through [[parseAvi]] (`n_frames` = the container's video
    * stream length). Codec-compressed video containers (mp4/mkv/mov/
    * webm) DROP — the JDK has no codec for them, and an unreadable
    * payload must not surface fabricated features. Only unknown formats
    * (e.g. the harness's `txt` wrapping) keep the round-1 deterministic
    * fake (`n_bytes % 7 + 1`), so no caller can mistake the fake for a
    * real decode on a modality we can actually read. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val imageFmts = Set("png", "jpg", "jpeg", "gif", "bmp")
    val codecVideoFmts = Set("mp4", "mkv", "mov", "webm", "m4v")
    media.mapPartitions { rows =>
      // per-partition: ImageIO registry lookups amortize across the task
      rows.flatMap { r =>
        val nBytes = r.media.length
        val firstByte = if (nBytes > 0) r.media(0) & 0xff else -1
        val fmt = Option(r.fmt).map(_.toLowerCase).getOrElse("")
        if (imageFmts(fmt)) {
          Option(boundedImageRead(r.media))
            .map(_ => MediaFeatures(r.doc_id, nBytes, firstByte, 1))
        } else if (fmt == "wav") {
          parseWav(r.media, r.doc_id, 0.01).map(af => MediaFeatures(
            r.doc_id, nBytes, firstByte,
            math.min(af.n_frames, Int.MaxValue.toLong).toInt))
        } else if (fmt == "avi") {
          parseAvi(r.media, r.doc_id).map(vf => MediaFeatures(
            r.doc_id, nBytes, firstByte,
            math.min(vf.n_frames, Int.MaxValue.toLong).toInt))
        } else if (codecVideoFmts(fmt)) {
          None // no JDK codec — drop, like a corrupt blob
        } else {
          // unknown (harness txt wrapping): deterministic fake, labeled
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
        // boundedImageRead owns the poison-blob contract: corrupt
        // payloads (codec RuntimeExceptions) AND decompression bombs
        // (huge declared dims → multi-GB raster alloc) both DROP
        val img = boundedImageRead(r.media)
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

  // ------------------------------------------------------------- video

  /** Parsed video-container features over AVI payloads. `fps` comes from
    * the video stream header (`dwRate/dwScale`), `codec` is the `strf`
    * compression fourcc (`"DIB "` for uncompressed). */
  final case class VideoFeatures(doc_id: Long, width: Int, height: Int,
      n_frames: Long, fps: Double, codec: String, duration_ms: Double)

  /** One sampled decoded frame's perceptual hash. */
  final case class VideoFrameHash(doc_id: Long, frame_idx: Long, dhash: Long)

  /** REAL video-container parse for the AVI modality — AVI is RIFF, the
    * same plain byte-layout [[parseWav]] walks, so the container needs no
    * codec library: `avih` (dims, total frames), the first `vids` stream's
    * `strh` (rate/scale → fps, stream length) and `strf`
    * (BITMAPINFOHEADER → codec fourcc). What a 100 TB curation pass
    * needs from video — duration, dims, fps, codec mix — is container
    * metadata, available for every AVI regardless of codec. Frame
    * PIXELS additionally decode for MJPEG and uncompressed 24-bit DIB
    * payloads (see [[videoFrameHashes]]); other codecs keep their
    * metadata but no pixel path (the JDK ships no H.264/VP9 decoder).
    * Same scale contract as the other decoders: per-partition, corrupt
    * payloads DROP, per-row work bounded by the container walk. */
  def decodeVideo(media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(rows => rows.flatMap(r => parseAvi(r.media, r.doc_id)))
  }

  /** Everything one walk of an AVI container yields: features + each
    * video-stream frame chunk in `movi`, packed `offset << 32 | length`
    * (unboxed — a per-ROW index must stay small next to task memory). */
  private final case class AviParse(features: VideoFeatures,
      frames: Array[Long], bitCount: Int)

  /** Cap on indexed frame chunks per AVI: a crafted payload of millions
    * of 8-byte chunks must not build an unbounded per-row index (1M
    * frames ≈ 9h at 30 fps — beyond it, metadata stays exact via `strh`
    * but only the first 1M frames are samplable for hashing). */
  private val MaxIndexedFrames = 1 << 20

  /** Parse one AVI payload's features; None for anything not clean AVI. */
  private[graft] def parseAvi(bytes: Array[Byte], docId: Long): Option[VideoFeatures] =
    parseAviFull(bytes, docId).map(_.features)

  /** The RIFF walk behind [[decodeVideo]] / [[videoFrameHashes]].
    * AVI nests: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)…)
    * LIST('movi' ##dc/##db…))`; frame chunks are matched to the FIRST
    * `vids` stream by its index (`"%02d" + dc|db`), including inside
    * `rec ` sub-lists. Declared chunk lengths are bounds-checked against
    * the buffer — a lying length drops the file, never reads past it. */
  private def parseAviFull(bytes: Array[Byte], docId: Long): Option[AviParse] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def ascii(b: ByteBuffer, at: Int, n: Int): String = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) { a(i) = b.get(at + i); i += 1 }
      new String(a, "US-ASCII")
    }
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (buf.limit < 12 || ascii(buf, 0, 4) != "RIFF" ||
          ascii(buf, 8, 4) != "AVI ") return None
      var avih: Option[(Long, Long, Int, Int)] = None // totalFrames, usPerFrame, w, h
      // per stream, in strl order: (fccType, scale, rate, length)
      val streams = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      var vidsStrf: Option[(Int, Int, Int, String)] = None // w, h, bitCount, fourcc
      var vidsIdx = -1
      val frames = new scala.collection.mutable.ArrayBuilder.ofLong
      var nIndexed = 0
      // walk chunks in [from, to); LISTs recurse into their children
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = ascii(buf, p, 4)
          val len = buf.getInt(p + 4)
          if (len < 0 || p + 8 + len > buf.limit)
            throw new RuntimeException("chunk length out of bounds")
          val body = p + 8
          if (id == "RIFF" || id == "LIST") {
            if (len >= 4) walk(body + 4, body + len) // skip the list type
          } else if (id == "avih" && len >= 40) {
            avih = Some((buf.getInt(body + 16).toLong & 0xffffffffL,
              buf.getInt(body).toLong & 0xffffffffL,
              buf.getInt(body + 32), buf.getInt(body + 36)))
          } else if (id == "strh" && len >= 36) {
            val fccType = ascii(buf, body, 4)
            streams += ((fccType,
              buf.getInt(body + 20).toLong & 0xffffffffL,
              buf.getInt(body + 24).toLong & 0xffffffffL,
              buf.getInt(body + 32).toLong & 0xffffffffL))
            if (fccType == "vids" && vidsIdx < 0) vidsIdx = streams.length - 1
          } else if (id == "strf" && len >= 20 &&
              streams.length - 1 == vidsIdx && vidsIdx >= 0 &&
              vidsStrf.isEmpty) {
            val comp = buf.getInt(body + 16)
            val fourcc = if (comp == 0) "DIB "
              else ascii(buf, body + 16, 4)
            vidsStrf = Some((buf.getInt(body + 4), buf.getInt(body + 8),
              buf.getShort(body + 14) & 0xffff, fourcc))
          } else if (vidsIdx >= 0 && nIndexed < MaxIndexedFrames &&
              id.length == 4 && id.startsWith("%02d".format(vidsIdx)) &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            frames += (body.toLong << 32) | (len & 0xffffffffL)
            nIndexed += 1
          }
          p = body + len + (len & 1) // chunks are word-aligned
        }
      }
      walk(12, buf.limit)
      for {
        (totalFrames, usPerFrame, aw, ah) <- avih
        if vidsIdx >= 0
        (sw, sh, bits, fourcc) <- vidsStrf.orElse(Some((aw, ah, 0, "????")))
      } yield {
        val (_, scale, rate, strLen) = streams(vidsIdx)
        val collected = frames.result()
        val n = if (strLen > 0) strLen
          else if (totalFrames > 0) totalFrames
          else collected.length.toLong // exact: below the index cap
        val fps = if (scale > 0 && rate > 0) rate.toDouble / scale
          else if (usPerFrame > 0) 1e6 / usPerFrame
          else 0.0
        val (w, h) = if (sw != 0 && sh != 0) (sw, math.abs(sh)) else (aw, ah)
        val durMs = if (fps > 0) math.rint(n / fps * 1000 * 1000) / 1000 else 0.0
        AviParse(VideoFeatures(docId, w, h, n, math.rint(fps * 1000) / 1000,
          fourcc, durMs), collected, bits)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL per-frame video decode + perceptual hash, for the two frame
    * layouts the JDK can read: **MJPEG** (each `##dc` chunk is a complete
    * baseline JPEG — `ImageIO` decodes it; note real-world MJPEG that
    * omits Huffman tables is out of the JDK reader's reach and such
    * frames drop) and **uncompressed 24-bit DIB** (`##db`/`##dc` with
    * `biCompression=0`: bottom-up BGR rows, 4-byte-aligned — decoded
    * directly). Each sampled frame gets the same 64-bit dHash as stills
    * ([[dHashOf]]), so video near-dup reuses [[hammingNearDupPairs64]]
    * on any frame column.
    *
    * Bounded per row: frames are sampled at `max(every, n/maxFrames)`
    * stride, so an hour-long AVI hashes at most `maxFrames` frames —
    * the decode cost cap the image/audio paths already promise. */
  def videoFrameHashes(media: Dataset[MediaRow], every: Int = 1,
      maxFrames: Int = 64): Dataset[VideoFrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseAviFull(r.media, r.doc_id).toSeq.flatMap { p =>
          val n = p.frames.length
          val stride = math.max(every,
            math.ceil(n.toDouble / math.max(1, maxFrames)).toInt).max(1)
          Iterator.range(0, n, stride).flatMap(frameHashAt(r, p, _))
        }
      }
    }
  }

  /** First/middle/last KEYFRAME hashes (VERDICT r17 #6's named shape):
    * the fixed-cost clip-level probe — exactly three decodes per clip
    * regardless of length, against [[videoFrameHashes]]'s up-to-
    * `maxFrames`. Same MJPEG/DIB decode paths, same 64-bit dHash, so
    * the output feeds [[hammingNearDupPairs64]] unchanged; non-
    * decodable fourccs yield no rows (metadata still flows through
    * [[decodeVideo]]). */
  def videoKeyframeHashes(media: Dataset[MediaRow]): Dataset[VideoFrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseAviFull(r.media, r.doc_id).toSeq.flatMap { p =>
          val n = p.frames.length
          Seq(0, n / 2, n - 1).distinct.filter(i => i >= 0 && i < n)
            .flatMap(frameHashAt(r, p, _))
        }
      }
    }
  }

  /** Decode + dHash one indexed frame chunk — the shared kernel of
    * [[videoFrameHashes]] / [[videoKeyframeHashes]]: MJPEG chunks are
    * complete baseline JPEGs (bounded ImageIO read), DIB chunks decode
    * directly; anything else (or a corrupt frame) yields None. */
  private def frameHashAt(r: MediaRow, p: AviParse,
      i: Int): Option[VideoFrameHash] = {
    val packed = p.frames(i)
    val off = (packed >>> 32).toInt
    val len = packed.toInt
    val im: java.awt.image.BufferedImage =
      if (p.features.codec == "MJPG")
        boundedImageRead(
          java.util.Arrays.copyOfRange(r.media, off, off + len))
      else if (p.features.codec == "DIB " && p.bitCount == 24)
        decodeDib24(r.media, off, len, p.features.width,
          p.features.height).orNull
      else null
    Option(im).map(x => VideoFrameHash(r.doc_id, i.toLong, dHashOf(x)))
  }

  /** Uncompressed 24-bit DIB frame → image: bottom-up BGR rows, each row
    * padded to a 4-byte boundary (the BMP pixel-array layout without the
    * BMP file header — exactly what an uncompressed AVI frame chunk is). */
  private def decodeDib24(bytes: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[java.awt.image.BufferedImage] = {
    // Long math: with lying header dims (e.g. 50000×50000) rowBytes*h
    // overflows Int, can slip past the length guard, and the row walk
    // then throws out of bounds — a poison blob must drop instead. The
    // pixel cap matches boundedImageRead's decompression-bomb guard.
    val rowBytes = ((w.toLong * 3 + 3) / 4) * 4
    if (w <= 0 || h <= 0 || len.toLong < rowBytes * h ||
        w.toLong * h > (64L << 20)) return None
    val rb = rowBytes.toInt // guard above caps rowBytes*h at len: Int-safe
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val rowOff = off + (h - 1 - y) * rb // bottom-up
      var x = 0
      while (x < w) {
        val b = bytes(rowOff + x * 3) & 0xff
        val g = bytes(rowOff + x * 3 + 1) & 0xff
        val rr = bytes(rowOff + x * 3 + 2) & 0xff
        im.setRGB(x, y, rr << 16 | g << 8 | b)
        x += 1
      }
      y += 1
    }
    Some(im)
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
        // boundedImageRead: corrupt payloads and decompression bombs
        // both drop (see decodeImages)
        Option(boundedImageRead(r.media))
          .map(im => ImageHash(r.doc_id, dHashOf(im)))
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
