package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal
import graft.ext.Multimodal.MediaRow

/** Round-5 multimodal codecs: the REAL paths — WAV/RIFF audio parsing
  * (pure byte-layout, no codec library) and perceptual image dHash
  * near-dup dedup over the JDK ImageIO decode. Complements the plumbing
  * tests in DedupSimilaritySpec (binary wrap / fake features / PNG luma).
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val enc = org.apache.spark.sql.Encoders.product[MediaRow]

  // ---- helpers: synthesize WAV and PNG payloads in-memory -------------

  /** Minimal PCM WAV writer (little-endian RIFF): frames(i)(ch) holds the
    * raw sample value — signed for 16-bit, offset-binary 0..255 for 8-bit. */
  private def wav(rate: Int, channels: Int, bits: Int,
      frames: Array[Array[Int]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bytesPerFrame = channels * (bits / 8)
    val dataLen = frames.length * bytesPerFrame
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * bytesPerFrame).putShort(bytesPerFrame.toShort)
      .putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(f => f.foreach(s =>
      if (bits == 16) buf.putShort(s.toShort) else buf.put(s.toByte)))
    buf.array()
  }

  /** PNG of a gray image with per-pixel luma given by f(x, y) in 0..255. */
  private def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      im.setRGB(x, y, v << 16 | v << 8 | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def media(rows: MediaRow*) = spark.createDataset(rows)(enc)

  /** Minimal AVI writer (RIFF little-endian): one video stream, frames
    * given as pre-encoded chunk payloads. `fourcc` 0 means uncompressed
    * (DIB); `chunkId` picks `00dc` (compressed) or `00db` (raw). */
  private def avi(w: Int, h: Int, fpsScale: (Int, Int), fourcc: Int,
      bitCount: Int, chunkId: String, frames: Seq[Array[Byte]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def pad(n: Int) = n + (n & 1)
    val (scale, rate) = fpsScale
    val moviBody = 4 + frames.map(f => 8 + pad(f.length)).sum
    val strlBody = 4 + 8 + 56 + 8 + 40          // "strl" + strh + strf
    val hdrlBody = 4 + 8 + 56 + 8 + strlBody    // "hdrl" + avih + LIST(strl)
    val riffBody = 4 + 8 + hdrlBody + 8 + moviBody
    val buf = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String) = buf.put(s.getBytes("US-ASCII"))
    fcc("RIFF"); buf.putInt(riffBody); fcc("AVI ")
    fcc("LIST"); buf.putInt(hdrlBody); fcc("hdrl")
    fcc("avih"); buf.putInt(56)
    buf.putInt(1000000 * scale / rate)          // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(frames.length)                    // dwTotalFrames
      .putInt(0).putInt(1).putInt(0)            // dwStreams = 1
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); buf.putInt(strlBody); fcc("strl")
    fcc("strh"); buf.putInt(56)
    fcc("vids"); buf.putInt(fourcc)             // fccType, fccHandler
    buf.putInt(0).putInt(0).putInt(0)
      .putInt(scale).putInt(rate)               // dwScale, dwRate
      .putInt(0)
      .putInt(frames.length)                    // dwLength (frames)
      .putInt(0).putInt(0).putInt(0)
      .putLong(0)                               // rcFrame
    fcc("strf"); buf.putInt(40)                 // BITMAPINFOHEADER
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(bitCount.toShort)
      .putInt(fourcc)                           // biCompression
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); buf.putInt(moviBody); fcc("movi")
    frames.foreach { f =>
      fcc(chunkId); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  private def fourcc(s: String): Int =
    s.getBytes("US-ASCII").zipWithIndex.map { case (b, i) => (b & 0xff) << (8 * i) }.sum

  /** JPEG-encode a gray gradient frame (for MJPEG AVIs). */
  private def jpegFrame(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      im.setRGB(x, y, v << 16 | v << 8 | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  /** Raw 24-bit DIB frame payload: bottom-up BGR rows, 4-byte aligned. */
  private def dibFrame(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y))).toByte
      val off = (h - 1 - y) * rowBytes + x * 3
      out(off) = v; out(off + 1) = v; out(off + 2) = v // B G R equal
    }
    out
  }

  // ---- audio ----------------------------------------------------------

  test("decodeAudio: 16-bit PCM sine + silence — rate, frames, exact-ish RMS, silence ratio") {
    // 1 s of 440 Hz at amplitude 0.5, then 1 s of silence, 8 kHz mono.
    // 440 full cycles in 8000 samples → Σ sin² = N/2 exactly, so
    // rms = 0.5/√2 over the sine half → 0.25 over the whole clip.
    val sine = Array.tabulate(8000)(k =>
      Array((16384 * math.sin(2 * math.Pi * 440 * k / 8000)).round.toInt))
    val silence = Array.fill(8000)(Array(0))
    val out = Multimodal.decodeAudio(
        media(MediaRow(1L, wav(8000, 1, 16, sine ++ silence), "wav")))
      .collect()
    assert(out.length == 1)
    val a = out.head
    assert(a.sample_rate == 8000 && a.n_channels == 1 && a.bits_per_sample == 16)
    assert(a.n_frames == 16000L && a.duration_ms == 2000.0)
    assert(math.abs(a.rms - 0.25) < 1e-3, s"rms=${a.rms}")
    // silence half + the sine's own near-zero crossings (|0.5·sin| < 0.01
    // ⇔ |sin| < 0.02 → ~1.3% of sine frames)
    assert(a.silence_ratio > 0.49 && a.silence_ratio < 0.52,
      s"silence=${a.silence_ratio}")
  }

  test("decodeAudio: stereo channels mix to mono; 8-bit offset-binary decodes") {
    // L = +0.25, R = −0.25 constant → mono mix ≡ 0 → rms 0, all silent
    val stereo = wav(44100, 2, 16, Array.fill(100)(Array(8192, -8192)))
    // 8-bit: constant 228 → (228−128)/128 = 0.78125 exactly
    val eight = wav(11025, 1, 8, Array.fill(50)(Array(228)))
    val out = Multimodal.decodeAudio(
        media(MediaRow(1L, stereo, "wav"), MediaRow(2L, eight, "wav")))
      .collect().map(a => a.doc_id -> a).toMap
    assert(out(1L).n_channels == 2 && out(1L).n_frames == 100L)
    assert(out(1L).rms == 0.0 && out(1L).silence_ratio == 1.0)
    assert(out(2L).bits_per_sample == 8 && out(2L).sample_rate == 11025)
    assert(out(2L).rms == 0.78125 && out(2L).silence_ratio == 0.0)
  }

  test("decodeAudio: corrupt, truncated, and non-PCM payloads drop, never throw") {
    val good = wav(8000, 1, 16, Array.fill(10)(Array(1000)))
    val truncated = good.take(30)
    val lyingLen = good.clone() // declare a data chunk bigger than the bytes
    // data length field sits at offset 40 in this fixed-layout writer
    lyingLen(40) = 0x7f.toByte; lyingLen(41) = 0x7f.toByte
    lyingLen(42) = 0x7f.toByte; lyingLen(43) = 0x7f.toByte
    val floatFmt = good.clone() // audioFormat=3 (IEEE float) at offset 20
    floatFmt(20) = 3
    // valid file ending in an odd-length chunk WITHOUT its pad byte —
    // must still decode (the alignment skip clamps at the buffer end)
    val oddTail = {
      val extra = java.nio.ByteBuffer.allocate(11)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      extra.put("LIST".getBytes("US-ASCII")).putInt(3)
        .put(Array[Byte](1, 2, 3))
      good ++ extra.array()
    }
    val out = Multimodal.decodeAudio(media(
        MediaRow(1L, "RIFFnope".getBytes("US-ASCII"), "wav"),
        MediaRow(2L, truncated, "wav"),
        MediaRow(3L, lyingLen, "wav"),
        MediaRow(4L, floatFmt, "wav"),
        MediaRow(5L, Array[Byte](), "wav"),
        MediaRow(6L, good, "wav"),
        MediaRow(7L, oddTail, "wav")))
      .collect()
    assert(out.map(_.doc_id).toSet == Set(6L, 7L),
      "clean WAV and odd-tail WAV survive; every corruption drops")
  }

  // ---- image dHash ----------------------------------------------------

  test("imageDHash: scale- and brightness-invariant; distinct structure far apart") {
    val base = png(64, 64, (x, _) => x * 4)          // horizontal ramp
    val rescaled = png(128, 128, (x, _) => x * 2)    // same picture, 2× size
    val brighter = png(64, 64, (x, _) => x * 4 + 20) // +20 luma, clamped
    val noisy = png(64, 64, (x, y) =>                // ±3 luma salt
      x * 4 + (if ((x * 31 + y * 17) % 97 == 0) 3 else 0))
    val vert = png(64, 64, (_, y) => y * 4)          // vertical ramp
    val hs = Multimodal.imageDHash(media(
        MediaRow(1L, base, "png"), MediaRow(2L, rescaled, "png"),
        MediaRow(3L, brighter, "png"), MediaRow(4L, noisy, "png"),
        MediaRow(5L, vert, "png"),
        MediaRow(6L, "junk".getBytes("US-ASCII"), "png")))
      .collect().map(h => h.doc_id -> h.dhash).toMap
    assert(hs.keySet == Set(1L, 2L, 3L, 4L, 5L), "undecodable drops")
    assert(hs(1L) == -1L, "strict horizontal ramp sets all 64 gradient bits")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) == 0, "resize must not move the hash")
    assert(ham(hs(1L), hs(3L)) <= 3, "brightness shift stays within near-dup range")
    assert(ham(hs(1L), hs(4L)) <= 3, "sparse ±3 noise stays within near-dup range")
    assert(hs(5L) == 0L && ham(hs(1L), hs(5L)) == 64,
      "orthogonal structure is maximally far")
  }

  test("imageNearDupPairs: copies cluster, distinct image stays out") {
    val rows = media(
      MediaRow(1L, png(64, 64, (x, _) => x * 4), "png"),
      MediaRow(2L, png(96, 48, (x, _) => x * 8 / 3), "png"),
      MediaRow(3L, png(64, 64, (x, _) => x * 4 + 20), "png"),
      MediaRow(5L, png(64, 64, (_, y) => y * 4), "png"))
    val pairs = Multimodal.imageNearDupPairs(rows, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got $pairs — near-dup trio only, vertical ramp excluded")
  }

  test("extractFeatures dispatches by fmt: real image/audio/avi decoders; codec video drops; fake only for unknown") {
    val image = png(16, 8, (x, _) => x * 10)
    val audio = wav(8000, 1, 16, Array.fill(250)(Array(1000)))
    val video = avi(16, 8, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq.fill(7)(jpegFrame(16, 8, (x, _) => x * 10)))
    val out = Multimodal.extractFeatures(media(
        MediaRow(1L, image, "png"),
        MediaRow(2L, audio, "wav"),
        MediaRow(3L, "pretend-video".getBytes("US-ASCII"), "mp4"),
        MediaRow(4L, "plain text".getBytes("US-ASCII"), "txt"),
        MediaRow(5L, "junk".getBytes("US-ASCII"), "png"),   // poison image
        MediaRow(6L, "junk".getBytes("US-ASCII"), "wav"),   // poison audio
        MediaRow(7L, video, "avi"),
        MediaRow(8L, "junk".getBytes("US-ASCII"), "avi")))  // poison video
      .collect().map(f => f.doc_id -> f).toMap
    // real arms: a decoded still is 1 frame; WAV reports true PCM
    // frames; AVI reports the container's video stream length
    assert(out(1L).n_frames == 1 && out(1L).n_bytes == image.length)
    assert(out(2L).n_frames == 250)
    assert(out(7L).n_frames == 7)
    // unknown fmt keeps the deterministic fake (n_bytes % 7 + 1)
    assert(out(4L).n_frames == 10 % 7 + 1)
    // poison payloads on REAL modalities drop, and codec-compressed
    // video (mp4 — no JDK codec) drops too: no fabricated features
    assert(out.keySet == Set(1L, 2L, 4L, 7L))
  }

  // ---- video ----------------------------------------------------------

  test("decodeVideo: MJPEG AVI container metadata — dims, frames, fps, codec, duration") {
    val frames = Seq.tabulate(10)(i => jpegFrame(32, 16, (x, _) => x * 8 + i))
    val v = avi(32, 16, (1001, 30000), fourcc("MJPG"), 24, "00dc", frames)
    val out = Multimodal.decodeVideo(media(MediaRow(1L, v, "avi"))).collect()
    assert(out.length == 1)
    val f = out.head
    assert(f.width == 32 && f.height == 16 && f.n_frames == 10)
    assert(f.codec == "MJPG")
    assert(math.abs(f.fps - 29.97) < 0.01, s"fps=${f.fps}")
    assert(math.abs(f.duration_ms - 10 * 1001.0 / 30000 * 1000) < 1.0)
  }

  test("decodeVideo: corrupt, truncated, and lying-length payloads drop, never throw") {
    val good = avi(8, 8, (1, 25), 0, 24, "00db",
      Seq.fill(3)(dibFrame(8, 8, (x, _) => x * 30)))
    val truncated = good.take(40)
    val lyingLen = good.clone()
    // movi frame chunk declares more bytes than exist: the parser must
    // bounds-check, not read past the buffer. Find the first 00db id.
    val idx = good.indices.find(i => good(i) == '0' && good(i + 1) == '0' &&
      good(i + 2) == 'd' && good(i + 3) == 'b').get
    lyingLen(idx + 4) = 0x7f.toByte; lyingLen(idx + 5) = 0x7f.toByte
    lyingLen(idx + 6) = 0x7f.toByte; lyingLen(idx + 7) = 0x7f.toByte
    val notAvi = "RIFFxxxxWAVE".getBytes("US-ASCII")
    val out = Multimodal.decodeVideo(media(
        MediaRow(1L, good, "avi"),
        MediaRow(2L, truncated, "avi"),
        MediaRow(3L, lyingLen, "avi"),
        MediaRow(4L, notAvi, "avi"),
        MediaRow(5L, Array[Byte](), "avi")))
      .collect()
    assert(out.map(_.doc_id).toSet == Set(1L),
      "only the clean AVI survives; every corruption drops")
  }

  test("videoFrameHashes: MJPEG and DIB frames hash like the equivalent still; stride bounds work") {
    // same horizontal ramp as the imageDHash test — the frame hash must
    // agree with the still-image hash of the same picture (all 64 bits)
    val mjpeg = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq.fill(4)(jpegFrame(64, 64, (x, _) => x * 4)))
    val dib = avi(64, 64, (1, 25), 0, 24, "00db",
      Seq.fill(12)(dibFrame(64, 64, (x, _) => x * 4)))
    val hs = Multimodal.videoFrameHashes(
        media(MediaRow(1L, mjpeg, "avi"), MediaRow(2L, dib, "avi")),
        every = 1, maxFrames = 4)
      .collect()
    val byDoc = hs.groupBy(_.doc_id)
    // doc 1: 4 frames, cap 4 → all; doc 2: 12 frames, cap 4 → stride 3
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(byDoc(2L).map(_.frame_idx).sorted.toSeq == Seq(0L, 3L, 6L, 9L))
    assert(hs.forall(_.dhash == -1L),
      "horizontal ramp sets all 64 gradient bits, JPEG and DIB alike")
  }

  test("videoKeyframeHashes: exactly first/middle/last, any clip length; " +
      "non-decodable fourccs yield no rows") {
    val mjpeg12 = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq.fill(12)(jpegFrame(64, 64, (x, _) => x * 4)))
    val mjpeg1 = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq(jpegFrame(64, 64, (x, _) => x * 4)))
    val mjpeg2 = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq.fill(2)(jpegFrame(64, 64, (x, _) => x * 4)))
    // H.264 fourcc: metadata-only codec — keyframes must yield nothing
    val h264 = avi(64, 64, (1, 25), fourcc("H264"), 24, "00dc",
      Seq(Array[Byte](1, 2, 3, 4)))
    val ks = Multimodal.videoKeyframeHashes(media(
        MediaRow(1L, mjpeg12, "avi"), MediaRow(2L, mjpeg1, "avi"),
        MediaRow(3L, mjpeg2, "avi"), MediaRow(4L, h264, "avi")))
      .collect().groupBy(_.doc_id)
    assert(ks(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 6L, 11L))
    assert(ks(2L).map(_.frame_idx).toSeq == Seq(0L), "1-frame clip: dedup'd indices")
    assert(ks(3L).map(_.frame_idx).sorted.toSeq == Seq(0L, 1L))
    assert(!ks.contains(4L), "no pixel path for H264 — metadata-only")
    // same dHash as the stride sampler on the same picture (shared kernel)
    assert(ks(1L).forall(_.dhash == -1L))
  }

  test("videoFrameHashes feed hammingNearDupPairs64: near-dup clips cluster") {
    val a = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq(jpegFrame(64, 64, (x, _) => x * 4)))
    val b = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq(jpegFrame(64, 64, (x, _) => x * 4 + 20)))   // re-brightened copy
    val c = avi(64, 64, (1, 25), fourcc("MJPG"), 24, "00dc",
      Seq(jpegFrame(64, 64, (_, y) => y * 4)))        // different structure
    val hashes = Multimodal.videoFrameHashes(media(
        MediaRow(1L, a, "avi"), MediaRow(2L, b, "avi"), MediaRow(3L, c, "avi")))
      .toDF()
    val pairs = Multimodal.hammingNearDupPairs64(
        hashes, "doc_id", "dhash", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("decompression bombs drop before allocation: huge-dims BMP still and lying-dims DIB AVI") {
    // a 54-byte BMP header declaring 60000×60000×24bpp with no pixel
    // data: without the dimension pre-check, the decoder allocates a
    // ~10 GB raster before failing — and an OutOfMemoryError is not
    // NonFatal, so the poison blob would kill the executor, not drop
    val bmp = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(60).putInt(0).putInt(54)
    bmp.putInt(40).putInt(60000).putInt(60000).putShort(1).putShort(24)
    bmp.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val bombImg = bmp.array()
    assert(Multimodal.decodeImages(media(MediaRow(1L, bombImg, "bmp")))
      .collect().isEmpty)
    assert(Multimodal.imageDHash(media(MediaRow(1L, bombImg, "bmp")))
      .collect().isEmpty)
    assert(Multimodal.extractFeatures(media(MediaRow(1L, bombImg, "bmp")))
      .collect().isEmpty)
    // DIB AVI whose strf lies 50000×50000 over a 4-byte frame chunk:
    // rowBytes*h overflows Int (7.5e9), which used to slip the length
    // guard and index out of bounds — container metadata must survive,
    // frame pixels must drop, nothing may throw
    val bombAvi = avi(50000, 50000, (1, 25), 0, 24, "00db",
      Seq(Array[Byte](1, 2, 3, 4)))
    val vf = Multimodal.decodeVideo(media(MediaRow(2L, bombAvi, "avi")))
      .collect()
    assert(vf.length == 1 && vf.head.width == 50000 && vf.head.n_frames == 1)
    assert(Multimodal.videoFrameHashes(media(MediaRow(2L, bombAvi, "avi")))
      .collect().isEmpty)
  }

  test("hammingNearDupPairs64: pigeonhole recall at ≤3, verify rejects shared-band far pairs, negatives band correctly") {
    val df = Seq(
      (1L, 0L),                      // origin
      (2L, 7L),                      // hamming 3 from origin → must surface
      (3L, 0x000000000001000fL),     // hamming 5 from origin, shares 2 bands → candidate, verify rejects; hamming 2 from id 2 → real pair
      (4L, 0x1111111111111111L),     // hamming 16, no shared band → never a candidate
      (5L, -1L),                     // all bits — sign-extension trap
      (6L, -2L))                     // hamming 1 from id 5
      .toDF("vid", "fp64")
    val got = Multimodal.hammingNearDupPairs64(df, "vid", "fp64", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3), (2L, 3L, 2), (5L, 6L, 1)), s"got $got")
  }
}
