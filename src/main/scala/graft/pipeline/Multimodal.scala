package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * payloads with typed metadata, processed by per-partition decoders.
 *
 * The Spark side — schemas, encoders, partition-batched processing, the
 * explode shape for frame sampling — is real and tested. IMAGE decoding is
 * REAL: [[decodeImageDims]] / [[imageDHash]] / [[imageMeta]] run on the
 * JDK's built-in javax.imageio codecs (PNG/JPEG/GIF/BMP), headless, no
 * external dependency. AUDIO decoding is REAL too:
 * [[decodeAudioFormat]] / [[audioFingerprint]] / [[audioMeta]] run on the
 * JDK's built-in javax.sound.sampled codecs (WAV/AIFF/AU PCM). VIDEO
 * decoding is REAL for AVI/MJPEG:
 * [[decodeVideoMeta]] / [[videoFingerprint]] / [[videoMeta]] parse the
 * RIFF/AVI container directly (the chunk grammar is a public Microsoft
 * spec) and decode the Motion-JPEG frames — which are plain JPEGs — with
 * the same javax.imageio codec as the image tier, so the whole path is
 * JDK-only. Codecs the JDK cannot express (H.264 etc.) still fall back to
 * the clearly-marked deterministic stub in [[decodeMeta]]/[[sampleFrames]];
 * swap that one function for jcodec/ffmpeg bindings without touching the
 * pipeline.
 *
 * Scale notes: decode work is a pure `mapPartitions` — no shuffle, linear
 * scan, parallelism = input partitions. Payloads stay off the driver. For
 * 100 TB of media, `spark.sql.files.maxPartitionBytes` sizes the per-task
 * batch; decoded metadata is orders of magnitude smaller than payloads, so
 * the only large I/O is the initial columnar scan (and parquet stores the
 * binary column contiguously, so metadata-only readers that drop `payload`
 * never touch the bytes).
 */
object Multimodal {

  /** A media object at rest: opaque payload + routing metadata. */
  case class MediaFile(media_id: Long, modality: String, payload: Array[Byte])

  case class MediaMeta(
      media_id: Long,
      modality: String,
      byte_len: Long,
      width: Long,      // image/video: fake-decoded dimensions
      height: Long,
      n_frames: Long)   // video: fake-decoded frame count; 1 otherwise

  case class Frame(media_id: Long, frame_idx: Long, frame_offset: Long)

  // ------------------------------------------------------------------
  // STUB DECODERS — deterministic fakes standing in for a video codec
  // (which the JDK does not ship). They also back the driver's
  // oracle queries, whose payloads are text bytes no real codec accepts.
  // Swap these bodies for jcodec / ffmpeg calls; the Spark pipeline
  // around them is production-shaped. Image and audio decoding have REAL
  // tiers below ([[imageMeta]] / [[audioMeta]] families).
  // ------------------------------------------------------------------

  /** STUB: "decode" image dimensions from payload bytes (deterministic
    * arithmetic on byte length, stands in for a header parse). */
  private[pipeline] def stubDecodeDims(payload: Array[Byte]): (Long, Long) = {
    val len = payload.length.toLong
    (1L + len % 640L, 1L + len % 480L)
  }

  /** STUB: "decode" a video's frame count (deterministic; one frame per
    * KiB of payload, capped at 8). */
  private[pipeline] def stubFrameCount(payload: Array[Byte]): Long =
    math.min(8L, 1L + payload.length.toLong / 1024L)

  // ------------------------------------------------------------------
  // Pipeline operators (real)
  // ------------------------------------------------------------------

  /** Decode typed metadata for every media row. Per-partition batch map —
    * no shuffle; the decoder is invoked once per row with the raw bytes. */
  def decodeMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h) = stubDecodeDims(m.payload)
        val frames = if (m.modality == "video") stubFrameCount(m.payload) else 1L
        MediaMeta(m.media_id, m.modality, m.payload.length.toLong, w, h, frames)
      }
    }
  }

  /** Sample every frame descriptor of video rows (explode shape: one output
    * row per frame, offsets point into the payload). */
  def sampleFrames(media: Dataset[MediaFile]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val n = stubFrameCount(m.payload)
      val stride = if (n > 0) m.payload.length.toLong / n else 0L
      (0L until n).map(i => Frame(m.media_id, i, i * stride))
    }
  }

  // ------------------------------------------------------------------
  // REAL image tier (javax.imageio — JDK built-in PNG/JPEG/GIF/BMP)
  // ------------------------------------------------------------------

  /** Decoded image facts: `ok = false` (zeros elsewhere) when no installed
    * codec accepts the payload — corrupt/truncated files are data, not
    * exceptions, at corpus scale. `dhash` is the 64-bit difference hash
    * (see [[imageDHash]]); it is None (never a sentinel) when the header
    * parses but the raster does not decode (truncated/CMYK payloads) —
    * a 0L placeholder would collide every such row with every other one,
    * and with legitimately flat images, in near-dup clustering. */
  case class ImageMeta(
      media_id: Long, ok: Boolean, byte_len: Long,
      width: Long, height: Long, dhash: Option[Long])

  /**
   * REAL image dimensions from the payload's header via javax.imageio —
   * reader-level `getWidth/getHeight`, which parse the header only and
   * never decode the raster (cheap enough for a 100 TB metadata sweep).
   * None when no installed codec recognizes the bytes. Malformed payloads
   * make JDK readers throw RuntimeExceptions, not just IOException
   * (AIOOBE/NegativeArraySize on bad GIF/JPEG headers) — all non-fatal
   * throwables are data here, never task failures.
   */
  def decodeImageDims(payload: Array[Byte]): Option[(Long, Long)] =
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            Some((r.getWidth(0).toLong, r.getHeight(0).toLong))
          } finally r.dispose()
        }
      } finally if (in != null) in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * REAL 64-bit difference hash (dHash) of an image payload: full decode,
   * area-averaged downscale to 9x8 luminance, bit i*8+j = gray(i+1, j) >
   * gray(i, j). Near-identical images land within a few bits of Hamming
   * distance, so image near-dup clustering reuses the EXISTING SimHash
   * pair machinery verbatim — feed (media_id, dhash) into
   * [[graft.pipeline.Dedup.simhashChunks]]-style blocking or
   * [[graft.streaming.TopnStreaming.streamingNearDupPairs]]' batch twin.
   * None when the payload does not decode.
   */
  def imageDHash(payload: Array[Byte]): Option[Long] =
    decodeImage(payload).map(dHashOf)

  /** Full raster decode; None on anything a codec rejects (including the
    * RuntimeExceptions JDK readers throw on malformed payloads). */
  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  private def dHashOf(src: java.awt.image.BufferedImage): Long = {
      val (gw, gh) = (9, 8)
      // area-average into a 9x8 luminance grid (deterministic; no AWT
      // rendering-hint variance across JVMs)
      val gray = Array.ofDim[Double](gw, gh)
      val (w, h) = (src.getWidth, src.getHeight)
      var gx = 0
      while (gx < gw) {
        var gy = 0
        while (gy < gh) {
          val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
          val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
          var sum = 0.0; var n = 0
          var x = x0
          while (x < math.min(x1, w)) {
            var y = y0
            while (y < math.min(y1, h)) {
              val rgb = src.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)
              n += 1; y += 1
            }
            x += 1
          }
          gray(gx)(gy) = if (n == 0) 0.0 else sum / n
          gy += 1
        }
        gx += 1
      }
      var bits = 0L
      var i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          if (gray(i + 1)(j) > gray(i)(j)) bits |= 1L << (i * 8 + j)
          j += 1
        }
        i += 1
      }
      bits
  }

  /** Real image metadata + perceptual hash for every media row — pure
    * `mapPartitions`, no shuffle, payloads never leave the executor. One
    * full decode per row serves BOTH dims and dHash; the header-only
    * parse ([[decodeImageDims]]) is the fallback for payloads whose
    * header parses but whose raster does not (dims known, dhash None). */
  def imageMeta(media: Dataset[MediaFile]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeImage(m.payload) match {
          case Some(img) =>
            ImageMeta(m.media_id, ok = true, m.payload.length.toLong,
              img.getWidth.toLong, img.getHeight.toLong, Some(dHashOf(img)))
          case None =>
            decodeImageDims(m.payload) match {
              case Some((w, h)) =>
                ImageMeta(m.media_id, ok = true, m.payload.length.toLong, w, h, None)
              case None =>
                ImageMeta(m.media_id, ok = false, m.payload.length.toLong, 0L, 0L, None)
            }
        }
      }
    }
  }

  /** Image near-duplicate pairs: real dHash fingerprints fed through the
    * exact-recall pigeonhole pair scan ([[Dedup.fingerprintPairs]] — the
    * same engine as text SimHash dedup, including hot-bucket tiling).
    * Payloads without a raster-decoded fingerprint are excluded (they
    * have no dHash), not errors. Output: (doc_a, doc_b, hamming). */
  def imageNearDupPairs(media: Dataset[MediaFile], maxDist: Int = 3): DataFrame =
    Dedup.fingerprintPairs(
      imageMeta(media).filter(col("dhash").isNotNull).toDF(),
      "media_id", "dhash", maxDist)

  // ------------------------------------------------------------------
  // REAL audio tier (javax.sound.sampled — JDK built-in WAV/AIFF/AU)
  // ------------------------------------------------------------------

  /** Decoded audio facts: `ok = false` (zeros elsewhere) when no installed
    * codec accepts the payload. `fingerprint` is the 64-bit energy-envelope
    * difference hash (see [[audioFingerprint]]); None when the header
    * parses but the PCM stream does not decode. */
  case class AudioMeta(
      media_id: Long, ok: Boolean, byte_len: Long,
      sample_rate: Long, channels: Long, n_frames: Long, duration_ms: Long,
      fingerprint: Option[Long])

  /**
   * REAL audio header facts via javax.sound.sampled (WAV/AIFF/AU ship in
   * every JDK): (sampleRate, channels, frameLength) from
   * `AudioSystem.getAudioFileFormat` — header-only, no PCM decode, cheap
   * enough for a 100 TB metadata sweep. None when no codec recognizes the
   * bytes; all non-fatal throwables are data, never task failures.
   */
  def decodeAudioFormat(payload: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val f = fmt.getFormat
      Some((f.getSampleRate.toLong, f.getChannels.toLong, fmt.getFrameLength.toLong))
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * REAL 64-bit energy-envelope difference hash of an audio payload: full
   * PCM decode (channel-averaged to mono), RMS energy over 65 equal time
   * windows, bit i = energy(i+1) > energy(i) — [[imageDHash]]'s idea in
   * the time domain. Invariant to constant gain (both sides of every
   * comparison scale together), so re-encoded/volume-normalized copies of
   * a clip land within a few bits of Hamming distance and audio near-dup
   * clustering reuses the exact-recall pigeonhole pair machinery
   * verbatim. None when the payload does not decode to supported PCM.
   */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        // normalize to 16-bit signed PCM so every supported source format
        // (u8 / s16 / float WAVs, AIFF) reads through one code path
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
          f.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val nSamples = bytes.length / (2 * ch)
          if (nSamples < 130) None // need >= 2 samples per window
          else {
            val windows = 65
            val energy = new Array[Double](windows)
            var w = 0
            while (w < windows) {
              val s0 = w.toLong * nSamples / windows
              val s1 = (w + 1).toLong * nSamples / windows
              var sum = 0.0
              var s = s0
              while (s < s1) {
                var c = 0
                var mono = 0.0
                while (c < ch) {
                  val off = (s * ch + c).toInt * 2
                  val v = ((bytes(off + 1) << 8) | (bytes(off) & 0xFF)).toShort
                  mono += v.toDouble
                  c += 1
                }
                mono /= ch
                sum += mono * mono
                s += 1
              }
              energy(w) = sum / (s1 - s0)
              w += 1
            }
            var bits = 0L
            var i = 0
            while (i < 64) {
              if (energy(i + 1) > energy(i)) bits |= 1L << i
              i += 1
            }
            Some(bits)
          }
        } finally pcm.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real audio metadata + envelope fingerprint for every media row —
    * pure `mapPartitions`, no shuffle, payloads never leave the executor.
    * Mirrors [[imageMeta]]: header-only facts when the PCM stream does
    * not decode, ok=false when nothing recognizes the bytes. */
  def audioMeta(media: Dataset[MediaFile]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeAudioFormat(m.payload) match {
          case Some((rate, ch, frames)) =>
            val durMs = if (rate > 0) frames * 1000L / rate else 0L
            AudioMeta(m.media_id, ok = true, m.payload.length.toLong,
              rate, ch, frames, durMs, audioFingerprint(m.payload))
          case None =>
            AudioMeta(m.media_id, ok = false, m.payload.length.toLong,
              0L, 0L, 0L, 0L, None)
        }
      }
    }
  }

  /** Audio near-duplicate pairs: real envelope fingerprints through the
    * exact-recall pigeonhole pair scan — the same engine as text SimHash
    * and image dHash dedup. Output: (doc_a, doc_b, hamming). */
  def audioNearDupPairs(media: Dataset[MediaFile], maxDist: Int = 3): DataFrame =
    Dedup.fingerprintPairs(
      audioMeta(media).filter(col("fingerprint").isNotNull)
        .withColumnRenamed("fingerprint", "fp").toDF(),
      "media_id", "fp", maxDist)

  // ------------------------------------------------------------------
  // REAL video tier (RIFF/AVI container + MJPEG frames via javax.imageio)
  // ------------------------------------------------------------------

  /** Decoded video facts: `ok = false` (zeros elsewhere) when the payload
    * is not a parseable AVI. `fingerprint` is the majority-vote dHash
    * across sampled frames (see [[videoFingerprint]]); None when the
    * container parses but no frame raster decodes. */
  case class VideoMeta(
      media_id: Long, ok: Boolean, byte_len: Long,
      width: Long, height: Long, n_frames: Long, duration_ms: Long,
      fingerprint: Option[Long])

  /** One frame chunk inside an AVI payload: index, byte offset of the
    * frame DATA within the payload, and its length. Offsets point at the
    * chunk body (the JPEG bytes for MJPEG), not the chunk header. */
  case class VideoFrameRef(frame_idx: Long, frame_offset: Long, frame_len: Long)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /**
   * REAL AVI header facts from the payload's RIFF structure: (width,
   * height, totalFrames, microSecPerFrame) from the 'avih' main header
   * inside the 'hdrl' list (AVIMAINHEADER layout per the public RIFF/AVI
   * spec; all fields little-endian). Header-only — no frame decode, cheap
   * enough for a 100 TB metadata sweep. None when the bytes are not a
   * RIFF/'AVI ' container with an 'avih' chunk; all malformed-payload
   * throwables are data, never task failures.
   */
  def decodeVideoMeta(payload: Array[Byte]): Option[(Long, Long, Long, Long)] =
    try {
      if (payload.length < 24 || fourCC(payload, 0) != "RIFF" ||
          fourCC(payload, 8) != "AVI ") None
      else findChunk(payload, 12, math.min(payload.length, 12 + leInt(payload, 4) - 4),
        "avih").map { off =>
        // AVIMAINHEADER: usPerFrame @0, totalFrames @16, width @32, height @36
        (leInt(payload, off + 32).toLong, leInt(payload, off + 36).toLong,
          leInt(payload, off + 16).toLong, leInt(payload, off).toLong)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Depth-first scan of a RIFF chunk range for the first chunk with the
    * given id, descending into LIST containers; returns the offset of the
    * chunk BODY. Chunk sizes are padded to even per the RIFF grammar. */
  private def findChunk(b: Array[Byte], start: Int, end: Int, id: String): Option[Int] = {
    var off = start
    while (off + 8 <= end) {
      val cid = fourCC(b, off)
      val sz = leInt(b, off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      if (cid == id) return Some(off + 8)
      if (cid == "LIST") {
        val inner = findChunk(b, off + 12, math.min(end, off + 8 + sz), id)
        if (inner.isDefined) return inner
      }
      off += 8 + sz + (sz & 1)
    }
    None
  }

  /**
   * REAL frame extraction: walk the 'movi' list and return every video
   * frame chunk ('##dc' compressed / '##db' uncompressed, any stream
   * number) in file order, as (index, payload offset, length) references —
   * the zero-copy shape: callers slice the payload only for frames they
   * actually decode. Empty when the payload is not an AVI or has no movi
   * frames.
   */
  def videoFrameRefs(payload: Array[Byte]): Seq[VideoFrameRef] =
    try {
      if (payload.length < 24 || fourCC(payload, 0) != "RIFF" ||
          fourCC(payload, 8) != "AVI ") Seq.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[VideoFrameRef]
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val cid = fourCC(payload, off)
            val sz = leInt(payload, off + 4)
            if (sz < 0 || off + 8 + sz > payload.length) return
            if (cid == "LIST") {
              val ltype = fourCC(payload, off + 8)
              if (ltype == "movi" || ltype == "rec ")
                walk(off + 12, math.min(end, off + 8 + sz))
            } else if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
                (cid.substring(2) == "dc" || cid.substring(2) == "db")) {
              out += VideoFrameRef(out.length.toLong, (off + 8).toLong, sz.toLong)
            }
            off += 8 + sz + (sz & 1)
          }
        }
        walk(12, math.min(payload.length, 12 + leInt(payload, 4) - 4))
        out.toSeq
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /**
   * REAL 64-bit video fingerprint: decode up to `maxFrames` evenly-strided
   * MJPEG frames (each is a plain JPEG — javax.imageio), dHash each with
   * the image tier's grid ([[imageDHash]]'s kernel), and take the bitwise
   * MAJORITY across frames — bit b is set iff more than half the sampled
   * frames set it. Per-frame jitter (re-encode noise, a changed frame or
   * two) flips only minority bits, so near-identical videos land within a
   * few bits of Hamming distance and video near-dup clustering reuses the
   * exact-recall pigeonhole pair machinery verbatim. None when no frame
   * decodes.
   */
  def videoFingerprint(payload: Array[Byte], maxFrames: Int = 9): Option[Long] =
    fingerprintFromRefs(payload, videoFrameRefs(payload), maxFrames)

  /** The fingerprint kernel over already-extracted frame refs, so callers
    * that have parsed the container once ([[videoMeta]]) do not walk the
    * RIFF tree a second time. */
  private def fingerprintFromRefs(
      payload: Array[Byte],
      refs: Seq[VideoFrameRef],
      maxFrames: Int): Option[Long] = {
    if (refs.isEmpty) None
    else {
      val n = refs.length
      val take = math.min(maxFrames, n)
      val hashes = (0 until take).flatMap { i =>
        val r = refs(i * n / take)
        val bytes = java.util.Arrays.copyOfRange(
          payload, r.frame_offset.toInt, (r.frame_offset + r.frame_len).toInt)
        decodeImage(bytes).map(dHashOf)
      }
      if (hashes.isEmpty) None
      else {
        var bits = 0L
        var b = 0
        while (b < 64) {
          var ones = 0
          hashes.foreach(h => if (((h >> b) & 1L) == 1L) ones += 1)
          if (2 * ones > hashes.length) bits |= 1L << b
          b += 1
        }
        Some(bits)
      }
    }
  }

  /** Real video metadata + majority fingerprint for every media row —
    * pure `mapPartitions`, no shuffle, payloads never leave the executor.
    * Mirrors [[imageMeta]]/[[audioMeta]]: ok=false when the container does
    * not parse; fingerprint None when no frame raster decodes. Frame count
    * is the OBSERVED movi-chunk count (headers lie; frames don't),
    * duration from the avih frame period. */
  def videoMeta(media: Dataset[MediaFile]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeVideoMeta(m.payload) match {
          case Some((w, h, _, usPerFrame)) =>
            val refs = videoFrameRefs(m.payload)
            val nFrames = refs.length.toLong
            VideoMeta(m.media_id, ok = true, m.payload.length.toLong, w, h,
              nFrames, nFrames * usPerFrame / 1000L,
              fingerprintFromRefs(m.payload, refs, maxFrames = 9))
          case None =>
            VideoMeta(m.media_id, ok = false, m.payload.length.toLong,
              0L, 0L, 0L, 0L, None)
        }
      }
    }
  }

  /** Real frame sampling over AVI payloads: one row per movi frame chunk
    * with its true byte offset and length — the real-decoder counterpart
    * of the stub [[sampleFrames]] explode shape. */
  def sampleVideoFrames(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      videoFrameRefs(m.payload).map(r =>
        (m.media_id, r.frame_idx, r.frame_offset, r.frame_len))
    }.toDF("media_id", "frame_idx", "frame_offset", "frame_len")
  }

  /** Video near-duplicate pairs: real majority-dHash fingerprints through
    * the exact-recall pigeonhole pair scan — the same engine as text
    * SimHash, image dHash and audio envelope dedup. Output:
    * (doc_a, doc_b, hamming). */
  def videoNearDupPairs(media: Dataset[MediaFile], maxDist: Int = 3): DataFrame =
    Dedup.fingerprintPairs(
      videoMeta(media).filter(col("fingerprint").isNotNull)
        .withColumnRenamed("fingerprint", "fp").toDF(),
      "media_id", "fp", maxDist)

  /**
   * Deterministic synthetic WAV (REAL encoder: javax.sound.sampled) for
   * fixture corpora: a 440 Hz tone shaped by a per-`group` 65-step
   * pseudorandom amplitude envelope. `member` 0 is the base clip, 1 a
   * near-duplicate (global gain 0.8 + small per-step jitter — the
   * envelope HASH is gain-invariant, so only knife-edge steps flip),
   * 2 a different envelope entirely (far in Hamming space).
   */
  def syntheticWav(group: Int, member: Int): Array[Byte] = {
    val rate = 8000f
    val nSamples = 4160 // 65 windows x 64 samples
    val seed = if (member == 2) group + 9999 else group
    val rnd = new java.util.Random(seed.toLong)
    val env = Array.fill(65)(0.1 + 0.9 * rnd.nextDouble())
    val jit = new java.util.Random(group.toLong + 555L)
    val pcm = new Array[Byte](nSamples * 2)
    var s = 0
    while (s < nSamples) {
      val w = s * 65 / nSamples
      val gain = member match {
        case 1 => env(w) * 0.8 * (1.0 + 0.02 * (jit.nextDouble() - 0.5))
        case _ => env(w)
      }
      val v = (gain * 12000.0 *
        math.sin(2.0 * math.Pi * 440.0 * s / rate)).toInt.toShort
      pcm(2 * s) = (v & 0xFF).toByte
      pcm(2 * s + 1) = ((v >> 8) & 0xFF).toByte
      s += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /**
   * Deterministic synthetic PNG (REAL encoder: javax.imageio) for fixture
   * corpora: per `group` a distinct 32x24 gray gradient; `member` 0 is the
   * base image, 1 its near-duplicate (a 3x3 corner blotch — a few dHash
   * bits), 2 the inverted gradient (far in dHash space). Encoded on the
   * EXECUTOR inside the mapping closure, so driver queries exercise the
   * whole real tier: encode -> imageio decode -> dHash -> pair scan.
   */
  def syntheticPng(group: Int, member: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gradientFrame(group, member, 0), "png", bos)
    bos.toByteArray
  }

  /** The shared 32x24 gray-gradient raster behind [[syntheticPng]] and
    * [[syntheticAvi]]: per `group` a distinct slope, `member` 0 base /
    * 1 corner-blotched near-twin / 2 inverted (far), and `frame` pans the
    * gradient so video frames differ while keeping the same dHash shape. */
  private def gradientFrame(group: Int, member: Int, frame: Int): java.awt.image.BufferedImage = {
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val stride = 3 + (group % 8)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val base = (x * stride + y * (group % 5) + frame * 11) % 256
        val v = member match {
          case 1 => if (x < 3 && y < 3) 255 else base
          case 2 => 255 - base
          case _ => base
        }
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        y += 1
      }
      x += 1
    }
    img
  }

  /**
   * Deterministic synthetic AVI/MJPEG (REAL encoder: RIFF chunk grammar +
   * javax.imageio JPEG frames) for fixture corpora: `nFrames` panning
   * gradient frames per the [[gradientFrame]] family — `member` 0 the base
   * clip, 1 a near-duplicate (every frame corner-blotched: a few majority
   * bits), 2 the inverted clip (far in Hamming space). Encoded on the
   * EXECUTOR inside mapping closures so driver queries exercise the whole
   * real tier: RIFF write -> RIFF parse -> per-frame imageio decode ->
   * majority dHash -> pair scan.
   */
  def syntheticAvi(group: Int, member: Int, nFrames: Int = 6): Array[Byte] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val (w, h) = (32, 24)
    val usPerFrame = 33333
    def le(v: Int): Array[Byte] = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
      cc(id) ++ le(body.length) ++ body ++ pad
    }
    def list(ltype: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(ltype) ++ body)

    val jpegs = (0 until nFrames).map { f =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gradientFrame(group, member, f), "jpg", bos)
      bos.toByteArray
    }
    // AVIMAINHEADER (56 bytes)
    val avih = le(usPerFrame) ++ le(0) ++ le(0) ++ le(0) ++ le(nFrames) ++
      le(0) ++ le(1) ++ le(0) ++ le(w) ++ le(h) ++
      le(0) ++ le(0) ++ le(0) ++ le(0)
    // AVISTREAMHEADER (56 bytes): 'vids'/'MJPG', rate 30/1, length nFrames
    val strh = cc("vids") ++ cc("MJPG") ++ le(0) ++ le(0) ++ le(0) ++
      le(1) ++ le(30) ++ le(0) ++ le(nFrames) ++ le(0) ++ le(-1) ++ le(0) ++
      le(0) ++ le(w | (h << 16)) // rcFrame: (left,top)=(0,0) (right,bottom)=(w,h)
    // BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    val strf = le(40) ++ le(w) ++ le(h) ++
      Array[Byte](1, 0, 24, 0) ++ cc("MJPG") ++ le(w * h * 3) ++
      le(0) ++ le(0) ++ le(0) ++ le(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le(body.length) ++ body
  }

  /** Lift the documents table into a fake media table (payload = UTF-8
    * bytes of the text, modality round-robins image/audio/video) — the
    * deterministic fixture used by tests and the driver queries. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaFile]
  }
}
