package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(mime: String, sizeBytes: Long, width: Int, height: Int,
                     durationMs: Long)

/** One media object: opaque binary content + metadata (SURVEY §2B
  * multimodal columns: media are `binary` columns with a typed struct —
  * never parsed by the engine itself).
  */
case class MediaFile(path: String, kind: String, content: Array[Byte],
                     meta: MediaMeta)

/** A decoded frame/feature row produced by the (stubbed) decoders. */
case class MediaFeature(path: String, kind: String, frameNo: Int,
                        embedding: Array[Float])

/** Multimodal column operators. The Spark-side plumbing — binaryFile scan,
  * schema, partition-preserving `mapPartitions` with per-batch processing,
  * array<float> feature columns — is real and tested. Header PROBES are
  * real pure-JDK byte parses for PNG (IHDR), JPEG (SOF marker), GIF (logical
  * screen descriptor), WAV (fmt/data chunks), MP3 (MPEG frame header, CBR
  * duration estimate) and MP4 (ISO-BMFF box walk: mvhd duration, tkhd
  * dimensions). Image payload RESIZE is real too (ImageIO decode → scale →
  * re-encode), as are image pooled-raster features, WAV PCM sample
  * decode + waveform features (PCM is uncompressed — pure JDK), and
  * MJPEG-in-AVI video frame extraction ([[aviMjpegFrames]]: RIFF movi
  * walk → per-frame JPEG payloads, which ImageIO decodes — the one video
  * codec needing no codec library). What remains a clearly-marked
  * deterministic STUB: INTER-FRAME video codecs (H.264/VP9 in MP4/MKV)
  * and compressed-audio (MP3) payload decode and their features (no
  * codec / ML libraries in this container) — swapping those changes only
  * the function bodies marked below, not the dataflow.
  *
  * Scale: decode is embarrassingly parallel; `mapPartitions` keeps it one
  * process-wide pass per partition with no shuffle. Frame sampling explodes
  * rows (1 video → n frames) BEFORE feature extraction so the expensive step
  * parallelizes over frames, and `repartition` lets the explode fan out.
  */
object Multimodal {

  private def kindOf(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".png") || p.endsWith(".jpg") || p.endsWith(".jpeg") ||
        p.endsWith(".gif")) "image"
    else if (p.endsWith(".wav") || p.endsWith(".mp3")) "audio"
    else if (p.endsWith(".mp4") || p.endsWith(".mkv") || p.endsWith(".avi"))
      "video"
    else "binary"
  }

  /** binaryFile scan → MediaFile rows; metadata from a STUB header probe. */
  def scan(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) => probe(path, bytes) }
  }

  /** REAL PNG header parse: signature + IHDR chunk → (width, height).
    * None for anything malformed (caller falls back to the stub). */
  private[multimodal] def probePngHeader(b: Array[Byte]): Option[(Int, Int)] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def be32(o: Int) = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    if (b.length >= 24 && b.take(8).sameElements(sig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val (w, h) = (be32(16), be32(20))
      if (w > 0 && h > 0) Some((w, h)) else None
    } else None
  }

  /** REAL WAV header parse: walk RIFF chunks, read the fmt chunk's byte
    * rate and the data chunk's size → duration in ms. None when malformed.
    * The walk advances in Long arithmetic — a corrupt 32-bit chunk size must
    * never stall (Int overflow to a 0/negative delta) or send the offset
    * negative: every step moves strictly forward or the parse gives up. */
  private[multimodal] def probeWavHeader(b: Array[Byte]): Option[Long] = {
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var byteRate = 0L
    var dataLen = -1L
    while (off + 8 <= b.length && (byteRate == 0 || dataLen < 0)) {
      val o = off.toInt
      val sz = le32(o + 4).toLong & 0xffffffffL
      tag(o) match {
        // fmt payload: format(2) channels(2) sampleRate(4) byteRate(4) …
        case "fmt " if o + 20 <= b.length =>
          byteRate = le32(o + 16).toLong & 0xffffffffL
        case "data" => dataLen = sz
        case _ => ()
      }
      off += 8L + sz + (sz & 1L) // chunks are 2-byte aligned; sz >= 0 ⇒ off grows
    }
    if (byteRate > 0 && dataLen >= 0) Some(dataLen * 1000L / byteRate) else None
  }

  /** REAL WAV PCM sample decode (pure JDK — PCM is uncompressed, no codec
    * needed): RIFF chunk walk to fmt + data, then per-sample decode — 8-bit
    * unsigned, 16/24/32-bit signed little-endian, and 32-bit IEEE float
    * (format code 3) — channel-averaged to mono in [-1, 1]. The data
    * length is clamped to the bytes actually present, so a truncated
    * payload (e.g. a sampled frame slice) decodes its prefix instead of
    * failing. None for malformed or compressed (non-PCM) audio — callers
    * fall back to the stub. Returns (sampleRate, mono samples). */
  private[multimodal] def decodeWavPcm(b: Array[Byte])
      : Option[(Int, Array[Float])] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var fmtCode = 0; var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val o = off.toInt
      val sz = le32(o + 4).toLong & 0xffffffffL
      tag(o) match {
        case "fmt " if o + 24 <= b.length =>
          fmtCode = le16(o + 8); channels = le16(o + 10)
          sampleRate = le32(o + 12); bits = le16(o + 22)
        case "data" if dataOff < 0 =>
          dataOff = o + 8
          dataLen = math.min(sz, (b.length - dataOff).toLong).toInt
        case _ => ()
      }
      off += 8L + sz + (sz & 1L)
    }
    val pcmOk = fmtCode == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)
    val floatOk = fmtCode == 3 && bits == 32
    if (channels < 1 || sampleRate <= 0 || dataOff < 0 || !(pcmOk || floatOk))
      return None
    val bps = bits / 8
    val frameSize = channels * bps
    val nFrames = dataLen / frameSize
    val mono = new Array[Float](nFrames)
    var f = 0
    while (f < nFrames) {
      var sum = 0.0
      var c = 0
      while (c < channels) {
        val o = dataOff + f * frameSize + c * bps
        sum += (bits match {
          case 8 => ((b(o) & 0xff) - 128) / 128.0
          case 16 => le16(o).toShort / 32768.0
          case 24 => ((le16(o) | ((b(o + 2) & 0xff) << 16)) << 8 >> 8) / 8388608.0
          case 32 if fmtCode == 3 => java.lang.Float.intBitsToFloat(le32(o)).toDouble
          case _ => le32(o) / 2147483648.0
        })
        c += 1
      }
      mono(f) = (sum / channels).toFloat
      f += 1
    }
    Some((sampleRate, mono))
  }

  /** REAL per-window frames for PCM WAV audio: each sampled frame is a
    * SELF-CONTAINED WAV — the original `fmt ` chunk plus that window's
    * `data` span behind a fresh RIFF header — so EVERY frame decodes
    * through [[decodeWavPcm]] and gets the real waveform feature (a raw
    * mid-file byte slice has no RIFF header and would fall to the stub
    * embedding for frames 1..n−1). Window length is `everyMs` of audio,
    * rounded down to a whole sample frame. None for non-WAV or
    * compressed audio — callers fall back to the stub slices. */
  private[multimodal] def wavWindows(b: Array[Byte], everyMs: Long)
      : Option[Seq[Array[Byte]]] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var fmtOff = -1; var fmtLen = 0
    var byteRate = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val o = off.toInt
      val sz = le32(o + 4).toLong & 0xffffffffL
      tag(o) match {
        case "fmt " if o + 24 <= b.length =>
          fmtOff = o; fmtLen = (8L + sz).toInt
          byteRate = le32(o + 16); blockAlign = math.max(1, le16(o + 20))
        case "data" if dataOff < 0 =>
          dataOff = o + 8
          dataLen = math.min(sz, (b.length - dataOff).toLong).toInt
        case _ => ()
      }
      off += 8L + sz + (sz & 1L)
    }
    if (fmtOff < 0 || dataOff < 0 || dataLen <= 0 || byteRate <= 0 ||
        fmtOff + fmtLen > b.length) return None
    val win = math.max(blockAlign,
      (byteRate * everyMs / 1000L).toInt / blockAlign * blockAlign)
    val n = (dataLen + win - 1) / win
    def le32b(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    Some((0 until n).map { i =>
      val from = dataOff + i * win
      val len = math.min(win, dataOff + dataLen - from)
      val out = new java.io.ByteArrayOutputStream(44 + len)
      out.write("RIFF".getBytes("US-ASCII"))
      le32b(out, 4 + fmtLen + 8 + len)
      out.write("WAVE".getBytes("US-ASCII"))
      out.write(b, fmtOff, fmtLen)
      out.write("data".getBytes("US-ASCII"))
      le32b(out, len)
      out.write(b, from, len)
      out.toByteArray
    })
  }

  /** REAL audio waveform feature for WAV PCM payloads: the mono signal
    * splits into dim/4 equal windows, each contributing
    * [rms, zero-crossing rate, high-pass rms, low-pass rms] — the energy
    * envelope plus a coarse two-band split from two-tap filters
    * (first-difference high-pass, two-tap-mean low-pass). Frequency-
    * discriminative without an FFT: for a pure tone, hp-rms/rms =
    * 2·sin(π·f/sr) and zcr = 2f/sr. Deterministic, model-free, pure JDK.
    * None when the payload isn't decodable PCM (compressed audio keeps
    * the stub). */
  private[multimodal] def audioWaveformFeature(bytes: Array[Byte],
                                               dim: Int): Option[Array[Float]] =
    decodeWavPcm(bytes).flatMap { case (_, s) =>
      if (s.length < 2) None
      else {
        val g = math.max(1, dim / 4)
        val feats = new Array[Float](g * 4)
        var w = 0
        while (w < g) {
          val from = (w.toLong * s.length / g).toInt
          val until = ((w + 1).toLong * s.length / g).toInt
          var e = 0.0; var hp = 0.0; var lp = 0.0; var zc = 0
          var i = from
          while (i < until) {
            e += s(i).toDouble * s(i)
            if (i > from) {
              val d = s(i).toDouble - s(i - 1); hp += d * d
              val m = (s(i).toDouble + s(i - 1)) * 0.5; lp += m * m
              if (s(i) * s(i - 1) < 0) zc += 1
            }
            i += 1
          }
          val n = math.max(1, until - from)
          feats(w * 4) = math.sqrt(e / n).toFloat
          feats(w * 4 + 1) = zc.toFloat / math.max(1, n - 1)
          feats(w * 4 + 2) = math.sqrt(hp / math.max(1, n - 1)).toFloat
          feats(w * 4 + 3) = math.sqrt(lp / math.max(1, n - 1)).toFloat
          w += 1
        }
        Some(Array.tabulate(dim)(i => feats(i % (g * 4))))
      }
    }

  /** REAL JPEG header parse: walk marker segments from SOI to the first
    * start-of-frame (SOF0/1/2/3/5..7/9..11/13..15) → (width, height). */
  private[multimodal] def probeJpegHeader(b: Array[Byte]): Option[(Int, Int)] = {
    def be16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      val marker = b(off + 1) & 0xff
      if (marker == 0xff) { off += 1 }                   // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) off += 2
      else {
        val len = be16(off + 2)
        if (len < 2 || off + 2 + len > b.length) return None
        // SOF markers carry precision(1) height(2) width(2); C4/C8/CC are
        // DHT/JPG/DAC, not frames
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (len < 7) return None
          val (h, w) = (be16(off + 5), be16(off + 7))
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        off += 2 + len
      }
    }
    None
  }

  /** REAL GIF header parse: GIF87a/89a signature + logical screen
    * descriptor → (width, height), little-endian 16-bit. */
  private[multimodal] def probeGifHeader(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** REAL MP4 (ISO-BMFF) header parse: top-level box walk to moov, then
    * mvhd (timescale/duration → ms) and trak/tkhd (16.16 fixed-point
    * width/height). Handles version 0 and 1 boxes and 64-bit largesize. */
  private[multimodal] def probeMp4Header(b: Array[Byte])
      : Option[(Long, Int, Int)] = {
    def be32(o: Int) = ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def be64(o: Int) = (be32(o) << 32) | be32(o + 4)
    def tag(o: Int) = new String(b, o + 4, 4, "US-ASCII")
    // walk children of [from, until); invoke f(type, payloadStart, payloadEnd)
    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit = {
      var off = from
      while (off + 8 <= until) {
        val sz0 = be32(off)
        val (sz, hdr) =
          if (sz0 == 1 && off + 16 <= until) (be64(off + 8), 16L) else (sz0, 8L)
        if (sz < hdr || off + sz > until) return
        f(tag(off), off + hdr.toInt, off + sz.toInt)
        off += sz.toInt
      }
    }
    var durMs = -1L; var w = 0; var h = 0
    walk(0, b.length) { (t, s, e) =>
      if (t == "moov") walk(s, e) { (t2, s2, e2) =>
        if (t2 == "mvhd" && e2 - s2 >= 24) {
          val v = b(s2) & 0xff
          val (ts, dur) = if (v == 1 && e2 - s2 >= 32)
            (be32(s2 + 20), be64(s2 + 24)) else (be32(s2 + 12), be32(s2 + 16))
          if (ts > 0) durMs = dur * 1000L / ts
        } else if (t2 == "trak") walk(s2, e2) { (t3, s3, e3) =>
          if (t3 == "tkhd") {
            val v = b(s3) & 0xff
            val base = if (v == 1) s3 + 36 + 52 else s3 + 24 + 52
            if (base + 8 <= e3) {
              val nw = (be32(base) >> 16).toInt   // 16.16 fixed point
              val nh = (be32(base + 4) >> 16).toInt
              // keep the FIRST trak with nonzero dimensions: audio traks
              // carry 0×0 and must not clobber a video trak parsed earlier
              if (nw > 0 && nh > 0 && (w == 0 || h == 0)) { w = nw; h = nh }
            }
          }
        }
      }
    }
    if (durMs >= 0) Some((durMs, w, h)) else None
  }

  /** REAL AVI (RIFF) header parse: walk to LIST hdrl → avih main header →
    * (durationMs from µs-per-frame × total frames, width, height). Same
    * overflow-hardened Long chunk walk as [[probeWavHeader]]. */
  private[multimodal] def probeAviHeader(b: Array[Byte])
      : Option[(Long, Int, Int)] = {
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val sz = le32(o + 4).toLong & 0xffffffffL
      if (tag(o) == "LIST" && o + 12 <= b.length && tag(o + 8) == "hdrl") {
        var io = o + 12L
        val end = math.min(o + 8 + sz, b.length.toLong)
        while (io + 8 <= end) {
          val i = io.toInt
          val isz = le32(i + 4).toLong & 0xffffffffL
          // avih: usPerFrame(0) maxBps(4) padding(8) flags(12)
          //       totalFrames(16) initial(20) streams(24) bufSize(28)
          //       width(32) height(36)
          if (tag(i) == "avih" && i + 8 + 40 <= b.length) {
            val usPerFrame = le32(i + 8).toLong & 0xffffffffL
            val totalFrames = le32(i + 8 + 16).toLong & 0xffffffffL
            val w = le32(i + 8 + 32)
            val h = le32(i + 8 + 36)
            return if (w > 0 && h > 0)
              Some((usPerFrame * totalFrames / 1000L, w, h))
            else None
          }
          io += 8L + isz + (isz & 1L)
        }
        return None // hdrl without avih is malformed
      }
      off += 8L + sz + (sz & 1L)
    }
    None
  }

  /** REAL MJPEG-in-AVI frame extraction (pure JDK — MJPEG is the one video
    * codec that needs none: every frame is an ordinary JPEG the JDK's
    * ImageIO already decodes): walk the RIFF tree to LIST movi, collect
    * `##dc`/`##db` stream chunks whose payload starts with the JPEG SOI
    * marker, descending into `rec ` sub-LISTs. Returns the raw per-frame
    * JPEG payloads (no re-encode — they ARE images). None when the
    * container isn't AVI or holds no JPEG frames (inter-frame codecs — the
    * remaining stub); at most `maxFrames` are extracted, bounding the
    * per-record memory like [[gifFrames]]. */
  private[multimodal] def aviMjpegFrames(b: Array[Byte], maxFrames: Int = 64)
      : Option[Seq[Array[Byte]]] = {
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isFrameChunk(t: String): Boolean =
      t.length == 4 && t(0).isDigit && t(1).isDigit &&
        (t.endsWith("dc") || t.endsWith("db"))
    // walk children of [from, until); collect movi frame chunks
    def walk(from: Long, until: Long, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= until && frames.size < maxFrames) {
        val o = off.toInt
        val sz = le32(o + 4).toLong & 0xffffffffL
        val end = math.min(o + 8 + sz, until)
        tag(o) match {
          case "LIST" if o + 12 <= until =>
            val lt = tag(o + 8)
            // descend into movi (and its rec  groupings); hdrl/odml skip
            if (lt == "movi" || (inMovi && lt == "rec "))
              walk(o + 12L, end, inMovi = true)
          case t if inMovi && isFrameChunk(t) && sz >= 2 =>
            val pl = b.slice(o + 8, end.toInt)
            // MJPEG gate: frame payload must be a JPEG (SOI marker)
            if (pl.length >= 2 && (pl(0) & 0xff) == 0xff &&
                (pl(1) & 0xff) == 0xd8)
              frames += pl
          case _ => ()
        }
        off += 8L + sz + (sz & 1L)
      }
    }
    walk(12L, b.length.toLong, inMovi = false)
    if (frames.nonEmpty) Some(frames.toSeq) else None
  }

  /** REAL MP3 header parse: skip an ID3v2 tag if present, find the first
    * MPEG audio frame sync, decode version/layer/bitrate/samplerate, and
    * estimate duration from the stream size at that constant bitrate (the
    * standard CBR estimate; VBR files need a Xing table — out of scope). */
  private[multimodal] def probeMp3Header(b: Array[Byte]): Option[Long] = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val tagSz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)            // syncsafe int
      off = 10 + tagSz
    }
    // bitrate (kbps) tables for Layer III; index 0/15 are free/bad
    val brV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val brV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) == 0xff && (b(off + 1) & 0xe0) == 0xe0) {
        val version = (b(off + 1) >> 3) & 3              // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layer = (b(off + 1) >> 1) & 3                // 1=Layer III
        val brIdx = (b(off + 2) >> 4) & 0xf
        if (version != 1 && layer == 1 && brIdx != 0 && brIdx != 15) {
          val kbps = if (version == 3) brV1(brIdx) else brV2(brIdx)
          val audioBytes = (b.length - off).toLong
          return Some(audioBytes * 8L / kbps)            // = bytes·8·1000 / (kbps·1000)
        }
        off += 1                                         // false sync; keep scanning
      } else off += 1
    }
    None
  }

  /** Header probe: REAL for PNG/JPEG/GIF/WAV/MP3/MP4 (pure-JDK byte parses
    * above); a deterministic STUB for other containers (mkv) and for
    * malformed headers, which keeps the dataflow total on arbitrary bytes.
    * Each real parse runs inside a catch-all: corrupt media are routine in
    * binaryFile corpora, and an out-of-bounds read on adversarial bytes must
    * degrade to the stub, never fail the executor task. */
  def probe(path: String, bytes: Array[Byte]): MediaFile = {
    def attempt[T](parse: => Option[T]): Option[T] =
      try parse catch { case scala.util.control.NonFatal(_) => None }
    val p = path.toLowerCase
    val kind = kindOf(path)
    val n = bytes.length.toLong
    val real: Option[MediaMeta] =
      if (p.endsWith(".png"))
        attempt(probePngHeader(bytes)).map { case (w, h) => MediaMeta("image/png", n, w, h, 0L) }
      else if (p.endsWith(".jpg") || p.endsWith(".jpeg"))
        attempt(probeJpegHeader(bytes)).map { case (w, h) => MediaMeta("image/jpeg", n, w, h, 0L) }
      else if (p.endsWith(".gif"))
        attempt(probeGifHeader(bytes)).map { case (w, h) => MediaMeta("image/gif", n, w, h, 0L) }
      else if (p.endsWith(".wav"))
        attempt(probeWavHeader(bytes)).map(d => MediaMeta("audio/wav", n, 0, 0, d))
      else if (p.endsWith(".mp3"))
        attempt(probeMp3Header(bytes)).map(d => MediaMeta("audio/mpeg", n, 0, 0, d))
      else if (p.endsWith(".mp4"))
        attempt(probeMp4Header(bytes)).map { case (d, w, h) => MediaMeta("video/mp4", n, w, h, d) }
      else if (p.endsWith(".avi"))
        attempt(probeAviHeader(bytes)).map { case (d, w, h) => MediaMeta("video/x-msvideo", n, w, h, d) }
      else None
    real match {
      case Some(meta) => MediaFile(path, kind, bytes, meta)
      case None => stubProbe(path, kind, bytes)
    }
  }

  /** STUB probe — deterministic fake header parse for containers with no
    * pure-JDK parse here (mkv) and for malformed inputs. */
  private def stubProbe(path: String, kind: String, bytes: Array[Byte]): MediaFile = {
    val h = bytes.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    val meta = MediaMeta(
      mime = kind match {
        case "image" => "image/png"; case "audio" => "audio/wav"
        case "video" => "video/mp4"; case _ => "application/octet-stream"
      },
      sizeBytes = bytes.length,
      width = if (kind == "image" || kind == "video") (math.abs(h) % 1920).toInt + 1 else 0,
      height = if (kind == "image" || kind == "video") (math.abs(h / 7) % 1080).toInt + 1 else 0,
      durationMs = if (kind == "audio" || kind == "video") bytes.length * 10L else 0L)
    MediaFile(path, kind, bytes, meta)
  }

  /** GIF87a/GIF89a magic — the only container [[gifFrames]] can hold
    * multiple frames for, checked BEFORE paying an ImageIO decode. */
  private[multimodal] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a'

  /** Cheap animated-GIF probe: counts frames via the reader's directory
    * scan (`getNumImages`) WITHOUT decoding or re-encoding any raster —
    * the multi-frame guard in [[reencodeScaled]] only needs the count,
    * so a many-frame animation costs a header walk, not frames×(decode +
    * PNG encode) of heap. 0 for non-GIF / undecodable inputs. */
  private[multimodal] def gifFrameCount(bytes: Array[Byte]): Int = {
    if (!isGif(bytes)) return 0
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return 0
      reader = readers.next()
      reader.setInput(iis)
      reader.getNumImages(true)
    } catch { case scala.util.control.NonFatal(_) => 0 }
    finally {
      if (reader != null) reader.dispose()
      if (iis != null) iis.close()
    }
  }

  /** REAL multi-frame decode for animated GIFs: ImageIO reads frame
    * rasters and re-encodes each as PNG. None for non-GIF (magic-gated —
    * no decode attempted), static, or undecodable inputs (callers fall
    * back to the single-frame / stub path). At most `maxFrames` frames are
    * decoded — the cap bounds the per-record memory a pathological
    * many-frame animation can pin inside one flatMap record. Frames are
    * the raw per-frame rasters — GIF disposal-method composition is NOT
    * applied (each row is what the container stores at that index). */
  private[multimodal] def gifFrames(bytes: Array[Byte],
                                    maxFrames: Int = 64): Option[Seq[Array[Byte]]] = {
    if (!isGif(bytes)) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 1) None
      else Some((0 until math.min(n, maxFrames)).map { i =>
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(reader.read(i), "png", out)
        out.toByteArray
      })
    } catch { case scala.util.control.NonFatal(_) => None }
    finally {
      if (reader != null) reader.dispose()
      if (iis != null) iis.close()
    }
  }

  /** Frame sampling: one row per sampled frame every `everyMs` (videos);
    * audio yields one frame per window. Animated GIFs decode to their REAL
    * frames (PNG-encoded rasters, pure-JDK path, magic-gated so non-GIF
    * images never pay a decode, frame count capped); MJPEG-in-AVI videos
    * demux to their REAL per-frame JPEG payloads ([[aviMjpegFrames]] —
    * MJPEG needs no codec); PCM WAV audio windows into REAL self-contained
    * WAV frames ([[wavWindows]] — fmt chunk + window data behind a fresh
    * RIFF header, so every frame decodes downstream); other images yield
    * frame 0 with the whole payload (which IS the frame). Inter-frame
    * video codecs (H.264/VP9 in MP4/MKV) and compressed-audio payload
    * slices remain a STUB (real: demux+decode the GOP at that timestamp —
    * no codec libs in this container). */
  def sampleFrames(media: Dataset[MediaFile], everyMs: Long = 1000L)
      : Dataset[(String, String, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val real: Option[Seq[Array[Byte]]] =
        if (m.kind == "image") gifFrames(m.content)
        else if (m.kind == "video") aviMjpegFrames(m.content)
        else if (m.kind == "audio") wavWindows(m.content, everyMs)
        else None
      real match {
        case Some(frames) =>
          frames.iterator.zipWithIndex.map { case (f, i) => (m.path, m.kind, i, f) }
        case None =>
          val n = m.kind match {
            case "video" | "audio" => math.max(1, (m.meta.durationMs / everyMs).toInt)
            case _ => 1
          }
          val chunk = math.max(1, m.content.length / n)
          (0 until n).iterator.map { i =>
            val from = math.min(i * chunk, m.content.length)
            val until = math.min(from + chunk, m.content.length)
            (m.path, m.kind, i, m.content.slice(from, until)) // STUB frame bytes
          }
      }
    }
  }

  /** Resize into a bounding box preserving aspect ratio. For image payloads
    * ImageIO can decode (PNG/JPEG/GIF — REAL pure-JDK path) the payload is
    * decoded, bilinearly scaled, and re-encoded in its original format, and
    * the metadata reflects the actual output raster. Payloads ImageIO cannot
    * decode (stub fixtures, video containers) keep their bytes and get the
    * metadata-only adjustment — the dataflow stays total on arbitrary bytes. */
  def resize(media: Dataset[MediaFile], maxW: Int, maxH: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.meta.width <= 0 || m.meta.height <= 0) m
      else {
        val scale = math.min(1.0,
          math.min(maxW.toDouble / m.meta.width, maxH.toDouble / m.meta.height))
        val (tw, th) = (math.max(1, (m.meta.width * scale).toInt),
                        math.max(1, (m.meta.height * scale).toInt))
        val rescaled: Option[MediaFile] =
          if (m.kind != "image" || scale >= 1.0) None
          else reencodeScaled(m, tw, th)
        rescaled.getOrElse(
          m.copy(meta = m.meta.copy(width = tw, height = th)))
      }
    }
  }

  /** REAL image payload rescale: ImageIO decode → bilinear Graphics2D scale
    * → re-encode in the original format. None when the payload isn't
    * decodable or the format has no JDK writer. */
  private def reencodeScaled(m: MediaFile, tw: Int, th: Int): Option[MediaFile] = {
    val fmt = m.meta.mime match {
      case "image/png" => "png"; case "image/jpeg" => "jpg"
      case "image/gif" => "gif"; case _ => return None
    }
    // animated GIFs: ImageIO.read decodes frame 0 only — re-encoding
    // would silently drop the rest, so the payload passes through with
    // the metadata-only adjustment (downstream frame sampling keeps
    // every frame of the original). gifFrameCount probes the frame
    // directory only — no raster decode, so adversarial many-frame
    // animations can't pin frames×raster heap in this guard.
    if (fmt == "gif" && gifFrameCount(m.content) > 1)
      return None
    // corrupt-but-recognized payloads (valid header, truncated data) must
    // degrade to the metadata-only path, never fail the executor task —
    // the same totality contract as probe/imageRasterFeature
    val src =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (src == null) return None
    val imgType = if (fmt == "jpg") java.awt.image.BufferedImage.TYPE_INT_RGB
                  else java.awt.image.BufferedImage.TYPE_INT_ARGB
    val dst = new java.awt.image.BufferedImage(tw, th, imgType)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, tw, th, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(dst, fmt, out)) return None
    val bytes = out.toByteArray
    Some(m.copy(content = bytes,
      meta = m.meta.copy(sizeBytes = bytes.length, width = tw, height = th)))
  }

  /** REAL image feature: decode via ImageIO and average-pool the raster
    * over a g×g grid (g = ⌈√(dim/3)⌉, so 3g² ≥ dim), emitting per-cell
    * R,G,B means in [0,1], row-major, truncated to `dim`. Exact block
    * pooling (not an interpolated rescale) makes the feature deterministic
    * and stable under resizing: a bilinearly downscaled copy of the same
    * image pools to near-identical cell means. None when the payload isn't
    * a decodable image — callers fall back to the stub. */
  private[multimodal] def imageRasterFeature(bytes: Array[Byte],
                                             dim: Int): Option[Array[Float]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val g = math.max(1, math.ceil(math.sqrt(dim / 3.0)).toInt)
      val sums = new Array[Double](g * g * 3)
      val cnts = new Array[Long](g * g)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        val cy = y * g / h
        var x = 0
        while (x < w) {
          val c = cy * g + x * g / w
          val rgb = img.getRGB(x, y)
          sums(c * 3) += (rgb >> 16) & 0xff
          sums(c * 3 + 1) += (rgb >> 8) & 0xff
          sums(c * 3 + 2) += rgb & 0xff
          cnts(c) += 1
          x += 1
        }
        y += 1
      }
      Some(Array.tabulate(dim) { i =>
        val c = i / 3
        if (cnts(c) == 0) 0f else (sums(i) / cnts(c) / 255.0).toFloat
      })
    }
  }

  /** Feature extraction over frames, batched per partition (the real-world
    * shape: load a model once per partition, run batched inference).
    * Image frames ImageIO can decode get the REAL pooled-raster feature
    * ([[imageRasterFeature]]); WAV PCM audio gets the REAL waveform
    * feature ([[audioWaveformFeature]] — PCM needs no codec); video frames
    * whose payload is a decodable image (the MJPEG demux path emits plain
    * JPEGs) get the SAME real raster feature. Inter-frame video and
    * compressed-audio frames keep the documented STUB (splitmix-style hash
    * of the bytes → deterministic floats in [-1, 1)) — their codecs have
    * no pure-JDK decoder in this container. */
  def extractFeatures(frames: Dataset[(String, String, Int, Array[Byte])],
                      dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeature] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      // per-partition init happens HERE once (model load in a real impl)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (path, kind, frameNo, bytes) =>
          val real =
            if (kind == "image" || kind == "video")
              imageRasterFeature(bytes, dim)
            else if (kind == "audio") audioWaveformFeature(bytes, dim)
            else None
          val emb = real.getOrElse {
            val seed = bytes.foldLeft(frameNo.toLong)((a, b) => a * 31 + (b & 0xff))
            Array.tabulate(dim) { j =>
              (graft.functions.Sketches.mix64(seed + j).toDouble / Long.MaxValue).toFloat
            }
          }
          MediaFeature(path, kind, frameNo, emb)
        }
      }
    }
  }

  /** 64-bit perceptual average-hash (aHash) of an image payload: decode
    * (pure JDK), area-average to an 8×8 grayscale grid, bit (y·8+x) set
    * iff the cell is brighter than the grid mean. Robust to resize /
    * re-encode / small edits (hamming distance tracks perceptual
    * distance), which cryptographic digests are deliberately NOT — the
    * image twin of the text SimHash. None for undecodable payloads. */
  private[multimodal] def averageHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val sums = new Array[Double](64)
      val cnts = new Array[Long](64)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val c = cy * 8 + x * 8 / w
          val rgb = img.getRGB(x, y)
          sums(c) += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          cnts(c) += 1
          x += 1
        }
        y += 1
      }
      val cell = Array.tabulate(64)(i =>
        if (cnts(i) == 0) 0.0 else sums(i) / cnts(i))
      val mean = cell.sum / 64.0
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (cell(i) > mean) hash |= (1L << i)
        i += 1
      }
      Some(hash)
    }
  }

  /** (path, simhash) for every decodable image — the frame
    * [[graft.operators.Dedup.hammingPairs]] blocks on. A map over the
    * media scan; undecodable payloads drop out (they have exact-digest
    * dedup, not perceptual). */
  def imageHashes(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image")
      .flatMap(m => averageHash(m.content).map(h => (m.path, h)))
      .toDF("doc_id", "simhash")
  }

  /** 64-bit perceptual audio hash over the REAL WAV waveform feature:
    * 16 time windows × 4 band features (rms, zcr, hp-rms, lp-rms), bit
    * (type·16 + window) set iff that window exceeds the mean of ITS OWN
    * feature type — per-type thresholds make the hash invariant to
    * uniform gain (every energy feature scales together; zcr doesn't
    * move at all). Robust to re-encode/gain; NOT meaningful for signals
    * with no envelope variation (a perfectly steady tone thresholds
    * noise — the constant-signal degenerate case, same class as ranking
    * a constant quality column). None for non-PCM payloads. */
  private[multimodal] def audioHash(bytes: Array[Byte]): Option[Long] =
    audioWaveformFeature(bytes, 64).map { f =>
      var hash = 0L
      var t = 0
      while (t < 4) {
        var mean = 0.0
        var w = 0
        while (w < 16) { mean += f(w * 4 + t); w += 1 }
        mean /= 16
        w = 0
        while (w < 16) {
          if (f(w * 4 + t) > mean) hash |= 1L << (t * 16 + w)
          w += 1
        }
        t += 1
      }
      hash
    }

  /** (path, simhash) for every decodable-PCM audio payload — the audio
    * twin of [[imageHashes]]. */
  def audioHashes(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio")
      .flatMap(m => audioHash(m.content).map(h => (m.path, h)))
      .toDF("doc_id", "simhash")
  }

  /** Perceptual audio near-dup pairs at hamming ≤ `maxDist` — same
    * chunk-blocked pairing as [[imageNearDup]]. */
  def audioNearDup(media: Dataset[MediaFile], maxDist: Int = 5): DataFrame =
    graft.operators.Dedup.hammingPairs(audioHashes(media), maxDist)

  /** Perceptual image near-dup pairs at hamming ≤ `maxDist`: aHash map +
    * the SAME pigeonhole chunk-blocked pairing the text SimHash path
    * uses ([[graft.operators.Dedup.hammingPairs]]) — one hash pass over
    * the media, candidate volume bounded by the 16-bit chunk buckets,
    * never an all-pairs image comparison. */
  def imageNearDup(media: Dataset[MediaFile], maxDist: Int = 5): DataFrame =
    graft.operators.Dedup.hammingPairs(imageHashes(media), maxDist)

  /** Metadata-only projection (no payload deserialization): proves the
    * binary column stays opaque — Catalyst prunes `content` from the scan. */
  def metaTable(media: Dataset[MediaFile]): DataFrame =
    media.select(col("path"), col("kind"), col("meta.mime"),
      col("meta.sizeBytes"), col("meta.width"), col("meta.height"),
      col("meta.durationMs"))
}
