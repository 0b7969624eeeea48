package graft.multimodal

/** Deterministic synthetic media generators for the multimodal catalog
  * queries (`q_mm_imgdup`, `q_mm_audiodup`, `q_mm_avi`) and their specs.
  *
  * Every generator is a pure function of its seed — content is identical
  * across invocations, partitions, and JVMs of the same platform — so the
  * catalog entries these feed are deterministic end-to-end and the specs
  * can pin exact pair sets and digests. Pure JDK (ImageIO for PNG/JPEG
  * encode; byte-level RIFF/WAV assembly), mirroring the fixture style of
  * MultimodalSpec but shared in MAIN source so the driver-run catalog can
  * exercise the image/audio/video paths each round (reference analogue:
  * the synthetic BCL run in genomics/SyntheticRun.scala — deterministic
  * inputs standing in for media the sandbox cannot ship).
  */
object SyntheticMedia {

  /** Smooth RGB field in normalized coordinates: bilinear interpolation
    * of a seed-hashed 8×8 value grid per channel. Continuous in (u, v),
    * so rasters of the SAME seed at different resolutions pool to
    * near-identical 8×8 block means (the aHash resize-invariance the
    * imgdup entry banks on), while different seeds draw INDEPENDENT
    * grids — aHash bits are effectively random per seed (expected
    * hamming ≈ 32), so no seed pair can drift under the pairing cut the
    * way a small sinusoid family can. */
  private def cellVal(seed: Int, ch: Int, i: Int, j: Int): Double = {
    val h = graft.functions.Sketches.mix64(
      seed.toLong * 1000003L + ch.toLong * 7919L + i.toLong * 131L + j.toLong)
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  private def rgbAt(seed: Int, u: Double, v: Double): Int = {
    def chan(ch: Int): Int = {
      val x = math.min(7.0, math.max(0.0, u * 8 - 0.5))
      val y = math.min(7.0, math.max(0.0, v * 8 - 0.5))
      val i0 = math.min(6, x.toInt); val j0 = math.min(6, y.toInt)
      val fx = x - i0; val fy = y - j0
      val top = cellVal(seed, ch, i0, j0) * (1 - fx) + cellVal(seed, ch, i0 + 1, j0) * fx
      val bot = cellVal(seed, ch, i0, j0 + 1) * (1 - fx) + cellVal(seed, ch, i0 + 1, j0 + 1) * fx
      ((top * (1 - fy) + bot * fy) * 255.0).toInt
    }
    (chan(0) << 16) | (chan(1) << 8) | chan(2)
  }

  /** PNG-encoded raster of [[rgbAt]] sampled at w×h. */
  def png(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, rgbAt(seed, (x + 0.5) / w, (y + 0.5) / h))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** JPEG-encoded frame for the MJPEG AVI: the seed's field shifted by
    * frame number, so every frame of every video is distinct. */
  def jpegFrame(seed: Int, frameNo: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          rgbAt(seed * 16 + frameNo, (x + 0.5) / w, (y + 0.5) / h))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** 16-bit mono PCM WAV: an amplitude-modulated sine whose carrier
    * frequency and envelope shape derive from the seed. The envelope
    * varies across the audioHash's 16 analysis windows (a steady tone
    * would threshold noise — the documented degenerate case), and a pure
    * gain change scales every energy feature together, so gain copies
    * hash within a few bits of the original while distinct seeds land
    * far apart. */
  def wav(seed: Int, gain: Double, ms: Int = 1000, sr: Int = 8000): Array[Byte] = {
    val n = sr * ms / 1000
    val freq = 350.0 + 140.0 * seed
    val envF = 1.5 + (seed % 5) * 0.8
    val data = new java.io.ByteArrayOutputStream(n * 2)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sr
      val env = 0.25 + 0.75 * math.abs(math.sin(math.Pi * envF * t + seed * 0.41))
      val s = gain * env * math.sin(2 * math.Pi * freq * t)
      val v = math.max(-32768, math.min(32767, (s * 30000).toInt))
      data.write(v & 0xff); data.write((v >> 8) & 0xff)
      i += 1
    }
    val pcm = data.toByteArray
    val out = new java.io.ByteArrayOutputStream(44 + pcm.length)
    def w32(v: Int): Unit = (0 until 4).foreach(k => out.write((v >> (8 * k)) & 0xff))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + pcm.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(sr); w32(sr * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(pcm.length)
    out.write(pcm)
    out.toByteArray
  }

  /** MJPEG-in-AVI container with `nFrames` [[jpegFrame]] payloads: RIFF
    * `AVI ` → LIST hdrl (avih main header: 25 fps, frame count, 32×24)
    * → LIST movi of `00dc` chunks. Parses through both
    * [[Multimodal.probeAviHeader]] and [[Multimodal.aviMjpegFrames]]. */
  def avi(seed: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map(jpegFrame(seed, _))
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      tag.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
    }
    def list(kind: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ payload)
    // avih: usPerFrame maxBps padding flags totalFrames initial streams
    //       bufSize width height + 4 reserved dwords = 56 bytes
    val avih = chunk("avih",
      le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(nFrames) ++
        le32(0) ++ le32(1) ++ le32(0) ++ le32(32) ++ le32(24) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih)
    val movi = list("movi", frames.flatMap(chunk("00dc", _)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }
}
