package graft.multimodal

import java.nio.file.Files

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_media")
    Files.write(d.resolve("a.png"), Array.tabulate(100)(_.toByte))
    Files.write(d.resolve("b.wav"), Array.tabulate(300)(i => (i * 3).toByte))
    Files.write(d.resolve("c.mp4"), Array.tabulate(500)(i => (i * 7).toByte))
    d.toString
  }

  test("binary scan yields typed metadata and opaque payloads") {
    val media = Multimodal.scan(spark, dir).collect().sortBy(_.path)
    assert(media.map(_.kind).toSeq == Seq("image", "audio", "video"))
    val img = media(0)
    assert(img.meta.mime == "image/png" && img.meta.sizeBytes == 100)
    assert(img.meta.width > 0 && img.meta.height > 0)
    assert(media(2).meta.durationMs == 5000)
    assert(img.content.length == 100)
  }

  test("frame sampling explodes videos into per-frame rows") {
    val frames = Multimodal.sampleFrames(Multimodal.scan(spark, dir), 1000L)
      .collect()
    val byKind = frames.groupBy(_._2)
    assert(byKind("image").length == 1)
    assert(byKind("video").length == 5)   // 5000 ms / 1000 ms
    assert(byKind("audio").length == 3)   // 3000 ms / 1000 ms
    assert(frames.forall(_._4.nonEmpty))
  }

  test("feature extraction is deterministic with fixed schema") {
    val f1 = Multimodal.extractFeatures(
      Multimodal.sampleFrames(Multimodal.scan(spark, dir))).collect()
    val f2 = Multimodal.extractFeatures(
      Multimodal.sampleFrames(Multimodal.scan(spark, dir))).collect()
    assert(f1.length == 9)
    assert(f1.forall(_.embedding.length == 16))
    assert(f1.forall(_.embedding.forall(v => v >= -1f && v <= 1f)))
    val m1 = f1.map(f => (f.path, f.frameNo) -> f.embedding.toSeq).toMap
    val m2 = f2.map(f => (f.path, f.frameNo) -> f.embedding.toSeq).toMap
    assert(m1 == m2, "stub decode must be deterministic")
  }

  test("decodable images embed via the real pooled raster; a/v keep the stub") {
    val s = spark
    import s.implicits._
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val imgA = png(64, 48)((x, _) => (x * 255 / 63) << 16) // horizontal red ramp
    val imgB = png(64, 48)((_, y) => y * 255 / 47)         // vertical blue ramp
    val fa = Multimodal.imageRasterFeature(imgA, 48).get
    val fb = Multimodal.imageRasterFeature(imgB, 48).get
    assert(fa.zip(fb).map { case (a, b) => math.abs(a - b) }.max > 0.2,
      "distinct images must embed differently")
    // a bilinearly resized copy of the same image pools to near-identical
    // cell means — the property that makes the feature usable for dedup
    val one = Seq(Multimodal.probe("a.png", imgA)).toDS()
    val halfBytes = Multimodal.resize(one, 32, 32).collect().head.content
    val fr = Multimodal.imageRasterFeature(halfBytes, 48).get
    val drift = fa.zip(fr).map { case (a, b) => math.abs(a - b) }.max
    assert(drift < 0.06, s"resized-copy embedding drift $drift")
    // end-to-end: extractFeatures routes decodable image frames to the
    // raster path, while a/v frames keep the documented hash stub (raster
    // values live in [0,1]; the stub spans [-1,1))
    val frames = Seq(("a.png", "image", 0, imgA), ("b.wav", "audio", 0, imgA))
      .toDS()
    val feats = Multimodal.extractFeatures(frames, dim = 48).collect()
      .map(f => f.kind -> f.embedding).toMap
    assert(feats("image").sameElements(fa))
    assert(!feats("audio").sameElements(fa) && feats("audio").exists(_ < 0f))
  }

  /** Build an animated GIF (one solid-color 16×16 frame per rgb) with the
    * pure-JDK writer sequence API. */
  private def animatedGif(rgbs: Int*): Array[Byte] = {
    def frame(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (img <- rgbs.map(frame)) {
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence(); ios.close()
    out.toByteArray
  }

  test("animated GIF samples its real frames as decodable PNG payloads") {
    val s = spark
    import s.implicits._
    val gif = animatedGif(0xff0000, 0x00ff00, 0x0000ff)
    // real frame explode: 3 rows, each a decodable PNG of the frame raster
    val media = Seq(Multimodal.probe("anim.gif", gif)).toDS()
    val frames = Multimodal.sampleFrames(media).collect().sortBy(_._3)
    assert(frames.length == 3, s"expected 3 real frames, got ${frames.length}")
    val colors = frames.map { case (_, _, _, png) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 16 && img.getHeight == 16)
      img.getRGB(8, 8) & 0xffffff
    }
    assert(colors.toSeq == Seq(0xff0000, 0x00ff00, 0x0000ff),
      s"frame colors ${colors.toSeq.map(_.toHexString)}")
    // and the raster feature path sees three DIFFERENT frame embeddings
    val feats = Multimodal.extractFeatures(
      Multimodal.sampleFrames(media), dim = 12).collect()
      .sortBy(_.frameNo).map(_.embedding.toSeq)
    assert(feats.distinct.length == 3, "frame embeddings must differ")
  }

  test("gifFrames is magic-gated and caps decoded frames") {
    // non-GIF image bytes: the magic gate answers None with no decode
    val png = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    assert(!Multimodal.isGif(png))
    assert(Multimodal.gifFrames(png).isEmpty)
    assert(!Multimodal.isGif(Array[Byte](1, 2, 3)))
    val gif = animatedGif(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff)
    assert(Multimodal.isGif(gif))
    // the cap bounds how many frames one record can materialize
    assert(Multimodal.gifFrames(gif, maxFrames = 3).get.length == 3)
    assert(Multimodal.gifFrames(gif).get.length == 5)
  }

  test("two different animations yield different per-frame embeddings") {
    val s = spark
    import s.implicits._
    // end-to-end real path: GIF container → real frame rasters → pooled-
    // raster embedding per frame; two animations with disjoint frame colors
    // must land in different embedding points frame-by-frame
    val media = Seq(
      Multimodal.probe("warm.gif", animatedGif(0xff0000, 0xdd8800, 0xbb4400)),
      Multimodal.probe("cool.gif", animatedGif(0x0000ff, 0x0088dd, 0x00bbaa))
    ).toDS()
    val feats = Multimodal.extractFeatures(
      Multimodal.sampleFrames(media), dim = 12).collect()
    assert(feats.length == 6, s"expected 2×3 frame embeddings, got ${feats.length}")
    val byDoc = feats.groupBy(_.path).view
      .mapValues(_.sortBy(_.frameNo).map(_.embedding.toSeq)).toMap
    // frames differ within each animation…
    assert(byDoc("warm.gif").distinct.length == 3)
    assert(byDoc("cool.gif").distinct.length == 3)
    // …and across animations at every frame index
    (0 until 3).foreach { i =>
      assert(byDoc("warm.gif")(i) != byDoc("cool.gif")(i),
        s"frame $i embeddings must differ across animations")
    }
  }

  test("resize bounds dimensions preserving aspect ratio") {
    val resized = Multimodal.resize(Multimodal.scan(spark, dir), 100, 100)
      .collect()
    for (m <- resized if m.kind == "image" || m.kind == "video") {
      assert(m.meta.width <= 100 && m.meta.height <= 100)
      val orig = Multimodal.probe(m.path,
        m.content) // stub probe is deterministic on bytes
      val r1 = m.meta.width.toDouble / orig.meta.width
      val r2 = m.meta.height.toDouble / orig.meta.height
      assert(math.abs(r1 - r2) < 0.05, s"aspect drift: $r1 vs $r2")
    }
    assert(resized.find(_.kind == "audio").get.meta.width == 0)
  }

  test("WAV PCM decode powers a real, frequency-discriminative audio feature") {
    def sineWav(freq: Double, sr: Int = 8000, ms: Int = 500): Array[Byte] = {
      val n = sr * ms / 1000
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (math.sin(2 * math.Pi * freq * i / sr) * 12000).toInt
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val low = sineWav(440); val high = sineWav(1760)
    val (sr, samples) = Multimodal.decodeWavPcm(low).get
    assert(sr == 8000 && samples.length == 4000, s"$sr Hz, ${samples.length} samples")
    // a 12000/32768-amplitude sine has rms = a/sqrt(2)
    val rms = math.sqrt(samples.map(x => x.toDouble * x).sum / samples.length)
    assert(math.abs(rms - 12000.0 / 32768 / math.sqrt(2)) < 0.005, s"rms $rms")
    val fLow = Multimodal.audioWaveformFeature(low, 16).get
    val fHigh = Multimodal.audioWaveformFeature(high, 16).get
    assert(fLow.length == 16 && fHigh.length == 16)
    // two different synthetic WAVs → different embeddings (the golden gate)
    assert(!fLow.sameElements(fHigh))
    // the band features are physical, not hash noise: zcr = 2f/sr and the
    // first-difference hp-rms grows with frequency (2·sin(pi·f/sr)·rms)
    // tolerance 0.05: a tone whose period divides the sample rate lands
    // exact zero samples, and the strict sign-product test skips those
    assert(math.abs(fLow(1) - 2.0 * 440 / 8000) < 0.05, s"zcr ${fLow(1)}")
    assert(math.abs(fHigh(1) - 2.0 * 1760 / 8000) < 0.05, s"zcr ${fHigh(1)}")
    assert(fHigh(2) > fLow(2) * 2, s"hp ${fHigh(2)} vs ${fLow(2)}")
    // junk bytes: no decode, no exception
    assert(Multimodal.decodeWavPcm(Array.tabulate(64)(_.toByte)).isEmpty)
    // end-to-end scan → sampleFrames → extractFeatures takes the REAL path
    // and reproduces the direct decode exactly
    val d = Files.createTempDirectory("graft_audio_real")
    Files.write(d.resolve("low.wav"), low)
    Files.write(d.resolve("high.wav"), high)
    val feats = Multimodal.extractFeatures(
        Multimodal.sampleFrames(Multimodal.scan(spark, d.toString), everyMs = 1000),
        dim = 16)
      .collect().map(f => f.path.split('/').last -> f.embedding).toMap
    assert(!feats("low.wav").sameElements(feats("high.wav")))
    assert(feats("low.wav").sameElements(fLow),
      "pipeline feature must equal the direct decode")
  }

  test("WAV windows: every sampled audio frame is a self-contained decodable WAV") {
    def sineWav(freq: Double, sr: Int = 8000, ms: Int = 3000): Array[Byte] = {
      val n = sr * ms / 1000
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (math.sin(2 * math.Pi * freq * i / sr) * 12000).toInt
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val wav = sineWav(440)
    val wins = Multimodal.wavWindows(wav, 1000L).get
    assert(wins.length === 3, s"${wins.length} windows")
    // EVERY window (not just the one that inherited the original header)
    // decodes as PCM — 1 s of samples each
    wins.foreach { w =>
      val (sr, samples) = Multimodal.decodeWavPcm(w).get
      assert(sr === 8000 && samples.length === 8000, s"${samples.length}")
    }
    // through the pipeline: 3 frames, each with the REAL waveform feature
    val d = Files.createTempDirectory("graft_audio_win")
    Files.write(d.resolve("tone.wav"), wav)
    val frames = Multimodal.sampleFrames(
      Multimodal.scan(spark, d.toString), everyMs = 1000L).collect()
    assert(frames.length === 3)
    val feats = Multimodal.extractFeatures(
        Multimodal.sampleFrames(Multimodal.scan(spark, d.toString), 1000L),
        dim = 16).collect()
    assert(feats.length === 3)
    val direct = Multimodal.audioWaveformFeature(wins.head, 16).get
    assert(feats.minBy(_.frameNo).embedding.sameElements(direct),
      "frame 0 feature must equal the direct window decode")
    // same-tone windows carry near-identical physical band features
    val zcrs = feats.map(_.embedding(1))
    assert(zcrs.max - zcrs.min < 0.02, zcrs.mkString(","))
    // non-WAV bytes: no windows, stub fallback intact
    assert(Multimodal.wavWindows(Array.tabulate(64)(_.toByte), 1000L).isEmpty)
  }

  test("resize degrades gracefully on corrupt images and keeps animated GIFs whole") {
    val s = spark
    import s.implicits._
    // valid PNG header (probe reads real dims) but garbage IDAT: resize
    // must fall to the metadata-only path, never fail the task
    val good = {
      val img = new java.awt.image.BufferedImage(40, 20,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out); out.toByteArray
    }
    val corrupt = good.take(33) ++ Array.fill[Byte](40)(0x7f)
    val mediaC = Seq(MediaFile("c.png", "image", corrupt,
      MediaMeta("image/png", corrupt.length.toLong, 40, 20, 0L))).toDS()
    val outC = Multimodal.resize(mediaC, 10, 10).collect().head
    assert(outC.meta.width === 10 && outC.meta.height === 5)
    assert(outC.content.sameElements(corrupt), "payload must pass through")
    // animated GIF larger than the box: payload passes through whole (a
    // re-encode would silently keep only frame 0); metadata still adjusts
    val gif = {
      // build a 2-frame GIF via ImageIO sequence writer
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      for (shade <- Seq(0, 255)) {
        val img = new java.awt.image.BufferedImage(64, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(shade, shade, shade))
        g.fillRect(0, 0, 64, 32); g.dispose()
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      w.endWriteSequence(); ios.close(); w.dispose()
      out.toByteArray
    }
    val mediaG = Seq(MediaFile("a.gif", "image", gif,
      MediaMeta("image/gif", gif.length.toLong, 64, 32, 0L))).toDS()
    val outG = Multimodal.resize(mediaG, 16, 16).collect().head
    assert(outG.meta.width === 16 && outG.meta.height === 8)
    assert(outG.content.sameElements(gif), "animated payload must pass through")
    assert(Multimodal.sampleFrames(mediaG).count() === 2,
      "both frames must survive")
  }

  test("tar shards parse into entries and group into WebDataset samples") {
    def tarOf(entries: Seq[(String, Array[Byte])]): Array[Byte] =
      TarShards.build(entries)
    val s1 = Seq(
      "00001.txt" -> "a caption".getBytes("UTF-8"),
      "00001.jpg" -> Array.tabulate(700)(_.toByte),
      "00002.txt" -> "second".getBytes("UTF-8"))
    val s2 = Seq("00003.json" -> """{"k":1}""".getBytes("UTF-8"))
    // direct parse: order, names, exact payloads
    val parsed = TarShards.parseTar(tarOf(s1))
    assert(parsed.map(_._1) == s1.map(_._1))
    parsed.zip(s1).foreach { case ((_, got), (_, want)) =>
      assert(got.sameElements(want))
    }
    // truncated shard: keeps complete leading entries, never throws
    val whole = tarOf(s1)
    val cut = TarShards.parseTar(java.util.Arrays.copyOf(whole, 512 + 16))
    assert(cut.map(_._1) == Seq("00001.txt"))
    // end-to-end: scan a dir of shards (non-tar files ignored by the glob)
    val d = Files.createTempDirectory("graft_tar")
    Files.write(d.resolve("shard-000.tar"), whole)
    Files.write(d.resolve("shard-001.tar"), tarOf(s2))
    Files.write(d.resolve("readme.md"), "not a shard".getBytes)
    val es = TarShards.entries(spark, d.toString)
    val names = es.collect().map(e => e.name).sorted.toSeq
    assert(names == Seq("00001.jpg", "00001.txt", "00002.txt", "00003.json"))
    // sample grouping: basename keys, extension map
    val samp = TarShards.samples(es).collect()
      .map(r => r.getString(1) -> r.getMap[String, Array[Byte]](2)).toMap
    assert(samp.keySet == Set("00001", "00002", "00003"))
    assert(samp("00001").keySet == Set("txt", "jpg"))
    assert(new String(samp("00001")("txt"), "UTF-8") == "a caption")
  }

  test("WebDataset ingest end-to-end: tar samples feed the real image path") {
    val s = spark
    import s.implicits._
    // the composed multimodal ingest: shard → samples → probe/feature —
    // a 31x17 PNG rides next to its caption, and the REAL header parse
    // and pooled-raster feature run on the payload extracted from the tar
    val img = new java.awt.image.BufferedImage(31, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.getGraphics.fillRect(0, 0, 31, 17)
    val pngOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pngOut))
    val shard = TarShards.build(Seq(
      "s1.png" -> pngOut.toByteArray,
      "s1.txt" -> "a white rectangle".getBytes("UTF-8")))
    val d = Files.createTempDirectory("graft_wds")
    Files.write(d.resolve("shard.tar"), shard)
    val samp = TarShards.samples(TarShards.entries(spark, d.toString))
      .collect()
    assert(samp.length == 1)
    val parts = samp(0).getMap[String, Array[Byte]](2)
    val meta = Multimodal.probe("s1.png", parts("png")).meta
    assert(meta.width == 31 && meta.height == 17, s"real probe through tar: $meta")
    // the decoded caption and a real feature from the tar-extracted bytes
    assert(new String(parts("txt"), "UTF-8") == "a white rectangle")
    val feat = Multimodal.extractFeatures(
      Seq(("s1.png", "image", 0, parts("png"))).toDS(), dim = 12)
      .collect()(0).embedding
    assert(feat.length == 12 && feat.forall(v => v >= 0f && v <= 1f),
      "pooled raster feature must come from a real decode")
  }

  test("WAV PCM decode handles 8-bit, stereo mixdown, and float32") {
    // hand-built RIFF containers so every branch is pinned byte-exactly
    def wav(fmtCode: Int, channels: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes); w32(36 + data.length); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16)
      w16(fmtCode); w16(channels); w32(8000)
      w32(8000 * channels * bits / 8); w16(channels * bits / 8); w16(bits)
      out.write("data".getBytes); w32(data.length); out.write(data, 0, data.length)
      out.toByteArray
    }
    // 8-bit unsigned: 128 = 0.0, 255 ≈ +1, 0 = −1
    val b8 = Multimodal.decodeWavPcm(wav(1, 1, 8,
      Array(128, 255, 0, 192).map(_.toByte))).get._2
    assert(math.abs(b8(0)) < 1e-6 && math.abs(b8(1) - 127f / 128) < 1e-6 &&
      math.abs(b8(2) + 1f) < 1e-6 && math.abs(b8(3) - 0.5f) < 1e-6, b8.toSeq.toString)
    // stereo 16-bit: channels average — L=+16384, R=−16384 → 0; L=R=8192 → 0.25
    val st = new java.io.ByteArrayOutputStream()
    def s16(v: Int): Unit = { st.write(v & 0xff); st.write((v >> 8) & 0xff) }
    s16(16384); s16(-16384); s16(8192); s16(8192)
    val b2 = Multimodal.decodeWavPcm(wav(1, 2, 16, st.toByteArray)).get._2
    assert(b2.length == 2 && math.abs(b2(0)) < 1e-6 &&
      math.abs(b2(1) - 0.25f) < 1e-6, b2.toSeq.toString)
    // float32 (format code 3): raw IEEE bits pass through
    val fl = new java.io.ByteArrayOutputStream()
    for (v <- Seq(0.5f, -0.25f)) {
      val b = java.lang.Float.floatToIntBits(v)
      (0 until 4).foreach(i => fl.write((b >> (8 * i)) & 0xff))
    }
    val b3 = Multimodal.decodeWavPcm(wav(3, 1, 32, fl.toByteArray)).get._2
    assert(b3.toSeq == Seq(0.5f, -0.25f), b3.toSeq.toString)
    // compressed format codes refuse to decode
    assert(Multimodal.decodeWavPcm(wav(85, 1, 16, new Array[Byte](8))).isEmpty)
  }

  test("real PNG and WAV headers probe true dimensions and duration") {
    // a REAL 37x21 PNG via javax.imageio
    val img = new java.awt.image.BufferedImage(37, 21,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pngOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pngOut))
    val png = pngOut.toByteArray

    // a REAL 500 ms WAV via javax.sound.sampled: 8 kHz × 16-bit mono
    // ⇒ byte rate 16000; 8000 data bytes = 4000 frames = 500 ms
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](8000)), fmt, 4000)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val wav = wavOut.toByteArray

    val d = Files.createTempDirectory("graft_media_real")
    Files.write(d.resolve("real.png"), png)
    Files.write(d.resolve("real.wav"), wav)
    val media = Multimodal.scan(spark, d.toString).collect()
      .map(m => m.path.split('/').last -> m).toMap

    val p = media("real.png").meta
    assert(p.mime == "image/png" && p.width == 37 && p.height == 21,
      s"PNG IHDR misparsed: $p")
    val w = media("real.wav").meta
    assert(w.mime == "audio/wav" && w.durationMs == 500L,
      s"WAV fmt/data misparsed: $w")

    // resize flows through the REAL dimensions
    val r = Multimodal.resize(Multimodal.scan(spark, d.toString), 10, 10)
      .collect().find(_.kind == "image").get.meta
    assert(r.width == 10 && r.height == 5, s"resize from real dims: $r")

    // malformed headers fall back to the stub probe, not an exception
    val junk = Multimodal.probe("x.png", Array.tabulate(64)(_.toByte))
    assert(junk.meta.width > 0 && junk.meta.height > 0)
    assert(Multimodal.probePngHeader(Array.tabulate(64)(_.toByte)).isEmpty)
    assert(Multimodal.probeWavHeader(Array.tabulate(64)(_.toByte)).isEmpty)
  }

  test("real JPEG and GIF headers probe true dimensions") {
    val img = new java.awt.image.BufferedImage(53, 29,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jOut))
    assert(Multimodal.probeJpegHeader(jOut.toByteArray).contains((53, 29)))

    val gOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", gOut))
    assert(Multimodal.probeGifHeader(gOut.toByteArray).contains((53, 29)))

    assert(Multimodal.probeJpegHeader(Array.tabulate(64)(_.toByte)).isEmpty)
    assert(Multimodal.probeGifHeader("GIF89a".getBytes ++ Array[Byte](0, 0, 0, 0)).isEmpty)
  }

  test("real MP4 box walk probes mvhd duration and tkhd dimensions") {
    // hand-built minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0))
    val bb = java.nio.ByteBuffer.allocate(4096)
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhd = java.nio.ByteBuffer.allocate(100)   // v0 payload
    mvhd.putInt(0)                                 // version+flags
    mvhd.putInt(0).putInt(0)                       // creation, modification
    mvhd.putInt(600)                               // timescale
    mvhd.putInt(3000)                              // duration → 5000 ms
    val tkhd = java.nio.ByteBuffer.allocate(84)    // v0 payload
    tkhd.position(76)
    tkhd.putInt(320 << 16).putInt(240 << 16)       // width, height (16.16)
    val moov = box("moov", box("mvhd", mvhd.array()) ++
      box("trak", box("tkhd", tkhd.array())))
    val ftyp = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 0))
    val mp4 = ftyp ++ moov
    assert(Multimodal.probeMp4Header(mp4).contains((5000L, 320, 240)))
    assert(Multimodal.probeMp4Header(Array.tabulate(64)(_.toByte)).isEmpty)

    val d = Files.createTempDirectory("graft_media_mp4")
    Files.write(d.resolve("clip.mp4"), mp4)
    val m = Multimodal.scan(spark, d.toString).collect().head.meta
    assert(m.mime == "video/mp4" && m.durationMs == 5000L &&
      m.width == 320 && m.height == 240, s"mp4 probe through scan: $m")
  }

  test("MJPEG-in-AVI: real header probe, frame demux, and real frame features") {
    // hand-built minimal AVI: RIFF(AVI (LIST hdrl(avih) + LIST movi(00dc…)))
    def chunk(t: String, p: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + p.length + (p.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(t.getBytes("US-ASCII")).putInt(p.length).put(p)
      b.array()
    }
    def list(t: String, p: Array[Byte]): Array[Byte] =
      chunk("LIST", t.getBytes("US-ASCII") ++ p)
    def jpegOf(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out))
      out.toByteArray
    }
    val frames = Seq(0xff0000, 0x00ff00, 0x0000ff).map(jpegOf)
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(40000)                       // µs per frame (25 fps)
    avih.putInt(0).putInt(0).putInt(0)       // maxBps, padding, flags
    avih.putInt(3).putInt(0).putInt(1)       // totalFrames, initial, streams
    avih.putInt(0).putInt(32).putInt(24)     // bufSize, width, height
    val avi = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih.array())) ++
      list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _)))

    // header probe: 3 frames × 40 ms = 120 ms, 32×24
    assert(Multimodal.probeAviHeader(avi).contains((120L, 32, 24)))
    assert(Multimodal.probeAviHeader(Array.tabulate(64)(_.toByte)).isEmpty)

    // demux returns the exact per-frame JPEG payloads, container-order
    val got = Multimodal.aviMjpegFrames(avi).get
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, want) => assert(g.sameElements(want)) }
    assert(Multimodal.aviMjpegFrames(avi, maxFrames = 2).get.length == 2)
    assert(Multimodal.aviMjpegFrames("RIFF".getBytes ++ avi.drop(4)).isEmpty
      || true) // malformed prefix never throws
    assert(Multimodal.aviMjpegFrames(Array.tabulate(64)(_.toByte)).isEmpty)

    // end-to-end: scan → probe metadata → real frames → REAL raster features
    val d = Files.createTempDirectory("graft_media_avi")
    Files.write(d.resolve("clip.avi"), avi)
    val media = Multimodal.scan(spark, d.toString)
    val m = media.collect().head
    assert(m.kind == "video" && m.meta.mime == "video/x-msvideo" &&
      m.meta.durationMs == 120L && m.meta.width == 32 && m.meta.height == 24,
      s"avi probe through scan: ${m.meta}")
    val sampled = Multimodal.sampleFrames(media).collect().sortBy(_._3)
    assert(sampled.length == 3, "one row per real MJPEG frame")
    sampled.zip(frames).foreach { case ((_, kind, _, bytes), want) =>
      assert(kind == "video" && bytes.sameElements(want))
    }
    val feats = Multimodal.extractFeatures(
        Multimodal.sampleFrames(media), dim = 12).collect().sortBy(_.frameNo)
    feats.zip(frames).foreach { case (f, jpg) =>
      val want = Multimodal.imageRasterFeature(jpg, 12).get
      assert(f.embedding.sameElements(want),
        s"frame ${f.frameNo} must use the REAL pooled-raster feature")
    }
    // distinct solid colors ⇒ distinct features (red vs green channel)
    assert(!feats(0).embedding.sameElements(feats(1).embedding))
  }

  test("malformed WAV chunk sizes terminate the walk and degrade to the stub") {
    // RIFF/WAVE container with one chunk whose 32-bit size is adversarial
    def wavWith(chunkSize: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("JUNK".getBytes("US-ASCII")).putInt(chunkSize)
      bb.array()
    }
    // 0xFFFFFFF8: as Int this is -8, so the pre-fix walk advanced by ZERO
    // bytes per step — an infinite loop inside an executor task
    assert(Multimodal.probeWavHeader(wavWith(0xFFFFFFF8)).isEmpty)
    // 0x80000000: Int overflow sent the offset negative → AIOOBE pre-fix
    assert(Multimodal.probeWavHeader(wavWith(0x80000000)).isEmpty)
    // and probe() stays total: malformed real-extension bytes → stub meta
    val m = Multimodal.probe("corrupt.wav", wavWith(0xFFFFFFF8))
    assert(m.meta.mime == "audio/wav" && m.meta.durationMs == 64 * 10L,
      s"corrupt WAV must fall back to the stub probe: ${m.meta}")
  }

  test("audio trak dimensions never clobber the video trak in MP4 probe") {
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhd = java.nio.ByteBuffer.allocate(24)
    mvhd.putInt(0).putInt(0).putInt(0).putInt(600).putInt(3000) // ts 600, dur 3000
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val t = java.nio.ByteBuffer.allocate(84)
      t.position(76)
      t.putInt(w << 16).putInt(h << 16)
      box("trak", box("tkhd", t.array()))
    }
    // typical layout: video trak FIRST, audio trak (0×0 tkhd) second —
    // pre-fix the last trak won and valid videos reported 0×0
    val videoFirst = box("moov",
      box("mvhd", mvhd.array()) ++ tkhd(320, 240) ++ tkhd(0, 0))
    assert(Multimodal.probeMp4Header(videoFirst).contains((5000L, 320, 240)))
    // audio-first still picks up the later video trak's dimensions
    val audioFirst = box("moov",
      box("mvhd", mvhd.array()) ++ tkhd(0, 0) ++ tkhd(320, 240))
    assert(Multimodal.probeMp4Header(audioFirst).contains((5000L, 320, 240)))
  }

  test("real MP3 frame header probes CBR duration, skipping ID3v2") {
    // MPEG1 Layer III, 128 kbps, 44.1 kHz: FF FB 90 00
    val frame = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00)
    val mp3 = frame ++ new Array[Byte](16000)      // 16004 B @128kbps ≈ 1000 ms
    assert(Multimodal.probeMp3Header(mp3).contains(1000L))
    // ID3v2 tag of 100 bytes in front — syncsafe size, then the same stream
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 100) ++ new Array[Byte](100)
    assert(Multimodal.probeMp3Header(id3 ++ mp3).contains(1000L))
    assert(Multimodal.probeMp3Header(new Array[Byte](64)).isEmpty)
  }

  test("resize really rescales decodable image payloads") {
    val img = new java.awt.image.BufferedImage(40, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.getGraphics.fillRect(0, 0, 40, 20)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val d = Files.createTempDirectory("graft_media_resize")
    Files.write(d.resolve("wide.png"), out.toByteArray)

    val r = Multimodal.resize(Multimodal.scan(spark, d.toString), 10, 10)
      .collect().head
    assert(r.meta.width == 10 && r.meta.height == 5)
    // the PAYLOAD itself was re-encoded at the new dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.content))
    assert(back != null && back.getWidth == 10 && back.getHeight == 5,
      "payload must decode to the resized raster")
    assert(r.meta.sizeBytes == r.content.length)
  }

  test("metadata projection has the declared schema") {
    val t = Multimodal.metaTable(Multimodal.scan(spark, dir))
    assert(t.columns.toSeq ==
      Seq("path", "kind", "mime", "sizeBytes", "width", "height", "durationMs"))
    assert(t.count() == 3)
  }

  test("perceptual aHash: re-encode/resize invariant, edits near, distinct far") {
    val s = spark
    import s.implicits._
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val ramp = png(64, 64)((x, _) => gray(x * 255 / 63))
    // same scene at a different resolution — different bytes, same hash
    val rampSmall = png(32, 32)((x, _) => gray(x * 255 / 31))
    // small edit: one corner cell brightened
    val edited = png(64, 64)((x, y) =>
      if (x < 8 && y < 8) gray(255) else gray(x * 255 / 63))
    // different scene entirely
    val checker = png(64, 64)((x, y) =>
      if (((x / 8) + (y / 8)) % 2 == 0) gray(255) else gray(0))
    def h(b: Array[Byte]) = Multimodal.averageHash(b).get
    def d(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(d(h(ramp), h(rampSmall)) == 0, "resize must not move the hash")
    val editDist = d(h(ramp), h(edited))
    assert(editDist >= 1 && editDist <= 5, s"small edit moved $editDist bits")
    assert(d(h(ramp), h(checker)) > 16, "distinct scenes must be far")
    // end-to-end: the chunk-blocked pairing finds exactly the near pair
    val media = Seq(
      Multimodal.probe("ramp.png", ramp),
      Multimodal.probe("edited.png", edited),
      Multimodal.probe("checker.png", checker)).toDS()
    val pairs = Multimodal.imageNearDup(media, maxDist = 5)
      .select("d1", "d2").as[(String, String)].collect().toSet
    assert(pairs == Set(("edited.png", "ramp.png")), s"pairs: $pairs")
    // undecodable bytes drop out of the hash table, not the pipeline
    val withJunk = media.union(Seq(Multimodal.probe("junk.png",
      Array.fill[Byte](32)(7))).toDS())
    assert(Multimodal.imageHashes(withJunk).count() == 3)
  }

  test("perceptual audio hash: gain invariant, envelope-sensitive, e2e pair") {
    val s = spark
    import s.implicits._
    // sine with a per-16th-window amplitude envelope (steady tones are the
    // documented degenerate case — real audio has an envelope)
    def wav(freq: Double, amp: Int => Double, gain: Double = 1.0): Array[Byte] = {
      val sr = 8000; val n = sr / 2
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val w = i * 16 / n
        val v = (math.sin(2 * math.Pi * freq * i / sr) * amp(w) * gain).toInt
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val envA: Int => Double = w => if (w % 4 < 2) 12000.0 else 3000.0
    val envB: Int => Double = w => if (w < 8) 12000.0 else 3000.0
    val a = wav(440, envA)
    val aQuiet = wav(440, envA, gain = 0.5)
    val b = wav(440, envB)
    def h(x: Array[Byte]) = Multimodal.audioHash(x).get
    def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(d(h(a), h(aQuiet)) <= 2, s"gain moved ${d(h(a), h(aQuiet))} bits")
    assert(d(h(a), h(b)) > 6, s"different envelopes only ${d(h(a), h(b))} apart")
    val media = Seq(
      Multimodal.probe("a.wav", a),
      Multimodal.probe("a_quiet.wav", aQuiet),
      Multimodal.probe("b.wav", b)).toDS()
    val pairs = Multimodal.audioNearDup(media, maxDist = 5)
      .select("d1", "d2").as[(String, String)].collect().toSet
    assert(pairs == Set(("a.wav", "a_quiet.wav")), s"pairs: $pairs")
  }

  test("ustar parser never throws on hostile shards — fuzz property") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // a healthy 3-entry shard to corrupt (mixed payload sizes straddle
    // block boundaries)
    val base = TarShards.build(Seq(
      "a.txt" -> Array.tabulate(37)(_.toByte),
      "b.jpg" -> Array.tabulate(1024)(i => (i * 7).toByte),
      "c.json" -> Array.tabulate(511)(i => (i ^ 3).toByte)))
    val happy = TarShards.parseTar(base).map(_._1)
    assert(happy == Seq("a.txt", "b.jpg", "c.json"))
    // corruption model: flip/overwrite k random bytes (hits header
    // checksums, octal size fields — including making them non-numeric
    // or huge — typeflags, names), then truncate at a random offset
    val corrupt: Gen[Array[Byte]] = for {
      k <- Gen.choose(1, 24)
      edits <- Gen.listOfN(k,
        Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(-128, 127)))
      cut <- Gen.choose(0, base.length)
    } yield {
      val b = java.util.Arrays.copyOf(base, base.length)
      edits.foreach { case (i, v) => b(i) = v.toByte }
      java.util.Arrays.copyOf(b, cut)
    }
    val prop = Prop.forAll(corrupt) { bytes =>
      // lenient contract: ANY corruption parses to zero-or-more entries,
      // each with in-bounds payload — never an exception
      val got = TarShards.parseTar(bytes)
      got.forall { case (n, c) => n.nonEmpty && c.length <= bytes.length }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withWorkers(1), prop)
    assert(res.passed, s"fuzz: ${res.status}")
    // targeted hostile headers the random model may miss: size field all
    // ASCII (non-octal), size claiming past EOF, oversized octal
    def smash(at: Int, s: String): Array[Byte] = {
      val b = java.util.Arrays.copyOf(base, base.length)
      val sb = s.getBytes("US-ASCII")
      System.arraycopy(sb, 0, b, at, math.min(sb.length, 12))
      b
    }
    assert(TarShards.parseTar(smash(124, "zzzzzzzzzzz ")).isEmpty)
    val pastEof = TarShards.parseTar(smash(124, "77777777777 "))
    assert(pastEof.isEmpty, "size past EOF must end the shard, not throw")
    assert(TarShards.parseTar(Array.empty[Byte]).isEmpty)
    assert(TarShards.parseTar(new Array[Byte](511)).isEmpty)
  }
}
