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

  test("metadata projection has the declared schema") {
    val t = Multimodal.metaTable(Multimodal.scan(spark, dir))
    assert(t.columns.toSeq ==
      Seq("path", "kind", "mime", "sizeBytes", "width", "height", "durationMs"))
    assert(t.count() == 3)
  }
}
