package graft.queries

import graft.core.Q
import graft.multimodal.{Multimodal, SyntheticMedia}
import org.apache.spark.sql.functions._

/** Multimodal catalog entries: deterministic synthetic media (pure
  * functions of a seed — [[graft.multimodal.SyntheticMedia]]) driven
  * through the REAL image/audio/video paths each round, so a regression
  * in aHash, the WAV PCM decode, or the AVI MJPEG demux is visible to the
  * driver's correctness gate, not only to `sbt test`. Rows-only by
  * structural necessity (binary decode — no SQL oracle can exist);
  * MmQueriesSpec pins the exact pair sets and digests.
  *
  * Scale: generation is a map over a distributed seed dataset (no
  * driver-side media); near-dup pairing is the pigeonhole chunk-blocked
  * hamming join shared with the text SimHash path — never all-pairs over
  * payloads. The catalog sizes here are deliberately tiny (the content is
  * synthetic); the 100 TB story is the operators', probed in
  * MultimodalSpec and BASELINE.md.
  */
object MultimodalQueries {

  /** 24 base 64×64 PNGs (seeds 0–23); seeds 0–7 also re-render at 48×48.
    * The smooth field makes the re-render a perceptual near-dup of its
    * base (aHash pools 8×8 block means — resolution-invariant for a
    * continuous field) while distinct seeds stay far apart. */
  private def imageSpecs: Seq[(String, Int, Int)] =
    (0 until 24).map(i => (f"img_$i%03d_base.png", i, 64)) ++
      (0 until 8).map(i => (f"img_$i%03d_copy.png", i, 48))

  /** 16 base WAVs (seeds 0–15, gain 1.0); seeds 0–5 also at gain 0.45 —
    * audioHash thresholds each feature type against its own mean, so a
    * pure gain change is (near-)invariant while distinct seeds differ in
    * carrier frequency AND envelope shape. */
  private def audioSpecs: Seq[(String, Int, Double)] =
    (0 until 16).map(i => (f"aud_$i%03d_base.wav", i, 1.0)) ++
      (0 until 6).map(i => (f"aud_$i%03d_gain.wav", i, 0.45))

  /** 6 MJPEG AVIs; video i carries 3+i frames. */
  private def aviSpecs: Seq[(String, Int, Int)] =
    (0 until 6).map(i => (f"vid_$i%02d.avi", i, 3 + i))

  val queries: Map[String, Q] = Map(
    // perceptual image near-dup: aHash every payload, chunk-blocked
    // hamming pairs at ≤5 bits. Expected: exactly the 8 planted
    // (base, 48×48 re-render) pairs — pinned in MmQueriesSpec.
    "q_mm_imgdup" -> ((s, _) => {
      import s.implicits._
      val media = s.createDataset(imageSpecs).map { case (name, seed, size) =>
        Multimodal.probe(name, SyntheticMedia.png(seed, size, size))
      }
      Multimodal.imageNearDup(media, maxDist = 5)
        .orderBy(col("d1"), col("d2"))
    }),

    // perceptual audio near-dup over the real WAV PCM waveform features:
    // expected exactly the 6 planted gain-copy pairs.
    "q_mm_audiodup" -> ((s, _) => {
      import s.implicits._
      val media = s.createDataset(audioSpecs).map { case (name, seed, gain) =>
        Multimodal.probe(name, SyntheticMedia.wav(seed, gain))
      }
      Multimodal.audioNearDup(media, maxDist = 5)
        .orderBy(col("d1"), col("d2"))
    }),

    // AVI MJPEG demux: per video, the frame count and a digest chain over
    // the per-frame payload md5s in frame order. The demux returns the
    // exact JPEG bytes the container stores, so MmQueriesSpec recomputes
    // the expected digests straight from the generator.
    "q_mm_avi" -> ((s, _) => {
      import s.implicits._
      val media = s.createDataset(aviSpecs).map { case (name, seed, n) =>
        Multimodal.probe(name, SyntheticMedia.avi(seed, n))
      }
      Multimodal.sampleFrames(media)
        .toDF("path", "kind", "frame_no", "payload")
        .withColumn("fp", md5(col("payload")))
        .groupBy(col("path"))
        .agg(
          count(lit(1)).as("n_frames"),
          md5(concat_ws("|", transform(
            sort_array(collect_list(struct(col("frame_no"), col("fp")))),
            x => x.getField("fp")))).as("fp"))
        .orderBy(col("path"))
    })
  )
}
