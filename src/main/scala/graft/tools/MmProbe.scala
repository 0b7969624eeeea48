package graft.tools

import graft.multimodal.{Multimodal, SyntheticMedia}
import org.apache.spark.sql.functions._

/** Scale probe for the multimodal operators (round-12 verdict item 3):
  * the catalog's `q_mm_*` entries run on FIXED media sets (24+8 images,
  * 16+6 WAVs, 6 AVIs — sized for the correctness oracle), so the bench
  * can't show how the operators scale. This probe replays the same three
  * shapes at K× the media count — seeds shifted per replica so the
  * planted-dup fraction stays constant while volume grows — and times
  * each operator end-to-end (generation + hash + pairing), exactly the
  * catalog plan shapes.
  *
  * The scale-sensitive part is the pairing: aHash/audioHash hamming
  * pairs reuse the chunk-blocked Dedup machinery (never all-pairs), so
  * wall should grow ~linearly in media count until planted-pair volume
  * dominates.
  *
  * Usage: tools/run.sh graft.tools.MmProbe [K] [repeats]
  * Prints one line per (op, rep): PROBE mm[<op>] K=… rows=… wall=…s
  */
object MmProbe {

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(32)
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = graft.core.Sessions.build(graft.core.Sessions.Conf(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      appName = "graft-mm-probe",
      numTasks = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt))
    import spark.implicits._

    // K replicas of the catalog specs, seed-shifted by 1000 per replica
    // (SyntheticMedia fields are pure functions of seed, so replicas are
    // distinct media, and each replica plants the same dup fraction)
    val imageSpecs = (0 until k).flatMap { r =>
      (0 until 24).map(i => (f"img_${r}_$i%03d_base.png", r * 1000 + i, 64)) ++
        (0 until 8).map(i => (f"img_${r}_$i%03d_copy.png", r * 1000 + i, 48))
    }
    val audioSpecs = (0 until k).flatMap { r =>
      (0 until 16).map(i => (f"aud_${r}_$i%03d_base.wav", r * 1000 + i, 1.0)) ++
        (0 until 6).map(i => (f"aud_${r}_$i%03d_gain.wav", r * 1000 + i, 0.45))
    }
    val aviSpecs = (0 until k).flatMap { r =>
      (0 until 6).map(i => (f"vid_${r}_$i%02d.avi", r * 1000 + i, 3 + i))
    }

    def time(tag: String)(body: => Long): Unit =
      (1 to repeats).foreach { rep =>
        val t0 = System.nanoTime()
        val rows = body
        val s = (System.nanoTime() - t0) / 1e9
        println(f"PROBE mm[$tag] K=$k rep=$rep rows=$rows wall=$s%.2fs")
      }

    time("imgdup") {
      val media = spark.createDataset(imageSpecs).map { case (n, seed, size) =>
        Multimodal.probe(n, SyntheticMedia.png(seed, size, size))
      }
      Multimodal.imageNearDup(media, maxDist = 5).count()
    }
    time("audiodup") {
      val media = spark.createDataset(audioSpecs).map { case (n, seed, gain) =>
        Multimodal.probe(n, SyntheticMedia.wav(seed, gain))
      }
      Multimodal.audioNearDup(media, maxDist = 5).count()
    }
    time("avi") {
      val media = spark.createDataset(aviSpecs).map { case (n, seed, nf) =>
        Multimodal.probe(n, SyntheticMedia.avi(seed, nf))
      }
      Multimodal.sampleFrames(media)
        .toDF("path", "kind", "frame_no", "payload")
        .withColumn("fp", md5(col("payload")))
        .groupBy(col("path")).agg(count(lit(1)).as("n_frames"))
        .count()
    }
    spark.stop()
  }
}
