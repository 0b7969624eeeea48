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
  * array<float> feature columns — is real and tested; the actual
  * image/audio/video DECODE is a clearly-marked deterministic STUB (the
  * codec libraries are not in this container). Swapping the stub for a real
  * decoder changes only the function body marked below, not the dataflow.
  *
  * Scale: decode is embarrassingly parallel; `mapPartitions` keeps it one
  * process-wide pass per partition with no shuffle. Frame sampling explodes
  * rows (1 video → n frames) BEFORE feature extraction so the expensive step
  * parallelizes over frames, and `repartition` lets the explode fan out.
  */
object Multimodal {

  private def kindOf(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".png") || p.endsWith(".jpg") || p.endsWith(".jpeg")) "image"
    else if (p.endsWith(".wav") || p.endsWith(".mp3")) "audio"
    else if (p.endsWith(".mp4") || p.endsWith(".mkv")) "video"
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

  /** STUB decode probe — deterministic fake header parse.
    * REAL IMPLEMENTATION WOULD: parse the container header (PNG IHDR / WAV
    * fmt / MP4 moov) for true dimensions and duration. */
  def probe(path: String, bytes: Array[Byte]): MediaFile = {
    val kind = kindOf(path)
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

  /** Frame sampling: one row per sampled frame every `everyMs` (videos);
    * images yield frame 0; audio yields one frame per window. The payload
    * slice is a STUB (real: demux+decode the GOP at that timestamp). */
  def sampleFrames(media: Dataset[MediaFile], everyMs: Long = 1000L)
      : Dataset[(String, String, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
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

  /** Resize: adjusts typed metadata to the target box preserving aspect
    * ratio. Payload re-encode is a STUB (passthrough; real: decode → scale →
    * re-encode) — the metadata math and row plumbing are real. */
  def resize(media: Dataset[MediaFile], maxW: Int, maxH: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.meta.width <= 0 || m.meta.height <= 0) m
      else {
        val scale = math.min(1.0,
          math.min(maxW.toDouble / m.meta.width, maxH.toDouble / m.meta.height))
        m.copy(meta = m.meta.copy(
          width = math.max(1, (m.meta.width * scale).toInt),
          height = math.max(1, (m.meta.height * scale).toInt)))
      }
    }
  }

  /** Feature extraction over frames, batched per partition (the real-world
    * shape: load a model once per partition, run batched inference).
    * STUB embedding: splitmix-style hash of the bytes → 16 deterministic
    * floats in [-1, 1). */
  def extractFeatures(frames: Dataset[(String, String, Int, Array[Byte])],
                      dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeature] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      // per-partition init happens HERE once (model load in a real impl)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (path, kind, frameNo, bytes) =>
          val seed = bytes.foldLeft(frameNo.toLong)((a, b) => a * 31 + (b & 0xff))
          val emb = Array.tabulate(dim) { j =>
            (graft.functions.Sketches.mix64(seed + j).toDouble / Long.MaxValue).toFloat
          }
          MediaFeature(path, kind, frameNo, emb)
        }
      }
    }
  }

  /** Metadata-only projection (no payload deserialization): proves the
    * binary column stays opaque — Catalyst prunes `content` from the scan. */
  def metaTable(media: Dataset[MediaFile]): DataFrame =
    media.select(col("path"), col("kind"), col("meta.mime"),
      col("meta.sizeBytes"), col("meta.width"), col("meta.height"),
      col("meta.durationMs"))
}
