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
  * real pure-JDK byte parses for PNG (IHDR width/height) and WAV (fmt/data
  * chunks → duration); JPEG/MP3/MP4 probing and all payload DECODE remain
  * clearly-marked deterministic STUBS (the codec libraries are not in this
  * container). Swapping a stub for a real decoder changes only the function
  * body marked below, not the dataflow.
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
    * rate and the data chunk's size → duration in ms. None when malformed. */
  private[multimodal] def probeWavHeader(b: Array[Byte]): Option[Long] = {
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var byteRate = 0L
    var dataLen = -1L
    while (off + 8 <= b.length && (byteRate == 0 || dataLen < 0)) {
      val sz = le32(off + 4).toLong & 0xffffffffL
      tag(off) match {
        // fmt payload: format(2) channels(2) sampleRate(4) byteRate(4) …
        case "fmt " if off + 20 <= b.length =>
          byteRate = le32(off + 16).toLong & 0xffffffffL
        case "data" => dataLen = sz
        case _ => ()
      }
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are 2-byte aligned
    }
    if (byteRate > 0 && dataLen >= 0) Some(dataLen * 1000L / byteRate) else None
  }

  /** Header probe: REAL for PNG and WAV (pure-JDK byte parses above); a
    * deterministic STUB for JPEG/MP3/video and for malformed headers, which
    * keeps the dataflow total on arbitrary bytes. */
  def probe(path: String, bytes: Array[Byte]): MediaFile = {
    val kind = kindOf(path)
    val real: Option[MediaMeta] = kind match {
      case "image" if path.toLowerCase.endsWith(".png") =>
        probePngHeader(bytes).map { case (w, h) =>
          MediaMeta("image/png", bytes.length, w, h, 0L) }
      case "audio" if path.toLowerCase.endsWith(".wav") =>
        probeWavHeader(bytes).map(d =>
          MediaMeta("audio/wav", bytes.length, 0, 0, d))
      case _ => None
    }
    real match {
      case Some(meta) => MediaFile(path, kind, bytes, meta)
      case None => stubProbe(path, kind, bytes)
    }
  }

  /** STUB probe — deterministic fake header parse for formats whose codecs
    * aren't in this container (JPEG SOF, MP3 frames, MP4 moov) and for
    * malformed inputs. */
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
