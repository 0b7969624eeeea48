package graft.genomics

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded cluster (read pair + barcode), the PRQ record shape
  * (SURVEY §1.1 D2; reference writes these as gzipped text parts —
  * `workflow.py:368,398-405`).
  */
case class PrqRead(id: String, sample: String, seq1: String, qual1: String,
                   seq2: String, qual2: String, barcode: String,
                   passFilter: Boolean, lane: Int, tile: Int)

/** Read structure of a run: leading template cycles, index cycles, trailing
  * template cycles (paired-end with one index read).
  */
case class ReadStructure(r1: Int, index: Int, r2: Int) {
  def totalCycles: Int = r1 + index + r2
}

/** BCL scan + decode (SURVEY §2A R1/R2/R3/R5).
  *
  * The flowcell layout is cycle-major — one binary file per (lane, tile,
  * cycle), each byte packing base (2 bits) + quality (6 bits); byte 0 is a
  * no-call **[paper; public Illumina BCL format]**. Decoding is a
  * columnar→row transpose: all cycles of a tile are brought together and
  * each cluster's bytes across cycles become one read pair.
  *
  * Spark-first design: `binaryFile` scan → (lane, tile, cycle) parsed from
  * the path → shuffle by (lane, tile) → `mapGroups` transpose. A tile is the
  * unit of parallelism (as in the reference's Flink job): at 100 TB a run
  * has thousands of tiles, each a few hundred MB — groups fit comfortably in
  * an executor, and the single shuffle moves each cycle file exactly once.
  * Mate pairing (R5) is intrinsic: a cluster's R1/R2 bytes sit in the same
  * column slice, so no join is ever needed.
  */
object Bcl {

  /** Path grammar: .../L{lane}/C{cycle}.1/s_{lane}_{tile}.bcl[.bgzf] —
    * flat HiSeq tiles and NovaSeq-era blocked-gzip tiles side by side;
    * payload compression is resolved per file by magic ([[Bgzf.isBgzf]]),
    * so a mixed run decodes uniformly. */
  private val pathRe = ".*/L(\\d+)/C(\\d+)\\.1/s_\\d+_(\\d+)\\.bcl(?:\\.bgzf)?$"
  /** CBCL files carry every tile of a lane surface per cycle:
    * .../L{lane}/C{cycle}.1/L{lane}_{surface}.cbcl */
  private val cbclRe = ".*/L(\\d+)/C(\\d+)\\.1/[^/]+\\.cbcl$"
  /** Filter files: .../L{lane}/s_{lane}_{tile}.filter (1 byte per cluster) */
  private val filterRe = ".*/L(\\d+)/s_\\d+_(\\d+)\\.filter$"
  /** Cluster coordinates: .../L{lane}/s_{lane}_{tile}.locs or .clocs */
  private val locsRe = ".*/L(\\d+)/s_\\d+_(\\d+)\\.(locs|clocs)$"

  private val bases = Array('A', 'C', 'G', 'T')

  /** Decode one BCL byte to (base, phred+33 qual char). */
  @inline def decodeByte(b: Byte): (Char, Char) =
    if (b == 0) ('N', '!')
    else (bases(b & 0x3), ((((b & 0xff) >> 2) & 0x3f) + 33).toChar)

  /** Scan a run folder and decode to PRQ reads (sample not yet assigned),
    * with caller-supplied cycle structure and positional read ids
    * (`lane_tile_index`). */
  def decodeRun(spark: SparkSession, runDir: String, rs: ReadStructure)
      : Dataset[PrqRead] = decodeRunImpl(spark, runDir, rs, None)

  /** Metadata-driven decode (round 12): derive the [[ReadStructure]] from
    * `<runDir>/RunInfo.xml` and read names from the per-tile `.locs` /
    * `.clocs` cluster coordinates — ids become the real Illumina grammar
    * `instrument:run:flowcell:lane:tile:x:y` (`RunMeta.RunInfo.readName`).
    * Loud on a missing/inconsistent manifest, a tile without coordinates,
    * or a coordinate count that disagrees with the tile's cluster count —
    * never a silently mis-named read. The coordinate files ride the same
    * (lane, tile) shuffle as the chastity filters: no extra pass. */
  def decodeRun(spark: SparkSession, runDir: String): Dataset[PrqRead] = {
    val info = RunMeta.readRunInfo(runDir)
    decodeRunImpl(spark, runDir, info.rs, Some(info))
  }

  private def decodeRunImpl(spark: SparkSession, runDir: String,
                            rs: ReadStructure,
                            info: Option[RunMeta.RunInfo])
      : Dataset[PrqRead] = {
    import spark.implicits._

    // either container arm may legitimately be absent (HiSeq runs have
    // no .cbcl; NovaSeq runs have no flat .bcl) — an empty listing is an
    // empty arm, not an error (the cycle-count require below still
    // catches a truly empty run)
    def loadBinary(glob: String): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.types._
      try spark.read.format("binaryFile").load(glob)
        .select(col("path"), col("content"))
      catch { case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Path does not exist") ||
             e.getErrorClass == "PATH_NOT_FOUND" =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("path", StringType),
            StructField("content", BinaryType))))
      }
    }

    // flat / bgzf tiles: one file per (lane, tile, cycle); header dropped
    // and bgzf inflated HERE so the transpose sees uniform per-cluster
    // byte columns. pfOnly is always false on this arm.
    val flatCycles = loadBinary(s"$runDir/L*/C*.1/*.bcl*")
      .select(
        regexp_extract(col("path"), pathRe, 1).cast("int").as("lane"),
        regexp_extract(col("path"), pathRe, 3).cast("int").as("tile"),
        regexp_extract(col("path"), pathRe, 2).cast("int").as("cycle"),
        col("content"))
      .as[(Int, Int, Int, Array[Byte])]
      .map { case (lane, tile, cycle, raw) =>
        val bytes = if (Bgzf.isBgzf(raw)) Bgzf.decompress(raw) else raw
        (lane, tile, cycle, bytes.drop(4), false) // 4-byte LE cluster count
      }

    // CBCL: one file per (lane, cycle[, surface]) carrying EVERY tile —
    // one flatMap task per file expands to per-tile columns; excludeNonPF
    // files emit compact PF-only arrays the transpose re-expands against
    // the lane filter. Listing may legitimately be empty (HiSeq runs).
    val cbclCycles = {
      loadBinary(s"$runDir/L*/C*.1/*.cbcl")
        .select(
          regexp_extract(col("path"), cbclRe, 1).cast("int").as("lane"),
          regexp_extract(col("path"), cbclRe, 2).cast("int").as("cycle"),
          col("content"))
        .as[(Int, Int, Array[Byte])]
        .flatMap { case (lane, cycle, bytes) =>
          Cbcl.decode(bytes).iterator.map { case (tileNum, col, pfOnly) =>
            (lane, tileNum, cycle, col, pfOnly)
          }
        }
    }

    val cycles = flatCycles.union(cbclCycles)

    // per-tile metadata rides ONE dataset so filters and coordinates share
    // the same (lane, tile) shuffle: kind "f" = chastity filter (header
    // dropped), "locs"/"clocs" = raw coordinate payloads
    val filters = loadBinary(s"$runDir/L*/*.filter")
      .select(
        regexp_extract(col("path"), filterRe, 1).cast("int").as("lane"),
        regexp_extract(col("path"), filterRe, 2).cast("int").as("tile"),
        col("content"))
      .as[(Int, Int, Array[Byte])]
      .map { case (lane, tile, bytes) => (lane, tile, "f", bytes.drop(4)) }
    val metas = info match {
      case None => filters
      case Some(_) =>
        filters.union(loadBinary(s"$runDir/L*/*.*locs")
          .select(
            regexp_extract(col("path"), locsRe, 1).cast("int").as("lane"),
            regexp_extract(col("path"), locsRe, 2).cast("int").as("tile"),
            regexp_extract(col("path"), locsRe, 3).as("kind"),
            col("content"))
          .as[(Int, Int, String, Array[Byte])])
    }

    cycles.groupByKey { case (lane, tile, _, _, _) => (lane, tile) }
      .cogroup(metas.groupByKey { case (lane, tile, _, _) => (lane, tile) }) {
        case ((lane, tile), cyIt, mIt) =>
          val byCycle = cyIt.map { case (_, _, c, bytes, pf) =>
            c -> ((bytes, pf))
          }.toMap
          require(byCycle.size == rs.totalCycles,
            s"tile $lane/$tile has ${byCycle.size} cycles, expected ${rs.totalCycles}")
          val metaSeq = mIt.toSeq
          val passOpt = metaSeq.find(_._3 == "f").map(_._4)
          val coords: Option[Array[(Float, Float)]] = info.map { _ =>
            val raw = metaSeq.find(m => m._3 == "locs" || m._3 == "clocs")
            require(raw.isDefined,
              s"tile $lane/$tile: no .locs/.clocs file — metadata-driven " +
                "decode cannot synthesize read names without coordinates")
            if (raw.get._3 == "locs") RunMeta.readLocs(raw.get._4)
            else RunMeta.readClocs(raw.get._4)
          }
          val anyPfOnly = byCycle.valuesIterator.exists(_._2)
          // excludeNonPF CBCL stores only pass-filter clusters; restoring
          // full cluster order REQUIRES the lane filter — no filter file
          // is a loud error there, never a silent mis-indexed tile
          require(!anyPfOnly || passOpt.isDefined,
            s"tile $lane/$tile: CBCL excludeNonPF payload but no .filter " +
              "file — cannot restore cluster positions")
          val nClusters =
            passOpt.map(_.length).getOrElse(byCycle(1)._1.length)
          val pass = passOpt.getOrElse(Array.fill(nClusters)(1.toByte))
          coords.foreach(cs => require(cs.length == nClusters,
            s"tile $lane/$tile: ${cs.length} coordinates for $nClusters " +
              "clusters — run metadata inconsistent with BCL payloads"))
          val nPf = pass.count(_ != 0)
          val cols = (1 to rs.totalCycles).map { c =>
            val (bytes, pfOnly) = byCycle(c)
            if (!pfOnly) bytes
            else {
              // re-insert no-calls at filter-failed positions
              require(bytes.length == nPf,
                s"tile $lane/$tile cycle $c: ${bytes.length} stored " +
                  s"clusters, filter has $nPf pass-filter")
              val full = new Array[Byte](nClusters)
              var src = 0
              var i = 0
              while (i < nClusters) {
                if (pass(i) != 0) { full(i) = bytes(src); src += 1 }
                i += 1
              }
              full
            }
          }
          (0 until nClusters).iterator.map { i =>
            val sb1 = new StringBuilder; val qb1 = new StringBuilder
            val sbi = new StringBuilder
            val sb2 = new StringBuilder; val qb2 = new StringBuilder
            var c = 0
            while (c < rs.totalCycles) {
              val (base, qual) = decodeByte(cols(c)(i))
              if (c < rs.r1) { sb1 += base; qb1 += qual }
              else if (c < rs.r1 + rs.index) sbi += base
              else { sb2 += base; qb2 += qual }
              c += 1
            }
            val id = coords match {
              case Some(cs) =>
                info.get.readName(lane, tile, cs(i)._1, cs(i)._2)
              case None => s"${lane}_${tile}_$i"
            }
            PrqRead(id, sample = null,
              sb1.result(), qb1.result(), sb2.result(), qb2.result(),
              sbi.result(), pass(i) != 0, lane, tile)
          }
      }
  }

  /** R3: drop clusters failing the chastity filter. */
  def applyFilter(reads: Dataset[PrqRead]): Dataset[PrqRead] =
    reads.filter(_.passFilter)
}
