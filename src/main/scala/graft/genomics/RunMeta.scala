package graft.genomics

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Run-level metadata of an Illumina run folder (SURVEY §2A R1's input
  * contract): `RunInfo.xml` (instrument / run number / flowcell + the
  * read-cycle layout the caller previously had to hand-feed as
  * [[ReadStructure]]) and per-tile cluster coordinates (`.locs` /
  * `.clocs`), which turn positional cluster indices into real Illumina
  * read names `instrument:run:flowcell:lane:tile:x:y`. The reference's
  * Flink job reads exactly these from the run dir — `workflow.py:251`
  * passes only `root=` and the reader derives the rest.
  *
  * Both binary formats are public (Illumina specs; Picard's
  * LocsFileReader/ClocsFileReader are the de-facto documentation):
  *
  *  - `.locs`: 12-byte header (u32 = 1, f32 = 1.0, u32 cluster count),
  *    then one (f32 x, f32 y) pair per cluster, all little-endian.
  *  - `.clocs`: u8 version (1), u32 bin count; the tile image is tiled
  *    into 25×25-unit bins, 82 bins per row (ceil(2048 / 25)), walked
  *    row-major; each bin holds u8 cluster count then (u8 dx, u8 dy)
  *    pairs in 0.1-unit offsets from the bin origin.
  *
  * Name coordinates follow the bcl2fastq convention:
  * `round(10 * f + 1000)`.
  */
object RunMeta {

  /** Parsed RunInfo.xml. `rs` is the derived [[ReadStructure]]. */
  final case class RunInfo(instrument: String, runNumber: Int,
                           flowcell: String, rs: ReadStructure) {
    /** Illumina read-name prefix for a cluster of (lane, tile) at
      * float coords (x, y). */
    def readName(lane: Int, tile: Int, x: Float, y: Float): String =
      s"$instrument:$runNumber:$flowcell:$lane:$tile:" +
        s"${math.round(10 * x + 1000)}:${math.round(10 * y + 1000)}"
  }

  /** Parse a RunInfo.xml document. Loud on anything the engine cannot
    * represent: missing fields, out-of-order read numbers, or a read
    * layout other than template reads, one contiguous index block, then
    * template reads (the paired-end single/dual-index family
    * [[ReadStructure]] models — dual-index cycles sum into one block). */
  def parseRunInfo(xml: String): RunInfo = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(
        xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    def one(tag: String): org.w3c.dom.Element = {
      val ns = doc.getElementsByTagName(tag)
      require(ns.getLength == 1, s"RunInfo.xml: expected one <$tag>, " +
        s"found ${ns.getLength}")
      ns.item(0).asInstanceOf[org.w3c.dom.Element]
    }
    val run = one("Run")
    val instrument = one("Instrument").getTextContent.trim
    val flowcell = one("Flowcell").getTextContent.trim
    require(instrument.nonEmpty && flowcell.nonEmpty,
      "RunInfo.xml: empty <Instrument> or <Flowcell>")
    val runNumber = run.getAttribute("Number").trim.toInt
    val readNodes = one("Reads").getElementsByTagName("Read")
    require(readNodes.getLength >= 1, "RunInfo.xml: no <Read> entries")
    val reads = (0 until readNodes.getLength).map { i =>
      val e = readNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val num = e.getAttribute("Number").trim.toInt
      val cycles = e.getAttribute("NumCycles").trim.toInt
      val indexed = e.getAttribute("IsIndexedRead").trim.equalsIgnoreCase("Y")
      require(cycles > 0, s"RunInfo.xml: read $num has NumCycles=$cycles")
      (num, cycles, indexed)
    }
    require(reads.map(_._1) == (1 to reads.size),
      s"RunInfo.xml: read numbers not 1..${reads.size} in order: " +
        reads.map(_._1).mkString(","))
    // segment the flag sequence: template+ index* template* — anything
    // else (index-first, interleaved) is a loud error, not a guess
    val flags = reads.map(_._3)
    val firstIdx = flags.indexOf(true)
    val lastIdx = flags.lastIndexOf(true)
    val contiguous = firstIdx < 0 ||
      (firstIdx > 0 && (firstIdx to lastIdx).forall(flags(_)) &&
        (lastIdx + 1 until flags.size).forall(!flags(_)))
    require(contiguous,
      s"RunInfo.xml: unsupported read layout (indexed flags " +
        s"${flags.map(if (_) "Y" else "N").mkString(",")}) — expected " +
        "template reads, one contiguous index block, template reads")
    val r1 = reads.takeWhile(!_._3).map(_._2).sum
    val index = reads.filter(_._3).map(_._2).sum
    val r2 = reads.reverse.takeWhile(!_._3).map(_._2).sum
    val rs =
      if (firstIdx < 0) ReadStructure(reads.head._2,
        0, reads.drop(1).map(_._2).sum)
      else ReadStructure(r1, index, r2)
    RunInfo(instrument, runNumber, flowcell, rs)
  }

  /** Read `<runDir>/RunInfo.xml`; loud when absent — a run folder
    * without its manifest is a broken copy, never a silent default. */
  def readRunInfo(runDir: String): RunInfo = {
    val p = Paths.get(runDir, "RunInfo.xml")
    require(Files.exists(p),
      s"$runDir/RunInfo.xml not found — metadata-driven decode needs the " +
        "run manifest (pass a ReadStructure explicitly to skip it)")
    parseRunInfo(Files.readString(p))
  }

  // ---- .locs ------------------------------------------------------------

  def readLocs(bytes: Array[Byte]): Array[(Float, Float)] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, s"locs: ${bytes.length} bytes, need >= 12")
    val magic = bb.getInt()
    val ver = bb.getFloat()
    require(magic == 1 && math.abs(ver - 1.0f) < 1e-6,
      s"locs: bad header ($magic, $ver)")
    val n = bb.getInt()
    require(bytes.length == 12 + 8L * n,
      s"locs: $n clusters need ${12 + 8L * n} bytes, file has ${bytes.length}")
    Array.fill(n)((bb.getFloat(), bb.getFloat()))
  }

  def writeLocs(coords: Seq[(Float, Float)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * coords.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1).putFloat(1.0f).putInt(coords.size)
    coords.foreach { case (x, y) => bb.putFloat(x).putFloat(y) }
    bb.array()
  }

  // ---- .clocs -----------------------------------------------------------

  private val ClocsBlock = 25
  private val ClocsBinsPerRow = (2048 + ClocsBlock - 1) / ClocsBlock // 82

  /** Decode a .clocs payload to per-cluster coords in FILE order (the
    * order BCL columns index clusters by). Offsets are 0.1-unit bytes, so
    * coordinates snap to one decimal — lossy like the format itself. */
  def readClocs(bytes: Array[Byte]): Array[(Float, Float)] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val version = bb.get()
    require(version == 1, s"clocs: unsupported version $version")
    val nBins = bb.getInt()
    require(nBins >= 0, s"clocs: negative bin count $nBins")
    val out = Array.newBuilder[(Float, Float)]
    var bin = 0
    while (bin < nBins) {
      require(bb.remaining() >= 1, s"clocs: truncated at bin $bin/$nBins")
      val n = bb.get() & 0xff
      require(bb.remaining() >= 2 * n,
        s"clocs: bin $bin claims $n clusters, ${bb.remaining()} bytes left")
      val bx = (bin % ClocsBinsPerRow) * ClocsBlock
      val by = (bin / ClocsBinsPerRow) * ClocsBlock
      var i = 0
      while (i < n) {
        val dx = bb.get() & 0xff
        val dy = bb.get() & 0xff
        out += ((bx + dx / 10.0f, by + dy / 10.0f))
        i += 1
      }
      bin += 1
    }
    require(bb.remaining() == 0,
      s"clocs: ${bb.remaining()} trailing bytes after $nBins bins")
    out.result()
  }

  /** Encode coords (file order) as .clocs. Requires every coordinate to
    * fall inside its bin grid with 0.1 precision; clusters must arrive in
    * bin order (row-major), matching how instruments emit them. */
  def writeClocs(coords: Seq[(Float, Float)]): Array[Byte] = {
    def binOf(c: (Float, Float)): Int = {
      val bx = (c._1 / ClocsBlock).toInt
      val by = (c._2 / ClocsBlock).toInt
      require(bx < ClocsBinsPerRow, s"clocs: x=${c._1} beyond image width")
      by * ClocsBinsPerRow + bx
    }
    val bins = coords.map(binOf)
    require(bins.isEmpty || bins == bins.sorted,
      "clocs: clusters must be in row-major bin order")
    val nBins = if (bins.isEmpty) 0 else bins.max + 1
    val grouped = coords.zip(bins).groupBy(_._2)
    val out = new java.io.ByteArrayOutputStream()
    val header = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    header.put(1.toByte).putInt(nBins)
    out.write(header.array())
    var bin = 0
    while (bin < nBins) {
      val cs = grouped.getOrElse(bin, Seq.empty)
      require(cs.size <= 255, s"clocs: bin $bin holds ${cs.size} > 255")
      out.write(cs.size)
      val bx = (bin % ClocsBinsPerRow) * ClocsBlock
      val by = (bin / ClocsBinsPerRow) * ClocsBlock
      cs.foreach { case ((x, y), _) =>
        val dx = math.round((x - bx) * 10)
        val dy = math.round((y - by) * 10)
        require(dx >= 0 && dx <= 255 && dy >= 0 && dy <= 255,
          s"clocs: offset ($dx,$dy) for ($x,$y) not byte-encodable")
        out.write(dx)
        out.write(dy)
      }
      bin += 1
    }
    out.toByteArray
  }
}
