package graft.genomics

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec

/** End-to-end genomics golden tests (SURVEY §5.2 #6): synthetic BCL fixture
  * → decode → chastity filter → demux (1-mismatch + Undetermined) → PRQ
  * partitioned gzip sink (no empty parts) → sample discovery → external
  * process map with a mock aligner, incl. fail-fast on nonzero exit.
  */
class GenomicsSpec extends SparkSpec {

  private val rs = ReadStructure(r1 = 4, index = 3, r2 = 4)

  /** Encode (base, qual) to a BCL byte; 'N' → 0. */
  private def enc(base: Char, q: Int): Byte =
    if (base == 'N') 0
    else (("ACGT".indexOf(base)) | (q << 2)).toByte

  /** Clusters for tile 1101: (r1, barcode, r2, pass). */
  private val t1101 = Seq(
    ("ACGT", "AAA", "TTTT", true),  // exact match sample1
    ("CCCC", "AAC", "GGGG", true),  // 1-mismatch of AAA → sample1
    ("GGGG", "CCC", "AAAA", true),  // exact match sample2
    ("TTTT", "GGG", "CCCC", true),  // no match → Undetermined
    ("AAAA", "AAA", "TTTT", false)  // fails chastity filter
  )
  private val t1102 = Seq(
    ("ACAC", "CCC", "TGTG", true),  // sample2
    ("GTGT", "CCA", "CACA", true)   // 1-mismatch of CCC → sample2
  )
  private val sheet = Seq("sample1" -> "AAA", "sample2" -> "CCC")

  private def writeTile(dir: Path, lane: Int, tile: Int,
                        clusters: Seq[(String, String, String, Boolean)]): Unit = {
    val n = clusters.size
    val header = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    val laneDir = dir.resolve(f"L$lane%03d")
    for (c <- 1 to rs.totalCycles) {
      val cdir = laneDir.resolve(s"C$c.1")
      Files.createDirectories(cdir)
      val bytes = clusters.map { case (r1, bc, r2, _) =>
        val all = r1 + bc + r2
        enc(all(c - 1), 30 + (c % 10))
      }.toArray
      Files.write(cdir.resolve(f"s_${lane}_$tile.bcl"), header ++ bytes)
    }
    val fbytes = clusters.map(c => if (c._4) 1.toByte else 0.toByte).toArray
    Files.write(laneDir.resolve(f"s_${lane}_$tile.filter"), header ++ fbytes)
  }

  private lazy val runDir: String = {
    val dir = Files.createTempDirectory("graft_bcl")
    writeTile(dir, 1, 1101, t1101)
    writeTile(dir, 1, 1102, t1102)
    dir.toString
  }

  test("BCL decode transposes cycle-major bytes into read pairs") {
    val reads = Bcl.decodeRun(spark, runDir, rs).collect()
    assert(reads.length == 7)
    val r0 = reads.find(_.id == "1_1101_0").get
    assert(r0.seq1 == "ACGT" && r0.barcode == "AAA" && r0.seq2 == "TTTT")
    assert(r0.qual1.forall(q => q - 33 >= 30))
    assert(r0.passFilter)
    val r4 = reads.find(_.id == "1_1101_4").get
    assert(!r4.passFilter)
  }

  test("bgzf BCL tiles decode byte-identical to flat tiles") {
    // the SAME synthetic run written twice: flat HiSeq .bcl and NovaSeq
    // blocked .bcl.bgzf (16-byte blocks → multi-block walk exercised).
    // Every decoded field must be identical — bgzf is transparent.
    val flat = SyntheticRun.writeRun(
      Files.createTempDirectory("graft_bcl_flat"), perTile = 24)
    val bgzf = SyntheticRun.writeRun(
      Files.createTempDirectory("graft_bcl_bgzf"), perTile = 24, bgzf = true)
    val a = Bcl.decodeRun(spark, flat.toString, SyntheticRun.rs)
      .collect().sortBy(_.id).map(_.toString)
    val b = Bcl.decodeRun(spark, bgzf.toString, SyntheticRun.rs)
      .collect().sortBy(_.id).map(_.toString)
    assert(a.length === 48)
    assert(a.toSeq === b.toSeq)
  }

  test("bgzf codec: round-trip, EOF marker, loud corruption failures") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(100000)(rnd.nextInt(256).toByte)
    val packed = Bgzf.compress(data, blockSize = 4096)
    assert(Bgzf.isBgzf(packed))
    assert(Bgzf.decompress(packed).toSeq === data.toSeq)
    // ends with the standard EOF marker (htslib interop contract)
    assert(packed.takeRight(28).toSeq === Bgzf.EofBlock.toSeq)
    // plain gzip (no BC subfield) is NOT bgzf
    val plain = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(data, 0, 100); gz.close(); bos.toByteArray
    }
    assert(!Bgzf.isBgzf(plain))
    // a flipped payload byte must fail the CRC check loudly, not decode
    val corrupt = packed.clone()
    corrupt(30) = (corrupt(30) ^ 0x41).toByte
    val e = intercept[Exception](Bgzf.decompress(corrupt))
    assert(e.getMessage.contains("bgzf"), e.getMessage)
    // truncation mid-block fails loudly
    intercept[Exception](Bgzf.decompress(packed.dropRight(40)))
    // empty payload round-trips
    assert(Bgzf.decompress(Bgzf.compress(Array.empty[Byte])).isEmpty)
  }

  // NovaSeq Q-bin table: bin 0 = no-call, bins 1..3 map to Q12/Q26/Q34
  private val cbclBins = IndexedSeq((0, 0), (1, 12), (2, 26), (3, 34))

  /** Flat-BCL-convention tile bytes whose quals sit ON the bin values —
    * CBCL is lossy by design, so exact round-trips use bin-resident
    * fixtures. Index 0 and every 7th cluster is a no-call. */
  private def binnedTile(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n) { i =>
      if (i % 7 == 0) 0.toByte
      else {
        val base = (i + seed) % 4
        val q = Seq(12, 26, 34)((i * 31 + seed) % 3)
        (base | (q << 2)).toByte
      }
    }

  test("CBCL codec: header, exact round-trip, lossy binning snap") {
    val t1 = binnedTile(1, 40); val t2 = binnedTile(2, 33)
    val f1 = Array.fill(40)(1.toByte); val f2 = Array.fill(33)(1.toByte)
    val file = Cbcl.write(Seq((1101, t1, f1), (1102, t2, f2)), cbclBins,
      excludeNonPF = false)
    val h = Cbcl.parseHeader(file)
    assert(h.version === 1 && h.bitsPerBasecall === 2 && h.bitsPerQscore === 2)
    assert(h.bins === cbclBins && !h.excludeNonPF)
    assert(h.tiles.map(t => (t.tileNum, t.nClusters)) ===
      IndexedSeq((1101, 40), (1102, 33)))
    val out = Cbcl.decode(file)
    assert(out.map(_._1) === Seq(1101, 1102))
    assert(out.forall(!_._3))
    assert(out(0)._2.toSeq === t1.toSeq, "bin-resident quals round-trip exactly")
    assert(out(1)._2.toSeq === t2.toSeq)
    // off-bin quals SNAP DOWN to their bin representative (Q30 → Q26)
    val lossy = Array(((2 | (30 << 2)) & 0xff).toByte)
    val snapped = Cbcl.decode(Cbcl.write(
      Seq((1, lossy, Array(1.toByte))), cbclBins, excludeNonPF = false))
    assert((snapped.head._2(0) >> 2) === 26 && (snapped.head._2(0) & 3) === 2)
    // the probe-only header view stays consistent
    assert(Bgzf.probeCbclHeader(file).nTiles === 2L)
  }

  test("CBCL excludeNonPF: PF-only payload expands against the filter") {
    val n = 24
    val tile = binnedTile(3, n)
    val filter = Array.tabulate(n)(i => if (i % 5 == 4) 0.toByte else 1.toByte)
    val file = Cbcl.write(Seq((1101, tile, filter)), cbclBins,
      excludeNonPF = true)
    val Seq((1101, compact, pfOnly)) = Cbcl.decode(file): @unchecked
    assert(pfOnly)
    assert(compact.length === filter.count(_ != 0))
    // expansion contract (what decodeRun's transpose does): no-call at
    // filter-failed positions, stored bytes at PF positions in order
    val expanded = new Array[Byte](n)
    var src = 0
    (0 until n).foreach { i =>
      if (filter(i) != 0) { expanded(i) = compact(src); src += 1 }
    }
    val masked = tile.zipWithIndex.map { case (b, i) =>
      if (filter(i) != 0) b else 0.toByte }
    assert(expanded.toSeq === masked.toSeq)
  }

  test("CBCL run decodes through decodeRun identical to its flat twin") {
    // same reads, two containers: (a) flat .bcl tiles with non-PF
    // clusters zeroed (what CBCL cannot carry), (b) one .cbcl per cycle
    // holding both tiles with excludeNonPF=1 + the lane filter
    val rs2 = SyntheticRun.rs
    val nPerTile = 20
    def tileData(tileSeed: Int): (IndexedSeq[Array[Byte]], Array[Byte]) = {
      val filter = Array.tabulate(nPerTile)(i =>
        if ((i + tileSeed) % 6 == 5) 0.toByte else 1.toByte)
      val cols = (1 to rs2.totalCycles).map { c =>
        binnedTile(tileSeed * 100 + c, nPerTile).zipWithIndex.map {
          case (b, i) => if (filter(i) != 0) b else 0.toByte }
      }
      (cols, filter)
    }
    val (cols1, filt1) = tileData(1)
    val (cols2, filt2) = tileData(2)
    def header(n: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    // (a) flat twin
    val flatDir = Files.createTempDirectory("graft_cbcl_flat")
    val lane = flatDir.resolve("L001")
    for (c <- 1 to rs2.totalCycles) {
      val cdir = lane.resolve(s"C$c.1"); Files.createDirectories(cdir)
      Files.write(cdir.resolve(s"s_1_1101.bcl"), header(nPerTile) ++ cols1(c - 1))
      Files.write(cdir.resolve(s"s_1_1102.bcl"), header(nPerTile) ++ cols2(c - 1))
    }
    Files.write(lane.resolve("s_1_1101.filter"), header(nPerTile) ++ filt1)
    Files.write(lane.resolve("s_1_1102.filter"), header(nPerTile) ++ filt2)
    // (b) CBCL run
    val cbclDir = Files.createTempDirectory("graft_cbcl_run")
    val lane2 = cbclDir.resolve("L001")
    for (c <- 1 to rs2.totalCycles) {
      val cdir = lane2.resolve(s"C$c.1"); Files.createDirectories(cdir)
      Files.write(cdir.resolve("L001_1.cbcl"),
        Cbcl.write(Seq((1101, cols1(c - 1), filt1), (1102, cols2(c - 1), filt2)),
          cbclBins, excludeNonPF = true))
    }
    Files.write(lane2.resolve("s_1_1101.filter"), header(nPerTile) ++ filt1)
    Files.write(lane2.resolve("s_1_1102.filter"), header(nPerTile) ++ filt2)
    val a = Bcl.decodeRun(spark, flatDir.toString, rs2)
      .collect().sortBy(_.id).map(_.toString)
    val b = Bcl.decodeRun(spark, cbclDir.toString, rs2)
      .collect().sortBy(_.id).map(_.toString)
    assert(a.length === 2 * nPerTile)
    assert(a.toSeq === b.toSeq)
    // missing filter with excludeNonPF payload fails LOUDLY
    Files.delete(lane2.resolve("s_1_1101.filter"))
    Files.delete(lane2.resolve("s_1_1102.filter"))
    val e = intercept[org.apache.spark.SparkException](
      Bcl.decodeRun(spark, cbclDir.toString, rs2).collect())
    assert(e.getMessage.contains("filter") ||
      Option(e.getCause).exists(_.getMessage.contains("filter")), e.getMessage)
  }

  test("chastity filter + demux assigns samples with 1-mismatch tolerance") {
    val reads = Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs))
    val demuxed = Demux.demux(reads, sheet).collect()
    val bySample = demuxed.groupBy(_.sample).view.mapValues(_.map(_.id).toSet).toMap
    assert(bySample("sample1") == Set("1_1101_0", "1_1101_1"))
    assert(bySample("sample2") == Set("1_1101_2", "1_1102_0", "1_1102_1"))
    assert(bySample(Demux.Undetermined) == Set("1_1101_3"))
  }

  test("ambiguous 1-mismatch variants fall to Undetermined") {
    val s = spark
    val dict = Demux.dictionary(s, Seq("s1" -> "AAA", "s2" -> "AAT"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // "AAT" is exact for s2; also 1-mismatch of "AAA" → must resolve to s2 (exact
    // wins is NOT implemented — ambiguity drops the variant, and the exact
    // entry of s2 survives as its own variant only if unambiguous)
    assert(!dict.contains("AAC") || dict("AAC") != "s1" || true) // AAC ambiguous (AAA±1, AAT±1) → dropped
    assert(!dict.contains("AAC"))
    assert(dict("AGA") == "s1") // unambiguous 1-mismatch of AAA
  }

  test("partitioned gzip PRQ sink: layout, content, no empty parts") {
    val s = spark
    val out = Files.createTempDirectory("graft_prq").toString
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet))
    Codecs.writePartitionedGzip(reads, out, numTasks = 2)

    // layout: out/sample=<s>/part-*.txt.gz, all parts non-trivial
    val parts = Files.walk(Paths.get(out)).iterator().asInstanceOf[java.util.Iterator[Path]]
    var partFiles = List.empty[Path]
    while (parts.hasNext) {
      val p = parts.next()
      if (Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
        partFiles ::= p
    }
    assert(partFiles.nonEmpty)
    assert(partFiles.forall(_.toString.endsWith(".txt.gz")))
    assert(partFiles.forall(p => p.getParent.getFileName.toString.startsWith("sample=")))
    assert(partFiles.forall(p => Files.size(p) >= 30), "empty gzip part written")
    assert(Codecs.pruneSmallFiles(s, out) == 0, "sink produced prunable parts")

    // content round-trips
    val back = Codecs.readPrq(s, out).collect()
    assert(back.length == 5)
    val s1 = back.filter(_._1 == "sample1").map(_._2).sorted
    assert(s1.exists(_.startsWith("1_1101_0\tACGT\t")))
  }

  test("prq DataSource V2: scan parity with readPrq, pruning, sample column") {
    val s = spark
    val out = Files.createTempDirectory("graft_prq_v2").toString
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet))
    Codecs.writePartitionedGzip(reads, out, numTasks = 2)
    val v2 = s.read.format("prq").load(out)
    assert(v2.schema.fieldNames.toSeq ===
      Seq("sample", "id", "seq1", "qual1", "seq2", "qual2"))
    // row parity with the text+parse composition (same 5 reads)
    val viaText = Codecs.readPrq(s, out).collect()
      .map { case (sm, line) =>
        val f = Codecs.parsePrqLine(line); (sm, f._1, f._2, f._3, f._4, f._5) }
      .sorted.toSeq
    val viaV2 = v2.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5))).sorted.toSeq
    assert(viaV2 === viaText)
    assert(viaV2.length === 5)
    // column pruning reaches the scan: an id-only projection's ReadSchema
    // carries no seq/qual fields
    val pruned = v2.select("id")
    val scans = pruned.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(p => p.toString.contains("prq:") ||
      p.schema.fieldNames.sameElements(Array("id"))), scans.mkString("\n"))
    assert(pruned.collect().map(_.getString(0)).sorted.head.nonEmpty)
    // partition-value decoding: per-sample filters work
    assert(v2.where(org.apache.spark.sql.functions.col("sample") === "sample1").count() ===
      viaText.count(_._1 == "sample1"))
  }

  test("prq V2 WRITE: layout parity with the manual sink, clustered shuffle, overwrite") {
    val s = spark
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet))
    val df = reads.toDF().select("sample", "id", "seq1", "qual1", "seq2", "qual2")
    val out = Files.createTempDirectory("graft_prq_w").toString
    df.write.format("prq").mode("append").save(out)
    // layout: sample=<s>/part-*.txt.gz, no staging remnants
    val files = graft.sources.PrqFastqSource.listFiles(s, out)
    assert(files.nonEmpty)
    assert(files.forall(_._1.matches(".*sample=[^/]+/part-.*\\.txt\\.gz")),
      files.mkString(","))
    // content round-trips through the V2 reader, identical to the manual
    // sink's content for the same rows
    val manual = Files.createTempDirectory("graft_prq_m").toString
    Codecs.writePartitionedGzip(reads, manual)
    def rows(dir: String) = s.read.format("prq").load(dir).collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(out) === rows(manual))
    // append mode adds; overwrite (truncate) replaces
    df.write.format("prq").mode("append").save(out)
    assert(s.read.format("prq").load(out).count() === 2 * df.count())
    df.write.format("prq").mode("overwrite").save(out)
    assert(rows(out) === rows(manual))
    // the writer-requested distribution really clusters by sample: each
    // written file's sample dir is disjoint per (partition, task) writer —
    // with 2 samples and hash-clustering there is at most ONE part file
    // per sample unless both hash to one partition
    val bySample = graft.sources.PrqFastqSource.listFiles(s, out).groupBy(_._2)
    assert(bySample.keySet === Set("sample1", "sample2"))
    bySample.values.foreach(fs => assert(fs.size === 1, fs.toString))
  }

  test("RunInfo.xml parses structure, run identity, and rejects bad layouts") {
    val info = RunMeta.parseRunInfo(SyntheticRun.runInfoXml)
    assert(info.rs === SyntheticRun.rs)
    assert(info.instrument === "M00001" && info.runNumber === 7 &&
      info.flowcell === "GRAFTFC01")
    assert(info.readName(1, 1101, 2.5f, 0.0f) ===
      "M00001:7:GRAFTFC01:1:1101:1025:1000")
    // dual-index cycles sum into one block
    val dual = RunMeta.parseRunInfo(
      """<RunInfo><Run Number="2"><Flowcell>FC</Flowcell>
        |<Instrument>I</Instrument><Reads>
        |<Read Number="1" NumCycles="8" IsIndexedRead="N"/>
        |<Read Number="2" NumCycles="4" IsIndexedRead="Y"/>
        |<Read Number="3" NumCycles="4" IsIndexedRead="Y"/>
        |<Read Number="4" NumCycles="8" IsIndexedRead="N"/>
        |</Reads></Run></RunInfo>""".stripMargin)
    assert(dual.rs === ReadStructure(8, 8, 8))
    // index-first and interleaved layouts are loud errors
    intercept[IllegalArgumentException](RunMeta.parseRunInfo(
      """<RunInfo><Run Number="1"><Flowcell>F</Flowcell>
        |<Instrument>I</Instrument><Reads>
        |<Read Number="1" NumCycles="4" IsIndexedRead="Y"/>
        |<Read Number="2" NumCycles="8" IsIndexedRead="N"/>
        |</Reads></Run></RunInfo>""".stripMargin))
    intercept[IllegalArgumentException](RunMeta.parseRunInfo(
      """<RunInfo><Run Number="1"><Flowcell>F</Flowcell>
        |<Instrument>I</Instrument><Reads>
        |<Read Number="1" NumCycles="4" IsIndexedRead="N"/>
        |<Read Number="2" NumCycles="4" IsIndexedRead="Y"/>
        |<Read Number="3" NumCycles="4" IsIndexedRead="N"/>
        |<Read Number="4" NumCycles="4" IsIndexedRead="Y"/>
        |</Reads></Run></RunInfo>""".stripMargin))
    // out-of-order read numbers are a loud error
    intercept[IllegalArgumentException](RunMeta.parseRunInfo(
      """<RunInfo><Run Number="1"><Flowcell>F</Flowcell>
        |<Instrument>I</Instrument><Reads>
        |<Read Number="2" NumCycles="4" IsIndexedRead="N"/>
        |<Read Number="1" NumCycles="4" IsIndexedRead="N"/>
        |</Reads></Run></RunInfo>""".stripMargin))
    // missing manifest is loud
    val empty = Files.createTempDirectory("graft_norticulate")
    intercept[IllegalArgumentException](RunMeta.readRunInfo(empty.toString))
  }

  test("locs and clocs round-trip cluster coordinates exactly") {
    val cs = (0 until 57).map(SyntheticRun.coord)
    assert(RunMeta.readLocs(RunMeta.writeLocs(cs)).toSeq === cs)
    // 0.1-precision coords survive the lossy clocs binning exactly
    assert(RunMeta.readClocs(RunMeta.writeClocs(cs)).toSeq === cs)
    // multi-bin-row coords (y beyond one 25-unit row)
    val tall = Seq((3.0f, 1.0f), (12.5f, 26.0f), (30.0f, 52.5f))
    assert(RunMeta.readClocs(RunMeta.writeClocs(tall)).toSeq === tall)
    // truncated payloads are loud
    val bytes = RunMeta.writeClocs(cs)
    intercept[IllegalArgumentException](
      RunMeta.readClocs(bytes.dropRight(1)))
    intercept[IllegalArgumentException](
      RunMeta.readLocs(RunMeta.writeLocs(cs).dropRight(4)))
  }

  test("metadata-driven decode: coordinate read names, payload parity, loud gaps") {
    val s = spark
    val dir = Files.createTempDirectory("graft_runinfo_dec")
    SyntheticRun.writeRun(dir)
    val byMeta = Bcl.decodeRun(s, dir.toString).collect()
    val byRs = Bcl.decodeRun(s, dir.toString, SyntheticRun.rs).collect()
    // cluster-for-cluster parity: local index j of tile t carries the
    // SAME payload under both decodes, with the metadata path's id being
    // the coordinate-derived Illumina name for coord(j)
    val info = RunMeta.readRunInfo(dir.toString)
    val metaById = byMeta.map(r => r.id -> r).toMap
    val rsById = byRs.map(r => r.id -> r).toMap
    assert(metaById.size === byRs.length && rsById.size === byRs.length)
    for (tile <- Seq(1101, 1102); j <- 0 until 24) {
      val a = rsById(s"1_${tile}_$j")
      val (x, y) = SyntheticRun.coord(j)
      val b = metaById.getOrElse(info.readName(1, tile, x, y),
        fail(s"no read named ${info.readName(1, tile, x, y)}"))
      assert((a.seq1, a.qual1, a.seq2, a.qual2, a.barcode, a.passFilter) ===
        ((b.seq1, b.qual1, b.seq2, b.qual2, b.barcode, b.passFilter)),
        s"tile $tile cluster $j")
    }
    // name grammar golden: tile 1101 (locs arm) cluster 0 at (0,0) and
    // tile 1102 (clocs arm) cluster 1 at (3.0, 0.5)
    assert(byMeta.forall(_.id.startsWith("M00001:7:GRAFTFC01:1:")))
    assert(metaById.contains("M00001:7:GRAFTFC01:1:1101:1000:1000"))
    assert(metaById.contains("M00001:7:GRAFTFC01:1:1102:1030:1005"))
    // a tile without coordinates is a loud error on the metadata path
    // (and invisible to the explicit-structure path)
    Files.delete(dir.resolve("L001").resolve("s_1_1102.clocs"))
    val e = intercept[org.apache.spark.SparkException](
      Bcl.decodeRun(s, dir.toString).collect())
    assert(e.getMessage.contains("locs") ||
      Option(e.getCause).exists(_.getMessage.contains("locs")))
    assert(Bcl.decodeRun(s, dir.toString, SyntheticRun.rs).count() ===
      byRs.length.toLong)
    // a coordinate count that disagrees with the cluster count is loud
    Files.write(dir.resolve("L001").resolve("s_1_1102.locs"),
      RunMeta.writeLocs(Seq((1.0f, 1.0f))))
    val e2 = intercept[org.apache.spark.SparkException](
      Bcl.decodeRun(s, dir.toString).collect())
    assert(e2.getMessage.contains("coordinates") ||
      Option(e2.getCause).exists(_.getMessage.contains("coordinates")))
  }

  test("prq V2 truncate commit never publishes unverified staging files") {
    // A task attempt that dies without DataWriter.abort (executor JVM
    // kill) leaves partial files in staging that no commit message
    // vouches for. Drive StagedBatchWrite.commit directly with a staging
    // dir holding verified files, a zombie partial alongside them, and a
    // whole zombie-only sample dir — only the verified set may publish.
    val out = Files.createTempDirectory("graft_prq_zombie")
    val conf = new graft.sources.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val w = new graft.sources.PrqBatchWrite(out.toString,
      org.apache.spark.sql.types.StructType(Nil), conf, "q1", truncate = true)
    val staging = out.resolve(".spark-staging-q1")
    def put(rel: String): Unit = {
      val p = staging.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, "x".getBytes); ()
    }
    put("sample=a/part-ok.txt.gz")       // verified below
    put("sample=a/part-zombie.txt.gz")   // dead attempt, same sample
    put("sample=b/part-zombie2.txt.gz")  // dead attempt, zombie-only dir
    // pre-existing layout that truncate must replace
    val old = out.resolve("sample=c/part-old.txt.gz")
    Files.createDirectories(old.getParent)
    Files.write(old, "old".getBytes)
    w.commit(Array(graft.sources.PrqCommit(Seq("sample=a/part-ok.txt.gz"))))
    def exists(rel: String) = Files.exists(out.resolve(rel))
    assert(exists("sample=a/part-ok.txt.gz"))
    assert(!exists("sample=a/part-zombie.txt.gz"), "zombie file published")
    assert(!exists("sample=b"), "zombie-only sample dir published")
    assert(!exists("sample=c"), "truncate kept the prior layout")
    assert(!Files.exists(staging), "staging dir not cleaned")
  }

  test("fastq V2 WRITE: baseline grammar, positional mates, round-trip") {
    val s = spark
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet))
    val df = reads.toDF().select("sample", "id", "seq1", "qual1", "seq2", "qual2")
    val out = Files.createTempDirectory("graft_fastq_w").toString
    df.write.format("fastq").mode("append").save(out)
    // filenames follow the baseline grammar the reference scans
    // (reference baseline_workflow.py:109-117): parts[0] = sample,
    // parts[3] = R1|R2 under '_' splits
    val files = graft.sources.PrqFastqSource.listFiles(s, out).map(_._1)
    assert(files.nonEmpty)
    files.foreach { f =>
      val name = f.split('/').last
      assert(name.matches("[^_]+_S\\d+_L\\d{3}_R[12]_.+\\.fastq\\.gz"), name)
      val parts = name.split('_')
      assert(Set("sample1", "sample2").contains(parts(0)), name)
      assert(parts(3) == "R1" || parts(3) == "R2", name)
    }
    // every R1 file has its R2 twin and mates align POSITIONALLY —
    // record i of R1 and R2 carry the same read id (the grammar's
    // pairing contract; decoded straight from the gzip streams)
    def fastqIds(path: String): Seq[String] = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.util.zip.GZIPInputStream(
          Files.newInputStream(Paths.get(new java.net.URI(path)))),
        java.nio.charset.StandardCharsets.UTF_8))
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .grouped(4).map(g => { assert(g.head.startsWith("@")); g.head.drop(1) })
        .toList
      finally in.close()
    }
    val r1s = files.filter(_.split('/').last.split('_')(3) == "R1")
    assert(r1s.nonEmpty)
    r1s.foreach { r1 =>
      val r2 = r1.replaceAll("_R1_", "_R2_")
      assert(files.contains(r2), s"missing R2 twin for $r1")
      assert(fastqIds(r1) === fastqIds(r2), s"mate order differs: $r1")
    }
    // full round-trip through the V2 reader: pairs rebuilt by id match
    // the input pair set exactly (sample derived from parts[0])
    import org.apache.spark.sql.functions._
    val back = s.read.format("fastq").load(out)
      .withColumn("name", element_at(split(col("file"), "/"), -1))
      .withColumn("sample", element_at(split(col("name"), "_"), 1))
      .withColumn("mate", element_at(split(col("name"), "_"), 4))
    val pairs = back.where(col("mate") === "R1")
      .select(col("sample"), col("id"), col("seq").as("seq1"), col("qual").as("qual1"))
      .join(back.where(col("mate") === "R2")
        .select(col("id"), col("seq").as("seq2"), col("qual").as("qual2")), Seq("id"))
      .select("sample", "id", "seq1", "qual1", "seq2", "qual2")
    assert(pairs.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // overwrite truncates the prior flat layout
    df.write.format("fastq").mode("overwrite").save(out)
    assert(s.read.format("fastq").load(out).count() === 2 * df.count())
    // a grammar-breaking sample name fails loudly, never shifts parts[3]
    val bad = df.withColumn("sample", lit("bad_sample"))
    intercept[Exception] {
      bad.write.format("fastq").mode("append")
        .save(Files.createTempDirectory("graft_fastq_bad").toString)
    }
    // a leading-dot sample would write files the reader's hidden-file
    // convention silently skips — loud failure, not silent round-trip loss
    val hidden = df.withColumn("sample", lit(".ctrl"))
    intercept[Exception] {
      hidden.write.format("fastq").mode("append")
        .save(Files.createTempDirectory("graft_fastq_dot").toString)
    }
    // extra columns ride through (null-checks cover only consumed ones)
    val extra = df.withColumn("notes",
      org.apache.spark.sql.functions.lit(null).cast("string"))
    val out2 = Files.createTempDirectory("graft_fastq_extra").toString
    extra.write.format("fastq").mode("append").save(out2)
    assert(s.read.format("fastq").load(out2).count() === 2 * df.count())
    // READS with the write-only pair schema fail at PLAN time with a
    // clear message, not a per-record MatchError on executors
    val e = intercept[Exception] {
      s.read.format("fastq")
        .schema("sample string, id string, seq1 string, qual1 string, " +
          "seq2 string, qual2 string")
        .load(out).collect()
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq
      .flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("write-only")), e.toString)
  }

  test("prq V2 keeps trailing empty fields and rejects missing paths loudly") {
    val dir = Files.createTempDirectory("graft_prq_edge")
    // empty seq2/qual2 legitimately writes as trailing tabs — the reader
    // must keep the empty fields (split with limit -1), not reject the line
    Files.writeString(dir.resolve("part-0.txt"), "r1\tACGT\tIIII\t\t\n")
    val rows = spark.read.format("prq").load(dir.toString).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "r1" && rows(0).getString(2) === "ACGT")
    assert(rows(0).getString(4) === "" && rows(0).getString(5) === "")
    // a missing path is a loud error, matching the text source — never an
    // empty scan silently feeding stage 2 zero records
    intercept[Exception] {
      spark.read.format("prq").load(dir.resolve("nope").toString).collect()
    }
    intercept[Exception] {
      spark.read.format("fastq").load(dir.resolve("nope").toString).collect()
    }
  }

  test("fastq DataSource V2: 4-line chunker parity with parseFastq") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_fastq_v2")
    val rec = "@r1\nACGT\n+\nIIII\n@r2\nTTAA\n+\nJJJJ\n"
    Files.writeString(dir.resolve("a.fastq"), rec)
    Files.writeString(dir.resolve("b.fastq"), "@r3\nGGGG\n+\nKKKK\n")
    val v2 = s.read.format("fastq").load(dir.toString)
      .select("id", "seq", "qual").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(v2 === Seq(("r1", "ACGT", "IIII"), ("r2", "TTAA", "JJJJ"),
      ("r3", "GGGG", "KKKK")))
    // parity with the mapPartitions codec on the same lines
    val viaCodec = Codecs.parseFastq(
      s.read.textFile(dir.resolve("a.fastq").toString))
      .collect().sorted.toSeq
    assert(viaCodec === v2.take(2))
    // malformed record fails loudly
    Files.writeString(dir.resolve("bad.fastq"), "@r4\nACGT\n+\n")
    val e = intercept[Exception] {
      s.read.format("fastq").load(dir.resolve("bad.fastq").toString).count()
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq
      .flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("malformed FASTQ")), e.toString)
  }

  test("sample discovery excludes Undetermined and _-prefixed names") {
    val reads = Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet)
    assert(Demux.discoverSamples(reads) == Seq("sample1", "sample2"))
  }

  test("external-process map pipes PRQ through a mock aligner per sample") {
    val s = spark
    // mock aligner: tab→comma + ALN prefix (deterministic sed, R17 stand-in)
    val script = Files.createTempFile("mock_aligner", ".sh")
    Files.writeString(script, "#!/bin/sh\nsed 's/\\t/,/g; s/^/ALN /'\n")
    script.toFile.setExecutable(true)
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet))
    val out = ExternalProcessMap.pipeBySample(reads, Seq(script.toString)).collect()
    assert(out.length == 5)
    assert(out.forall(_._2.startsWith("ALN ")))
    assert(out.filter(_._1 == "sample2").length == 3)
    val line = out.find(_._2.contains("1_1101_0")).get._2
    assert(line == "ALN 1_1101_0,ACGT," + line.split(",")(2) + ",TTTT," + line.split(",")(4))
  }

  test("pipeline orchestration: stage1 -> concurrent per-sample align -> eager cleanup") {
    val s = spark
    val prq = Files.createTempDirectory("graft_pipe").toString
    val script = Files.createTempFile("mock_aln2", ".sh")
    Files.writeString(script, "#!/bin/sh\nsed 's/^/ALN /'\n")
    script.toFile.setExecutable(true)
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val res = Pipeline.run(s, runDir, rs, sheet, prq, Seq(script.toString),
      onSampleDone = done.add(_))
    assert(res.failed.isEmpty, res.failed.toString)
    assert(res.samples == Seq("sample1", "sample2"))
    assert(res.alignedCounts == Map("sample1" -> 2L, "sample2" -> 3L))
    assert(done.size == 2, "eager cleanup hook must fire per sample")
  }

  test("pipeline orchestration fails fast when one sample's aligner dies") {
    val s = spark
    val prq = Files.createTempDirectory("graft_pipe_f").toString
    val script = Files.createTempFile("mock_aln3", ".sh")
    // sample1's reads contain id prefix 1_1101_0 — die on that sample only
    Files.writeString(script,
      "#!/bin/sh\nwhile read l; do case \"$l\" in 1_1101_0*) exit 7;; *) echo \"ALN $l\";; esac; done\n")
    script.toFile.setExecutable(true)
    val res = Pipeline.run(s, runDir, rs, sheet, prq, Seq(script.toString))
    assert(res.failed.isDefined, "failure must propagate")
    assert(res.alignedCounts.size < 2, "failed sample must not report success")
  }

  test("stage-2 per-sample read scans exactly one sample partition") {
    val s = spark
    val prq = Files.createTempDirectory("graft_prq_prune").toString
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet))
    Codecs.writePartitionedGzip(reads, prq)
    assert(Codecs.listSamplePartitions(s, prq) == Seq("sample1", "sample2"))
    val one = Pipeline.readSamplePrq(s, prq, "sample1")
    // the V2 scan plans one InputPartition per file — all from this
    // sample's own partition dir
    val scan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val files = scan.inputPartitions
      .map(_.asInstanceOf[graft.sources.LineFilePartition].file)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("sample=sample1")),
      s"per-sample scan must touch only its own partition dir: $files")
    assert(one.count() == 2)
  }

  test("sample partition listing filters undetermined/_-prefixed and unescapes") {
    val dir = Files.createTempDirectory("graft_list")
    for (n <- Seq("sample=s1", "sample=Undetermined", "sample=_tmp",
                  "sample=a%20b", "_spark_metadata"))
      Files.createDirectories(dir.resolve(n))
    assert(Codecs.listSamplePartitions(spark, dir.toString) == Seq("a b", "s1"))
    // FS-agnostic: an explicit file:// URI must list identically (the Hadoop
    // FileSystem path — a java.nio listing would only ever see local paths)
    assert(Codecs.listSamplePartitions(spark, s"file://$dir") == Seq("a b", "s1"))
    assert(Codecs.listSamplePartitions(spark, dir.resolve("absent").toString).isEmpty)
    assert(Codecs.escapePartitionValue("a:b") == "a%3Ab")
  }

  private def writeFastqGz(dir: Path, name: String,
                           records: Seq[(String, String, String)], mate: Int): Unit = {
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve(name)))
    val sb = new StringBuilder
    records.foreach { case (id, seq, qual) =>
      sb.append('@').append(id).append('/').append(mate).append('\n')
        .append(seq).append("\n+\n").append(qual).append('\n')
    }
    out.write(sb.toString.getBytes("UTF-8")); out.close()
  }

  test("FASTQ baseline arm round-trips to the same PRQ as the BCL arm") {
    val s = spark
    // ground truth: the BCL arm's post-demux PRQ rows
    val bclReads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(s, runDir, rs)), sheet)).collect()
    // bcl2fastq-style mate files: sample1 in one L001 couple; sample2 SPLIT
    // across L001/L002 couples (exercises multi-file sorted positional
    // pairing, `baseline_workflow.py:137-138`), plus decoys discovery skips
    val dir = Files.createTempDirectory("graft_fastq")
    def writeSample(sample: String, lane: Int, rows: Seq[PrqRead]): Unit = {
      writeFastqGz(dir, f"${sample}_S1_L$lane%03d_R1_001.fastq.gz",
        rows.map(r => (r.id, r.seq1, r.qual1)), 1)
      writeFastqGz(dir, f"${sample}_S1_L$lane%03d_R2_001.fastq.gz",
        rows.map(r => (r.id, r.seq2, r.qual2)), 2)
    }
    val bySample = bclReads.groupBy(_.sample)
    writeSample("sample1", 1, bySample("sample1").toSeq.sortBy(_.id))
    val s2 = bySample("sample2").toSeq.sortBy(_.id)
    writeSample("sample2", 1, s2.take(1))
    writeSample("sample2", 2, s2.drop(1))
    writeFastqGz(dir, "Undetermined_S0_L001_R1_001.fastq.gz", Seq(("x", "A", "I")), 1)
    writeFastqGz(dir, "Undetermined_S0_L001_R2_001.fastq.gz", Seq(("x", "T", "I")), 2)
    Files.writeString(dir.resolve("notes.txt"), "not a fastq")

    val pairs = FastqBaseline.discoverMatePairs(s, dir.toString)
    assert(pairs.map(p => (p.sample, p.lane)) ==
      Seq(("sample1", 1), ("sample2", 1), ("sample2", 2)))

    val got = FastqBaseline.toPrq(s, dir.toString).collect()
    def key(r: PrqRead) = (r.sample, r.id, r.seq1, r.qual1, r.seq2, r.qual2)
    assert(got.map(key).toSet == bclReads.map(key).toSet,
      "baseline arm must reproduce the BCL arm's PRQ exactly")
    assert(got.forall(r => r.passFilter && r.barcode.isEmpty))
  }

  test("baseline sequential align loop: sorted order, eager per-sample release") {
    val s = spark
    // reuse the round-trip fixture layout: sample1 (2 reads), sample2 (3)
    val dir = Files.createTempDirectory("graft_fastq_seq")
    val bclReads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(s, runDir, rs)), sheet))
      .collect().groupBy(_.sample)
    for ((sample, rows) <- bclReads) {
      writeFastqGz(dir, s"${sample}_S1_L001_R1_001.fastq.gz",
        rows.toSeq.sortBy(_.id).map(r => (r.id, r.seq1, r.qual1)), 1)
      writeFastqGz(dir, s"${sample}_S1_L001_R2_001.fastq.gz",
        rows.toSeq.sortBy(_.id).map(r => (r.id, r.seq2, r.qual2)), 2)
    }
    val script = Files.createTempFile("mock_aln_seq", ".sh")
    Files.writeString(script, "#!/bin/sh\nsed 's/^/ALN /'\n")
    script.toFile.setExecutable(true)
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    val counts = FastqBaseline.runSequential(s, dir.toString,
      Seq(script.toString), onSampleDone = done += _)
    assert(counts == Map("sample1" -> 2L, "sample2" -> 3L))
    // strictly sequential in sorted sample order, cleanup hook per sample
    assert(done.toSeq == Seq("sample1", "sample2"))
  }

  test("FASTQ mate pairing fails loudly on mate-id mismatch") {
    val s = spark
    val dir = Files.createTempDirectory("graft_fastq_bad")
    writeFastqGz(dir, "sx_S1_L001_R1_001.fastq.gz",
      Seq(("a", "ACGT", "IIII"), ("b", "ACGT", "IIII")), 1)
    // R2 in swapped order: positional pairing must detect the id mismatch
    writeFastqGz(dir, "sx_S1_L001_R2_001.fastq.gz",
      Seq(("b", "TTTT", "IIII"), ("a", "TTTT", "IIII")), 2)
    val e = intercept[org.apache.spark.SparkException] {
      FastqBaseline.toPrq(s, dir.toString).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("mate id mismatch"), msg)
  }

  test("SAM dataset shape: schema, aligner round-trip, partitioned sink") {
    val s = spark
    import s.implicits._
    // mock aligner emitting minimal valid SAM from PRQ lines: a header line,
    // then one record per mate (flags 99/147, CIGAR 4M, NM tag)
    val script = Files.createTempFile("mock_sam", ".sh")
    Files.writeString(script,
      "#!/bin/sh\nprintf '@HD\\tVN:1.6\\tSO:unsorted\\n'\n" +
        "awk -F'\\t' '{ printf \"%s\\t99\\tchr1\\t%d\\t60\\t4M\\t=\\t%d\\t8\\t%s\\t%s\\tNM:i:0\\n\", " +
        "$1, NR*10, NR*10+4, $2, $3; " +
        "printf \"%s\\t147\\tchr1\\t%d\\t60\\t4M\\t=\\t%d\\t-8\\t%s\\t%s\\tNM:i:0\\n\", " +
        "$1, NR*10+4, NR*10, $4, $5 }'\n")
    script.toFile.setExecutable(true)
    val reads = Demux.dropUndetermined(
      Demux.demux(Bcl.applyFilter(Bcl.decodeRun(s, runDir, rs)), sheet))
    val sam = Sam.fromAligned(ExternalProcessMap.pipeBySample(reads, Seq(script.toString)))

    // SURVEY §1.4 D4 schema: 11 mandatory SAM fields (+ sample, tags)
    import org.apache.spark.sql.types._
    val expected = Seq("sample" -> StringType, "qname" -> StringType,
      "flag" -> IntegerType, "rname" -> StringType, "pos" -> LongType,
      "mapq" -> IntegerType, "cigar" -> StringType, "rnext" -> StringType,
      "pnext" -> LongType, "tlen" -> LongType, "seq" -> StringType,
      "qual" -> StringType, "tags" -> StringType)
    assert(sam.schema.fields.map(f => f.name -> f.dataType).toSeq == expected)

    val rows = sam.collect()
    assert(rows.length == 10, "2 mates x 5 demuxed reads") // header dropped
    assert(rows.forall(_.getAs[String]("cigar") == "4M"))
    assert(rows.forall(_.getAs[String]("tags") == "NM:i:0"))
    assert(rows.count(_.getAs[Int]("flag") == 99) == 5)
    val r0 = rows.find(r => r.getAs[String]("qname") == "1_1101_0" &&
      r.getAs[Int]("flag") == 99).get
    assert(r0.getAs[String]("seq") == "ACGT" && r0.getAs[Long]("pos") > 0)

    // parse/serialize round-trip is exact (tags preserved verbatim)
    val line = "q1\t99\tchr1\t100\t60\t4M\t=\t104\t8\tACGT\tIIII\tNM:i:0\tAS:i:4"
    assert(Sam.toLine(Sam.parseLine(line)) == line)
    val bare = "q1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII"
    assert(Sam.toLine(Sam.parseLine(bare)) == bare)

    // partitioned text sink round-trips through the same typed shape
    val out = Files.createTempDirectory("graft_sam").toString
    Sam.writePartitioned(sam, out)
    val back = Sam.readPartitioned(s, out)
    assert(back.schema == sam.schema)
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    assert(back.collect().map(key).toSet == rows.map(key).toSet)
    assert(Codecs.listSamplePartitions(s, out) == Seq("sample1", "sample2"))
  }

  test("SAM sink round-trips sample names Spark escapes in partition paths") {
    val s = spark
    import s.implicits._
    // ':' and '%' are Hive-escaped in partition directory names (sample=a%3A1)
    // — readPartitioned must unescape what writePartitioned's partitionBy wrote
    val names = Seq("sample:1", "100% cov", "plain")
    val line = "q1\t99\tchr1\t100\t60\t4M\t=\t104\t8\tACGT\tIIII\tNM:i:0"
    val sam = Sam.fromAligned(names.map(n => (n, line)).toDS())
    val out = Files.createTempDirectory("graft_sam_esc").toString
    Sam.writePartitioned(sam, out)
    val back = Sam.readPartitioned(s, out)
    assert(back.select("sample").as[String].collect().toSet == names.toSet,
      "escaped partition directories must unescape back to the sample name")
  }

  test("child that closes stdout but stops reading stdin fails, not hangs") {
    val script = Files.createTempFile("mock_wedge", ".sh")
    // closes stdout immediately, then sleeps holding stdin open UNREAD: the
    // writer blocks on the full pipe; the bounded join must kill + diagnose
    Files.writeString(script, "#!/bin/sh\nexec >&-\nsleep 30\n")
    script.toFile.setExecutable(true)
    val big = (1 to 200000).iterator.map(i => s"line_$i") // >> 64 KB pipe
    val e = intercept[RuntimeException] {
      ExternalProcessMap.pipe(big, Seq(script.toString), "test",
        writerJoinTimeoutMs = 500L).toList
    }
    assert(e.getMessage.contains("stopped reading stdin"), e.getMessage)
  }

  test("pipeBySample streams a large sample lazily through the process") {
    val s = spark
    import s.implicits._
    // 10^6 lines ≈ 40 MB of PRQ through `cat` — with eager materialization
    // removed, rows flow straight to the downstream count
    val n = 1000000
    val reads = s.range(n).map(i => PrqRead(s"id_$i", "big", "ACGT", "IIII",
      "TGCA", "IIII", "AAA", passFilter = true, 1, 1101))
    val out = ExternalProcessMap.pipeBySample(reads, Seq("cat"))
    assert(out.filter(_._1 == "big").count() == n)
  }

  test("chatty stderr neither deadlocks the pipe nor is lost on failure") {
    val s = spark
    import s.implicits._
    // 200 KB of stderr (>> the ~64 KB pipe buffer) then clean echo: without
    // a drain thread this wedges forever on the full stderr pipe
    val chatty = Files.createTempFile("mock_chatty", ".sh")
    Files.writeString(chatty,
      "#!/bin/sh\ni=0; while [ $i -lt 3200 ]; do echo " +
        "0123456789012345678901234567890123456789012345678901234567890123" +
        " >&2; i=$((i+1)); done\nsed 's/^/OK /'\n")
    chatty.toFile.setExecutable(true)
    val ds = s.createDataset(Seq("x", "y")).repartition(1)
    val ok = ExternalProcessMap.pipePartitions(ds, Seq(chatty.toString)).collect()
    assert(ok.toSet == Set("OK x", "OK y"))

    // failing command: its stderr tail must reach the task error message
    val loud = Files.createTempFile("mock_loud", ".sh")
    Files.writeString(loud,
      "#!/bin/sh\ncat > /dev/null\necho 'reference panic: bad index' >&2\nexit 9\n")
    loud.toFile.setExecutable(true)
    val e = intercept[org.apache.spark.SparkException] {
      ExternalProcessMap.pipePartitions(ds, Seq(loud.toString)).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("exited 9") && msg.contains("reference panic"),
      s"stderr tail missing from: $msg")
  }

  test("process exiting 0 after partial stdin is an error, not silent truncation") {
    val s = spark
    import s.implicits._
    val headLike = Files.createTempFile("mock_head", ".sh")
    Files.writeString(headLike, "#!/bin/sh\nhead -n 1\n")
    headLike.toFile.setExecutable(true)
    // enough lines that the writer is still writing when head exits
    val ds = s.createDataset((1 to 200000).map(i => s"line_$i")).repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      ExternalProcessMap.pipePartitions(ds, Seq(headLike.toString)).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated"), s"expected truncation error, got: $msg")
  }

  test("external-process map fails fast on nonzero exit (R11 contract)") {
    val s = spark
    import s.implicits._
    val script = Files.createTempFile("mock_fail", ".sh")
    Files.writeString(script, "#!/bin/sh\ncat > /dev/null\nexit 3\n")
    script.toFile.setExecutable(true)
    val ds = s.createDataset(Seq("a", "b"))
    val e = intercept[org.apache.spark.SparkException] {
      ExternalProcessMap.pipePartitions(ds.repartition(1), Seq(script.toString)).collect()
    }
    assert(e.getMessage.contains("exited 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited 3")))
  }
}
