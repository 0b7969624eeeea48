package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Properties for the curation family: planted-fixture semantics for
  * boilerplate stripping / chunking / diffing, an integer-exactness
  * invariant for systematic PPS sampling, local-recompute parity for OOV,
  * and the three Bloom guarantees (no false negatives, empirical FP
  * bound, partitioning invariance). */
class CurationOpsSpec extends SparkSpec {

  private def docsDf(rows: (Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")))
  }

  private val footer = (1 to 8).map(i => s"foot$i").mkString(" ")

  test("boilerplateRemove drops cross-doc segments, keeps unique bodies") {
    // three docs of source A share an 8-token footer; doc 4 (source B) has
    // the same footer but is ALONE in its source — per-source scoping must
    // keep it. doc 3 is footer-only and must survive as an empty husk.
    val docs = docsDf(
      (1L, s"u1a u1b u1c u1d u1e u1f u1g u1h $footer", "A"),
      (2L, s"u2a u2b u2c u2d u2e u2f u2g u2h $footer", "A"),
      (3L, footer, "A"),
      (4L, s"u4a u4b u4c u4d u4e u4f u4g u4h $footer", "B"))
    val out = CurationOps.boilerplateRemove(docs, k = 8, minFrac = 0.05,
        minDocs = 2)
      .orderBy(col("doc_id"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L) == ((2L, 1L, "u1a u1b u1c u1d u1e u1f u1g u1h")))
    assert(byId(2L) == ((2L, 1L, "u2a u2b u2c u2d u2e u2f u2g u2h")))
    assert(byId(3L) == ((1L, 1L, ""))) // footer-only doc -> empty husk
    // source B's lone footer is NOT boilerplate there
    assert(byId(4L) == ((2L, 0L, s"u4a u4b u4c u4d u4e u4f u4g u4h $footer")))
  }

  test("boilerplateRemove: in-doc repetition cannot self-promote") {
    // one spammy doc repeats a segment 5 times; df counts DISTINCT docs,
    // so nothing is boilerplate and the doc survives whole
    val seg = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = docsDf((1L, Seq.fill(5)(seg).mkString(" "), "A"),
                      (2L, "other words entirely here now yes ok fine", "A"))
    val out = CurationOps.boilerplateRemove(docs, k = 8, minFrac = 0.05,
        minDocs = 2)
      .where(col("doc_id") === 1).collect()(0)
    assert(out.getLong(2) == 0L) // n_boiler
    assert(out.getString(3) == Seq.fill(5)(seg).mkString(" "))
  }

  test("chunkDocs: coverage, chunk count, stride reconstruction") {
    val n = 100
    val text = (1 to n).map(i => s"t$i").mkString(" ")
    val chunks = CurationOps.chunkDocs(docsDf((1L, text, "A")),
        size = 32, stride = 24)
      .orderBy(col("chunk")).collect()
    // ceil((100-32)/24)+1 = ceil(68/24)+1 = 3+1
    assert(chunks.length == 4)
    // chunk c starts at token (c-1)*24+1; last chunk reaches token n
    chunks.zipWithIndex.foreach { case (r, i) =>
      val toks = r.getString(3).split(" ")
      assert(toks.head == s"t${i * 24 + 1}")
      assert(r.getLong(2) == toks.length)
    }
    assert(chunks.last.getString(3).split(" ").last == s"t$n")
    // stripping the overlap (first size-stride tokens of chunks 2..) and
    // concatenating reconstructs the document exactly
    val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
      val toks = r.getString(3).split(" ").toSeq
      if (i == 0) toks else toks.drop(32 - 24 - (32 - r.getLong(2).toInt))
    }
    // simpler exact check: the set of (position, token) pairs covers 1..n
    val covered = chunks.zipWithIndex.flatMap { case (r, i) =>
      r.getString(3).split(" ").zipWithIndex.map {
        case (t, j) => (i * 24 + j + 1, t) }
    }.toMap
    assert(covered.size == n && (1 to n).forall(p => covered(p) == s"t$p"))
    assert(rebuilt.nonEmpty) // rebuilt used; coverage is the real invariant
  }

  test("chunkDocs: short doc yields one full-coverage chunk") {
    val out = CurationOps.chunkDocs(docsDf((1L, "a b c", "A")),
        size = 32, stride = 24).collect()
    assert(out.length == 1 && out(0).getLong(2) == 3L &&
      out(0).getString(3) == "a b c")
  }

  test("systematicSample: picks are exactly the grid multiples") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val grid = 3000L
    val out = CurationOps.systematicSample(docs, grid).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // local recompute over the doc_id-ordered weight axis
    val local = docs.select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    var expected = Map.empty[Long, (Long, Long)]
    local.foreach { case (id, w) =>
      val picks = (cum + w) / grid - cum / grid
      if (picks >= 1) expected += id -> (w, picks)
      cum += w
    }
    assert(out == expected)
    // total picks = floor(totalWeight / grid): intervals tile the axis
    assert(out.values.map(_._2).sum == cum / grid)
  }

  test("datasetDiff classifies all four statuses") {
    val old = docsDf((1L, "same text", "A"), (2L, "will change", "A"),
                     (3L, "will vanish", "A"))
    val nw = docsDf((1L, "same text", "A"), (2L, "has changed", "A"),
                    (4L, "brand new", "A"))
    val st = CurationOps.datasetDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
                     4L -> "added"))
  }

  test("oovRate matches a local recompute") {
    val docs = docsDf(
      (1L, "a a a b b c rare1", "A"),
      (2L, "a b c rare2 rare3", "A"),
      (3L, "a a b", "A"))
    // vocabSize=3 -> vocab = {a, b, c} (counts 6,4,3; tiebreak token asc)
    val out = CurationOps.oovRate(docs, vocabSize = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) == ((7L, 1L, 0.1429)))
    assert(out(2L) == ((5L, 2L, 0.4)))
    assert(out(3L) == ((3L, 0L, 0.0)))
  }

  // ---------------------------------------------------------------- Bloom

  test("bloom: no false negatives — every corpus doc tests positive") {
    val corpus = graft.core.Tables.documents(spark, sf001)
      .where(col("doc_id") < 300)
    val bits = CurationOps.bloomBuild(corpus, m = 1 << 16, k = 5)
    val (h1, h2) = CurationOps.bloomHashes(col("text"))
    val misses = corpus.where(
      !CurationOps.bloomMightContain(bits, 1 << 16, 5, h1, h2)).count()
    assert(misses == 0L)
  }

  test("bloom: empirical FP rate within 3x of the analytic bound") {
    val n = 300
    val corpus = graft.core.Tables.documents(spark, sf001)
      .where(col("doc_id") < n)
    val m = 1 << 12 // small filter so FPs are actually observable
    val k = 5
    val bits = CurationOps.bloomBuild(corpus, m, k)
    val probes = 20000
    val fresh = spark.range(probes)
      .select(concat(lit("graft-fresh-probe-"), col("id")).as("text"))
    val (h1, h2) = CurationOps.bloomHashes(col("text"))
    val fp = fresh.where(
      CurationOps.bloomMightContain(bits, m, k, h1, h2)).count()
    val bound = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp.toDouble / probes <= 3 * bound + 1e-9,
      s"fp=${fp.toDouble / probes} bound=$bound")
    assert(fp > 0, "with m=4096/n=300 some FPs are expected; 0 suggests " +
      "the probe arithmetic diverged between build and test")
  }

  test("bloom: bit array is invariant under partitioning") {
    val corpus = graft.core.Tables.documents(spark, sf001)
      .where(col("doc_id") < 300)
    val a = CurationOps.bloomBuild(corpus.repartition(1), m = 1 << 14, k = 5)
    val b = CurationOps.bloomBuild(corpus.repartition(7, col("doc_id")),
      m = 1 << 14, k = 5)
    assert(java.util.Arrays.equals(a, b))
  }

  test("bloomDedup drops every planted duplicate") {
    val corpus = graft.core.Tables.documents(spark, sf001)
      .where(col("doc_id") < 300)
    val planted = corpus.where(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 9000)
    val fresh = spark.range(100).select(
      (col("id") + 20000).as("doc_id"),
      concat(lit("definitely new text "), col("id")).as("text"),
      lit("en").as("lang"), lit("X").as("source"), lit(25L).as("n_chars"))
    val batch = planted.unionByName(fresh)
    val kept = CurationOps.bloomDedup(batch, corpus)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ >= 20000), "a planted duplicate survived — " +
      "Bloom false negative, impossible unless build/probe diverged")
    // the 100 fresh docs minus (rare) false positives survive
    assert(kept.size >= 95)
  }

  test("rrfFusion: bucketed ranks are dense permutations matching a window recompute") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val got = CorpusOps.rrfFusion(docs, Seq(
      "chars" -> col("n_chars").cast("double"),
      "id" -> (-col("doc_id")).cast("double")))
    val rows = got.select("doc_id", "rank_chars", "rank_id", "rrf").collect()
    val n = rows.length
    // dense permutations 1..n
    assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to n).toSeq)
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
    // -doc_id desc == doc_id asc: rank_id must equal doc_id's asc position
    val byId = rows.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
    assert(byId == (1L to n).toSeq)
    // window recompute of the chars rank (rounded, tie by doc_id)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("doc_id"))
    val want = docs.select(col("doc_id"),
        (floor(col("n_chars").cast("double") * 1e4 + lit(0.5)) / 1e4).as("v"))
      .withColumn("r", row_number().over(w).cast("long"))
      .select("doc_id", "r").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == want(r.getLong(0)),
      s"doc ${r.getLong(0)} bucketed rank diverges from the window"))
  }

  test("weightedSample: heavy rows dominate, exact k, deterministic, salt-sensitive") {
    val s = spark
    import s.implicits._
    // one row with 10000× the weight of 200 others
    val docs = ((1L to 200L).map(i => (i, 10L)) :+ (999L, 100000L))
      .toDF("doc_id", "n_chars")
    def sample(salt: String) = CurationOps
      .weightedSample(docs, col("n_chars"), k = 20, salt = salt)
      .select("doc_id").as[Long].collect().toSet
    val a = sample("aes")
    assert(a.size == 20)
    assert(a.contains(999L), "the 10000x-weight row missed a k=20 sample")
    assert(sample("aes") == a, "not deterministic for a fixed salt")
    assert(sample("other") != a, "salt does not permute the draw")
    // inclusion frequency over many salts tracks weight: the heavy row is
    // in essentially every sample, any fixed light row in few
    val salts = (1 to 30).map(i => s"s$i")
    val heavy = salts.count(s => sample(s).contains(999L))
    val light = salts.count(s => sample(s).contains(7L))
    assert(heavy >= 28 && light <= 10, s"heavy=$heavy light=$light")
  }

  test("intraDocDedup drops repeats within a doc but never across docs") {
    val s = spark
    import s.implicits._
    val segs = Seq(
      // doc 1: "a b" repeats at pos 1 and 3 → pos 3 dropped
      (1L, 1, "a b"), (1L, 2, "c d"), (1L, 3, "a b"),
      // doc 2: same segment "a b" — unaffected by doc 1's occurrence
      (2L, 1, "a b"), (2L, 2, "e f")
    ).toDF("doc_id", "pos", "seg")
    val got = CorpusOps.intraDocDedup(segs)
      .select("doc_id", "n_seg", "n_dropped", "text")
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 3L, 1L, "a b c d")))
    assert(got(2L) == ((2L, 2L, 0L, "a b e f")))
  }

  test("curriculumInterleave equals the plain-window recompute at any bucket count") {
    val docs = graft.core.Tables.documents(spark, sf001)
    def key(df: DataFrame) = df.select("position", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val plain = {
      // reference: single windows (test-only; the op never does this)
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
      val w2 = org.apache.spark.sql.expressions.Window
        .orderBy(col("rank"), col("source"))
      docs.withColumn("rank", row_number().over(w1).cast("long"))
        .withColumn("position", row_number().over(w2).cast("long") - 1)
    }
    val want = key(plain)
    Seq(1, 7, 32).foreach { nb =>
      val got = key(CorpusOps.curriculumInterleave(docs, nBuckets = nb))
      assert(got == want, s"nBuckets=$nb diverges from the window reference")
    }
  }

  test("clusterRepresentatives: argmax quality, doc_id tiebreak, singletons self") {
    val s = spark
    import s.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 10L), (2L, 30L), (3L, 30L), (9L, 5L))
      .toDF("doc_id", "q")
    val got = Dedup.clusterRepresentatives(clusters, quality)
      .select("cluster_id", "rep_doc_id", "n_members", "best_q")
      .as[(Long, Long, Long, Long)].collect().toSet
    // q ties at 30 between docs 2 and 3 → lowest doc_id (2) wins
    assert(got == Set((1L, 2L, 3L, 30L), (9L, 9L, 1L, 5L)))
  }
}
