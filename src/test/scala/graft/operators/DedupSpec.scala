package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Recall/precision properties of the approximate dedup operators against
  * the exact token-Jaccard ground truth (SURVEY §5.2 property tests).
  */
class DedupSpec extends SparkSpec {

  test("prefixJaccard equals the uncapped inverted-index join (completeness)") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .where(col("doc_id") < 300)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "").distinct()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = key(Dedup.jaccardFromItems(toks, threshold = 0.3,
      dfCap = Int.MaxValue, joinKeys = Seq("token")))
    val pp = key(Dedup.prefixJaccard(toks, threshold = 0.3))
    assert(pp == full && pp.nonEmpty,
      s"prefix filtering lost/invented pairs: |full|=${full.size} |pp|=${pp.size}")
  }

  test("prefixJaccard generates strictly fewer candidates than the full index") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .where(col("doc_id") < 300)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "").distinct()
    // full index candidate volume: Σ df² over all tokens; prefix volume:
    // recompute the operator's own prefix and measure its Σ df²
    val s = spark
    import s.implicits._
    val full = toks.groupBy("token").count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    val dfT = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val prefixToks = toks.join(dfT, "token")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("token")))).as("st"))
      .select(col("doc_id"), transform(col("st"),
        x => x.getField("token")).as("toks"))
      .withColumn("p", (size(col("toks")) -
        ceil(size(col("toks")) * 0.3) + 1).cast("int"))
      .select(col("doc_id"), explode(slice(col("toks"), lit(1), col("p")))
        .as("token"))
    val pref = prefixToks.groupBy("token").count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    assert(pref < full, s"prefix candidates $pref not below full $full")
  }

  private def docs = Tables.documents(spark, sf0001)

  test("exact dedup keeps one row per normalized text") {
    val d = docs
    val total = Dedup.exact(d).agg(sum(col("n_copies"))).head().getLong(0)
    assert(total == d.count(), "dedup groups must partition the input")
  }

  test("minhash LSH finds high-Jaccard pairs (recall on shingle ground truth)") {
    val s = spark
    // ground truth: exact Jaccard over the SAME shingle sets the LSH hashes
    val sh = Dedup.shingles(docs, w = 3)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val truth = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
      .join(cnt.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(cnt.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", col("c").cast("double") / (col("n1") + col("n2") - col("c")))
      .where(col("jac") >= 0.6)
      .select("d1", "d2")
    val truthPairs = truth.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = Dedup.minhashLsh(docs, w = 3, k = 64, bands = 16, threshold = 0.35)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    if (truthPairs.nonEmpty) {
      val recall = truthPairs.count(found).toDouble / truthPairs.size
      // 16 bands × 4 rows: P(detect | j=0.6) = 1-(1-0.6^4)^16 ≈ 0.91 per pair
      assert(recall >= 0.7, s"recall=$recall over ${truthPairs.size} true pairs")
    } else {
      // no near-dup pairs in the fixture — LSH must then report few pairs too
      assert(found.size < 50, s"LSH reported ${found.size} pairs but truth is empty")
    }
  }

  test("simhash distance 0 for identical docs, pairs are symmetric-free") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words nothing shared here at all now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, maxDist = 3)
      .select("d1", "d2", "dist").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getInt(2) == 0)
  }

  /** Corpus + planted near-duplicates: exact copies (hamming 0 by
    * construction) and one-token edits of the first few documents, so the
    * shipped maxDist=3 bound always has true pairs to find. */
  private def docsWithPlantedDups = {
    val s = spark
    import s.implicits._
    val planted = docs.where(col("doc_id") < 5)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        Seq((id + 100000L, text),                    // exact copy: dist 0
            (id + 200000L, text + " zzyzx"))         // 1-token edit: dist small
      }
    docs.select(col("doc_id"), col("text"))
      .union(planted.toSeq.toDF("doc_id", "text"))
  }

  private def bruteForcePairs(d: org.apache.spark.sql.DataFrame,
                              maxDist: Int): Set[(Long, Long)] = {
    val hashes = Dedup.simhash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (for {
      i <- hashes.indices.iterator; j <- (i + 1) until hashes.length
      (id1, h1) = hashes(i); (id2, h2) = hashes(j)
      if java.lang.Long.bitCount(h1 ^ h2) <= maxDist
    } yield if (id1 < id2) (id1, id2) else (id2, id1)).toSet
  }

  test("native simhash64 matches the reference computation bit-for-bit") {
    val s = spark
    import s.implicits._
    // independent reimplementation of the declared semantics: per-token
    // mix64(String.hashCode) votes ±1 per bit, sign bits pack the hash —
    // pins the native expression to what the historical UDF computed
    def ref(text: String): Long = {
      val acc = new Array[Int](64)
      text.split(" ").foreach { t =>
        val h = graft.functions.Sketches.mix64(t.hashCode.toLong)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      (0 until 64).foldLeft(0L)((o, i) => if (acc(i) > 0) o | (1L << i) else o)
    }
    val texts = Seq("the quick brown fox", "a", "", "the the the",
      "päö ü 漢字 mixed-unicode x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"simhash mismatch for '$t'")
    }
  }

  test("simhash blocking is candidate-complete at the shipped bound (maxDist=3)") {
    val d = docsWithPlantedDups
    val truth = bruteForcePairs(d, maxDist = 3)
    val found = Dedup.simhashPairs(d, maxDist = 3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "planted duplicates must yield near pairs")
    assert(found == truth,
      s"blocking must find exactly the ${truth.size} true pairs " +
        s"(missed ${(truth -- found).size}, extra ${(found -- truth).size})")
  }

  test("simhash blocking is candidate-complete vs brute-force hamming (maxDist=8)") {
    val truth = bruteForcePairs(docs, maxDist = 8)
    val found = Dedup.simhashPairs(docs, maxDist = 8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth,
      s"blocking must find exactly the ${truth.size} true pairs " +
        s"(missed ${(truth -- found).size}, extra ${(found -- truth).size})")
    assert(truth.nonEmpty, "fixture must exercise at least one near pair")
  }

  test("simhash shipped bound keeps candidate fan-out sub-quadratic") {
    val d = docsWithPlantedDups
    val n = d.count()
    def bucketSizes(maxDist: Int): Array[Long] =
      Dedup.simhashChunks(d, maxDist)
        .groupBy(col("chunk_no"), col("chunk")).agg(count(lit(1)).as("sz"))
        .select("sz").collect().map(_.getLong(0))
    // the cost of the blocked self-join is the candidate-pair volume
    // Σ sz·(sz-1)/2 over (chunk_no, chunk) buckets
    def candidates(sizes: Array[Long]): Long = sizes.map(s => s * (s - 1) / 2).sum

    val shipped = bucketSizes(maxDist = 3)
    // 4×16-bit chunks: the key count scales WITH the corpus (4 keys/doc) and
    // the candidate volume stays O(n) even though this template-generated
    // corpus genuinely clusters (buckets up to ~26 docs are real near-dups)
    assert(shipped.length >= 2 * n,
      s"distinct join keys ${shipped.length} must scale with n=$n")
    assert(candidates(shipped) <= 8 * n,
      s"shipped-bound candidates ${candidates(shipped)} must be O(n), n=$n")
    // contrast: a maxDist=8 call blocks on 7-bit chunks (≤ 9×2^7 = 1152
    // possible keys) and its candidate volume degenerates toward n²/28 —
    // the scale-killer the shipped bound avoids
    val wide = bucketSizes(maxDist = 8)
    assert(wide.length <= 9 * 128, s"7-bit chunking cannot exceed 1152 keys")
    assert(candidates(wide) >= 20 * candidates(shipped),
      s"wide-bound candidates ${candidates(wide)} should dwarf shipped " +
        s"${candidates(shipped)} — if not, the fixture stopped demonstrating the trade")
  }

  test("embedding near-dup finds planted near-duplicate vectors (recall + precision)") {
    val s = spark
    import s.implicits._
    import graft.functions.Sketches.mix64
    val dim = 64
    def unit(seed: Long): Array[Double] = {
      val v = Array.tabulate(dim)(j => mix64(seed * 997 + j).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 200 random unit vectors (pairwise cos ~ N(0, 1/64) — far below 0.9),
    // plus 30 planted near-duplicates v' = normalize(v + 0.15·w): cos ≈ 0.989
    val base = (0 until 200).map(i => i.toLong -> unit(i))
    val planted = (0 until 30).map { i =>
      val (id, v) = base(i)
      val w = unit(10000 + i)
      val mixed = v.zip(w).map { case (a, b) => a + 0.15 * b }
      (id + 1000L) -> mixed
    }
    val all = (base ++ planted).map { case (id, v) => (id, v.map(_.toFloat)) }
    val df = all.toDF("vec_id", "embedding")

    // brute-force ground truth with the operator's own arithmetic (double
    // accumulation over float components, round-half-up to 4dp, >= 0.9)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val truth = (for {
      i <- all.indices.iterator; j <- (i + 1) until all.length
      if r4(cos(all(i)._2, all(j)._2)) >= 0.9
    } yield {
      val (x, y) = (all(i)._1, all(j)._1)
      if (x < y) (x, y) else (y, x)
    }).toSet
    assert(truth.size >= 25, s"fixture must plant near-dup pairs, got ${truth.size}")

    val found = Dedup.embeddingNearDup(df, threshold = 0.9, dim = dim,
        nPlanes = 8, tables = 4)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact re-scoring inside buckets ⇒ every reported pair is a true pair
    assert(found.subsetOf(truth),
      s"precision must be 1.0 — extra pairs: ${found -- truth}")
    // analytic per-pair recall at cos≈0.989 with 8 planes × 4 tables:
    // p = (1-θ/π)^8 ≈ 0.68 per table ⇒ 1-(1-p)^4 ≈ 0.99; assert with slack
    val recall = truth.count(found).toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall over ${truth.size} planted pairs")
  }

  test("SemDeDup drops exactly the within-cluster near-duplicates") {
    val s = spark
    import s.implicits._
    import graft.functions.Sketches.mix64
    val dim = 64
    def unit(seed: Long): Array[Double] = {
      val v = Array.tabulate(dim)(j => mix64(seed * 997 + j).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = (0 until 200).map(i => i.toLong -> unit(i))
    val planted = (0 until 30).map { i =>
      val (id, v) = base(i)
      val w = unit(10000 + i)
      val mixed = v.zip(w).map { case (a, b) => a + 0.15 * b }
      (id + 1000L) -> mixed
    }
    val all = (base ++ planted).map { case (id, v) => (id, v.map(_.toFloat)) }
    val byId = all.toMap
    val df = all.toDF("vec_id", "embedding")

    val got = Dedup.semanticDedup(df, threshold = 0.9, nClusters = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    // cluster-complete roster: every vector gets a decision
    assert(got.length == all.length)
    // non-vacuous: the planted near-dups drop, the base corpus survives
    val dropped = got.filter(!_._3).map(_._1).toSet
    assert(dropped.nonEmpty && dropped.size < 60,
      s"${dropped.size} drops from 30 planted pairs")

    // local parity, conditioned on the reported assignment (assignment ≡
    // local nearest-centroid is pinned separately in PcaSpec): within each
    // reported cluster, a vector drops iff SOME lower-id member has
    // round4(cos) >= threshold — the operator's own arithmetic
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantDropped = got.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1).sorted
      ids.filter(v => ids.exists(u =>
        u < v && r4(cos(byId(u), byId(v))) >= 0.9))
    }.toSet
    assert(dropped == wantDropped,
      s"extra: ${dropped -- wantDropped}; missing: ${wantDropped -- dropped}")
  }

  test("connected components equal a union-find ground truth") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val n = 120
    val pairs = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // union-find with attach-larger-root-to-smaller ⇒ root IS the min id
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(got.keySet == inPairs.toSet, "every paired node gets a label")
    inPairs.foreach { id =>
      assert(got(id) == find(id.toInt).toLong, s"component of $id")
    }
  }

  test("connected components converge on a worst-case path graph") {
    val s = spark
    import s.implicits._
    // a 16-node path: min-label needs ~diameter iterations to flood
    val path = (0L until 15L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(path.toDF("d1", "d2")).collect()
    assert(got.length == 16 && got.forall(_.getLong(1) == 0L),
      "all path nodes must collapse to component 0")
    // dedupClusters re-attaches singletons as their own canonical cluster
    val ids = (0L until 20L).toDF("doc_id")
    val cl = Dedup.dedupClusters(ids, path.toDF("d1", "d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(cl.count(_._3) == 5, "one canonical for the path + 4 singletons")
    assert(cl.filter(_._1 >= 16).forall(c => c._2 == c._1 && c._3))
    // a diameter beyond maxIter switches to the pointer-jumping phase and
    // still converges to the same labels as union-find, never throwing —
    // chains of boilerplate near-dups are real in web corpora
    val deep = Dedup.connectedComponents(path.toDF("d1", "d2"), maxIter = 3)
      .collect()
    assert(deep.length == 16 && deep.forall(_.getLong(1) == 0L),
      "pointer jumping must finish the flood past maxIter")
    // pure pointer-jumping (maxIter=0 min-label rounds) alone is complete:
    // hook+shortcut rounds double the travelled distance, so even a LONG
    // path converges in O(log d) rounds — this would time out if the
    // fallback were O(d)
    val long = (0L until 400L).map(i => (i, i + 1))
    val jumped = Dedup.connectedComponents(long.toDF("d1", "d2"), maxIter = 0)
      .collect()
    assert(jumped.length == 401 && jumped.forall(_.getLong(1) == 0L),
      "hook+shortcut must label a 400-edge path all-0 in O(log d) rounds")
  }

  test("zero near-dup pairs yield all-singleton clusters, not a crash") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[(Long, Long)].toDF("d1", "d2")
    // connectedComponents on an empty edge list is the empty labeling
    assert(Dedup.connectedComponents(none).count() == 0)
    // and dedupClusters degrades to every doc canonical in its own cluster
    val cl = Dedup.dedupClusters((0L until 5L).toDF("doc_id"), none).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(cl.length == 5 && cl.forall(c => c._1 == c._2 && c._3))
  }

  test("minhashAgainst: planted perturbed copies recalled, output pure") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val corpus = docs.where(col("doc_id") < 400)
    // identical copy (est 1.0) + lightly perturbed copy per corpus doc
    val batch = corpus.where(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 10000)
      .unionByName(corpus.where(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 20000)
        .withColumn("text", concat(col("text"), lit(" zq1 zq2"))))
    val got = Dedup.minhashAgainst(batch, corpus, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // purity: batch ids only on the left, corpus ids only on the right
    assert(got.forall { case (b, c, _) => b >= 10000 && c < 400 })
    val byBatch = got.groupBy(_._1)
    // every identical copy matches its source at estimate 1.0
    (0L until 10L).foreach { i =>
      val hits = byBatch.getOrElse(i + 10000, Array.empty)
      assert(hits.exists(h => h._2 == i && h._3 == 1.0),
        s"identical copy of doc $i not recalled at est 1.0")
    }
    // every perturbed copy still recalls its source (shingle overlap ~95%)
    (0L until 10L).foreach { i =>
      val hits = byBatch.getOrElse(i + 20000, Array.empty)
      assert(hits.exists(h => h._2 == i && h._3 >= 0.5),
        s"perturbed copy of doc $i not recalled")
    }
  }

  test("noveltyScore: duplicated text scores 0, fresh text scores 1") {
    val s = spark
    import s.implicits._
    val ref = Seq((1L, "a b c d e f g h"), (2L, "p q r s t u"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b c d e f g h"),          // every trigram seen -> 0.0
      (11L, "z1 z2 z3 z4 z5"),           // nothing seen -> 1.0
      (12L, "a b c z1 z2"),              // 1 of 3 trigrams seen -> 0.6667
      (13L, "x y")                        // < 3 tokens -> drops out
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusOps.noveltyScore(corpus, ref, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(10L -> 0.0, 11L -> 1.0, 12L -> 0.6667))
  }

  test("token Jaccard inverted-index equals brute-force on a small sample") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y z w v"),
      (4L, "a b x y q")).toDF("doc_id", "text")
    val got = Dedup.tokenJaccard(d, threshold = 0.0, dfCap = 100)
      .select("d1", "d2", "jac").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute force: J(1,2)=4/6, J(1,4)=2/8, J(2,4)=2/8, J(3,4)=2/8
    assert(math.abs(got((1L, 2L)) - 4.0 / 6) < 1e-4)
    assert(math.abs(got((1L, 4L)) - 0.25) < 1e-4)
    assert(math.abs(got((2L, 4L)) - 0.25) < 1e-4)
    assert(math.abs(got((3L, 4L)) - 0.25) < 1e-4)
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }
}
