package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalOpsSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple apple apple durian"),
    (4L, "elderberry")).toDF("doc_id", "text")

  test("invertedIndex: postings are doc_id-sorted, df/cf consistent") {
    val idx = RetrievalOps.invertedIndex(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(idx.keySet == Set("apple", "banana", "cherry", "durian", "elderberry"))
    val apple = idx("apple")
    assert(apple.getLong(1) == 2 && apple.getLong(2) == 5)  // df, cf
    val posts = apple.getSeq[org.apache.spark.sql.Row](3)
    assert(posts.map(_.getLong(0)) == Seq(1L, 3L))           // sorted doc_ids
    assert(posts.map(_.getLong(1)) == Seq(2L, 3L))           // tfs
  }

  test("bm25: more matched terms and rarer terms score higher") {
    val terms = Seq("apple", "banana").toDF("token")
    val scores = RetrievalOps.bm25(docs, terms)
      .select("doc_id", "n_hit", "score")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // doc 4 matches nothing → absent
    assert(!scores.contains(4L))
    // doc 1 hits both terms; docs 2,3 hit one each
    assert(scores(1L)._2 == 2 && scores(2L)._2 == 1 && scores(3L)._2 == 1)
    assert(scores(1L)._3 > scores(2L)._3)
    // all scores positive (Lucene idf is always > 0)
    scores.values.foreach { case (_, _, sc) => assert(sc > 0) }
  }

  test("bm25 tf saturation: score grows sublinearly in tf") {
    val terms = Seq("apple").toDF("token")
    val scores = RetrievalOps.bm25(docs, terms)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // doc 3 (tf=3, dl=4) beats doc 1 (tf=2, dl=3) but by less than 3/2×
    assert(scores(3L) > scores(1L))
    assert(scores(3L) < scores(1L) * 1.5)
  }

  test("importanceWeight: target-vocabulary docs score positive, others negative") {
    val target = Seq((100L, "alpha beta alpha"), (101L, "beta alpha")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta"),         // pure target vocabulary
      (2L, "gamma delta epsilon") // disjoint vocabulary
    ).toDF("doc_id", "text")
    val w = CorpusOps.importanceWeight(raw, target)
      .select("doc_id", "llr").as[(Long, Double)].collect().toMap
    assert(w(1L) > 0 && w(2L) < 0)
  }

  test("importanceWeight is ~0 when target equals raw") {
    val d = docs
    val w = CorpusOps.importanceWeight(d, d)
      .select("llr").as[Double].collect()
    // identical LMs ⇒ per-token llr exactly 0 ⇒ per-doc 0 (4 dp)
    assert(w.forall(_ == 0.0))
  }

  test("contrastivePairs: positives exact, negatives deterministic and clean") {
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val q = emb.where(col("vec_id") < 5)
    val got = RetrievalOps.contrastivePairs(q, emb, kPos = 2, kNeg = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSeq
    val pos = got.filter(_._2 == "pos")
    val neg = got.filter(_._2 == "neg")
    // positives ARE the exact top-k
    val wantPos = Similarity.bruteForceTopK(q, emb, 2)
      .collect().map(r => (r.getLong(0), "pos", r.getInt(1), r.getLong(2)))
      .toSeq
    assert(pos.toSet == wantPos.toSet)
    // per query: ≥1 negative survives, none collide with self or positives,
    // all vids in [0, 500)
    val posSet = pos.map(p => (p._1, p._4)).toSet
    (0L until 5L).foreach { qid =>
      val nq = neg.filter(_._1 == qid)
      assert(nq.nonEmpty && nq.size <= 4, s"q$qid: ${nq.size} negatives")
      nq.foreach { case (_, _, _, vid) =>
        assert(vid != qid && !posSet((qid, vid)) && vid >= 0 && vid < 500)
      }
      // intra-draw collisions (two rns hitting one vid) are deduped:
      // (qid, vid) unique among negatives
      assert(nq.map(_._4).distinct.size == nq.size,
        s"q$qid: duplicate negative vids ${nq.map(_._4).sorted}")
    }
    // tiny corpus forces collisions: 5 queries x 4 draws over 8 ids —
    // without the dedup a repeated (qid, vid) negative WILL appear
    val tiny = emb.where(col("vec_id") < 8)
    val tneg = RetrievalOps.contrastivePairs(tiny.where(col("vec_id") < 5),
        tiny, kPos = 2, kNeg = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .filter(_._2 == "neg").map(t => (t._1, t._3)).toSeq
    assert(tneg.distinct.size == tneg.size,
      s"tiny-corpus negatives must be (qid,vid)-unique: $tneg")
    // deterministic for a fixed salt; a different salt permutes the draw
    val again = RetrievalOps.contrastivePairs(q, emb, kPos = 2, kNeg = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(again.toSet == got.toSet)
    val salted = RetrievalOps.contrastivePairs(q, emb, kPos = 2, kNeg = 4,
        salt = "other")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(salted.filter(_._2 == "neg").toSet != neg.toSet,
      "salt must permute the negative draw")
  }

  test("mmrRerank demotes near-duplicates that pure top-k keeps adjacent") {
    val s = spark
    import s.implicits._
    // query q; candidates: two IDENTICAL high-rel vectors (1, 2), one
    // orthogonal-ish moderate vector (3)
    def v(a: Double, b: Double) =
      Array.tabulate(8)(i => (if (i == 0) a else if (i == 1) b else 0.0).toFloat)
    val q = Seq((100L, v(1, 0.2))).toDF("vec_id", "embedding")
    val c = Seq((1L, v(1, 0.1)), (2L, v(1, 0.1)), (3L, v(0.2, 1)))
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(q, c, k = 3)
      .orderBy(col("rn")).select("vid").as[Long].collect().toList
    assert(topk.take(2) == List(1L, 2L), s"fixture: $topk")
    val mmr = RetrievalOps.mmrRerank(q, c, k = 3, poolSize = 3, lambda = 0.5)
      .orderBy(col("rn")).select("vid").as[Long].collect().toList
    // after picking 1, its twin 2 (sim 1.0) must fall behind the
    // diverse 3
    assert(mmr == List(1L, 3L, 2L), s"mmr order: $mmr")
  }

  test("mmrRerank at lambda=1 reduces to pure relevance ranking") {
    val s = spark
    import s.implicits._
    val emb = graft.core.Tables.embeddings(s, sf0001)
    val q = emb.where(col("vec_id") < 3)
    val mmr = RetrievalOps.mmrRerank(q, emb, k = 4, poolSize = 8, lambda = 1.0)
      .select("qid", "rn", "vid").as[(Long, Int, Long)].collect().toSet
    val topk = Similarity.bruteForceTopK(q, emb, k = 4)
      .select("qid", "rn", "vid").as[(Long, Int, Long)].collect().toSet
    assert(mmr == topk)
  }
}
