package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval primitives over the document corpus: inverted-index
  * construction and BM25 scoring — the lexical half of a RAG stack (the
  * dense half is [[Similarity]]/[[Ivf]]/[[Pq]]).
  *
  * Scale shape: everything is one (token → postings) shuffle over the
  * tokenized corpus; document-frequency and corpus statistics are
  * vocabulary-sized aggregates. BM25 query terms are a broadcast list, so
  * scoring is one semi-join-shaped probe of the token table — never a
  * corpus self-join. Postings are doc_id-sorted per token; at 100 TB the
  * posting list of a stop-word-frequency token is millions of entries, so
  * the index op keeps postings as rows (token, doc_id, tf) — the grouped
  * array form is a per-token reduction the caller opts into for digest /
  * export, exactly like the reference's per-sample sink fan-out.
  */
object RetrievalOps {

  /** Tokenized (doc_id, token, tf) + per-doc length `dl` — the shared
    * scan for index build and scoring. */
  private def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Row-form inverted index: (token, df, cf, postings) with postings the
    * doc_id-ascending list of (doc_id, tf) structs. df = document
    * frequency, cf = collection frequency. */
  def invertedIndex(docs: DataFrame): DataFrame =
    termFreqs(docs)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_sort(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))

  /** Okapi BM25 (Lucene idf formulation: ln(1 + (N − df + 0.5)/(df + 0.5)))
    * of every document against a bag of query terms. `terms` is a
    * one-column frame of tokens (deduplicated here; term multiplicity in
    * the query does not re-weight, matching Lucene). Returns
    * (doc_id, n_hit, score) for documents matching ≥ 1 term.
    *
    * The idf/tf math runs in double with the sum ordered by token inside
    * one aggregation — deterministic to ~1 ulp, rounded by callers at 4 dp
    * (the established contract). */
  def bm25(docs: DataFrame, terms: DataFrame, k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    val tf = termFreqs(docs)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val q = terms.select(col(terms.columns.head).as("token")).distinct()
    // vocabulary-sized side joined broadcast; the corpus-sized tf table is
    // probed once
    val qdf = broadcast(q.join(df, "token").crossJoin(stats)
      .select(col("token"),
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          .as("idf"),
        col("avgdl")))
    tf.join(qdf, "token")
      .join(dl, "doc_id")
      .select(col("doc_id"), col("token"),
        (col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))))
          .as("part"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("part")).as("score"))
  }

  /** Contrastive training-pair construction for embedding-model /
    * reranker fine-tuning: for every query vector, `kPos` positives from
    * exact top-k cosine ([[Similarity.bruteForceTopK]] — swap in the
    * IVF/PQ probe at corpus scale) and `kNeg` deterministic uniform
    * random negatives drawn by the md5-dyadic scheme (the
    * [[CurationOps.weightedSample]] uniform: 52-bit dyadic in [0,1),
    * scaled to the id space). Returns (qid, role 'pos'|'neg', rn, vid,
    * cos) — cos NULL on negatives.
    *
    * Negative draws are a PURE MAP (no shuffle, no corpus touch): the
    * corpus must carry dense ids 0..n−1 (the epoch-shuffle permutation
    * [[CorpusOps.shuffledPack]] materializes exactly that when ids are
    * sparse). Draws colliding with the query itself or its positive set
    * are dropped, not re-drawn — the in-batch-negatives convention:
    * determinism is the contract, exact k is not (collision loss is
    * ≤ (kPos+1)/n per draw, negligible at corpus scale and surfaced in
    * the row count, never silently patched). */
  def contrastivePairs(queries: DataFrame, corpus: DataFrame,
                       kPos: Int = 2, kNeg: Int = 4,
                       salt: String = "neg",
                       knownCount: Option[Long] = None): DataFrame = {
    require(kPos >= 1 && kNeg >= 1, s"kPos=$kPos kNeg=$kNeg")
    val n = knownCount.getOrElse(corpus.count())
    val pos = Similarity.bruteForceTopK(queries, corpus, kPos)
    val draws = queries.select(col("vec_id").as("qid"))
      .select(col("qid"), explode(expr(s"sequence(1, $kNeg)")).as("rn"))
      // u ∈ [0,1) — no +1 here (unlike the log-dyadic in weightedSample):
      // floor(u·n) must stay in [0, n)
      .withColumn("vid", floor(
        conv(substring(md5(concat(lit(salt), lit(":"),
            col("qid").cast("string"), lit(":"), col("rn").cast("string"))),
          1, 13), 16, 10).cast("double") /
        lit(4503599627370496.0) * n).cast("long"))
    val neg = draws
      .where(col("vid") =!= col("qid"))
      .join(pos.select(col("qid"), col("vid")), Seq("qid", "vid"), "left_anti")
      // two independent draws can land on the SAME vid for one qid —
      // without this a (qid, 'neg', vid) pair repeats, silently
      // over-weighting that negative downstream; keep the lowest rn
      // (deterministic, and the row count still surfaces collision loss)
      .groupBy(col("qid"), col("vid")).agg(min(col("rn")).as("rn"))
      .select(col("qid"), lit("neg").as("role"), col("rn"), col("vid"),
        lit(null).cast("double").as("cos"))
    pos.select(col("qid"), lit("pos").as("role"), col("rn"), col("vid"),
        col("cos"))
      .unionByName(neg)
  }

  /** Maximal-marginal-relevance rerank (Carbonell–Goldstein): from a
    * relevance pool of `poolSize` candidates per query, greedily select
    * `k` maximizing λ·rel − (1−λ)·max sim-to-already-selected — the
    * standard diversity-aware second stage of a retrieval funnel.
    *
    * Determinism contract: rel is the pool's 4dp-rounded cosine,
    * pairwise sims round to 4dp BEFORE the max, the MMR score rounds to
    * 4dp before argmax, ties break vid-ascending — every comparison
    * happens on values both engines agree on, so even the greedy ORDER
    * is oracle-exact (the catalog oracle unrolls the k steps as CTEs).
    *
    * Scale shape: stage 1 is the corpus-touching part (broadcast-query
    * top-poolSize; swap in the IVF/PQ probe at corpus scale); the greedy
    * runs per query on a pool of `poolSize` vectors — O(k·poolSize²)
    * local float ops on a parameter-bounded group, which is the
    * justified use of flatMapGroups (state bounded by construction,
    * like the external-process and trie-tokenizer sites). */
  def mmrRerank(queries: DataFrame, candidates: DataFrame, k: Int = 5,
                poolSize: Int = 20, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && poolSize >= k, s"k=$k poolSize=$poolSize")
    val spark = queries.sparkSession
    import spark.implicits._
    val pool = Similarity.bruteForceTopK(queries, candidates, poolSize)
    val withVec = pool.join(
      candidates.select(col("vec_id").as("vid"), col("embedding").as("cv")),
      "vid")
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    withVec.select(col("qid"), col("vid"), col("cos"), col("cv"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        val remaining = scala.collection.mutable.ArrayBuffer(
          it.map { case (_, vid, rel, vec) =>
            val v = vec.map(_.toDouble)
            val n = math.sqrt(v.map(x => x * x).sum)
            (vid, rel, v, if (n == 0) 1.0 else n)
          }.toSeq: _*)
        val chosen = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
        val out = Seq.newBuilder[(Long, Int, Long, Double)]
        var rn = 1
        while (rn <= k && remaining.nonEmpty) {
          var bestIdx = -1; var best = Double.NegativeInfinity
          var bestVid = Long.MaxValue
          var i = 0
          while (i < remaining.length) {
            val (vid, rel, v, n) = remaining(i)
            // empty-set convention: 0 (pure relevance); else TRUE max —
            // a negative max must stay negative (it rewards diversity)
            var maxSim = if (chosen.isEmpty) 0.0 else Double.NegativeInfinity
            for ((cv, cn) <- chosen) {
              var d = 0.0; var j = 0
              while (j < v.length) { d += v(j) * cv(j); j += 1 }
              val s = r4(d / (n * cn))
              if (s > maxSim) maxSim = s
            }
            val sc = r4(lambda * rel - (1 - lambda) * maxSim)
            if (sc > best || (sc == best && vid < bestVid)) {
              best = sc; bestIdx = i; bestVid = vid
            }
            i += 1
          }
          val (vid, _, v, n) = remaining.remove(bestIdx)
          chosen += ((v, n))
          out += ((qid, rn, vid, best))
          rn += 1
        }
        out.result().iterator
      }
      .toDF("qid", "rn", "vid", "score")
  }
}
