package graft.queries

import graft.core.{GraftCheckpointOps, Q, Tables}
import graft.operators.{CorpusOps, RetrievalOps}
import org.apache.spark.sql.functions._

/** Lexical-retrieval + data-selection catalog entries: inverted index,
  * BM25 scoring, DSIR importance weighting. All hash-exact against DuckDB
  * oracles (postings compare by an order-pinned digest — the array-free
  * result-shape contract). */
object RetrievalQueries {

  /** Fixed bag-of-terms query shared by the Spark query and the oracle. */
  private val bm25Terms = Seq("table", "key", "spark", "window", "merge")

  val queries: Map[String, Q] = Map(
    // inverted index: df, cf, and an order-pinned digest of the
    // doc_id-ascending postings list
    "q_llm_inverted" -> ((s, d) => {
      RetrievalOps.invertedIndex(Tables.documents(s, d))
        .select(col("token"), col("df"), col("cf"),
          md5(array_join(transform(col("postings"),
            p => concat(p.getField("doc_id"), lit(":"), p.getField("tf"))),
            ",")).as("postings_md5"))
        .orderBy(col("token"))
    }),

    // Okapi BM25 over a fixed 5-term query, Lucene idf
    "q_llm_bm25" -> ((s, d) => {
      val terms = {
        import s.implicits._
        bm25Terms.toDF("token")
      }
      RetrievalOps.bm25(Tables.documents(s, d), terms)
        .select(col("doc_id"), col("n_hit"),
          (floor(col("score") * 1e4 + lit(0.5)) / 1e4).as("score"))
        .orderBy(col("doc_id"))
    }),

    // int8-quantized exact top-k: integer dot (deterministic) de-scaled;
    // ranking happens on bit-identical doubles so even the rank column is
    // engine-exact
    "q_llm_ann_int8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.int8TopK(
          emb.where(col("vec_id") < 10), emb, k = 5)
        .select(col("qid"), col("rn"), col("vid"),
          (floor(col("score") * 1e4 + lit(0.5)) / 1e4).as("score"))
        .orderBy(col("qid"), col("rn"))
    }),

    // 1-bit binary quantization + exact Hamming top-k: integer distance
    // over sign codes — fully deterministic, rank column engine-exact
    "q_llm_ann_binary" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.hammingTopK(
          emb.where(col("vec_id") < 10), emb, k = 5)
        .select(col("qid"), col("rn"), col("vid"),
          col("hd").cast("int").as("hd"))
        .orderBy(col("qid"), col("rn"))
    }),

    // Johnson–Lindenstrauss random projection 64→16 dims, deterministic
    // md5-parity ±1 matrix, exploded to (vec_id, j, y) rows
    "q_llm_rp" -> ((s, d) =>
      graft.operators.Similarity.randomProject(Tables.embeddings(s, d),
          outDim = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "y")))
        .select(col("vec_id"), col("j"),
          (floor(col("y") * 1e4 + lit(0.5)) / 1e4).as("y"))
        .orderBy(col("vec_id"), col("j"))),

    // MMR diversity rerank: top-20 relevance pool → greedy λ·rel −
    // (1−λ)·max-sim selection of 5; every comparison on 4dp-rounded
    // values so even the greedy ORDER is oracle-exact (unrolled CTEs)
    "q_llm_mmr" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      RetrievalOps.mmrRerank(emb.where(col("vec_id") < 5), emb,
          k = 5, poolSize = 20, lambda = 0.7)
        .orderBy(col("qid"), col("rn"))
    }),

    // two-stage matryoshka funnel: 16-dim prefix-cosine pool of 20,
    // exact 64-dim rerank to top-5
    "q_llm_two_stage" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.twoStageTopK(
          emb.where(col("vec_id") < 10), emb,
          coarseDims = 16, poolSize = 20, k = 5)
        .orderBy(col("qid"), col("rn"))
    }),

    // hybrid retrieval: BM25 lexical rank fused with dense cosine rank
    // (query = embedding of vec 0, query-by-example) via RRF — the
    // standard sparse+dense ensemble, composed from three already-exact
    // operators so the fusion stays hash-exact end to end. Docs with no
    // query-term hit enter the lexical ranking at score 0 (tie broken by
    // doc_id, the rrfFusion contract).
    "q_llm_hybrid" -> ((s, d) => {
      val terms = {
        import s.implicits._
        bm25Terms.toDF("token")
      }
      val docs = Tables.documents(s, d)
      val lex = RetrievalOps.bm25(docs, terms)
        .select(col("doc_id"), col("score").as("lex"))
      val emb = Tables.embeddings(s, d)
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      val dense = emb.crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          graft.operators.Similarity.cosine(col("embedding"), col("q_emb"))
            .as("dense"))
      // inter-phase persist (the q_llm_pipeline2 lesson): each fused
      // signal's rank needs a bounds agg + bucket counts, so rrfFusion
      // drives ~5 actions over its input — without this every one of
      // them recomputes the BM25 subtree (measured 6.0 -> 4.6 s cold,
      // 3.7 -> 2.4 s warm at sf0.1)
      val signals = docs.select(col("doc_id"))
        .join(lex, Seq("doc_id"), "left")
        .na.fill(0.0, Seq("lex"))
        .join(dense, Seq("doc_id"))
        .graftCheckpoint()
      CorpusOps.rrfFusion(signals,
          Seq("lex" -> col("lex"), "dense" -> col("dense")))
        .orderBy(col("doc_id"))
    }),

    // contrastive training pairs: 2 exact-cosine positives + 4 md5-dyadic
    // uniform negatives per query (self/positive collisions dropped, not
    // re-drawn) — the embedding-model fine-tuning dataset constructor
    "q_llm_contrastive" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      RetrievalOps.contrastivePairs(emb.where(col("vec_id") < 10), emb,
          kPos = 2, kNeg = 4)
        .orderBy(col("qid"), col("role"), col("rn"))
    }),

    // DSIR importance weighting: target LM = src0 docs, raw LM = corpus
    "q_llm_dsir" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      CorpusOps.importanceWeight(docs, docs.where(col("source") === "src0"))
        .select(col("doc_id"), col("n_tokens"), col("llr"),
          col("target_like").cast("int").as("target_like"))
        .orderBy(col("doc_id"))
    }))

  private val termsSqlList = bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")

  /** Raw double cosine between two embedding-list columns (DuckDB list
    * ops) — the operand both engines agree on before any rounding. */
  private def cosRaw(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"""

  /** Sequential-fold cosine (list_reduce, left-to-right) — bit-matches
    * the engine's sequential dot/norm loops where list_sum's pairwise
    * summation can differ in last bits and flip a 4dp boundary (observed
    * once at sf0.1 in the MMR pairwise sims). */
  private def cosRawSeq(a: String, b: String): String =
    s"""(list_reduce(list_transform(list_zip($a, $b),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))))"""

  /** Unrolled greedy MMR mirroring RetrievalOps.mmrRerank: step i picks
    * the (score desc, vid asc) argmax of
    * floor((0.7·rel − (1−0.7)·maxsim)·1e4+0.5)/1e4 over the pool minus
    * the chosen set; λ literals carry e0 (DuckDB parses bare 0.7 as
    * DECIMAL, making (1 − 0.7) exactly 0.3 — the engine's double
    * (1 − 0.7) is 0.30000000000000004, and the mismatch flipped a 4dp
    * boundary at sf0.1) so both engines subtract the same doubles. */
  private def mmrSql(k: Int, poolSize: Int): String = {
    val steps = (1 to k).map { i =>
      val prev = s"ch${i - 1}"
      val msCte = if (i == 1) "" else s"""
        ms$i AS (
          SELECT sim.qid, sim.va AS vid, max(sim.s) AS m
          FROM sim JOIN $prev ON sim.qid = $prev.qid AND sim.vb = $prev.vid
          GROUP BY 1, 2),"""
      val scoreExpr = if (i == 1)
        "floor((0.7e0 * p.rel - (1e0 - 0.7e0) * 0e0) * 1e4 + 0.5) / 1e4"
      else
        s"floor((0.7e0 * p.rel - (1e0 - 0.7e0) * ms$i.m) * 1e4 + 0.5) / 1e4"
      val joins = if (i == 1)
        s"FROM pv p"
      else
        s"""FROM pv p JOIN ms$i ON p.qid = ms$i.qid AND p.vid = ms$i.vid
            LEFT JOIN $prev ON p.qid = $prev.qid AND p.vid = $prev.vid"""
      val whereNot = if (i == 1) "" else s"WHERE $prev.vid IS NULL"
      s"""$msCte
        sc$i AS (
          SELECT p.qid, p.vid, $scoreExpr AS score
          $joins
          $whereNot),
        s$i AS (
          SELECT qid, vid, score FROM (
            SELECT qid, vid, score, row_number() OVER (PARTITION BY qid
              ORDER BY score DESC, vid ASC) AS rr
            FROM sc$i) WHERE rr = 1),
        ch$i AS (${(1 to i).map(j => s"SELECT qid, vid FROM s$j")
          .mkString(" UNION ALL ")})"""
    }.mkString(",\n")
    val finalSel = (1 to k).map(i =>
      s"SELECT qid, CAST($i AS INT) AS rn, vid, score FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH q AS (
         SELECT vec_id AS qid, embedding AS qv FROM embeddings
         WHERE vec_id < 5),
       c AS (SELECT vec_id AS vid, embedding AS cv FROM embeddings),
       scored AS (
         SELECT qid, vid, ROUND(${cosRawSeq("qv", "cv")}, 4) AS rel
         FROM q JOIN c ON vid <> qid),
       pool AS (
         SELECT qid, vid, rel FROM (
           SELECT qid, vid, rel, row_number() OVER (PARTITION BY qid
             ORDER BY rel DESC, vid ASC) AS prn
           FROM scored) WHERE prn <= $poolSize),
       pv AS (SELECT pool.qid, pool.vid, pool.rel, c.cv
              FROM pool JOIN c USING (vid)),
       sim AS (
         SELECT a.qid, a.vid AS va, b.vid AS vb,
                floor(${cosRawSeq("a.cv", "b.cv")} * 1e4 + 0.5) / 1e4 AS s
         FROM pv a JOIN pv b ON a.qid = b.qid AND a.vid <> b.vid),
       $steps
       SELECT qid, rn, vid, score FROM ($finalSel) ORDER BY qid, rn"""
  }

  val oracle: Map[String, String] = Map(
    "q_llm_mmr" -> mmrSql(k = 5, poolSize = 20),
    "q_llm_two_stage" ->
      s"""WITH q AS (
           SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 10),
         c AS (SELECT vec_id AS vid, embedding AS cv FROM embeddings),
         coarse AS (
           SELECT qid, vid, qv, cv,
                  ROUND(${cosRaw("qv[1:16]", "cv[1:16]")}, 4) AS cosc
           FROM q JOIN c ON vid <> qid),
         pool AS (
           SELECT qid, vid, qv, cv FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY cosc DESC, vid ASC) AS prn
             FROM coarse) WHERE prn <= 20),
         f AS (
           SELECT qid, vid, ROUND(${cosRaw("qv", "cv")}, 4) AS cos
           FROM pool),
         r AS (
           SELECT qid, vid, cos,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cos DESC, vid ASC) AS INT) AS rn
           FROM f)
         SELECT qid, rn, vid, cos FROM r WHERE rn <= 5
         ORDER BY qid, rn""",
    "q_llm_inverted" ->
      """WITH tok AS (
           SELECT doc_id, t AS token FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents) WHERE t <> ''),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2)
         SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
                md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id))
                  AS postings_md5
         FROM tf GROUP BY token ORDER BY token""",
    "q_llm_bm25" ->
      s"""WITH tok AS (
           SELECT doc_id, t AS token FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents) WHERE t <> ''),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         q AS (SELECT DISTINCT u.t AS token
               FROM unnest($termsSqlList) AS u(t)),
         dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         qdf AS (
           SELECT q.token,
                  ln(1 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5)) AS idf,
                  st.avgdl AS avgdl
           FROM q JOIN dfr ON q.token = dfr.token CROSS JOIN st)
         SELECT tf.doc_id, count(*) AS n_hit,
                floor(sum(idf * (tf * (1.2 + 1)) /
                  (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))) * 1e4 + 0.5)
                  / 1e4 AS score
         FROM tf JOIN qdf ON tf.token = qdf.token
                 JOIN dl ON tf.doc_id = dl.doc_id
         GROUP BY tf.doc_id ORDER BY tf.doc_id""",
    "q_llm_ann_int8" ->
      """WITH q0 AS (
           SELECT vec_id,
                  list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
           FROM embeddings),
         qt AS (
           SELECT vec_id, scale,
                  CASE WHEN scale = 0
                       THEN list_transform(xd, x -> 0)
                       ELSE list_transform(xd, x ->
                         CAST(least(127.0, floor(abs(x) / scale + 0.5)) *
                              sign(x) AS INT))
                  END AS codes
           FROM q0),
         scored AS (
           SELECT a.vec_id AS qid, b.vec_id AS vid,
                  (CAST(list_dot_product(a.codes, b.codes) AS DOUBLE)
                    * a.scale) * b.scale AS score
           FROM qt a JOIN qt b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
         ranked AS (
           SELECT qid, vid, score,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY score DESC, vid ASC) AS INT) AS rn
           FROM scored)
         SELECT qid, rn, vid, floor(score * 1e4 + 0.5) / 1e4 AS score
         FROM ranked WHERE rn <= 5 ORDER BY qid, rn""",
    // sign-bit packing mirrors Similarity.binaryQuantize word-for-word:
    // bit i of word w ⇔ embedding[32w+i] >= 0; Hamming is integer-exact
    "q_llm_ann_binary" ->
      """WITH c AS (
           SELECT vec_id,
             list_sum(list_transform(range(1, 33), i ->
               CASE WHEN embedding[i] >= 0
                    THEN CAST(1 AS BIGINT) << (i - 1)
                    ELSE CAST(0 AS BIGINT) END)) AS w0,
             list_sum(list_transform(range(1, 33), i ->
               CASE WHEN embedding[i + 32] >= 0
                    THEN CAST(1 AS BIGINT) << (i - 1)
                    ELSE CAST(0 AS BIGINT) END)) AS w1
           FROM embeddings),
         s AS (
           SELECT q.vec_id AS qid, c2.vec_id AS vid,
                  bit_count(xor(q.w0, c2.w0))
                  + bit_count(xor(q.w1, c2.w1)) AS hd
           FROM c q JOIN c c2 ON q.vec_id < 10 AND c2.vec_id <> q.vec_id),
         r AS (
           SELECT qid, vid, hd,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY hd ASC, vid ASC) AS INT) AS rn
           FROM s)
         SELECT qid, rn, vid, CAST(hd AS INT) AS hd
         FROM r WHERE rn <= 5 ORDER BY qid, rn""",
    // the ±1 matrix regenerates from md5 parity exactly as the operator
    // builds it driver-side: sign(j,i) = +1 iff first md5 hex char of
    // "j:i" is even (bit 4 of byte 0 clear)
    "q_llm_rp" ->
      """SELECT e.vec_id, CAST(j.j AS INT) AS j,
                floor(list_sum(list_transform(range(1, 65), i ->
                    CAST(e.embedding[i] AS DOUBLE) *
                    CASE WHEN substr(md5(CAST(j.j AS VARCHAR) || ':'
                                         || CAST(i - 1 AS VARCHAR)), 1, 1)
                           IN ('0','2','4','6','8','a','c','e')
                         THEN 1.0 ELSE -1.0 END))
                  / sqrt(16.0) * 1e4 + 0.5) / 1e4 AS y
         FROM embeddings e CROSS JOIN range(0, 16) j(j)
         ORDER BY e.vec_id, j""",
    "q_llm_contrastive" ->
      """WITH scored AS (
           SELECT q.vec_id AS qid, c.vec_id AS vid,
                  ROUND(
                    list_sum(list_transform(list_zip(q.embedding, c.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                    / (sqrt(list_sum(list_transform(q.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                     * sqrt(list_sum(list_transform(c.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                  4) AS cos
           FROM embeddings q, embeddings c
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
         pos AS (
           SELECT qid, vid, cos, ROW_NUMBER() OVER
             (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rn
           FROM scored QUALIFY rn <= 2),
         n AS (SELECT COUNT(*) AS n FROM embeddings),
         draws AS (
           SELECT q.vec_id AS qid, u.rn,
                  CAST(floor(
                    CAST('0x' || substr(md5('neg:' || q.vec_id || ':' || u.rn),
                         1, 13) AS BIGINT)
                    / 4503599627370496.0 * n.n) AS BIGINT) AS vid
           FROM embeddings q CROSS JOIN n
                CROSS JOIN (SELECT unnest(range(1, 5)) AS rn) u
           WHERE q.vec_id < 10),
         neg AS (
           SELECT d.qid, min(d.rn) AS rn, d.vid FROM draws d
           WHERE d.vid <> d.qid
             AND NOT EXISTS (SELECT 1 FROM pos p
                             WHERE p.qid = d.qid AND p.vid = d.vid)
           GROUP BY d.qid, d.vid)
         SELECT qid, role, CAST(rn AS INT) AS rn, vid, cos FROM (
           SELECT qid, 'pos' AS role, rn, vid, cos FROM pos
           UNION ALL
           SELECT qid, 'neg' AS role, rn, vid, NULL AS cos FROM neg)
         ORDER BY qid, role, rn""",
    "q_llm_hybrid" ->
      s"""WITH tok AS (
           SELECT doc_id, t AS token FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents) WHERE t <> ''),
         tf AS (
           SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         q AS (SELECT DISTINCT u.t AS token
               FROM unnest($termsSqlList) AS u(t)),
         dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         qdf AS (
           SELECT q.token,
                  ln(1 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5)) AS idf,
                  st.avgdl AS avgdl
           FROM q JOIN dfr ON q.token = dfr.token CROSS JOIN st),
         bm AS (
           SELECT tf.doc_id,
                  sum(idf * (tf * (1.2 + 1)) /
                    (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))) AS lex
           FROM tf JOIN qdf ON tf.token = qdf.token
                   JOIN dl ON tf.doc_id = dl.doc_id
           GROUP BY tf.doc_id),
         qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         dense AS (
           SELECT c.vec_id AS doc_id,
                  list_sum(list_transform(list_zip(c.embedding, qv.qe),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                  / (sqrt(list_sum(list_transform(c.embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                   * sqrt(list_sum(list_transform(qv.qe,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                    AS dense
           FROM embeddings c CROSS JOIN qv),
         s AS (
           SELECT d.doc_id,
                  floor(COALESCE(bm.lex, 0.0e0) * 1e4 + 0.5) / 1e4 AS lv,
                  floor(dense.dense * 1e4 + 0.5) / 1e4 AS dv
           FROM documents d
           LEFT JOIN bm ON bm.doc_id = d.doc_id
           JOIN dense ON dense.doc_id = d.doc_id),
         r AS (
           SELECT doc_id,
                  row_number() OVER (ORDER BY lv DESC, doc_id) AS rank_lex,
                  row_number() OVER (ORDER BY dv DESC, doc_id) AS rank_dense
           FROM s)
         SELECT doc_id, rank_lex, rank_dense,
                floor((1.0 / (60.0 + rank_lex) + 1.0 / (60.0 + rank_dense))
                      * 1e6 + 0.5) / 1e6 AS rrf
         FROM r ORDER BY doc_id""",
    "q_llm_dsir" ->
      """WITH tok AS (
           SELECT doc_id, source, t AS token FROM (
             SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
             FROM documents) WHERE t <> ''),
         ct AS (SELECT token, count(*) AS ct FROM tok
                WHERE source = 'src0' GROUP BY 1),
         cr AS (SELECT token, count(*) AS cr FROM tok GROUP BY 1),
         merged AS (
           SELECT COALESCE(cr.token, ct.token) AS token,
                  COALESCE(ct.ct, 0) AS ct, COALESCE(cr.cr, 0) AS cr
           FROM ct FULL OUTER JOIN cr ON ct.token = cr.token),
         tot AS (
           SELECT sum(ct) AS tot_t, sum(cr) AS tot_r, count(*) AS v
           FROM merged),
         ratios AS (
           SELECT token,
                  ln((ct + 0.5) / (tot_t + 0.5 * (v + 1))) -
                  ln((cr + 0.5) / (tot_r + 0.5 * (v + 1))) AS llr_tok
           FROM merged CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_tokens,
                floor(avg(llr_tok) * 1e4 + 0.5) / 1e4 AS llr,
                CAST(avg(llr_tok) > 0 AS INT) AS target_like
         FROM tok JOIN ratios ON tok.token = ratios.token
         GROUP BY doc_id ORDER BY doc_id""")
}
