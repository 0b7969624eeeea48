package graft.queries

import graft.core.{GraftCheckpointOps, Q, Tables}
import graft.operators.{CorpusOps, CurationOps, Dedup}
import org.apache.spark.sql.functions._

/** Corpus-curation catalog entries (SURVEY §2B north-star extension,
  * round-6 additions): boilerplate stripping, RAG chunking, systematic
  * PPS sampling, snapshot diffing, vocabulary-coverage analysis, Bloom
  * ingest dedup. All but the Bloom entry are integer/digest-deterministic
  * and carry exact DuckDB oracles; the Bloom filter is xxhash64-pinned
  * (engine-specific) and is covered rows-only here with its no-false-
  * negative / FP-bound / merge-invariance properties in CurationOpsSpec. */
object CurationQueries {

  val queries: Map[String, Q] = Map(
    // CCNet-style boilerplate removal: 8-token segments appearing in >=2
    // distinct docs of the same source are dropped, survivors reassembled.
    // minFrac=0.05 over the fixture's 25-doc sources floors at the minDocs=2
    // threshold — the df>=2 segments measured in the fixture are the witness.
    "q_llm_boilerplate" -> ((s, d) =>
      CurationOps.boilerplateRemove(Tables.documents(s, d),
          k = 8, minFrac = 0.05, minDocs = 2)
        .orderBy(col("doc_id"))),

    // retrieval chunking: 32-token windows, stride 24 (8-token overlap)
    "q_llm_chunk" -> ((s, d) =>
      CurationOps.chunkDocs(Tables.documents(s, d).where(col("doc_id") < 200),
          size = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk"))),

    // systematic PPS sample: every doc whose n_chars interval on the
    // doc_id-ordered weight axis contains a multiple of 5000
    "q_llm_syssample" -> ((s, d) =>
      CurationOps.systematicSample(Tables.documents(s, d), grid = 5000)
        .orderBy(col("doc_id"))),

    // snapshot diff: old drops doc_id%11=3, new drops doc_id%11=7 and
    // revises every doc_id%5=0 — all four statuses appear
    "q_llm_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.where(col("doc_id") % 11 =!= 3)
      val nw = docs.where(col("doc_id") % 11 =!= 7)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      CurationOps.datasetDiff(old, nw).orderBy(col("doc_id"))
    }),

    // vocabulary coverage: OOV rate against the top-200 corpus vocabulary
    "q_llm_oov" -> ((s, d) =>
      CurationOps.oovRate(Tables.documents(s, d), vocabSize = 200)
        .orderBy(col("doc_id"))),

    // n-gram novelty: fraction of each late doc's distinct trigrams unseen
    // in the accumulated reference (docs < 250)
    "q_llm_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      CorpusOps.noveltyScore(
          docs.where(col("doc_id") >= 250),
          docs.where(col("doc_id") < 250), n = 3)
        .orderBy(col("doc_id"))
    }),

    // incremental MinHash near-dup: batch docs >= 400 plus planted
    // perturbed copies of corpus docs (two tokens appended, re-keyed
    // +10000) matched against the corpus (< 400). The planted copies'
    // shingle sets stay ~95% identical, far above the 0.5 threshold, so
    // each must surface — the non-vacuous witness. xxhash64-pinned =>
    // rows-only; recall/purity properties in DedupSpec.
    "q_llm_minhash_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(col("doc_id") < 400)
      val batch = docs.where(col("doc_id") >= 400)
        .unionByName(corpus.where(col("doc_id") < 15)
          .withColumn("doc_id", col("doc_id") + 10000)
          .withColumn("text", concat(col("text"), lit(" zq1 zq2"))))
      Dedup.minhashAgainst(batch, corpus, threshold = 0.5)
        .orderBy(col("batch_id"), col("corpus_id"))
    }),

    // QUALITY-AWARE curation pipeline v2, five composed stages: RRF gate
    // (≥0.012 keeps 217 of 500) → trigram-Jaccard pairs → connected
    // components → keep-BEST representative per cluster → 512-token shard
    // packing. Every stage is an individually-oracle-exact operator, so
    // the composition stays hash-exact end to end.
    "q_llm_pipeline2" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nToks = expr("size(filter(split(text, ' '), t -> t <> ''))")
      val gate = CorpusOps.rrfFusion(docs, Seq(
          "chars" -> col("n_chars").cast("double"),
          "toks" -> nToks.cast("double"),
          "lexdiv" -> (expr(
            "size(array_distinct(filter(split(text, ' '), t -> t <> '')))")
            .cast("double") / nToks.cast("double"))))
        .where(col("rrf") >= 0.012).select(col("doc_id"))
      // inter-phase persist (the q_llm_pipeline lesson): the RRF gate is
      // three ranking jobs — without this, the pair self-join, the CC id
      // set, the quality join, and packShards' sizing collects each
      // recompute it (measured 17.8 s -> ~5 s at sf0.1 with the persist)
      val survivors = docs.join(gate, "doc_id").graftCheckpoint()
      val pairs = Dedup.jaccardFromItems(
        survivors.select(col("doc_id"), explode(expr(
          "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
          .as("g"))
          .distinct(),
        threshold = 0.5, dfCap = 100000, joinKeys = Seq("g"),
        spreadExplosion = true)
      val clusters = Dedup.dedupClusters(
        survivors.select(col("doc_id")), pairs.select(col("d1"), col("d2")))
      val reps = Dedup.clusterRepresentatives(clusters,
          survivors.select(col("doc_id"), col("n_chars").as("q")))
        .select(col("rep_doc_id").as("doc_id"))
      CorpusOps.packShards(docs.join(reps, "doc_id"), budgetTokens = 512)
        .orderBy(col("doc_id"))
    }),

    // reciprocal-rank fusion of three quality signals (length, token
    // count, lexical diversity) — every rank bucketed, no global window
    "q_llm_rrf" -> ((s, d) => {
      val nToks = expr("size(filter(split(text, ' '), t -> t <> ''))")
      CorpusOps.rrfFusion(Tables.documents(s, d), Seq(
          "chars" -> col("n_chars").cast("double"),
          "toks" -> nToks.cast("double"),
          "lexdiv" -> (expr(
            "size(array_distinct(filter(split(text, ' '), t -> t <> '')))")
            .cast("double") / nToks.cast("double"))))
        .orderBy(col("doc_id"))
    }),

    // prefix-filtered EXACT Jaccard join (All-Pairs): same semantics as
    // the inverted-index q_llm_jaccard but candidates only from rare-first
    // prefixes — exact at any token df, no dfCap approximation
    "q_llm_ppjoin" -> ((s, d) => {
      val toks = Tables.documents(s, d).where(col("doc_id") < 500)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "").distinct()
      Dedup.prefixJaccard(toks, threshold = 0.3)
        .orderBy(col("d1"), col("d2"))
    }),

    // A-ES weighted sampling without replacement: 50 docs ∝ n_chars,
    // md5-dyadic draw, round-before-rank ln keys
    "q_llm_weighted_sample" -> ((s, d) =>
      CurationOps.weightedSample(Tables.documents(s, d),
          col("n_chars"), k = 50)
        .orderBy(col("rn"))),

    // C4 within-doc rule: repeated 2-token segments inside one document
    // keep only their first occurrence (181 of the sf0.01 docs repeat at
    // least one segment — natural witness, nothing planted)
    "q_llm_intra_dedup" -> ((s, d) =>
      CorpusOps.intraDocDedup(
          CorpusOps.tokenChunks(Tables.documents(s, d), k = 2))
        .orderBy(col("doc_id"))),

    // curriculum interleave: quality-descending (n_chars) within source,
    // sources rotated round-robin; both ranks via the bucketed
    // parallel-prefix machinery — no global or per-source window
    "q_llm_curriculum" -> ((s, d) =>
      CorpusOps.curriculumInterleave(Tables.documents(s, d))
        .orderBy(col("position"))),

    // keep-best representative per near-dup cluster (trigram Jaccard
    // ≥ 0.5 on docs < 150 → connected components → argmax n_chars,
    // doc_id tiebreak) — the quality-aware upgrade of keep-first
    "q_llm_cluster_reps" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("doc_id") < 150)
      // the trigram postings feed jaccardFromItems THREE times (df-cap
      // semi-join, df groupBy, per-doc counts) — localCheckpoint runs the
      // explode+distinct shuffle ONCE instead of three times (the
      // pipeline2 lesson; measured 4.6 → 3.7 s settled at sf0.1)
      val pairs = Dedup.jaccardFromItems(
        docs.select(col("doc_id"), explode(expr(
          "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
          .as("g"))
          .distinct().graftCheckpoint(),
        threshold = 0.5, dfCap = 100000, joinKeys = Seq("g"),
        spreadExplosion = true)
      val clusters = Dedup.dedupClusters(
        docs.select(col("doc_id")), pairs.select(col("d1"), col("d2")))
      Dedup.clusterRepresentatives(clusters,
          docs.select(col("doc_id"), col("n_chars").as("q")))
        .orderBy(col("cluster_id"))
    }),

    // Bloom ingest dedup: filter built on docs < 300; the batch is docs
    // >= 300 PLUS re-keyed copies of 20 corpus docs (doc_id + 10000) —
    // planted true duplicates the filter must drop (Bloom has no false
    // negatives), so the witness is non-vacuous even though the fixture
    // has no natural cross-split dupes. xxhash64-pinned => rows-only;
    // FP-bound / merge-invariance properties in CurationOpsSpec.
    "q_llm_bloom_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(col("doc_id") < 300)
      val batch = docs.where(col("doc_id") >= 300)
        .unionByName(corpus.where(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 10000))
      CurationOps.bloomDedup(batch, corpus)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // content-defined chunking resync witness: every doc re-chunked with
    // a crawl-header prefix must share (almost) all chunk digests with
    // its original — boundaries re-sync within a chunk of the insertion,
    // which is the whole point of CDC over fixed-size chunking. Rolling
    // gear hash is engine-pinned => rows-only; the invariance floor and
    // reconstruction properties live in CorpusOpsSpec.
    "q_llm_cdc_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val orig = CorpusOps.cdcChunks(docs)
      val shifted = CorpusOps.cdcChunks(docs.withColumn("text",
        concat(lit("CRAWLDATE:2026-08-13 "), col("text"))))
      val n = orig.groupBy(col("doc_id"))
        .agg(countDistinct(col("digest")).as("n_chunks"))
      val shared = orig.select(col("doc_id"), col("digest")).distinct()
        .join(shifted.select(col("doc_id"), col("digest")).distinct(),
          Seq("doc_id", "digest"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      n.join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .orderBy(col("doc_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_llm_pipeline2" ->
      """WITH RECURSIVE sig AS (
           SELECT doc_id,
                  floor(CAST(n_chars AS DOUBLE) * 1e4 + 0.5) / 1e4 AS v1,
                  floor(CAST(len(list_filter(string_split(text, ' '),
                    t -> t <> '')) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS v2,
                  floor(CAST(len(list_distinct(list_filter(
                      string_split(text, ' '), t -> t <> ''))) AS DOUBLE) /
                    CAST(len(list_filter(string_split(text, ' '),
                      t -> t <> '')) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS v3
           FROM documents),
         rr AS (
           SELECT doc_id,
                  row_number() OVER (ORDER BY v1 DESC, doc_id) AS r1,
                  row_number() OVER (ORDER BY v2 DESC, doc_id) AS r2,
                  row_number() OVER (ORDER BY v3 DESC, doc_id) AS r3
           FROM sig),
         gate AS (
           SELECT doc_id FROM rr
           WHERE floor((1.0 / (60.0 + r1) + 1.0 / (60.0 + r2)
                        + 1.0 / (60.0 + r3)) * 1e6 + 0.5) / 1e6 >= 0.012),
         d AS (
           SELECT doc.doc_id, doc.text, doc.n_chars
           FROM documents doc JOIN gate ON doc.doc_id = gate.doc_id),
         tri AS (
           SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(text) - 2, 1) + 1),
                    i -> substr(text, CAST(i AS INT), 3))) AS g
           FROM d),
         cnt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
         p0 AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         prs AS (
           SELECT d1, d2 FROM p0
           JOIN cnt n1 ON d1 = n1.doc_id JOIN cnt n2 ON d2 = n2.doc_id
           WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM prs
                   UNION SELECT d2, d1 FROM prs),
         reach AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
         assign AS (
           SELECT d.doc_id, COALESCE(c2.comp, d.doc_id) AS cluster_id,
                  d.n_chars AS q
           FROM d LEFT JOIN comp c2 ON d.doc_id = c2.id),
         reps AS (
           SELECT cluster_id, doc_id FROM (
             SELECT cluster_id, doc_id,
                    row_number() OVER (PARTITION BY cluster_id
                      ORDER BY q DESC, doc_id ASC) AS rn
             FROM assign) WHERE rn = 1),
         t AS (
           SELECT d.doc_id,
                  COALESCE(len(list_filter(string_split(d.text, ' '),
                    x -> x <> '')), 0) AS n_tokens
           FROM d JOIN reps ON d.doc_id = reps.doc_id),
         c AS (
           SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                  SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens AS strt
           FROM t)
         SELECT doc_id, n_tokens,
                CAST(strt // 512 AS BIGINT) AS shard,
                CAST(strt % 512 AS BIGINT) AS offset
         FROM c ORDER BY doc_id""",
    "q_llm_rrf" ->
      """WITH s AS (
           SELECT doc_id,
                  floor(CAST(n_chars AS DOUBLE) * 1e4 + 0.5) / 1e4 AS v1,
                  floor(CAST(len(list_filter(string_split(text, ' '),
                    t -> t <> '')) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS v2,
                  floor(CAST(len(list_distinct(list_filter(
                      string_split(text, ' '), t -> t <> ''))) AS DOUBLE) /
                    CAST(len(list_filter(string_split(text, ' '),
                      t -> t <> '')) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS v3
           FROM documents),
         r AS (
           SELECT doc_id,
                  row_number() OVER (ORDER BY v1 DESC, doc_id) AS rank_chars,
                  row_number() OVER (ORDER BY v2 DESC, doc_id) AS rank_toks,
                  row_number() OVER (ORDER BY v3 DESC, doc_id) AS rank_lexdiv
           FROM s)
         SELECT doc_id, rank_chars, rank_toks, rank_lexdiv,
                floor((1.0 / (60.0 + rank_chars) + 1.0 / (60.0 + rank_toks)
                       + 1.0 / (60.0 + rank_lexdiv)) * 1e6 + 0.5) / 1e6 AS rrf
         FROM r ORDER BY doc_id""",
    "q_llm_ppjoin" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, t AS token FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents WHERE doc_id < 500) WHERE t <> ''),
         cnt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           FROM tok a JOIN tok b
             ON a.token = b.token AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT d1, d2,
                floor(CAST(c AS DOUBLE) / (n1.n + n2.n - c) * 10000 + 0.5)
                  / 10000 AS jac
         FROM pairs
         JOIN cnt n1 ON d1 = n1.doc_id
         JOIN cnt n2 ON d2 = n2.doc_id
         WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.3
         ORDER BY d1, d2""",
    "q_llm_weighted_sample" ->
      """WITH keyed AS (
           SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
                  floor(ln((CAST('0x' || substr(
                      md5('aes:' || doc_id), 1, 13) AS BIGINT) + 1.0)
                    / 4503599627370496.0)
                    / CAST(n_chars AS DOUBLE) * 1e6 + 0.5) / 1e6 AS key
           FROM documents WHERE n_chars > 0),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS rn
           FROM keyed)
         SELECT CAST(rn AS INT) AS rn, doc_id, weight, key
         FROM ranked WHERE rn <= 50 ORDER BY rn""",
    "q_llm_intra_dedup" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         seg AS (
           SELECT doc_id, gs AS pos,
                  array_to_string(list_slice(l, (gs-1)*2 + 1, gs*2), ' ') AS s
           FROM toks,
                unnest(generate_series(1,
                  CAST(ceil(len(l) / 2.0) AS BIGINT))) AS t(gs)),
         r AS (
           SELECT doc_id, pos, s,
                  row_number() OVER (PARTITION BY doc_id, md5(s)
                                     ORDER BY pos) AS rn
           FROM seg)
         SELECT doc_id, count(*) AS n_seg,
                CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dropped,
                string_agg(CASE WHEN rn = 1 THEN s END, ' ' ORDER BY pos)
                  AS text
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_curriculum" ->
      """WITH r AS (
           SELECT doc_id, source,
                  CAST(row_number() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
           FROM documents)
         SELECT CAST(row_number() OVER (ORDER BY rank, source) - 1
                     AS BIGINT) AS position,
                doc_id, source, rank
         FROM r ORDER BY position""",
    "q_llm_cluster_reps" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, text, n_chars FROM documents WHERE doc_id < 150),
         tri AS (
           SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(text) - 2, 1) + 1),
                    i -> substr(text, CAST(i AS INT), 3))) AS g
           FROM d),
         cnt AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
         p0 AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           FROM tri a JOIN tri b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS (
           SELECT d1, d2 FROM p0
           JOIN cnt n1 ON d1 = n1.doc_id JOIN cnt n2 ON d2 = n2.doc_id
           WHERE CAST(c AS DOUBLE) / (n1.n + n2.n - c) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         reach AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
         assign AS (
           SELECT d.doc_id, COALESCE(c2.comp, d.doc_id) AS cluster_id,
                  d.n_chars AS q
           FROM d LEFT JOIN comp c2 ON d.doc_id = c2.id),
         picked AS (
           SELECT cluster_id, doc_id, q,
                  row_number() OVER (PARTITION BY cluster_id
                    ORDER BY q DESC, doc_id ASC) AS rn
           FROM assign)
         SELECT a.cluster_id,
                max(CASE WHEN p.rn = 1 THEN p.doc_id END) AS rep_doc_id,
                count(*) AS n_members,
                max(a.q) AS best_q
         FROM assign a JOIN picked p
           ON a.cluster_id = p.cluster_id AND a.doc_id = p.doc_id
         GROUP BY a.cluster_id ORDER BY a.cluster_id""",
    "q_llm_boilerplate" ->
      """WITH toks AS (
           SELECT doc_id, source, string_split(text, ' ') AS l FROM documents),
         seg AS (
           SELECT doc_id, source, gs AS pos,
                  array_to_string(list_slice(l, (gs-1)*8 + 1, gs*8), ' ') AS s
           FROM toks,
                unnest(generate_series(1,
                  CAST(ceil(len(l) / 8.0) AS BIGINT))) AS t(gs)),
         nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         boiler AS (
           SELECT seg.source, md5(s) AS h
           FROM seg JOIN nd ON seg.source = nd.source
           GROUP BY seg.source, md5(s), n_docs
           HAVING count(DISTINCT doc_id) >=
                  greatest(2, CAST(ceil(n_docs * 0.05) AS BIGINT)))
         SELECT doc_id, count(*) AS n_seg,
                count(h) AS n_boiler,
                COALESCE(string_agg(CASE WHEN h IS NULL THEN s END,
                                    ' ' ORDER BY pos), '') AS text
         FROM seg LEFT JOIN boiler
           ON seg.source = boiler.source AND md5(seg.s) = boiler.h
         GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_chunk" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents
           WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 1)
         SELECT doc_id, gs AS chunk,
                CAST(least(32, len(l) - (gs-1)*24) AS BIGINT) AS n_toks,
                array_to_string(
                  list_slice(l, (gs-1)*24 + 1, (gs-1)*24 + 32), ' ')
                  AS chunk_text
         FROM toks,
              unnest(generate_series(1,
                CAST(ceil(greatest(len(l) - 32, 0) / 24.0) AS BIGINT) + 1))
                AS t(gs)
         ORDER BY doc_id, chunk""",
    "q_llm_syssample" ->
      """WITH c AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                  SUM(n_chars) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
           FROM documents WHERE n_chars >= 1)
         SELECT doc_id, weight,
                CAST(cum // 5000 - (cum - weight) // 5000 AS BIGINT) AS picks
         FROM c
         WHERE cum // 5000 > (cum - weight) // 5000
         ORDER BY doc_id""",
    "q_llm_diff" ->
      """WITH old AS (
           SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 11 <> 3),
         nw AS (
           SELECT doc_id,
                  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                           ELSE text END) AS h
           FROM documents WHERE doc_id % 11 <> 7)
         SELECT COALESCE(old.doc_id, nw.doc_id) AS doc_id,
                CASE WHEN old.h IS NULL THEN 'added'
                     WHEN nw.h IS NULL THEN 'removed'
                     WHEN old.h = nw.h THEN 'same'
                     ELSE 'changed' END AS status
         FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id
         ORDER BY doc_id""",
    "q_llm_novelty" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         grams AS (
           SELECT DISTINCT doc_id,
                  array_to_string(list_slice(l, gs, gs + 2), ' ') AS g
           FROM toks, unnest(generate_series(1, len(l) - 2)) AS t(gs)
           WHERE len(l) >= 3),
         ref AS (
           SELECT DISTINCT g FROM grams WHERE doc_id < 250)
         SELECT doc_id, count(*) AS n_grams,
                count(ref.g) AS n_seen,
                floor((count(*) - count(ref.g)) * 10000.0 / count(*) + 0.5)
                  / 10000 AS novelty
         FROM (SELECT * FROM grams WHERE doc_id >= 250) c
         LEFT JOIN ref ON c.g = ref.g
         GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_oov" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
         t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
         vocab AS (
           SELECT token FROM (
             SELECT token, count(*) AS n FROM t GROUP BY 1
             ORDER BY n DESC, token ASC LIMIT 200)),
         flag AS (
           SELECT doc_id, t.token,
                  CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END AS oov
           FROM t LEFT JOIN vocab ON t.token = vocab.token)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(oov) AS BIGINT) AS n_oov,
                floor(sum(oov) * 10000.0 / count(*) + 0.5) / 10000 AS oov_rate
         FROM flag GROUP BY doc_id ORDER BY doc_id""")
}
