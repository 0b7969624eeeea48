package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training pipelines (SURVEY §2B
  * north-star), alongside [[Dedup]]: exact-span (substring) duplicate
  * detection, benchmark decontamination, and deterministic split
  * assignment — the standard steps between raw crawl and training shards.
  *
  * Scale design (100 TB):
  *  - span dedup: inverted-index join on fixed-length character spans with
  *    a document-frequency cap, same Σdf² cost envelope as the token
  *    Jaccard join — never doc×doc. Stride-1 spans are exact; at corpus
  *    scale winnow first (keep each window's min-hash span) to trade
  *    recall for index size without touching this join's shape.
  *  - decontamination: the benchmark side is SMALL by definition (eval
  *    sets are thousands of docs), so its n-gram index broadcasts; the
  *    corpus is scanned once, map-side, no corpus shuffle.
  *  - split assignment: a pure map over a digest of the NORMALIZED text —
  *    exact duplicates land in the same split by construction, so dedup
  *    ordering doesn't leak train data into eval splits.
  */
object CorpusOps {

  /** (doc_id, span): every distinct character span of length `len` per
    * document (stride 1). Documents shorter than `len` yield no spans. */
  def spans(docs: DataFrame, len: Int): DataFrame =
    docs
      .where(length(col("text")) >= len)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${len - 1}), " +
        s"i -> substring(text, i, $len))")).as("span"))
      .distinct()

  /** Exact-span duplicate pairs: (d1, d2, n_spans) for every doc pair
    * sharing at least one `len`-char span, with the number of distinct
    * shared spans. Spans in more than `dfCap` docs (boilerplate) are
    * dropped from the index — the df cap bounds the join's Σdf² blowup
    * exactly like the token-Jaccard cap. */
  def spanPairs(docs: DataFrame, len: Int = 30, dfCap: Int = 1000): DataFrame = {
    val sp = spans(docs, len)
    val capped = sp.join(
      sp.groupBy(col("span")).agg(count(lit(1)).as("df"))
        .where(col("df") <= dfCap),
      Seq("span"), "left_semi")
    capped.as("a")
      .join(capped.as("b"),
        col("a.span") === col("b.span") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_spans"))
  }

  /** (doc_id, g): distinct `n`-token grams per document (tokens split on
    * single spaces, grams re-joined with one space). */
  def tokenNgrams(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
        s"i -> array_join(slice(toks, i, $n), ' '))")).as("g"))
      .distinct()

  /** Benchmark decontamination: corpus docs sharing at least one `n`-token
    * gram with any eval document, with the count of distinct matching
    * grams — (doc_id, n_hits). The eval side is small by definition, so
    * its gram index is broadcast and the corpus never shuffles: this is a
    * map-side semi-join over 100 TB. */
  def contamination(corpus: DataFrame, evalSet: DataFrame, n: Int = 5): DataFrame = {
    val evalGrams = tokenNgrams(evalSet, n).select(col("g")).distinct()
    tokenNgrams(corpus, n)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Deterministic train/val/test assignment from the first hex digit of
    * md5(normalized text): 0-b → train (12/16), c-d → val (2/16),
    * e-f → test (2/16). Digest-of-text (not doc id) keeps exact duplicates
    * in one split, so later dedup cannot move eval data into train. A pure
    * codegen'd map — embarrassingly parallel at any scale. */
  def splitColumn(text: Column): Column = {
    val h = substring(md5(lower(trim(text))), 1, 1)
    when(h.isin("c", "d"), lit("val"))
      .when(h.isin("e", "f"), lit("test"))
      .otherwise(lit("train"))
  }

  /** (doc_id, split) for every document. */
  def splitAssign(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), splitColumn(col("text")).as("split"))
}
