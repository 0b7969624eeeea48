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
  def spanPairs(docs: DataFrame, len: Int = 30, dfCap: Int = 1000): DataFrame =
    pairsFromSpans(spans(docs, len), dfCap)

  /** [[spanPairs]] over the winnowed selection: same join shape on a
    * ~window/2× smaller index. n_spans counts shared SELECTED spans (a
    * lower bound on shared spans); detection of clones of length
    * ≥ len + window - 1 is complete by the winnowing guarantee. */
  def spanPairsWinnowed(docs: DataFrame, len: Int = 30, window: Int = 8,
                        dfCap: Int = 1000): DataFrame =
    pairsFromSpans(winnowedSpans(docs, len, window), dfCap)

  private def pairsFromSpans(sp: DataFrame, dfCap: Int): DataFrame = {
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

  /** Winnowed span selection (Schleimer et al., SIGMOD'03 — the MOSS
    * fingerprinting scheme): keep only spans whose hash is a minimum of
    * some `window`-long run of consecutive span positions. Expected
    * selection density is ~2/(window+1) of all spans — the index shrinks
    * ~w/2-fold — while the winnowing guarantee holds: any shared substring
    * of length ≥ len + window - 1 still produces at least one shared
    * selected span, so [[spanPairs]]-style joins on the winnowed set
    * detect every sufficiently long clone. This is the documented scale
    * path for span dedup at 100 TB: selection is a per-doc map (HOF chain,
    * no shuffle), and the inverted index downstream is ~w/2× smaller.
    *
    * Ties select every position carrying the minimal hash value of a
    * covering window (a superset of classic rightmost-tie winnowing) — the
    * guarantee only strengthens. Selection work is O(spans · window) per
    * document: each position checks only the ≤ window window-minima that
    * cover it, never the whole document. */
  def winnowedSpans(docs: DataFrame, len: Int, window: Int): DataFrame =
    docs
      .where(length(col("text")) >= len)
      .withColumn("sp", expr(
        s"transform(sequence(1, length(text) - ${len - 1}), " +
        s"i -> substring(text, i, $len))"))
      .withColumn("h", expr("transform(sp, s -> xxhash64(s))"))
      // per-window minima over positions; guard docs shorter than one window
      .withColumn("wins", expr(
        s"CASE WHEN size(h) >= $window THEN " +
        s"  transform(sequence(1, size(h) - ${window - 1}), " +
        s"    i -> array_min(slice(h, i, $window))) " +
        s"ELSE array(array_min(h)) END"))
      // 1-based position P = p+1 is covered by windows P-window+1 .. P;
      // slicing `wins` to that range keeps selection O(window) per position
      .select(col("doc_id"), explode(expr(
        s"filter(sp, (s, p) -> array_contains(" +
        s"slice(wins, greatest(p + 2 - $window, 1), $window), " +
        s"element_at(h, p + 1)))"))
        .as("span"))
      .distinct()

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
    * map-side semi-join over 100 TB.
    *
    * The broadcast hint forces a broadcast REGARDLESS of size, so an
    * oversized eval suite would not "silently flip to a shuffle" — it would
    * OOM the driver. To keep the 100 TB claim from degrading either way,
    * the eval gram index is counted first (one job over the SMALL side
    * only): up to `maxBroadcastGrams` distinct grams it broadcasts as
    * before; above that the join explicitly falls back to a shuffle-hash
    * semi-join (the corpus-side gram shuffle is then a deliberate, logged
    * cost — never an accident) rather than attempting a multi-GB broadcast. */
  def contamination(corpus: DataFrame, evalSet: DataFrame, n: Int = 5,
                    maxBroadcastGrams: Long = 10L * 1000 * 1000): DataFrame = {
    val evalGrams = tokenNgrams(evalSet, n).select(col("g")).distinct()
    val nGrams = evalGrams.count()
    val keyed =
      if (nGrams <= maxBroadcastGrams) broadcast(evalGrams)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"contamination: eval gram index has $nGrams distinct grams " +
          s"(> $maxBroadcastGrams) — falling back to a shuffle-hash join; " +
          "the corpus side will shuffle on gram")
        evalGrams.hint("shuffle_hash")
      }
    tokenNgrams(corpus, n)
      .join(keyed, Seq("g"))
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
