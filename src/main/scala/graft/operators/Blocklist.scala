package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern substring matching for corpus curation — the blocklist
  * step of C4/Dolma-style pipelines (filter or annotate documents that
  * contain any of k phrases, k in the thousands: profanity lists, spam
  * templates, boilerplate markers). A regex alternation
  * `(p1|p2|...|pk)` backtracks per position per branch and dies at
  * dictionary scale; the Aho–Corasick automaton matches ALL k patterns
  * in ONE pass per document, O(|text| + hits), independent of k.
  *
  * Scale shape: the PHRASES broadcast (dictionary-sized, a few MB for
  * 100k phrases); the automaton builds ONCE PER EXECUTOR from the
  * broadcast (a process-wide cache keyed by the phrase list — build
  * cost is O(Σ|p|), amortized over every partition the executor scans);
  * matching is a map-side `udf` column — no shuffle, no driver
  * round-trip, whole-corpus cost is exactly one text scan. At 100 TB
  * this is the difference between "one pass" and "k regex passes".
  *
  * Matching is case-sensitive on the raw string — callers wanting
  * case-folding lower() both sides (keeps the cross-engine contract
  * trivial: `contains(text, phrase)`). */
object Blocklist {

  /** Aho–Corasick automaton: trie + BFS failure links, output sets
    * merged along the failure chain at build time (so hits at a node
    * are O(hits) to enumerate, no chain walk at match time). */
  final class AhoCorasick private (
      next: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int],
      out: Array[Array[Int]],
      val nPatterns: Int) {

    @inline private def step(state0: Int, c: Char): Int = {
      var s = state0
      var g = next(s).get(c)
      while (g == null && s != 0) { s = fail(s); g = next(s).get(c) }
      if (g == null) 0 else g.intValue()
    }

    /** Distinct pattern ids occurring in `text`. */
    def distinct(text: String): java.util.BitSet = {
      val hits = new java.util.BitSet(nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val o = out(s)
        var j = 0
        while (j < o.length) { hits.set(o(j)); j += 1 }
        i += 1
      }
      hits
    }

    /** Number of DISTINCT patterns occurring in `text`. */
    def distinctCount(text: String): Int = distinct(text).cardinality()

    /** Total occurrence count, overlaps included (every (pattern, end
      * position) pair counts once) — the spec's cross-check metric. */
    def occurrences(text: String): Long = {
      var n = 0L
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        n += out(s).length
        i += 1
      }
      n
    }
  }

  object AhoCorasick {
    def build(patterns: Seq[String]): AhoCorasick = {
      require(patterns.nonEmpty, "empty blocklist")
      require(patterns.forall(_.nonEmpty), "empty phrase in blocklist")
      require(patterns.distinct == patterns,
        s"duplicate phrases in blocklist")
      val next = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val outB = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Set.empty[Int])
      patterns.zipWithIndex.foreach { case (p, id) =>
        var s = 0
        p.foreach { c =>
          val g = next(s).get(c)
          s = if (g != null) g.intValue()
          else {
            next += new java.util.HashMap[Character, Integer]()
            outB += scala.collection.mutable.Set.empty[Int]
            next(s).put(c, next.length - 1)
            next.length - 1
          }
        }
        outB(s) += id
        ()
      }
      val fail = new Array[Int](next.length)
      val q = scala.collection.mutable.Queue.empty[Int]
      next(0).values().forEach(v => q += v.intValue())
      while (q.nonEmpty) {
        val u = q.dequeue()
        next(u).forEach { (c, vI) =>
          val v = vI.intValue()
          q += v
          var f = fail(u)
          while (f != 0 && next(f).get(c) == null) f = fail(f)
          val fg = next(f).get(c)
          fail(v) = if (fg != null && fg.intValue() != v) fg.intValue() else 0
          // BFS order: fail(v) is shallower, its out set is final
          outB(v) ++= outB(fail(v))
          ()
        }
      }
      new AhoCorasick(next.toArray, fail, outB.map(_.toArray.sorted).toArray,
        patterns.length)
    }
  }

  /** Per-executor automaton cache: the broadcast ships the PHRASES (a
    * compact string array); each executor builds the automaton once and
    * every partition reuses it. Keyed by identity of the broadcast value
    * — one entry per blocklist per executor lifetime. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, AhoCorasick]()
  private def acFor(phrases: Array[String]): AhoCorasick =
    cache.computeIfAbsent(phrases, _ => AhoCorasick.build(phrases.toSeq))

  /** Annotate each row with the number of DISTINCT blocklist phrases its
    * `textCol` contains (`termCol`, 0 for clean or NULL text) — one
    * automaton pass per document, map-side. */
  def annotate(df: DataFrame, textCol: String, phrases: Seq[String],
      termCol: String = "blocked_terms"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(phrases.toArray)
    val f = udf { (text: String) =>
      if (text == null) 0 else acFor(bc.value).distinctCount(text)
    }
    df.withColumn(termCol, f(col(textCol)))
  }

  /** Keep only documents containing NONE of the blocklist phrases — the
    * curation filter itself. */
  def filterBlocked(df: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(phrases.toArray)
    val clean = udf { (text: String) =>
      text == null || acFor(bc.value).distinctCount(text) == 0
    }
    df.where(clean(col(textCol)))
  }
}
