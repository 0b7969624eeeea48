package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._
  import Blocklist.AhoCorasick

  test("aho-corasick: classic she/he/his/hers golden (failure links)") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    // "ushers": she (1..3), he (2..3), hers (2..5)
    val hits = ac.distinct("ushers")
    assert((0 until 4).filter(hits.get) == Seq(0, 1, 3))
    assert(ac.occurrences("ushers") == 3L)
    assert(ac.distinctCount("ahishers") == 4)
  }

  test("aho-corasick: overlapping self-similar patterns count every end") {
    val ac = AhoCorasick.build(Seq("aa", "aaa"))
    // "aaaa": aa ends at 1,2,3 (3×); aaa ends at 2,3 (2×)
    assert(ac.occurrences("aaaa") == 5L)
    assert(ac.distinctCount("aaaa") == 2)
    assert(ac.distinctCount("ab") == 0)
    assert(ac.occurrences("") == 0L)
  }

  test("aho-corasick ≡ naive indexOf scan on random small-alphabet text") {
    val rnd = new scala.util.Random(13)
    val pats = Seq("ab", "ba", "aab", "bba", "abab", "b", "aaa")
    val ac = AhoCorasick.build(pats)
    for (_ <- 1 to 300) {
      val text = Seq.fill(rnd.nextInt(40))(
        if (rnd.nextBoolean()) 'a' else 'b').mkString
      val naiveDistinct = pats.zipWithIndex
        .filter { case (p, _) => text.contains(p) }.map(_._2).toSet
      val naiveOcc = pats.map { p =>
        Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
          .takeWhile(_ >= 0).size.toLong
      }.sum
      val hits = ac.distinct(text)
      assert((0 until pats.length).filter(hits.get).toSet == naiveDistinct,
        s"distinct mismatch on '$text'")
      assert(ac.occurrences(text) == naiveOcc, s"occurrence mismatch on '$text'")
    }
  }

  test("annotate / filterBlocked: map-side dictionary matching on a corpus") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "lorem ipsum dolor"),
      (3L, "brown dog and quick cat"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val phrases = Seq("quick", "brown", "absent phrase")
    val ann = Blocklist.annotate(docs, "text", phrases)
    assert(ann.where(col("id") === 1L).select("blocked_terms")
      .as[Int].head() == 2)
    assert(ann.where(col("id") === 2L).select("blocked_terms")
      .as[Int].head() == 0)
    assert(ann.where(col("id") === 4L).select("blocked_terms")
      .as[Int].head() == 0, "NULL text is clean, never an NPE")
    val kept = Blocklist.filterBlocked(docs, "text", phrases)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
    // build-time hygiene fails loudly
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "a")))
  }
}
