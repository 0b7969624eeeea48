package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class WebOpsSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("perDomainCap equals the single-window reference (salted ≡ plain)") {
    val docs = Tables.documents(spark, sf001)
      .withColumn("domain", concat(col("source"), lit("-"), col("doc_id") % 7))
      // multiple input splits so the salt actually varies
      .repartition(8)
    val got = WebOps.perDomainCap(docs, col("domain"), col("doc_id"), cap = 4)
      .select("doc_id").as[Long].collect().sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("doc_id"))
    val want = docs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 4).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("fuzzyMatch blocked join equals the unblocked brute force at maxDist=1") {
    val left = Seq("tabl", "scna", "valu", "zzz", "spark").toDF("s")
    val right = Seq("table", "scan", "value", "spark", "spork", "park").toDF("s")
    val got = WebOps.fuzzyMatch(left, right, maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    val want = (for {
      l <- Seq("tabl", "scna", "valu", "zzz", "spark")
      r <- Seq("table", "scan", "value", "spark", "spork", "park")
      d = levenshteinLocal(l, r) if d <= 1
      // the block (first char + length) must not LOSE any ≤1-edit pair:
      // one edit changes length by ≤1 and can only change the first char
      // via a substitution/deletion there — those pairs are asserted absent
      if l.head == r.head
    } yield (l, r, d)).toSet
    assert(got == want && got.nonEmpty)
    // completeness caveat made explicit: pairs differing in the first char
    // are outside the block by design (document, don't silently miss)
    assert(!got.contains(("park", "spark", 1)))
  }

  private def levenshteinLocal(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("snapshotMerge statuses partition the key space") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = WebOps.snapshotMerge(old, nw, "doc_id")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "carried", 2L -> "unchanged",
      3L -> "updated", 4L -> "inserted"))
  }

  test("snapshotMerge: null text classifies by KEY presence, not digest") {
    val old = Seq((1L, null.asInstanceOf[String]), (2L, "b"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = WebOps.snapshotMerge(old, nw, "doc_id")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    // 1: only in old (null text) → carried, NOT inserted; 4: only in nw
    // (null text) → inserted; 5: null text on both sides → unchanged
    assert(got == Map(1L -> "carried", 2L -> "unchanged",
      4L -> "inserted", 5L -> "unchanged"), got.toString)
  }

  test("canonicalUrl merges the root slash with the empty path") {
    val urls = Seq("https://example.com", "https://example.com/",
      "https://example.com/a/", "https://example.com/a").toDF("u")
    val canon = urls.select(WebOps.canonicalUrl(col("u")).as("c"))
      .as[String].collect()
    assert(canon(0) === canon(1), s"${canon(0)} vs ${canon(1)}")
    assert(canon(2) === canon(3))
    assert(canon.distinct.length === 2)
  }

  test("fellegiSunter scores a NULL field comparison as neutral evidence") {
    val l = Seq(("k", "alice", null.asInstanceOf[String]))
      .toDF("blk", "l_name", "l_mail")
    val r = Seq(("k", "alice", "a@x.com")).toDF("blk", "r_name", "r_mail")
    val got = WebOps.fellegiSunter(l, r, "blk",
      Seq("name" -> (col("l_name") === col("r_name")),
          "mail" -> (col("l_mail") === col("r_mail"))),
      Seq((0.9, 0.1), (0.9, 0.01)), threshold = 0.0).collect()
    // name agrees (+log2(9)); mail is NULL → 0, not the −log2(9.9)
    // disagreement penalty that would sink the pair below threshold
    assert(got.length === 1, "incomplete record must still match")
    val score = got(0).getAs[Double]("score")
    assert(math.abs(score - math.log(9.0) / math.log(2.0)) < 1e-9, s"$score")
  }

  test("quantizeInt8 reconstruction error is bounded by scale/2 per element") {
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val rows = Similarity.quantizeInt8(emb)
      .join(emb, "vec_id")
      .select(col("vec_id"), col("codes"), col("scale"), col("embedding"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      val scale = r.getDouble(2)
      val x = r.getSeq[Float](3)
      assert(codes.length == x.length)
      codes.zip(x).foreach { case (q, xv) =>
        assert(math.abs(q) <= 127)
        // clamp can bite only on |x| = max|x| (its own rounding), where the
        // error is still ≤ scale/2
        assert(math.abs(q * scale - xv.toDouble) <= scale / 2 + 1e-12)
      }
    }
  }

  test("fellegiSunter: log2 weights, threshold, and blocking") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10, "alice", 5.0), (2L, 10, "bobby", 7.0),
      (9L, 99, "alice", 5.0)).toDF("lkey", "blk", "lname", "lbal")
    val right = Seq((1L, 10, "alice", 5.2), (2L, 10, "carol", 99.0))
      .toDF("rkey", "blk", "rname", "rbal")
    val got = WebOps.fellegiSunter(left, right, "blk",
        fields = Seq(
          "name" -> (col("lname") === col("rname")),
          "bal" -> (abs(col("lbal") - col("rbal")) < lit(1.0))),
        mu = Seq((0.9, 0.01), (0.8, 0.05)), threshold = 5.0)
      .select("lkey", "rkey", "score", "is_match")
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def w(m: Double, u: Double) = math.log(m / u) / math.log(2.0)
    def wd(m: Double, u: Double) = math.log((1 - m) / (1 - u)) / math.log(2.0)
    // (1,1): both agree; (1,2)/(2,1): both disagree; (2,2): both disagree
    assert(got((1L, 1L)) == ((w(0.9, 0.01) + w(0.8, 0.05), 1)))
    assert(got((2L, 2L)) == ((wd(0.9, 0.01) + wd(0.8, 0.05), 0)))
    // key 9 sits in block 99 with no right-side rows: blocked out
    assert(!got.keySet.exists(_._1 == 9L))
    // 2x2 block pairs all formed (blocking is the ONLY pair bound)
    assert(got.size == 4)
  }
}
