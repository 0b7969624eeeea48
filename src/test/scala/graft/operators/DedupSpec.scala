package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Recall/precision properties of the approximate dedup operators against
  * the exact token-Jaccard ground truth (SURVEY §5.2 property tests).
  */
class DedupSpec extends SparkSpec {

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

  test("simhash blocking is candidate-complete vs brute-force hamming") {
    val s = spark
    val maxDist = 8
    // brute force over all simhash pairs of the sf0.001 corpus
    val hashes = Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      i <- hashes.indices.iterator; j <- (i + 1) until hashes.length
      (id1, h1) = hashes(i); (id2, h2) = hashes(j)
      if java.lang.Long.bitCount(h1 ^ h2) <= maxDist
    } yield if (id1 < id2) (id1, id2) else (id2, id1)).toSet
    val found = Dedup.simhashPairs(docs, maxDist = maxDist)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truth,
      s"blocking must find exactly the ${truth.size} true pairs " +
        s"(missed ${(truth -- found).size}, extra ${(found -- truth).size})")
    assert(truth.nonEmpty, "fixture must exercise at least one near pair")
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
