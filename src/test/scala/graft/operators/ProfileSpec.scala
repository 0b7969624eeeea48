package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  test("columnProfile counts nulls/distincts and renders native-order min/max") {
    val df = Seq(
      (1L, Some("b"), Some(10L)), (2L, Some("a"), Some(9L)),
      (3L, None, Some(10L)), (4L, Some("a"), None)
    ).toDF("id", "s", "v")
    val got = Profile.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    // native numeric ordering: max is 10, not "9" (string order would say 9)
    assert(got("v") == ((4L, 1L, 2L, "9", "10")))
  }

  test("columnProfile survives hostile column names (dots, spaces, quotes, hyphens)") {
    // these names land inside generated stack() SQL — unquoted they break
    // the parse ("a.b" resolves as struct access) or corrupt the label
    // literal ("o'neill" terminates the string early)
    val names = Seq("a.b", "with space", "o'neill", "hy-phen", "back`tick")
    val df = Seq((1L, "x", "y", "z", "w"), (2L, "x", null, "z", "q"))
      .toDF(("id" +: names.take(4)): _*)
      .withColumnRenamed("id", names.last)
    val got = Profile.columnProfile(df, names)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == names.toSet, s"labels mangled: ${got.keySet}")
    assert(got("with space") == ((2L, 1L, 1L)))  // one null, one distinct
    assert(got("back`tick") == ((2L, 0L, 2L)))
    assert(got("o'neill") == ((2L, 0L, 1L)))
  }

  test("equiDepthHistogram: equal counts on uniform data, skew-robust") {
    // 100 distinct uniform values, 4 buckets -> exactly 25 each (25.75,
    // 50.5, 75.25 boundaries land between distinct values)
    val uni = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("x")
    val got = Profile.equiDepthHistogram(uni, "x", buckets = 4)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(25L, 25L, 25L, 25L), got.toSeq.toString)
    assert(got.head._3 == 1.0 && got.last._4 == 100.0)
    // a skewed column still splits by frequency: one hot value dominates
    // its bucket(s), the tail spreads over the rest — no empty ranges the
    // way equi-width would produce
    val skew = (Seq.fill(900)(5.0) ++ (1 to 100).map(_.toDouble + 1000))
      .map(Tuple1(_)).toDF("x")
    val gs = Profile.equiDepthHistogram(skew, "x", buckets = 4)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(gs.map(_._2).sum == 1000L)
    // the hot value concentrates >= 3/4 of rows in its single bucket
    assert(gs.map(_._2).max >= 900L, gs.toSeq.toString)
  }

  test("checks detect planted violations of every kind") {
    val fact = Seq(
      (1L, Some(10L), 5.0), (1L, Some(10L), 3.0),   // duplicate key
      (2L, None, 1.0),                              // null fk
      (3L, Some(99L), -2.0)                         // dangling fk + bad range
    ).toDF("k", "fk", "price")
    val dim = Seq(10L).toDF("dk")
    val got = Profile.checks(fact, "k", "fk", dim, "fk", "dk",
        col("price") > 0, "range(price > 0)")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("unique(k)") == ((1L, false)))
    assert(got("not_null(fk)") == ((1L, false)))
    // null fk rows also fail the left_anti referential probe (no match)
    assert(got("ref(fk -> dk)") == ((2L, false)))
    assert(got("range(price > 0)") == ((1L, false)))
  }

  test("psiDrift separates identical from shifted distributions") {
    val base = (1 to 1000).map(i => i.toDouble).toDF("v")
    val same = (1 to 1000).map(i => i.toDouble).toDF("v")
    val shifted = (1 to 1000).map(i => i * 1.5).toDF("v")
    def psi(cur: org.apache.spark.sql.DataFrame) =
      Profile.psiDrift(base, cur, "v")
        .agg(sum(col("contrib"))).as[Double].head()
    val stable = psi(same)
    val drifted = psi(shifted)
    assert(stable < 0.01, s"identical distributions read PSI=$stable")
    assert(drifted > 0.25, s"1.5x shift read PSI=$drifted (threshold 0.25)")
    // every bucket row exists even when empty on one side
    assert(Profile.psiDrift(base, shifted, "v").count() == 10)
  }

  test("checks pass on clean data") {
    val fact = Seq((1L, Some(10L), 5.0), (2L, Some(10L), 3.0))
      .toDF("k", "fk", "price")
    val dim = Seq(10L).toDF("dk")
    val got = Profile.checks(fact, "k", "fk", dim, "fk", "dk",
        col("price") > 0, "range(price > 0)")
      .select("passed").as[Boolean].collect()
    assert(got.length == 4 && got.forall(identity))
  }

  test("chiSquareIndependence: zero under independence, N under perfect 2x2 association") {
    // perfectly independent 2x2: every cell 25 of 100
    val ind = (1 to 100).map(i =>
      (if (i % 2 == 0) "x" else "y", if (i % 4 < 2) "p" else "q"))
      .toDF("a", "b")
    val gi = Profile.chiSquareIndependence(ind, "a", "b").collect()(0)
    assert(gi.getLong(0) == 4L && gi.getLong(1) == 1L)
    assert(gi.getDouble(2) == 0.0, s"chi2 = ${gi.getDouble(2)}")
    // perfect association: a determines b -> chi2 = N for 2x2
    val dep = (1 to 100).map(i =>
      (if (i % 2 == 0) "x" else "y", if (i % 2 == 0) "p" else "q"))
      .toDF("a", "b")
    // n_cells is the FULL grid (zero cells included — they carry e each)
    val gd = Profile.chiSquareIndependence(dep, "a", "b").collect()(0)
    assert(gd.getLong(0) == 4L && gd.getLong(1) == 1L)
    assert(gd.getDouble(2) == 100.0, s"chi2 = ${gd.getDouble(2)}")
  }

  test("functionalDeps: exact g3 on a planted violation") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "z"))
      .toDF("a", "b")
    val got = Profile.functionalDeps(df, Seq("a" -> "b", "b" -> "a"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // a→b: group a=1 keeps 2 of 3 rows (majority x), 1 removed; g3=1/4
    assert(got(("a", "b")) == ((2L, 1L, 1L, 0.25)), s"${got(("a", "b"))}")
    // b→a holds exactly
    assert(got(("b", "a")) == ((3L, 0L, 0L, 0.0)), s"${got(("b", "a"))}")
  }
}
