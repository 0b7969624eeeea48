package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based algebraic laws (SURVEY §5.2 #4): relational identities the
  * engine must honor on arbitrary inputs, ScalaCheck-generated.
  */
class AlgebraSpec extends SparkSpec {

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 8), Gen.choose(-50, 50)))

  private def df(rows: List[(Int, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "v")
  }

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("filter composition equals conjunction") {
    checkProp(Prop.forAll(rowsGen) { rows =>
      val d = df(rows)
      val a = d.filter(col("k") > 2).filter(col("v") < 10)
      val b = d.filter(col("k") > 2 && col("v") < 10)
      a.collect().toSet == b.collect().toSet && a.count() == b.count()
    })
  }

  test("union-all count is the sum of counts") {
    checkProp(Prop.forAll(rowsGen, rowsGen) { (r1, r2) =>
      df(r1).union(df(r2)).count() == r1.size + r2.size
    })
  }

  test("left-semi equals inner join against distinct keys") {
    checkProp(Prop.forAll(rowsGen, rowsGen) { (r1, r2) =>
      val d1 = df(r1); val d2 = df(r2)
      val semi = d1.join(d2, Seq("k"), "left_semi")
      val innerDistinct = d1.join(d2.select("k").distinct(), Seq("k"))
      semi.collect().toSet == innerDistinct.collect().toSet
    })
  }

  test("except equals distinct anti-join on all columns") {
    checkProp(Prop.forAll(rowsGen, rowsGen) { (r1, r2) =>
      val d1 = df(r1); val d2 = df(r2)
      val ex = d1.except(d2)
      val anti = d1.distinct().join(d2, Seq("k", "v"), "left_anti")
      ex.collect().toSet == anti.collect().toSet
    })
  }

  test("anti-join complements semi-join (partition of distinct rows)") {
    checkProp(Prop.forAll(rowsGen, rowsGen) { (r1, r2) =>
      val d1 = df(r1).distinct(); val d2 = df(r2)
      val semi = d1.join(d2, Seq("k"), "left_semi").collect().toSet
      val anti = d1.join(d2, Seq("k"), "left_anti").collect().toSet
      (semi & anti).isEmpty && (semi | anti) == d1.collect().toSet
    })
  }

  test("global top-k equals sorted take(k) under a total tiebreak") {
    checkProp(Prop.forAll(rowsGen) { rows =>
      val got = df(rows).orderBy(col("v").desc, col("k").asc).limit(5)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val want = rows.sortBy { case (k, v) => (-v, k) }.take(5)
      got == want
    })
  }

  test("group-by count partitions the row count") {
    checkProp(Prop.forAll(rowsGen) { rows =>
      df(rows).groupBy("k").count().agg(sum("count")).collect()
        .headOption.forall(r => rows.isEmpty || r.getLong(0) == rows.size)
    })
  }
}
