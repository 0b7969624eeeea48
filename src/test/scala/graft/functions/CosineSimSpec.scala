package graft.functions

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** The native expressions must be bit-compatible with the HOF formulations
  * the oracle queries use, null-safe, and must run inside codegen. */
class CosineSimSpec extends SparkSpec {

  private def hofCosine = expr(
    """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
      |          cast(0.0 as double), (acc, v) -> acc + v)
      | / (sqrt(aggregate(a, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double)))
      |  * sqrt(aggregate(b, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))))
      |""".stripMargin.replaceAll("\n", " "))

  test("cosine_sim is bit-identical to the higher-order formulation") {
    val s = spark
    GraftFunctions.register(s)
    val emb = Tables.embeddings(s, sf0001).limit(50)
      .select(col("embedding").as("a"))
      .crossJoin(Tables.embeddings(s, sf0001).limit(5)
        .select(col("embedding").as("b")))
    val diff = emb.select(
      expr("cosine_sim(a, b)").as("native"), hofCosine.as("hof"))
      .where(col("native") =!= col("hof"))
    assert(diff.count() == 0, "native and HOF cosine disagree")
  }

  test("dot_f matches sequential double accumulation and handles nulls") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val vals = df.select(expr("dot_f(a, b)")).as[Double].collect()
    assert(vals(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(vals(1) == 0.0)
    val withNull = df.select(expr("dot_f(a, cast(null as array<float>))"))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("native expressions execute inside whole-stage codegen") {
    val s = spark
    GraftFunctions.register(s)
    val df = Tables.embeddings(s, sf0001)
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
    }.getOrElse(df.queryExecution.executedPlan.toString)
    assert(plan.contains("*(1)"), s"expression fell out of codegen:\n$plan")
    val selfSim = df.collect().map(_.getDouble(0))
    assert(selfSim.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("extension class registers via spark.sql.extensions contract") {
    val ext = new GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(exts) // must not throw; function injection is exercised above
  }

  test("function builders reject wrong arity on both registration paths") {
    // the SAME builders back register() and the extensions injector, so
    // pinning them here covers simhash64(a, b) resolved either way
    import org.apache.spark.sql.catalyst.expressions.Literal
    val one = Seq[org.apache.spark.sql.catalyst.expressions.Expression](
      Literal(1))
    val two = one ++ one
    intercept[IllegalArgumentException](GraftFunctions.simhashBuilder(two))
    intercept[IllegalArgumentException](GraftFunctions.cosineBuilder(one))
    intercept[IllegalArgumentException](GraftFunctions.dotBuilder(one ++ two))
    // and a registry-resolved wrong-arity call fails analysis loudly
    GraftFunctions.register(spark)
    val err = intercept[Exception](
      spark.sql("SELECT simhash64(array('a'), array('b'))").collect())
    assert(err.getMessage.contains("simhash64 takes exactly 1 argument"),
      s"unexpected analysis error: ${err.getMessage}")
  }
}
