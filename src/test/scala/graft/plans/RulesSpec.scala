package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {

  test("cosine_sim(x, x) folds to a literal for non-nullable x") {
    val s = spark
    GraftFunctions.register(s)
    Rules.register(s)
    val df = Tables.embeddings(s, sf0001)
      .select(coalesce(col("embedding"),
        array(lit(1.0f))).as("e")) // non-nullable by construction
      .select(expr("cosine_sim(e, e)").as("c"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("cosine_sim"), s"self-cosine not folded:\n$opt")
    assert(df.collect().forall(_.getDouble(0) == 1.0))
  }

  test("nullable input is NOT folded (null propagation preserved)") {
    val s = spark
    GraftFunctions.register(s)
    Rules.register(s)
    val df = Tables.embeddings(s, sf0001)
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("cosine_sim"), s"nullable self-cosine wrongly folded:\n$opt")
  }

  test("distinct vectors are untouched by the rule") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Rules.register(s)
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c"))
    assert(df.head().getDouble(0) == 0.0)
  }
}
