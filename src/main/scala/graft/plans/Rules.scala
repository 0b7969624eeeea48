package graft.plans

import graft.functions.{CosineSim, DotProductF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rules for graft's native expressions (SURVEY §4.3 —
  * the `Rule[LogicalPlan]` surface; injected via GraftExtensions or
  * `Rules.register(spark)`).
  *
  * `SimplifySelfSimilarity`: `cosine_sim(x, x)` is identically 1.0 for any
  * non-null, non-zero vector — fold it to a literal so the whole per-row
  * loop disappears from the generated code. Null propagation is preserved:
  * the rewrite only fires when the child is deterministic and non-nullable
  * (a nullable child must keep the expression to return null on null input).
  * `dot_f(x, x)` is left alone (it's a real norm computation).
  */
object SimplifySelfSimilarity extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b)
          if a == b && a.deterministic && !a.nullable =>
        Literal(1.0, DoubleType)
    }
}

object Rules {
  /** Idempotent injection into an existing session's experimental methods. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(SimplifySelfSimilarity))
      spark.experimental.extraOptimizations = cur :+ SimplifySelfSimilarity
  }
}
