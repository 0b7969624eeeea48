package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AggregateWindowFunction, AttributeReference, EqualTo, Expression, GreaterThan, If, Literal, Or, Subtract}
import org.apache.spark.sql.types.{DataType, LongType}

/** `session_id(epoch_ts, gap)` — a native AGGREGATE WINDOW FUNCTION (the
  * `RowNumber`/`RankLike` extension point, the last custom-expression rung
  * after scalar/UDAF/strategy): over `(PARTITION BY key ORDER BY ts)` it
  * assigns 1-based session ids, opening a new session on the first row
  * and whenever the gap to the previous row EXCEEDS `gap` (strictly —
  * an event at exactly lastEvent+gap still merges, the q_win_session /
  * q_stream_session boundary contract).
  *
  * The state machine is written as UPDATE EXPRESSIONS, not an eval loop,
  * so WindowExec runs it through the same bound-expression aggregate
  * processor as the built-in ranking functions — one running-frame pass,
  * no per-row closure. Declaratively it replaces the two-step
  * lag+cumulative-sum spelling (`q_win_session`) with one window column.
  */
case class GapSessionId(ts: Expression, gap: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(ts, gap)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ts.dataType == LongType && gap.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint ts, bigint gap), got " +
      s"${ts.dataType.simpleString}, ${gap.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "session_id"
  override def nullable: Boolean = false

  private lazy val sessionCount =
    AttributeReference("sessionCount", LongType, nullable = false)()
  private lazy val prevTs =
    AttributeReference("prevTs", LongType, nullable = false)()

  // Long.MinValue marks "no previous row" — epoch timestamps never hit it
  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(sessionCount, prevTs)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(Long.MinValue))

  override val updateExpressions: Seq[Expression] = Seq(
    If(Or(EqualTo(prevTs, Literal(Long.MinValue)),
          GreaterThan(Subtract(ts, prevTs), gap)),
      Add(sessionCount, Literal(1L)),
      sessionCount),
    ts)

  override val evaluateExpression: Expression = sessionCount

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren(0), gap = newChildren(1))
}
