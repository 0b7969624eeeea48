package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener

/** One micro-batch's health metrics as captured by [[MetricsListener]]. */
case class BatchMetrics(batchId: Long, numInputRows: Long,
                        stateRows: Long, watermark: String)

/** Streaming observability: a StreamingQueryListener that captures the
  * per-batch progress metrics an operator dashboard needs — input rows,
  * state-store size, watermark position — into a bounded in-memory ring
  * (keep the newest `keep`). The engine-side analogue of the reference's
  * poll-loop job monitoring (R11, `workflow.py:435-475`): there the
  * harness polls YARN for job state every 2 s; here Spark pushes progress
  * per micro-batch and the listener distills it.
  *
  * Driver-side only and O(keep) memory — safe at any stream rate; attach
  * with `spark.streams.addListener`, detach with `removeListener`.
  */
class MetricsListener(keep: Int = 256) extends StreamingQueryListener {
  private val buf = ArrayBuffer.empty[BatchMetrics]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    val state = p.stateOperators
    val stateRows = if (state == null) 0L
      else state.map(_.numRowsTotal).sum
    val wm = Option(p.eventTime)
      .flatMap(m => Option(m.get("watermark"))).getOrElse("")
    buf += BatchMetrics(p.batchId, p.numInputRows, stateRows, wm)
    if (buf.length > keep) buf.remove(0, buf.length - keep)
  }

  /** Snapshot of the captured batches (oldest first). */
  def snapshot: Seq[BatchMetrics] = synchronized { buf.toList }
}
