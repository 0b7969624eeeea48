package graft.genomics

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** End-to-end pipeline orchestration — the reference driver's semantics
  * (`workflow.py:512-548`) re-expressed over Spark actions:
  *
  *  Stage 1: decode + filter + demux + partitioned PRQ sink (one Spark job).
  *  Stage 2: per-sample alignment, ALL samples launched concurrently
  *    (`workflow.py:503`) as parallel actions on one SparkSession; Spark's
  *    scheduler takes the place of YARN app polling (R11).
  *  Fail-fast: first sample failure cancels the remaining jobs via the
  *    shared job group (`workflow.py:464-471`'s kill-all).
  *  Eager cleanup (`remove_output`, `workflow.py:37,450-452`): each sample's
  *    output is deleted as soon as its action completes, bounding peak
  *    storage — the property that matters when the intermediate is tens of
  *    TB.
  */
object Pipeline {

  final case class Result(samples: Seq[String], alignedCounts: Map[String, Long],
                          failed: Option[Throwable])

  /** Run stage 1 into `prqDir`, then align each sample concurrently with
    * `align` (sample, lines) => aligned lines; `onSampleDone` is the eager
    * cleanup hook, called with each sample's name as it finishes.
    */
  def run(spark: SparkSession, runDir: String, rs: ReadStructure,
          sheet: Seq[(String, String)], prqDir: String,
          alignCmd: Seq[String],
          onSampleDone: String => Unit = _ => ())
      : Result = {
    // Stage 1 (R1-R8): decode → chastity filter → demux → drop Undetermined
    // → partitioned gzip PRQ
    val reads = Demux.demux(
      Bcl.applyFilter(Bcl.decodeRun(spark, runDir, rs)), sheet)
    Codecs.writePartitionedGzip(Demux.dropUndetermined(reads), prqDir)

    // R9: sample discovery over the materialized sink
    val samples = {
      import spark.implicits._
      Codecs.readPrq(spark, prqDir).map(_._1).distinct().collect().toSeq.sorted
    }

    // Stage 2 (R10/R11): concurrent per-sample alignment, fail-fast
    implicit val ec: ExecutionContext = ExecutionContext.global
    val firstError = new AtomicReference[Throwable](null)
    val counts = new ConcurrentLinkedQueue[(String, Long)]()
    val jobGroup = s"graft-align-${System.nanoTime()}"
    val futures = samples.map { sample =>
      Future {
        spark.sparkContext.setJobGroup(jobGroup, s"align $sample",
          interruptOnCancel = true)
        import spark.implicits._
        val lines = Codecs.readPrq(spark, prqDir)
          .filter(_._1 == sample).map(_._2)
        val n = ExternalProcessMap.pipePartitions(lines, alignCmd).count()
        counts.add(sample -> n)
        onSampleDone(sample) // eager remove_output slot
      }.andThen {
        case Failure(e) =>
          // kill-all: first failure cancels every sibling action
          if (firstError.compareAndSet(null, e))
            spark.sparkContext.cancelJobGroup(jobGroup)
        case Success(_) => ()
      }
    }
    futures.foreach(f => Try(Await.result(f, Duration.Inf)))
    val out = scala.jdk.CollectionConverters.IteratorHasAsScala(
      counts.iterator()).asScala.toMap
    Result(samples, out, Option(firstError.get()))
  }
}
