package graft.genomics

import org.apache.spark.sql.Dataset

/** External-process map (SURVEY §2A R10/R17): stream a partition's lines
  * through a subprocess (aligner stand-in), yielding its stdout lines.
  *
  * This is the reference's per-sample `seal seqal` / `bwa mem` fan-out
  * (`workflow.py:491-503`, `baseline_workflow.py:143-147`) turned into a
  * partition-level operator: repartition by sample first and every sample's
  * reads flow through its own process instances, concurrently across the
  * cluster — the fan-out and the "monitored join" (R11) collapse into
  * Spark's own task scheduling and fail-fast retry.
  *
  * Failure contract (R11, `workflow.py:464-471`): a nonzero exit code throws
  * in the task → Spark retries the task, then fails the job, cancelling the
  * other partitions — the kill-all semantics of the reference's `_wait`.
  * Writer runs on a separate thread to avoid pipe-buffer deadlock; reader
  * pulls stdout lazily.
  */
object ExternalProcessMap {

  def pipePartitions(lines: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(false)
        val proc = pb.start()
        val writer = new Thread(() => {
          val w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
          try it.foreach { l => w.write(l); w.newLine() }
          finally w.close()
        })
        writer.setDaemon(true)
        writer.start()
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        new Iterator[String] {
          private var nextLine = r.readLine()
          def hasNext: Boolean = {
            if (nextLine == null) {
              val code = proc.waitFor()
              if (code != 0)
                throw new RuntimeException(s"external process $cmd exited $code")
            }
            nextLine != null
          }
          def next(): String = {
            val l = nextLine; nextLine = r.readLine(); l
          }
        }
      }
    }
  }

  /** Per-sample isolated pipe (R10): one process group per sample key. */
  def pipeBySample(reads: Dataset[PrqRead], cmd: Seq[String]): Dataset[(String, String)] = {
    import reads.sparkSession.implicits._
    reads.map(r => (r.sample, Codecs.toPrqLine(r)))
      .groupByKey(_._1)
      .flatMapGroups { (sample: String, rows: Iterator[(String, String)]) =>
        val pb = new ProcessBuilder(cmd: _*)
        val proc = pb.start()
        val writer = new Thread(() => {
          val w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
          try rows.foreach { case (_, l) => w.write(l); w.newLine() }
          finally w.close()
        })
        writer.setDaemon(true)
        writer.start()
        val out = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
          .getLines().toVector
        val code = proc.waitFor()
        if (code != 0)
          throw new RuntimeException(s"aligner for $sample exited $code")
        out.iterator.map(sample -> _)
      }
  }
}
