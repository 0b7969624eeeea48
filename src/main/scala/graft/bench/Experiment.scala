package graft.bench

import java.nio.file.{Files, Paths, StandardOpenOption}

/** One benchmark attempt record — the reference harness's CSV schema
  * (`experiment.py:259-281`): repeat_num, attempt_num, retcode, log_file,
  * total_secs, bcl_secs, align_secs.
  */
case class AttemptInfo(repeatNum: Int, attemptNum: Int, retcode: Int,
                       logFile: String, totalSecs: Double,
                       bclSecs: Double, alignSecs: Double) {
  def toCsvRow: String =
    s"$repeatNum,$attemptNum,$retcode,$logFile,$totalSecs,$bclSecs,$alignSecs"
}

/** Outcome of one workload run: per-stage seconds (the reference logs
  * "Seconds for bcl conversion" / "Seconds for alignment",
  * `workflow.py:546-548`). */
case class StageTimes(bclSecs: Double, alignSecs: Double)

/** Benchmark harness replicating `experiment.py` semantics (SURVEY §5.2 #7):
  * N repeats × ≤maxRetries attempts, cool-down sleep between runs, fail-fast
  * abort once a repeat exhausts its retries, append-only CSV with
  * header-once, and regex extraction of stage times from run logs (R20).
  */
object Experiment {

  val CsvHeader = "repeat_num,attempt_num,retcode,log_file,total_secs,bcl_secs,align_secs"

  // the reference's own regexes (`experiment.py:43-44`)
  private val BclRe = """Seconds for bcl conversion:\s*(\d+\.\d+)""".r
  private val AlignRe = """Seconds for alignment:\s*(\d+\.\d+)""".r

  /** R20: extract (bclSecs, alignSecs) from a run log's text. */
  def parseStageTimes(log: String): (Option[Double], Option[Double]) =
    (BclRe.findFirstMatchIn(log).map(_.group(1).toDouble),
     AlignRe.findFirstMatchIn(log).map(_.group(1).toDouble))

  /** R22: append rows to `csvPath`, writing the header only if absent. */
  def appendCsv(csvPath: String, rows: Seq[AttemptInfo]): Unit = {
    val p = Paths.get(csvPath)
    val needHeader = !Files.exists(p) || Files.size(p) == 0
    val sb = new StringBuilder
    if (needHeader) sb.append(CsvHeader).append('\n')
    rows.foreach(r => sb.append(r.toCsvRow).append('\n'))
    Files.writeString(p, sb.toString,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Run `workload` `repeats` times with ≤`maxRetries` attempts each
    * (`experiment.py:338-359`). Throws after a repeat exhausts retries
    * (fail-fast, `experiment.py:353-357`). `sleepMs` is the between-run
    * cool-down (`experiment.py:20,310-311`; 60 s in the reference, injected
    * here so tests run instantly). `preRun` is the cache-drop barrier slot
    * (R23). Returns every attempt, failed ones included.
    */
  def run(workload: Int => StageTimes, repeats: Int = 3, maxRetries: Int = 3,
          sleepMs: Long = 0L, csvPath: Option[String] = None,
          preRun: () => Unit = () => (), logDir: Option[String] = None)
      : Seq[AttemptInfo] = {
    val out = Seq.newBuilder[AttemptInfo]
    for (rep <- 1 to repeats) {
      var attempt = 0
      var ok = false
      while (!ok) {
        attempt += 1
        if (rep > 1 || attempt > 1) Thread.sleep(sleepMs)
        preRun()
        val t0 = System.nanoTime()
        val logFile = logDir.map(d => s"$d/run_${rep}_$attempt.log").getOrElse("")
        val (ret, stages) =
          try { val st = workload(rep); (0, st) }
          catch { case e: Throwable =>
            if (logFile.nonEmpty)
              Files.writeString(Paths.get(logFile), e.toString)
            (1, StageTimes(-1, -1))
          }
        val total = (System.nanoTime() - t0) / 1e9
        val info = AttemptInfo(rep, attempt, ret, logFile, total,
          stages.bclSecs, stages.alignSecs)
        out += info
        csvPath.foreach(p => appendCsv(p, Seq(info)))
        if (ret == 0) ok = true
        else if (attempt >= maxRetries)
          throw new RuntimeException(
            s"repeat $rep failed $maxRetries attempts — aborting experiment")
      }
    }
    out.result()
  }
}
