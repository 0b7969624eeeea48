package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only plan-capture tool for the optimization rounds — not part of the
  * driver contract. Writes `.explain("formatted")` for the named catalog
  * queries to `<outDir>/<name>_<suffix>.txt`, building each DataFrame with
  * the same session conf the bench uses (Sessions.local → SPARK_GRAFT_CPUS).
  *
  * Usage: ExplainDump <sfDir> <outDir> <suffix> <name1,name2,...>
  *
  * Note: queries that replay a stream inside their builder (runStream) or
  * that build a snaplog fixture execute those side effects while planning —
  * the captured plan is the final batch plan over the drained/staged result,
  * which is what the sink-side comparison needs; micro-batch counts for
  * stream queries are recorded separately in OPTIMIZATION_r16.md.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: ExplainDump <sfDir> <outDir> <suffix> <names>")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = graft.core.Sessions.build(
      graft.core.Sessions.local(appName = "graft-explain"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        (s"-- $name @ $sfDir (explain formatted, $suffix)\n" + txt)
          .getBytes("UTF-8"))
      println(s"EXPLAIN $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
