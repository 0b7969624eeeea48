package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics

/** Adjudicates the `q_llm_dedup_clusters` fresh-JVM bimodality (round-10
  * observation: 3.06 vs ~6.5 s across fresh JVMs; round-11 probes read
  * #1 = 5.7–7.7 s, #2 = 3.5–4.3 s in EVERY JVM — i.e. a deterministic
  * first-run tax, not true bimodality). Hypothesis: Janino whole-stage
  * codegen compilation of this query's many distinct plan shapes
  * (trigram explode, df-cap window, LSH joins, the CC hook+shortcut
  * round) is paid once per JVM and hits Spark's generated-class cache on
  * every later run — data-size-independent.
  *
  * The probe proves it two ways:
  *  - reads Spark's own `CodegenMetrics.METRIC_COMPILATION_TIME`
  *    histogram around each run: run 1 shows hundreds–thousands of ms of
  *    Janino compilation, later runs ~0;
  *  - primes at sf0.001 first (same plan shapes, trivial data): the
  *    FIRST sf0.1 run then measures like a warm one.
  *
  * Usage: tools/run.sh graft.tools.CodegenProbe [sfBig] [sfSmall]
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfBig = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sfSmall = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Sessions.build(
      graft.core.Sessions.local(appName = "graft-codegen-probe"))
    spark.sparkContext.setLogLevel("WARN")
    def compileMs(): Long = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount * h.getSnapshot.getMean).toLong
    }
    def run(label: String, dir: String): Unit = {
      val c0 = compileMs()
      val n0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_llm_dedup_clusters")(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label: wall=$secs%.2f s, janinoCompiles=" +
        f"${CodegenMetrics.METRIC_COMPILATION_TIME.getCount - n0}, " +
        f"janinoMs≈${compileMs() - c0}")
    }
    val mode = sys.env.getOrElse("PROBE_MODE", "cold")
    if (mode == "primed") run("prime@small", sfSmall)
    run("run1@big", sfBig)
    run("run2@big", sfBig)
    run("run3@big", sfBig)
    spark.stop()
  }
}
