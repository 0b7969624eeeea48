package graft.tools

import graft.SparkEntry

/** Measures the reliable-checkpoint knob's cost on the iterative loops:
  * runs the loop-heavy slice twice on the same local session — default
  * `localCheckpoint` vs `spark.graft.checkpoint.reliable=true` (filesystem
  * checkpoint) — and prints per-query seconds for both modes. This is the
  * number BASELINE.md quotes for "one extra materialization per
  * checkpoint call": the knob should cost a bounded constant factor on
  * loop-bound queries and ~nothing elsewhere.
  *
  * Usage: tools/run.sh graft.tools.CkptProbe [sfDir]
  */
object CkptProbe {

  private val loops = Seq(
    "q_graph_pagerank", "q_graph_ppr", "q_graph_hits", "q_graph_wcc",
    "q_graph_bfs", "q_llm_dedup_clusters", "q_llm_bpe", "q_llm_pipeline")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.build(graft.core.Sessions.Conf(
      master = "local[8]", appName = "graft-ckpt-probe", numTasks = 8))
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt-probe")
    def timeAll(): Map[String, Double] = loops.map { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).toJSON.collect()
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    try {
      timeAll() // warm (JIT, codegen cache, file listing)
      val local = timeAll()
      spark.conf.set(graft.core.Checkpoints.reliableKey, "true")
      spark.conf.set(graft.core.Checkpoints.dirKey, ckptDir.toString)
      val reliable = timeAll()
      val rows = loops.map { n =>
        f""""$n":{"local":${local(n)}%.2f,"reliable":${reliable(n)}%.2f,""" +
        f""""ratio":${reliable(n) / local(n)}%.2f}"""
      }
      println(s"""{"mode":"ckpt-probe","sf":"${sfDir.split('/').last}",""" +
        rows.mkString("", ",", "}"))
    } finally spark.stop()
  }
}
