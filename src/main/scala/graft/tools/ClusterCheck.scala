package graft.tools

import java.security.MessageDigest

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Multi-JVM validation gate: runs a representative catalog slice under
  * `local-cluster[2,4,3072]` — Spark's standalone-cluster-in-miniature,
  * where executors are SEPARATE JVMs that really serialize tasks,
  * broadcast kernels, and UDAF buffers over the wire — and asserts every
  * result hash-identical to the same slice under `local[8]`.
  *
  * Why this exists: `local[n]` shares one JVM, so three whole classes of
  * cluster bugs can't fire there — closure/kernel serialization (the PQ
  * codebook broadcasts, the custom `Expression` kernels), UDAF buffer
  * encode/decode between partial and final (hll/theta/tdigest), and
  * driver-held state accidentally referenced from tasks. This gate is the
  * cheapest real evidence those survive a 1000-executor deployment.
  *
  * The slice covers every custom-kernel path (native top-k + session-id
  * plans, sketch UDAFs, PQ/ADC + JW/geohash/ngram codegen expressions)
  * plus one query per catalog family, including a stateful streaming pair.
  *
  * Mechanics: executors are launched by the in-process Worker as child
  * JVMs; they inherit this JVM's classpath via
  * `spark.executor.extraClassPath = java.class.path` and the JDK-17
  * `--add-opens` set via `spark.executor.extraJavaOptions` (the same list
  * `build.sbt` forks with — matching
  * `org.apache.spark.launcher.JavaModuleOptions`).
  *
  * Canonical hash: `df.toJSON` (binary → base64, doubles → shortest
  * round-trip — JVM-stable), rows sorted, sha-256 over the sorted lines.
  *
  * Usage: tools/run.sh graft.tools.ClusterCheck [sfDir]
  * Prints one JSON line: {"mode":…,"n":…,"match":…,"mismatch":[…]}.
  */
object ClusterCheck {

  /** Every custom-kernel query + one per family (SURVEY §2 families). */
  val slice: Seq[String] = Seq(
    // custom plans (SparkStrategy/SparkPlan, AggregateWindowFunction)
    "q_win_topk_native", "q_win_session_native",
    // sketch UDAFs (partial/final buffer serialization across JVMs)
    "q_agg_hll_custom", "q_agg_hll_rollup", "q_agg_tdigest",
    "q_agg_theta", "q_agg_theta_rollup",
    // codegen Expression kernels + broadcast codebooks
    "q_llm_ann_pq", "q_llm_ann_ivfpq", "q_fn_ngram_gen",
    "q_join_jw", "q_geo_geohash",
    // one per family
    "q_scan_parquet", "q_scan_bucketed_join", "q_proj_expr", "q_filt_null",
    "q_distinct", "q_join_shuffle", "q_agg_q1", "q_win_rank",
    "q_evt_funnel", "q_fn_regex", "q_geo_gridjoin", "q_graph_pagerank",
    "q_llm_minhash_pairs", "q_mb_rules", "q_profile_histogram",
    "q_set_except", "q_sort_topk", "q_sql_h01", "q_web_linkage",
    "q_genomics_e2e",
    // stateful streaming (micro-batch state store on executor JVMs)
    "q_stream_tumbling", "q_stream_distinct")

  private val addOpens = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")
    .map(p => s"--add-opens java.base/$p=ALL-UNNAMED").mkString(" ")

  def resultHash(spark: SparkSession, name: String, sfDir: String): (Long, String) = {
    val rows = SparkEntry.queries(name)(spark, sfDir).toJSON.collect().sorted
    val md = MessageDigest.getInstance("SHA-256")
    rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString.take(16))
  }

  def runSlice(master: String, extra: Map[String, String],
               sfDir: String,
               names: Seq[String] = slice): Map[String, (Long, String)] = {
    val spark = graft.core.Sessions.build(graft.core.Sessions.Conf(
      master = master, appName = s"graft-clustercheck",
      numTasks = 8, extra = extra))
    try names.map { n =>
      n -> (try resultHash(spark, n, sfDir)
            catch { case e: Throwable =>
              System.err.println(s"[clustercheck] $n ERROR: ${e.getMessage}")
              (-1L, s"ERROR:${e.getClass.getSimpleName}") })
    }.toMap
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    // `--all` widens the slice to the ENTIRE catalog (the full-parity
    // gate; ~10× the runtime of the default slice)
    val all = args.contains("--all")
    val names = if (all) SparkEntry.queries.keys.toSeq.sorted else slice
    val sfDir = args.filterNot(_ == "--all").headOption
      .getOrElse("/root/testdata/sf0.001")
    val clusterMaster = "local-cluster[2,4,3072]"
    val local = runSlice("local[8]", Map.empty, sfDir, names)
    // executors run from their own work dir — absolutize every classpath
    // entry (tools/run.sh passes target/scala-2.13/classes relative)
    val absCp = sys.props("java.class.path")
      .split(java.io.File.pathSeparator)
      .map(e => new java.io.File(e).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)
    val cluster = runSlice(clusterMaster, Map(
      "spark.executor.memory" -> "2048m",
      "spark.executor.extraClassPath" -> absCp,
      "spark.executor.extraJavaOptions" -> addOpens), sfDir, names)
    // an ERROR result is a gate failure even when both modes error
    // identically — equal exceptions validate nothing
    val mismatch = names.filter(n => local(n) != cluster(n) ||
      local(n)._2.startsWith("ERROR") || cluster(n)._2.startsWith("ERROR"))
    val json = s"""{"mode":"$clusterMaster","sf":"${sfDir.split('/').last}",""" +
      s""""n":${names.size},"match":${names.size - mismatch.size},""" +
      s""""mismatch":[${mismatch.map(n =>
        s""""$n(local=${local(n)},cluster=${cluster(n)})"""").mkString(",")}]}"""
    println(json)
    if (mismatch.nonEmpty) sys.exit(1)
  }
}
