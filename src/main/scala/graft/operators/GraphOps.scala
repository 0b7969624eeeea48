package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation. The canonical use is a
  * domain-level quality prior (CommonCrawl-style harmonic/PageRank
  * weighting feeding the quality classifier): vertices are domains —
  * orders of magnitude fewer than pages — so the iteration runs on an
  * AGGREGATED edge table, never the raw crawl.
  */
object GraphOps {

  /** Weighted PageRank with fixed iteration count and uniform
    * teleportation. `edges` is (src, dst) with multiplicity (parallel
    * edges add weight). Returns (node, rank).
    *
    * Scale shape: one aggregation collapses the raw edge list to
    * (src, dst, weight) — at crawl scale this is the domain-adjacency
    * table, |domains|² worst case but power-law sparse in practice. The
    * weighted edge table and per-src out-weights are computed once,
    * cached, and pre-partitioned on `src` — each of the `iters` rounds
    * then shuffles only the |V|-row rank table to the same partitioning
    * (the |E| side never re-shuffles, the [[Dedup.connectedComponents]]
    * loop lesson), aggregates contributions by dst, and left-joins back
    * to the vertex set so sinks (no in-edges) keep their teleport mass.
    * `localCheckpoint` truncates lineage each round. Dangling vertices
    * (no OUT-edges) are supported: their mass is redistributed uniformly,
    * computed as 1 − Σ(mass entering edges) rather than a second join.
    *
    * Determinism: per-node rank is a sum of double contributions — stable
    * to ~1 ulp under re-ordering, so catalog results round to 4 dp
    * (established round-before-rank contract). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1, s"iters=$iters damping=$damping")
    val spark = edges.sparkSession
    val e = edges.toDF("src", "dst")
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).cast("double").as("w"))
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // (src, dst, share): fraction of src's rank that flows along this edge;
    // partitioned on src once, reused every round
    // size the loop's shuffles from the MEASURED edge count (the
    // connectedComponents loop lesson): per-round cost on small aggregated
    // graphs is otherwise pure task-scheduling overhead across conf-many
    // mostly-empty partitions; a crawl-scale edge table lands back on the
    // session's configured parallelism (~2M edges per partition)
    val eCount = e.cache().count()
    val confParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.max(1L, math.min(confParts.toLong,
      (eCount + 2000000L - 1) / 2000000L)).toInt
    val flow = e.join(deg, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("share"))
      .repartition(loopParts, col("src"))
      .cache()
    val nodes = flow.select(col("src").as("node"))
      .union(flow.select(col("dst").as("node")))
      .distinct()
      .cache()
    val n = nodes.count().toDouble
    require(n > 0, "pageRank on an empty graph")
    e.unpersist()
    val teleport = (1.0 - damping) / n
    // dangling = vertices with no out-edges; their mass is read each round
    // from the CHECKPOINTED |V|-row rank table (never re-touching |E|),
    // and the read is skipped entirely when the graph has none
    val danglingNodes = nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .cache()
    val hasDangling = danglingNodes.count() > 0

    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    try {
      var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
      var it = 0
      while (it < iters) {
        val dMass =
          if (!hasDangling) 0.0
          else danglingNodes.join(ranks, "node")
            .agg(coalesce(sum(col("rank")), lit(0.0))).first().getDouble(0)
        val contrib = flow.join(ranks, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(col("share") * col("rank")).as("in_mass"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(teleport) + lit(damping) *
              (coalesce(col("in_mass"), lit(0.0)) + lit(dMass / n))).as("rank"))
          .localCheckpoint()
        it += 1
      }
      ranks
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      flow.unpersist()
      nodes.unpersist()
      danglingNodes.unpersist()
    }
  }
}
