package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  /** Local reference PageRank: same recurrence, plain Scala. */
  private def localPageRank(edges: Seq[(Long, Long)], iters: Int,
                            damping: Double): Map[Long, Double] = {
    val w = edges.groupBy(identity).map { case (e, es) => e -> es.size.toDouble }
    val outw = w.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outw.contains).map(rank).sum
      val in = w.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((s, _), wt) => rank(s) * wt / outw(s) }.sum
      }
      rank = nodes.map(v => v ->
        ((1 - damping) / n + damping * (in.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    rank
  }

  test("pageRank matches a local recompute and sums to 1") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 2), (2, 3), (3, 1), (4, 1), (4, 3), (5, 4), (1, 5))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 12)
      .as[(Long, Double)].collect().toMap
    val want = localPageRank(edges, 12, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("dangling vertices redistribute mass uniformly (Σrank stays 1)") {
    // node 9 has only in-edges — without redistribution its absorbed mass
    // would leak and Σrank would drift below 1
    val edges = Seq[(Long, Long)]((1, 9), (2, 9), (1, 2), (2, 1), (3, 1), (1, 3))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 15)
      .as[(Long, Double)].collect().toMap
    val want = localPageRank(edges, 15, 0.85)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the sink still accumulates more than teleport mass
    assert(got(9) > 0.15 / 7)
  }

  test("higher-degree hubs outrank leaves on a star") {
    val edges = (2L to 9L).flatMap(i => Seq((i, 1L), (1L, i)))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 10)
      .as[(Long, Double)].collect().toMap
    assert((2L to 9L).forall(i => got(1L) > got(i)))
  }
}
