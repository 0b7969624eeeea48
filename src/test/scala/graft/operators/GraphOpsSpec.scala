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

  /** Local reference PPR: teleport/dangling mass to the seed set. */
  private def localPpr(edges: Seq[(Long, Long)], iters: Int,
                       damping: Double, seeds: Set[Long]): Map[Long, Double] = {
    val w = edges.groupBy(identity).map { case (e, es) => e -> es.size.toDouble }
    val outw = w.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val m = nodes.count(seeds)
    val tp = nodes.map(v => v -> (if (seeds(v)) 1.0 / m else 0.0)).toMap
    var rank = tp
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outw.contains).map(rank).sum
      val in = w.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((s, _), wt) => rank(s) * wt / outw(s) }.sum
      }
      rank = nodes.map(v => v ->
        ((1 - damping) * tp(v) +
          damping * (in.getOrElse(v, 0.0) + dangling * tp(v)))).toMap
    }
    rank
  }

  test("personalizedPageRank: local parity, Σ=1, unreachable stays exactly 0") {
    val s = spark
    // community A (1-2-3 triangle-ish), weak bridge to B (4-5), plus an
    // isolated pair 20-21 unreachable from the seeds
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 4), (4, 5), (5, 4),
      (20, 21), (21, 20))
    val seeds = Set(1L, 2L)
    val got = GraphOps.personalizedPageRank(
        edges.toDF("src", "dst"),
        seeds.toSeq.toDF("node"), iters = 12)
      .as[(Long, Double)].collect().toMap
    val want = localPpr(edges, 12, 0.85, seeds)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // no walk from {1,2} reaches the isolated pair — identically zero
    assert(got(20L) == 0.0 && got(21L) == 0.0)
    // seed community holds more mass than the bridge community
    assert(got(1L) + got(2L) + got(3L) > got(4L) + got(5L))
  }

  test("higher-degree hubs outrank leaves on a star") {
    val edges = (2L to 9L).flatMap(i => Seq((i, 1L), (1L, i)))
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 10)
      .as[(Long, Double)].collect().toMap
    assert((2L to 9L).forall(i => got(1L) > got(i)))
  }

  /** Local reference BFS: plain Scala level expansion. */
  private def localBfs(edges: Seq[(Long, Long)], src: Long): Map[Long, Long] = {
    val adj = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      next.foreach(n => dist += n -> d)
      frontier = next
    }
    dist
  }

  test("bfsLevels: path graph distances are exact, unreachable absent") {
    // path 1-2-3-4-5 plus disconnected 8-9
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 5), (8, 9))
    val got = GraphOps.bfsLevels(edges.toDF("a", "b"), src = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("bfsLevels: eccentricity exactly maxDepth completes instead of throwing") {
    // path 1-2-3: eccentricity 2; maxDepth = 2 finishes the BFS on the
    // last allowed round, with no confirming empty round left to run
    val edges = Seq[(Long, Long)]((1, 2), (2, 3))
    val got = GraphOps.bfsLevels(edges.toDF("a", "b"), src = 1L, maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // genuinely truncated BFS still fails loudly
    val e = intercept[IllegalStateException] {
      GraphOps.bfsLevels(Seq[(Long, Long)]((1, 2), (2, 3), (3, 4))
        .toDF("a", "b"), src = 1L, maxDepth = 2).collect()
    }
    assert(e.getMessage.contains("still expanding"), e.getMessage)
  }

  test("bfsLevels: shortest path wins over longer alternatives") {
    // 1-2-3-4 chain plus shortcut 1-4; also orientation/dup noise
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (1, 4), (4, 1), (2, 1))
    val got = GraphOps.bfsLevels(edges.toDF("a", "b"), src = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("bfsLevels matches the local recompute on the doc fixture graph") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val raw = docs.select((col("doc_id") % 60).as("a"),
        ((col("doc_id") * 31 + col("n_chars")) % 60).as("b"))
    val edges = raw.as[(Long, Long)].collect().toSeq
    val want = localBfs(edges, src = 0L)
    val got = GraphOps.bfsLevels(raw, src = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(want.size > 10, "fixture graph too disconnected to be a witness")
    assert(want.values.max >= 2, "trivial diameter — not a real BFS witness")
  }

  /** Local reference triangle count: brute-force over canonical edges. */
  private def localTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct.toSet
    val nodes = (e.map(_._1) ++ e.map(_._2)).toSeq.sorted
    val tris = for {
      (a, b) <- e.toSeq; c <- nodes
      if c > b && e.contains((a, c)) && e.contains((b, c))
    } yield (a, b, c)
    val cnt = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    nodes.map(n => n -> cnt.getOrElse(n, 0L)).toMap
  }

  test("triangleCounts: K4 + pendant — exact counts, degrees, clustering") {
    val k4 = Seq[(Long, Long)]((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val edges = k4 :+ (1L, 5L)
    val got = GraphOps.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // every K4 node sits in C(3,2)=3 triangles; the pendant in none
    assert(got(1L) == ((4L, 3L, 0.5)))   // 2*3/(4*3)
    Seq(2L, 3L, 4L).foreach(n => assert(got(n) == ((3L, 3L, 1.0)), s"node $n"))
    assert(got(5L) == ((1L, 0L, 0.0)))
  }

  test("triangleCounts: triangle-free path graph is all zero") {
    val edges = (1L to 9L).map(i => (i, i + 1))
    val got = GraphOps.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 10)
    assert(got.forall(_._3 == 0L))
  }

  test("triangleCounts: invariant to duplicates, self-loops, orientation") {
    val base = Seq[(Long, Long)]((1, 2), (2, 3), (1, 3), (3, 4), (4, 1))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L), (1L, 2L), (3L, 1L))
    val a = GraphOps.triangleCounts(base.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = GraphOps.triangleCounts(noisy.toDF("a", "b"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("triangleCounts matches the brute-force local recompute on the doc fixture") {
    val docs = graft.core.Tables.documents(spark, sf001)
    val raw = docs.select((col("doc_id") % 60).as("a"),
        ((col("doc_id") * 31 + col("n_chars")) % 60).as("b"))
    val edges = raw.as[(Long, Long)].collect().toSeq
    val want = localTriangles(edges)
    val got = GraphOps.triangleCounts(raw)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == want)
    // the fixture must actually contain triangles — a vacuous all-zero
    // graph would pass any wrong implementation
    assert(want.values.sum > 0, "fixture graph is triangle-free")
  }

  test("hits: directed star — sources are hubs, sink is the authority") {
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val got = GraphOps.hits(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(0L)._1 == 1.0 && got(0L)._2 == 0.0, s"sink: ${got(0L)}")
    Seq(1L, 2L, 3L).foreach { n =>
      assert(got(n)._1 == 0.0, s"source $n has authority")
      assert(math.abs(got(n)._2 - 1.0 / 3) < 1e-12, s"hub $n: ${got(n)}")
    }
  }

  test("hits works on the distinct edge set: duplicate edges are no-ops") {
    val once = Seq((1L, 0L), (2L, 0L), (1L, 2L)).toDF("src", "dst")
    val dup = (Seq((1L, 0L), (2L, 0L), (1L, 2L)) ++
      Seq((1L, 0L), (1L, 0L))).toDF("src", "dst")
    val a = GraphOps.hits(once, iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val b = GraphOps.hits(dup, iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
