package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.frontier.Rank

class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference implementation: same formula, driver-side. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int,
      damping: Double = 0.85): Map[Long, Double] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var s = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => s(u) / outdeg(u) }.sum).toMap
      s = nodes.map(n => n -> ((1 - damping) + damping * contrib.getOrElse(n, 0.0))).toMap
    }
    s
  }

  test("pageRank matches the driver-side reference on a hand graph (dangling leak incl.)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 5L))
    val got = Rank.pageRank(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Double)].collect().toMap
    val want = refRank(edges, 3)
    assert(got.keySet == want.keySet) // node 5 (dst-only) present
    for ((n, s) <- want) assert(math.abs(got(n) - s) < 1e-9, s"node $n: ${got(n)} vs $s")
    // authority ordering: 3 (two in-links incl. from the hub) beats 2 and 5
    assert(got(3L) > got(2L) && got(3L) > got(5L))
  }

  test("more iterations move scores (the fixed point is not the start vector)") {
    val edges = (0L until 50L).map(i => (i, (i * 3 + 1) % 17)).toDF("src", "dst")
    val one = Rank.pageRank(edges, iters = 1).as[(Long, Double)].collect().toMap
    val three = Rank.pageRank(edges, iters = 3).as[(Long, Double)].collect().toMap
    assert(one.keySet == three.keySet)
    assert(one.exists { case (n, s) => math.abs(s - three(n)) > 1e-6 })
  }

  /** Weighted reference: contributions score(u)·w(u,v)∕W(u). */
  private def refRankW(edges: Seq[(Long, Long, Long)], iters: Int,
      damping: Double = 0.85): Map[Long, Double] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var s = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => s(u) * w / outw(u) }.sum).toMap
      s = nodes.map(n => n -> ((1 - damping) + damping * contrib.getOrElse(n, 0.0)))
        .toMap
    }
    s
  }

  test("weighted pageRank matches the reference; weight 1 ≡ unweighted") {
    val wEdges = Seq((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 4L))
    val got = Rank.pageRank(wEdges.toDF("src", "dst", "w"), iters = 3,
        weightCol = Some("w")).as[(Long, Double)].collect().toMap
    val want = refRankW(wEdges, 3)
    for ((n, s) <- want) assert(math.abs(got(n) - s) < 1e-9, s"node $n")
    // the heavy 1→2 edge (5 of 1's weight 6) must beat the light 1→3 path
    // in round-1 contribution terms: 2 collects 0.85·5/6 vs 3's 0.85·(1/6+1)
    // — weights matter, so weighted ≠ unweighted on this graph
    val unw = Rank.pageRank(wEdges.map(e => (e._1, e._2)).toDF("src", "dst"),
      iters = 3).as[(Long, Double)].collect().toMap
    assert(want.exists { case (n, s) => math.abs(s - unw(n)) > 1e-3 })
    // and all-ones weights reproduce the unweighted scores exactly
    val ones = Rank.pageRank(wEdges.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "w"),
      iters = 3, weightCol = Some("w")).as[(Long, Double)].collect().toMap
    for ((n, s) <- unw) assert(got.contains(n) && math.abs(ones(n) - s) < 1e-12)
  }

  test("fractional weights are honored, not truncated") {
    // 0.7/0.3 out of node 1: a long-cast would zero both and every score
    // would collapse to 0.15
    val e = Seq((1L, 2L, 0.7), (1L, 3L, 0.3), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val got = Rank.pageRank(e, iters = 2, weightCol = Some("w"))
      .as[(Long, Double)].collect().toMap
    // round 1: s2 = 0.15 + 0.85·0.7, s3 = 0.15 + 0.85·0.3
    assert(got(2L) > got(3L), got.toString)
    assert(got.values.forall(_ > 0.15 - 1e-12))
    assert(math.abs(got(2L) - got(3L) - 0.85 * 0.4 * 1.85) < 1e-9,
      got.toString) // round-2 gap: d·(w2−w3)·s1(1) with s1(1) = 0.15+0.85·2
  }

  test("hostGraph collapses urls, drops self-loops, counts multiplicity") {
    val edges = Seq(
      ("http://a.test/1", "http://b.test/x"),
      ("http://a.test/2", "http://b.test/y"), // same host pair → weight 2
      ("http://a.test/3", "http://a.test/nav"), // self-loop → dropped
      ("http://b.test/1", "http://c.test/z")).toDF("src", "dst")
    val hg = Rank.hostGraph(edges).as[(String, String, Long)].collect().toSet
    assert(hg == Set(("a.test", "b.test", 2L), ("b.test", "c.test", 1L)))
  }

  test("hostRank: authority follows the heavier edge out of a shared hub") {
    // one hub linking COMPETING hosts: 10 links to a.test, 2 to b.test —
    // the hub's mass splits 10/12 vs 2/12, so the collapse's multiplicity
    // weights (not mere reachability) decide the order
    val edges = ((0 until 10).map(i => (s"http://hub.test/p$i", s"http://a.test/t$i")) ++
      (0 until 2).map(i => (s"http://hub.test/q$i", s"http://b.test/t$i"))).toDF("src", "dst")
    val scores = Rank.hostRank(edges, iters = 3)
      .as[(String, Double)].collect().toMap
    assert(scores.keySet == Set("hub.test", "a.test", "b.test"))
    assert(scores("a.test") > scores("b.test"), scores.toString)
    // parity with the weighted reference over the collapsed graph
    val hg = Rank.hostGraph(edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ids = (hg.map(_._1) ++ hg.map(_._2)).distinct.zipWithIndex
      .map { case (h, i) => h -> i.toLong }.toMap
    val want = refRankW(hg.map(e => (ids(e._1), ids(e._2), e._3)).toSeq, 3)
    for ((h, i) <- ids)
      assert(math.abs(scores(h) - want(i)) < 1e-9, h)
  }
}
