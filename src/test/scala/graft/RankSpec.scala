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
}
