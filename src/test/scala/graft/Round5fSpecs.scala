package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.frontier.Rank

class SeedDistanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxDepth: Int = 6): Map[Long, Int] =
    Rank.seedDistance(edges.toDF("src", "dst"), seeds.toDF("node"),
        maxDepth = maxDepth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("shortcut wins: depth is the MINIMUM hop count") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 1L -> 4L),
      Seq(1L))
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2))
  }

  test("cycles terminate; unreachable nodes are absent") {
    val out = run(Seq(1L -> 2L, 2L -> 1L, 7L -> 8L), Seq(1L))
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  test("maxDepth bounds the expansion exactly") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L), Seq(1L), maxDepth = 1)
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  test("isolated seed reports depth 0 and the loop exits early") {
    val out = run(Seq(5L -> 6L), Seq(10L))
    assert(out == Map(10L -> 0))
  }

  test("parallel edges and duplicate seeds add no rows") {
    val out = run(Seq(1L -> 2L, 1L -> 2L, 1L -> 2L), Seq(1L, 1L))
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  test("multi-seed: each node takes the nearest seed's distance") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 9L -> 3L), Seq(1L, 9L))
    assert(out == Map(1L -> 0, 9L -> 0, 2L -> 1, 3L -> 1))
  }
}
