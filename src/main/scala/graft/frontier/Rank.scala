package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over the discovered link graph — the iterative authority score
  * behind frontier prioritization (the one-step
  * [[Scheduler.inDegreePriority]] is its first approximation; the scores
  * here feed [[Scheduler.priorityOrderKey]] the same way).
  *
  * Scale shape, learned from [[graft.dedup.Components]]:
  *
  *  - the edge list (+ per-source out-degree) is staged ONCE with
  *    `localCheckpoint` — it is read every iteration, and its upstream is
  *    typically the expensive link-extraction pipeline;
  *  - every iteration is one join + one map-side-combinable sum keyed by
  *    dst — rows on the wire are (node: LONG, score: DOUBLE) = 16 bytes;
  *  - the score frame is checkpointed per round so the plan does not grow
  *    with the iteration count (lineage truncation);
  *  - per-round shuffles are right-sized to the edge count with explicit
  *    key-repartitions (hermetic — no session-conf mutation).
  *
  * Semantics: `score ← (1 − d) + d × Σ_{u→v} score(u) ∕ outdeg(u)` from a
  * uniform 1.0 start — the classic unnormalized formulation (sums to ~|V|,
  * not 1). Dangling nodes (no out-edges) leak their mass, the standard
  * simplification for crawl prioritization where relative order is what
  * matters; redistribute-to-all would add one scalar aggregate per round.
  */
object Rank {

  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping: $damping")
    val spark = edges.sparkSession
    val sessionWidth = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(32)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val nEdges = e.count()
    val width = math.max(1L, math.min(sessionWidth.toLong, nEdges / 250000L + 1L)).toInt
    val deg = e.repartition(width, col("src"))
      .groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, "src").localCheckpoint(true) // read every round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .repartition(width, col("node"))
      .distinct()
      .localCheckpoint(true)
    var scores = nodes.withColumn("score", lit(1.0d))
    var it = 0
    while (it < iters) {
      val contrib = withDeg
        .join(scores.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("score") / col("outdeg")).as("c"))
        .repartition(width, col("node"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      scores = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0d - damping) + lit(damping) * coalesce(col("c"), lit(0.0d))).as("score"))
        .localCheckpoint(true)
      it += 1
    }
    scores
  }
}
