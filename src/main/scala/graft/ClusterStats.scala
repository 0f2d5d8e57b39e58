package graft

import org.apache.spark.sql.functions._

/** Diagnostic CLI for the dedup-clustering chain: pair count, star rounds,
  * cluster histogram, wall time per stage. Not part of the graded bench —
  * this is the tool you point at a corpus before committing to a full
  * dedup run (how big are the components? how many rounds will it take?).
  *
  * `SPARK_GRAFT_SF_DIR` selects the corpus; `SPARK_GRAFT_REPS` the
  * replication factor (same fixture as the bench's minhash input).
  */
object ClusterStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = BenchQueries.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(spark.range(reps).withColumnRenamed("id", "rep")))
      .select((col("doc_id") + col("rep") * 1000000L).as("id"), col("text"))
    val t0 = System.nanoTime()
    val pairs = dedup.Dedup.minHashNearDups(docs, "id", "text",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").localCheckpoint(true)
    val nPairs = pairs.count()
    val t1 = System.nanoTime()
    val (labels, rounds) = dedup.Components.connectedComponentsWithRounds(pairs)
    val sizes = labels.groupBy("cluster_id").count()
      .groupBy("count").agg(count(lit(1)).as("clusters"))
      .orderBy(desc("count")).limit(10).collect()
    val t2 = System.nanoTime()
    val nNodes = labels.count()
    val nClusters = labels.select("cluster_id").distinct().count()
    println(s"""{"pairs":$nPairs,"nodes":$nNodes,"clusters":$nClusters,""" +
      s""""rounds":$rounds,"pairs_sec":${(t1 - t0) / 1e9},""" +
      s""""components_sec":${(t2 - t1) / 1e9},""" +
      s""""top_sizes":${sizes.map(r => s"[${r.getLong(0)},${r.getLong(1)}]").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
