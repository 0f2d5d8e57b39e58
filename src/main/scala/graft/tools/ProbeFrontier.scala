package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Bench, BenchQueries}

/** Stage-by-stage decomposition of the headline frontier_schedule job
  * (guide §1: find WHERE the time goes before touching anything). Each probe
  * is noop-sunk and labeled; times print as one JSON line.
  */
object ProbeFrontier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchQueries.session(cpus)
    val listener = new Bench.TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(body: => Unit): (String, Double) = {
      spark.sparkContext.setJobDescription(name)
      body // warmup
      val t = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      (name, t)
    }
    val staged = spark.conf.get("spark.local.dir", "/tmp").split(',').head.trim +
      "/graft-probe-keyed"

    val results = Seq(
      time("raw_scan_repartition") {
        noop(spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_suppkey", "l_partkey", "l_orderkey", "l_linenumber")
          .repartition(spark.sparkContext.defaultParallelism))
      },
      time("url_synthesis") {
        noop(BenchQueries.frontierFromLineitem(spark, sfDir))
      },
      time("with_url_keys") {
        noop(graft.frontier.Seen.withUrlKeys(
          BenchQueries.frontierFromLineitem(spark, sfDir))
          .select("url_hash", "seed_idx", "canonical_url", "host_rev"))
      },
      time("staging_write_plain") {
        graft.frontier.Seen.withUrlKeys(
          BenchQueries.frontierFromLineitem(spark, sfDir))
          .select("url_hash", "seed_idx", "canonical_url", "host_rev")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staged)
      },
      time("staging_write_observed") {
        val obs = org.apache.spark.sql.Observation()
        val seenCond = pmod(col("url_hash"), lit(2)) === 0
        graft.frontier.Seen.withUrlKeys(
          BenchQueries.frontierFromLineitem(spark, sfDir))
          .select("url_hash", "seed_idx", "canonical_url", "host_rev")
          .observe(obs, min(col("seed_idx")).as("lo"), max(col("seed_idx")).as("hi"),
            graft.functions.bloom_bank_agg(when(seenCond, col("url_hash")),
              64, 400000L / 64 + 1024, 1e-2).as("bank"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staged)
        obs.get
      },
      time("downstream_unseen") {
        // staged parquet exists from the previous probe
        val obs = org.apache.spark.sql.Observation()
        val seenCond = pmod(col("url_hash"), lit(2)) === 0
        graft.frontier.Seen.withUrlKeys(
          BenchQueries.frontierFromLineitem(spark, sfDir))
          .select("url_hash", "seed_idx", "canonical_url", "host_rev")
          .observe(obs, graft.functions.bloom_bank_agg(when(seenCond, col("url_hash")),
            64, 400000L / 64 + 1024, 1e-2).as("bank"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(staged)
        val bankRows = obs.get("bank").asInstanceOf[scala.collection.Seq[Array[Byte]]]
          .zipWithIndex.map { case (bytes, b) => (b, bytes) }.toArray
        val keyed = spark.read.parquet(staged)
        val seen = keyed.where(seenCond).select("url_hash", "canonical_url")
        noop(graft.frontier.Seen.filterUnseenWithBank(keyed, seen, bankRows, 64)
          .select("url_hash", "seed_idx", "canonical_url", "host_rev"))
      },
      time("downstream_inwave") {
        val keyed = spark.read.parquet(staged)
        val seenCond = pmod(col("url_hash"), lit(2)) === 0
        val seen = keyed.where(seenCond).select("url_hash", "canonical_url")
        val obs2 = org.apache.spark.sql.Observation()
        // bank from a cheap scan of the staged file (not timed separately)
        val b = keyed.observe(obs2, graft.functions.bloom_bank_agg(
          when(seenCond, col("url_hash")), 64, 400000L / 64 + 1024, 1e-2).as("bank"))
        noop(b)
        val bankRows = obs2.get("bank").asInstanceOf[scala.collection.Seq[Array[Byte]]]
          .zipWithIndex.map { case (bytes, bb) => (bb, bytes) }.toArray
        val unseen = graft.frontier.Seen.filterUnseenWithBank(keyed, seen, bankRows, 64)
          .select("url_hash", "seed_idx", "canonical_url", "host_rev")
        noop(graft.frontier.Seen.dropInWaveDuplicates(unseen))
      },
      time("full_frontier_schedule") {
        Bench.force(BenchQueries.frontierSchedule(spark, sfDir))
      }
    )
    // one more full run with a stage-level trace
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val tracer = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b)
          .getOrElse(-1L)
        val m = i.taskMetrics
        stages.add(f"stage ${i.stageId}%4d ${i.numTasks}%4d tasks ${ms}%6d ms " +
          f"run=${m.executorRunTime}%6d cpu=${m.executorCpuTime / 1000000}%6d " +
          f"gc=${m.jvmGCTime}%5d deser=${m.executorDeserializeTime}%5d " +
          f"shR=${m.shuffleReadMetrics.fetchWaitTime}%4d shW=${m.shuffleWriteMetrics.writeTime / 1000000}%4d " +
          f"in=${m.inputMetrics.recordsRead}%8d out=${m.outputMetrics.recordsWritten}%7d " +
          i.name.takeWhile(_ != '\n'))
      }
    }
    spark.sparkContext.addSparkListener(tracer)
    spark.sparkContext.setJobDescription("traced full run")
    val traceReps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    Bench.force(BenchQueries.frontierSchedule(spark, sfDir, traceReps))
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    stages.forEach(s => System.out.println(s))
    println(results.map { case (n, t) => f""""$n":$t%.3f""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
