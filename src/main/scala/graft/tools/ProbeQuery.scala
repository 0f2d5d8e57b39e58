package graft.tools

import org.apache.spark.sql.DataFrame
import graft.{Bench, BenchQueries, SparkEntry}

/** Stage-level trace of one or more declared queries (guide §1/§7): runs
  * each named query through the noop sink after a warmup and prints every
  * stage's wall/run/cpu/gc/shuffle-write times and record counts.
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchQueries.session(cpus)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val all: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
      SparkEntry.queries ++
        BenchQueries.all.map { case (n, f) => (s"bench_$n", f) }.toMap
    for (name <- args; fn <- all.get(name)) {
      noop(fn(spark, sfDir)) // warmup
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val tracer = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b)
            .getOrElse(-1L)
          val m = i.taskMetrics
          stages.add(f"stage ${i.stageId}%5d ${i.numTasks}%4d tasks ${ms}%6d ms " +
            f"run=${m.executorRunTime}%6d cpu=${m.executorCpuTime / 1000000}%6d " +
            f"gc=${m.jvmGCTime}%5d shW=${m.shuffleWriteMetrics.writeTime / 1000000}%5d " +
            f"recs=${m.shuffleReadMetrics.recordsRead}%8d")
        }
      }
      spark.sparkContext.addSparkListener(tracer)
      spark.sparkContext.setJobDescription(s"probe: $name")
      val t0 = System.nanoTime()
      noop(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(tracer)
      println(f"== $name: $sec%.3f s, ${stages.size} stages")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
