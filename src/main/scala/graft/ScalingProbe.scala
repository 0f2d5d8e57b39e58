package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = "/root/testdata/sf0.1"; val reps = 8
    val s = BenchQueries.session(cpus)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val run = i.taskMetrics.executorRunTime / 1000.0
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        stages.add(f"stage ${i.stageId}%3d tasks=${i.numTasks}%3d wall=$wall%7.2f run=$run%8.2f cpu=$cpu%8.2f  ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    val t0 = System.nanoTime()
    val n = Bench.force(BenchQueries.frontierSchedule(s, dir, reps))
    val cold = (System.nanoTime()-t0)/1e9
    stages.add(s"== cold total $cold s n=$n")
    val t1 = System.nanoTime()
    Bench.force(BenchQueries.frontierSchedule(s, dir, reps))
    stages.add(s"== warm total ${(System.nanoTime()-t1)/1e9} s")
    stages.forEach(x => println(x))
    s.stop()
  }
}
