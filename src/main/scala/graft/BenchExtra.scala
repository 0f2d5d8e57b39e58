package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimization-round measurement harness — guide §1 discipline, kept OUT of
  * the frozen `graft.Bench` artifact:
  *
  *  - each query is timed through the noop sink (`format("noop")`), which
  *    computes every column of every row and discards it — so the number is
  *    the computation, not the collect/agg the headline bench uses;
  *  - jobs are labeled (`setJobDescription`) so stage-level listener output
  *    maps back to queries;
  *  - `SPARK_GRAFT_PLANS_DIR`, when set, receives `<name>.txt` with the
  *    `.explain("formatted")` of every named query (the plan evidence the
  *    round's OPTIMIZATION notes cite).
  *
  * Usage: `sbt "runMain graft.BenchExtra q113_line_diff q105_semdedup"`, or
  * no args for every SparkEntry query plus the headline bench shapes
  * (headline shapes are named `bench_<name>`).
  */
object BenchExtra {

  private def headline: Seq[(String, (SparkSession, String) => DataFrame)] =
    BenchQueries.all.map { case (n, f) => (s"bench_$n", f) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val plansSuffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "")
    val spark = BenchQueries.session(cpus)
    val listener = new Bench.TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    val all: Seq[(String, (SparkSession, String) => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1) ++ headline
    val wanted =
      if (args.isEmpty) all
      else all.filter { case (n, _) => args.contains(n) }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val out = wanted.map { case (name, fn) =>
      val sec = try {
        plansDir.foreach { d =>
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p)
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(p.resolve(s"$name$plansSuffix.txt"),
            plan.getBytes("UTF-8"))
        }
        spark.sparkContext.setJobDescription(s"warmup: $name")
        (0 until warmups).foreach(_ => noop(fn(spark, sfDir)))
        val samples = (0 until runs).map { i =>
          spark.sparkContext.setJobDescription(s"timed[$i]: $name")
          val t0 = System.nanoTime()
          noop(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        spark.sparkContext.setJobDescription(null)
        samples.min
      } catch { case e: Throwable =>
        System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
        -1.0
      }
      f"""\"$name\":$sec%.3f"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"benchextra_noop_sec","queries":$out,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
