package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
object ScalingProbe {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  n=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"; val reps = 8
    for (cpus <- Seq(8, 32)) {
      val s = BenchQueries.session(cpus.toString)
      println(s"=== cpus=$cpus ===")
      val base = BenchQueries.frontierFromLineitem(s, dir, reps)
      t("warmup full")(Bench.force(BenchQueries.frontierSchedule(s, dir, reps)))
      t("1 url build+keys")(Bench.force(frontier.Seen.withUrlKeys(base)))
      val keyed = frontier.Seen.withUrlKeys(base)
      val seen = keyed.where(pmod(col("url_hash"), lit(2)) === 0).select("url_hash", "canonical_url")
      t("2 bloom build only")(seen.select(graft.functions.bloom_agg(col("url_hash"), 1 << 22, 1e-3)).collect().length.toLong)
      val unseen = frontier.Seen.filterUnseen(keyed, seen, expectedSeen = 1 << 22)
      t("3 +filterUnseen")(Bench.force(unseen))
      val inWave = frontier.Seen.dropInWaveDuplicates(unseen)
      t("4 +dedup")(Bench.force(inWave))
      t("5 full (schedule)")(Bench.force(BenchQueries.frontierSchedule(s, dir, reps)))
      s.stop()
    }
  }
}
