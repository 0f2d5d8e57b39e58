package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.frontier.{Discover, Ledger, Robots, WaveLoop}
import graft.pipeline.TextPipeline

/** End-to-end crawl CLI — the rebuild's twin of the reference's `__main__`
  * + `process_urls` (`/root/reference/web_scraper_pipeline.py:196-233`), with
  * the round-2 crawl loop closed: seed URLs → multi-wave frontier (link
  * discovery, seen-ledger dedup, politeness schedule, robots, fetch/parse
  * metrics) → per-URL text pipeline → JSON results.
  *
  * Usage:
  *   runMain graft.Crawl --pages <pageTableRoot> --out <dir>
  *     [--waves N] [--gap SECONDS] url1 url2 ...
  *
  * "Fetch" is Common-Crawl replay against a committed
  * [[graft.sources.PageTable]] (there is no live network in a 100 TB batch
  * job — divergence recorded in SURVEY.md §7.3). Output layout:
  *
  *   out/frontier/…        wave state (schedule/seen/metrics/manifests)
  *   out/results.parquet   url, full_text, chunks, embeddings
  *   out/results.json/     one JSON object per url (reference `:231-232`
  *                         contract, via the same to_json shape as q32)
  */
object Crawl {

  final case class Args(pages: String, out: String, waves: Int, gapSeconds: Long,
      urls: Seq[String])

  def parseArgs(argv: Array[String]): Args = {
    var pages = ""; var out = ""; var waves = 3; var gap = 3L
    val urls = Seq.newBuilder[String]
    var i = 0
    def value(flag: String): String = {
      require(i + 1 < argv.length, s"error: $flag needs a value")
      i += 2
      argv(i - 1)
    }
    while (i < argv.length) {
      argv(i) match {
        case "--pages" => pages = value("--pages")
        case "--out" => out = value("--out")
        case "--waves" => waves = value("--waves").toInt
        case "--gap" => gap = value("--gap").toLong
        case f if f.startsWith("--") =>
          throw new IllegalArgumentException(s"error: unknown flag $f")
        case u => urls += u; i += 1
      }
    }
    val a = Args(pages, out, waves, gap, urls.result())
    require(a.pages.nonEmpty, "--pages <pageTableRoot> is required")
    require(a.out.nonEmpty, "--out <dir> is required")
    require(a.urls.nonEmpty, "error: no URLs provided") // reference :227-228
    a
  }

  /** Programmatic surface (the reference's `process_urls`): runs the crawl
    * and returns the results frame (url, full_text, chunks, embeddings).
    */
  def run(spark: SparkSession, a: Args): DataFrame = {
    import spark.implicits._
    val pages = graft.sources.PageTable.read(spark, a.pages)
    val seeds = a.urls.zipWithIndex.map { case (u, i) => (u, i.toLong) }
      .toDF("url", "seed_idx")
    val ledger = new Ledger(spark, s"${a.out}/frontier/seenstate")
    WaveLoop.run(spark, s"${a.out}/frontier", seeds,
      Discover.fromPages(pages), maxWaves = a.waves, gapSeconds = a.gapSeconds,
      robots = Robots.AllowAll, pages = Some(pages), ledger = Some(ledger))
    // crawl order drives the result set; fetch = replay join; text pipeline
    // is one codegen'd map per row
    val order = WaveLoop.crawlOrder(spark, s"${a.out}/frontier")
      .select("canonical_url", "wave", "slot", "host_rev", "seed_idx")
    val fetched = order.join(
      pages.select(col("url").as("canonical_url"), col("html")), Seq("canonical_url"))
    TextPipeline.results(
      fetched.withColumnRenamed("canonical_url", "url")
        .withColumn("html", col("html").cast("string")))
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val results = run(spark, a)
      results.write.mode(SaveMode.Overwrite).parquet(s"${a.out}/results.parquet")
      // one read-back serves both the JSON render and the count
      val written = spark.read.parquet(s"${a.out}/results.parquet")
      written
        .select(to_json(struct(col("url"), col("full_text"), col("chunks"),
          col("embeddings"))).as("value"))
        .write.mode(SaveMode.Overwrite).text(s"${a.out}/results.json")
      val n = written.count() // column-pruned scan, no embeddings read
      println(s"""{"crawled_urls":$n,"out":"${a.out}"}""")
    } finally spark.stop()
  }
}
