package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end crawl CLI: seeds → discovery waves → replay fetch → results,
  * with the byte-identity invariant checked on the final output.
  */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def linkedPages(n: Int) = {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0 until n).map { i =>
      val html =
        s"""<html><body><h1>Page $i</h1><p>content words $i</p><a href="/p/${i + 1}">n</a></body></html>"""
      graft.Schemas.Page(s"http://crawl.test/p/$i", ts, html.getBytes("UTF-8"),
        s"Page $i\ncontent words $i", "en")
    }
  }

  test("Crawl.run: chain crawl through discovery, byte-identical full_text") {
    val ptRoot = java.nio.file.Files.createTempDirectory("crawlpt").toString
    graft.sources.PageTable.commit(spark, ptRoot,
      spark.createDataset(linkedPages(50)).toDF())
    val out = java.nio.file.Files.createTempDirectory("crawlout").toString
    val results = Crawl.run(spark, Crawl.Args(
      pages = ptRoot, out = out, waves = 4, gapSeconds = 3,
      urls = Seq("http://crawl.test/p/0")))
    val got = results.select("url", "full_text").as[(String, String)].collect().toMap
    // wave 0 = p0, each wave discovers the next link → p0..p3 after 4 waves
    assert(got.keySet == (0 until 4).map(i => s"http://crawl.test/p/$i").toSet)
    for ((url, text) <- got) {
      val i = url.split('/').last.toInt
      assert(text == s"Page $i\ncontent words $i", url) // byte invariant
    }
    // frontier state committed per wave, with fetch metrics
    assert(graft.frontier.WaveLoop.committedWaves(s"$out/frontier") == Seq(0, 1, 2, 3))
    val m0 = spark.read.parquet(s"$out/frontier/metrics/wave=0")
    assert(m0.where(col("status") === 200).count() == 1)
  }

  test("Crawl.run with --refresh-after: re-crawls happen, results stay one row per url") {
    val ptRoot = java.nio.file.Files.createTempDirectory("crawlptR").toString
    graft.sources.PageTable.commit(spark, ptRoot,
      spark.createDataset(linkedPages(3)).toDF()) // chain dies at p2 → refresh work fills waves
    val out = java.nio.file.Files.createTempDirectory("crawloutR").toString
    val results = Crawl.run(spark, Crawl.Args(
      pages = ptRoot, out = out, waves = 7, gapSeconds = 3,
      urls = Seq("http://crawl.test/p/0"), refreshAfter = Some(2)))
    // the loop kept running on refresh work after discovery died
    assert(graft.frontier.WaveLoop.committedWaves(s"$out/frontier").length == 7)
    val order = graft.frontier.WaveLoop.crawlOrder(spark, s"$out/frontier")
      .select("canonical_url").as[String].collect()
    assert(order.length > order.distinct.length, "some url was re-crawled")
    // results: exactly one row per url despite the re-crawls
    val urls = results.select("url").as[String].collect()
    assert(urls.sorted.toSeq == urls.distinct.sorted.toSeq)
    assert(urls.toSet == (0 until 3).map(i => s"http://crawl.test/p/$i").toSet)
  }

  test("parseArgs: reference CLI contract (no URLs = error)") {
    val a = Crawl.parseArgs(Array("--pages", "/p", "--out", "/o", "--waves", "2",
      "--gap", "5", "http://a.test/", "http://b.test/"))
    assert(a.waves == 2 && a.gapSeconds == 5L && a.urls.length == 2)
    val e = intercept[IllegalArgumentException] {
      Crawl.parseArgs(Array("--pages", "/p", "--out", "/o"))
    }
    assert(e.getMessage.contains("no URLs")) // reference :227-228
    // refresh channel flag
    val r = Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
      "--refresh-after", "4", "http://a.test/"))
    assert(r.refreshAfter.contains(4))
    assert(Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
      "http://a.test/")).refreshAfter.isEmpty)
    // error-retry channel flag
    assert(Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
      "--retry-after", "2", "http://a.test/")).retryAfter.contains(2))
    intercept[IllegalArgumentException] {
      Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
        "--retry-after", "0", "http://a.test/"))
    }
    intercept[IllegalArgumentException] {
      Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
        "--refresh-after", "0", "http://a.test/"))
    }
    // dust channel flag
    assert(Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
      "--dust-every", "3", "http://a.test/")).dustEvery.contains(3))
    // domain budget flag
    assert(Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
      "--max-per-domain", "50", "http://a.test/")).maxPerDomain.contains(50L))
    intercept[IllegalArgumentException] {
      Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
        "--max-per-domain", "0", "http://a.test/"))
    }
    // focus channel flags (repeatable --focus)
    val f = Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
      "--focus", "rust compiler", "--focus", "borrow checker",
      "--focus-every", "2", "http://a.test/"))
    assert(f.focus == Seq("rust compiler", "borrow checker") &&
      f.focusEvery.contains(2))
    intercept[IllegalArgumentException] {
      Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
        "--focus-every", "2", "http://a.test/")) // --focus-every without --focus
    }
    intercept[IllegalArgumentException] {
      Crawl.parseArgs(Array("--pages", "/p", "--out", "/o",
        "--dust-every", "0", "http://a.test/"))
    }
  }
}
