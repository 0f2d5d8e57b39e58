package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.url.Canonical

class CanonicalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def page(url: String, canon: Option[String]): (String, String) =
    (url, canon.map(h =>
        s"""<html><head><link rel="canonical" href="$h"></head><body>x</body></html>""")
      .getOrElse("<html><body>x</body></html>"))

  test("declared variants fold; broken declarations self-canonicalize") {
    val pages = Seq(
      page("http://a.test/x", None), // the target itself, fetched
      page("http://a.test/x?utm=1", Some("http://a.test/x")), // absolute href
      page("http://a.test/print/x", Some("/x")), // root-relative href
      page("http://a.test/y", Some("mailto:z@q.test")), // non-http -> self
      page("http://b.test/m1", Some("/gone")), // target never fetched
      page("http://b.test/m2", Some("/gone"))).toDF("url", "html")
    val out = Canonical.collapse(pages).orderBy("canonical_url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("http://a.test/x", "http://a.test/x", 3L, true),
      ("http://a.test/y", "http://a.test/y", 1L, true),
      ("http://b.test/gone", "http://b.test/m1", 2L, false)))
  }

  test("one hop only: A→B while B→C leaves A on B (no chain-following)") {
    val pages = Seq(
      page("http://c.test/a", Some("/b")),
      page("http://c.test/b", Some("/c"))).toDF("url", "html")
    val t = Canonical.targets(pages).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(t("http://c.test/a") == "http://c.test/b")
    assert(t("http://c.test/b") == "http://c.test/c")
    val groups = Canonical.collapse(pages).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(3))).toMap
    // b's own row lives in group /c, so group /b has no fetched target
    assert(groups("http://c.test/b") == ("http://c.test/a", false))
    assert(groups("http://c.test/c") == ("http://c.test/b", false))
  }

  test("blank href and empty html are self-canonical") {
    val pages = Seq(
      page("http://d.test/p", Some("  ")),
      ("http://d.test/q", "")).toDF("url", "html")
    val t = Canonical.targets(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(t.forall { case (u, c, s) => u == c && s })
  }

  test("targets is one narrow projection — no exchange in the plan") {
    // spark.range input: a LocalRelation would constant-fold the plan away
    val pages = spark.range(100).select(
      concat(lit("http://p.test/"), col("id").cast("string")).as("url"),
      concat(lit("<html><head><link rel=\"canonical\" href=\"/t/"),
        (col("id") % 10).cast("string"),
        lit("\"></head><body>x</body></html>")).as("html"))
    val plan = Canonical.targets(pages).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

class SitemapRefreshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.frontier.Sitemap

  test("entries: loc+lastmod per <url> block; loose index locs excluded") {
    val xml = Seq(
      """<urlset>
        |<url><loc> http://a.test/1 </loc><lastmod> 2024-01-05 </lastmod></url>
        |<url><loc>http://a.test/2</loc></url>
        |</urlset>""".stripMargin,
      // sitemapindex: lastmod stamps the FILE, not a page — entries must
      // not surface it (locs still does)
      "<sitemapindex><sitemap><loc>http://a.test/s.xml</loc>" +
        "<lastmod>2024-01-01</lastmod></sitemap></sitemapindex>").toDF("xml")
    val got = xml.select(explode(Sitemap.entries(col("xml"))).as("e"))
      .select("e.loc", "e.lastmod").as[(String, String)].collect().toSeq
    assert(got == Seq(("http://a.test/1", "2024-01-05"), ("http://a.test/2", "")))
    val allLocs = xml.select(explode(Sitemap.locs(col("xml")))).as[String]
      .collect().toSet
    assert(allLocs.contains("http://a.test/s.xml"))
  }

  test("lastmodTs: W3C forms parse, offsets convert, garbage is null") {
    val got = Seq("2024-01-05", "2024-01-05T10:30:00Z", "2024-01-05 10:30:00",
        "2024-01-05T12:30:00+02:00", "2024-01-05T10:30:00.123Z",
        "not a date", "").toDF("s")
      .select(Sitemap.lastmodTs(col("s")).cast("string")).as[String]
      .collect().toSeq
    assert(got == Seq(
      "2024-01-05 00:00:00",
      "2024-01-05 10:30:00",
      "2024-01-05 10:30:00",
      "2024-01-05 10:30:00", // +02:00 converted to the UTC session tz
      "2024-01-05 10:30:00.123",
      null, null))
  }

  test("staleBySitemap: newest stamp wins; null lastmod never re-fetches") {
    val sitemaps = Seq(
      // /p listed twice across files — the NEWER stamp must decide
      "<urlset><url><loc>http://s.test/p</loc><lastmod>2024-01-01</lastmod></url></urlset>",
      "<urlset><url><loc>http://s.test/p</loc><lastmod>2024-03-01</lastmod></url>" +
        "<url><loc>http://s.test/q</loc><lastmod>2024-01-01</lastmod></url>" +
        "<url><loc>http://s.test/r</loc></url>" +
        "<url><loc>http://s.test/new</loc></url></urlset>").toDF("xml")
    val fetched = Seq(
      ("http://s.test/p", "2024-02-01 00:00:00"), // stale: 03-01 > 02-01
      ("http://s.test/q", "2024-02-01 00:00:00"), // fresh: 01-01 < 02-01
      ("http://s.test/r", "2024-02-01 00:00:00")) // unknown lastmod: fresh
      .toDF("url", "ts")
      .select(col("url"), to_timestamp(col("ts")).as("fetched_at"))
    val got = Sitemap.staleBySitemap(sitemaps, fetched)
      .select("url", "reason").as[(String, String)].collect().toSet
    assert(got == Set(
      ("http://s.test/p", "modified"),
      ("http://s.test/new", "never_fetched")))
  }
}

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.streaming.StreamingDedup

  // fully-disjoint word sets per base — zero shared shingles between
  // distinct bases, so the only LSH collisions are exact copies (every
  // band hits); no probabilistic flakiness in the assertions
  private def textOf(i: Long): String =
    (0 until 12).map(j => s"t${i % 10}base${j}w").mkString(" ")

  private def batchDf(ids: Seq[Long]) =
    ids.map(i => (i, textOf(i))).toDF("id", "text")

  test("stream of 3 micro-batches ≡ the same 3 batch cycles, row-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("sdedup").toString
    val b0 = (0L until 10L) // 10 distinct texts
    val b1 = (10L until 20L) // exact copies of batch 0's texts
    val b2 = Seq(25L, 26L) // mod-10 bases 5 and 6 — copies of batch-0 docs

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.run(
      input.toDF().toDF("id", "text"),
      s"$tmp/ledger", s"$tmp/out", s"$tmp/ckpt", "id", "text")
    try {
      input.addData(b0.map(i => (i, textOf(i))))
      q.processAllAvailable()
      input.addData(b1.map(i => (i, textOf(i))))
      q.processAllAvailable()
      input.addData(b2.map(i => (i, textOf(i))))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingDedup.readResults(spark, s"$tmp/out")
      .select("id", "n_hit_bands", "dup_of", "novel", "batch")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3),
        r.getLong(4))).toSet

    // batch twin: the SAME cycle, called directly
    val tmpB = java.nio.file.Files.createTempDirectory("sdedupB").toString
    val batched = Seq(b0, b1, b2.toSeq).zipWithIndex.flatMap { case (ids, k) =>
      val out = StreamingDedup.screenAndCommit(
        batchDf(ids.toSeq), s"$tmpB/ledger", k.toLong, "id", "text")
      val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3), k.toLong))
      out.unpersist()
      rows
    }.toSet
    assert(streamed == batched)

    // semantics: batch-0 docs all novel; batch-1 copies dup_of their twin
    // with every band hitting; batch-2's 25 duplicates base 5 (25%10),
    // 26 duplicates base 6 — both already in the ledger from batch 0
    assert(batched.count(_._4) == 10)
    for (i <- 10L until 20L)
      assert(batched.contains((i, 8L, Some(i - 10), false, 1L)))
    assert(batched.contains((25L, 8L, Some(5L), false, 2L)))
    assert(batched.contains((26L, 8L, Some(6L), false, 2L)))
  }

  test("micro-batch replay is idempotent: same verdicts, no ledger growth") {
    val tmp = java.nio.file.Files.createTempDirectory("sdedupR").toString
    StreamingDedup.screenAndCommit(batchDf(0L until 5L), s"$tmp/ledger", 0L,
      "id", "text").unpersist()
    val first = StreamingDedup.screenAndCommit(batchDf(5L until 10L),
      s"$tmp/ledger", 1L, "id", "text")
    val firstRows = first.collect().toSet; first.unpersist()
    val ledgerRows = StreamingDedup.readLedger(spark, s"$tmp/ledger").count()
    // the replay: same batch id — screens EXCLUDING its own fence dir, so
    // its docs are not duplicates of themselves; overwrite, not append
    val again = StreamingDedup.screenAndCommit(batchDf(5L until 10L),
      s"$tmp/ledger", 1L, "id", "text")
    assert(again.collect().toSet == firstRows)
    again.unpersist()
    assert(StreamingDedup.readLedger(spark, s"$tmp/ledger").count() == ledgerRows)
  }
}
