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
