package graft.frontier

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap extraction (sitemaps.org protocol): a crawl's OTHER discovery
  * channel besides page links — `robots.txt` points at sitemap.xml files
  * whose `<loc>` entries seed the frontier directly.
  *
  * Kept deliberately regex-native (`regexp_extract_all` is codegen'd and
  * the sitemap format pins `<loc>` to a flat leaf element): works for both
  * `<urlset>` leaves and `<sitemapindex>` nests (same tag), tolerates
  * whitespace padding inside the element, and ignores every other element.
  * Feed the result through `canonicalize_url` + the seen-ledger like any
  * discovered link batch.
  */
object Sitemap {

  /** All `<loc>` values of a sitemap body, document order, trimmed. */
  def locs(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("<loc>([^<]+)</loc>"), lit(1)),
      x => trim(x))

  /** Count without materializing the array downstream. */
  def locCount(xml: Column): Column = size(locs(xml))
}
