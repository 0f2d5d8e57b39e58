package graft.url

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{canonicalize_url, page_directives, resolve_url}

/** `rel=canonical` URL collapse — the search-engine canonicalization step
  * that sits between fetching and corpus building: pages that DECLARE a
  * canonical variant (`<link rel="canonical" href=…>`, extracted by the
  * `page_directives` kernel alongside meta-robots) fold onto their declared
  * target, so print views, tracking-parameter variants, and mobile mirrors
  * stop counting as distinct documents. Without this, a site that serves
  * `?utm_source=x` variants inflates the corpus with URL-level "uniques"
  * that every content-dedup pass then has to re-discover the hard way —
  * honoring the site's own declaration is both cheaper and what the
  * reference crawler ecosystem (Googlebot, Common Crawl's dedup) does.
  *
  * Semantics (the documented search-engine subset):
  *   - the declared href resolves against the PAGE url (RFC 3986 §5.2 —
  *     relative canonicals are legal and common), then canonicalizes;
  *     cross-host targets are honored (cross-domain canonicals are valid);
  *   - a page with no declaration, a blank href, or an unresolvable /
  *     non-http target is its OWN canonical (self-canonical) — a broken
  *     declaration must never delete a fetched page from the corpus;
  *   - ONE hop only, no chain-following: A→B and B→C leaves A on B.
  *     Chained canonicals are documented-unreliable signals (Google
  *     treats them as such), and a distributed fixpoint over a signal
  *     sites routinely misconfigure buys accuracy nobody vouches for.
  *
  * Scale shape: [[targets]] is one narrow per-row projection (the
  * directives kernel is codegen'd; no shuffle, no join). [[collapse]] adds
  * exactly ONE map-combinable groupBy on the canonical target — partial
  * aggregation collapses per-task, so a mega-group (10^6 variants all
  * declaring one target) costs its task-local partials, not a skewed
  * funnel; only (target, count, min, matched-target) partials shuffle.
  */
object Canonical {

  /** Per-page canonical mapping: `url` (canonicalized self),
    * `canonical_url` (the fold target — self when the declaration is
    * absent/blank/unresolvable), `is_self`. `htmlCol` must be STRING html
    * (decode binary pages upstream — the kernel scans characters).
    */
  def targets(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val self = canonicalize_url(col(urlCol))
    val raw = page_directives(col(htmlCol)).getField("canonical")
    val declared = when(length(trim(raw)) > 0,
      resolve_url(self, trim(raw)))
    pages.select(
      self.as("url"),
      coalesce(declared, self).as("canonical_url"))
      .withColumn("is_self", col("url") === col("canonical_url"))
  }

  /** One row per canonical target over [[targets]]' mapping:
    * `canonical_url`, `rep_url` (the representative to KEEP — the target
    * page itself when it was fetched, else the lexicographic-min member:
    * a target never fetched, e.g. declared but 404, must still leave one
    * surviving member), `members` (urls folding here, self included),
    * `target_fetched`. Downstream keeps `rep_url` rows and drops the rest.
    */
  def collapse(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame =
    targets(pages, urlCol, htmlCol)
      .groupBy("canonical_url")
      .agg(
        count(lit(1)).as("members"),
        // max(url where url == target): the target itself when present —
        // there is at most one such row, so max is just "the one"
        max(when(col("is_self"), col("url"))).as("fetched_target"),
        min(col("url")).as("min_member"))
      .select(
        col("canonical_url"),
        coalesce(col("fetched_target"), col("min_member")).as("rep_url"),
        col("members"),
        col("fetched_target").isNotNull.as("target_fetched"))
}
