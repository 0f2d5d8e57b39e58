package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multilingual alternate clusters from `hreflang` annotations — the
  * translation-group structure search engines read out of
  * `<link rel="alternate" hreflang="…" href="…">` declarations. A
  * multilingual corpus pipeline needs it for two things content hashing
  * cannot do: language BALANCING over translation groups (sample one
  * group once, not once per language — the q77 temperature mix composes
  * downstream), and cross-language provenance (the French page IS the
  * English page, not a near-dup to be hunted).
  *
  * Shape: the declarations come out of the codegen
  * `extract_hreflang` kernel (comment-blind, raw-text-aware — the
  * [[graft.text.HtmlText.pageDirectives]] scanner), hrefs resolve RFC
  * 3986 (non-crawlable schemes null out), and the clusters are
  * [[graft.dedup.Components]] over the undirected url↔alternate graph on
  * hashed 8-byte ids — declarations are frequently ASYMMETRIC on real
  * sites (only the English page annotates), and connected components is
  * exactly the closure that repairs that.
  */
object Alternates {

  /** (url, lang, alt_url) declaration edges, resolved and canonicalized;
    * non-crawlable alternates (mailto:, javascript:) drop by resolve-null.
    */
  def fromPages(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame =
    pages
      .select(col(urlCol).as("_base"),
        explode(graft.functions.extract_hreflang(col(htmlCol).cast("string")))
          .as("_a"))
      .select(col("_base").as("url"), col("_a.lang").as("lang"),
        graft.functions.resolve_url(col("_base"), col("_a.href")).as("alt_url"))
      .where(col("alt_url").isNotNull)

  /** Translation clusters: every url in the alternate graph labeled with
    * its cluster's representative (lexicographic min — deterministic) and
    * size. Pages declaring no alternates are absent (singletons carry no
    * cross-language information).
    */
  def clusters(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val e = fromPages(pages, urlCol, htmlCol)
      .select(graft.functions.canonicalize_url(col("url")).as("a"),
        graft.functions.canonicalize_url(col("alt_url")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .localCheckpoint(true) // read twice: nodes + pairs
    val nodes = e.select(col("a").as("url"))
      .union(e.select(col("b").as("url")))
      .distinct()
      .select(col("url"), xxhash64(col("url")).as("id"))
    val pairs = e.select(xxhash64(col("a")).as("id_a"),
      xxhash64(col("b")).as("id_b"))
    val labels = graft.dedup.Components.connectedComponents(pairs)
    // materialize once: the rep rollup and the final join both consume this
    // frame, and its lazy form re-runs the components label aggregation per
    // consumer
    val withLab = nodes.join(labels, Seq("id"), "left")
      .select(col("url"), coalesce(col("cluster_id"), col("id")).as("_cid"))
      .localCheckpoint(true)
    val rep = withLab.groupBy("_cid")
      .agg(min(col("url")).as("cluster_rep"), count(lit(1)).as("cluster_size"))
    withLab.join(rep, "_cid")
      .select(col("url"), col("cluster_rep"), col("cluster_size"))
  }
}
