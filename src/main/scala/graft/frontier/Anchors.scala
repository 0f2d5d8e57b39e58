package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation over the link graph — "what the rest of the
  * web calls each page", the classic ranking signal that doubles as
  * title/query text for link targets in a training corpus (the reference
  * crawler never reads anchors — its URL list is fixed,
  * `web_scraper_pipeline.py:41-56` — so these semantics are the rebuild's
  * own, from the public anchor-text literature).
  */
object Anchors {

  /** pages(urlCol, htmlCol) → (link, anchor) rows: anchors extracted
    * ([[graft.functions.extract_anchors]], codegen), hrefs resolved
    * (RFC 3986) against the page url with non-crawlable schemes dropped
    * by null semantics — same discipline as [[Discover.fromPages]].
    * Empty anchor texts (image-only links) are KEPT here; dropping them
    * is the aggregator's choice, not the parser's.
    */
  def fromPages(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame =
    pages
      .select(col(urlCol).as("_base"),
        explode(graft.functions.extract_anchors(col(htmlCol).cast("string"))).as("_a"))
      .select(
        graft.functions.resolve_url(col("_base"), col("_a.href")).as("link"),
        col("_a.anchor").as("anchor"))
      .where(col("link").isNotNull)

  /** Per-target top-k anchor texts by frequency: one map-side-combinable
    * (link, anchor) count, then a rank window PARTITIONED BY link (never
    * global); ties break lexicographically so the output is
    * total-order-deterministic in any engine. Empty anchors drop here —
    * an image-only link carries no text evidence.
    *
    * Scale shape: ONE exchange end to end — the explicit repartition by
    * `link` satisfies both the (link, anchor) grouping (hash on a key
    * subset co-locates the full key) and the rank window's partitioning,
    * so neither adds its own shuffle; map-side partial counts still fire
    * before it. The rank window then runs on count-collapsed rows
    * (≤ distinct anchors per target — a spammed target with many distinct
    * anchor strings widens its partition, but the strings arriving there
    * were already deduplicated by the count).
    */
  def topAnchors(anchors: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    anchors.where(col("anchor") =!= "")
      .repartition(col("link"))
      .groupBy("link", "anchor").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("link")).orderBy(col("n").desc, col("anchor"))))
      .where(col("rank") <= k)
  }

  /** FOCUSED-crawl priorities (Chakrabarti '99's relevance-directed
    * frontier, on the signal search engines actually have BEFORE fetching
    * a url — what the rest of the web says about it): each link target's
    * anchor texts pool into one surrogate document, BM25-scored against
    * the topic queries, and the top-k targets per topic come back as
    * `(qid, url, score_fp, rank)` — `rank` drops straight into
    * [[Scheduler.priorityOrderKey]]'s priority slot.
    *
    * The anchor pool is ORDER-FREE by construction: BM25 reads only the
    * term-frequency multiset and token count of the pooled text, both
    * invariant under `collect_list`'s nondeterministic order — so scores
    * are engine- and partition-order-exact even though the intermediate
    * string is not. Inherits [[graft.text.Bm25.topK]]'s integer
    * fixed-point scoring and salted two-phase top-k; the pooling is one
    * map-side-combinable groupBy of (short) anchor strings.
    */
  def focusPriorities(pages: DataFrame, queries: DataFrame, k: Int = 25,
      urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val pooled = fromPages(pages, urlCol, htmlCol)
      .where(col("anchor") =!= "")
      .groupBy(col("link"))
      .agg(concat_ws(" ", collect_list(col("anchor"))).as("anchor_text"))
    graft.text.Bm25.topK(pooled, "link", "anchor_text",
        queries, "qid", "qtext", k = k)
      .withColumnRenamed("id", "url")
  }
}
