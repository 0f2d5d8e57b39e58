package graft.frontier

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.{extract_links, resolve_url, extract_readable, chunk_text}

/** Link discovery and per-URL fetch/parse metrics — the two operators that
  * close the crawl loop (the reference never discovers links: its URL list
  * is fixed, `/root/reference/web_scraper_pipeline.py:41-56`, so these
  * semantics are north-rule surface, not reference parity).
  */
object Discover {

  /** Real link discovery for [[WaveLoop.run]]: scheduled wave ⋈ pages on
    * canonical_url → `extract_links(html)` → RFC 3986 resolve against the
    * fetched URL → candidate next-wave frontier (url, seed_idx).
    *
    * seed_idx policy: `parent_seed × maxLinksPerPage + link_position` —
    * deterministic BFS-ish priority (children inherit their parent's order,
    * tie-broken by position on the page). It is an ORDER key, not an id:
    * uniqueness across pages is irrelevant (the scheduler only needs a
    * deterministic total order and the dedup keeps min seed_idx per URL).
    * Deep crawls re-key per wave before overflow matters; at 1024
    * links/page the key survives ~5 waves from 10^6-scale seeds, and the
    * wave loop re-keys implicitly because every wave's schedule is ranked
    * fresh.
    *
    * Scale shape: inner join on canonical_url (bucket-aligned when pages is
    * a [[graft.sources.PageTable]]), html never survives past the explode,
    * and the explode output is (2 longs + 1 string)/link.
    */
  def fromPages(pages: DataFrame, maxLinksPerPage: Int = 1024): DataFrame => DataFrame =
    scheduled => {
      val p = pages.select(col("url").as("canonical_url"), col("html"))
      scheduled.select("canonical_url", "seed_idx")
        .join(p, Seq("canonical_url"))
        .select(col("seed_idx").as("parent_seed"), col("canonical_url").as("base"),
          posexplode(extract_links(col("html").cast("string"))).as(Seq("pos", "href")))
        .where(col("pos") < maxLinksPerPage)
        .select(resolve_url(col("base"), col("href")).as("url"),
          (col("parent_seed") * maxLinksPerPage + col("pos")).as("seed_idx"))
        .where(col("url").isNotNull)
    }

  /** Per-URL fetch/parse metrics (north rule: "fetch/parse metrics written
    * to Iceberg"): left-join the frontier against the pages table — a join
    * miss is the 404 analogue — and compute parse metrics on the hits.
    *
    * @param frontier must carry `urlCol` (the frontier-side join key)
    * @param pages    must carry (url, html)
    * @return frontier columns + (status INT 200|404, n_chars BIGINT,
    *         n_chunks BIGINT; parse columns NULL on 404)
    */
  def fetchParse(frontier: DataFrame, pages: DataFrame,
      maxWords: Int = graft.text.Chunker.MaxWords,
      overlap: Int = graft.text.Chunker.OverlapWords,
      urlCol: String = "url"): DataFrame = {
    val p = pages.select(col("url").as("__page_url"), col("html").as("__html"))
    frontier.join(p, frontier(urlCol) === p("__page_url"), "left")
      .withColumn("__extracted", extract_readable(col("__html").cast("string")))
      .withColumn("status", when(col("__html").isNull, 404).otherwise(200).cast("int"))
      .withColumn("n_chars", length(col("__extracted")).cast("long"))
      .withColumn("n_chunks",
        when(col("__extracted").isNull, lit(null).cast("long"))
          .otherwise(size(chunk_text(col("__extracted"), maxWords, overlap)).cast("long")))
      .drop("__page_url", "__html", "__extracted")
  }
}
