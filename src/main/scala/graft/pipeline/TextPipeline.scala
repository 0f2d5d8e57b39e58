package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.{chunk_explode, chunk_text, extract_readable, hash_embed}

/** The per-row document pipeline — the declarative form of the reference's
  * `scrape_and_prepare` + `process_urls`
  * (`/root/reference/web_scraper_pipeline.py:186-212`):
  *
  *   fetch(url) → clean_html → extract_readable_text → preprocess_text
  *     → hybrid_chunk → embed
  *
  * Here "fetch" is a column read (`html` from the pages table — Common-Crawl
  * replay; there is no live network in a 100 TB batch job), and every stage
  * is a codegen'd expression, so the whole pipeline is ONE whole-stage-
  * codegen'd map over the scan: no shuffle, no materialization between
  * stages, linear scaling by adding executors.
  */
object TextPipeline {

  /** pages(url, html, …) → + text (the byte-identical invariant column). */
  def withExtractedText(pages: DataFrame, htmlCol: String = "html"): DataFrame =
    pages.withColumn("text",
      extract_readable(col(htmlCol).cast("string")))

  /** url + text → one row per chunk (url, chunk_id, chunk). */
  def chunks(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("url"), chunk_explode(col(textCol)).as(Seq("chunk_id", "chunk")))

  /** chunk rows → + 384-dim embedding. */
  def withEmbeddings(chunkRows: DataFrame): DataFrame =
    chunkRows.withColumn("embedding", hash_embed(col("chunk")))

  /** The reference's full output contract, one row per url
    * (`README.md:38-47`): {url, full_text, chunks, embeddings}. Array-typed
    * columns computed per-row (no groupBy — the chunker emits the array
    * directly, so assembling the result row costs zero shuffles).
    */
  def results(pages: DataFrame, htmlCol: String = "html"): DataFrame =
    withExtractedText(pages, htmlCol)
      .withColumn("chunks", chunk_text(col("text")))
      .withColumn("embeddings", transform(col("chunks"), c => hash_embed(c)))
      .select(col("url"), col("text").as("full_text"), col("chunks"), col("embeddings"))

  /** JSON parity with the reference's `json.dump` (`:231-232`): one JSON
    * object per url.
    */
  def resultsJson(pages: DataFrame): DataFrame =
    results(pages).select(col("url"),
      to_json(struct(col("full_text"), col("chunks"), col("embeddings"))).as("result_json"))
}
