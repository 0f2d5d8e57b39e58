package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus (Robertson-Spärck Jones; the
  * Lucene-style `ln(1 + (N-df+0.5)/(df+0.5))` idf, always ≥ 0) — the
  * targeted-curation operator of a training-data pipeline: given probe
  * queries (benchmark prompts, topic seeds), pull the top-k matching
  * documents for upweighting, inspection, or decontamination review.
  *
  * Scoring is INTEGER fixed-point end to end so ranking is reproducible
  * across engines and runs: idf is rounded once to `idfScale` (the ±1-ulp
  * cross-engine slack of `ln` is absorbed by the half-up rounding — every
  * other operation is IEEE-exact on identical inputs), each (term, doc)
  * contribution is floored to `scoreScale`, and the final score is a SUM
  * OF BIGINTS — order-independent where a double sum would depend on
  * partition merge order. Ties break by ascending doc id.
  *
  * 100 TB shape: postings are (term, id, tf) rows — document text never
  * shuffles past tokenization; the query side (terms × idf × corpus
  * scalars) collapses to a broadcast; per-doc scores partial-aggregate
  * map-side; and the top-k runs as a SALTED two-phase rank (per-(query,
  * salt) top-k first, then top-k of the ≤ salts·k survivors) so a query
  * matching 10^9 documents never funnels them through one task — the
  * [[graft.frontier.Scheduler]] skew pattern, exact because top-k of
  * per-salt top-ks is the global top-k.
  */
object Bm25 {

  /** Top-k documents per query. Returns `(qid, id, score_fp, rank)`.
    *
    * `queries(qidCol, qtextCol)` is expected to be SMALL (it is broadcast
    * twice); terms are whitespace-split, duplicates within a query count
    * once. Query terms absent from the corpus contribute nothing.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      idfScale: Long = 1000000L, scoreScale: Long = 1000L,
      salts: Int = 16): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      filter(split(col(textCol), "\\s+"), t => t =!= "").as("_tk"))
    val dl = toks.select(col("id"), size(col("_tk")).cast("long").as("dl"),
      col("_tk"))
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(
        filter(split(col(qtextCol), "\\s+"), t => t =!= ""))).as("term"))
    // Postings restricted to the QUERY VOCABULARY before any aggregation
    // (guide §2.3/§3.2: pre-filter the big side before it shuffles): scoring
    // and df only ever consume query-term postings, and per-term df over the
    // filtered set equals corpus-wide df for those terms — identical scores.
    // The broadcast semi-join drops non-query tokens in the explode's own
    // stage, so the two aggregations below shuffle |matches| rows instead of
    // the whole corpus token stream (round-5 layout aggregated EVERY token:
    // measured 4.0-5.0 s → 0.6 s on the sf0.1 bench for a 3-term query).
    val qvocab = qterms.select("term").distinct()
    val post = dl.select(col("id"), col("dl"), explode(col("_tk")).as("term"))
      .join(broadcast(qvocab), Seq("term"), "left_semi")
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("_tk")).cast("long")).as("total_dl"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    val qidf = dfreq.join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_fp",
        floor(log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * idfScale + 0.5).cast("long"))
      .select("qid", "term", "idf_fp", "n_docs", "total_dl")
    val scored = post.join(broadcast(qidf), Seq("term"))
      .withColumn("_tfp",
        col("tf") * lit(k1 + 1) / (col("tf") +
          lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / (col("total_dl").cast("double") / col("n_docs"))))))
      .withColumn("_contrib", floor(col("idf_fp") * col("_tfp") * scoreScale).cast("long"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("_contrib")).as("score_fp"))
    val salted = scored.withColumn("_salt", pmod(xxhash64(col("id")), lit(salts.toLong)))
    val w1 = Window.partitionBy("qid", "_salt")
      .orderBy(col("score_fp").desc, col("id").asc)
    val pruned = salted.withColumn("_r", row_number().over(w1))
      .where(col("_r") <= k).drop("_r", "_salt")
    val w2 = Window.partitionBy("qid").orderBy(col("score_fp").desc, col("id").asc)
    pruned.withColumn("rank", row_number().over(w2).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "id", "score_fp", "rank")
  }
}
