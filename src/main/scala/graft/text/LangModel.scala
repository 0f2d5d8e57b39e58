package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ngram_hashes

/** Reference-corpus language-model quality scoring — the CCNet signal
  * (Wenzek '20 §4.3: score every document by the perplexity of an LM
  * trained on a trusted corpus; low perplexity = "head" quality). KenLM's
  * 5-gram model is out of reach offline; the stand-in is an add-one-
  * smoothed word-BIGRAM model, which preserves the operator's entire
  * dataflow (train counts on ref corpus → broadcast/join → per-doc score)
  * and honestly downgrades only the modeling power.
  *
  * Scoring is INTEGER fixed-point end to end (the [[Bm25]] discipline):
  * each log is rounded ONCE at train time — `fp(x) = floor(ln(x)·scale +
  * 0.5)`, the half-up cushion absorbing the ±1-ulp cross-engine slack of
  * `ln` — and everything after is BIGINT adds, so a document's score is
  * identical across engines, partitionings, and merge orders.
  *
  *   ll(doc)  = Σ_positions [ fp(c12 + 1) − fp(c1 + V) ]      (≤ 0)
  *   nll_tok  = (−ll) div n_bigrams                            (≥ 0)
  *
  * where c12 = ref count of the bigram, c1 = ref count of the context
  * token (in context position), V = ref vocabulary size — add-one
  * smoothing, so OOV bigrams cost fp(1)−fp(c1+V) and fully-OOV positions
  * cost −fp(V): gibberish is expensive, as it should be.
  *
  * 100 TB shape: grams travel as 64-bit kernel hashes ([[
  * graft.functions.NgramHashes]] — codegen, one pass per row), document
  * text never survives past the kernel projection; train is two
  * map-side-combined counts; score is two equi-joins (broadcast when the
  * LM fits — a wiki-scale bigram table at ~16 B/row often does — else
  * shuffle, `broadcastLm = false`) followed by a map-side-partial groupBy
  * of (id, two longs). Nothing is ever keyed by raw text.
  */
object LangModel {

  /** A trained bigram LM: per-gram and per-context LOG-COUNT fixed-point
    * tables (the logs are taken at train time — score-side joins add
    * integers only) plus the vocabulary size and scale they were taken at.
    */
  case class BigramLm(bigramLp: DataFrame, contextLp: DataFrame,
      vocab: Long, scale: Long)

  private def fpLn(c: org.apache.spark.sql.Column, scale: Long) =
    floor(log(c.cast("double")) * scale + 0.5).cast("long")

  /** Train on a reference corpus. One pass for the kernel projection, one
    * distinct-count job for V, two grouped counts (map-side combined).
    */
  def train(ref: DataFrame, textCol: String, lowercase: Boolean = true,
      scale: Long = 1000000L): BigramLm = {
    // one kernel pass over the reference corpus: the vocab count and BOTH
    // count tables (each usually evaluated as its own broadcast build on
    // the score side) read the materialized token-hash arrays instead of
    // re-running the n-gram kernel three times; a reference corpus is
    // small by definition (it is the trusted subset), so the cache is cheap
    val t = ref.select(
      ngram_hashes(col(textCol), 1, lowercase).as("u"),
      ngram_hashes(col(textCol), 2, lowercase).as("b"))
      .localCheckpoint(true)
    val vocab = t.select(explode(col("u")).as("tok")).agg(
      countDistinct(col("tok"))).collect()(0).getLong(0)
    val bigramLp = t.select(explode(col("b")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c12"))
      .select(col("gram"), fpLn(col("c12") + 1L, scale).as("lp12_fp"))
    // context count = occurrences in CONTEXT position (all but the last
    // token of each document) — exactly the bigram first-slot multiset
    val contextLp = t.select(
        explode(slice(col("u"), lit(1), size(col("b")))).as("ctx"))
      .groupBy("ctx").agg(count(lit(1)).as("c1"))
      .select(col("ctx"), fpLn(col("c1") + vocab.toDouble, scale).as("lp1v_fp"))
    BigramLm(bigramLp, contextLp, math.max(vocab, 1L), scale)
  }

  /** Score documents under a trained LM. Returns one row PER INPUT id:
    * `(id, n_bigrams, ll_fp, nll_tok_fp)`; docs with < 2 tokens score
    * (0, 0, 0) — no evidence, not infinite quality.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      lm: BigramLm, lowercase: Boolean = true,
      broadcastLm: Boolean = true): DataFrame = {
    val hint = (df: DataFrame) => if (broadcastLm) broadcast(df) else df
    // fully-OOV position cost: add-one smoothing over an unseen context
    val lnV_fp = math.floor(math.log(lm.vocab.toDouble) * lm.scale + 0.5).toLong
    val t = docs.select(col(idCol).as("id"),
      ngram_hashes(col(textCol), 1, lowercase).as("u"),
      ngram_hashes(col(textCol), 2, lowercase).as("b"))
    val pairs = t
      .select(col("id"), slice(col("u"), lit(1), size(col("b"))).as("ctx"), col("b").as("gram"))
      .select(col("id"), explode(arrays_zip(col("ctx"), col("gram"))).as("p"))
      .select(col("id"), col("p.ctx").as("ctx"), col("p.gram").as("gram"))
    val scored = pairs
      .join(hint(lm.bigramLp), Seq("gram"), "left")
      .join(hint(lm.contextLp), Seq("ctx"), "left")
      .withColumn("lp_fp",
        coalesce(col("lp12_fp"), lit(0L)) - coalesce(col("lp1v_fp"), lit(lnV_fp)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_fp")).as("ll_fp"))
    // re-attach zero-evidence docs (≤ 1 token) so output is total over ids
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ll_fp"), lit(0L)).as("ll_fp"),
        coalesce(expr("(-ll_fp) div n_bigrams"), lit(0L)).as("nll_tok_fp"))
  }

  /** CCNet head/middle/tail bucketing by caller-supplied cutoffs on
    * `nll_tok_fp` (CCNet computes the cutoffs per language from score
    * percentiles OFFLINE and applies them as constants — same contract
    * here; an in-job global percentile would be a driver-scale sort).
    */
  def bucketize(scored: DataFrame, headMax: Long, middleMax: Long): DataFrame =
    scored.withColumn("bucket",
      when(col("nll_tok_fp") <= headMax, "head")
        .when(col("nll_tok_fp") <= middleMax, "middle")
        .otherwise("tail"))
}
