package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed pre-training quality gate: every per-document signal the
  * engine computes (token count, mean word length, stopword ratio,
  * duplicate-line mass, top-bigram repetition) applied as one Gopher-style
  * filter pass, emitting per-row failure REASONS rather than a bare
  * boolean — at 100 TB the reasons histogram is how you tune thresholds
  * without re-running the sweep.
  *
  * Shape: one projection over the scan (every signal is a codegen'd
  * expression or plain column arithmetic; no UDF, no shuffle, no join), so
  * the gate fuses into whatever reads the corpus next.
  *
  * Threshold defaults follow the Gopher rules' spirit (Rae et al. 2021
  * §A1.1) scaled to this corpus's synthetic word-soup documents; every
  * threshold is a parameter because the filter IS the tuning surface.
  */
object CorpusFilter {

  final case class Thresholds(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      maxDupLineFrac: Double = 0.30,
      maxTopBigramFrac: Double = 0.18)

  /** Adds `n_tokens`, `mean_word_len`, `dup_line_frac`, `top_bigram_frac`,
    * `reasons` (sorted ARRAY<STRING> of failed checks, empty = clean) and
    * `passed` to `docs`. Reason vocabulary: too_short, too_long,
    * word_len_out_of_range, dup_lines, repeated_bigram.
    */
  def withGate(docs: DataFrame, textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val text = col(textCol)
    val toks = split(trim(text), "\\s+")
    val nTokens = size(toks)
    val meanWordLen =
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") / nTokens
    val rep = Repetition.statsCol(text)
    val dupLine = rep.getField("dup_line_frac")
    val topBigram = rep.getField("top_bigram_frac")
    def reason(cond: Column, name: String): Column =
      when(cond, lit(name)).otherwise(lit(null).cast("string"))
    val reasons = array_sort(filter(array(
      reason(nTokens < t.minTokens, "too_short"),
      reason(nTokens > t.maxTokens, "too_long"),
      reason(meanWordLen < t.minMeanWordLen || meanWordLen > t.maxMeanWordLen,
        "word_len_out_of_range"),
      reason(dupLine > t.maxDupLineFrac, "dup_lines"),
      reason(topBigram > t.maxTopBigramFrac, "repeated_bigram")),
      r => r.isNotNull))
    docs
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("dup_line_frac", dupLine)
      .withColumn("top_bigram_frac", topBigram)
      .withColumn("reasons", reasons)
      .withColumn("passed", size(reasons) === 0)
  }

  /** Soft-404 detection (Bar-Yossef et al., WWW '04 "Sic transit gloria
    * telae"): servers that answer 200 with an error body poison both the
    * corpus (the "page" passes every HTTP check) and the seen-set (the
    * crawler believes it fetched the real page and never retries). The
    * HTTP status can't help — this gate reads the DOCUMENT: an
    * error-phrase title ("404", "not found", "no longer exists", "page
    * unavailable") from the [[graft.functions.page_outline]] kernel, or a
    * near-empty extracted body (≤ `maxErrorTokens` tokens) carrying an
    * error phrase. Deliberately phrase-list simple — deterministic,
    * SQL-replayable, and exactly the heuristic family the paper measures;
    * one projection, both kernels codegen'd, no shuffle.
    */
  def withSoft404(pages: DataFrame, htmlCol: String = "html",
      maxErrorTokens: Int = 12): DataFrame = {
    val title = graft.functions.page_outline(col(htmlCol)).getField("title")
    val text = graft.functions.extract_readable(col(htmlCol))
    val nTokens = size(split(trim(text), "\\s+")).cast("long")
    val tl = lower(title)
    val bl = lower(text)
    def hasErrPhrase(c: Column): Column =
      c.contains("404") || c.contains("not found") ||
        c.contains("no longer exists") || c.contains("page unavailable")
    val soft = hasErrPhrase(tl) || (nTokens <= maxErrorTokens && hasErrPhrase(bl))
    pages
      .withColumn("title", title)
      .withColumn("n_body_tokens", nTokens)
      .withColumn("soft404", soft)
  }

  /** Only the survivors, original columns. */
  def survivors(docs: DataFrame, textCol: String,
      t: Thresholds = Thresholds()): DataFrame =
    withGate(docs, textCol, t).where(col("passed"))
      .select(docs.columns.map(col): _*)

  /** Deterministic per-row uniform in [0, 1): `pmod(xxhash64(key, salt),
    * 10^6) ∕ 10^6` — the production `u` for [[sampleBySource]]. Hash-based,
    * not `rand()`: sampling decisions must be REPRODUCIBLE across retries,
    * re-runs, and engines (a task retry that re-rolled rand() would emit a
    * different corpus — silent nondeterminism in the training set).
    */
  def uniformHash(key: Column, salt: Long = 0L): Column =
    pmod(xxhash64(key, lit(salt)), lit(1000000L)).cast("double") / 1000000.0d

  /** Source-mixture sampling — the domain-reweighting step between quality
    * gating and packing in a training-data pipeline (sample source A at 3×,
    * B at 0.1×): each row is kept `floor(w)` times plus one more iff
    * `u < frac(w)`, so E[copies] = w exactly, per source. Upsampled copies
    * are numbered in `copy` (1..k) so downstream shuffling/packing can
    * treat them as distinct rows.
    *
    * Shape: one projection + a row-local explode — no shuffle, no join, no
    * driver participation; weights compile into a CASE column. Skew-free
    * by construction (a 3× source emits 3 narrow rows per input row, it
    * does not hot-key anything). `u` must be a deterministic per-row
    * uniform — [[uniformHash]] over the row's id is the production choice;
    * it is a parameter so callers control the hash domain (and oracles can
    * replay the arithmetic in any engine).
    */
  def sampleBySource(docs: DataFrame, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double, u: Column): DataFrame = {
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "sampling weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    explodeByWeight(docs, w, u)
  }

  /** The floor + fractional-Bernoulli explode shared by the mixture
    * samplers: each row kept `floor(w)` times plus one more iff
    * `u < frac(w)` → E[copies] = w exactly.
    */
  private def explodeByWeight(docs: DataFrame, w: Column, u: Column): DataFrame =
    docs
      .withColumn("_copies",
        (floor(w) + when(u < (w - floor(w)), 1.0d).otherwise(0.0d)).cast("long"))
      .where(col("_copies") >= 1L) // filter FIRST: sequence(1, 0) counts DOWN
      .withColumn("copy", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")

  /** Temperature-based source balancing — the multilingual-LLM mixture
    * rule (sample source s with probability ∝ n_s^alpha; alpha < 1
    * flattens the head and lifts the tail — the XLM-R/mT5 recipe): emits
    * one row per source with its expected-copies `weight` such that the
    * sampled corpus totals `targetDocs` docs in temperature proportions:
    * weight_s = targetDocs·s_fp ∕ (T·n_s), s_fp = floor(n_s^alpha·2^20)
    * rounded ONCE (the BM25/LM fixed-point discipline), T = Σ s_fp an
    * exact BIGINT. At alpha = 0.5 (the default) n^alpha is IEEE sqrt —
    * correctly rounded, so the whole weight table is engine-reproducible
    * (other alphas go through pow(), whose last ulp is libm's). The
    * subsequent double arithmetic is a fixed sequence of exact int→double
    * promotions (all values < 2^53) and correctly-rounded ops — identical
    * in any IEEE engine. E[output size] = targetDocs exactly.
    *
    * Shape: one map-combinable count per source (the only corpus pass —
    * checkpointed so the Σ does not re-scan), a ≤#sources-row total
    * broadcast back via crossJoin; no driver round-trip.
    */
  def temperatureWeights(docs: DataFrame, sourceCol: String,
      targetDocs: Long, alpha: Double = 0.5): DataFrame = {
    require(targetDocs >= 0, s"targetDocs must be >= 0: $targetDocs")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val sCol =
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), lit(alpha))
    val scored = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("s_fp", floor(sCol * (1L << 20)).cast("long"))
      .localCheckpoint(true) // tiny (#sources rows); freezes the corpus pass
    scored.crossJoin(broadcast(scored.agg(sum(col("s_fp")).as("t_fp"))))
      .withColumn("weight",
        (lit(targetDocs.toDouble) * col("s_fp").cast("double")) /
          (col("t_fp").cast("double") * col("n_docs").cast("double")))
  }

  /** Sample the corpus at temperature `alpha` to an expected `targetDocs`
    * total: [[temperatureWeights]] broadcast-joined back (one row per
    * source) and realized by the same floor + fractional-Bernoulli explode
    * as [[sampleBySource]]; `u` as there — a deterministic per-row
    * uniform ([[uniformHash]] in production).
    */
  def sampleByTemperature(docs: DataFrame, sourceCol: String,
      targetDocs: Long, u: Column, alpha: Double = 0.5): DataFrame = {
    val w = temperatureWeights(docs, sourceCol, targetDocs, alpha)
      .select(col("source").as("__mix_source"), col("weight").as("__mix_w"))
    explodeByWeight(
      docs.join(broadcast(w), docs(sourceCol) === col("__mix_source"))
        .drop("__mix_source"),
      col("__mix_w"), u)
      .drop("__mix_w")
  }

  /** Per-document LINK DENSITY — the Kohlschütter boilerplate heuristic
    * (Boilerpipe, WSDM '10): navigation/footer chrome is mostly anchor
    * text, prose is mostly not. Given the raw html and its extracted
    * text, emits `n_links`, `anchor_chars` (non-whitespace chars across
    * all anchor texts — one row-local fold over the codegen'd
    * extract_anchors array, no shuffle), `text_chars`, and
    * `link_density_ppm` = anchor_chars·10^6 ∕ (text_chars + anchor_chars)
    * as an exact integer division — engine-reproducible, and the
    * threshold is the caller's ([[Thresholds]]-style gates compose it).
    */
  def linkDensity(docs: DataFrame, htmlCol: String, textCol: String): DataFrame = {
    val anchors = graft.functions.extract_anchors(col(htmlCol).cast("string"))
    val anchorChars = aggregate(anchors, lit(0L),
      (acc, a) => acc + length(regexp_replace(a.getField("anchor"), "\\s", "")))
    docs
      .withColumn("n_links", size(anchors).cast("long"))
      .withColumn("anchor_chars", anchorChars)
      .withColumn("text_chars",
        length(regexp_replace(col(textCol), "\\s", "")).cast("long"))
      .withColumn("link_density_ppm",
        expr("anchor_chars * 1000000 DIV greatest(text_chars + anchor_chars, 1)"))
  }

  /** HOST-level quality verdicts (the RefinedWeb/C4 pattern: judge the
    * DOMAIN by its documents' aggregate quality, then drop the whole
    * domain): over a [[withGate]]-shaped frame (`passed`, `n_tokens`
    * present), aggregate per host and rule a host out when enough of its
    * documents exist to judge (`n_docs ≥ minDocs`) AND fewer than
    * `minPassPpm`/10^6 of them pass the per-document gate. Hosts below the
    * evidence bar stay in — a domain is never condemned on 3 documents.
    *
    * Integer arithmetic only (`pass_ppm` = exact integer division), so the
    * verdict is engine-reproducible. Shape: one map-side-combinable
    * groupBy of 4 numeric partials per host — no document bytes move.
    */
  def hostQuality(gated: DataFrame, hostCol: String,
      minDocs: Long = 10L, minPassPpm: Long = 300000L): DataFrame =
    gated.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("passed").cast("long")).as("n_passed"),
        sum(col("n_tokens")).as("host_tokens"))
      .withColumn("pass_ppm", expr("n_passed * 1000000 DIV n_docs"))
      .withColumn("host_ok",
        col("n_docs") < minDocs || col("pass_ppm") >= minPassPpm)

  /** Apply [[hostQuality]] verdicts: survivors = documents that pass the
    * per-document gate AND whose host is not ruled out. One left-semi join
    * against the (tiny: one row per host) verdict frame — broadcast-able
    * at any corpus scale where hosts ≪ documents.
    */
  def survivorsByHost(gated: DataFrame, hostCol: String,
      minDocs: Long = 10L, minPassPpm: Long = 300000L): DataFrame = {
    val ok = hostQuality(gated, hostCol, minDocs, minPassPpm)
      .where(col("host_ok")).select(col("host").as("__okhost"))
    gated.where(col("passed"))
      .join(ok, col(hostCol) === col("__okhost"), "left_semi")
  }

  /** C4-style line and document cleaning (Raffel et al. '20 §2.2, the
    * "Colossal Clean Crawled Corpus" heuristics) — the OTHER classic gate
    * family next to the Gopher signals in [[withGate]]: C4 cleans at LINE
    * granularity first (web pages interleave prose with nav/button/footer
    * fragments that line rules catch cheaply), then drops whole documents
    * that are too thin or code-like after cleaning.
    *
    * Line keep rules (all must hold): the right-trimmed line ends in a
    * terminal punctuation mark (`.` `!` `?` `"`); it has at least
    * `minWordsPerLine` whitespace-separated words; it does not mention
    * "javascript" (case-insensitive — the "please enable JavaScript"
    * boilerplate family). Document rules on the ORIGINAL text: fewer than
    * `minKeptLines` surviving lines, a "lorem ipsum" occurrence
    * (placeholder pages), or a `{` (code, not prose) drop the page.
    *
    * One projection over the scan — no shuffle, no join; the per-row HOF
    * work is bounded by the line count (hundreds, not the token-window
    * blow-up that forced the codegen n-gram kernel). Every rule is plain
    * string arithmetic, so the whole gate replays exactly in SQL.
    */
  def c4Clean(docs: DataFrame, textCol: String,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3): DataFrame = {
    // CRLF-tolerant split: a bare "\n" split leaves the '\r' glued to the
    // line, rtrim only trims spaces, and the terminal-punct probe then
    // sees '\r' — dropping EVERY line of a CRLF document
    val lines = split(col(textCol), "\\r?\\n", -1)
    val keepLine = (l: Column) => {
      val last = substring(rtrim(l), -1, 1)
      val words = when(trim(l) === "", lit(0))
        .otherwise(size(split(trim(l), "\\s+")))
      last.isin(".", "!", "?", "\"") && words >= minWordsPerLine &&
        !lower(l).contains("javascript")
    }
    val kept = filter(lines, keepLine)
    docs
      .withColumn("n_lines", size(lines))
      .withColumn("n_kept_lines", size(kept))
      .withColumn("kept_text", concat_ws("\n", kept))
      .withColumn("c4_keep",
        col("n_kept_lines") >= minKeptLines &&
          !lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{"))
  }
}
