package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{minhash_sig, simhash64, fingerprints => fp}

/** Deduplication operators for the training-data pipeline, each designed
  * around its 100 TB shuffle shape:
  *
  *  - exact: hash-groupBy on a text digest — one shuffle of (digest, id),
  *    never of the text bytes;
  *  - MinHash+LSH (Broder '97 / Leskovec-Rajaraman-Ullman ch.3): signature →
  *    bands → explode to (band_hash) buckets → self-join INSIDE buckets only.
  *    The candidate join is bucket-local, so cost tracks the number of
  *    near-duplicate pairs, not n²;
  *  - SimHash (Charikar '02, Manku et al. WWW'07): 64-bit signature, block
  *    rotation join for Hamming ≤ k;
  *  - n-gram Jaccard: the exact verifier applied to LSH candidates.
  */
object Dedup {

  /** Exact duplicate groups by full-text digest. `keep`: min id per group.
    * The digest (xxhash64 + length as a tie-breaker against 64-bit
    * collisions at 10^10 rows) is 16 bytes/row on the wire vs the document
    * itself.
    */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), xxhash64(col(textCol)).as("text_hash"),
        length(col(textCol)).as("text_len"))
      .groupBy(col("text_hash"), col("text_len"))
      // members stay OUT of this frame: collect_list(ids) on a pathological
      // mega-group (one text duplicated 10^7×) is a single unbounded array
      // row — [[exactDuplicateMembers]] emits members as ROWS instead
      .agg(count(lit(1)).as("n_dups"), min(col("id")).as("keep_id"))
      .where(col("n_dups") > 1)

  /** Duplicate-group membership as ROWS — (keep_id, id) per member, bounded
    * per-row no matter how hot a group is. A semi-join of the docs' digests
    * against the >1 groups, so only duplicate rows shuffle.
    */
  def exactDuplicateMembers(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), xxhash64(col(textCol)).as("text_hash"),
      length(col(textCol)).as("text_len"))
    keyed.join(exactDuplicates(docs, idCol, textCol)
        .select("text_hash", "text_len", "keep_id"),
      Seq("text_hash", "text_len"))
      .select(col("keep_id"), col("id"))
  }

  /** Exact-dedup projection: one surviving row id per distinct text. */
  def exactDedupKeepIds(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), xxhash64(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("id")).as("keep_id"))

  /** MinHash-LSH candidate pairs: ids (a < b) sharing ≥1 LSH band bucket.
    * numHashes = bands × rowsPerBand. Collision probability for Jaccard s is
    * 1-(1-s^r)^b — with (b=8, r=4): s=0.8 → 0.97, s=0.3 → 0.06.
    *
    * `maxBucket` caps band-bucket occupancy: a bucket holding m documents
    * emits m(m-1)/2 candidate pairs, so one template-cluster bucket of 10^5
    * members alone produces 5×10^9 join rows — the pair-level mirror of the
    * fingerprint doc-freq cap. Buckets over the cap are dropped BEFORE the
    * self-join (near-dup recall for their members survives via the other
    * bands, whose buckets split the cluster differently). `<= 0` disables.
    */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      maxBucket: Int = 0): DataFrame =
    minHashCandidatesFromSigs(
      minHashSigs(docs, idCol, textCol, shingleK, bands * rowsPerBand),
      bands, rowsPerBand, maxBucket)

  /** MinHash signature frame `(id, sig ARRAY<INT>)`. Split out so callers
    * that need the signatures AGAIN after candidate generation (estimated-
    * Jaccard scoring in [[minHashNearDups]]) compute them ONCE —
    * `minhash_sig` is the most expensive text kernel in the repo
    * (numHashes × shingles work per row) and used to run twice per doc.
    */
  def minHashSigs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32): DataFrame =
    docs.select(col(idCol).as("id"),
      minhash_sig(col(textCol), shingleK, numHashes).as("sig"))

  /** [[minHashCandidates]] over a precomputed [[minHashSigs]] frame —
    * `sigs` must carry (id, sig) with `sig.length == bands × rowsPerBand`.
    */
  /** LSH band rows `(id, band, bucket)` from a [[minHashSigs]] frame —
    * band b = hash of sig[b*r .. (b+1)*r). The shared banding kernel for
    * the in-batch candidate join AND the persisted signature ledger
    * ([[SigLedger]]) — both sides MUST bucket identically or incremental
    * dedup silently misses.
    */
  def bandRows(sigs: DataFrame,
      bands: Int = 8, rowsPerBand: Int = 4): DataFrame =
    sigs.select(col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))).as(Seq("band", "bucket")))

  def minHashCandidatesFromSigs(sigs: DataFrame,
      bands: Int = 8, rowsPerBand: Int = 4, maxBucket: Int = 0): DataFrame = {
    val banded = bandRows(sigs, bands, rowsPerBand)
    val kept = capHotBuckets(banded, Seq("band", "bucket"), maxBucket)
    val l = kept.as("l")
    val r = kept.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      // pair dedup as a groupBy (≡ distinct): the partial (map-side) agg
      // collapses same-bucket repeats before the exchange
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .select("id_a", "id_b")
  }

  /** Drop rows of buckets whose occupancy exceeds `maxBucket` (`<= 0` = off).
    * One map-side-combinable count over the bucket keys; the hot set joins
    * back as an anti-join (broadcast-sized by construction: it only holds
    * buckets with > maxBucket members).
    */
  private def capHotBuckets(bucketed: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    if (maxBucket <= 0) bucketed
    else {
      val hot = bucketed.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__occ"))
        .where(col("__occ") > maxBucket)
        .select(keys.map(col): _*)
      bucketed.join(hot, keys, "left_anti")
    }

  /** MinHash near-dup pairs with estimated Jaccard from signature agreement
    * (fraction of matching minhashes). `threshold` filters the estimate;
    * exact verification is a separate map (`verifyJaccard`).
    */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    // ONE minhash_sig pass per doc, staged: the frame feeds three consumers
    // (banding + the two est-Jaccard joins) on DIFFERENT shuffle keys, so
    // without materialization Catalyst re-evaluates the kernel per consumer
    // (no common-subtree elimination across exchanges). The staged rows are
    // narrow — id + numHashes ints ≈ 140 B — a cheap trade against 2×
    // recompute of the heaviest text kernel.
    val sigs = minHashSigs(docs, idCol, textCol, shingleK, numHashes)
      .localCheckpoint(true)
    val cands = minHashCandidatesFromSigs(sigs, bands, rowsPerBand)
    cands
      .join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
      .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist.
    * Block-rotation scheme (Manku et al.): split 64 bits into maxDist+1
    * blocks; by pigeonhole, any pair within maxDist agrees on ≥1 whole
    * block → join on (block_idx, block_value), verify exact distance.
    */
  def simHashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBlock: Int = 0): DataFrame =
    simHashNearDupsFromSigs(
      docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig")),
      maxDist, maxBlock)

  /** [[simHashNearDups]] over a precomputed `(id, sig BIGINT)` frame — any
    * 64-bit similarity-preserving signature plugs into the same
    * block-rotation join (and an ARITHMETIC sig makes the operator
    * oracle-checkable end to end: the block scheme is EXACT for
    * hamming ≤ maxDist by pigeonhole, so the result set is simply "all
    * pairs within maxDist", which any engine can recompute from the sigs).
    */
  def simHashNearDupsFromSigs(sigs: DataFrame,
      maxDist: Int = 3, maxBlock: Int = 0): DataFrame = {
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    // maxBlock caps block-bucket occupancy — the simhash mirror of the
    // minhash band cap: a block value shared by m near-identical docs
    // (template boilerplate collapses whole 16-bit blocks) emits m²/2 join
    // rows on its own. Recall for capped members survives via their other
    // blocks. `<= 0` disables.
    val blocks = capHotBuckets(sigs.select(col("id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(nBlocks - 1)),
        b => call_function("shiftrightunsigned", col("sig"), b * width)
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("block_idx", "block_val"))),
      Seq("block_idx", "block_val"), maxBlock)
    val l = blocks.as("l")
    val r = blocks.as("r")
    l.join(r,
        col("l.block_idx") === col("r.block_idx") &&
          col("l.block_val") === col("r.block_val") && col("l.id") < col("r.id"))
      // hamming + threshold BEFORE the pair-dedup exchange (round 2 ran them
      // after a distinct() that carried both 64-bit sigs): the exchange now
      // moves only surviving (id_a, id_b, hamming) rows, the map-side
      // partial agg collapses multi-block repeats pre-shuffle, and the sig
      // columns never leave the join stage
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming")) // hamming is pair-determined; min = the value
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard for candidate pairs — the verifier stage. Pairs
    * frame must carry id_a/id_b; docs provide the texts. At scale this join
    * only moves candidate texts (|candidates| ≪ |docs|).
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3): DataFrame = {
    val texts = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    pairs
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("t", "t_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("t", "t_b"), "id_b")
      .withColumn("jaccard", graft.functions.jaccard_shingles(col("t_a"), col("t_b"), shingleK))
      .drop("t_a", "t_b")
  }

  /** ASYMMETRIC n-gram containment pairs — the dedup channel Jaccard
    * misses: a short document wholly quoted inside a longer one (excerpt,
    * syndicated lede, boilerplate clone inside an aggregator) has tiny
    * Jaccard but containment ≈ 1 on the SHORT side. Broder '97 defines
    * both; production pipelines gate on containment for exactly this
    * excerpt case.
    *
    * containment(A→B) = |grams(A) ∩ grams(B)| / |grams(A)|, reported as
    * integer ppm (floor) so any engine replays it exactly. Emits ORDERED
    * pairs (contained_id, container_id) — both orientations score
    * independently, each against its own denominator.
    *
    * Scale shape: one distinct-gram explode (codegen `ngram_hash_keys`,
    * 8-byte keys on the wire), `maxDocFreq` drops boilerplate grams
    * before the self-join (the q55/q21 cap story — a gram in m docs emits
    * m² join rows), and the equi-self-join exchanges (id, gram-hash)
    * pairs only; texts never shuffle. In-row totals come from a
    * projection, no second aggregate over the explode.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minPpm: Long = 900000L, maxDocFreq: Int = 0): DataFrame = {
    require(n >= 1 && n <= 64, s"n out of range: $n")
    require(minPpm >= 0L && minPpm <= 1000000L, s"minPpm out of range: $minPpm")
    def keys(c: Column) = graft.functions.ngram_hash_keys(c, n)
    val totals = docs.select(col(idCol).as("id"),
      size(keys(col(textCol))).cast("long").as("n_total"))
    val grams = capHotBuckets(
      docs.select(col(idCol).as("id"), explode(keys(col(textCol))).as("gh")),
      Seq("gh"), maxDocFreq)
    val inter = grams.as("a")
      .join(grams.as("b"),
        col("a.gh") === col("b.gh") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("contained_id"), col("b.id").as("container_id"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(totals.withColumnRenamed("id", "contained_id"), Seq("contained_id"))
      .withColumn("ppm", expr("(1000000 * n_inter) DIV n_total"))
      .where(col("ppm") >= minPpm)
      .select("contained_id", "container_id", "n_inter", "n_total", "ppm")
  }

  /** Embedding-cosine near-dup pairs over an ARRAY<FLOAT> column, EXACT
    * within LSH buckets: candidates = id pairs sharing ≥1 SRP bucket across
    * `tables` independent tables; each candidate's cosine is computed exactly
    * and thresholded. The join is bucket-local, so shuffled bytes track
    * bucket occupancy × candidate density — never n² (round 1 shipped an
    * all-pairs cartesian here; PlanSpec now pins its absence). Recall is the
    * standard SRP curve 1-(1-p^bits)^tables with p = 1-θ/π; raise `tables`
    * (or lower `bits`) to push it toward 1 for a given threshold.
    */
  def cosineNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 4, tables: Int = 16): DataFrame = {
    val buckets = (0 until tables).map(t =>
      graft.functions.srp_bucket(col(vecCol), bits, seed = 7 + t))
    cosineNearDupsBucketed(vecs, idCol, vecCol, threshold, buckets)
  }

  /** [[cosineNearDups]] with caller-supplied bucket columns (one per table) —
    * the generic kernel: any locality-sensitive INT bucketing plugs in (SRP,
    * axis-sign quantization, IVF assignments from a kmeans fit, …).
    */
  def cosineNearDupsBucketed(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, buckets: Seq[Column], maxBucket: Int = 0): DataFrame = {
    val v = vecs.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val withNorm = v.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x)))
    // bucket frame carries ONLY (id, table, bucket): the vectors must not be
    // replicated ×tables through the explode or the shuffle moves dim×tables
    // doubles per row instead of 12 bytes. maxBucket caps per-bucket
    // occupancy before the m²-emitting self-join (see minHashCandidates).
    // (An emit-at-first-colliding-table filter to pre-collapse the ×tables
    // pair multiplicity was tried and REVERTED: the per-join-row prefix
    // compare runs as interpreted higher-order array functions and measured
    // strictly slower than letting the distinct absorb the duplicates.)
    val bk = capHotBuckets(
      vecs.select(col(idCol).as("id"), posexplode(array(buckets: _*)).as(Seq("t", "b"))),
      Seq("t", "b"), maxBucket)
    val cands = bk.as("l")
      .join(bk.as("r"),
        col("l.t") === col("r.t") && col("l.b") === col("r.b") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    cands
      .join(withNorm.select(col("id").as("id_a"), col("v").as("v_a"), col("norm").as("n_a")), "id_a")
      .join(withNorm.select(col("id").as("id_b"), col("v").as("v_b"), col("norm").as("n_b")), "id_b")
      .withColumn("cosine",
        aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y), lit(0.0d),
          (acc, x) => acc + x) / (col("n_a") * col("n_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Winnowing-fingerprint overlap pairs: docs sharing ≥ minShared
    * fingerprints (position-independent long-run overlap detector).
    *
    * `maxDocFreq` caps hot prints: a fingerprint appearing in more than
    * that many documents (site boilerplate, license headers, navigation
    * chrome) is dropped BEFORE the self-join — one such print across d
    * documents would alone emit d² join rows, the classic web-corpus skew
    * killer. The document-frequency pass is a map-side-combinable count
    * and the stop-print set joins back as a broadcast anti-join. `<= 0`
    * disables the cap.
    */
  def fingerprintOverlap(docs: DataFrame, idCol: String, textCol: String,
      minShared: Int = 2, maxDocFreq: Int = 1000): DataFrame =
    fingerprintOverlapFromPrints(
      docs.select(col(idCol).as("id"),
        explode(array_distinct(fp(col(textCol)))).as("print")),
      minShared, maxDocFreq)

  /** Exact repeated-substring spans — the "exact substring dedup" of
    * Lee et al. '21 (Deduplicating Training Data Makes Language Models
    * Better): any `k`-token window whose exact text occurs at least
    * `minCount` times ACROSS THE CORPUS (other docs or the same doc) marks
    * its tokens as duplicated; overlapping/adjacent duplicated windows
    * merge into maximal spans `(id, span_start, span_end, n_windows)`
    * (token positions, end inclusive). Downstream either cuts the spans
    * or drops docs whose spans cover too much.
    *
    * The reference algorithm builds a corpus-wide suffix array — a
    * single-machine layout. The distributed form here hashes every
    * stride-1 window (xxhash64 of the joined tokens; 24 B/row on the
    * wire), counts occurrences with one map-side-combinable groupBy, and
    * joins the >`minCount` set back — join output is linear in the number
    * of DUPLICATED window occurrences (never d² per gram: the count
    * aggregate collapses first), so no occupancy cap is needed. The span
    * merge is a per-doc gaps-and-islands pass: windows partitioned by
    * doc, running max of window-end, island break when a window starts
    * past it — per-partition work bounded by doc length.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 50, minCount: Long = 2L, keepFirst: Boolean = false,
      maxOccurrences: Long = 0L): DataFrame = {
    require(k >= 1, s"k: $k")
    // (id, p, gram-hash) for every stride-1 window via the codegen'd
    // positional kernel (one tokenizer pass + rolling polynomial hashes;
    // the HOF transform/slice/concat_ws form runs interpreted, measured
    // 200× slower); short docs emit none. Case-SENSITIVE — exact
    // substring dedup, not normalized-text dedup.
    val wins = docs
      .select(col(idCol).as("id"),
        posexplode(graft.functions.ngram_hashes(col(textCol), k)).as(Seq("p", "gh")))
      .select(col("id"), col("p").cast("long").as("p"), col("gh"))
    val counted = wins.groupBy(col("gh")).agg(count(lit(1)).as("occ"))
    // maxOccurrences excludes mega-grams (site boilerplate shared by 10^6
    // pages) from span marking: they are BOILERPLATE, not duplication —
    // the quality-gate/fingerprint-cap operators own them — and under
    // keepFirst their occurrence rank would be one hot window partition.
    val dup = (if (maxOccurrences > 0) counted.where(col("occ") <= maxOccurrences)
      else counted)
      .where(col("occ") >= minCount)
      .select("gh")
    val matchedOcc = wins.join(dup, Seq("gh"), "left_semi")
    // keepFirst = Lee et al.'s cut policy: the globally FIRST occurrence
    // of each gram (min (id, p)) survives, later ones are marked. The
    // occurrence rank is a per-gram window — bounded by `maxOccurrences`
    // when set, and always bounded by the df of a non-boilerplate gram.
    val d =
      if (!keepFirst) matchedOcc
      else matchedOcc
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("gh")).orderBy(col("id"), col("p"))))
        .where(col("_rn") > 1)
        .drop("_rn")
    // gaps-and-islands merge of [p, p+k-1] intervals, per doc
    val byDoc = Window.partitionBy(col("id")).orderBy(col("p"))
    val prevMaxEnd = max(col("p") + (k - 1)).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = d
      .withColumn("_brk",
        when(col("p") > coalesce(prevMaxEnd, lit(-1L)) + 1L, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_brk")).over(byDoc))
    islands.groupBy(col("id"), col("_island"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("_island")
  }

  /** Apply a [[duplicateSpans]] result: rebuild each document's text with
    * the spanned token ranges REMOVED (whitespace-normalized join of the
    * survivors) — with `duplicateSpans(keepFirst = true)` this is exactly
    * Lee et al.'s dedup: one copy of every repeated substring survives,
    * the rest are cut. Adds `text_cut`, `n_tokens`, `n_tokens_cut`.
    *
    * Row-local: spans group per doc (bounded by the doc's own token
    * count), join back by id, and one indexed `filter` over the token
    * array does the cut — no per-token explode, no second shuffle.
    */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val sp = spans.groupBy(col("id"))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("_spans"))
      .withColumnRenamed("id", "__sid")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    docs.join(sp, docs(idCol) === sp("__sid"), "left")
      .drop("__sid")
      .withColumn("_toks", toks)
      .withColumn("_kept",
        when(col("_spans").isNull, col("_toks"))
          .otherwise(filter(col("_toks"), (t, i) =>
            !exists(col("_spans"), r => i >= r.getField("s") && i <= r.getField("e")))))
      .withColumn("text_cut", concat_ws(" ", col("_kept")))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("n_tokens_cut", (size(col("_toks")) - size(col("_kept"))).cast("long"))
      .drop("_spans", "_toks", "_kept")
  }

  /** Corpus-level LINE deduplication (the CCNet / RefinedWeb boilerplate
    * pass, Wenzek et al. 2020 §4.1): a line whose hash appears in at least
    * `maxDocFreq` DISTINCT documents is boilerplate (cookie banners, nav
    * footers, share buttons) and is removed from every document that
    * carries it. Paragraph-mode callers pass a paragraph separator.
    *
    * 100 TB shape: the corpus-wide aggregation runs entirely on 16-byte
    * `(line_hash, id)` rows — line TEXT never shuffles. A first map-side
    * `distinct` collapses within-doc repeats so the doc-frequency count is
    * over documents, not occurrences; the hot set (df ≥ cap) is then a tiny
    * fraction of distinct lines, and only `(id, idx)` pairs of DROPPED
    * lines flow back (again 16 bytes/row, bounded by boilerplate mass, not
    * corpus size). The rebuild is row-local — one indexed `filter` over the
    * doc's own split, the [[cutSpans]] pattern — so each document's bytes
    * move at most once, in the final id-keyed join.
    *
    * Returns `(id, n_lines, n_kept, text_clean)` for every input document
    * (documents whose every line is boilerplate survive with empty text —
    * downstream length gates kill them auditable-y, not silently here).
    */
  def dropDuplicateLines(docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Int, sep: String = "\n"): DataFrame = {
    val splitCol = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val hashed = docs.select(col(idCol).as("id"),
        posexplode(splitCol).as(Seq("idx", "line")))
      .select(col("id"), col("idx"), xxhash64(col("line")).as("line_hash"))
    // doc frequency = distinct docs per line hash (two-stage: the distinct
    // is map-side combinable, then the count is a partial agg of key-only
    // rows) — occurrence counts would let one spammy doc promote its own
    // repeated line to "boilerplate" for everyone
    val hot = hashed.select("line_hash", "id").distinct()
      .groupBy("line_hash").agg(count(lit(1)).as("df"))
      .where(col("df") >= maxDocFreq)
      .select("line_hash")
    val dropIdx = hashed.join(hot, Seq("line_hash"), "left_semi")
      .groupBy(col("id")).agg(sort_array(collect_list(col("idx"))).as("_drop"))
      .withColumnRenamed("id", "__did")
    docs.join(dropIdx, col(idCol) === col("__did"), "left")
      .withColumn("_lines", splitCol)
      .withColumn("_kept",
        when(col("_drop").isNull, col("_lines"))
          .otherwise(filter(col("_lines"), (_, i) => !array_contains(col("_drop"), i))))
      .select(col(idCol).as("id"),
        size(col("_lines")).cast("long").as("n_lines"),
        size(col("_kept")).cast("long").as("n_kept"),
        array_join(col("_kept"), sep).as("text_clean"))
  }

  /** [[fingerprintOverlap]] over a precomputed `(id, print BIGINT)` frame.
    * `prints` must hold ONE row per (doc, print) — the production path
    * guarantees it with array_distinct; the doc-frequency cap counts rows,
    * so duplicates would inflate df and over-cap. An arithmetic print set
    * makes the operator oracle-checkable end to end (cap included).
    */
  def fingerprintOverlapFromPrints(prints: DataFrame,
      minShared: Int = 2, maxDocFreq: Int = 1000): DataFrame = {
    val kept =
      if (maxDocFreq <= 0) prints
      else {
        // one row per (doc, print) ⇒ count = doc freq
        val hot = prints.groupBy(col("print"))
          .agg(count(lit(1)).as("df"))
          .where(col("df") > maxDocFreq)
          .select("print")
        prints.join(hot, Seq("print"), "left_anti")
      }
    val l = kept.as("l")
    val r = kept.as("r")
    l.join(r, col("l.print") === col("r.print") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("shared_prints"))
      .where(col("shared_prints") >= minShared)
  }

  /** Quality-aware survivor selection over duplicate clusters (the SemDeDup
    * / "keep the best copy" policy, Abbas '23 §3): instead of the min-id
    * representative, each cluster keeps its argmax-QUALITY member — ties
    * break to the smaller id so the choice is total and engine-independent.
    *
    * @param labels  `(idCol, clusterCol)` — [[Components.connectedComponents]]
    *                output (every pair member, one label each)
    * @param quality `(idCol, scoreCol)` — any orderable per-doc score
    *                (LM nll negated, token count, composed gate score…)
    * @return one row per labeled id: `(idCol, clusterCol, keep_id)`
    *
    * Shape: a mega-cluster (boilerplate that all collapsed into one
    * component) would make a per-cluster WINDOW a single-task funnel, so
    * the argmax runs as two map-side-combinable aggregations — max score
    * per cluster, then min id among the maximizers — primitive buffers
    * only, no struct/min_by ObjectHashAggregate fallback, O(clusters)
    * rows after each exchange.
    */
  def keepBestInClusters(labels: DataFrame, quality: DataFrame,
      idCol: String = "id", clusterCol: String = "cluster_id",
      scoreCol: String = "score"): DataFrame = {
    // materialize the scored labels once: the max-score aggregate and the
    // argmax filter are separate consumers, and `labels` is typically a
    // lazy connected-components output whose label aggregation would
    // otherwise re-run per consumer (3× counting the final re-attach)
    val q = labels.join(quality.select(col(idCol), col(scoreCol)), Seq(idCol))
      .localCheckpoint(true)
    val best = q.groupBy(col(clusterCol))
      .agg(max(col(scoreCol)).as("__best"))
    val keep = q.join(best, Seq(clusterCol))
      .where(col(scoreCol) === col("__best"))
      .groupBy(col(clusterCol))
      .agg(min(col(idCol)).as("keep_id"))
    // re-attach over LABELS, not q: an unscored id whose cluster-mates are
    // scored must still come back labeled (partial-quality contract)
    labels.join(keep, Seq(clusterCol))
      .select(col(idCol), col(clusterCol), col("keep_id"))
  }
}
