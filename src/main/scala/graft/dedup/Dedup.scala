package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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
      .agg(count(lit(1)).as("n_dups"), min(col("id")).as("keep_id"),
        collect_list(col("id")).as("ids"))
      .where(col("n_dups") > 1)

  /** Exact-dedup projection: one surviving row id per distinct text. */
  def exactDedupKeepIds(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), xxhash64(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("id")).as("keep_id"))

  /** MinHash-LSH candidate pairs: ids (a < b) sharing ≥1 LSH band bucket.
    * numHashes = bands × rowsPerBand. Collision probability for Jaccard s is
    * 1-(1-s^r)^b — with (b=8, r=4): s=0.8 → 0.97, s=0.3 → 0.06.
    */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = docs.select(col(idCol).as("id"),
      minhash_sig(col(textCol), shingleK, numHashes).as("sig"))
    // band b = hash of sig[b*r .. (b+1)*r) — explode to (bucket, id)
    val banded = sigs.select(col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))).as(Seq("band", "bucket")))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with estimated Jaccard from signature agreement
    * (fraction of matching minhashes). `threshold` filters the estimate;
    * exact verification is a separate map (`verifyJaccard`).
    */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = docs.select(col(idCol).as("id"),
      minhash_sig(col(textCol), shingleK, numHashes).as("sig"))
    val cands = minHashCandidates(docs, idCol, textCol, shingleK, bands, rowsPerBand)
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
      maxDist: Int = 3): DataFrame = {
    val nBlocks = maxDist + 1
    val width = 64 / nBlocks
    val sigs = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val blocks = sigs.select(col("id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(nBlocks - 1)),
        b => call_function("shiftrightunsigned", col("sig"), b * width)
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("block_idx", "block_val")))
    val l = blocks.as("l")
    val r = blocks.as("r")
    l.join(r,
        col("l.block_idx") === col("r.block_idx") &&
          col("l.block_val") === col("r.block_val") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxDist)
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
      threshold: Double, buckets: Seq[Column]): DataFrame = {
    val v = vecs.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val withNorm = v.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x)))
    // bucket frame carries ONLY (id, table, bucket): the vectors must not be
    // replicated ×tables through the explode or the shuffle moves dim×tables
    // doubles per row instead of 12 bytes
    val bk = vecs.select(col(idCol).as("id"), posexplode(array(buckets: _*)).as(Seq("t", "b")))
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
      minShared: Int = 2, maxDocFreq: Int = 1000): DataFrame = {
    val prints = docs.select(col(idCol).as("id"),
      explode(array_distinct(fp(col(textCol)))).as("print"))
    val kept =
      if (maxDocFreq <= 0) prints
      else {
        // array_distinct above ⇒ one row per (doc, print) ⇒ count = doc freq
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
}
