package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.{bloom_agg, bloom_might_contain, canonicalize_url, cuckoo_agg, host_of, host_reverse, BloomBank, BloomBankProbe, CuckooBank, CuckooBankProbe}

/** URL-seen set: exact membership, bloom-accelerated.
  *
  * Reference semantics: the seen set is the key set of the results dict —
  * exact string membership, last-write-wins on duplicates
  * (`/root/reference/web_scraper_pipeline.py:198,205`). The rebuild keeps
  * membership EXACT (a probabilistic answer would drop never-fetched URLs),
  * but at 10^10 keys an exact anti-join of every candidate against the full
  * ledger shuffles the world every wave. The classic crawler layout
  * (Heritrix/IRLbot lineage) is used instead:
  *
  *   - ledger: the exact ground truth of (url_hash, canonical_url). The
  *     persistent, BUCKET-ALIGNED form (catalog table `CLUSTERED BY
  *     url_hash` + incrementally-merged per-bucket blooms + compaction)
  *     lives in [[Ledger]] — the anti-join there reads the ledger
  *     pre-partitioned and shuffles only the candidate side. The helpers
  *     in THIS object take ad-hoc ledger frames (benchmarks, single-shot
  *     jobs) and build the bloom bank on the fly;
  *   - bloom pre-filter: one BloomFilter per run (or per bucket at scale),
  *     built by the [[graft.functions.BloomAgg]] TypedImperativeAggregate.
  *     `might_contain == false` → DEFINITELY new → skips the join entirely.
  *     Only bloom-positives (true hits + fpp·|new|) reach the left-anti join,
  *     so the shuffled fraction is ≈ |dups| + 0.1% of |new| instead of 100%.
  *
  * Keys are `xxhash64(canonical_url)` (north rule: murmur3-family hashing;
  * Spark's `hash` = Murmur3_x86_32 is used for bucketing where 32 bits
  * suffice, xxhash64 where collision space matters).
  */
object Seen {

  /** Columns added to any frontier DataFrame with a `url` column. */
  def withUrlKeys(df: DataFrame): DataFrame = {
    val canon = df.withColumn("canonical_url", canonicalize_url(col("url")))
    canon
      .withColumn("url_hash", xxhash64(col("canonical_url")))
      .withColumn("host", host_of(col("canonical_url")))
      .withColumn("host_rev", host_reverse(col("host")))
  }

  /** Exact de-dup of candidates against the seen ledger, bloom-accelerated.
    *
    * @param candidates must carry `url_hash`
    * @param seenLedger must carry `url_hash`; pass an empty frame for wave 0
    * @return candidates minus seen (exact)
    */
  def filterUnseen(candidates: DataFrame, seenLedger: DataFrame,
      expectedSeen: Long = 1L << 20, fpp: Double = 1e-3): DataFrame = {
    val spark = candidates.sparkSession
    // Build the bloom with one aggregate job over the ledger. At sf scale a
    // single bloom is fine; at 10^10 this becomes one bloom per hash bucket
    // with the probe routed by pmod(url_hash, buckets) — same dataflow.
    val bloomRow = seenLedger.select(
      bloom_agg(col("url_hash"), math.max(expectedSeen, 1024L), fpp).as("bloom"))
      .collect()
    val bloomBytes = if (bloomRow.isEmpty || bloomRow(0).isNullAt(0)) null
      else bloomRow(0).getAs[Array[Byte]](0)
    if (bloomBytes == null) return candidates
    val maybeSeen = bloom_might_contain(lit(bloomBytes), col("url_hash"))
    // definitely-new rows bypass the shuffle; bloom-positives get verified.
    // NOTE the two branches each re-evaluate `candidates` — callers should
    // pass a cheap upstream (scan + canonicalize), i.e. run this BEFORE any
    // shuffling stage like dropInWaveDuplicates (the two commute: seen-status
    // is a function of url_hash, constant within a duplicate group).
    val positives = candidates.where(maybeSeen)
      .join(seenLedger.select("url_hash"), Seq("url_hash"), "left_anti")
    val negatives = candidates.where(!maybeSeen)
    negatives.unionByName(positives)
  }

  /** Partitioned-bloom variant of [[filterUnseen]] — the 10^10-scale shape
    * the north rule names ("partitioned bloom seen-set"):
    *
    *  - the ledger is bucketed by `pmod(url_hash, buckets)`; one bloom is
    *    built PER BUCKET, so partial merges fan out across `buckets` reduce
    *    tasks instead of funneling into one serial reducer;
    *  - the bank of sketches ships as ONE TorrentBroadcast (bytes move once
    *    per executor — a plan Literal would re-ship with every stage's task
    *    binary and destabilize the codegen cache);
    *  - probes route to their bucket's bloom; negatives skip the anti-join.
    *
    * Membership stays exact: positives are verified by the left-anti join.
    */
  def filterUnseenBucketed(candidates: DataFrame, seenLedger: DataFrame,
      buckets: Int = 64, expectedPerBucket: Long = 1 << 16,
      fpp: Double = 1e-2): DataFrame = {
    val spark = candidates.sparkSession
    val bucketOf = (c: Column) => pmod(c, lit(buckets)).cast("int")
    val bloomRows = seenLedger
      .groupBy(bucketOf(col("url_hash")).as("bucket"))
      .agg(bloom_agg(col("url_hash"), math.max(expectedPerBucket, 1024L), fpp).as("bloom"))
      .collect()
    if (bloomRows.isEmpty) return candidates
    val bank = new BloomBank(spark.sparkContext.broadcast(
      bloomRows.map(r => (r.getAs[Int]("bucket"), r.getAs[Array[Byte]]("bloom")))))
    val maybeSeen = Bridge.column(BloomBankProbe(bank,
      Bridge.expression(bucketOf(col("url_hash"))),
      Bridge.expression(col("url_hash"))))
    val positives = candidates.where(maybeSeen)
      .join(seenLedger.select("url_hash"), Seq("url_hash"), "left_anti")
    val negatives = candidates.where(!maybeSeen)
    negatives.unionByName(positives)
  }

  /** [[filterUnseenBucketed]] with a CALLER-SUPPLIED bank — for pipelines
    * that build the per-bucket blooms INSIDE an upstream job (e.g. as
    * `observe()` aggregates riding a staging write: the bloom partials
    * compute in the write's own tasks, so the bank costs ZERO extra jobs
    * and zero extra passes over the data — the layout that closed the
    * bench's bank-build job boundary). CONTRACT: the bank must contain AT
    * LEAST every `seenLedger` key — negatives bypass the anti-join, so a
    * bank MISSING seen keys mints false negatives = silently lost dedup
    * (the worst seen-set failure; same invariant as [[Ledger]]'s
    * `_SUCCESS`-gated banks). The safe direction is over-approximation:
    * a bank built from MORE keys (e.g. the whole staged frame instead of
    * the seen half) only costs extra anti-join traffic, never answers.
    * Pass rows as (bucket, serialized bloom).
    */
  def filterUnseenWithBank(candidates: DataFrame, seenLedger: DataFrame,
      bankRows: Array[(Int, Array[Byte])], buckets: Int): DataFrame = {
    val spark = candidates.sparkSession
    if (bankRows.isEmpty) return candidates
    val bucketOf = (c: Column) => pmod(c, lit(buckets)).cast("int")
    val bank = new BloomBank(spark.sparkContext.broadcast(bankRows))
    val maybeSeen = Bridge.column(BloomBankProbe(bank,
      Bridge.expression(bucketOf(col("url_hash"))),
      Bridge.expression(col("url_hash"))))
    val positives = candidates.where(maybeSeen)
      .join(seenLedger.select("url_hash"), Seq("url_hash"), "left_anti")
    val negatives = candidates.where(!maybeSeen)
    negatives.unionByName(positives)
  }

  /** Cuckoo-bank twin of [[filterUnseenBucketed]] — the OTHER sketch family
    * the north rule names ("partitioned bloom/cuckoo URL-seen set"). Same
    * dataflow (per-bucket sketch aggregate → one broadcast bank → probe
    * routes negatives past the anti-join) with the cuckoo trade: ~1.2e-4
    * fpp at 19.5 bits/key — fewer false positives reach the anti-join than
    * the 1e-2 bloom default at comparable bytes — and the bank supports
    * DELETION ([[graft.functions.CuckooFilter.delete]]) so seen-set
    * maintenance (unsee-on-error, TTL expiry) can patch sketches in place
    * instead of rebuilding from the ledger. Membership stays exact either
    * way: sketch positives are verified by the left-anti join, so a filter
    * false positive costs a shuffled row, never a wrong answer.
    */
  def filterUnseenCuckooBucketed(candidates: DataFrame, seenLedger: DataFrame,
      buckets: Int = 64, expectedPerBucket: Long = 1 << 16): DataFrame = {
    val spark = candidates.sparkSession
    val bucketOf = (c: Column) => pmod(c, lit(buckets)).cast("int")
    val rows = seenLedger
      .groupBy(bucketOf(col("url_hash")).as("bucket"))
      .agg(cuckoo_agg(col("url_hash"), math.max(expectedPerBucket, 1024L)).as("ck"))
      .collect()
    if (rows.isEmpty) return candidates
    val bank = new CuckooBank(spark.sparkContext.broadcast(
      rows.map(r => (r.getAs[Int]("bucket"), r.getAs[Array[Byte]]("ck")))))
    val maybeSeen = Bridge.column(CuckooBankProbe(bank,
      Bridge.expression(bucketOf(col("url_hash"))),
      Bridge.expression(col("url_hash"))))
    val positives = candidates.where(maybeSeen)
      .join(seenLedger.select("url_hash"), Seq("url_hash"), "left_anti")
    val negatives = candidates.where(!maybeSeen)
    negatives.unionByName(positives)
  }

  /** In-wave duplicate collapse: the reference re-fetches duplicate seeds but
    * the dict keeps one entry per url (`:205`) — output key-set = DISTINCT.
    * First occurrence (min seed_idx) wins so crawl order stays the first
    * appearance, matching the sequential loop's first-fetch position.
    *
    * Plan shape, in order of rejection:
    *  - min_by(struct(all cols)): the aggregation buffer holds strings, which
    *    kicks HashAggregateExec (UnsafeRow, primitive buffers only) over to
    *    ObjectHashAggregate/SortAggregate — measured 4× slower with heavy GC
    *    under 32 concurrent tasks;
    *  - groupBy(url_hash).min(seed_idx) + left-semi join back (round 1's
    *    choice): two exchanges, and NOT exact when two parents discover the
    *    same url with an EQUAL seed_idx — the semi join preserves tie
    *    multiplicity (found by the 20-wave real-discovery crawl);
    *  - THIS: row_number over (url_hash ORDER BY seed_idx) — ONE exchange +
    *    an in-partition sort of tiny per-url groups. url_hash is a
    *    max-cardinality key, so the window has none of the host-window's
    *    skew problem; rn=1 is exact under any input multiset (tie rows are
    *    identical by construction — every payload column derives from the
    *    url — so the arbitrary tie-pick is still deterministic output).
    */
  def dropInWaveDuplicates(candidates: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url_hash")).orderBy(col("seed_idx"))
    candidates
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
