package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate dedup against a PERSISTED corpus signature
  * ledger — the shape that makes MinHash dedup work at crawl cadence: a
  * 100 TB corpus is deduplicated ONCE, its LSH band rows are kept, and
  * every new crawl wave is screened against the ledger (plus itself) in
  * time proportional to the WAVE, not the corpus. Re-running the full
  * pairwise pass per wave (the batch operators in [[Dedup]]) would re-pay
  * the corpus-wide shuffle every time.
  *
  * Ledger rows are `(id, band, bucket)` — 20 bytes/row, `bands` rows per
  * document, produced by [[Dedup.bandRows]]. Collision semantics are the
  * standard LSH index rule: a new document is a duplicate CANDIDATE iff it
  * shares ≥ 1 band bucket with any ledger document (for (b=8, r=4):
  * Jaccard 0.8 → caught with p≈0.97).
  *
  * Scale shape of [[screenBands]]: the ledger side first collapses to ONE
  * representative per (band, bucket) — a map-side-combinable `min(id)` —
  * so the probe join emits at most `bands` rows per new document no matter
  * how hot a bucket is (a 10^5-member template-cluster bucket would
  * otherwise multiply every probe by 10^5; this is the ledger-side mirror
  * of [[Dedup.minHashCandidatesFromSigs]]'s occupancy cap, exact instead
  * of lossy because membership, not pairing, is the question). `dup_of` =
  * min ledger id over hit buckets — min of per-bucket minima, so the
  * collapse does not change it.
  */
object SigLedger {

  /** Screen new band rows against ledger band rows. Returns one row per
    * new id: `(id, n_hit_bands, dup_of, novel)` — `dup_of` is the smallest
    * colliding ledger id (null when novel).
    */
  def screenBands(ledgerBands: DataFrame, newBands: DataFrame): DataFrame = {
    val reps = ledgerBands.groupBy(col("band"), col("bucket"))
      .agg(min(col("id")).as("lid"))
    val hits = newBands.join(reps, Seq("band", "bucket"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit_bands"), min(col("lid")).as("dup_of"))
      .withColumnRenamed("id", "__hid")
    newBands.select(col("id")).distinct()
      .join(hits, col("id") === col("__hid"), "left")
      .select(col("id"),
        coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"),
        col("dup_of"),
        col("__hid").isNull.as("novel"))
  }

  /** Production screen: minhash-sign `newDocs`, band identically to the
    * ledger, and [[screenBands]]. `(id, n_hit_bands, dup_of, novel)`.
    */
  def screen(ledgerBands: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 4): DataFrame =
    screenBands(ledgerBands,
      Dedup.bandRows(
        Dedup.minHashSigs(newDocs, idCol, textCol, shingleK, bands * rowsPerBand),
        bands, rowsPerBand))

  /** Append band rows to the ledger directory (parquet; one wave = one
    * append). Rows are repartitioned by `bucket` so probe joins read
    * co-located files; the ledger is append-only — compaction is a plain
    * parquet rewrite if ever needed, and [[screenBands]]'s rep-collapse
    * makes duplicate rows harmless.
    */
  def append(bandRows: DataFrame, path: String, numFiles: Int = 8): Unit =
    bandRows.select(col("id"), col("band"), col("bucket"))
      .repartition(numFiles, col("bucket"))
      .write.mode("append").parquet(path)

  /** Read the ledger's band rows; empty-schema frame when absent (a first
    * wave screens against nothing and accepts everything).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    if (graft.core.Fs.exists(path)) spark.read.parquet(path)
    else spark.range(0).select(col("id"),
      lit(0).as("band"), lit(0).as("bucket"))
}
