package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Fs
import graft.dedup.{Dedup, SigLedger}

/** Near-duplicate screening at STREAM cadence — the streaming twin of
  * [[graft.dedup.SigLedger]]: documents arrive as a stream, every
  * micro-batch is screened against the persisted corpus signature ledger,
  * and the batch's novel signatures append back, so each document is
  * processed once in time proportional to the batch.
  *
  * Shape: `foreachBatch`, not `mapGroupsWithState` — deliberately. The
  * ledger state is a 10^10-row band table that must live in STORAGE
  * (shared with the batch engine, survivable, compactable), not in the
  * state store; Spark's own guidance for stream-vs-storage joins with
  * per-batch writeback is exactly this pattern. The batch and streaming
  * paths call the SAME [[screenAndCommit]] cycle, so stream output ≡ the
  * equivalent batch wave cycle row for row (spec-pinned).
  *
  * Exactly-once: a failed/replayed micro-batch re-runs `foreachBatch`, so
  * both writes are fenced by `batch=<id>` directories written with
  * overwrite — a replay rewrites the same bytes instead of doubling the
  * ledger (and the screen EXCLUDES the running batch's own fence dir, so
  * a replay after a partial append cannot see the batch's own signatures
  * and mis-call its documents duplicates of themselves).
  *
  * Intra-batch copies both screen against the ledger only (both novel if
  * the corpus has no prior copy) — cross-WAVE dedup is the ledger's job;
  * run the batch [[Dedup]] operators inside a batch when intra-batch
  * collapse matters (a micro-batch is small; the corpus is not).
  */
object StreamingDedup {

  private val emptyBands = (s: SparkSession) =>
    s.range(0).select(col("id"), lit(0).cast("int").as("band"),
      lit(0).cast("int").as("bucket"))

  /** Union of the ledger's committed `batch=<k>` fence dirs (skipping
    * `excludeBatch` — the caller's own running batch — and any dir without
    * `_SUCCESS`: a crashed write must read as absent). Per-dir reads
    * unioned explicitly: mixed-layout parquet discovery over the root
    * would fail (the PageTable manifest lesson).
    */
  def readLedger(spark: SparkSession, path: String,
      excludeBatch: Long = -1L): DataFrame = {
    val dirs =
      if (!Fs.exists(path)) Seq.empty
      else Fs.childNames(path)
        .filter(_.startsWith("batch="))
        .filter(n => n.stripPrefix("batch=").toLongOption.exists(_ != excludeBatch))
        .filter(n => Fs.exists(s"$path/$n/_SUCCESS"))
    if (dirs.isEmpty) emptyBands(spark)
    else dirs.map(n => spark.read.parquet(s"$path/$n")
        .select("id", "band", "bucket"))
      .reduce(_ unionByName _)
  }

  /** ONE wave/micro-batch cycle — shared verbatim by the streaming sink
    * and any batch caller (that identity IS the parity contract): sign the
    * batch, screen against every committed prior batch, append the novel
    * documents' band rows under this batch's fence, return the screen
    * verdicts `(id, n_hit_bands, dup_of, novel)`.
    */
  def screenAndCommit(batch: DataFrame, ledgerPath: String, batchId: Long,
      idCol: String, textCol: String, shingleK: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 4, numFiles: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val bandRows = Dedup.bandRows(
      Dedup.minHashSigs(batch, idCol, textCol, shingleK, bands * rowsPerBand),
      bands, rowsPerBand).persist()
    val screened = SigLedger.screenBands(
      readLedger(spark, ledgerPath, excludeBatch = batchId), bandRows).persist()
    screened.count() // pin verdicts before the ledger gains this batch
    bandRows
      .join(screened.where(col("novel")).select("id"), Seq("id"), "left_semi")
      .repartition(numFiles, col("bucket"))
      .write.mode("overwrite").parquet(s"$ledgerPath/batch=$batchId")
    bandRows.unpersist()
    screened
  }

  /** Start the stream: screen every micro-batch of `docs` (a STREAMING
    * frame carrying `idCol`/`textCol`), append novel signatures to the
    * ledger, land verdicts at `outPath/batch=<id>` (overwrite — replay
    * safe). Read results back with [[readResults]].
    */
  def run(docs: DataFrame, ledgerPath: String, outPath: String,
      checkpoint: String, idCol: String, textCol: String, shingleK: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 4): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val screened = screenAndCommit(b, ledgerPath, id, idCol, textCol,
          shingleK, bands, rowsPerBand)
        screened.write.mode("overwrite").parquet(s"$outPath/batch=$id")
        screened.unpersist()
        ()
      }
      .start()

  /** Union of all committed verdict batches (with their batch ids). */
  def readResults(spark: SparkSession, outPath: String): DataFrame = {
    val dirs =
      if (!Fs.exists(outPath)) Seq.empty
      else Fs.childNames(outPath)
        .filter(_.startsWith("batch="))
        .filter(n => Fs.exists(s"$outPath/$n/_SUCCESS"))
    if (dirs.isEmpty)
      emptyBands(spark).select(col("id"), lit(0L).as("n_hit_bands"),
        lit(null).cast("long").as("dup_of"), lit(true).as("novel"),
        lit(0L).as("batch"))
    else dirs.map { n =>
      spark.read.parquet(s"$outPath/$n")
        .withColumn("batch", lit(n.stripPrefix("batch=").toLong))
    }.reduce(_ unionByName _)
  }
}
