package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.frontier.{Scheduler, Seen}

/** Streaming frontier, end to end: a discovery STREAM of (url, seed_idx) →
  * canonical URL keys → stateful cross-batch seen-filter → per-micro-batch
  * politeness schedule, appended to storage as `schedule/batch=K`.
  *
  * This is the Structured-Streaming twin of [[graft.frontier.WaveLoop]]
  * (which stays the production path — SURVEY §1.4: fixtures demand a
  * deterministic global order per wave, and a crawl's discovery feedback is
  * naturally wave-batched anyway). The demo proves the operators compose:
  * when micro-batch K carries exactly wave K's frontier, the emitted
  * schedule is ROW-IDENTICAL to the batch loop's (StreamingSpec pins it).
  *
  * State per url_hash is one boolean (the streaming analogue of the
  * bloom+ledger membership bit); the schedule inside `foreachBatch` is the
  * SAME salted scheduler the batch loop uses.
  */
object StreamingFrontier {

  /** Keyed frontier candidate (the [[Seen.withUrlKeys]] columns). */
  final case class Candidate(
      url_hash: Long,
      canonical_url: String,
      host: String,
      host_rev: String,
      seed_idx: Long)

  /** Cross-batch first-occurrence filter that ALSO collapses in-batch
    * duplicates to the min-seed_idx representative — the streaming fusion of
    * the batch loop's `filterUnseen` + `dropInWaveDuplicates` (their
    * composition commutes: seen-status is constant per url_hash group).
    */
  def seenFilter(candidates: Dataset[Candidate]): Dataset[Candidate] = {
    import candidates.sparkSession.implicits._
    candidates
      .groupByKey(_.url_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Candidate], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // min (seed_idx, url): groupByKey's shuffle does not preserve
            // source order, and the batch loop's representative is the min
            // seed_idx (first discovery wins, reference `:205` semantics)
            Iterator.single(batch.minBy(c => (c.seed_idx, c.canonical_url)))
          }
      }
  }

  /** Start the streaming frontier over `urls` (a STREAMING frame carrying
    * url STRING, seed_idx BIGINT). Each micro-batch schedules its unseen
    * urls with the batch scheduler and appends `root/schedule/batch=<id>`.
    */
  def run(urls: DataFrame, root: String, gapSeconds: Long = 3L,
      queryName: String = "graft_streaming_frontier"): StreamingQuery = {
    val spark = urls.sparkSession
    import spark.implicits._
    val keyed = Seen.withUrlKeys(urls)
      .select("url_hash", "canonical_url", "host", "host_rev", "seed_idx")
      .as[Candidate]
    seenFilter(keyed)
      .writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .option("checkpointLocation", s"$root/_checkpoint")
      .foreachBatch { (batch: Dataset[Candidate], batchId: Long) =>
        if (!batch.isEmpty) {
          Scheduler.schedule(batch.toDF(), gapSeconds, salted = true)
            .select("slot", "host_rev", "canonical_url", "url_hash", "seed_idx", "host_pos")
            .write.mode(SaveMode.Overwrite).parquet(s"$root/schedule/batch=$batchId")
        }
      }
      .start()
  }
}
