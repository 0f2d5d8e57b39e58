package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.time.LocalDateTime

/** Structured Streaming surface over the discovery stream.
  *
  * The frontier wave loop is deliberately iterative batch (SURVEY.md §1.4 —
  * fixtures demand a deterministic global order per wave), but the engine
  * still ships the streaming operators a crawl's TELEMETRY side needs:
  * watermarked windowed aggregation over fetch/discovery events and a
  * stateful per-host session tracker (`flatMapGroupsWithState`) — the
  * streaming twin of the politeness scheduler's per-host state.
  *
  * Tested with the file/memory sources + `processAllAvailable` so a batch of
  * parquet drives the streaming query synchronously and deterministically.
  */
object EventStream {

  /** Watermarked per-window, per-type counts — late data beyond the
    * watermark is dropped, windows finalize incrementally.
    */
  def windowedCounts(events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("approx_users"))

  final case class Event(event_id: Long, ts: LocalDateTime, user_id: Long,
      event_type: String, value: Double)

  final case class UserSession(user_id: Long, n_events: Int,
      first_ts: LocalDateTime, last_ts: LocalDateTime, closed: Boolean)

  /** Stateful sessionization: a user's events accumulate until a processing-
    * time timeout closes the session — the `mapGroupsWithState` pattern the
    * crawl's per-host politeness state would use in a streaming deployment.
    */
  def sessionize(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val closed = state.get.copy(closed = true)
            state.remove()
            Iterator(closed)
          } else {
            val events = batch.toSeq
            if (events.isEmpty) Iterator.empty
            else {
              // LocalDateTime's Comparable ordering (chronological by
              // construction — NOT toString, whose format could drift)
              val sorted = events.sortBy(e => (e.ts, e.event_id))(
                Ordering.Tuple2(Ordering.ordered[LocalDateTime], Ordering.Long))
              val prev = state.getOption
              val merged = UserSession(
                userId,
                prev.map(_.n_events).getOrElse(0) + sorted.length,
                prev.map(_.first_ts).getOrElse(sorted.head.ts),
                sorted.last.ts,
                closed = false)
              state.update(merged)
              state.setTimeoutDuration("30 seconds")
              Iterator(merged)
            }
          }
      }
  }

  final case class DiscoveredUrl(url_hash: Long, url: String)

  /** Streaming twin of the seen-set ledger: stateful first-occurrence
    * filter over a discovery stream — a url is emitted the FIRST time its
    * hash appears across micro-batches, then suppressed forever (state =
    * one boolean per url_hash, the streaming analogue of the bloom+ledger
    * membership check). This is the operator a streaming frontier deploy
    * would put between link discovery and scheduling; the batch wave loop
    * keeps using [[graft.frontier.Ledger]] because fixtures demand a
    * deterministic global order per wave (SURVEY.md §1.4).
    */
  def streamingSeenFilter(urls: Dataset[DiscoveredUrl]): Dataset[DiscoveredUrl] = {
    import urls.sparkSession.implicits._
    urls
      .groupByKey(_.url_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[DiscoveredUrl], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic representative: groupByKey's shuffle does NOT
            // preserve source order inside a group, so "first" would vary
            // across reruns — take the lexicographically-min url instead
            // (only observable on hash collisions / non-canonical input)
            Iterator.single(batch.minBy(_.url))
          }
      }
  }

  /** [[streamingSeenFilter]] with per-key state TTL — REFRESH-crawl
    * semantics: a url is re-emitted once its suppression entry has idled
    * past `ttl` (processing-time timeout), so the stream re-fetches pages
    * on a rolling refresh horizon instead of suppressing forever. The TTL
    * is also the state-size bound the forever-filter lacks: live state ≈
    * urls seen within one TTL window, not the crawl's whole history —
    * the knob that keeps a 10^10-url stream's state finite (pair with the
    * RocksDB provider for the disk-backed form).
    */
  def streamingSeenFilterTtl(urls: Dataset[DiscoveredUrl],
      ttl: String = "1 hour"): Dataset[DiscoveredUrl] = {
    import urls.sparkSession.implicits._
    urls
      .groupByKey(_.url_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: Long, batch: Iterator[DiscoveredUrl], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // eviction callback: batch is empty; drop the entry so the next
            // occurrence of this hash re-emits (the refresh)
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            state.setTimeoutDuration(ttl) // re-arm: TTL measures idleness
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(ttl)
            Iterator.single(batch.minBy(_.url))
          }
      }
  }

  /** Drive a streaming aggregation over the (batch) events parquet through a
    * real streaming query into a memory sink; returns the final table.
    * Deterministic: one trigger consumes everything.
    */
  def runWindowedCountsOnce(spark: SparkSession, eventsParquet: String,
      queryName: String = "graft_stream_counts"): DataFrame = {
    val schema = spark.read.parquet(eventsParquet).schema
    // the file stream source requires a DIRECTORY; stage a single-file input
    val dir = {
      val p = java.nio.file.Paths.get(eventsParquet)
      if (java.nio.file.Files.isDirectory(p)) eventsParquet
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_in")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      }
    }
    // the driver tables store ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val q = windowedCounts(stream)
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
