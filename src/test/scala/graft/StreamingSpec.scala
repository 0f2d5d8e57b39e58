package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("windowed counts through a real streaming query == batch aggregation") {
    val streamed = EventStream.runWindowedCountsOnce(spark, s"$sf/events.parquet",
      queryName = "t_counts")
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type")
      .collect().toSeq
    val batch = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful sessionization groups a user's events with bounds") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(events).collect()
    val perUser = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id")
      .agg(count(lit(1)).cast("int").as("n"), min("ts").as("lo"), max("ts").as("hi"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("n"), r.getAs[java.time.LocalDateTime]("lo"), r.getAs[java.time.LocalDateTime]("hi"))).toMap
    assert(sessions.length == perUser.size)
    for (s <- sessions) {
      val (n, lo, hi) = perUser(s.user_id)
      assert(s.n_events == n)
      assert(s.first_ts == lo && s.last_ts == hi)
    }
  }
}
