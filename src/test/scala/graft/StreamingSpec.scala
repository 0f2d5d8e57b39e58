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

  test("streaming seen-filter: first occurrence only, across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStream.DiscoveredUrl
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DiscoveredUrl]
    val q = EventStream.streamingSeenFilter(input.toDS())
      .writeStream.format("memory").queryName("t_seen").outputMode("append").start()
    try {
      input.addData(DiscoveredUrl(1, "http://a/1"), DiscoveredUrl(2, "http://b/1"),
        DiscoveredUrl(1, "http://a/1?dup=batch"))
      q.processAllAvailable()
      // batch 2 re-offers both seen hashes plus one new
      input.addData(DiscoveredUrl(2, "http://b/1"), DiscoveredUrl(1, "http://a/1"),
        DiscoveredUrl(3, "http://c/1"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_seen").as[DiscoveredUrl].collect()
    assert(got.map(_.url_hash).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(got.length == 3) // each hash exactly once, ever
  }

  test("TTL seen-filter: suppression expires → refresh re-emits, state stays bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStream.DiscoveredUrl
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DiscoveredUrl]
    val q = EventStream.streamingSeenFilterTtl(input.toDS(), ttl = "1 millisecond")
      .writeStream.format("memory").queryName("t_seen_ttl").outputMode("append").start()
    // processAllAvailable can block FOREVER under ProcessingTimeTimeout
    // (the engine keeps scheduling timeout batches), so synchronize on the
    // SINK's row count instead
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("t_seen_ttl").count() < n) {
        assert(System.nanoTime() < deadline, s"sink never reached $n rows")
        Thread.sleep(100)
      }
    }
    try {
      input.addData(DiscoveredUrl(1, "http://a/1"), DiscoveredUrl(2, "http://b/1"))
      awaitRows(2)
      // idle past the TTL: the engine's own timeout batches evict both
      // entries; the refresh re-offer is then unseen again and re-emits
      Thread.sleep(1500)
      input.addData(DiscoveredUrl(1, "http://a/1"))
      awaitRows(3)
    } finally q.stop()
    val got = spark.table("t_seen_ttl").as[DiscoveredUrl].collect()
    assert(got.count(_.url_hash == 1L) == 2, got.mkString(","))  // first + refresh
    assert(got.count(_.url_hash == 2L) == 1)
  }

  test("streaming frontier == batch WaveLoop on the same discovery graph") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.frontier.WaveLoop
    // batch reference: the WaveLoopSpec synthetic graph, 3 waves
    def discover(sched: org.apache.spark.sql.DataFrame) = {
      val children = sched.select(col("seed_idx"))
        .where(col("seed_idx") < 200)
        .select(explode(array(col("seed_idx") * 2 + 100, col("seed_idx") * 2 + 101)).as("next_idx"))
        .select(concat(lit("http://h"), (col("next_idx") % 5).cast("string"),
          lit(".test/p/"), col("next_idx").cast("string")).as("url"),
          col("next_idx").cast("long").as("seed_idx"))
      // every wave re-discovers seed 0's url — the seen state must drop it
      val revisit = sched.sparkSession.createDataFrame(
        Seq(("http://h0.test/p/0", 9999L))).toDF("url", "seed_idx")
      children.unionByName(revisit)
    }
    val seeds = (0 until 20).map(i => (s"http://h${i % 3}.test/p/$i", i.toLong))
    val batchRoot = java.nio.file.Files.createTempDirectory("sfb").toString
    WaveLoop.run(spark, batchRoot, seeds.toDF("url", "seed_idx"), discover, maxWaves = 3)
    // streaming run: micro-batch K carries exactly wave K's input frontier
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val streamRoot = java.nio.file.Files.createTempDirectory("sfs").toString
    val q = graft.streaming.StreamingFrontier.run(
      input.toDF().toDF("url", "seed_idx"), streamRoot)
    try {
      input.addData(seeds)
      q.processAllAvailable()
      for (w <- 0 until 2) { // waves 1, 2 inputs = batch loop's next/wave=w
        val next = spark.read.parquet(s"$batchRoot/next/wave=$w")
          .as[(String, Long)].collect().toSeq
        input.addData(next)
        q.processAllAvailable()
      }
    } finally q.stop()
    // row-identical schedules, wave by wave (batch ids are 0,1,2)
    for (w <- 0 until 3) {
      val batch = spark.read.parquet(s"$batchRoot/schedule/wave=$w")
        .select("slot", "host_rev", "canonical_url", "url_hash", "seed_idx", "host_pos")
        .orderBy("slot", "host_rev", "seed_idx").collect().toSeq
      val streamed = spark.read.parquet(s"$streamRoot/schedule/batch=$w")
        .select("slot", "host_rev", "canonical_url", "url_hash", "seed_idx", "host_pos")
        .orderBy("slot", "host_rev", "seed_idx").collect().toSeq
      assert(streamed == batch, s"wave $w schedule drift")
      assert(batch.nonEmpty)
    }
  }

  test("streaming frontier runs on the RocksDB state store (10^10-key layout)") {
    // the default HDFS-backed store keeps all state on the JVM heap — at
    // 10^10 url_hash keys that's an executor OOM; RocksDB keeps state
    // off-heap/on-disk per partition. Same query, same semantics, swapped
    // provider: this pins that our state schema (primitive key, boolean
    // value) round-trips through the RocksDB encoder.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      val root = java.nio.file.Files.createTempDirectory("sfrocks").toString
      val q = graft.streaming.StreamingFrontier.run(
        input.toDF().toDF("url", "seed_idx"), root)
      try {
        input.addData(Seq(("http://a.test/1", 1L), ("http://a.test/2", 2L)))
        q.processAllAvailable()
        // re-offer a seen url (must be state-filtered) plus one new
        input.addData(Seq(("http://a.test/1", 5L), ("http://a.test/3", 3L)))
        q.processAllAvailable()
      } finally q.stop()
      assert(spark.read.parquet(s"$root/schedule/batch=0").count() == 2)
      val b1 = spark.read.parquet(s"$root/schedule/batch=1")
        .select("canonical_url").as[String].collect().toSeq
      assert(b1 == Seq("http://a.test/3"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
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
