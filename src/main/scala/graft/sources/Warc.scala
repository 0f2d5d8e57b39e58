package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal REAL WARC (ISO 28500) reader/writer, pure JVM — the container
  * format Common-Crawl pages actually arrive in, so the north-rule input
  * table (url, warc_ts, html, …) can be DERIVED from its native wire form
  * instead of assumed. Subset honestly scoped like [[graft.multimodal.Png]]
  * and [[graft.multimodal.Wav]]:
  *
  *  - WARC/1.0 and 1.1 records, CRLF header blocks, `Content-Length`
  *    mandatory (the spec makes it so), any header case;
  *  - `response` records carry an HTTP/1.x message; [[Warc.httpBody]]
  *    splits status line + headers from the body (no chunked
  *    transfer-encoding — Common-Crawl stores identity bodies);
  *  - non-`response` records (warcinfo, request, metadata) are parsed and
  *    surfaced with their type — the pages view filters, the parser never
  *    silently drops;
  *  - malformed input REJECTS (bad magic, missing/oversized length,
  *    truncated payload) rather than mis-reading; per-BLOB containment
  *    belongs to the Spark operator, matching the multimodal taxonomy.
  *
  * Records are concatenated uncompressed here; Common Crawl's per-record
  * gzip members would wrap [[records]] with one inflate per member (the
  * java.util.zip plumbing [[graft.multimodal.Png]] already exercises).
  */
object Warc {

  /** Per-record payload ceiling (64 MiB) — one hostile length field must
    * not OOM an executor.
    */
  val MaxRecordBytes: Long = 64L << 20

  final case class Record(
      warcType: String,
      targetUri: String, // "" when absent (warcinfo)
      date: String, // WARC-Date verbatim (ISO 8601)
      payload: Array[Byte],
      refersTo: String = "") // WARC-Refers-To record id, "" when absent

  /** One conformant WARC record; `response` payloads are full HTTP/1.1
    * messages built around `body`.
    */
  def writeRecord(warcType: String, targetUri: String, date: String,
      body: Array[Byte]): Array[Byte] = {
    val payload =
      if (warcType == "response") {
        val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n"
        head.getBytes("US-ASCII") ++ body
      } else body
    val uriLine = if (targetUri.isEmpty) "" else s"WARC-Target-URI: $targetUri\r\n"
    // the spec requires globally unique record IDs: a name-UUID over the
    // full (type, uri, date) identity — distinct URIs can share a hashCode,
    // and a re-crawl of the same URI is a DIFFERENT record
    val rid = java.util.UUID.nameUUIDFromBytes(
      s"$warcType\n$targetUri\n$date".getBytes("UTF-8"))
    val head = s"WARC/1.0\r\nWARC-Type: $warcType\r\n" + uriLine +
      s"WARC-Date: $date\r\nWARC-Record-ID: <urn:uuid:$rid>\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** The deterministic record id [[writeRecord]] assigns to
    * (type, uri, date) — what a conversion record's WARC-Refers-To must
    * name to point at its response record.
    */
  def recordId(warcType: String, targetUri: String, date: String): String =
    "urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
      s"$warcType\n$targetUri\n$date".getBytes("UTF-8"))

  /** A WET `conversion` record (ISO 28500 §6.6; the Common Crawl "WET"
    * sidecar format): payload = the EXTRACTED text of a fetched page,
    * `Content-Type: text/plain`, with `WARC-Refers-To` naming the
    * response record it was derived from — which [[writeRecord]]'s
    * deterministic ids make computable from (uri, date) alone, no read
    * of the response file needed.
    */
  def writeConversion(targetUri: String, date: String,
      text: Array[Byte]): Array[Byte] = {
    val rid = recordId("conversion", targetUri, date)
    val head = s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $targetUri\r\nWARC-Date: $date\r\n" +
      s"WARC-Record-ID: <$rid>\r\n" +
      s"WARC-Refers-To: <${recordId("response", targetUri, date)}>\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${text.length}\r\n\r\n"
    head.getBytes("US-ASCII") ++ text ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** Concatenate records into one WARC file image (one linear copy — the
    * foldLeft form was O(n²) in the record count).
    */
  def writeFile(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(records.iterator.map(_.length).sum)
    records.foreach(out.write)
    out.toByteArray
  }

  /** Inflated-size ceiling for a gzip'd file image (256 MiB) — a gzip bomb
    * in a crawl-harvested blob must not OOM an executor.
    */
  val MaxFileBytes: Long = 256L << 20

  /** Common Crawl's actual layout: each record its own gzip MEMBER, the
    * members concatenated (`.warc.gz` — member boundaries are what let a
    * reader seek to one record of a 1 GB file without inflating the rest).
    */
  def writeFileGz(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (r <- records) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r)
      gz.finish() // one complete member per record
    }
    out.toByteArray
  }

  /** Parse a gzip'd WARC file image: inflate every member (Java's
    * GZIPInputStream walks concatenated members natively), then run the
    * same record walker. `maxBytes` caps the INFLATED size — reject a
    * bomb before it allocates.
    */
  def recordsGz(bytes: Array[Byte], maxBytes: Long = MaxFileBytes): Vector[Record] = {
    require(bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b,
      "not a gzip stream")
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length.toLong * 4, 1 << 20).toInt)
    try {
      val buf = new Array[Byte](64 << 10)
      var n = in.read(buf)
      while (n > 0) {
        require(out.size().toLong + n <= maxBytes,
          s"gzip'd WARC inflates past $maxBytes bytes")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    records(out.toByteArray)
  }

  /** Parse every record of a WARC file image. Strict: a malformed record
    * throws (reject-don't-misread); wrap per blob for containment.
    */
  def records(bytes: Array[Byte]): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var pos = 0
    val n = bytes.length
    while (pos < n) {
      // tolerate inter-record CRLF padding
      while (pos < n && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < n) {
        val headerEnd = indexOfCrlfCrlf(bytes, pos)
        require(headerEnd > pos, "truncated WARC header block")
        val header = new String(bytes, pos, headerEnd - pos, "US-ASCII")
        val lines = header.split("\r\n")
        require(lines.nonEmpty && (lines(0) == "WARC/1.0" || lines(0) == "WARC/1.1"),
          s"not a WARC record at offset $pos: '${lines.headOption.getOrElse("")}'")
        var warcType = ""; var uri = ""; var date = ""; var len = -1L
        var refersTo = ""
        for (line <- lines.drop(1); colon = line.indexOf(':') if colon > 0) {
          val k = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val v = line.substring(colon + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v.stripPrefix("<").stripSuffix(">")
            case "warc-date" => date = v
            case "warc-refers-to" => refersTo = v.stripPrefix("<").stripSuffix(">")
            case "content-length" =>
              len = try v.toLong catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(s"bad Content-Length '$v'")
              }
            case _ => ()
          }
        }
        require(len >= 0, "WARC record without Content-Length")
        require(len <= MaxRecordBytes, s"WARC record too large: $len bytes")
        val start = headerEnd + 4
        require(start + len <= n, s"truncated WARC payload (need $len bytes)")
        out += Record(warcType, uri, date,
          java.util.Arrays.copyOfRange(bytes, start, (start + len).toInt),
          refersTo)
        pos = (start + len).toInt
      }
    }
    out.result()
  }

  /** Body of an HTTP/1.x response payload (a `response` record's content):
    * everything past the first CRLF CRLF. Rejects a payload that is not an
    * HTTP response.
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    require(payload.length >= 8 &&
      new String(payload, 0, 7, "US-ASCII").startsWith("HTTP/1."),
      "payload is not an HTTP/1.x response")
    val sep = indexOfCrlfCrlf(payload, 0)
    require(sep >= 0, "HTTP response without header terminator")
    java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** WARC blobs → north-rule page rows (url, warc_ts, html): the REAL
    * derivation of the input table from its wire format. One parse per
    * blob (init-once mapPartitions shape); plain AND gzip'd images are
    * auto-detected per blob; only `response` records become pages; a
    * malformed BLOB yields zero rows (containment — audit by anti-joining
    * blob ids), never a task failure.
    */
  def pages(blobs: DataFrame, binCol: String = "warc"): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val parsed = blobs.select(col(binCol)).as[Array[Byte]].mapPartitions { it =>
      it.flatMap { blob =>
        val gz = blob.length >= 2 && (blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b
        val recs =
          try { if (gz) recordsGz(blob) else records(blob) }
          catch { case scala.util.control.NonFatal(_) => Vector.empty }
        recs.iterator
          .filter(_.warcType == "response")
          .flatMap { r =>
            // date parse lives INSIDE the per-record try: under ANSI mode a
            // plan-level to_timestamp would throw on WARC 1.1 fractional
            // seconds or a '+00:00' offset and kill the task, breaking the
            // per-blob containment contract. java.time handles the full
            // ISO-8601 offset grammar; unparseable → null warc_ts, row kept.
            try {
              val ts =
                try java.sql.Timestamp.from(
                  java.time.OffsetDateTime.parse(r.date).toInstant)
                catch { case scala.util.control.NonFatal(_) => null }
              Some((r.targetUri, ts, httpBody(r.payload)))
            } catch { case scala.util.control.NonFatal(_) => None }
          }
      }
    }
    parsed.toDF("url", "warc_ts", "html")
  }

  /** WET blobs → (url, warc_ts, text, refers_to): the conversion-record
    * twin of [[pages]] — reads the extracted-text sidecar a WET export
    * ships, with the same per-blob containment, gzip auto-detect, and
    * in-record date parse. `refers_to` is the response record the text
    * was derived from (the provenance edge a corpus audit walks).
    */
  def texts(blobs: DataFrame, binCol: String = "warc"): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val parsed = blobs.select(col(binCol)).as[Array[Byte]].mapPartitions { it =>
      it.flatMap { blob =>
        val gz = blob.length >= 2 && (blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b
        val recs =
          try { if (gz) recordsGz(blob) else records(blob) }
          catch { case scala.util.control.NonFatal(_) => Vector.empty }
        recs.iterator
          .filter(_.warcType == "conversion")
          .flatMap { r =>
            try {
              val ts =
                try java.sql.Timestamp.from(
                  java.time.OffsetDateTime.parse(r.date).toInstant)
                catch { case scala.util.control.NonFatal(_) => null }
              Some((r.targetUri, ts, new String(r.payload, "UTF-8"), r.refersTo))
            } catch { case scala.util.control.NonFatal(_) => None }
          }
      }
    }
    parsed.toDF("url", "warc_ts", "text", "refers_to")
  }

  /** File-based ingestion — how real Common Crawl actually arrives: a
    * directory (local, HDFS, or object store) of `.warc` / `.warc.gz`
    * FILES. One row per file via Spark's `binaryFile` source, then the
    * same per-blob parse as [[pages]] (auto-detected gzip, response-only,
    * malformed-file containment). Each file decodes in ONE task — Common
    * Crawl's ~1 GB shard convention is what makes that the right grain;
    * parallelism = file count, which at crawl scale is tens of thousands.
    * The `binaryFile` reader never splits a file, so no record straddles
    * tasks and the member-per-record gzip layout is preserved end to end.
    */
  def pagesFromFiles(spark: SparkSession, dir: String,
      glob: String = "*.warc*"): DataFrame =
    pages(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("content").as("warc")))

  /** The WRITE half of the file story: page rows → `.warc.gz` shard files
    * (one per partition, member-per-record layout) under `dir`, through
    * the Hadoop FileSystem of the target path — local, HDFS, or object
    * store. This is how a processed corpus re-exports in the format the
    * rest of the ecosystem ingests. Returns the number of records
    * written.
    *
    * Commit semantics, stated honestly: each task creates its shard with
    * overwrite, so a RETRIED task is idempotent, but there is no output
    * commit protocol — a job that dies mid-write leaves partial shards
    * (re-run overwrites them), and speculative duplicate attempts (off by
    * default) could race a file. The loop-state writers avoid this class
    * of issue by fencing with markers; a production export would wrap
    * this in `FileCommitProtocol`. Repartition upstream to size shards
    * (Common Crawl convention ≈ 1 GB).
    */
  /** One complete gzip member per record WITHOUT leaking native memory:
    * `GZIPOutputStream.finish()` flushes the member but only finalization
    * would release the Deflater's native buffers, so a large partition
    * could accumulate unbounded off-heap memory. This subclass exposes the
    * protected deflater so each member's native state is `end()`ed
    * deterministically right after `finish()`.
    */
  private final class MemberGz(out: java.io.OutputStream)
      extends java.util.zip.GZIPOutputStream(out) {
    def writeMember(bytes: Array[Byte]): Unit =
      try { write(bytes); finish() } finally `def`.end()
  }

  def writePagesToFiles(pages: DataFrame, dir: String,
      prefix: String = "shard"): Long = {
    val spark = pages.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new org.apache.spark.graftbridge.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    graft.core.Fs.mkdirs(dir)
    val rows = pages
        // session timezone renders the instant; every session builder in
        // this repo pins UTC, which is what the trailing 'Z' asserts
      .select(col("url"),
        date_format(col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("d"),
        col("html"))
      .as[(String, String, Array[Byte])]
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(dir, f"$prefix-$pid%05d.warc.gz")
        val fs = path.getFileSystem(conf.value.value)
        val out = fs.create(path, true)
        var n = 0L
        try {
          for ((url, date, html) <- it) {
            val d = if (date == null) "1970-01-01T00:00:00Z" else date
            new MemberGz(out).writeMember(writeRecord("response", url, d, html))
            n += 1
          }
        } finally out.close()
        Iterator.single(n)
      }
      // collect-then-sum: Dataset.reduce throws on an EMPTY input (all
      // partitions skipped) — an empty corpus must export 0, not crash
    }.collect().sum
  }

  /** WET export: the extracted-text sidecar next to [[writePagesToFiles]]'s
    * response shards — one `conversion` record per page (member-per-record
    * `.wet.gz`, same seekable layout), text produced by the engine's own
    * extractor ([[graft.functions.extract_readable]], a codegen column —
    * extraction happens in the projection, not per-record in the writer).
    * Refers-To ids are computable from (uri, date), so the sidecar links
    * to its response shard without reading it.
    */
  def writeWetToFiles(pages: DataFrame, dir: String,
      prefix: String = "shard"): Long = {
    val spark = pages.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new org.apache.spark.graftbridge.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    graft.core.Fs.mkdirs(dir)
    val rows = pages
      .select(col("url"),
        date_format(col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("d"),
        graft.functions.extract_readable(col("html").cast("string")).as("text"))
      .as[(String, String, String)]
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(dir, f"$prefix-$pid%05d.wet.gz")
        val fs = path.getFileSystem(conf.value.value)
        val out = fs.create(path, true)
        var n = 0L
        try {
          for ((url, date, text) <- it) {
            val d = if (date == null) "1970-01-01T00:00:00Z" else date
            new MemberGz(out).writeMember(writeConversion(url, d, text.getBytes("UTF-8")))
            n += 1
          }
        } finally out.close()
        Iterator.single(n)
      }
      // collect-then-sum: Dataset.reduce throws on an EMPTY input (all
      // partitions skipped) — an empty corpus must export 0, not crash
    }.collect().sum
  }

  /** File-based WET ingestion (binaryFile over `.wet` / `.wet.gz` files →
    * [[texts]]) — the read side of [[writeWetToFiles]].
    */
  def textsFromFiles(spark: SparkSession, dir: String,
      glob: String = "*.wet*"): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("content").as("warc"))
    texts(files)
  }
}
