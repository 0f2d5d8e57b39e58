package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val date = "2024-03-01T12:30:00Z"

  test("multi-record round-trip: types, uris, payload bytes exact") {
    val file = Warc.writeFile(Seq(
      Warc.writeRecord("warcinfo", "", date, "software: graft\r\n".getBytes("UTF-8")),
      Warc.writeRecord("response", "http://a.test/1", date, "körper eins".getBytes("UTF-8")),
      Warc.writeRecord("request", "http://a.test/1", date, "GET /1 HTTP/1.1\r\n\r\n".getBytes("UTF-8")),
      Warc.writeRecord("response", "http://b.test/2", date, "<p>zwei</p>".getBytes("UTF-8"))))
    val recs = Warc.records(file)
    assert(recs.map(_.warcType) == Vector("warcinfo", "response", "request", "response"))
    assert(recs.filter(_.warcType == "response").map(_.targetUri)
      == Vector("http://a.test/1", "http://b.test/2"))
    assert(recs.forall(_.date == date))
    // response payloads are real HTTP messages; the body round-trips exactly
    val bodies = recs.filter(_.warcType == "response")
      .map(r => new String(Warc.httpBody(r.payload), "UTF-8"))
    assert(bodies == Vector("körper eins", "<p>zwei</p>"))
  }

  test("reject-don't-misread: bad magic, missing length, truncated, hostile length") {
    intercept[IllegalArgumentException](Warc.records("HTTP/1.1 200 OK\r\n\r\n".getBytes))
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload").getBytes("US-ASCII")
    intercept[IllegalArgumentException](Warc.records(noLen))
    val good = Warc.writeRecord("response", "http://a.test/x", date, "abcdef".getBytes)
    intercept[IllegalArgumentException](
      Warc.records(java.util.Arrays.copyOf(good, good.length - 12)))
    val hostile = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Warc.MaxRecordBytes + 1}\r\n\r\n").getBytes("US-ASCII")
    intercept[IllegalArgumentException](Warc.records(hostile))
    // a payload that is not an HTTP message must not yield a body
    intercept[IllegalArgumentException](Warc.httpBody("not http".getBytes))
  }

  test("gzip member-per-record: round-trip, auto-detect in pages(), bomb cap") {
    val recs = Seq(
      Warc.writeRecord("warcinfo", "", date, "x".getBytes),
      Warc.writeRecord("response", "http://a.test/g1", date, "eins".getBytes("UTF-8")),
      Warc.writeRecord("response", "http://a.test/g2", date, "zwei".getBytes("UTF-8")))
    val gz = Warc.writeFileGz(recs)
    // really gzip: magic bytes present, image differs from the plain form
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val parsed = Warc.recordsGz(gz)
    assert(parsed.map(_.warcType) == Vector("warcinfo", "response", "response"))
    assert(parsed.filter(_.warcType == "response")
      .map(r => new String(Warc.httpBody(r.payload), "UTF-8")) == Vector("eins", "zwei"))
    // a plain image is rejected by the gz path; an inflation cap rejects early
    intercept[IllegalArgumentException](Warc.recordsGz(Warc.writeFile(recs)))
    intercept[IllegalArgumentException](Warc.recordsGz(gz, maxBytes = 16L))
    // pages() auto-detects per blob
    val s = spark
    import s.implicits._
    val rows = Warc.pages(Seq(gz).toDF("warc")).collect()
    assert(rows.map(_.getAs[String]("url")).sorted.toSeq
      == Seq("http://a.test/g1", "http://a.test/g2"))
  }

  test("pages(): response-only rows, parsed timestamps, corrupt-blob containment") {
    val s = spark
    import s.implicits._
    val ok = Warc.writeFile(Seq(
      Warc.writeRecord("warcinfo", "", date, "x".getBytes),
      Warc.writeRecord("response", "http://a.test/p", date, "<p>hi</p>".getBytes("UTF-8"))))
    val corrupt = "WARC/9.9 garbage".getBytes("US-ASCII")
    val blobs = Seq(ok, corrupt).toDF("warc")
    val rows = Warc.pages(blobs).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("url") == "http://a.test/p")
    assert(new String(r.getAs[Array[Byte]]("html"), "UTF-8") == "<p>hi</p>")
    assert(r.getAs[java.sql.Timestamp]("warc_ts").toInstant
      == java.time.Instant.parse(date))
  }
}
