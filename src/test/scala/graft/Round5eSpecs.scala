package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.frontier.Mirrors

class MirrorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def page(host: String, path: String, body: String): (String, String) =
    (s"http://$host/$path", body)

  test("full mirrors score 1e6 ppm; unrelated hosts never pair") {
    val pages = (
      (1 to 6).map(j => page("a.test", s"p$j", s"body-$j")) ++
      (1 to 6).map(j => page("a-mirror.test", s"q$j", s"body-$j")) ++
      (1 to 6).map(j => page("other.test", s"r$j", s"zzz-$j"))
    ).toDF("url", "html")
    val out = Mirrors.mirrorPairs(pages).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a-mirror.test" && r.getString(1) == "a.test")
    assert(r.getLong(2) == 6L && r.getLong(3) == 6L && r.getLong(4) == 6L)
    assert(r.getLong(5) == 1000000L)
  }

  test("containment uses the SMALLER host's corpus as denominator") {
    val pages = (
      (1 to 10).map(j => page("big.test", s"p$j", s"shared-$j")) ++
      (11 to 20).map(j => page("big.test", s"p$j", s"only-big-$j")) ++
      (1 to 10).map(j => page("small.test", s"q$j", s"shared-$j"))
    ).toDF("url", "html")
    val r = Mirrors.mirrorPairs(pages).collect().head
    // shared=10, sizes 20/10 → 10/min(20,10) = 1e6 ppm despite Jaccard 0.5
    assert(r.getLong(2) == 10L && r.getLong(5) == 1000000L)
  }

  test("boilerplate digests past the host cap contribute no evidence") {
    // 8 hosts all serving one parked page + nothing else in common
    val pages = (0 until 8).flatMap { h =>
      Seq(page(s"h$h.test", "idx", "<html>parked</html>"),
        page(s"h$h.test", "x", s"unique-$h"),
        page(s"h$h.test", "y", s"solo-$h"))
    }.toDF("url", "html")
    // cap below 8 → parked digest dropped → zero qualifying pairs
    assert(Mirrors.mirrorPairs(pages, maxHostsPerDigest = 5).count() == 0L)
    // cap at 8 → parked digest kept, but shared=1 < minShared=2 → still zero
    assert(Mirrors.mirrorPairs(pages, maxHostsPerDigest = 8).count() == 0L)
    // shared=1 admitted only when minShared=1 AND ppm clears: 1/3 < 0.5 → zero
    assert(Mirrors.mirrorPairs(pages, maxHostsPerDigest = 8,
      minShared = 1L).count() == 0L)
  }

  test("mime sniff: real codec outputs classify; malformed rejects are honest") {
    import graft.multimodal.{Mime, Png, Wav, Vid}
    val pngBytes = Png.encode(2, 2, 1, Array[Byte](0, 1, 2, 3))
    assert(Mime.sniffBytes(pngBytes) == "image/png")
    assert(Mime.sniffBytes(Wav.encode(8000, 1, Array[Short](0, 100))) == "audio/wav")
    assert(Mime.sniffBytes(Vid.encode(2, 2, Seq(pngBytes))) == "video/x-graft")
    assert(Mime.sniffBytes("WARC/1.0\r\n".getBytes("UTF-8")) == "application/warc")
    assert(Mime.sniffBytes(Array[Byte]('P', 'K', 3, 4, 9)) == "application/zip")
    // RIFF with an unknown subtype is NOT wav/webp
    assert(Mime.sniffBytes("RIFF1234JUNK".getBytes("UTF-8")) ==
      "application/octet-stream")
    assert(Mime.sniffBytes("RIFF1234WEBPVP8 ".getBytes("UTF-8")) == "image/webp")
    // truncated PNG magic falls through to the binary-byte scan (0x1A)
    assert(Mime.sniffBytes(pngBytes.take(7)) == "application/octet-stream")
  }

  test("mime sniff: markup whitespace/case rules and strict UTF-8 fences") {
    import graft.multimodal.Mime
    def s(x: String) = Mime.sniffBytes(x.getBytes("UTF-8"))
    assert(s("\r\n\t  <!doctype HTML><x>") == "text/html")
    assert(s("<HeAd><title>t</title>") == "text/html")
    assert(s("<!-- comment -->") == "text/html")
    assert(s("  <?XML version=\"1.0\"?>") == "text/xml")
    assert(s("doc says <html> later") == "text/plain") // tag must LEAD
    assert(s("café   💩") == "text/plain") // 2/3/4-byte UTF-8
    assert(Mime.sniffBytes(Array.empty[Byte]) == "application/octet-stream")
    // overlong encoding of '/' (C0 AF), lone surrogate (ED A0 80), bare
    // continuation, truncated multibyte — all reject despite no binary byte
    for (bad <- Seq(Array(0xC0, 0xAF), Array(0xED, 0xA0, 0x80), Array(0x80),
        Array(0xF0, 0x9F, 0x92)))
      assert(Mime.sniffBytes(bad.map(_.toByte)) == "application/octet-stream")
    // a NUL anywhere is binary even if the rest is clean text
    assert(s("looks like text\u0000") == "application/octet-stream")
  }

  test("outline: RCDATA title, entity decode, collapse, first-wins") {
    import graft.text.HtmlText
    val o = HtmlText.outline(
      "<head><title> A &amp;\n  <b>B</b>  </title><title>second</title></head>" +
        "<body><h1>x</h1><h2>y</h2><h2>z</h2></body>")
    // no tags parsed inside title: "<b>B</b>" is literal RCDATA text
    assert(o.title == "A & <b>B</b>")
    assert(o.h.toSeq == Seq(1, 2, 0, 0, 0, 0))
    assert(HtmlText.outline("<p>no title</p>").title == "")
    assert(HtmlText.outline("<title/>no</title>").title == "")
    assert(HtmlText.outline(null).title == "")
    // unterminated title runs to EOF (tokenizer data-state behavior)
    assert(HtmlText.outline("<title>runs  off").title == "runs off")
  }

  test("outline: headings are comment- and raw-text-blind") {
    import graft.text.HtmlText
    val o = HtmlText.outline(
      "<!-- <h1>no</h1> --><script>s='<h2>no</h2>'</script>" +
        "<style><h3>no</h3></style><h4>yes</h4><H5>case</H5><h6 class=\"a>b\">attr</h6>")
    assert(o.h.toSeq == Seq(0, 0, 0, 1, 1, 1))
  }

  test("soft404: title phrase, short error body, long-body immunity") {
    val pages = Seq(
      (1L, "<head><title>404 Not Found</title></head><body><p>gone</p></body>"),
      (2L, "<head><title>Weekly News</title></head><body><p>Page not found.</p></body>"),
      (3L, "<head><title>Weekly News</title></head><body><p>" +
        (1 to 30).map(i => s"w$i").mkString(" ") + " not found in archives</p></body>"),
      (4L, "<head><title>Fine</title></head><body><p>all good here</p></body>"))
      .toDF("doc_id", "html")
    val out = graft.text.CorpusFilter.withSoft404(pages)
      .select("doc_id", "soft404").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L))                 // error title
    assert(out(2L))                 // short body with error phrase
    assert(!out(3L))                // long body mentions "not found" — immune
    assert(!out(4L))
  }

  test("hll: estimate within 3% at 200k distinct keys (p=11, real hashes)") {
    import graft.functions.HllSketch
    val regs = new Array[Byte](1 << 11)
    val rnd = new scala.util.Random(42)
    val n = 200000
    var i = 0
    while (i < n) { HllSketch.add(regs, 11, rnd.nextLong()); i += 1 }
    val est = HllSketch.estimate(11, regs)
    assert(math.abs(est.toDouble / n - 1.0) < 0.03, s"est=$est")
  }

  test("hll: duplicate-insensitive, merge == whole, bit-identical images") {
    import graft.functions.{hll_agg, hll_card, hll_merge_agg, HllSketch}
    val keys = (1 to 5000).map(i => i.toLong * 0x9E3779B97F4A7C15L) // spread hashes
    val df = keys.toDF("h")
    val whole = df.agg(hll_agg(col("h"), 8).as("sk")).collect().head.getAs[Array[Byte]](0)
    // duplicates change nothing
    val dupped = df.union(df).union(df.limit(100))
      .agg(hll_agg(col("h"), 8)).collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, dupped))
    // split → per-part sketches → merge aggregate == whole, bit for bit
    val parts = df.withColumn("part", pmod(col("h"), lit(7L)))
      .groupBy("part").agg(hll_agg(col("h"), 8).as("sk"))
    val merged = parts.agg(hll_merge_agg(col("sk"))).collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged))
    // card probe agrees with the kernel
    val viaExpr = df.agg(hll_card(hll_agg(col("h"), 8))).collect().head.getLong(0)
    val (p, regs) = HllSketch.deserialize(whole)
    assert(viaExpr == HllSketch.estimate(p, regs))
  }

  test("hll: rho convention and estimate arithmetic are the documented ones") {
    import graft.functions.HllSketch
    // h = idx | (w << p): w=1 → rho=1; w=8 → rho=4; w=0 → 65-p
    assert(HllSketch.rho((1L << 6) | 5L, 6) == 1)
    assert(HllSketch.rho((8L << 6) | 5L, 6) == 4)
    assert(HllSketch.rho(5L, 6) == 59)
    // empty sketch: sumQ = m·2^40, raw = m, est = α·m (floor arithmetic)
    val empty = new Array[Byte](64)
    val raw = 64L
    val a = 7213L * 64; val b = 10000L * 64 + 10790L
    assert(HllSketch.estimate(6, empty) == (raw / b) * a + ((raw % b) * a) / b)
  }

  test("dust: digest evidence separates session params from content params") {
    import graft.frontier.Dust
    val pages = Seq(
      // sid is content-irrelevant: both aliases observed, same body
      ("http://a.test/x?page=1&sid=111", "body-1"),
      ("http://a.test/x?page=1", "body-1"),
      ("http://a.test/x?page=2&sid=222", "body-2"),
      ("http://a.test/x?page=2", "body-2"),
      // page IS content: stripped alias exists but bytes differ
      ("http://a.test/y?page=1", "y-one"),
      ("http://a.test/y", "y-zero"),
      // re-fetches of the same alias add no evidence
      ("http://a.test/x?page=1&sid=111", "body-1"))
      .toDF("url", "html")
    val rules = Dust.paramStripRules(pages, minSupport = 1L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rules == Map(("a.test", "sid") -> 2L))
  }

  test("dust: middle-param strip preserves the order of the others") {
    import graft.frontier.Dust
    val pages = Seq(
      ("http://b.test/p?a=1&sid=9&z=2", "same"),
      ("http://b.test/p?a=1&z=2", "same"))
      .toDF("url", "html")
    val rules = Dust.paramStripRules(pages, minSupport = 1L).collect()
    assert(rules.map(r => r.getString(1)).toSet == Set("sid"))
  }

  test("dust: applyRules strips only ruled params on the ruled host") {
    import graft.frontier.Dust
    val rules = Seq(("a.test", "sid", 5L), ("a.test", "utm", 3L))
      .toDF("host", "param", "support")
    val urls = Seq(
      "http://a.test/x?page=1&sid=42&utm=z",
      "http://a.test/x?sid=42",
      "http://a.test/plain",
      "http://other.test/x?sid=42").toDF("url")
    val out = Dust.applyRules(urls, rules).collect().map(_.getString(0)).toSet
    assert(out == Set(
      "http://a.test/x?page=1",
      "http://a.test/x",
      "http://a.test/plain",
      "http://other.test/x?sid=42"))
  }

  test("intra-host duplicates do not inflate shared counts") {
    val pages = (
      Seq.fill(5)(page("dup.test", "p", "same-body")) ++
      (1 to 4).map(j => page("dup.test", s"u$j", s"same-body")) ++
      Seq(page("twin.test", "p", "same-body"), page("twin.test", "x", "pad-1"),
        page("dup.test", "z", "pad-1"))
    ).toDF("url", "html")
    val r = Mirrors.mirrorPairs(pages, minShared = 2L, minPpm = 1L).collect()
    assert(r.length == 1)
    // dup.test has 2 distinct digests (same-body, pad-1); both shared
    assert(r.head.getLong(2) == 2L && r.head.getLong(3) == 2L)
  }
}
