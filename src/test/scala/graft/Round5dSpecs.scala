package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.frontier.Redirects

class RedirectsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chain(name: String, hops: Int): Seq[(String, String)] =
    (0 until hops).map { j =>
      (s"http://$name/n$j",
        if (j == hops - 1) s"http://$name/final" else s"http://$name/n${j + 1}")
    }

  test("chains within the cap resolve with exact hop counts") {
    val edges = (chain("a.test", 1) ++ chain("b.test", 7) ++ chain("c.test", 8))
      .toDF("src", "dst")
    val urls = Seq("http://a.test/n0", "http://b.test/n0", "http://b.test/n3",
      "http://c.test/n0", "http://plain.test/x").toDF("url")
    val out = Redirects.resolve(urls, edges, maxHops = 8).collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))))
      .toMap
    assert(out("http://a.test/n0") == ((Some("http://a.test/final"), Some(1L), true)))
    assert(out("http://b.test/n0") == ((Some("http://b.test/final"), Some(7L), true)))
    // a mid-chain node resolves too, with the remaining distance
    assert(out("http://b.test/n3") == ((Some("http://b.test/final"), Some(4L), true)))
    // length == maxHops resolves AT the cap
    assert(out("http://c.test/n0") == ((Some("http://c.test/final"), Some(8L), true)))
    // a url with no outgoing redirect is its own terminal
    assert(out("http://plain.test/x") == ((Some("http://plain.test/x"), Some(0L), true)))
  }

  test("cycles and over-cap chains come back unresolved with NULLs") {
    val loop = Seq(("http://l.test/a", "http://l.test/b"),
      ("http://l.test/b", "http://l.test/a"))
    val edges = (loop ++ chain("long.test", 9)).toDF("src", "dst")
    val urls = Seq("http://l.test/a", "http://long.test/n0",
      "http://long.test/n1").toDF("url")
    val out = Redirects.resolve(urls, edges, maxHops = 8).collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))))
      .toMap
    assert(out("http://l.test/a") == ((None, None, false)))
    assert(out("http://long.test/n0") == ((None, None, false)))
    // one hop in, the remaining 8 fit the cap
    assert(out("http://long.test/n1") ==
      ((Some("http://long.test/final"), Some(8L), true)))
  }

  test("doubling covers a 64-hop chain in 6 rounds (maxHops = 64)") {
    val edges = chain("deep.test", 64).toDF("src", "dst")
    val urls = Seq("http://deep.test/n0").toDF("url")
    val row = Redirects.resolve(urls, edges, maxHops = 64).collect().head
    assert(row.getString(1) == "http://deep.test/final")
    assert(row.getLong(2) == 64L && row.getBoolean(3))
  }

  test("containment is asymmetric: the excerpt side scores, the parent side doesn't") {
    val parent = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens → 5 distinct 8-grams
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, parent), (2L, excerpt), (3L, other)).toDF("id", "text")
    val out = graft.dedup.Dedup.containmentPairs(docs, "id", "text",
      n = 8, minPpm = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // excerpt→parent: all 5 of the excerpt's grams hit → 1000000 ppm
    assert(out((2L, 1L)) == ((5L, 5L, 1000000L)))
    // parent→excerpt: 5 of the parent's 33 grams hit → floor ppm
    assert(out((1L, 2L)) == ((5L, 33L, 1000000L * 5 / 33)))
    assert(!out.contains((3L, 1L)) && !out.contains((1L, 3L)))
  }

  test("containment maxDocFreq cap drops boilerplate grams before the self-join") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    // 5 docs all sharing ONE boilerplate 8-gram, otherwise disjoint
    val docs = (0 until 5).map { d =>
      (d.toLong, boiler + " " + (0 until 20).map(i => s"d${d}x$i").mkString(" "))
    }.toDF("id", "text")
    val uncapped = graft.dedup.Dedup.containmentPairs(docs, "id", "text",
      n = 8, minPpm = 0L).count()
    assert(uncapped == 20L) // 5×4 ordered pairs via the shared gram
    val capped = graft.dedup.Dedup.containmentPairs(docs, "id", "text",
      n = 8, minPpm = 0L, maxDocFreq = 4).count()
    assert(capped == 0L)
  }

  test("dhash64 matches a hand-computed hash, including non-divisible pooling") {
    import graft.multimodal.{Multimodal, Png}
    // w=10, h=8: grid column boundaries 0,1,2,3,4,5,6,7,8,10 — the last
    // cell is 2px wide (floor boundaries), pixel = 7x so cells strictly
    // increase → every gy*8+gx bit is 0... cells: c(gx)=mean of 7x over
    // block; strictly increasing → cell(gx) > cell(gx+1) never → hash 0.
    // Reverse ramp (70-7x) makes every comparison true → all 64 bits set.
    def img(id: Long, f: Int => Int): Multimodal.Asset = {
      val px = Array.tabulate(10 * 8)(j => (f(j % 10) & 0xff).toByte)
      Multimodal.Asset(id, "image", Png.encode(10, 8, 1, px), "http://t/i")
    }
    val ds = spark.createDataset(Seq(
      img(1L, x => 7 * x), img(2L, x => 70 - 7 * x)))(
      org.apache.spark.sql.Encoders.product[Multimodal.Asset])
    val out = Multimodal.dhash64(ds).collect().map(h => h.asset_id -> h.dhash).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == -1L) // all 64 bits
  }

  test("dhash64 contains malformed and sub-grid images as 422 rows") {
    import graft.multimodal.{Multimodal, Png}
    val good = Multimodal.Asset(1L, "image",
      Png.encode(9, 8, 1, Array.tabulate(72)(_.toByte)), "u")
    val garbage = Multimodal.Asset(2L, "image", Array[Byte](1, 2, 3), "u")
    val tiny = Multimodal.Asset(3L, "image",
      Png.encode(4, 4, 1, Array.tabulate(16)(_.toByte)), "u")
    val ds = spark.createDataset(Seq(good, garbage, tiny))(
      org.apache.spark.sql.Encoders.product[Multimodal.Asset])
    val st = Multimodal.dhash64(ds).collect().map(h => h.asset_id -> h.status).toMap
    assert(st == Map(1L -> 200, 2L -> 422, 3L -> 422))
  }

  test("HITS fixed-point scores match hand arithmetic") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val out = graft.frontier.Rank.hits(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a1 raw: 10←h(1)+h(2)=2e6, 11←1e6; tot 3e6 → 666666/333333 (floor DIV)
    // h1 raw: 1←999999, 2←666666; tot 1666665 → 600000/400000 (exact)
    assert(out(10L) == ((666666L, 0L)))
    assert(out(11L) == ((333333L, 0L)))
    assert(out(1L) == ((0L, 600000L)))
    assert(out(2L) == ((0L, 400000L)))
  }

  test("TrustRank: link farms with no trusted in-links score zero") {
    // trusted seed 1 → 2 → 3; spam farm 10 ↔ 11 pumping each other
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.frontier.Rank.trustRank(edges, seeds, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = 1.0 - 0.85 // the engine computes (1 − d), not the literal 0.15
    assert(out(1L) == base) // seed: base only (nothing links in)
    assert(out(2L) == 0.85 * base) // d × seed's base after convergence step
    assert(out(10L) == 0.0 && out(11L) == 0.0) // the farm never sees trust
    assert(out(3L) > 0.0)
  }

  test("revisit classification covers all four statuses; ppm over revisits only") {
    import graft.frontier.Revisit
    val prev = Seq(
      ("http://a.test/1", "x"), ("http://a.test/2", "y"),
      ("http://a.test/3", "z"), ("http://b.test/1", "q")).toDF("url", "html")
    val cur = Seq(
      ("http://a.test/1", "x"), // unchanged
      ("http://a.test/2", "y2"), // modified
      ("http://a.test/9", "w"), // new
      ("http://c.test/1", "n")) // new host (b.test/1 gone)
      .toDF("url", "html")
    val cls = Revisit.classify(prev, cur).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cls == Map(
      "http://a.test/1" -> "unchanged", "http://a.test/2" -> "modified",
      "http://a.test/3" -> "gone", "http://a.test/9" -> "new",
      "http://b.test/1" -> "gone", "http://c.test/1" -> "new"))
    val rates = Revisit.changeRates(prev, cur).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5))))).toMap
    assert(rates("a.test") == ((1L, 1L, 1L, 1L, Some(500000L))))
    assert(rates("b.test") == ((0L, 1L, 0L, 0L, None))) // no revisits → NULL rate
    assert(rates("c.test") == ((1L, 0L, 0L, 0L, None)))
  }

  test("reciprocity: webrings score 1e6 ppm, one-way endorsement scores 0") {
    // a↔b webring; c→a, c→b one-way; d→c one-way
    val hostEdges = Seq(
      ("a.test", "b.test"), ("b.test", "a.test"),
      ("c.test", "a.test"), ("c.test", "b.test"),
      ("d.test", "c.test")).toDF("src_host", "dst_host")
    val out = graft.frontier.Rank.reciprocity(hostEdges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("a.test") == ((1L, 1L, 1000000L)))
    assert(out("b.test") == ((1L, 1L, 1000000L)))
    assert(out("c.test") == ((2L, 0L, 0L)))
    assert(out("d.test") == ((1L, 0L, 0L)))
  }

  test("BPE encodeCounts: rank-ordered merges compose per word, weighted per doc") {
    val docs = Seq((1L, "the mess the"), (2L, "canes")).toDF("doc_id", "text")
    val out = graft.text.Bpe.encodeCounts(docs, "doc_id", "text",
      Seq(("e", "s"), ("t", "h"), ("es", "</w>"), ("a", "n"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the → [th, e, </w>] = 3; mess → [m, es, s, </w>] = 4 → 2×3 + 4 = 10
    assert(out(1L) == ((3L, 10L)))
    // canes → es → es</w> → an: [c, an, es</w>] = 3 (tests merge ORDER)
    assert(out(2L) == ((1L, 3L)))
  }

  test("pass-through columns and row multiplicity survive") {
    val edges = chain("m.test", 2).toDF("src", "dst")
    val urls = Seq(("http://m.test/n0", 7L), ("http://m.test/n0", 9L))
      .toDF("url", "seed_idx")
    val out = Redirects.resolve(urls, edges, maxHops = 4)
      .orderBy("seed_idx").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(7L, 9L))
    assert(out.forall(r => r.getString(2) == "http://m.test/final" && r.getLong(3) == 2L))
  }
}
