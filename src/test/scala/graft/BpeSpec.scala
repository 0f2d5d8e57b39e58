package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE training against an independent naive reference implementation
  * (the Sennrich '16 get_stats/merge loop, same deterministic tie-break),
  * so the distributed pair-count + codegen-fuse path is checked on VALUES,
  * not just shapes.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- naive reference ------------------------------------------------------
  private def naiveSyms(word: String): Vector[String] =
    word.map(_.toString).toVector :+ "</w>"

  private def naivePairCounts(tab: Map[Vector[String], Long]): Map[(String, String), Long] =
    tab.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => p -> f)
    }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }

  private def naiveMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def naiveTrain(words: Map[String, Long], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    var tab = words.map { case (w, f) => naiveSyms(w) -> f }
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = naivePairCounts(tab)
      if (counts.isEmpty) done = true
      else {
        val (p, c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minPairCount) done = true
        else {
          merges += p
          tab = tab.toSeq.map { case (s, f) => naiveMerge(s, p._1, p._2) -> f }
            .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).sum }
        }
      }
      r += 1
    }
    merges.result()
  }

  private val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  private def corpusDf = Seq(corpus.mkString(" ")).toDF("text")
  private def wordMap = corpus.groupBy(identity).map { case (w, v) => w -> v.size.toLong }

  test("pairCounts matches the naive reference exactly") {
    val got = Bpe.pairCounts(Bpe.init(Bpe.wordFreqs(corpusDf, "text")))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == naivePairCounts(wordMap.map { case (w, f) => naiveSyms(w) -> f }))
  }

  test("merge kernel: left-to-right non-overlapping, incl. the aaa case") {
    val df = Seq(("aaa", 1L), ("abab", 1L), ("xy", 1L)).toDF("word", "freq")
    val got = Bpe.applyMerge(Bpe.init(df), "a", "a")
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(got("aaa") == Seq("aa", "a", "</w>"))
    assert(got("abab") == Seq("a", "b", "a", "b", "</w>"))
    val got2 = Bpe.applyMerge(Bpe.init(df), "a", "b")
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(got2("abab") == Seq("ab", "ab", "</w>"))
    assert(got2("xy") == Seq("x", "y", "</w>"))
  }

  test("train reproduces the naive merge list (classic Sennrich corpus)") {
    val got = Bpe.train(corpusDf, "text", numMerges = 8)
    assert(got == naiveTrain(wordMap, 8))
    // sanity: the famous first merges — 'es' then 'est' then 'est</w>'
    assert(got.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("train stops when no pair reaches minPairCount") {
    val got = Bpe.train(Seq("ab cd ef").toDF("text"), "text",
      numMerges = 10, minPairCount = 2)
    assert(got.isEmpty)
  }

  test("applyAll composes merges in rank order (tokenization round-trip)") {
    val merges = Bpe.train(corpusDf, "text", numMerges = 6)
    val got = Bpe.applyAll(Bpe.init(Bpe.wordFreqs(corpusDf, "text")), merges)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    var tab = wordMap.map { case (w, f) => w -> naiveSyms(w) }
    merges.foreach { case (a, b) => tab = tab.map { case (w, s) => w -> naiveMerge(s, a, b) } }
    assert(got == tab)
  }
}
