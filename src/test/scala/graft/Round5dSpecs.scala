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
