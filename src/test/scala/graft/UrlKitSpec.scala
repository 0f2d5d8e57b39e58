package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.url.UrlKit

class UrlKitSpec extends AnyFunSuite {

  test("RFC 3986 normalization cases") {
    val cases = Seq(
      "HTTP://Example.COM/a/b" -> "http://example.com/a/b",
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      "http://example.com" -> "http://example.com/",
      "http://example.com/a/./b" -> "http://example.com/a/b",
      "http://example.com/a/b/../c" -> "http://example.com/a/c",
      "http://example.com/a/%7Euser" -> "http://example.com/a/~user",
      "http://example.com/a/%7euser" -> "http://example.com/a/~user",
      "http://example.com/a%2Fb" -> "http://example.com/a%2Fb",
      "http://example.com/a%2fb" -> "http://example.com/a%2Fb",
      "http://example.com/a#frag" -> "http://example.com/a",
      "http://example.com/a?b=1&a=2" -> "http://example.com/a?b=1&a=2", // query order kept
      "http://user:pw@example.com/a" -> "http://example.com/a",
      "  http://example.com/a  " -> "http://example.com/a",
      "http://example.com/%41%42" -> "http://example.com/AB")
    for ((in, want) <- cases)
      assert(UrlKit.canonicalize(in) == want, s"input: $in")
  }

  test("malformed input is total, lowercased") {
    assert(UrlKit.canonicalize("not a url") == "not a url")
    assert(UrlKit.canonicalize("ftp://x/y") == "ftp://x/y")
    assert(UrlKit.canonicalize(null) == null)
  }

  test("idempotence (seeded property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val s = rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
      val u = rnd.nextInt(3) match {
        case 0 => s"http://EX.com:80/p/$s/../q?x=%7E$s#f"
        case 1 => s"https://a.B.c/$s/./"
        case _ => s"HTTP://$s.Org/%41$s%2f?q=$s"
      }
      val once = UrlKit.canonicalize(u)
      assert(UrlKit.canonicalize(once) == once, s"not idempotent: $u -> $once")
    }
  }

  test("hostReverse") {
    assert(UrlKit.hostReverse("www.example.org") == "org.example.www")
    assert(UrlKit.hostReverse("localhost") == "localhost")
    assert(UrlKit.hostReverse("") == "")
    assert(UrlKit.hostReverseOfUrl("http://a.b.c/x") == "c.b.a")
  }

  test("dot-segment resolution follows RFC 3986 §5.2.4") {
    assert(UrlKit.canonicalize("http://x.y/a/b/c/./../../g") == "http://x.y/a/g")
    assert(UrlKit.canonicalize("http://x.y/../a") == "http://x.y/a")
    assert(UrlKit.canonicalize("http://x.y/a/..") == "http://x.y/")
  }
}
