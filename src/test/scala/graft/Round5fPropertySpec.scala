package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the round-5f kernels — pure driver-side
  * functions (the codegen expressions delegate to these statics, so the
  * properties exercise the production code path without a Spark job per
  * case).
  */
object Round5fPropertySpec extends Properties("Round5fKernels") {

  private val anyString: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    1 -> Gen.listOf(Gen.oneOf('<', '>', '"', '\'', '&', '-', '!',
      'a', 'l', 'i', 'n', 'k', ' ', '\n', '=')).map(_.mkString),
    1 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue))
      .map(_.mkString))

  property("hreflangAlternates: total on hostile input; langs lowercase") =
    forAll(anyString) { s =>
      val out = graft.text.HtmlText.hreflangAlternates(s)
      out.forall { case (l, _) =>
        l == l.toLowerCase(java.util.Locale.ROOT) && l.nonEmpty
      }
    }

  property("sniffBytes: total on arbitrary bytes, always a known type") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val t = graft.multimodal.Mime.sniffBytes(bs.toArray)
      t != null && t.contains("/")
    }

  property("sniffBytes: printable ASCII never classifies as octet-stream") =
    forAll(Gen.asciiPrintableStr) { s =>
      val t = graft.multimodal.Mime.sniffBytes(s.getBytes("US-ASCII"))
      // printable ascii has no binary bytes and is valid UTF-8: it must
      // come back textual (plain, html, xml) or as a recognized magic
      // (e.g. a string starting "GIF87a") — never the binary fallback,
      // except the empty buffer which is octet-stream by spec
      s.isEmpty || t != "application/octet-stream"
    }

  private val hostGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 5)
    labels <- Gen.listOfN(n, Gen.chooseNum(1, 8).flatMap(k =>
      Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString)))
    suffix <- Gen.oneOf("", ".co.uk", ".com", ".github.io", ".com.au")
  } yield labels.mkString(".") + suffix

  property("registrableDomain: idempotent and a suffix of the host") =
    forAll(hostGen) { h =>
      val d = graft.url.UrlKit.registrableDomain(h)
      graft.url.UrlKit.registrableDomain(d) == d &&
        (h == d || h.endsWith("." + d))
    }

  property("HLL registers are insertion-order-independent (bit parity)") =
    forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)), Gen.chooseNum(4, 11)) {
      (ks, p) =>
        import graft.functions.HllSketch
        val a = new Array[Byte](1 << p)
        val b = new Array[Byte](1 << p)
        ks.foreach(HllSketch.add(a, p, _))
        scala.util.Random.shuffle(ks).foreach(HllSketch.add(b, p, _))
        java.util.Arrays.equals(a, b) &&
          HllSketch.estimate(p, a) >= 0
    }

  property("PQ encode: every code within [0, ksub)") =
    forAll(
      Gen.chooseNum(1, 4), // m
      Gen.chooseNum(1, 6), // ksub
      Gen.chooseNum(1, 3), // dsub
      Gen.long) { (m, ksub, dsub, seed) =>
      val rnd = new scala.util.Random(seed)
      val books = Array.fill(m, ksub, dsub)(rnd.nextFloat() * 10 - 5)
      val v = Array.fill(m * dsub)(rnd.nextFloat() * 10 - 5)
      (0 until m).forall { j =>
        val c = graft.ann.PqEval.nearestSub(books(j), v, j * dsub)
        c >= 0 && c < ksub
      }
    }
}
