package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the round-5 kernels — all pure driver-side
  * functions (the codegen expressions delegate to [[graft.functions.Impl]]
  * statics, so the properties exercise exactly the production code path
  * without a Spark job per case).
  */
object Round5PropertySpec extends Properties("Round5Kernels") {

  private val token: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val tokens: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, token))
  private val ws: Gen[String] = Gen.oneOf(" ", "  ", "\t", " \n ")

  private def keys(text: String, n: Int, lower: Boolean): Seq[Long] = {
    val a = graft.functions.Impl.ngramHashKeys(UTF8String.fromString(text), n, lower)
    (0 until a.numElements()).map(a.getLong)
  }
  private def hashes(text: String, n: Int): Seq[Long] = {
    val a = graft.functions.Impl.ngramHashes(UTF8String.fromString(text), n, false)
    (0 until a.numElements()).map(a.getLong)
  }

  property("positional window count = max(0, tokens - n + 1)") =
    forAll(tokens, Gen.chooseNum(1, 8)) { (ts, n) =>
      hashes(ts.mkString(" "), n).length == math.max(0, ts.length - n + 1)
    }

  property("distinct keys = distinct string windows (the spec-twin model)") =
    forAll(tokens, Gen.chooseNum(1, 5)) { (ts, n) =>
      val lowered = ts.map(_.toLowerCase(java.util.Locale.ROOT))
      val model = lowered.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      // model hash-set size can only differ from the string-set size on a
      // 64-bit collision — vanishingly unlikely at property scale
      keys(ts.mkString(" "), n, lower = true).length == model.size
    }

  property("whitespace shape never changes the grams") =
    forAll(tokens, Gen.listOfN(45, ws), Gen.chooseNum(1, 5)) { (ts, seps, n) =>
      val canonical = ts.mkString(" ")
      val messy = ts.zip(seps).map { case (t, w) => t + w }.mkString
      keys(canonical, n, lower = true) == keys(messy, n, lower = true) &&
        hashes(canonical, n) == hashes(messy, n)
    }

  property("a changed token changes the covering windows") =
    forAll(tokens.suchThat(_.length >= 3), Gen.chooseNum(1, 3)) { (ts, n) =>
      val changed = ts.updated(ts.length / 2, ts(ts.length / 2) + "zq")
      hashes(ts.mkString(" "), n) != hashes(changed.mkString(" "), n)
    }

  // Pii patterns run on Java's regex engine inside Spark's codegen'd
  // regexp_replace — the same engine java.util.regex exposes, so the
  // model below IS the production semantics.
  private def scrubModel(s: String): String =
    s.replaceAll(graft.text.Pii.EmailPattern, graft.text.Pii.EmailToken)
      .replaceAll(graft.text.Pii.Ipv4Pattern, graft.text.Pii.IpToken)
      .replaceAll(graft.text.Pii.PhonePattern, graft.text.Pii.PhoneToken)

  private val piiish: Gen[String] = {
    val email = for {
      u <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
      d <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    } yield s"$u@$d.org"
    val ip = for {
      a <- Gen.chooseNum(0, 999); b <- Gen.chooseNum(0, 999)
      c <- Gen.chooseNum(0, 999); d <- Gen.chooseNum(0, 999)
    } yield s"$a.$b.$c.$d"
    val phone = for {
      a <- Gen.chooseNum(100, 999); b <- Gen.chooseNum(100, 999)
      c <- Gen.chooseNum(1000, 9999)
    } yield s"$a-$b-$c"
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(7).mkString)
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(email, ip, phone, word)).map(_.mkString(" ")))
  }

  property("PII scrub is idempotent") =
    forAll(piiish) { s =>
      val once = scrubModel(s)
      scrubModel(once) == once
    }

  property("scrubbed text contains no residual email/ip/phone match") =
    forAll(piiish) { s =>
      val once = scrubModel(s)
      !java.util.regex.Pattern.compile(graft.text.Pii.EmailPattern).matcher(once).find() &&
        !java.util.regex.Pattern.compile(graft.text.Pii.Ipv4Pattern).matcher(once).find() &&
        !java.util.regex.Pattern.compile(graft.text.Pii.PhonePattern).matcher(once).find()
    }

  // mixture-sampling arithmetic model: copies = floor(w) + [u < frac(w)]
  property("sampling copies: E-exactness per row and monotonicity in w") =
    forAll(Gen.chooseNum(0.0, 4.0), Gen.chooseNum(0, 999999)) { (w, ku) =>
      val u = ku / 1e6
      val copies = math.floor(w).toLong + (if (u < w - math.floor(w)) 1L else 0L)
      copies >= math.floor(w).toLong && copies <= math.ceil(w).toLong &&
        (w != math.floor(w) || copies == w.toLong)
    }
}
