package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.multimodal.{Png, Vid, Wav}
import graft.sources.Warc

/** ScalaCheck properties for the round-4 codecs — like the URL kernels,
  * these are TOTAL functions over crawl-harvested bytes, so the encode→
  * decode identities are checked over generated inputs, not only curated
  * fixtures.
  */
object CodecPropertySpec extends Properties("Codecs") {

  private val samples: Gen[Array[Short]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue))
        .map(_.map(_.toShort).toArray))

  property("WAV mono round-trip is byte-exact on samples") =
    forAll(Gen.oneOf(8000, 16000, 44100), samples) { (rate, s) =>
      val (r2, ch, s2) = Wav.decode(Wav.encode(rate, 1, s))
      r2 == rate && ch == 1 && s2.toSeq == s.toSeq
    }

  property("WAV stereo round-trip preserves interleaving") =
    forAll(samples) { s =>
      val even = if (s.length % 2 == 0) s else s.dropRight(1)
      val (_, ch, s2) = Wav.decode(Wav.encode(22050, 2, even))
      ch == 2 && s2.toSeq == even.toSeq
    }

  private val image: Gen[(Int, Int, Int, Array[Byte], Int)] = for {
    w <- Gen.chooseNum(1, 24)
    h <- Gen.chooseNum(1, 16)
    ch <- Gen.oneOf(1, 3)
    px <- Gen.listOfN(w * h * ch, Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
    filter <- Gen.chooseNum(0, 4)
  } yield (w, h, ch, px, filter)

  property("PNG round-trip is pixel-exact across random dims/channels/filters") =
    forAll(image) { case (w, h, ch, px, filter) =>
      val (dw, dh, dch, dpx) = Png.decode(Png.encode(w, h, ch, px, filter))
      dw == w && dh == h && dch == ch && dpx.toSeq == px.toSeq
    }

  property("gVID round-trip: every frame decodes to its planted pixels") =
    forAll(Gen.chooseNum(0, 6), Gen.chooseNum(1, 10), Gen.chooseNum(1, 8)) { (n, w, h) =>
      val frames = (0 until n).map(f =>
        Png.encode(w, h, 1, Array.tabulate(w * h)(j => ((f * 31 + j) % 256).toByte)))
      val v = Vid.encode(w, h, frames)
      Vid.meta(v) == ((w, h, n)) && (0 until n).forall { f =>
        val (ch, px) = Vid.decodeFrame(v, f)
        ch == 1 && px.toSeq == (0 until w * h).map(j => ((f * 31 + j) % 256).toByte)
      }
    }

  private val warcBody: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)

  property("WARC multi-record round-trip, plain and gzip'd") =
    // n >= 1: a zero-member gzip image has no gzip magic and rejects by
    // design (reject-don't-misread), so the gz leg needs a member
    forAll(Gen.chooseNum(1, 5), warcBody) { (n, body) =>
      val recs = (0 until n).map(i =>
        Warc.writeRecord("response", s"http://p.test/$i", "2024-01-01T00:00:00Z",
          body ++ Array(i.toByte)))
      val plain = Warc.records(Warc.writeFile(recs))
      val gz = Warc.recordsGz(Warc.writeFileGz(recs))
      def bodies(rs: Vector[Warc.Record]) =
        rs.map(r => Warc.httpBody(r.payload).toSeq)
      plain.length == n && gz.length == n &&
        bodies(plain) == bodies(gz) &&
        bodies(plain) == (0 until n).map(i => (body ++ Array(i.toByte)).toSeq)
    }
}
