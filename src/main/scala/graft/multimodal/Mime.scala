package graft.multimodal

import org.apache.spark.unsafe.types.UTF8String

/** Content-type sniffing over raw fetched bytes — the WHATWG
  * MIME-Sniffing "pattern matching" algorithm's table, subset to the
  * types a text-crawl pipeline routes on. Servers lie: Common-Crawl
  * `Content-Type` headers disagree with payload bytes constantly (gzip
  * double-compression, images served as text/html, binary junk as
  * text/plain), and every downstream stage — HTML extraction, the PNG /
  * WAV / gVID decoders, WARC re-packing — must dispatch on what the bytes
  * ARE, not what the server said. One left-to-right magic-byte walk per
  * row, allocation-free, codegen-called.
  *
  * Decision order (first match wins; prefixes per the WHATWG table):
  * PNG, JPEG, GIF, RIFF/WAVE, RIFF/WEBP, PDF, gzip, zip, "WARC/" (ISO
  * 28500 version line), gVID (this engine's video container,
  * [[Vid]]), then the tag-sniff for markup: skip HTML whitespace
  * (tab/LF/FF/CR/space), case-insensitive `<!DOCTYPE html` / `<html` /
  * `<head` / `<body` / `<script` / `<!--` → text/html, `<?xml` →
  * text/xml. Anything else: a WHATWG "binary data byte"
  * (0x00-0x08, 0x0B, 0x0E-0x1A, 0x1C-0x1F) anywhere → octet-stream;
  * otherwise the buffer must round-trip as UTF-8 (strict multibyte
  * validation — overlongs, bare continuations, surrogates, >U+10FFFF all
  * reject; a documented tightening of WHATWG, which would call any
  * binary-free buffer text) → text/plain, else octet-stream. Empty /
  * null-ish input → octet-stream.
  */
object Mime {

  private val Png = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def startsWith(b: Array[Byte], pat: Array[Byte], off: Int): Boolean = {
    if (b.length < off + pat.length) return false
    var i = 0
    while (i < pat.length) { if (b(off + i) != pat(i)) return false; i += 1 }
    true
  }

  private def asciiAt(b: Array[Byte], off: Int, s: String): Boolean = {
    if (b.length < off + s.length) return false
    var i = 0
    while (i < s.length) { if (b(off + i) != s.charAt(i).toByte) return false; i += 1 }
    true
  }

  /** Case-insensitive ASCII match at offset. */
  private def asciiAtCi(b: Array[Byte], off: Int, s: String): Boolean = {
    if (b.length < off + s.length) return false
    var i = 0
    while (i < s.length) {
      val c = (b(off + i) & 0xFF).toChar
      if (Character.toLowerCase(c) != Character.toLowerCase(s.charAt(i))) return false
      i += 1
    }
    true
  }

  private def isHtmlWs(b: Byte): Boolean =
    b == 0x09 || b == 0x0A || b == 0x0C || b == 0x0D || b == 0x20

  private def isBinaryByte(b: Byte): Boolean = {
    val v = b & 0xFF
    v <= 0x08 || v == 0x0B || (v >= 0x0E && v <= 0x1A) || (v >= 0x1C && v <= 0x1F)
  }

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates,
    * max U+10FFFF).
    */
  private def isUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // bare continuation or overlong lead
      else if (c < 0xE0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xFF
        val lo = if (c == 0xE0) 0xA0 else 0x80 // overlong fence
        val hi = if (c == 0xED) 0x9F else 0xBF // surrogate fence
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xC0) != 0x80) return false
        i += 3
      } else if (c < 0xF5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xFF
        val lo = if (c == 0xF0) 0x90 else 0x80
        val hi = if (c == 0xF4) 0x8F else 0xBF
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xC0) != 0x80 ||
          (b(i + 3) & 0xC0) != 0x80) return false
        i += 4
      } else return false // 0xF5-0xFF never legal
    }
    true
  }

  private val Tags = Array("<!doctype html", "<html", "<head", "<body",
    "<script", "<!--")

  def sniffBytes(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "application/octet-stream"
    if (startsWith(b, Png, 0)) return "image/png"
    if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF) return "image/jpeg"
    if (asciiAt(b, 0, "GIF87a") || asciiAt(b, 0, "GIF89a")) return "image/gif"
    if (asciiAt(b, 0, "RIFF")) {
      if (asciiAt(b, 8, "WAVE")) return "audio/wav"
      if (asciiAt(b, 8, "WEBP")) return "image/webp"
      return "application/octet-stream"
    }
    if (asciiAt(b, 0, "%PDF-")) return "application/pdf"
    if (b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B)
      return "application/gzip"
    if (b.length >= 4 && b(0) == 'P'.toByte && b(1) == 'K'.toByte &&
      b(2) == 0x03.toByte && b(3) == 0x04.toByte) return "application/zip"
    if (asciiAt(b, 0, "WARC/")) return "application/warc"
    if (asciiAt(b, 0, "gVID")) return "video/x-graft"
    // markup sniff: skip leading HTML whitespace, then tag table
    var p = 0
    while (p < b.length && isHtmlWs(b(p))) p += 1
    if (asciiAtCi(b, p, "<?xml")) return "text/xml"
    var t = 0
    while (t < Tags.length) {
      if (asciiAtCi(b, p, Tags(t))) return "text/html"
      t += 1
    }
    var i = 0
    while (i < b.length) { if (isBinaryByte(b(i))) return "application/octet-stream"; i += 1 }
    if (isUtf8(b)) "text/plain" else "application/octet-stream"
  }

  /** Codegen entry point ([[graft.functions.SniffMime]]). */
  def sniff(b: Array[Byte]): UTF8String = UTF8String.fromString(sniffBytes(b))
}
