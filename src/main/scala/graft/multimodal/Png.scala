package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL PNG codec, pure JVM (java.util.zip only — no imageio, no
  * native libs): 8-bit grayscale (color type 0) and truecolor (2),
  * non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth),
  * multi-IDAT tolerant. This replaces the round-2 "declared fake" for the
  * image leg: q28's bytes are now genuine zlib-compressed, filtered PNG
  * streams, and the features come out of a real inflate + unfilter.
  *
  * Kept deliberately small: the decoder REJECTS (never mis-reads) the PNG
  * features it does not implement — interlace, palettes, alpha, 16-bit
  * depth — so a swap to a full codec changes capability, not correctness.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Decode allocation ceiling (raw filtered-scanline bytes, 256 MiB ≈ a
    * 9000×9000 RGB image). A per-asset bound, not a format limit: one
    * crawl-harvested asset must never be able to OOM an executor.
    */
  val MaxPixelBytes: Long = 256L << 20

  /** Encode row-major `pixels` (length = width×height×channels, channels 1
    * or 3) as a PNG. `filterType` picks the per-scanline filter (default
    * Sub, so decoding MUST actually unfilter — an identity-payload encoding
    * would let a broken decoder pass tests).
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterType: Int = 1): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels: $channels")
    require(filterType >= 0 && filterType <= 4, s"filter: $filterType")
    require(pixels.length == width * height * channels,
      s"${pixels.length} pixels for ${width}x${height}x$channels")
    val bpp = channels
    val stride = width * channels
    // raw scanline stream: filter byte + filtered bytes per row
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = filterType.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val idat = deflate(raw)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put((if (channels == 1) 0 else 2).toByte) // color type
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode → (width, height, channels, row-major pixel bytes). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length > 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG signature")
    var pos = 8
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var seenEnd = false
    while (pos + 8 <= bytes.length && !seenEnd) {
      val len = readInt(bytes, pos)
      val ctype = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated chunk $ctype")
      ctype match {
        case "IHDR" =>
          width = readInt(bytes, pos + 8)
          height = readInt(bytes, pos + 12)
          val depth = bytes(pos + 16) & 0xff
          val color = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(depth == 8, s"unsupported bit depth $depth")
          require(color == 0 || color == 2, s"unsupported color type $color")
          require(interlace == 0, "interlaced PNG unsupported")
          channels = if (color == 0) 1 else 3
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0 && channels > 0, "missing IHDR")
    // size math in LONG before any allocation: a crafted IHDR (e.g.
    // width=2^21 × height=2^10 × 3 channels) overflows Int to a
    // negative/small size, and even non-overflowing huge dims would
    // allocate multi-GB buffers before the IDAT is validated. Payloads are
    // untrusted crawl content — reject, never trust dimensions.
    val rawLen = (width.toLong * channels + 1L) * height
    require(rawLen <= MaxPixelBytes,
      s"PNG dimensions too large: ${width}x${height}x$channels")
    val stride = width * channels
    val raw = inflate(idat.toByteArray, rawLen.toInt)
    val px = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      var x = 0
      while (x < stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad filter $other at row $y")
        }
        px(y * stride + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (width, height, channels, px)
  }

  /** RFC 2083 Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        // a zlib stream demanding a preset dictionary (FDICT) makes inflate
        // return 0 with neither finished nor needsInput — without this check
        // the loop spins forever on a crafted IDAT instead of rejecting
        require(!inf.needsDictionary, "unsupported IDAT: preset dictionary (FDICT)")
        require(n > 0 || inf.finished() || !inf.needsInput, "truncated IDAT stream")
        require(n > 0 || inf.finished(), "IDAT stream stalled (no progress)")
        off += n
      }
      require(off == expected, s"IDAT inflated to $off bytes, expected $expected")
      out
    } finally inf.end()
  }
}
