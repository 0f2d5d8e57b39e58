package graft.multimodal

/** Minimal REAL RIFF/WAVE PCM codec, pure JVM: 16-bit little-endian PCM,
  * mono or stereo, genuine chunk-walking (`RIFF`/`WAVE` framing, `fmt `
  * parse, unknown chunks skipped with the spec's odd-length pad byte).
  * The audio twin of [[Png]]: it replaces the round-2/3 "declared fake"
  * for the audio leg — the bytes [[Multimodal.audioFeatures]] consumes are
  * standards-conformant WAV streams any external tool can read back.
  *
  * Like [[Png]], the decoder REJECTS (never mis-reads) what it does not
  * implement — compressed formats (audioFormat ≠ 1, incl. the 0xFFFE
  * EXTENSIBLE envelope), bit depths ≠ 16, > 2 channels, truncated chunks —
  * so swapping in a full codec changes capability, not correctness.
  */
object Wav {

  /** Decode allocation ceiling (samples) — one crawl-harvested asset must
    * never OOM an executor. 2^27 samples = 256 MiB of shorts ≈ 50 min of
    * 44.1 kHz stereo.
    */
  val MaxSamples: Long = 1L << 27

  /** Encode interleaved 16-bit samples (`samples.length` must be a multiple
    * of `channels`) as a canonical 44-byte-header WAV file.
    */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate: $sampleRate")
    require(channels == 1 || channels == 2, s"channels: $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val blockAlign = channels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // WAVE_FORMAT_PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * blockAlign) // byte rate
    b.putShort(blockAlign.toShort)
    b.putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Decode → (sampleRate, channels, interleaved samples). Walks the chunk
    * list: `fmt ` and `data` are consumed, anything else (`LIST`, `fact`,
    * `cue `, …) is skipped over its declared length + pad byte.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= 12 &&
      ascii(bytes, 0) == "RIFF" && ascii(bytes, 8) == "WAVE",
      "not a RIFF/WAVE stream")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var haveFmt = false
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length && data == null) {
      val ctype = ascii(bytes, pos)
      val len = readIntLE(bytes, pos + 4)
      // bound check in Long: a crafted len near Int.MaxValue wraps pos+8+len
      // negative in Int and would pass spuriously (reject-don't-misread)
      require(len >= 0 && pos + 8L + len <= bytes.length, s"truncated chunk $ctype")
      ctype match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val audioFormat = readShortLE(bytes, pos + 8) & 0xffff
          channels = readShortLE(bytes, pos + 10) & 0xffff
          sampleRate = readIntLE(bytes, pos + 12)
          val bits = readShortLE(bytes, pos + 22) & 0xffff
          require(audioFormat == 1,
            s"unsupported audio format $audioFormat (PCM only)")
          require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
          require(channels == 1 || channels == 2, s"unsupported channels: $channels")
          require(sampleRate > 0, s"bad sample rate $sampleRate")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt ")
          require(len % (channels * 2) == 0,
            s"data length $len not a multiple of the $channels-channel frame size")
          val n = len / 2
          require(n <= MaxSamples, s"data chunk too large: $n samples")
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = readShortLE(bytes, pos + 8 + i * 2); i += 1 }
          data = out
        case _ => () // unknown chunk: skip
      }
      pos += 8 + len + (len & 1) // RIFF pads odd-length chunks by one byte
    }
    require(data != null, "missing data chunk")
    (sampleRate, channels, data)
  }

  private def ascii(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readShortLE(b: Array[Byte], off: Int): Short =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort
}
