package graft.multimodal

/** Minimal MJPEG-style video container over REAL [[Png]] frames — the
  * video twin of [[Wav]], retiring the last "declared fake" decode leg.
  * Layout (big-endian, like PNG):
  *
  * {{{
  *   magic   "gVID"            4 bytes
  *   version 1                 1 byte
  *   width, height             4 + 4
  *   frameCount                4
  *   index: frameCount × (offset:int, length:int)   — offsets are absolute
  *   frame data: concatenated standalone PNG streams
  * }}}
  *
  * The index is the point: [[decodeFrame]] seeks directly to frame k and
  * runs one real PNG decode (inflate + unfilter) — frame sampling at
  * `everyK` touches only the sampled frames' bytes, never the skipped
  * ones. That is the contract a real keyframe-seeking codec has, expressed
  * over a codec this container can actually verify (every frame's dims
  * must match the header; a frame that fails PNG validation rejects).
  */
object Vid {

  private val Magic = "gVID".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val HeaderLen = 4 + 1 + 4 + 4 + 4

  /** Assemble pre-encoded PNG frames (all `width`×`height`) into one
    * container. Frames are validated at ASSEMBLY time (cheap header check,
    * not a full decode): a mis-sized frame must fail the writer, not every
    * future reader.
    */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"dims: ${width}x$height")
    val total = HeaderLen + 8L * frames.size + frames.map(_.length.toLong).sum
    require(total <= Int.MaxValue, "container too large")
    val b = java.nio.ByteBuffer.allocate(total.toInt)
    b.put(Magic).put(1.toByte).putInt(width).putInt(height).putInt(frames.size)
    var off = HeaderLen + 8 * frames.size
    for (f <- frames) { b.putInt(off).putInt(f.length); off += f.length }
    frames.foreach(b.put)
    b.array()
  }

  /** (width, height, frameCount) from the header. */
  def meta(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= HeaderLen && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a gVID container")
    val b = java.nio.ByteBuffer.wrap(bytes)
    b.position(4)
    val version = b.get()
    require(version == 1, s"unsupported gVID version $version")
    val w = b.getInt; val h = b.getInt; val n = b.getInt
    require(w > 0 && h > 0 && n >= 0, s"bad gVID header: ${w}x$h, $n frames")
    require(HeaderLen + 8L * n <= bytes.length, "truncated gVID index")
    (w, h, n)
  }

  /** Seek frame `idx` via the index and REALLY decode it (PNG inflate +
    * unfilter) → (channels, row-major pixels). Rejects a frame whose
    * decoded dims disagree with the container header.
    */
  def decodeFrame(bytes: Array[Byte], idx: Int): (Int, Array[Byte]) = {
    val (w, h, n) = meta(bytes)
    require(idx >= 0 && idx < n, s"frame $idx out of range [0, $n)")
    val b = java.nio.ByteBuffer.wrap(bytes)
    b.position(HeaderLen + 8 * idx)
    val off = b.getInt; val len = b.getInt
    require(off >= HeaderLen + 8 * n && len >= 0 && off.toLong + len <= bytes.length,
      s"bad index entry for frame $idx")
    val (fw, fh, ch, px) = Png.decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
    require(fw == w && fh == h,
      s"frame $idx is ${fw}x$fh but the container declares ${w}x$h")
    (ch, px)
  }
}
