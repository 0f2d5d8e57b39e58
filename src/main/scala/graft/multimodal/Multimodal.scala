package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY with typed
  * metadata (the Common-Crawl/WARC framing the north-rule table already
  * uses for html).
  *
  * The IMAGE leg decodes REAL bytes: [[Png]] is a standards-conformant
  * pure-JVM PNG codec (zlib inflate + scanline unfilter), see
  * [[Multimodal.pngFeatures]]. Audio/video codec work (MP3/H.264 et al.)
  * needs native libraries that are not in this container, so THOSE decode
  * kernels remain a DETERMINISTIC FAKE (clearly marked below); everything
  * Spark-owned — the schema, the per-partition batch loop, the
  * resource-init-once pattern, the partitioning so one task never holds
  * more than a batch of payloads in memory — is real and tested for all
  * three legs. Swapping `FakeCodec` for a JNI codec changes no plan shape.
  */
object Multimodal {

  /** One media asset. `bytes` stays opaque to Catalyst (BinaryType). */
  final case class Asset(
      asset_id: Long,
      modality: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      source_url: String)

  final case class ImageFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double)

  final case class AudioFeatures(
      asset_id: Long,
      sample_rate: Int,
      n_samples: Long,
      rms: Double)

  /** One sampled video frame (the explode shape: asset → frame rows). */
  final case class VideoFrame(
      asset_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** ======== STUBBED CODEC (deterministic fake, NOT a real decoder) =======
    * A real build links an image/audio library here. The fake reads a
    * 16-byte header we also generate, so tests exercise the full path:
    * bytes → header parse → "decode" → feature computation.
    */
  object FakeCodec {
    /** header: [magic 0xAB, modality, w:2, h:2, ch:1, rate:4, pad...] */
    def encodeImageHeader(assetId: Long, w: Int, h: Int, ch: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + 64)
      b.put(0xAB.toByte); b.put(1.toByte)
      b.putShort(w.toShort); b.putShort(h.toShort); b.put(ch.toByte)
      b.putInt(0); b.put(new Array[Byte](5))
      // deterministic fake pixel payload: px[i] = (id·7 + i) mod 256 —
      // arithmetic (not PRNG) so the DuckDB oracle can recompute mean_luma
      val px = Array.tabulate(64)(i => ((assetId * 7 + i) % 256).toByte)
      b.put(px)
      b.array()
    }

    def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      require(bytes.length >= 16 && bytes(0) == 0xAB.toByte, "bad magic")
      val b = java.nio.ByteBuffer.wrap(bytes)
      b.get(); b.get()
      val w = b.getShort.toInt; val h = b.getShort.toInt; val ch = b.get().toInt
      var luma = 0.0
      var i = 16
      while (i < bytes.length) { luma += (bytes(i) & 0xff); i += 1 }
      (w, h, ch, if (bytes.length > 16) luma / (bytes.length - 16) else 0.0)
    }

    /** header: [magic 0xAB, modality=2, pad:5, rate:4, pad:5]; payload:
      * signed 8-bit samples, sample i = (id·11 + i·3) mod 256 − 128
      * (arithmetic, so the oracle can recompute rms).
      */
    def encodeAudioHeader(assetId: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + nSamples)
      b.put(0xAB.toByte); b.put(2.toByte)
      b.putShort(0); b.putShort(0); b.put(0.toByte)
      b.putInt(sampleRate); b.put(new Array[Byte](5))
      val px = Array.tabulate(nSamples)(i => ((assetId * 11 + i * 3) % 256 - 128).toByte)
      b.put(px)
      b.array()
    }

    /** header: [magic 0xAB, modality=3, w:2, h:2, pad:1, nFrames:4, pad:5];
      * payload: one luma byte per frame, frame f = (id·13 + f·5) mod 256
      * (arithmetic ⇒ oracle-recomputable).
      */
    def encodeVideoHeader(assetId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + nFrames)
      b.put(0xAB.toByte); b.put(3.toByte)
      b.putShort(w.toShort); b.putShort(h.toShort); b.put(0.toByte)
      b.putInt(nFrames); b.put(new Array[Byte](5))
      val px = Array.tabulate(nFrames)(f => ((assetId * 13 + f * 5) % 256).toByte)
      b.put(px)
      b.array()
    }

    /** Sample every `everyK`-th frame: (width, height, Seq(frame_idx, luma)).
      * The real codec would seek keyframes; the CONTRACT exercised here is
      * the Spark-side shape — decode once per asset, emit a row per sampled
      * frame, never materialize all frames.
      */
    def sampleVideoFrames(bytes: Array[Byte], everyK: Int): (Int, Int, Vector[(Int, Int)]) = {
      require(everyK >= 1, s"everyK must be >= 1: $everyK") // 0 would loop forever
      require(bytes.length >= 16 && bytes(0) == 0xAB.toByte && bytes(1) == 3.toByte, "bad magic")
      val b = java.nio.ByteBuffer.wrap(bytes)
      b.position(2)
      val w = b.getShort.toInt; val h = b.getShort.toInt; b.get()
      val nFrames = b.getInt
      val out = Vector.newBuilder[(Int, Int)]
      var f = 0
      while (f < nFrames && 16 + f < bytes.length) {
        out += ((f, bytes(16 + f) & 0xff))
        f += everyK
      }
      (w, h, out.result())
    }

    /** (sampleRate, nSamples, rms of samples normalized to [-1, 1)). */
    def decodeAudio(bytes: Array[Byte]): (Int, Long, Double) = {
      require(bytes.length >= 16 && bytes(0) == 0xAB.toByte && bytes(1) == 2.toByte, "bad magic")
      val b = java.nio.ByteBuffer.wrap(bytes)
      b.position(7)
      val rate = b.getInt
      val n = bytes.length - 16
      var acc = 0.0
      var i = 16
      while (i < bytes.length) {
        val s = bytes(i) / 128.0
        acc += s * s
        i += 1
      }
      (rate, n.toLong, if (n > 0) math.sqrt(acc / n) else 0.0)
    }
  }
  // ======== END STUB =======================================================

  /** Deterministic asset fixture. */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val w = 64 + (i % 8).toInt * 32
      val h = 48 + (i % 5).toInt * 32
      Asset(i, "image", FakeCodec.encodeImageHeader(i, w, h, 3), s"http://src${i % 20}.test/img/$i")
    }
  }

  /** Decode + feature-extract over binary payloads.
    *
    * `mapPartitions` (not a per-row UDF) is deliberate: a real codec has
    * per-task init cost (native context, model weights) — the iterator
    * pattern pays it once per partition, processes rows streaming (never
    * materializing a partition of images), and is the Scala twin of
    * `mapInPandas` batching.
    */
  def imageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "image").mapPartitions { it =>
      // >>> per-partition codec init would go here (once, not per row) <<<
      it.map { a =>
        val (w, h, ch, luma) = FakeCodec.decodeImage(a.bytes)
        ImageFeatures(a.asset_id, w, h, ch, luma)
      }
    }
  }

  /** Audio twin of [[imageFeatures]] — same mapPartitions shape (init-once
    * per task, streaming iterator); video would follow the same pattern
    * with a frame-sampling step and stays stubbed until a codec exists.
    */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "audio").mapPartitions { it =>
      // >>> per-partition codec init would go here (once, not per row) <<<
      it.map { a =>
        val (rate, n, rms) = FakeCodec.decodeAudio(a.bytes)
        AudioFeatures(a.asset_id, rate, n, rms)
      }
    }
  }

  /** Video leg: decode once per asset, FLATMAP a row per sampled frame —
    * the iterator never holds more than one asset's frames, which is the
    * whole point of the shape at 100 TB (a per-row UDF returning an array
    * would materialize every frame of every video in one buffer).
    */
  def videoFrames(assets: Dataset[Asset], everyK: Int = 6): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "video").mapPartitions { it =>
      // >>> per-partition codec init would go here (once, not per row) <<<
      it.flatMap { a =>
        val (w, h, frames) = FakeCodec.sampleVideoFrames(a.bytes, everyK)
        frames.iterator.map { case (f, luma) =>
          VideoFrame(a.asset_id, f, w, h, luma.toDouble)
        }
      }
    }
  }

  /** Feature table joined back to metadata — the end-to-end plumbing shape:
    * binary column pruned away after decode, features carried forward.
    */
  def featureTable(assets: Dataset[Asset]): DataFrame =
    imageFeatures(assets).toDF()
      .join(assets.toDF().select(col("asset_id"), col("source_url")), "asset_id")

  // ---------- REAL image decode (graft.multimodal.Png) ----------------------

  final case class PngFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_luma: Double,
      mean_luma8: Double)

  /** REAL image decode — [[Png]] is a genuine zlib-inflate + scanline
    * unfilter, not the FakeCodec header trick: the bytes are standards-
    * conformant PNG streams. Features: `mean_luma` = full-image mean of the
    * first channel; `mean_luma8` = mean of the top-left 8×8 block, a value
    * that depends on the row STRIDE — a decoder that mis-unfilters or
    * mis-strides cannot reproduce it. Same init-once `mapPartitions`
    * streaming shape as the fake path (swapping codecs changes no plan).
    */
  def pngFeatures(assets: Dataset[Asset]): Dataset[PngFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.modality == "image").mapPartitions { it =>
      // >>> per-partition codec init would go here (once, not per row) <<<
      it.map { a =>
        val (w, h, ch, px) = Png.decode(a.bytes)
        var sum = 0.0
        var i = 0
        val n = w.toLong * h
        while (i < n) { sum += px(i.toInt * ch) & 0xff; i += 1 }
        var sum8 = 0.0
        val w8 = math.min(8, w); val h8 = math.min(8, h)
        var y = 0
        while (y < h8) {
          var x = 0
          while (x < w8) { sum8 += px((y * w + x) * ch) & 0xff; x += 1 }
          y += 1
        }
        PngFeatures(a.asset_id, w, h, ch,
          if (n > 0) sum / n else 0.0,
          if (w8 * h8 > 0) sum8 / (w8 * h8) else 0.0)
      }
    }
  }
}
