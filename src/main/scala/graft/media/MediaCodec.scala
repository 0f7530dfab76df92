package graft.media

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Real media decode using ONLY codecs the JDK itself ships — no external
  * jars, so it runs in this zero-egress sandbox: `javax.imageio` (PNG,
  * JPEG, BMP, GIF, WBMP) and `javax.sound.sampled` (WAV/AU/AIFF PCM).
  * Container formats the JDK has no codec for (mp4, webp, opus, …) return
  * None and the pipeline falls back to the deterministic md5 stand-in
  * ([[fallbackFeatures]], the scalar twin of
  * [[MediaFeatures.fakeFeatureCols]]), so the stage NEVER throws on hostile
  * bytes — reference behavior: kay-gee-go treats media refs as opaque
  * provenance (/root/reference/kg-builder/internal/models/models.go), so
  * any decode capability here is additive.
  *
  * Every feature is an INTEGER-VALUED float computed with Long floor
  * arithmetic (sums of 8-bit channels / PCM samples) — bit-identical
  * across executors, the driver, and a DuckDB replay of persisted
  * expecteds; no float accumulation order can flake the oracle hash.
  *
  * Scale: decode is a per-row kernel inside `mapPartitions` — map-only, no
  * shuffle, payload bytes never leave their input partition. At 100 TB the
  * binary column rides the corpus scan and features (8 floats) are the
  * only thing that flows downstream.
  */
object MediaCodec {

  import MediaFeatures.FeatureDim

  /** Image → [w, h, meanR‰, meanG‰, meanB‰, meanLuma‰, lumaVar, aspect‰].
    * ‰ = Long-floor `sum*1000/n`; luma = (299r+587g+114b)/1000 per pixel
    * (integer BT.601); var = sumL²/n − (sumL/n)² with floor divisions —
    * a defined deterministic statistic, overflow-safe to gigapixel sizes. */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null || payload.length == 0) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return None
    if (img.getWidth <= 0 || img.getHeight <= 0) return None
    Some(imageFeatures(img))
  }

  /** Channel/luma sums over `getRGB` (sRGB regardless of storage type),
    * all Long floor arithmetic — see [[decodeImage]] for the layout. */
  private def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sumR, sumG, sumB, sumL, sumL2) = (0L, 0L, 0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val l = (299L * r + 587L * g + 114L * b) / 1000L
        sumR += r; sumG += g; sumB += b; sumL += l; sumL2 += l * l
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val meanL = sumL / n
    Array[Float](
      w.toFloat, h.toFloat,
      (sumR * 1000L / n).toFloat, (sumG * 1000L / n).toFloat,
      (sumB * 1000L / n).toFloat, (sumL * 1000L / n).toFloat,
      (sumL2 / n - meanL * meanL).toFloat,
      (w.toLong * 1000L / h).toFloat)
  }

  /** PCM audio (WAV/AU/AIFF via the JDK) → [rate, channels, frames, bits,
    * meanAbs, maxAbs, zeroCrossings, durationMs] over the FIRST channel.
    * 16-bit respects the container's endianness; 8-bit handles
    * signed/unsigned. Non-PCM encodings (μ-law, float) return None. */
  def decodeWav(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null || payload.length == 0) return None
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: Exception => return None }
    try {
      val f = in.getFormat
      val enc = f.getEncoding
      val pcm = enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED
      val bits = f.getSampleSizeInBits
      if (!pcm || (bits != 8 && bits != 16)) return None
      val bytes = in.readAllBytes()
      val frameSize = f.getFrameSize
      val frames = if (frameSize > 0) bytes.length / frameSize else 0
      if (frames == 0) return None
      var (sumAbs, maxAbs, crossings) = (0L, 0L, 0L)
      var prevSign = 0
      var i = 0
      while (i < frames) {
        val off = i * frameSize // first channel sits at frame start
        val s: Int =
          if (bits == 16) {
            val (b0, b1) = (bytes(off) & 0xff, bytes(off + 1) & 0xff)
            val raw = if (f.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
            val signed = raw.toShort.toInt
            if (enc == AudioFormat.Encoding.PCM_UNSIGNED) raw - 32768 else signed
          } else {
            val raw = bytes(off) & 0xff
            if (enc == AudioFormat.Encoding.PCM_UNSIGNED) raw - 128
            else bytes(off).toInt
          }
        sumAbs += math.abs(s.toLong)
        if (math.abs(s.toLong) > maxAbs) maxAbs = math.abs(s.toLong)
        val sign = Integer.signum(s)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
        }
        i += 1
      }
      val rate = f.getSampleRate.toLong
      Some(Array[Float](
        rate.toFloat, f.getChannels.toFloat, frames.toFloat, bits.toFloat,
        (sumAbs / frames).toFloat, maxAbs.toFloat, crossings.toFloat,
        (if (rate > 0) frames.toLong * 1000L / rate else 0L).toFloat))
    } catch { case _: Exception => None } finally in.close()
  }

  /** Try every JDK codec family: ("img", f) | ("wav", f) | None. */
  def decodeReal(payload: Array[Byte]): Option[(String, Array[Float])] =
    decodeImage(payload).map("img" -> _)
      .orElse(decodeWav(payload).map("wav" -> _))

  /** Scalar twin of [[MediaFeatures.fakeFeatureCols]] (ascii of hex digit i
    * of md5(ref)) — the executor-side fallback must hash-match the SQL
    * column expression exactly, and a test pins the parity. */
  def fallbackFeatures(mediaRef: String): Array[Float] = {
    val hex = md5Hex(mediaRef)
    Array.tabulate(FeatureDim)(i => hex.charAt(i).toInt.toFloat)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Scalar twin of [[MediaFeatures.fakeIntrinsics]] (md5-derived fake
    * (width, height) for payload-less refs) — parity-pinned by a test. */
  def fallbackDims(mediaRef: String): (Int, Int) = {
    val hex = md5Hex(mediaRef)
    (Integer.parseInt(hex.substring(0, 4), 16) % 2048 + 256,
      Integer.parseInt(hex.substring(4, 8), 16) % 1024 + 144)
  }

  /** Scalar twin of [[MediaFeatures.fakeIntrinsics]]'s duration column
    * (md5-derived deciseconds) — parity-pinned by a test. */
  def fallbackDurationDs(mediaRef: String): Int =
    Integer.parseInt(md5Hex(mediaRef).substring(8, 12), 16) % 3600 + 10

  /** Real frame sampling for any JDK-decodable image: k evenly spaced
    * source frames (src = i·n/k, the same Long-floor grid as
    * [[MediaFeatures.frameSample]]'s timestamp math), each decoded to its
    * integer-exact feature vector. Animated GIFs expose all frames via
    * `ImageReader.getNumImages`; stills are a 1-frame sequence (every
    * sample hits frame 0). Frames are the reader's raw rasters — full
    * frames for JDK-written GIFs; delta-frame GIFs from foreign encoders
    * yield the raw delta raster, which is still deterministic.
    * Returns (nFrames, Seq((sampleIdx, srcFrame, features))). */
  def sampleFrames(payload: Array[Byte], k: Int)
      : Option[(Int, Seq[(Int, Int, Array[Float])])] = {
    if (payload == null || payload.length == 0 || k <= 0) return None
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      catch { case _: Exception => return None }
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      // decode each DISTINCT source frame once, ascending: k > n repeats
      // sources, and not every JDK reader can re-read a frame (WBMP's
      // re-reads the header from the current stream position and throws
      // EOFException on the second read(0); PNG/GIF happen to rewind).
      // Ascending single reads are the universally supported pattern —
      // and decode work drops to min(k, n) frames.
      val srcs = (0 until k).map(i => (i.toLong * n / k).toInt)
      val features = srcs.distinct.sorted
        .map(s => s -> imageFeatures(reader.read(s))).toMap
      Some((n, srcs.zipWithIndex.map { case (src, i) => (i, src, features(src)) }))
    } catch { case _: Exception => None }
    finally { reader.dispose(); iis.close() }
  }

  /** Aspect-fit output dims with the SAME Long-floor semantics as
    * [[MediaFeatures.resizePlan]]'s column expressions (width-bound iff
    * w·maxH ≥ h·maxW; the other side floor-scales, min 1). */
  def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w.toLong * maxH >= h.toLong * maxW)
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else
      (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** Real pixel resize for any JDK-decodable image: aspect-fit into
    * (maxW, maxH) per [[fitDims]], nearest-neighbor sampling with pure
    * integer source indexing (sx = x·w/outW Long floor — no Graphics2D
    * filtering, so the output bytes are bit-deterministic on any JVM),
    * re-encoded as PNG (lossless JDK writer).
    * Returns (inW, inH, outW, outH, pngBytes). */
  def resizeImage(payload: Array[Byte], maxW: Int, maxH: Int)
      : Option[(Int, Int, Int, Int, Array[Byte])] = {
    if (payload == null || payload.length == 0) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val (w, h) = (img.getWidth, img.getHeight)
    val (ow, oh) = fitDims(w, h, maxW, maxH)
    val out = new java.awt.image.BufferedImage(ow, oh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        out.setRGB(x, y, img.getRGB(sx, sy) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    Some((w, h, ow, oh, bos.toByteArray))
  }
}
