package graft.media

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic synthetic media payloads for the decode fixture and
  * tests: real PNG/BMP/GIF/JPEG bytes (encoded by the JDK's own writers
  * from LCG-seeded pixel grids), real PCM16 audio in WAV (hand-built
  * RIFF header — byte-deterministic), AU and AIFF containers (JDK
  * javax.sound writers, exercising the big-endian decode branch), and
  * garbage rows no codec accepts. No external data, no RNG state outside
  * the per-id LCG — the same id yields the same bytes on any JVM. */
object MediaPayloads {

  /** Per-id 64-bit LCG (Knuth MMIX constants). */
  private final class Lcg(seed: Long) {
    private var s = seed * 0x9e3779b97f4a7c15L + 0x2545f4914f6cdd1dL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = (((next() >>> 33) % bound).toInt + bound) % bound
  }

  private def image(id: Long): BufferedImage = {
    val g = new Lcg(id)
    val w = 8 + (id % 9).toInt
    val h = 6 + (id % 7).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, g.nextInt(1 << 24))
        x += 1
      }
      y += 1
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  /** Minimal RIFF/WAVE container around PCM16 little-endian mono. */
  def wavPcm16(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def lcgSamples(id: Long): (Array[Short], Int) = {
    val g = new Lcg(id)
    val n = 120 + (id % 80).toInt
    (Array.fill(n)((g.nextInt(20001) - 10000).toShort),
      8000 + 1000 * (id % 5).toInt)
  }

  private def wav(id: Long): Array[Byte] = {
    val (samples, rate) = lcgSamples(id)
    wavPcm16(samples, rate)
  }

  /** PCM16 samples in an AU or AIFF container via the JDK's own
    * javax.sound file writers (both store big-endian PCM16 — the
    * endianness branch of MediaCodec.decodeWav that WAV never takes). */
  def audioContainer(samples: Array[Short], rate: Int,
      fileType: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, true) // big-endian mono
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) >> 8).toByte
      bytes(2 * i + 1) = samples(i).toByte
      i += 1
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, fileType, out)
    out.toByteArray
  }

  private def au(id: Long): Array[Byte] = {
    val (samples, rate) = lcgSamples(id)
    audioContainer(samples, rate, javax.sound.sampled.AudioFileFormat.Type.AU)
  }

  private def aiff(id: Long): Array[Byte] = {
    val (samples, rate) = lcgSamples(id)
    audioContainer(samples, rate, javax.sound.sampled.AudioFileFormat.Type.AIFF)
  }

  /** Animated GIF via the JDK writer's sequence API: 3-7 full-size frames
    * of LCG pixels (≤256 distinct colors per frame at these sizes, so the
    * GIF palette is lossless). */
  private def animatedGif(id: Long): Array[Byte] = {
    val g = new Lcg(id)
    val w = 6 + (id % 5).toInt
    val h = 5 + (id % 4).toInt
    val frames = 3 + (id % 5).toInt
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, g.nextInt(1 << 24)); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def garbage(id: Long): Array[Byte] = {
    val g = new Lcg(id)
    // leading 0xDE bytes: no registered JDK reader's magic starts with
    // 0xDE (images: 0x89PNG / FFD8 JPEG / "GIF" / "BM" / II*,MM* TIFF /
    // 0x00 0x00 WBMP; audio: "RIFF" / ".snd" / "FORM"). NOTE the WBMP
    // magic IS 0x00 0x00 — an earlier revision used zero bytes here and
    // was only rejected because WBMP's width byte was also 0, an accident
    // this prefix doesn't depend on
    Array.tabulate(96)(i => if (i < 8) 0xde.toByte else (g.next() & 0xff).toByte)
  }

  /** Single indexed-palette row (4×1-style): TYPE_BYTE_INDEXED with a
    * palette of exactly the distinct pixel colors — the GIF writer then
    * stores the palette verbatim instead of quantizing, and a 1-pixel-high
    * raster dodges the JDK writer's LZW edge bug (see goldenTable). */
  def indexedRow(pixels: Seq[Int]): BufferedImage = {
    val pal = pixels.distinct.toArray
    val icm = new java.awt.image.IndexColorModel(8, pal.length,
      pal.map(c => ((c >> 16) & 0xff).toByte),
      pal.map(c => ((c >> 8) & 0xff).toByte),
      pal.map(c => (c & 0xff).toByte))
    val img = new BufferedImage(pixels.size, 1,
      BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (x <- pixels.indices) img.setRGB(x, 0, pixels(x))
    img
  }

  /** Animated GIF from explicit frames via the JDK writer's sequence API
    * (the per-id [[animatedGif]] uses the same calls over LCG pixels). */
  def animatedFrom(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Image from an explicit pixel grid (row-major 0xRRGGBB). */
  def rgbImage(pixels: Seq[Seq[Int]]): BufferedImage = {
    val img = new BufferedImage(pixels.head.size, pixels.size,
      BufferedImage.TYPE_INT_RGB)
    for (y <- pixels.indices; x <- pixels(y).indices)
      img.setRGB(x, y, pixels(y)(x))
    img
  }

  /** HAND-VERIFIABLE golden payloads: tiny images and PCM clips whose
    * integer-exact features are small enough to derive on paper. Their
    * expected feature vectors are embedded as LITERAL rows in the
    * q_media_decode_golden oracle SQL (SparkEntry) — decode ground truth
    * independent of [[MediaCodec]] itself, unlike the `media_codec`
    * fixture whose expecteds are driver-precomputed by the same code the
    * executors run. Worked expectations (see MediaCodec.decodeImage /
    * decodeWav for the formulas):
    *
    *  - red/green/blue/white, lumas (299r+587g+114b)/1000 =
    *    76/149/29/255: channel sums all 510 → mean‰ 127500; sumL=509 →
    *    127250; var = ⌊93843/4⌋ − 127² = 7331 — as a 2×2 (aspect 1000)
    *    encoded PNG and BMP, and as a 4×1 row (aspect 4000) encoded GIF;
    *    all lossless, so ONE hand derivation checks three decoder paths
    *    bit-exactly;
    *  - 3×1 mid-gray 0x808080: luma exactly 128 → means 128000, var 0,
    *    aspect 3000;
    *  - WAV PCM16 [100,-200,300,0,-100] @8000 Hz: meanAbs ⌊700/5⌋=140,
    *    maxAbs 300, crossings (+,−,+,−; 0 skipped) = 3, durMs 0;
    *  - AU PCM16 [0,5,-5] @8000 Hz: meanAbs ⌊10/3⌋=3, maxAbs 5,
    *    crossings 1, durMs 0 (leading zero sample sets no sign);
    *  - AIFF PCM16 [1000,-1000,1000,-1000] @4000 Hz: meanAbs 1000,
    *    maxAbs 1000, crossings 3, durMs ⌊4000/4000⌋=1;
    *  - 2-FRAME animated GIF, both frames explicitly indexed 4×1 rows
    *    (same LZW-bug dodge as g02): frame 0 = the four primaries
    *    (features identical to g02's derivation), frame 1 = uniform
    *    0x808080 gray (lumas all exactly 128 → means 128000, var 0,
    *    aspect 4000). decodeImage reads frame 0; sampleFrames(k=4) over
    *    n=2 lands src = ⌊i·2/4⌋ = 0,0,1,1 — per-frame ground truth for
    *    q_frame_sample_golden;
    *  - HAND-WRITTEN 6-byte WBMP (type 0, fixed-header 0, uintvar
    *    width=2 height=2 — values <128 are single bytes — then
    *    MSB-first bit rows 0b10000000, 0b01000000): pixels white/black //
    *    black/white, 1 = white per the WBMP spec. Lumas 255/0/0/255:
    *    channel sums 510 → 127500‰ each, sumL 510 → 127500,
    *    var ⌊130050/4⌋ − 127² = 32512 − 16129 = 16383, aspect 1000 —
    *    exercises the one JDK image codec no other fixture row hits. */
  def goldenTable: Seq[(String, Array[Byte])] = {
    import javax.sound.sampled.AudioFileFormat.Type
    val quadPal = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val quad = rgbImage(Seq(Seq(0xff0000, 0x00ff00), Seq(0x0000ff, 0xffffff)))
    // the GIF golden is the SAME four primaries as a 4×1 row through an
    // EXPLICITLY indexed image: the JDK GIF writer quantizes TYPE_INT_RGB
    // input to an approximate palette (the primaries come back wrong), and
    // even pre-indexed 2×2/4×4 rasters hit a writer LZW edge bug (pixels
    // 2,3 decode as palette entry 0) — the 4×1 row round-trips exactly,
    // and every hand-derived sum is identical to the 2×2 (only the aspect
    // feature differs: 4000 not 1000)
    val quadIdx = {
      val icm = new java.awt.image.IndexColorModel(8, quadPal.length,
        quadPal.map(c => ((c >> 16) & 0xff).toByte),
        quadPal.map(c => ((c >> 8) & 0xff).toByte),
        quadPal.map(c => (c & 0xff).toByte))
      val img = new BufferedImage(4, 1, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (x <- 0 until 4) img.setRGB(x, 0, quadPal(x))
      img
    }
    val gray = rgbImage(Seq(Seq(0x808080, 0x808080, 0x808080)))
    val agif2 = animatedFrom(Seq(
      indexedRow(quadPal.toSeq),
      indexedRow(Seq(0x808080, 0x808080, 0x808080, 0x808080))))
    val wbmp = Array[Byte](0x00, 0x00, 0x02, 0x02, 0x80.toByte, 0x40)
    Seq(
      "g00-png2x2"  -> encode(quad, "png"),
      "g01-bmp2x2"  -> encode(quad, "bmp"),
      "g02-gif4x1"  -> encode(quadIdx, "gif"),
      "g03-gray3x1" -> encode(gray, "png"),
      "g04-wav5"    -> wavPcm16(Array[Short](100, -200, 300, 0, -100), 8000),
      "g05-au3"     -> audioContainer(Array[Short](0, 5, -5), 8000, Type.AU),
      "g06-aiff4"   ->
        audioContainer(Array[Short](1000, -1000, 1000, -1000), 4000, Type.AIFF),
      "g07-agif2f"  -> agif2,
      "g08-wbmp2x2" -> wbmp)
  }

  val Kinds =
    Vector("png", "bmp", "gif", "jpg", "agif", "wav", "au", "aiff", "garbage")

  /** (media_id, payload) for ids 0 until n, cycling through [[Kinds]]. */
  def table(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map { i =>
      val kind = Kinds(i % Kinds.size)
      val bytes = kind match {
        case "wav"     => wav(i.toLong)
        case "au"      => au(i.toLong)
        case "aiff"    => aiff(i.toLong)
        case "agif"    => animatedGif(i.toLong)
        case "garbage" => garbage(i.toLong)
        case imgFmt    => encode(image(i.toLong), imgFmt)
      }
      (f"m$i%04d-$kind", bytes)
    }
}
