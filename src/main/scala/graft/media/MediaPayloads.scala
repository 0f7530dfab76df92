package graft.media

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic synthetic media payloads for the decode fixture and
  * tests: real PNG/BMP/GIF/JPEG bytes (encoded by the JDK's own writers
  * from LCG-seeded pixel grids), real PCM16 WAV bytes (hand-built RIFF
  * header — byte-deterministic), and garbage rows no codec accepts. No
  * external data, no RNG state outside the per-id LCG — the same id
  * yields the same bytes on any JVM. */
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

  private def wav(id: Long): Array[Byte] = {
    val g = new Lcg(id)
    val n = 120 + (id % 80).toInt
    val samples = Array.fill(n)((g.nextInt(20001) - 10000).toShort)
    wavPcm16(samples, 8000 + 1000 * (id % 5).toInt)
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
    // leading zero bytes: no image/audio magic number starts with 0x00,
    // so neither codec family claims it
    Array.tabulate(96)(i => if (i < 8) 0.toByte else (g.next() & 0xff).toByte)
  }

  val Kinds = Vector("png", "bmp", "gif", "jpg", "agif", "wav", "garbage")

  /** (media_id, payload) for ids 0 until n, cycling through [[Kinds]]. */
  def table(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map { i =>
      val kind = Kinds(i % Kinds.size)
      val bytes = kind match {
        case "wav"     => wav(i.toLong)
        case "agif"    => animatedGif(i.toLong)
        case "garbage" => garbage(i.toLong)
        case imgFmt    => encode(image(i.toLong), imgFmt)
      }
      (f"m$i%04d-$kind", bytes)
    }
}
