package graft

import graft.media.{MediaCodec, MediaFeatures, MediaPayloads}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** Real JDK-codec decode: integer-exact feature math on known pixels,
  * lossless-format agreement, WAV sample math, hostile-bytes fallback, and
  * executor-side == SQL-side fallback parity (the invariant q_media_decode
  * hash-checks at fixture scale). */
class MediaCodecSpec extends SparkSuite {
  import spark.implicits._

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
    out.toByteArray
  }

  private def rgb(pixels: Seq[Seq[Int]]): BufferedImage = {
    val img = new BufferedImage(pixels.head.size, pixels.size,
      BufferedImage.TYPE_INT_RGB)
    for (y <- pixels.indices; x <- pixels(y).indices)
      img.setRGB(x, y, pixels(y)(x))
    img
  }

  test("decodeImage: hand-computed integer features on known 2x2 pixels") {
    // red green / blue white; lumas (299r+587g+114b)/1000 = 76,149,29,255
    val img = rgb(Seq(Seq(0xff0000, 0x00ff00), Seq(0x0000ff, 0xffffff)))
    val f = MediaCodec.decodeImage(encode(img, "png")).get
    // sums: R=G=B=510, L=509, L2=76²+149²+29²+255²=93843, n=4, meanL=127
    assert(f.toSeq == Seq[Float](2, 2, 127500, 127500, 127500, 127250,
      93843 / 4 - 127 * 127, 1000))
  }

  test("decodeImage: PNG, BMP and GIF(<256 colors) agree bit-exactly; JPEG decodes with same dims") {
    val img = rgb(Seq.tabulate(6)(y => Seq.tabulate(9)(x =>
      (x * 37 + y * 11) % 0x1000000)))
    val png = MediaCodec.decodeImage(encode(img, "png")).get
    assert(MediaCodec.decodeImage(encode(img, "bmp")).get.toSeq == png.toSeq)
    assert(MediaCodec.decodeImage(encode(img, "gif")).get.toSeq == png.toSeq)
    val jpg = MediaCodec.decodeImage(encode(img, "jpg")).get
    assert(jpg(0) == 9f && jpg(1) == 6f) // lossy pixels, exact container dims
  }

  test("decodeWav: hand-computed PCM16 features") {
    val bytes = MediaPayloads.wavPcm16(Array[Short](100, -200, 300, 0, -100), 8000)
    val f = MediaCodec.decodeWav(bytes).get
    // meanAbs=700/5, maxAbs=300, sign runs + - + - => 3 crossings (0 skipped)
    assert(f.toSeq == Seq[Float](8000, 1, 5, 16, 140, 300, 3, 0))
    assert(MediaCodec.decodeReal(bytes).get._1 == "wav")
  }

  test("decodeWav: AU and AIFF containers decode through the big-endian branch") {
    import javax.sound.sampled.AudioFileFormat.Type
    val samples = Array[Short](100, -200, 300, 0, -100)
    val wavF = MediaCodec.decodeWav(MediaPayloads.wavPcm16(samples, 8000)).get
    // same PCM through AU (big-endian) and AIFF (big-endian) must yield the
    // SAME features as the little-endian WAV — container-independent decode
    Seq(Type.AU -> "au", Type.AIFF -> "aiff").foreach { case (t, n) =>
      val bytes = MediaPayloads.audioContainer(samples, 8000, t)
      assert(MediaCodec.decodeReal(bytes).get._1 == "wav", n)
      assert(MediaCodec.decodeWav(bytes).get.toSeq == wavF.toSeq, n)
    }
    // hand-computed AU case with a leading zero sample (sets no sign)
    val au = MediaPayloads.audioContainer(Array[Short](0, 5, -5), 8000, Type.AU)
    assert(MediaCodec.decodeWav(au).get.toSeq ==
      Seq[Float](8000, 1, 3, 16, 3, 5, 1, 0))
  }

  test("goldenTable decodes to EXACTLY the hand-computed oracle literals") {
    // the same literal vectors embedded in the q_media_decode_golden oracle
    // SQL (SparkEntry) — if this test and that oracle ever disagree, one of
    // them was edited without the other
    val quad = Seq[Float](2, 2, 127500, 127500, 127500, 127250, 7331, 1000)
    val expected = Map(
      "g00-png2x2"  -> ("img", quad),
      "g01-bmp2x2"  -> ("img", quad),
      // same primaries as a 4×1 row: identical sums, aspect 4000
      "g02-gif4x1"  -> ("img", Seq[Float](4, 1, 127500, 127500, 127500, 127250, 7331, 4000)),
      "g03-gray3x1" -> ("img", Seq[Float](3, 1, 128000, 128000, 128000, 128000, 0, 3000)),
      "g04-wav5"    -> ("wav", Seq[Float](8000, 1, 5, 16, 140, 300, 3, 0)),
      "g05-au3"     -> ("wav", Seq[Float](8000, 1, 3, 16, 3, 5, 1, 0)),
      "g06-aiff4"   -> ("wav", Seq[Float](4000, 1, 4, 16, 1000, 1000, 3, 1)),
      // decodeImage reads the animated golden's FIRST frame = the 4×1 quad
      "g07-agif2f"  -> ("img", Seq[Float](4, 1, 127500, 127500, 127500, 127250, 7331, 4000)),
      // hand-written WBMP white/black//black/white: sums 510 → 127500‰,
      // var ⌊130050/4⌋ − 127² = 16383
      "g08-wbmp2x2" -> ("img", Seq[Float](2, 2, 127500, 127500, 127500, 127500, 16383, 1000)))
    val rows = MediaPayloads.goldenTable
    assert(rows.map(_._1).toSet == expected.keySet)
    rows.foreach { case (id, bytes) =>
      val (fmt, f) = MediaCodec.decodeReal(bytes).get
      assert((fmt, f.toSeq) == expected(id), id)
    }
  }

  test("golden animated GIF: per-frame features match the hand derivations") {
    // the same literal rows embedded in the q_frame_sample_golden oracle —
    // sampleFrames(k=4) over n=2 frames lands src = ⌊i·2/4⌋ = 0,0,1,1;
    // frame 0 = the 4×1 quad, frame 1 = uniform 0x808080 gray
    val bytes = MediaPayloads.goldenTable.toMap.apply("g07-agif2f")
    val Some((n, samples)) = MediaCodec.sampleFrames(bytes, 4)
    assert(n == 2)
    assert(samples.map(s => (s._1, s._2)) == Seq((0, 0), (1, 0), (2, 1), (3, 1)))
    val quadRow = Seq[Float](4, 1, 127500, 127500, 127500, 127250, 7331, 4000)
    val grayRow = Seq[Float](4, 1, 128000, 128000, 128000, 128000, 0, 4000)
    assert(samples(0)._3.toSeq == quadRow)
    assert(samples(1)._3.toSeq == quadRow)
    assert(samples(2)._3.toSeq == grayRow)
    assert(samples(3)._3.toSeq == grayRow)
    // the WBMP golden is a 1-frame sequence through the frames path too
    val wbmp = MediaPayloads.goldenTable.toMap.apply("g08-wbmp2x2")
    val Some((nw, sw)) = MediaCodec.sampleFrames(wbmp, 4)
    assert(nw == 1 && sw.map(_._2) == Seq(0, 0, 0, 0))
    sw.foreach(s => assert(s._3.toSeq ==
      Seq[Float](2, 2, 127500, 127500, 127500, 127500, 16383, 1000)))
  }

  test("golden resize: NN into a 4×4 box matches the hand derivations") {
    // the same literal rows embedded in the q_media_resize_golden oracle.
    // 2×2 quad → 4×4 (each pixel duplicated 2×2: sums ×4, means unchanged,
    // var unchanged, aspect 1000); 4×1 rows fit (4,4) as the identity;
    // 3×1 gray → 4×1 (sx = ⌊x·3/4⌋ = 0,0,1,2 — all gray);
    // 2×2 WBMP → 4×4 duplication (means/var scale-invariant here)
    val g = MediaPayloads.goldenTable.toMap
    def feats(id: String): (Int, Int, Int, Int, Seq[Float]) = {
      val Some((w, h, ow, oh, png)) = MediaCodec.resizeImage(g(id), 4, 4)
      (w, h, ow, oh, MediaCodec.decodeImage(png).get.toSeq.drop(2))
    }
    assert(feats("g00-png2x2") ==
      (2, 2, 4, 4, Seq[Float](127500, 127500, 127500, 127250, 7331, 1000)))
    assert(feats("g01-bmp2x2") ==
      (2, 2, 4, 4, Seq[Float](127500, 127500, 127500, 127250, 7331, 1000)))
    assert(feats("g02-gif4x1") ==
      (4, 1, 4, 1, Seq[Float](127500, 127500, 127500, 127250, 7331, 4000)))
    assert(feats("g03-gray3x1") ==
      (3, 1, 4, 1, Seq[Float](128000, 128000, 128000, 128000, 0, 4000)))
    assert(feats("g07-agif2f") == // resize reads frame 0 (ImageIO.read)
      (4, 1, 4, 1, Seq[Float](127500, 127500, 127500, 127250, 7331, 4000)))
    assert(feats("g08-wbmp2x2") ==
      (2, 2, 4, 4, Seq[Float](127500, 127500, 127500, 127500, 16383, 1000)))
  }

  test("hostile bytes: garbage, empty and null all decode to None, never throw") {
    assert(MediaCodec.decodeReal(Array[Byte](0, 0, 1, 2, 3)).isEmpty)
    assert(MediaCodec.decodeReal(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decodeReal(null).isEmpty)
    // truncated PNG: magic number present, body cut — reader must fail clean
    val png = encode(rgb(Seq(Seq(0x123456))), "png")
    assert(MediaCodec.decodeReal(png.take(12)).isEmpty)
  }

  test("fallbackFeatures matches the SQL fakeFeatureCols expression exactly") {
    val refs = Seq("vid-0001.mp4", "aud-77.opus", "", "日本語.webm")
    val sql = refs.toDF("media_ref")
      .select(Seq(col("media_ref")) ++
        MediaFeatures.fakeFeatureCols(col("media_ref")): _*)
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Int)]
      .collect().map(r => r._1 ->
        Seq(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9).map(_.toFloat)).toMap
    refs.foreach { r =>
      assert(MediaCodec.fallbackFeatures(r).toSeq == sql(r), r)
    }
  }

  test("resizeImage: NN picks exact integer-indexed source pixels") {
    // 4x2 distinct-color source into a 2x1 box → out = src(0,0), src(2,0)
    val img = rgb(Seq(Seq(0x111111, 0x222222, 0x333333, 0x444444),
      Seq(0x555555, 0x666666, 0x777777, 0x888888)))
    val Some((w, h, ow, oh, png)) =
      MediaCodec.resizeImage(encode(img, "png"), 2, 1)
    assert((w, h, ow, oh) == (4, 2, 2, 1))
    val out = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert((out.getRGB(0, 0) & 0xffffff) == 0x111111)
    assert((out.getRGB(1, 0) & 0xffffff) == 0x333333)
  }

  test("fitDims matches the resizePlan SQL floor semantics case-for-case") {
    assert(MediaCodec.fitDims(1920, 1080, 640, 360) == (640, 360))
    assert(MediaCodec.fitDims(100, 1000, 640, 360) == (36, 360))
    assert(MediaCodec.fitDims(1, 10000, 640, 360) == (1, 360))
    assert(MediaCodec.fitDims(10, 10, 640, 360) == (360, 360))
    // and against the column expressions themselves
    val plan = MediaFeatures.resizePlan(
      Seq(("a", 1920, 1080, 0), ("b", 100, 1000, 0), ("c", 8, 6, 0))
        .toDF("media_ref", "width", "height", "duration_ds"), 640, 360)
      .select("media_ref", "out_w", "out_h")
      .as[(String, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(MediaCodec.fitDims(1920, 1080, 640, 360) == plan("a"))
    assert(MediaCodec.fitDims(100, 1000, 640, 360) == plan("b"))
    assert(MediaCodec.fitDims(8, 6, 640, 360) == plan("c")) // upscale path
  }

  test("fallbackDims matches the SQL fakeIntrinsics expression exactly") {
    val refs = Seq("media://abc", "vid.mp4", "")
    val sql = refs.toDF("media_ref")
      .select(Seq(col("media_ref")) ++
        MediaFeatures.fakeIntrinsics(col("media_ref")).take(2): _*)
      .as[(String, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    refs.foreach(r => assert(MediaCodec.fallbackDims(r) == sql(r), r))
  }

  test("resizeImages stage: images really resized, non-images degrade to the md5 plan") {
    val rows = MediaPayloads.table(18) // 2 full kind cycles
    val out = MediaFeatures.resizeImages(rows.toDF("media_id", "payload"), 640, 360)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(out.size == 18)
    assert(out.values.count(_._1 == "img") == 10) // incl. agif (frame 0)
    assert(out.values.count(_._1 == "plan") == 8) // 6 audio + 2 garbage
    out.foreach { case (id, (fmt, w, h, ow, oh)) =>
      assert((ow, oh) == MediaCodec.fitDims(w, h, 640, 360), id)
      if (fmt == "plan") assert((w, h) == MediaCodec.fallbackDims(id), id)
    }
  }

  test("sampleFrames: animated GIF frames sampled on the i*n/k floor grid, per-frame features") {
    // find an agif with n>=4 frames from the payload table
    val (id, bytes) = MediaPayloads.table(28)
      .filter(_._1.endsWith("-agif"))
      .find(p => MediaCodec.sampleFrames(p._2, 1).exists(_._1 >= 4)).get
    val Some((n, samples)) = MediaCodec.sampleFrames(bytes, 4)
    assert(n >= 4 && samples.map(_._1) == Seq(0, 1, 2, 3))
    assert(samples.map(_._2) == (0 until 4).map(i => (i.toLong * n / 4).toInt))
    // distinct frames produce distinct features (LCG pixels), and frame 0's
    // features equal the whole-payload decode (reader frame 0 == ImageIO.read)
    assert(samples.map(_._3.toSeq).distinct.size > 1, id)
    assert(samples.head._3.toSeq == MediaCodec.decodeImage(bytes).get.toSeq)
    // stills are a 1-frame sequence: all samples hit frame 0
    val png = encode(rgb(Seq(Seq(0xabcdef, 0x123456))), "png")
    val Some((n1, s1)) = MediaCodec.sampleFrames(png, 3)
    assert(n1 == 1 && s1.map(_._2) == Seq(0, 0, 0))
    assert(s1.map(_._3.toSeq).distinct.size == 1)
  }

  test("frameSamplesReal stage: k rows per asset, plan fallback uses the SQL ts grid") {
    val rows = MediaPayloads.table(18)
    val out = MediaFeatures.frameSamplesReal(rows.toDF("media_id", "payload"), 4)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        (r.getString(1), r.getInt(2), r.getInt(4))).toMap
    assert(out.size == 18 * 4)
    // plan rows: src_pos is the decisecond grid floor(i*dur/4) of the md5 duration
    out.collect { case ((id, i), ("plan", nf, ts)) =>
      assert(nf == 0, id)
      assert(ts == (i.toLong * MediaCodec.fallbackDurationDs(id) / 4).toInt, id)
    }
    // frames rows: src frame indices within [0, n)
    out.collect { case ((id, _), ("frames", nf, src)) =>
      assert(nf >= 1 && src >= 0 && src < nf, id)
    }
  }

  test("fallbackDurationDs matches the SQL fakeIntrinsics duration column") {
    val refs = Seq("media://abc", "vid.mp4", "x")
    val sql = refs.toDF("media_ref")
      .select(col("media_ref"),
        MediaFeatures.fakeIntrinsics(col("media_ref")).last)
      .as[(String, Int)].collect().toMap
    refs.foreach(r => assert(MediaCodec.fallbackDurationDs(r) == sql(r), r))
  }

  test("decodeFeatures stage: mixed corpus decodes distributed, hostile rows degrade per-row") {
    val rows = MediaPayloads.table(18) // 2 full kind cycles
    val out = MediaFeatures.decodeFeatures(rows.toDF("media_id", "payload"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), (2 to 9).map(r.getFloat))).toMap
    assert(out.size == 18)
    val byFmt = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byFmt == Map("img" -> 10, "wav" -> 6, "fallback" -> 2))
    // fallback rows carry the md5 features of their id (never nulls/zeros)
    out.collect { case (id, ("fallback", f)) =>
      assert(f == MediaCodec.fallbackFeatures(id).toSeq, id)
    }
    // decode is deterministic across invocations (what the fixture
    // expecteds + executor re-decode parity relies on)
    val again = MediaFeatures.decodeFeatures(rows.toDF("media_id", "payload"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), (2 to 9).map(r.getFloat))).toMap
    assert(again == out)
  }
}
