package graft

import graft.media.MediaFeatures
import org.apache.spark.sql.functions._

/** Multimodal plumbing units: the decoder is honestly stubbed, the resize /
  * frame-sample PLANS (the Spark-side arithmetic a decode stage consumes)
  * are exact and engine-reproducible. */
class MediaSpec extends SparkSuite {
  import spark.implicits._

  private def media(rows: (String, Int, Int, Int)*) =
    rows.toDF("media_ref", "width", "height", "duration_ds")

  test("resizePlan: aspect-preserving box fit with floor semantics and min-1 guard") {
    val r = MediaFeatures.resizePlan(media(
        ("wide", 1920, 1080, 0),   // 16:9 into 640x360 → exact
        ("tall", 100, 1000, 0),    // height-bound → out_h 360, out_w 36
        ("sliver", 1, 10000, 0),   // floor(1*360/10000)=0 → guarded to 1
        ("tiny", 10, 10, 0)        // square → width-bound → 640x640? no: 10*360 >= 10*640 false → out_h=360, out_w=360
      ), 640, 360)
      .select("media_ref", "out_w", "out_h", "out_bytes")
      .as[(String, Int, Int, Long)].collect().map(t => t._1 -> t).toMap
    assert(r("wide") == ("wide", 640, 360, 640L * 360 * 3))
    assert(r("tall") == ("tall", 36, 360, 36L * 360 * 3))
    assert(r("sliver") == ("sliver", 1, 360, 1L * 360 * 3))
    assert(r("tiny") == ("tiny", 360, 360, 360L * 360 * 3))
  }

  test("frameSample: k evenly spaced deciseconds, floor grid") {
    val f = MediaFeatures.frameSample(media(("v", 0, 0, 100)), 4)
      .select("frame_idx", "ts_ds").as[(Int, Int)].collect().toSet
    assert(f == Set((0, 0), (1, 25), (2, 50), (3, 75)))
  }

  test("mediaTable: one row per distinct media_ref with bounded intrinsics") {
    val docs = Fixtures.docsFlat(spark, "/root/testdata/sf0.001")
    val m = MediaFeatures.mediaTable(docs)
    assert(m.count() == m.select("media_ref").distinct().count())
    val bad = m.filter(col("width") < 256 || col("width") > 2303 ||
      col("height") < 144 || col("height") > 1167 ||
      col("duration_ds") < 10 || col("duration_ds") > 3609)
    assert(bad.isEmpty)
  }
}
