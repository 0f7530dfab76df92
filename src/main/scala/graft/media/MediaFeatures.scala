package graft.media

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media spans are opaque references
  * (`media_ref`, optionally a `binary` payload column) with typed metadata;
  * decode / feature-extraction runs as a batched per-partition stage.
  *
  * The decode step is REAL for every format the JDK itself can read —
  * [[MediaCodec]] drives `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP) and
  * `javax.sound.sampled` (PCM WAV/AU/AIFF) with integer-exact features,
  * and [[decodeFeatures]] runs it distributed over a binary payload
  * column (map-only `mapPartitions`, oracle q_media_decode). Formats with
  * no JDK codec (mp4, webp, opus, …) fall back per row to the
  * deterministic md5 stand-in, which also powers the payload-less
  * metadata queries below ([[fakeFeatureCols]] — engine-reproducible pure
  * SQL functions, so those stages keep DuckDB oracles too).
  */
object MediaFeatures {

  val FeatureDim = 8

  /** Real decoder: bytes → (format, fixed-dim feature vector), None when
    * no JDK codec accepts the payload. See [[MediaCodec.decodeReal]]. */
  def decodeReal(payload: Array[Byte]): Option[(String, Array[Float])] =
    MediaCodec.decodeReal(payload)

  /** Distributed decode over (media_id, payload:binary): per-partition
    * kernel, no shuffle; rows no JDK codec accepts degrade to the md5
    * fallback (fmt = "fallback") instead of failing the stage. Output:
    * (media_id, fmt, f0..f7). At 100 TB this is the pattern for opaque
    * media columns: payload bytes never leave their scan partition, only
    * the 8-float feature row flows downstream. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id").cast("string"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, f) = MediaCodec.decodeReal(bytes)
          .getOrElse(("fallback", MediaCodec.fallbackFeatures(id)))
        (id, fmt, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      })
      .toDF("media_id", "fmt", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
  }

  /** Distributed REAL resize over (media_id, payload:binary): decodable
    * images get actual nearest-neighbor pixel resizing (integer source
    * indexing, PNG re-encode — [[MediaCodec.resizeImage]]) and the output
    * row carries the re-decoded features of the RESIZED image, so the
    * whole decode→resize→re-encode→decode loop is value-checked by the
    * q_media_resize_real oracle. Non-decodable rows degrade to the md5
    * resize PLAN (fake intrinsics through the same fitDims floor math)
    * with fallback features — every row flows, nothing throws. Map-only;
    * resized bytes stay in their partition, only dims + 8 features leave. */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id").cast("string"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaCodec.resizeImage(bytes, maxW, maxH) match {
          case Some((w, h, ow, oh, png)) =>
            val f = MediaCodec.decodeImage(png).getOrElse(
              sys.error(s"re-decode of own PNG failed for $id")) // unreachable
            ("img", id, w, h, ow, oh,
              f(2), f(3), f(4), f(5), f(6), f(7))
          case None =>
            val (w, h) = MediaCodec.fallbackDims(id)
            val (ow, oh) = MediaCodec.fitDims(w, h, maxW, maxH)
            val f = MediaCodec.fallbackFeatures(id)
            ("plan", id, w, h, ow, oh,
              f(2), f(3), f(4), f(5), f(6), f(7))
        }
      })
      .toDF("fmt", "media_id", "in_w", "in_h", "out_w", "out_h",
        "r2", "r3", "r4", "r5", "r6", "r7")
      .select("media_id", "fmt", "in_w", "in_h", "out_w", "out_h",
        "r2", "r3", "r4", "r5", "r6", "r7")
  }

  /** Distributed REAL frame sampling over (media_id, payload:binary): for
    * any JDK-decodable image sequence (animated GIF exposes every frame;
    * stills are a 1-frame sequence) emit k rows sampled on the same
    * Long-floor grid as [[frameSample]] (src = i·n/k), each row carrying
    * the integer-exact features of THAT frame ([[MediaCodec.sampleFrames]]).
    * Non-decodable rows degrade to the decisecond PLAN (md5 duration
    * through the same floor math, src_pos = ts_ds) with fallback features.
    * Map-only; frames never leave their partition. */
  def frameSamplesReal(media: DataFrame, k: Int): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id").cast("string"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        MediaCodec.sampleFrames(bytes, k) match {
          case Some((n, samples)) =>
            samples.map { case (i, src, f) =>
              ("frames", id, n, i, src, f(2), f(3), f(4), f(5), f(6), f(7))
            }
          case None =>
            val dur = MediaCodec.fallbackDurationDs(id)
            val f = MediaCodec.fallbackFeatures(id)
            (0 until k).map { i =>
              ("plan", id, 0, i, (i.toLong * dur / k).toInt,
                f(2), f(3), f(4), f(5), f(6), f(7))
            }
        }
      })
      .toDF("fmt", "media_id", "n_frames", "frame_idx", "src_pos",
        "r2", "r3", "r4", "r5", "r6", "r7")
      .select("media_id", "fmt", "n_frames", "frame_idx", "src_pos",
        "r2", "r3", "r4", "r5", "r6", "r7")
  }

  /** Deterministic stand-in feature: ascii of hex digit i of md5(media_ref)
    * (integers → engine-exact oracle comparison; a real decoder would emit
    * floats through the same column shape). */
  def fakeFeatureCols(ref: Column): Seq[Column] = {
    val h = md5(ref)
    (0 until FeatureDim).map { i =>
      ascii(substring(h, i + 1, 1)).cast("int").as(s"f$i")
    }
  }

  /** Media feature table from the docs corpus: one row per media span.
    * (doc_id, span_idx, media_ref, f0..f7) */
  def extract(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("span_idx", "s")))
      .filter(col("s.kind") === "media")
      .select(Seq(col("doc_id"), col("span_idx"),
        col("s.media_ref").as("media_ref")) ++
        fakeFeatureCols(col("s.media_ref")): _*)

  /** Deterministic fake intrinsic dimensions of a media asset, derived from
    * md5(media_ref): width ∈ [256, 2303], height ∈ [144, 1167], duration
    * deciseconds ∈ [10, 3609]. A real pipeline reads these from container
    * headers; the stand-in keeps the column shapes and value ranges real
    * and engine-reproducible. */
  def fakeIntrinsics(ref: Column): Seq[Column] = {
    val h = md5(ref)
    Seq(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % 2048 + 256).as("width"),
      (conv(substring(h, 5, 4), 16, 10).cast("int") % 1024 + 144).as("height"),
      (conv(substring(h, 9, 4), 16, 10).cast("int") % 3600 + 10).as("duration_ds"))
  }

  /** Resize plumbing: target box fit (aspect-preserving, floor semantics —
    * integer arithmetic only, so any engine reproduces it exactly). The
    * actual pixel work is the decoder's ([[decodeReal]]); this stage
    * computes and carries the resize PLAN (scaled dims + byte estimate)
    * through the pipeline, which is the Spark-side part.
    * Output: (media_ref, width, height, out_w, out_h, out_bytes). */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    // width-constrained iff w·maxH ≥ h·maxW; the other side scales by
    // integer floor division — exact in any engine
    val widthBound = col("width").cast("long") * maxH >= col("height").cast("long") * maxW
    media
      .withColumn("out_w", when(widthBound, lit(maxW)).otherwise(
        greatest(lit(1),
          floor(col("width").cast("long") * maxH / col("height")).cast("int"))))
      .withColumn("out_h", when(widthBound,
        greatest(lit(1),
          floor(col("height").cast("long") * maxW / col("width")).cast("int")))
        .otherwise(lit(maxH)))
      .withColumn("out_bytes", col("out_w").cast("long") * col("out_h") * 3)
      .select("media_ref", "width", "height", "out_w", "out_h", "out_bytes")
  }

  /** Frame sampling plumbing: k evenly spaced frame timestamps per asset
    * (decisecond grid, deterministic floor arithmetic), exploded to one row
    * per sampled frame — the shape a decode stage consumes batch-wise.
    * Output: (media_ref, frame_idx, ts_ds). */
  def frameSample(media: DataFrame, k: Int): DataFrame =
    media
      .select(col("media_ref"), col("duration_ds"),
        explode(sequence(lit(0), lit(k - 1))).as("frame_idx"))
      .withColumn("ts_ds",
        floor(col("frame_idx").cast("long") * col("duration_ds") / k).cast("int"))
      .select("media_ref", "frame_idx", "ts_ds")

  /** Distinct media assets of a corpus with fake intrinsics attached. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(col("s.media_ref").as("media_ref")).distinct()
      .select(Seq(col("media_ref")) ++ fakeIntrinsics(col("media_ref")): _*)

  /** Media nodes + HAS_MEDIA edges for the graph (north_star: media spans as
    * provenance edges): concept → media_ref for every concept extracted from
    * a span whose provenance carries that media_ref. */
  def mediaEdges(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val prov = edges.select(col("src_id"), explode(col("provenance")).as("p"))
      .filter(col("p.media_ref") =!= "")
      .select(col("src_id").as("node_id"), col("p.media_ref").as("media_ref"))
      .distinct()
    prov.join(nodes.select(col("node_id"), col("name")), Seq("node_id"))
      .select(col("node_id"), col("name"), lit("has_media").as("pred_norm"),
        col("media_ref"))
  }
}
