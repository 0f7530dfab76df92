package graft.media

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media spans are opaque references
  * (`media_ref`, optionally a `binary` payload column) with typed metadata;
  * decode / feature-extraction runs as a batched per-partition stage.
  *
  * No image/audio codecs ship in this container, so [[decodeReal]] is a
  * clearly-marked stub (`???`) defining the interface a real decoder would
  * implement, while [[fakeFeatures]] derives a DETERMINISTIC 8-dim feature
  * vector from the md5 of the reference — the Spark-side plumbing (schema,
  * partitioning, column shapes, downstream joins) is real and tested, and
  * the fake is engine-reproducible (pure SQL functions), so the stage has a
  * DuckDB oracle like every other operator.
  */
object MediaFeatures {

  val FeatureDim = 8

  /** Interface for a real decoder: bytes → fixed-dim feature vector.
    * Intentionally unimplemented in this sandbox (no codec libraries). */
  def decodeReal(payload: Array[Byte]): Array[Float] = ???

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
