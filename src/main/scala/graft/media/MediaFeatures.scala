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
