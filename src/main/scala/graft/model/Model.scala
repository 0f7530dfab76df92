package graft.model

import org.apache.spark.sql.types._

/** Core case classes of the KG-construction pipeline.
  *
  * Input shape is exactly BASELINE.json:input_hint —
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`.
  * The triple IR mirrors the reference's `Concept{Name, Relation, RelatedTo}`
  * (/root/reference/kg-builder/internal/models/models.go:3-7) with provenance
  * columns added (the reference's provenance is implicit in its LLM cache keys).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** One dictionary hit inside a text span (reference grounds names via the LLM;
  * we ground via Aho-Corasick dictionary matching, SURVEY.md X4). */
final case class Mention(
    doc_id: String,
    span_idx: Int,
    start: Int,
    end: Int,
    surface: String,
    canonical_hint: String)

/** One raw extraction: surfaces not yet linked to canonical entities.
  * `grounded` = surface came from a dictionary mention (skip name-validity);
  * open-path candidates (grounded=false) face the full isValidConcept gate
  * (/root/reference/kg-builder/internal/graph/graph.go:225-265). */
final case class RawTriple(
    doc_id: String,
    span_idx: Int,
    subj: String,
    pred: String,
    obj: String,
    subj_grounded: Boolean,
    obj_grounded: Boolean,
    media_ref: String,
    conf: Double)

/** Fully linked triple: endpoints are canonical entity names. */
final case class LinkedTriple(
    doc_id: String,
    span_idx: Int,
    subj: String,
    pred: String,
    obj: String,
    media_ref: String,
    score: Double)

final case class ProvenanceRef(doc_id: String, span_idx: Int, media_ref: String)

object Schemas {
  val span: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  val doc: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(span, containsNull = false), nullable = false)))

  /** nodes(node_id, name, canonical_name, created_at) — mirrors the reference's
    * `(:Concept {name})` plus the rich-node fields
    * (/root/reference/internal/common/models/models.go:8-13). */
  val nodes: StructType = StructType(Seq(
    StructField("node_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("canonical_name", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  val edges: StructType = StructType(Seq(
    StructField("src_id", LongType, nullable = false),
    StructField("dst_id", LongType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("pred_norm", StringType, nullable = false),
    StructField("strength", DoubleType, nullable = false),
    StructField("provenance", ArrayType(StructType(Seq(
      StructField("doc_id", StringType), StructField("span_idx", IntegerType),
      StructField("media_ref", StringType))), containsNull = false)),
    StructField("created_at", TimestampType, nullable = false)))
}
