package graft.graph

import graft.canon.ConnectedComponents
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonicalization + node/edge table materialization (SURVEY.md G2-G4,
  * S9-S11).
  *
  * - node identity: stable content hash of the name (`xxhash64`), with
  *   grounded (dictionary) entities placed in a LOWER id band than open-path
  *   candidate entities, so the connected-components keep-lowest-id rule
  *   (the reference's FixDuplicateNodes,
  *   /root/reference/internal/common/neo4j/neo4j.go:386-451) always elects a
  *   grounded representative when one exists.
  * - duplicate canonicalization: equivalence edges between names sharing a
  *   normalized form, closed transitively by ConnectedComponents.
  * - edge materialization: MERGE-by-key semantics (S11: key (src,dst,pred))
  *   as a **two-phase salted aggregation** — per-(key,salt) partial counts +
  *   capped provenance, then final merge — so hub triples at web scale don't
  *   straggle a single reducer or blow memory on collect_list.
  * - cleanup: empty-predicate edges (G3) are filtered upstream; orphan nodes
  *   (G4) dropped with a left-semi join.
  */
object Materialize {

  /** Fixed timestamp — determinism requirement (no wall clock in the plan). */
  val CreatedAt: Column = to_timestamp(lit("2026-01-01 00:00:00"))

  val ProvenanceCap = 24
  val Salts = 16

  def normName(c: Column): Column = lower(regexp_replace(trim(c), " +", " "))

  /** U2 (formatRelationType, kg-enricher/internal/neo4j/neo4j.go:353-365)
    * + lowercase for case-stable predicate parity. */
  def normPred(c: Column): Column = lower(regexp_replace(c, " ", "_"))

  /** 61-bit content hash; grounded band [0, 2^61), candidate band starts at
    * 2^62 — min() picks grounded representatives first. */
  def nodeId(name: Column, grounded: Column): Column =
    (xxhash64(name).bitwiseAND(lit(0x1FFFFFFFFFFFFFFFL))) +
      when(grounded, lit(0L)).otherwise(lit(1L << 62))

  final case class Graph(nodes: DataFrame, edges: DataFrame)

  /** @param linked  (doc_id, span_idx, subj, pred, obj, media_ref, score)
    * @param aliases (alias, canonical, prior)
    */
  def build(spark: SparkSession, linked: DataFrame, aliases: DataFrame): Graph = {
    val canonSet = aliases.select(col("canonical").as("gname")).distinct()

    val names = linked.select(col("subj").as("name"))
      .union(linked.select(col("obj").as("name"))).distinct()
    val withId = names
      .join(broadcast(canonSet), col("name") === col("gname"), "left")
      .withColumn("grounded", col("gname").isNotNull).drop("gname")
      .withColumn("node_id", nodeId(col("name"), col("grounded")))
      .localCheckpoint()

    // equivalence edges: same normalized name → star to the group min id;
    // ConnectedComponents closes transitive chains (e.g. via future linker
    // same-entity verdicts) and keeps the lowest id per component.
    val grp = withId.groupBy(normName(col("name")).as("nk"))
      .agg(min(col("node_id")).as("root"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val eqEdges = withId.withColumn("nk", normName(col("name")))
      .join(grp, "nk")
      .filter(col("node_id") =!= col("root"))
      .select(col("node_id").as("src"), col("root").as("dst"))

    val comp = ConnectedComponents.assign(spark, withId.select("node_id"), eqEdges)
    val canonMap = withId.join(comp, "node_id")
    val repNames = canonMap.filter(col("node_id") === col("component"))
      .select(col("component").as("rep_id"), col("name").as("rep_name"))
    val resolve = canonMap.join(repNames, col("component") === col("rep_id"))
      .select(col("name"), col("rep_id"), col("rep_name"))
      .localCheckpoint() // small: one row per distinct raw name

    // remap endpoints to canonical representatives (broadcast: name dictionary)
    val subjMap = resolve.select(col("name").as("subj"),
      col("rep_id").as("src_id"), col("rep_name").as("subj_name"))
    val objMap = resolve.select(col("name").as("obj"),
      col("rep_id").as("dst_id"), col("rep_name").as("obj_name"))
    val remapped = linked
      .join(broadcast(subjMap), Seq("subj"))
      .join(broadcast(objMap), Seq("obj"))

    // two-phase salted MERGE (S11): (key, salt) partials → key merge
    val partial = remapped
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(Salts)))
      .groupBy(col("src_id"), col("dst_id"), col("pred"), col("salt"))
      .agg(count(lit(1)).as("cnt"), sum(col("score")).as("score_sum"),
        slice(collect_list(struct(col("doc_id"), col("span_idx"), col("media_ref"))),
          1, ProvenanceCap / 4).as("prov_part"))
    val edges = partial
      .groupBy(col("src_id"), col("dst_id"), col("pred"))
      .agg(sum(col("cnt")).as("n_obs"), sum(col("score_sum")).as("score_sum"),
        slice(flatten(collect_list(col("prov_part"))), 1, ProvenanceCap).as("provenance"))
      .withColumn("pred_norm", normPred(col("pred")))
      .withColumn("strength", round(col("score_sum") / col("n_obs"), 6))
      .withColumn("created_at", CreatedAt)
      .select("src_id", "dst_id", "pred", "pred_norm", "strength", "n_obs",
        "provenance", "created_at")

    // nodes = component representatives; G4: drop orphans (degree 0)
    val touched = edges.select(col("src_id").as("node_id"))
      .union(edges.select(col("dst_id").as("node_id"))).distinct()
    val nodes = repNames
      .select(col("rep_id").as("node_id"), col("rep_name").as("name"),
        col("rep_name").as("canonical_name"))
      .withColumn("created_at", CreatedAt)
      .join(touched, Seq("node_id"), "left_semi")

    Graph(nodes, edges)
  }

  /** The canonical triple read used for P/R comparison (F6 — mirrors
    * RETURN a.name, r.type, b.name;
    * /root/reference/kg-builder/internal/neo4j/neo4j.go:253-283). */
  def triplesView(g: Graph): DataFrame = {
    val n1 = g.nodes.select(col("node_id").as("src_id"), col("name").as("subj"))
    val n2 = g.nodes.select(col("node_id").as("dst_id"), col("name").as("obj"))
    g.edges.join(broadcast(n1), "src_id").join(broadcast(n2), "dst_id")
      .select(col("subj"), col("pred_norm"), col("obj")).distinct()
  }
}
