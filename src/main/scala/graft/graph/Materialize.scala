package graft.graph

import graft.canon.ConnectedComponents
import graft.functions.BoundedCollectList.bounded_collect_list
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
  *   normalized form, closed transitively — iterative DataFrame CC at scale,
  *   driver union-find when the equivalence set is dictionary-sized.
  * - edge materialization: MERGE-by-key semantics (S11: key (src,dst,pred))
  *   as ONE hash aggregate whose per-group state is bounded: count/sum are
  *   map-side combined, and provenance exemplars use the custom
  *   [[graft.functions.BoundedCollectList]] aggregate, so hub edges at web
  *   scale can't blow an aggregation buffer or skew a reducer with giant
  *   arrays (the buffer is capped on the map side too).
  * - cleanup: empty-predicate edges (G3) are filtered upstream; orphan nodes
  *   (G4) dropped with a left-semi join against the materialized edges.
  */
object Materialize {

  /** Fixed timestamp — determinism requirement (no wall clock in the plan). */
  val CreatedAt: Column = to_timestamp(lit("2026-01-01 00:00:00"))

  val ProvenanceCap = 24

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

  /** The canonicalization map: one row per distinct raw name →
    * (name, rep_id, rep_name). Small (dictionary-scale), localCheckpointed. */
  def canonicalize(spark: SparkSession, linked: DataFrame, aliases: DataFrame): DataFrame = {
    val canonSet = aliases.select(col("canonical").as("gname")).distinct()

    // one scan: both endpoint columns exploded together
    val names = linked
      .select(explode(array(col("subj"), col("obj"))).as("name")).distinct()
    val withId = names
      .join(broadcast(canonSet), col("name") === col("gname"), "left")
      .withColumn("grounded", col("gname").isNotNull).drop("gname")
      .withColumn("node_id", nodeId(col("name"), col("grounded")))
      .localCheckpoint()

    // equivalence edges: same normalized name → star to the group min id;
    // transitive closure (e.g. future linker same-entity verdicts) via CC.
    val grp = withId.groupBy(normName(col("name")).as("nk"))
      .agg(min(col("node_id")).as("root"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val eqEdges = withId.withColumn("nk", normName(col("name")))
      .join(grp, "nk")
      .filter(col("node_id") =!= col("root"))
      .select(col("node_id").as("src"), col("root").as("dst"))

    // the iterative DataFrame CC is the scale path; a dictionary-sized
    // equivalence set (the common case) collapses on the driver instead of
    // paying several shuffle rounds of scheduler latency.
    val eqLocal = eqEdges.limit(10001).collect()
    val comp =
      if (eqLocal.length <= 10000) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        eqLocal.foreach { r =>
          val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
          if (a != b) parent(math.max(a, b)) = math.min(a, b)
        }
        import spark.implicits._
        val mapping = parent.keys.map(k => (k, find(k))).toSeq.toDF("node_id", "component")
        withId.select("node_id").join(broadcast(mapping), Seq("node_id"), "left")
          .select(col("node_id"), coalesce(col("component"), col("node_id")).as("component"))
      } else ConnectedComponents.assign(spark, withId.select("node_id"), eqEdges)

    val canonMap = withId.join(comp, "node_id")
    val repNames = canonMap.filter(col("node_id") === col("component"))
      .select(col("component").as("rep_id"), col("name").as("rep_name"))
    canonMap.join(repNames, col("component") === col("rep_id"))
      .select(col("name"), col("rep_id"), col("rep_name"))
      .localCheckpoint() // small: one row per distinct raw name
  }

  /** Edge materialization: remap endpoints through the (broadcast) resolve
    * map, then a single bounded hash aggregate per (src,dst,pred).
    *
    * `description` mirrors the reference's relationship Description with
    * MERGE-on-create semantics (ON CREATE SET r.description,
    * /root/reference/internal/common/neo4j/neo4j.go:107-151): the canonical
    * sentence rendering "<rep subj> <pred verbatim> <rep obj>". The key
    * fixes all three parts, so it is constant per edge and any later merge
    * keeps it unchanged — exactly "first writer wins", batch-deterministic. */
  def buildEdges(linked: DataFrame, resolve: DataFrame): DataFrame =
    buildEdgesAgg(preAggregate(linked), resolve)

  /** Stage A of edge materialization: collapse the corpus-sized linked
    * stream to ONE row per raw (subj, pred, obj) in a single bounded hash
    * aggregate — the only job that touches corpus-scale data. Distinct raw
    * triples are dictionary-bounded (surface variants × golden triples), so
    * the output is tiny regardless of corpus size; partial aggregation means
    * the shuffle moves ≤ (#keys × #partitions) combined rows, never the
    * corpus. Run this in the SAME job as extraction+linking (they are all
    * narrow maps/broadcast joins above it) and the whole pipeline is one
    * scan. */
  def preAggregate(linked: DataFrame): DataFrame =
    linked
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("score")).as("score_sum"),
        bounded_collect_list(
          struct(col("doc_id"), col("span_idx"), col("media_ref")),
          ProvenanceCap).as("provenance"))

  /** Stage A without per-row linking (r07, guide §8 "decide with small
    * rows"): when no alias is ambiguous, the canonical endpoint and its
    * score are pure functions of the raw surface string — so the
    * corpus-scale stream is FIRST collapsed to one row per distinct raw
    * (subj, pred, obj) (count + bounded provenance exemplars), and the
    * broadcast alias joins + the validName candidate gate then run on the
    * dictionary-scale aggregate instead of per corpus row. Output is
    * row-identical to `preAggregate(EntityLink.link(...))`:
    *  - n_obs: raw-surface groups partition each canonical group, so the
    *    counts sum exactly;
    *  - provenance: the K smallest of a union of per-group K-smallest sets
    *    is the K smallest of the union (each (doc_id, span_idx) appears in
    *    exactly one raw group);
    *  - score_sum: the score is constant within a raw group, so
    *    Σ_rows score = n·score per group (the summation-order FP wiggle is
    *    absorbed by the round(…,6) that already guards the distributed
    *    partial-sum order downstream).
    * `rawValid` must already carry the validPred filter. */
  def preAggregateBySurface(rawValid: DataFrame, aliases: DataFrame): DataFrame = {
    val surfAgg = rawValid
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(
        count(lit(1)).as("n0"),
        bounded_collect_list(
          struct(col("doc_id"), col("span_idx"), col("media_ref")),
          ProvenanceCap).as("prov0"))
    graft.link.EntityLink.linkAggregated(surfAgg, aliases)
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(
        // coalesce only to pin the non-nullable schema count(1) had — the
        // sum over a group is never actually null
        coalesce(sum(col("n0")), lit(0L)).as("n_obs"),
        sum(col("n0") * col("score")).as("score_sum"),
        slice(sort_array(flatten(collect_list(col("prov0")))), 1, ProvenanceCap)
          .as("provenance"))
  }

  /** Stage B: canonical MERGE on the dictionary-scale pre-aggregate —
    * endpoint remap through the broadcast resolve map, then the final
    * (src,dst,pred) merge. Provenance exemplars from the variant groups are
    * merged sorted-then-capped, so the kept set is deterministic (the
    * ProvenanceCap smallest (doc_id, span_idx) entries); the collect_list
    * here buffers at most #variant-groups × ProvenanceCap structs per edge
    * on dictionary-scale data. */
  def buildEdgesAgg(preAgg: DataFrame, resolve: DataFrame): DataFrame = {
    val subjMap = resolve.select(col("name").as("subj"),
      col("rep_id").as("src_id"), col("rep_name").as("src_name"))
    val objMap = resolve.select(col("name").as("obj"),
      col("rep_id").as("dst_id"), col("rep_name").as("dst_name"))
    preAgg
      .join(broadcast(subjMap), Seq("subj"))
      .join(broadcast(objMap), Seq("obj"))
      .withColumn("desc",
        concat_ws(" ", col("src_name"), col("pred"), col("dst_name")))
      .groupBy(col("src_id"), col("dst_id"), col("pred"))
      .agg(
        sum(col("n_obs")).as("n_obs"),
        sum(col("score_sum")).as("score_sum"),
        min(col("desc")).as("description"),
        slice(sort_array(flatten(collect_list(col("provenance")))), 1, ProvenanceCap)
          .as("provenance"))
      .withColumn("pred_norm", normPred(col("pred")))
      .withColumn("strength", round(col("score_sum") / col("n_obs"), 6))
      .withColumn("created_at", CreatedAt)
      .select("src_id", "dst_id", "pred", "pred_norm", "strength", "n_obs",
        "description", "provenance", "created_at")
  }

  /** Node table from component representatives; G4 orphan drop against the
    * MATERIALIZED edges (no recompute of the edge aggregate).
    *
    * Node `description` = the lexicographically-first evidence sentence
    * among the node's incident edges (the reference's Concept.Description
    * is LLM-authored; a deterministic MERGE-on-create analog needs a stable
    * pick order, and evidence order is engine-reproducible). */
  def buildNodes(resolve: DataFrame, edgesT: DataFrame): DataFrame = {
    val incident = edgesT.select(col("src_id").as("node_id"), col("description"))
      .unionAll(edgesT.select(col("dst_id").as("node_id"), col("description")))
    val descs = incident.groupBy("node_id").agg(min("description").as("description"))
    resolve.select(col("rep_id").as("node_id"), col("rep_name").as("name"))
      .distinct()
      .withColumn("canonical_name", col("name"))
      .withColumn("created_at", CreatedAt)
      // inner join = G4 orphan drop (descs only holds edge-touched nodes)
      // and description attach in one pass
      .join(descs, Seq("node_id"))
      .select("node_id", "name", "canonical_name", "description", "created_at")
  }

  /** Legacy single-call build (tests / small corpora). */
  def build(spark: SparkSession, linked: DataFrame, aliases: DataFrame): Graph = {
    val resolve = canonicalize(spark, linked, aliases)
    val edges = buildEdges(linked, resolve).localCheckpoint()
    Graph(buildNodes(resolve, edges), edges)
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
