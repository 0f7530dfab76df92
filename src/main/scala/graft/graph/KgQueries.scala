package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's read/ops API re-expressed as one-line DataFrame queries
  * (SURVEY.md §3.3): frontend handlers
  * (/root/reference/kg-frontend/src/handlers/{graph,statistics,concepts}.go),
  * builder statistics (kg-builder/cmd/kg-builder/main.go:178-193) and the
  * enricher's candidate-pair generation
  * (kg-enricher/internal/neo4j/neo4j.go:304-350).
  *
  * All "random" sampling is hash-ordered (md5) instead of ORDER BY rand():
  * deterministic across engines and runs — the seeded-rand requirement.
  */
object KgQueries {

  /** F5: concept-name projection (RETURN c.name). */
  def conceptNames(nodes: DataFrame): DataFrame =
    nodes.select(col("canonical_name").as("name")).distinct().orderBy("name")

  /** F7: substring search, LIMIT 10 (ordered for determinism). */
  def search(nodes: DataFrame, q: String, limit: Int = 10): DataFrame =
    nodes.filter(col("name").contains(q)).select("name")
      .orderBy("name").limit(limit)

  /** A1: graph statistics (node count, relationship count). */
  def statistics(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val n = nodes.agg(count(lit(1)).as("node_count"))
    val e = edges.agg(count(lit(1)).as("relationship_count"))
    n.crossJoin(e)
  }

  /** A2: degree (in+out) per node. */
  def degree(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val d = edges.select(col("src_id").as("node_id"))
      .unionAll(edges.select(col("dst_id").as("node_id")))
      .groupBy("node_id").agg(count(lit(1)).as("degree"))
    nodes.select("node_id", "name").join(d, Seq("node_id"), "left")
      .withColumn("degree", coalesce(col("degree"), lit(0L)))
  }

  /** A3: low-connectivity top-k (ORDER BY connectivity ASC LIMIT k). */
  def lowConnectivity(nodes: DataFrame, edges: DataFrame, k: Int = 10): DataFrame =
    degree(nodes, edges).orderBy(col("degree").asc, col("name").asc).limit(k)

  /** A4: most-connected top-k (stats dashboard top-5). */
  def mostConnected(nodes: DataFrame, edges: DataFrame, k: Int = 5): DataFrame =
    degree(nodes, edges).orderBy(col("degree").desc, col("name").asc).limit(k)

  /** A6: relationship-type histogram. */
  def predHistogram(edges: DataFrame): DataFrame =
    edges.groupBy("pred_norm").agg(count(lit(1)).as("n")).orderBy("pred_norm")

  /** J1: ConceptExists as a left-semi join. */
  def existingConcepts(candidates: DataFrame, nodes: DataFrame): DataFrame =
    candidates.join(nodes.select(col("name")), Seq("name"), "left_semi")

  /** J4: deterministic non-adjacent candidate pairs — the enricher's random
    * pair generation, hash-ordered instead of ORDER BY rand(). SAMPLE-FIRST:
    * both pairing sides are the same hash-ordered top-S node sample
    * (S = max(64, ceil(sqrt(oversample·n))) — a TakeOrdered over the node
    * table, never a full node×node cartesian), so the nested-loop join is
    * S×S ≈ O(oversample·n) regardless of graph size. Existing edges in
    * either direction are excluded via a left-anti join on the normalized
    * (least, greatest) key. */
  def nonAdjacentPairs(nodes: DataFrame, edges: DataFrame, n: Int,
      oversample: Int = 32): DataFrame = {
    val s = math.max(64, math.ceil(math.sqrt(oversample.toDouble * n)).toInt)
    val ids = nodes.select(col("node_id"), col("name"))
      .orderBy(md5(col("name"))).limit(s)
    val a = ids.select(col("node_id").as("a_id"), col("name").as("a"))
    val b = ids.select(col("node_id").as("b_id"), col("name").as("b"))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id"))
    val existing = edges.select(
      least(col("src_id"), col("dst_id")).as("a_id"),
      greatest(col("src_id"), col("dst_id")).as("b_id")).distinct()
    pairs.join(existing, Seq("a_id", "b_id"), "left_anti")
      .withColumn("pick", md5(concat_ws("|", col("a"), col("b"))))
      .orderBy("pick").limit(n)
      .select("a", "b")
  }

  /** Doc-level co-occurrence of canonical entities — the deterministic
    * evidence source for enrichment (replaces the reference's LLM pair
    * mining, X2). mentionsCanon: (doc_id, canonical), one row per mention
    * (duplicates = evidence weight). The per-doc pairing is quadratic in the
    * doc's distinct-entity count, so entities are capped at `maxPerDoc` per
    * doc (keep top-k by mention count, name tie-break) BEFORE pairing — a
    * boilerplate-heavy web doc mentioning 10^3 entities would otherwise
    * produce 10^6 pair rows on its own. */
  def cooccurrence(mentionsCanon: DataFrame, maxPerDoc: Int = 64): DataFrame = {
    val counted = mentionsCanon.groupBy("doc_id", "canonical")
      .agg(count(lit(1)).as("n_m"))
    val m = counted
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("n_m").desc, col("canonical").asc)))
      .filter(col("rk") <= maxPerDoc)
      .select("doc_id", "canonical")
    // per-doc pairing via a capped per-doc list + codegen'd array pair
    // explosion (r07, guide §2.4): the former doc_id SELF-JOIN evaluated the
    // whole mentions→count→window subtree TWICE and sort-merge-joined the
    // copies — two extra corpus-scale exchanges plus sorts. The list is
    // bounded by maxPerDoc, so the explosion is ≤ maxPerDoc² structs per
    // doc, map-side, and the groupBy(doc_id) reuses the window's
    // partitioning (no new exchange). Pair semantics are identical: one
    // (a, b) row per doc with a < b, list order irrelevant.
    val lists = m.groupBy("doc_id").agg(collect_list(col("canonical")).as("cs"))
    lists
      .select(explode(flatten(transform(col("cs"), x =>
        transform(col("cs"), y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_docs"))
  }

  /** G6/G7 RunOnce: enrich the graph with CoOccursWith edges for the top
    * non-adjacent co-occurring pairs (threshold on doc evidence).
    * @param focus G5 low-connectivity reseeding: when set, only pairs
    *   touching one of these node_ids are considered — the reference's
    *   "reseed from poorly-connected concepts" redirected at pair mining
    *   (the corpus-driven build has no BFS loop to reseed). The focus set
    *   is bottom-k-sized, so the OR-semi-join broadcasts it. */
  def enrichOnce(nodes: DataFrame, edges: DataFrame, mentionsCanon: DataFrame,
      minDocs: Long, maxNew: Int, focus: Option[DataFrame] = None): DataFrame =
    enrichOnceFromCo(nodes, edges,
      cooccurrence(mentionsCanon).filter(col("n_docs") >= minDocs), maxNew, focus)

  /** Enrichment tick over a PRECOMPUTED co-occurrence table — the corpus
    * aggregate is a fixed input, so a ticker computes it once and re-runs
    * only the (tiny) id-mapping + anti-join + top-k per tick. */
  def enrichOnceFromCo(nodes: DataFrame, edges: DataFrame, co: DataFrame,
      maxNew: Int, focus: Option[DataFrame] = None): DataFrame = {
    val ids = nodes.select(col("name"), col("node_id"))
    val withIds0 = co
      .join(ids.withColumnRenamed("name", "a").withColumnRenamed("node_id", "a_id"), Seq("a"))
      .join(ids.withColumnRenamed("name", "b").withColumnRenamed("node_id", "b_id"), Seq("b"))
    val withIds = focus match {
      case Some(f) => withIds0.join(broadcast(f.select(col("node_id"))),
        col("a_id") === col("node_id") || col("b_id") === col("node_id"), "left_semi")
      case None => withIds0
    }
    val existing = edges.select(
      least(col("src_id"), col("dst_id")).as("k1"),
      greatest(col("src_id"), col("dst_id")).as("k2")).distinct()
    withIds
      .withColumn("k1", least(col("a_id"), col("b_id")))
      .withColumn("k2", greatest(col("a_id"), col("b_id")))
      .join(existing, Seq("k1", "k2"), "left_anti")
      .withColumn("pick", md5(concat_ws("|", col("a"), col("b"))))
      .orderBy(col("n_docs").desc, col("pick").asc).limit(maxNew)
      .select(col("a_id").as("src_id"), col("b_id").as("dst_id"),
        lit("CoOccursWith").as("pred"), lit("cooccurswith").as("pred_norm"),
        round(lit(1.0) - lit(1.0) / (col("n_docs") + 1), 6).as("strength"),
        col("n_docs"),
        concat(col("a"), lit(" co-occurs with "), col("b")).as("description"))
  }

  /** G1/O6: seed-BFS reachability as an iterative DataFrame loop — the
    * reference's frontier-queue graph expansion
    * (/root/reference/kg-builder/internal/graph/graph.go:56-130) without
    * driver-side state: `frontier ← (frontier ⋈ edges) anti-join visited`,
    * bounded by maxHops and maxNodes (the reference's MAX_NODES cap; winner
    * selection by (hops, name) keeps the cap deterministic).
    * Follows out-edges, as the builder's expansion does.
    * Returns (node_id, name, hops). */
  def reachableFrom(nodes: DataFrame, edges: DataFrame, seedName: String,
      maxHops: Int, maxNodes: Int = Int.MaxValue): DataFrame = {
    val adj = edges.select(col("src_id"), col("dst_id")).distinct()
      .localCheckpoint()
    val named = nodes.select(col("node_id"), col("name"))
    var visited = named.filter(col("name") === seedName)
      .select(col("node_id"), lit(0).as("hops"))
      .localCheckpoint()
    var visitedCount = visited.count()
    var frontier = visited
    var hop = 0
    // the maxNodes budget binds INSIDE the loop, per hop — the reference
    // caps the frontier during expansion (graph.go:66-70), so on a dense
    // graph the intermediate frontier never outgrows the node cap; winners
    // per hop are deterministic by (hops, name, node_id). The frontier
    // itself carries only ids: an edge endpoint missing from the nodes
    // table is still traversed THROUGH (it is only absent from the final
    // named output) — its name joins null and sorts last among a hop's
    // cap winners. Deliberate semantics: the budget counts DISCOVERED ids
    // (dangling ones included), i.e. it bounds frontier/visited memory
    // like the reference's id-holding frontier channel — so under a
    // binding cap on a referentially-drifted graph the NAMED output may
    // hold fewer than maxNodes rows. (The q_bfs oracle compares the
    // non-binding-cap configuration.)
    while (hop < maxHops && visitedCount < maxNodes && !frontier.isEmpty) {
      hop += 1
      val candidates = frontier.join(adj, frontier("node_id") === adj("src_id"))
        .select(col("dst_id").as("node_id"), lit(hop).as("hops"))
        .distinct()
        .join(visited.select("node_id"), Seq("node_id"), "left_anti")
        .localCheckpoint()
      val nCand = candidates.count()
      val budget = maxNodes.toLong - visitedCount
      val next =
        if (nCand > budget)
          candidates.join(named, Seq("node_id"), "left")
            .orderBy(col("hops").asc, col("name").asc_nulls_last,
              col("node_id").asc)
            .limit(budget.toInt).select("node_id", "hops").localCheckpoint()
        else candidates
      visitedCount += math.min(nCand, budget)
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
    }
    visited
      .join(named, Seq("node_id"))
      .orderBy(col("hops").asc, col("name").asc).limit(maxNodes)
      .select("node_id", "name", "hops")
  }

  /** Marker prefix on manually-added edge descriptions; [[mergedEdges]]
    * ranks marked descriptions BELOW extracted ones (ON-CREATE-only
    * semantics without needing write-order metadata in the chain). */
  val ManualDescriptionPrefix = "Manually added: "

  /** The single manual edge row, full edge-table schema. `provType` is the
    * target table's provenance array type (its doc-id field type varies by
    * table). */
  private def edgeRow(spark: SparkSession,
      provType: org.apache.spark.sql.types.DataType,
      srcId: Long, dstId: Long, pred: String): DataFrame = {
    import spark.implicits._
    Seq((srcId, dstId, pred)).toDF("src_id", "dst_id", "pred")
      .withColumn("pred_norm", Materialize.normPred(col("pred")))
      .withColumn("strength", lit(1.0))
      .withColumn("n_obs", lit(1L))
      .withColumn("description", lit(s"$ManualDescriptionPrefix$pred"))
      .withColumn("provenance", array().cast(provType))
      .withColumn("created_at", Materialize.CreatedAt)
  }

  /** Read-side MERGE over a (possibly delta-chained) union of edge rows: one
    * row per (src_id, dst_id, pred) with the write-time MERGE semantics —
    * n_obs summed, strength max, `description` ON-CREATE-only (an extracted
    * edge's canonical sentence outranks a manual add's
    * [[ManualDescriptionPrefix]] marker), provenance merged
    * sorted-then-capped at [[Materialize.ProvenanceCap]]. Every aggregate is
    * order-insensitive, so the view is deterministic over the unordered
    * parquet union a snapshot chain reads as; it is idempotent, so applying
    * it to an already-merged table is the identity on every column. */
  def mergedEdges(chain: DataFrame): DataFrame =
    chain
      .withColumn("is_manual",
        col("description").startsWith(ManualDescriptionPrefix).cast("int"))
      .groupBy("src_id", "dst_id", "pred").agg(
        min("pred_norm").as("pred_norm"), // = f(pred): constant per key
        max("strength").as("strength"),
        sum("n_obs").as("n_obs"),
        min(struct(col("is_manual"), col("description")))
          .getField("description").as("description"), // create-wins
        slice(sort_array(flatten(collect_list("provenance"))), 1,
          Materialize.ProvenanceCap).as("provenance"),
        min("created_at").as("created_at"))

  /** S13: manual edge creation by node id (REST POST /api/relationships) —
    * frame-level MERGE (full groupBy over the input frame; fine for tests
    * and dictionary-scale frames). The TABLE path is [[addEdgeDelta]]. */
  def addEdge(edges: DataFrame, srcId: Long, dstId: Long, pred: String): DataFrame =
    mergedEdges(edges.unionByName(edgeRow(edges.sparkSession,
      edges.schema("provenance").dataType, srcId, dstId, pred)))

  /** S13 scale path: a single-row REST-style add as an O(1) DELTA commit —
    * the write volume is the ONE new row ([[graft.tables.TableIO.commitDelta]]),
    * never a table rewrite; MERGE semantics are applied at read time by
    * [[mergedEdges]]. At a 10⁹-edge table this is the only viable shape —
    * the previous implementation rewrote the whole table per added edge. */
  def addEdgeDelta(spark: SparkSession, tableDir: String,
      srcId: Long, dstId: Long, pred: String): Unit = {
    val provType = graft.tables.TableIO.readCurrent(spark, tableDir)
      .schema("provenance").dataType
    graft.tables.TableIO.commitDelta(
      edgeRow(spark, provType, srcId, dstId, pred), tableDir, "add_edge")
  }

  /** G8: graph snapshot export (nodes + links, id-addressed). */
  def graphSnapshot(nodes: DataFrame, edges: DataFrame): (DataFrame, DataFrame) = {
    val d = degree(nodes, edges).select(col("node_id"), col("degree"))
    val ns = nodes.join(d, Seq("node_id"), "left")
      .select(col("node_id").as("id"), col("name"),
        lit("Concept").as("type"), coalesce(col("degree"), lit(0L)).as("size"))
    val ls = edges.select(col("src_id").as("source"), col("dst_id").as("target"),
      col("pred_norm").as("type"))
    (ns, ls)
  }
}

/** G3/G4 as standalone set-oriented cleanup (replaces the reference's
  * periodic two-pass Cypher deletes,
  * /root/reference/kg-builder/internal/neo4j/neo4j.go:417-540). */
object Cleanup {
  def apply(nodes: DataFrame, edges: DataFrame): (DataFrame, DataFrame) = {
    val cleanEdges = edges.filter(
      col("pred").isNotNull && length(trim(col("pred"))) > 0)
    val touched = cleanEdges.select(col("src_id").as("node_id"))
      .unionAll(cleanEdges.select(col("dst_id").as("node_id"))).distinct()
    val cleanNodes = nodes.join(touched, Seq("node_id"), "left_semi")
    (cleanNodes, cleanEdges)
  }
}
