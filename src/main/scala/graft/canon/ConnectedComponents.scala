package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge list, as an iterative DataFrame loop —
  * the alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), the same shape
  * GraphFrames uses. GraphFrames ships no jar in this sandbox, so this is a
  * from-scratch ~100-LoC DataFrame implementation (SURVEY.md G2).
  *
  * Replaces the reference's duplicate-node canonicalization
  * (FixDuplicateNodes: keep lowest id, re-point edges —
  * /root/reference/internal/common/neo4j/neo4j.go:386-451): component
  * representative = min(node_id), i.e. the reference's keep-lowest-id rule.
  *
  * Scale notes: both star operations are groupBy+min (map-side partial
  * aggregation absorbs hub skew; no collect_list), joins shuffle on node id.
  * Convergence is checked with a cheap aggregate fingerprint instead of
  * except(); each iteration is localCheckpoint'ed to truncate lineage.
  */
object ConnectedComponents {

  /** @param edges DataFrame with long columns (src, dst), undirected.
    * @param onIter observer called per iteration with (iteration, edge count
    *        after small-star) — lets tests assert the per-iteration shuffle
    *        volume stays bounded (hub components contract, never blow up).
    * @return (id: Long, component: Long) — every id appearing in `edges`,
    *         component = min id of its connected component. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 20,
      onIter: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    var e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"), least(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint()

    var converged = false
    var iter = 0
    var prevFp: (Long, Long) = (-1L, -1L)
    while (!converged && iter < maxIter) {
      // large-star: for every node u, connect all strictly-larger neighbors
      // to the minimum of its neighborhood (incl. u).
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("mn"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("mn").as("b"))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()

      // small-star: orient edges (u > v); connect all smaller neighbors and u
      // itself to the minimum neighbor.
      val mins2 = large.groupBy("u").agg(min(col("v")).as("mn"))
      val small = large.join(mins2, "u")
        .select(col("v").as("a"), col("mn").as("b"))
        .union(mins2.select(col("u").as("a"), col("mn").as("b")))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint()

      // overflow-free, order-insensitive fingerprint (edges are distinct)
      val fp = small.agg(
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h"),
        count(lit(1)).as("c")).collect()(0)
      val cur = (fp.getLong(0), fp.getLong(1))
      converged = cur == prevFp
      prevFp = cur
      e = small
      iter += 1
      onIter(iter, cur._2)
    }

    // After convergence every edge is (member, root). Add singleton roots.
    val members = e.select(col("u").as("id"), col("v").as("component"))
    val roots = e.select(col("v").as("id")).distinct()
      .withColumn("component", col("id"))
    members.unionByName(roots).groupBy("id").agg(min("component").as("component"))
  }

  /** Components for a node set given equivalence edges; nodes with no edge
    * are their own component. */
  def assign(spark: SparkSession, nodeIds: DataFrame, edges: DataFrame): DataFrame = {
    val comp = run(spark, edges)
    nodeIds.select(col("node_id"))
      .join(comp, nodeIds("node_id") === comp("id"), "left")
      .select(col("node_id"), coalesce(col("component"), col("node_id")).as("component"))
  }
}
