package graft

import graft.canon.ConnectedComponents
import org.scalacheck.Gen

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = (edges.flatMap(e => Seq(e._1, e._2))).distinct
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  private def ccSpark(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(spark, edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, star, two components, self-loop") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain → 1
      (10L, 11L), (10L, 12L), (10L, 13L), // star → 10
      (20L, 20L), // self loop ignored
      (30L, 31L))
    val got = ccSpark(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 30L -> 30L, 31L -> 30L))
  }

  test("agrees with union-find on random graphs") {
    val gen = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2)
    for (edges <- Check.samples(gen, 25) if edges.nonEmpty) {
      assert(ccSpark(edges) == unionFind(31, edges), s"edges=$edges")
    }
  }

  test("hub component: 10^5-member star + chain converge, per-iteration shuffle stays bounded") {
    import org.apache.spark.sql.functions._
    val n = 100000L
    // a single hub component (the SURVEY §4.2 skew case: one entity with
    // 10^5 duplicates) plus a 60-node chain to force multiple iterations
    val star = spark.range(1, n).select(col("id").as("src"), lit(0L).as("dst"))
    val chain = spark.range(0, 60).select(
      (col("id") + 1000000L).as("src"), (col("id") + 1000001L).as("dst"))
    val edges = star.unionAll(chain)
    val inputEdges = n - 1 + 60
    val iterSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val comp = ConnectedComponents.run(spark, edges,
      onIter = (_, cnt) => iterSizes += cnt)
    // correctness: whole star collapses to min id 0; chain to its min
    assert(comp.filter(col("component") === 0L).count() == n)
    assert(comp.filter(col("component") === 1000000L).count() == 61)
    assert(comp.count() == n + 61)
    // convergence in few rounds; the star representation never expands —
    // groupBy+min absorbs the hub on the map side, edges only contract
    assert(iterSizes.length <= 8, s"iterations: $iterSizes")
    assert(iterSizes.forall(_ <= inputEdges), s"per-iteration sizes: $iterSizes")
  }

  test("assign: isolated nodes map to themselves") {
    val comp = ConnectedComponents.assign(spark,
      Seq(1L, 2L, 3L, 99L).toDF("node_id"), Seq((1L, 2L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 99L -> 99L))
  }
}
