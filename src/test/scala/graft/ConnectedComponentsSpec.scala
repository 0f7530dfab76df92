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

  test("assign: isolated nodes map to themselves") {
    val comp = ConnectedComponents.assign(spark,
      Seq(1L, 2L, 3L, 99L).toDF("node_id"), Seq((1L, 2L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 99L -> 99L))
  }
}
