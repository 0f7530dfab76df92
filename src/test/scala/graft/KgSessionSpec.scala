package graft

import graft.graph.KgSession
import graft.run.Pipeline

class KgSessionSpec extends SparkSuite {

  private lazy val kg = KgSession.build(spark,
    Pipeline.Conf(workDir = tmpDir("kgsession"), nDocs = 220, nBuckets = 4, concurrency = 2))

  test("build → statistics, search, degree, reachability") {
    val (n, e) = kg.statistics()
    assert(n == 76 && e == 195)
    assert(kg.search("Neural") == Seq("Convolutional Neural Networks", "Neural Networks"))
    assert(kg.degree().count() == 76)
    val reach = kg.reachableFrom("Artificial Intelligence", maxHops = 10)
    assert(reach.count() >= 20) // AI reaches a large component
  }

  test("addEdge commits a new snapshot; old snapshot stays addressable") {
    val before = kg.edgeSnapshots()
    val (Some(a), Some(b)) = (kg.idOf("Statistics"), kg.idOf("Internet"))
    kg.addEdge(a, b, "Manually Linked")
    val after = kg.edgeSnapshots()
    assert(after.size == before.size + 1)
    assert(kg.edges.count() == 196)
    // time travel: previous snapshot unchanged
    assert(kg.edgesAt(before.max).count() == 195)
    // idempotent MERGE: same edge again → same row count, n_obs bumped
    kg.addEdge(a, b, "Manually Linked")
    assert(kg.edges.count() == 196)
    import org.apache.spark.sql.functions._
    assert(kg.edges.filter(col("src_id") === a && col("dst_id") === b)
      .select("n_obs").collect()(0).getLong(0) == 2L)
  }

  test("simhash64 expression: codegen result equals kernel; null-safe") {
    import spark.implicits._
    import graft.functions.SimHash64Expr.simhash64
    val df = Seq(Some("hello world test"), Some(""), None).toDF("t")
      .select(simhash64(org.apache.spark.sql.functions.col("t")).as("h"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).contains(graft.text.NearDup.simhash64("hello world test")))
    assert(got(1).contains(graft.text.NearDup.simhash64("")))
    assert(got(2).isEmpty)
  }
}
