package graft

import graft.extract.Extract
import graft.graph.KgSession
import graft.model.Doc
import graft.run.{Enricher, Pipeline}
import org.apache.spark.sql.functions._

/** G7 lifecycle: Start/Stop/IsRunning ticker with the max_relationships stop
  * condition, mirroring the reference enricher's RunOnce/processBatch tests
  * (kg-enricher/internal/enricher/enricher_test.go:160-517). */
class EnricherSpec extends SparkSuite {
  import spark.implicits._

  private lazy val (kg, mentions) = {
    val conf = Pipeline.Conf(workDir = tmpDir("enricher"), nDocs = 220,
      nBuckets = 4, concurrency = 2)
    val out = Pipeline.run(spark, conf)
    val aliases = spark.read.parquet(Pipeline.aliasesPath(conf))
    val dict = Extract.broadcastDict(spark, aliases.select("alias").as[String].collect())
    val m = Extract.mentionsAll(out.docs.drop("bucket").as[Doc], dict).toDF()
      .join(broadcast(aliases), col("surface") === col("alias"))
      .select("doc_id", "canonical")
      .localCheckpoint()
    (KgSession.open(spark, conf.workDir), m)
  }

  test("ticker runs batches until the maxRelationships cap, then stops itself") {
    val baseEdges = kg.edges.count()
    val baseSnaps = kg.edgeSnapshots().size
    val enr = new Enricher(kg, mentions,
      Enricher.Conf(minDocs = 1, batch = 3, maxRelationships = 7, intervalMs = 25))
    assert(!enr.isRunning)
    enr.start()
    assert(enr.awaitStopped(120000), "enricher did not stop on its own")
    assert(!enr.isRunning)
    assert(enr.added == 7) // cap reached exactly (batches 3+3+1)
    assert(kg.edges.count() == baseEdges + 7)
    assert(kg.edgeSnapshots().size == baseSnaps + 3) // one commit per tick
    // delta-append: each tick's snapshot dir holds ONLY that tick's rows —
    // per-tick write volume is O(batch), independent of the edges-table size
    val tickRows = kg.edgeSnapshots().takeRight(3).map(s =>
      graft.tables.TableIO.parquetRowCount(f"${kg.edgesDir}/snap-$s%05d"))
    assert(tickRows.sorted == Seq(1L, 3L, 3L), tickRows.toString)
    // every appended edge is a CoOccursWith between previously non-adjacent
    val newOnes = kg.edges.filter(col("pred_norm") === "cooccurswith")
    assert(newOnes.count() == 7)
    // cap holds: further ticks are no-ops
    assert(enr.runOnce() == 0L)
    assert(kg.edges.count() == baseEdges + 7)
  }

  test("G5 reseeding: focusBottomK restricts mining to low-connectivity nodes") {
    val bottom = graft.graph.KgQueries.lowConnectivity(kg.nodes, kg.edges, 5)
      .select("node_id").as[Long].collect().toSet
    val beforeKeys = kg.edges.select("src_id", "dst_id")
      .as[(Long, Long)].collect().toSet
    val enr = new Enricher(kg, mentions,
      Enricher.Conf(minDocs = 1, batch = 4, maxRelationships = 4, focusBottomK = 5))
    val n = enr.runOnce()
    assert(n > 0, "focused mining found no pairs — fixture too sparse")
    val newKeys = kg.edges.select("src_id", "dst_id")
      .as[(Long, Long)].collect().toSet -- beforeKeys
    assert(newKeys.size == n.toInt)
    assert(newKeys.forall { case (s, d) => bottom.contains(s) || bottom.contains(d) },
      s"every focused edge must touch a bottom-5 node (bottom=$bottom, new=$newKeys)")
  }

  test("start is idempotent; stop interrupts a sleeping ticker promptly") {
    val enr = new Enricher(kg, mentions,
      Enricher.Conf(minDocs = 1, batch = 1, maxRelationships = 1000000,
        intervalMs = 3600000)) // one tick, then sleep ~forever
    enr.start()
    enr.start() // no second worker
    val t0 = System.currentTimeMillis()
    while (enr.added < 1 && System.currentTimeMillis() - t0 < 60000) Thread.sleep(20)
    assert(enr.added >= 1)
    assert(enr.isRunning)
    enr.stop()
    assert(!enr.isRunning)
  }

  // LAST in the suite on purpose: per-tick vacuum deletes the snapshots the
  // earlier tests accreted (their time travel would break after this)
  test("vacuumRetain: per-tick GC bounds the snapshot dirs, merged view stays exact") {
    val before = kg.edges.count()
    val accreted = kg.edgeSnapshots().size
    assert(accreted >= 4) // earlier tests left history worth collecting
    // maxChain=2 forces compactions every other tick, giving vacuum fresh
    // full-snapshot bases to cut the chain at
    val enr = new Enricher(kg, mentions,
      Enricher.Conf(minDocs = 1, batch = 2, maxRelationships = 6,
        intervalMs = 5, vacuumRetain = 2, maxChain = 2))
    enr.start()
    assert(enr.awaitStopped(120000), "enricher did not stop on its own")
    assert(enr.added == 6)
    // GC collected the pre-test history AND the run's own superseded ticks:
    // what's left is the 2 retained roots' chains (≤1 extra base)
    val left = kg.edgeSnapshots()
    assert(left.size <= 3, s"vacuum left ${left.size} snapshots: $left")
    // merged view exact, and time travel to every RETAINED root resolves
    assert(kg.edges.count() == before + 6)
    left.foreach(s => kg.edgesAt(s).count())
  }

  // uses its own workDir — independent of the shared kg table above
  test("run.Main: repeated full runs on one workDir keep bounded snapshot dirs (GC wired end-to-end)") {
    val wd = tmpDir("mainVac")
    val args = Array(s"--workDir=$wd", "--nDocs=220", "--nBuckets=4",
      "--vacuumRetain=1", "--vacuumGraceMs=0", "--stopSession=false")
    graft.run.Main.main(args)
    graft.run.Main.main(args) // re-run accretes one more snapshot per table
    import graft.run.{Config, Main, Pipeline}
    val c = Main.confFrom(Config.resolve(args, env = Map.empty))
    // retain-1 GC through the documented entry point: each table dir holds
    // exactly the second run's snapshot — without the Main wiring this
    // would be Seq(0, 1) growing per run
    Seq(Pipeline.nodesDir(c), Pipeline.edgesDir(c), Pipeline.triplesDir(c))
      .foreach { d =>
        assert(graft.tables.TableIO.listSnapshots(d) == Seq(1), d)
      }
  }
}
