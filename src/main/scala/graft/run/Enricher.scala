package graft.run

import graft.graph.{KgQueries, KgSession, Materialize}
import graft.tables.TableIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** G7: the continuous-enrichment lifecycle — the reference enricher's
  * Start/Stop/IsRunning ticker with its `max_relationships` stop condition
  * (/root/reference/kg-enricher/internal/enricher/enricher.go:61-130,
  * 210-235), over the deterministic co-occurrence miner instead of an LLM.
  *
  * Each tick appends at most `batch` new non-adjacent CoOccursWith edges as
  * an edges-table DELTA snapshot ([[TableIO.commitDelta]]) — per-tick write
  * volume is O(batch), independent of the edges-table size, with periodic
  * compaction handled by the table layer. Ticks see the PREVIOUS tick's
  * edges, so the anti-join naturally walks down the candidate ranking. The runner
  * stops itself when `maxRelationships` edges have been added or the candidate
  * pool is drained (a tick adds nothing).
  */
final class Enricher(kg: KgSession, mentionsCanon: DataFrame, conf: Enricher.Conf) {

  private val runningFlag = new AtomicBoolean(false)
  private val addedCount = new AtomicLong(0L)
  @volatile private var worker: Thread = _

  /** The corpus-scale co-occurrence aggregate is a fixed input — computed
    * once for the enricher's lifetime; each tick re-runs only the tiny
    * id-mapping + anti-join against the current edges. */
  private lazy val coTable = KgQueries.cooccurrence(mentionsCanon)
    .filter(col("n_docs") >= conf.minDocs)
    .localCheckpoint()

  def isRunning: Boolean = runningFlag.get()
  def added: Long = addedCount.get()

  /** One enrichment pass (the reference's RunOnce/processBatch): append up
    * to min(batch, remaining) new edges; returns how many were added. */
  def runOnce(): Long = synchronized {
    val remaining = conf.maxRelationships - addedCount.get()
    if (remaining <= 0) return 0L
    val edges = kg.edges
    // G5 reseeding analog: focus this tick's mining on the currently
    // worst-connected nodes (recomputed per tick, as the reference reseeds)
    val focus =
      if (conf.focusBottomK > 0)
        Some(KgQueries.lowConnectivity(kg.nodes, edges, conf.focusBottomK)
          .select("node_id"))
      else None
    val newE = KgQueries.enrichOnceFromCo(kg.nodes, edges, coTable,
        math.min(conf.batch.toLong, remaining).toInt, focus)
      .withColumnRenamed("n_docs", "n_obs")
      .withColumn("provenance",
        typedLit(Seq.empty[(String, Int, String)])
          .cast(edges.schema("provenance").dataType))
      .withColumn("created_at", Materialize.CreatedAt)
      .select(edges.columns.map(col): _*)
      .localCheckpoint() // evaluate once: counted AND committed
    val n = newE.count()
    if (n > 0) {
      // delta-append: each tick writes O(batch) rows, not O(edges) — the
      // reader unions the delta chain; TableIO compacts when it grows long
      TableIO.commitDelta(newE, kg.edgesDir, "edges", conf.maxChain)
      // snapshot GC: without it a long-running ticker accretes one snap
      // dir per tick forever (compaction repoints but never deletes);
      // vacuum from the single appender is the safe place (see
      // TableIO.vacuum's reader caveat)
      if (conf.vacuumRetain > 0)
        TableIO.vacuum(kg.edgesDir, conf.vacuumRetain, conf.vacuumGraceMs)
      addedCount.addAndGet(n)
    }
    n
  }

  /** Start the ticker; no-op if already running. */
  def start(): Unit = if (runningFlag.compareAndSet(false, true)) {
    worker = new Thread(() => {
      try {
        var drained = false
        while (runningFlag.get() && !drained &&
            addedCount.get() < conf.maxRelationships) {
          drained = runOnce() == 0
          if (!drained && addedCount.get() < conf.maxRelationships)
            try Thread.sleep(conf.intervalMs)
            catch { case _: InterruptedException => () }
        }
      } finally runningFlag.set(false)
    }, "graft-enricher")
    worker.setDaemon(true)
    worker.start()
  }

  /** Stop the ticker and wait for the in-flight tick to finish. */
  def stop(): Unit = {
    runningFlag.set(false)
    val w = worker
    if (w != null) { w.interrupt(); w.join(60000) }
  }

  /** Block until the runner stops on its own (cap reached or drained). */
  def awaitStopped(timeoutMs: Long = 120000): Boolean = {
    val t0 = System.currentTimeMillis()
    while (isRunning && System.currentTimeMillis() - t0 < timeoutMs)
      Thread.sleep(20)
    !isRunning
  }
}

object Enricher {
  /** @param minDocs co-occurrence evidence threshold
    * @param batch max edges per tick
    * @param maxRelationships total cap, the enricher's stop condition
    * @param intervalMs ticker interval
    * @param focusBottomK >0 = G5 reseeding: each tick mines only pairs
    *   touching the current bottom-k-degree nodes
    * @param vacuumRetain >0 = per-tick snapshot GC keeping the chains of
    *   the newest N roots ([[graft.tables.TableIO.vacuum]]); 0 = keep
    *   every snapshot (unbounded time travel, unbounded disk)
    * @param maxChain delta-chain length that triggers a compacting full
    *   rewrite ([[graft.tables.TableIO.commitDelta]]) — the disk floor
    *   under vacuum is one full chain, so GC granularity follows this
    * @param vacuumGraceMs cross-process GC grace window: vacuum skips
    *   victims younger than this (TableIO.vacuum minAgeMs) — 0 = immediate
    *   collection (safe for this single-appender ticker; raise it when a
    *   second process might read the table dir) */
  final case class Conf(
      minDocs: Long = 3,
      batch: Int = 10,
      maxRelationships: Long = 50,
      intervalMs: Long = 1000,
      focusBottomK: Int = 0,
      vacuumRetain: Int = 0,
      maxChain: Int = 64,
      vacuumGraceMs: Long = 0L)
}
