package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-*style* table layer: parquet data + JSON snapshot manifests with
  * an atomically-replaced CURRENT pointer, plus per-partition lineage
  * counters. This replaces both the reference's Neo4j store and its per-key
  * LLM JSON cache (the resume layer,
  * /root/reference/kg-builder/internal/llm/llm.go:304-418): where the
  * reference resumes at concept granularity from cache files, a killed run
  * here resumes at partition (bucket) granularity from committed manifests.
  * (A real Iceberg catalog could be dropped in — the runtime jar doesn't ship
  * in this sandbox; SURVEY.md §7.3.)
  */
object TableIO {

  private val mapper = new ObjectMapper()

  final case class PartitionMeta(
      stage: String, partition: Int, status: String,
      input_rows: Long, output_rows: Long, wall_ms: Long, fingerprint: String)

  private def writeJsonAtomic(path: Path, obj: Any): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    val json = obj match {
      case m: PartitionMeta =>
        val node = mapper.createObjectNode()
        node.put("stage", m.stage); node.put("partition", m.partition)
        node.put("status", m.status); node.put("input_rows", m.input_rows)
        node.put("output_rows", m.output_rows); node.put("wall_ms", m.wall_ms)
        node.put("fingerprint", m.fingerprint)
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
      case s: String => s
    }
    Files.writeString(tmp, json)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readPartitionMeta(path: Path): Option[PartitionMeta] =
    if (!Files.exists(path)) None
    else {
      val n = mapper.readTree(path.toFile)
      Some(PartitionMeta(n.get("stage").asText, n.get("partition").asInt,
        n.get("status").asText, n.get("input_rows").asLong,
        n.get("output_rows").asLong, n.get("wall_ms").asLong,
        n.get("fingerprint").asText))
    }

  // ---------------------------------------------------------------- snapshot

  /** Commit `df` as the next FULL snapshot of table `dir`: data to
    * snap-<n>/, per-partition row counters to _manifest/snap-<n>.json, then
    * CURRENT is repointed (monotonically). Readers always see a complete
    * snapshot.
    *
    * Concurrency scope: concurrent commits produce DISTINCT snapshot ids
    * and internally consistent snapshots (the id is claimed with an
    * exclusive createDirectory — fails on exists → next id — so two writers
    * never interleave inside one snap dir), and CURRENT only ever advances
    * within a JVM (repointing is serialized in-process and checked against
    * the pointed id, so a slow writer of snap-0 cannot repoint it backwards
    * past a faster writer's snap-3; cross-PROCESS writers to one table dir
    * are out of scope — the pipeline has exactly one driver). What this
    * does NOT give is serialized read-union-commit transactions: two
    * writers that each read CURRENT, union new rows and commit will each
    * persist only their own addition — last id wins. The same applies to
    * [[commitDelta]]: delta chains assume a SINGLE appender (the enricher
    * ticker); two concurrent delta writers would chain onto the same
    * parent and the lower id would drop out of the read chain. */
  def commitSnapshot(df: DataFrame, dir: String, stage: String): Unit = {
    val base = Paths.get(dir)
    val n = writeSnap(df, base, stage, deltaOf = -1)
    repointCurrent(base, n)
  }

  /** Commit `newRows` as a DELTA snapshot chained onto the current one: the
    * write volume is O(newRows), independent of the table size — the
    * enricher's per-tick append path (a full-table rewrite per tick would
    * make tick cost O(edges)). Readers ([[readCurrent]]/[[readSnapshot]])
    * union the chain transparently. When the chain (base + deltas) has
    * reached `maxChain` entries the commit COMPACTS instead: one full
    * rewrite per ~maxChain appends keeps read fan-in bounded (amortized
    * O(newRows · maxChain⁻¹ · table) — the standard log-structured trade).
    * Falls back to a full commit when the table has no snapshot yet.
    *
    * Appender discipline is ENFORCED, not just documented: in-JVM appenders
    * to one table dir are serialized (so concurrent ticks chain correctly
    * instead of both chaining onto the same parent and losing the lower
    * id from the read chain), and a cross-process appender is detected at
    * repoint time — CURRENT having moved since the chain head was read
    * fails the commit loudly instead of silently dropping the other
    * writer's rows. */
  def commitDelta(newRows: DataFrame, dir: String, stage: String,
      maxChain: Int = 64): Unit = {
    val lock = appendLocks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      val base = Paths.get(dir)
      currentSnapshotId(dir) match {
        case None => commitSnapshot(newRows, dir, stage)
        case Some(cur) =>
          // fail-fast on schema drift: a delta snapshot persists whatever
          // schema newRows has, and a mismatch would otherwise only surface
          // later as silent nulls / read errors when the chain is unioned
          // (the compaction path fails fast inside unionByName; this check
          // restores that guarantee for every delta commit). Name→type
          // equality, order- and nullability-insensitive; the write below
          // reorders to the snapshot's column order so the chain's parquet
          // files stay column-aligned.
          val curSchema = readCurrent(newRows.sparkSession, dir).schema
          val curSig = curSchema.fields.map(f => f.name -> f.dataType.sql).toMap
          val newSig = newRows.schema.fields.map(f => f.name -> f.dataType.sql).toMap
          require(curSig == newSig,
            s"commitDelta($dir): delta schema does not match the current snapshot\n" +
              s"  table: ${curSchema.simpleString}\n  delta: ${newRows.schema.simpleString}")
          val aligned = newRows.select(curSchema.fieldNames.map(col(_)): _*)
          val chain = snapshotChain(dir, cur)
          val n =
            if (chain.length >= maxChain)
              writeSnap(readCurrent(newRows.sparkSession, dir).unionByName(aligned),
                base, stage, deltaOf = -1)
            else writeSnap(aligned, base, stage, deltaOf = cur)
          repointCurrentFrom(base, cur, n)
      }
    }
  }

  /** One lock object per table dir: serializes the read-chain-head →
    * write-delta → repoint sequence for in-JVM delta appenders. */
  private val appendLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def writeSnap(df: DataFrame, base: Path, stage: String, deltaOf: Int): Int = {
    Files.createDirectories(base)
    var n = nextSnapshotId(base)
    var snapDir = base.resolve(f"snap-$n%05d")
    var claimed = false
    while (!claimed) {
      try { Files.createDirectory(snapDir); claimed = true }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        n += 1; snapDir = base.resolve(f"snap-$n%05d")
      }
    }
    // append into the freshly claimed EMPTY dir — overwrite would delete the
    // claim first, letting a concurrent committer re-claim the same id
    df.write.mode("append").parquet(snapDir.toString)
    // per-partition lineage: row counts straight from parquet footers
    // (driver-side metadata read — no extra Spark job)
    val perFile = parquetFileRows(snapDir)
    val node = mapper.createObjectNode()
    node.put("stage", stage); node.put("snapshot", n)
    node.put("delta_of", deltaOf) // -1 = full snapshot
    node.put("total_rows", perFile.map(_._2).sum)
    val parts = node.putObject("partitions")
    perFile.foreach { case (f, r) => parts.put(f, r) }
    writeJsonAtomic(base.resolve("_manifest").resolve(f"snap-$n%05d.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    n
  }

  /** Advance CURRENT to snapshot `n` unless it already points past it.
    * The read-check-write is serialized in-process (one lock for all
    * tables — repointing is microseconds), making the monotonic guarantee
    * hold for concurrent committers within a JVM; cross-process writers
    * are out of scope (one driver per table dir). */
  private val repointLock = new Object
  private def repointCurrent(base: Path, n: Int): Unit = repointLock.synchronized {
    if (currentSnapshotId(base.toString).forall(_ < n)) {
      writeJsonAtomic(base.resolve("CURRENT"), f"snap-$n%05d")
      logRoot(base, n)
    }
  }

  /** Append a successfully-committed root id to the table's `_roots` log —
    * the record of every id CURRENT has ever pointed at. [[vacuum]] picks
    * its retained roots from this log, so snapshots that were claimed and
    * written but never became CURRENT (e.g. left behind by a failed
    * [[repointCurrentFrom]] CAS) cannot occupy retention slots and silently
    * shrink the time-travel window below `retainLast` REAL roots. One id
    * per line; appends are serialized by [[repointLock]]. */
  private def logRoot(base: Path, n: Int): Unit =
    Files.writeString(base.resolve("_roots"), f"snap-$n%05d%n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  /** Ids CURRENT has ever pointed at (committed roots), ascending. Tables
    * written before the log existed have no `_roots` file → empty. */
  private[tables] def rootLog(dir: String): Seq[Int] = {
    val p = Paths.get(dir, "_roots")
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.iterator
      .map(_.trim).filter(_.startsWith("snap-"))
      .map(_.stripPrefix("snap-").toInt).toSeq.distinct.sorted
  }

  /** CAS repoint for delta commits: advance CURRENT `expected → n`, failing
    * LOUDLY if CURRENT moved since the chain head was read — that means a
    * second (cross-process) appender chained onto the same parent, and
    * silently repointing would drop its rows from the read chain. */
  private def repointCurrentFrom(base: Path, expected: Int, n: Int): Unit =
    repointLock.synchronized {
      val cur = currentSnapshotId(base.toString)
      if (!cur.contains(expected) || n <= expected)
        throw new java.util.ConcurrentModificationException(
          s"commitDelta($base): CURRENT moved snap-$expected -> " +
            s"${cur.fold("<none>")(c => f"snap-$c%05d")} during the commit " +
            f"(concurrent appender?); snap-$n%05d left unreferenced")
      writeJsonAtomic(base.resolve("CURRENT"), f"snap-$n%05d")
      logRoot(base, n)
    }

  /** (fileName, rowCount) per parquet file in a directory, via footers. */
  def parquetFileRows(dir: Path): Array[(String, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toString), conf))
        try p.getFileName.toString -> r.getRecordCount finally r.close()
      }.toArray.sortBy(_._1)
  }

  def parquetRowCount(dir: String): Long =
    parquetFileRows(Paths.get(dir)).map(_._2).sum

  private def nextSnapshotId(base: Path): Int = {
    val existing = if (!Files.exists(base)) Seq.empty
    else {
      val st = Files.list(base)
      try st.iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("snap-"))
        .map(_.stripPrefix("snap-").toInt).toSeq
      finally st.close()
    }
    if (existing.isEmpty) 0 else existing.max + 1
  }

  def currentSnapshot(dir: String): Option[String] = {
    val cur = Paths.get(dir, "CURRENT")
    if (Files.exists(cur)) Some(Files.readString(cur).trim) else None
  }

  def currentSnapshotId(dir: String): Option[Int] =
    currentSnapshot(dir).map(_.stripPrefix("snap-").toInt)

  /** The manifest's delta_of pointer; -1 = full snapshot (and legacy
    * manifests without the field are full snapshots). */
  private def deltaOf(dir: String, n: Int): Int = {
    val p = Paths.get(dir, "_manifest", f"snap-$n%05d.json")
    if (!Files.exists(p)) -1
    else {
      val node = mapper.readTree(p.toFile)
      if (node.has("delta_of")) node.get("delta_of").asInt else -1
    }
  }

  /** Snapshot ids making up the state at snapshot `n`, newest first: `n`,
    * then the delta chain down to (and including) its base full snapshot. */
  def snapshotChain(dir: String, n: Int): Seq[Int] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cur = n
    while (cur >= 0 && !buf.contains(cur)) { buf += cur; cur = deltaOf(dir, cur) }
    buf.toSeq
  }

  def readCurrent(spark: SparkSession, dir: String): DataFrame =
    readSnapshot(spark, dir, currentSnapshotId(dir).getOrElse(
      throw new IllegalStateException(s"no CURRENT snapshot in $dir")))

  /** Time travel: read the table state AT a committed snapshot — the
    * snapshot's own data plus, for a delta snapshot, its chain of parents
    * (snapshots are immutable; CURRENT only ever advances). */
  def readSnapshot(spark: SparkSession, dir: String, snapshot: Int): DataFrame =
    spark.read.parquet(snapshotChain(dir, snapshot)
      .map(s => Paths.get(dir, f"snap-$s%05d").toString): _*)

  def listSnapshots(dir: String): Seq[Int] = {
    val base = Paths.get(dir)
    if (!Files.exists(base)) Seq.empty
    else {
      val st = Files.list(base)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("snap-")).map(_.stripPrefix("snap-").toInt)
        .toSeq.sorted
      finally st.close()
    }
  }

  /** Snapshot garbage collection: delete snap dirs (and their manifests)
    * not reachable from the chains of the `retainLast` newest committed
    * roots (CURRENT's chain is always among them — CURRENT only ever
    * advances, so the newest ids are the most recent CURRENTs). Without
    * this every [[commitSnapshot]]/compaction leaves its superseded
    * `snap-*` dir on disk forever and a long-running enricher accretes
    * unbounded storage; with it, disk is bounded by the retention window
    * while [[readCurrent]] and time travel ([[readSnapshot]]) within that
    * window stay intact — a retained root's whole delta chain is kept,
    * including base full snapshots older than the window.
    *
    * Retention slots are COMMITTED ROOTS: ids the `_roots` log records as
    * having been CURRENT (so an unreferenced snapshot left by a failed
    * [[repointCurrentFrom]] CAS cannot eat a slot and shrink the
    * time-travel window below `retainLast` real roots); tables predating
    * the log degrade to {CURRENT} as the only root. After deletion the log
    * is compacted to the retained roots.
    *
    * Safety: ids GREATER than CURRENT are never touched (a concurrent
    * committer may have claimed the dir and still be writing into it),
    * and the scan-choose-delete runs under the table's appender lock so
    * an in-JVM delta commit can't repoint CURRENT mid-vacuum. The lock is
    * in-JVM only, so `minAgeMs` adds a cross-process grace window: a
    * victim whose manifest (or snap dir) mtime is younger than `minAgeMs`
    * is skipped this pass and collected by a later one — a misconfigured
    * second process racing this writer degrades to harmless instead of
    * losing a snapshot mid-commit. Deleting a snapshot a reader is
    * mid-scan over is the usual object-store GC race — run vacuum from
    * the single writer, with `retainLast` sized past the longest reader.
    * Returns the deleted snapshot ids. */
  def vacuum(dir: String, retainLast: Int = 2, minAgeMs: Long = 0L): Seq[Int] = {
    require(retainLast >= 1, s"retainLast must be >= 1, got $retainLast")
    val lock = appendLocks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      currentSnapshotId(dir) match {
        case None => Seq.empty
        case Some(cur) =>
          val all = listSnapshots(dir)
          val exists = all.toSet
          // committed roots only; CURRENT itself is always a root even if
          // the table predates the _roots log
          val roots = (rootLog(dir) :+ cur).distinct.sorted
            .filter(r => r <= cur && exists.contains(r))
            .takeRight(retainLast)
          val keep = roots.flatMap(r => snapshotChain(dir, r)).toSet
          def youngerThanGrace(n: Int): Boolean = minAgeMs > 0 && {
            val m = Paths.get(dir, "_manifest", f"snap-$n%05d.json")
            val sd = Paths.get(dir, f"snap-$n%05d")
            val stamp = Seq(m, sd).filter(Files.exists(_))
              .map(Files.getLastModifiedTime(_).toMillis)
            stamp.nonEmpty &&
              System.currentTimeMillis() - stamp.max < minAgeMs
          }
          val victims = all.filter(n =>
            n < cur && !keep.contains(n) && !youngerThanGrace(n))
          victims.foreach { n =>
            val snapDir = Paths.get(dir, f"snap-$n%05d")
            if (Files.exists(snapDir))
              Files.walk(snapDir).sorted(java.util.Comparator.reverseOrder())
                .forEach(p => Files.delete(p))
            Files.deleteIfExists(
              Paths.get(dir, "_manifest", f"snap-$n%05d.json"))
          }
          // compact the log to the retained roots (their snaps are the only
          // reachable history left; dropped ids would never be retained again)
          if (victims.nonEmpty && Files.exists(Paths.get(dir, "_roots")))
            writeJsonAtomic(Paths.get(dir, "_roots"),
              roots.map(r => f"snap-$r%05d").mkString("", "\n", "\n"))
          victims
      }
    }
  }

  // ------------------------------------------------------- bucketed staging

  /** Run a stage with **bucket-granular resume**. The input must be a
    * directory parquet-partitioned by `bucket=<b>` (see [[bucketize]]); each
    * bucket is transformed and committed independently (data dir rename +
    * manifest write), several buckets in flight at once as concurrent Spark
    * jobs. On re-run, buckets whose manifest says `committed` with a matching
    * fingerprint are skipped — the reference's cache-hit short-circuit
    * (llm.go:61-68) at partition granularity. */
  def runBucketed(
      spark: SparkSession,
      stage: String,
      inputDir: String,
      stageDir: String,
      nBuckets: Int,
      concurrency: Int = 4,
      maxRetries: Int = 2,
      backoffMs: Long = 1000L)(transform: DataFrame => DataFrame): DataFrame = {
    val base = Paths.get(stageDir)
    Files.createDirectories(base.resolve("data"))
    val manifestDir = base.resolve("_manifest")
    Files.createDirectories(manifestDir)

    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(math.max(1, concurrency))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (0 until nBuckets).map { b =>
        Future {
          val mPath = manifestDir.resolve(f"bucket-$b%04d.json")
          val fp = bucketFingerprint(inputDir, b)
          val done = readPartitionMeta(mPath).exists(m =>
            m.status == "committed" && m.fingerprint == fp)
          if (!done) {
            // X5: retry with backoff per bucket — the reference's
            // RetryWithBackoff (kg-builder/internal/errors/errors.go:127-151)
            // at partition granularity, on top of Spark's task retries.
            // Only plausibly-transient failures are retried (IO, task/stage
            // failures); deterministic ones (analysis/schema errors, OOM)
            // rethrow immediately — retrying those just delays and obscures
            // the real failure. Every swallowed attempt is logged.
            var attempt = 0
            var committed = false
            while (!committed) {
              try {
                val t0 = System.nanoTime()
                val in = spark.read.parquet(s"$inputDir/bucket=$b")
                val inRows = parquetRowCount(s"$inputDir/bucket=$b")
                val out = transform(in)
                val tmp = base.resolve(f"tmp-$b%04d")
                out.write.mode("overwrite").parquet(tmp.toString)
                val outRows = parquetRowCount(tmp.toString)
                val dataDir = base.resolve("data").resolve(s"bucket=$b")
                if (Files.exists(dataDir))
                  Files.walk(dataDir).sorted(java.util.Comparator.reverseOrder())
                    .forEach(p => Files.delete(p))
                Files.move(tmp, dataDir, StandardCopyOption.ATOMIC_MOVE)
                val ms = (System.nanoTime() - t0) / 1000000
                writeJsonAtomic(mPath,
                  PartitionMeta(stage, b, "committed", inRows, outRows, ms, fp))
                committed = true
              } catch {
                case e: Throwable if attempt < maxRetries && isRetryable(e) =>
                  attempt += 1
                  System.err.println(
                    s"[runBucketed] $stage bucket=$b attempt $attempt failed " +
                      s"(retrying): ${e.getClass.getSimpleName}: ${e.getMessage}")
                  Thread.sleep(backoffMs * (1L << (attempt - 1)))
              }
            }
            true
          } else false
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
    spark.read.option("basePath", base.resolve("data").toString)
      .parquet((0 until nBuckets).map(b => base.resolve("data").resolve(s"bucket=$b").toString): _*)
  }

  /** Transient-vs-deterministic failure taxonomy for the bucket retry loop.
    * WHITELIST of known-transient shapes: IO failures (includes fetch/
    * shuffle/commit IO), timeouts, and Spark task/stage failures whose cause
    * chain is itself transient-shaped. EVERYTHING ELSE — analysis errors,
    * schema mismatches, memory exhaustion, arithmetic/cast/match bugs, and
    * any UNKNOWN RuntimeException (SparkRuntimeException,
    * NumberFormatException, DateTimeException...) — rethrows immediately: a
    * deterministic failure retried with backoff just delays and obscures
    * the real bug. */
  private[graft] def isRetryable(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case _: java.io.UncheckedIOException => true
    case _: java.util.concurrent.TimeoutException => true
    case _: org.apache.spark.sql.AnalysisException => false
    case _: org.apache.spark.SparkException =>
      // task/stage-level failures are transient-shaped only when they wrap a
      // transient cause or carry a known-transient marker in the message; a
      // CAUSE-LESS SparkException (an assertion or task error flattened into
      // the message) is deterministic — retrying it would just burn the full
      // backoff budget before surfacing the real bug
      Option(e.getCause).exists(isRetryable) || {
        val m = Option(e.getMessage).getOrElse("").toLowerCase
        // "executorlostfailure" is Spark's actual reason string
        // (TaskEndReason.toErrorString — no space); keep the spaced
        // variants for scheduler log phrasings
        Seq("fetchfailed", "timed out", "timeout", "connection reset",
          "connection refused", "executorlostfailure", "executor lost",
          "lost executor", "heartbeat").exists(m.contains)
      }
    case _ => false
  }

  /** Content-derived resume fingerprint for one input bucket: path plus the
    * bucket's parquet file names, sizes and mtimes. Regenerating the corpus
    * under the same path invalidates committed buckets instead of silently
    * serving stale outputs. */
  private[tables] def bucketFingerprint(inputDir: String, b: Int): String = {
    val dir = Paths.get(s"$inputDir/bucket=$b")
    val files =
      if (!Files.exists(dir)) "missing"
      else {
        val st = Files.list(dir)
        try st.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
          .toSeq.sorted.mkString(",")
        finally st.close()
      }
    s"$inputDir#bucket=$b#${java.util.UUID.nameUUIDFromBytes(files.getBytes("UTF-8"))}"
  }

  /** Ingest step: cluster the input by bucket for partition-pruned bucketed
    * stages. `repartitionByRange` on (bucket, doc_id) gives stable, balanced,
    * doc_id-clustered files (north_star's explicit repartitionByRange). */
  def bucketize(df: DataFrame, keyCol: String, nBuckets: Int, outDir: String): Unit = {
    df.withColumn("bucket", pmod(xxhash64(col(keyCol)), lit(nBuckets)))
      .repartitionByRange(nBuckets, col("bucket"), col(keyCol))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
  }
}
