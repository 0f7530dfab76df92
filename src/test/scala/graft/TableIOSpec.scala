package graft

import graft.tables.TableIO
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class TableIOSpec extends SparkSuite {
  import spark.implicits._

  test("snapshot commit is atomic and versioned; CURRENT repoints") {
    val dir = tmpDir("snap")
    TableIO.commitSnapshot(Seq(1, 2, 3).toDF("x"), dir, "t")
    assert(TableIO.currentSnapshot(dir).contains("snap-00000"))
    assert(TableIO.readCurrent(spark, dir).count() == 3)
    TableIO.commitSnapshot(Seq(1, 2, 3, 4).toDF("x"), dir, "t")
    assert(TableIO.currentSnapshot(dir).contains("snap-00001"))
    assert(TableIO.readCurrent(spark, dir).count() == 4)
    // per-partition lineage manifest exists
    assert(Files.exists(Paths.get(dir, "_manifest", "snap-00001.json")))
  }

  test("concurrent commits to one table dir claim distinct snapshot ids, never interleave") {
    val dir = tmpDir("snapRace")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (1 to 4).map { i =>
        Future(TableIO.commitSnapshot(Seq.fill(i * 10)(i).toDF("x"), dir, "t"))
      }
      Await.result(Future.sequence(fs), 120.seconds)
    } finally pool.shutdown()
    val snaps = TableIO.listSnapshots(dir)
    assert(snaps == Seq(0, 1, 2, 3), snaps.toString)
    // every snapshot is complete and internally consistent: one writer's
    // rows only (counts are 10/20/30/40 in some order, each homogeneous)
    val counts = snaps.map(s => TableIO.readSnapshot(spark, dir, s))
      .map(df => df.select("x").distinct().count() -> df.count())
    assert(counts.forall(_._1 == 1), counts.toString)
    assert(counts.map(_._2).sorted == Seq(10L, 20L, 30L, 40L), counts.toString)
    assert(TableIO.currentSnapshot(dir).exists(_.startsWith("snap-0000")))
  }

  test("bucketed stage: runs, records lineage, resumes by skipping committed buckets") {
    val in = tmpDir("in")
    val stage = tmpDir("stage")
    TableIO.bucketize(
      (0 until 100).map(i => (f"doc-$i%04d", i)).toDF("doc_id", "v"), "doc_id", 4, in)

    val out1 = TableIO.runBucketed(spark, "s", in, stage, 4, 2)(df =>
      df.withColumn("v2", col("v") * 2))
    assert(out1.count() == 100)
    val metas = (0 until 4).map(b =>
      TableIO.readPartitionMeta(Paths.get(stage, "_manifest", f"bucket-$b%04d.json")).get)
    assert(metas.forall(_.status == "committed"))
    assert(metas.map(_.input_rows).sum == 100)
    assert(metas.map(_.output_rows).sum == 100)

    // second run: transform would crash if executed — committed buckets skip it
    val out2 = TableIO.runBucketed(spark, "s", in, stage, 4, 2)(_ =>
      throw new RuntimeException("must not run"))
    assert(out2.select(sum(col("v2"))).as[Long].head() ==
      (0 until 100).map(_ * 2).sum)
  }

  test("kill-and-restart: failed bucket re-runs, result identical to a clean run") {
    val in = tmpDir("in2")
    val stage = tmpDir("stage2")
    TableIO.bucketize(
      (0 until 80).map(i => (f"doc-$i%04d", i)).toDF("doc_id", "v"), "doc_id", 4, in)

    // first attempt dies on one bucket (simulated kill mid-stage; retries off)
    val poison = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[Exception] {
      TableIO.runBucketed(spark, "s", in, stage, 4, 1, maxRetries = 0) { df =>
        if (poison.incrementAndGet() == 3) throw new RuntimeException("boom")
        df.withColumn("v2", col("v") + 1)
      }
    }
    val committedBefore = (0 until 4).flatMap(b =>
      TableIO.readPartitionMeta(Paths.get(stage, "_manifest", f"bucket-$b%04d.json")))
    assert(committedBefore.nonEmpty && committedBefore.size < 4)

    // restart: completes the rest; equals a from-scratch run
    val out = TableIO.runBucketed(spark, "s", in, stage, 4, 1)(df =>
      df.withColumn("v2", col("v") + 1))
    val clean = tmpDir("stage3")
    val outClean = TableIO.runBucketed(spark, "s", in, clean, 4, 2)(df =>
      df.withColumn("v2", col("v") + 1))
    assert(out.select("doc_id", "v", "v2").as[(String, Int, Int)].collect().sortBy(_._1).toSeq ==
      outClean.select("doc_id", "v", "v2").as[(String, Int, Int)].collect().sortBy(_._1).toSeq)
  }

  test("per-bucket retry with backoff recovers from transient failures (X5)") {
    val in = tmpDir("in3")
    val stage = tmpDir("stage4")
    TableIO.bucketize(
      (0 until 40).map(i => (f"doc-$i%04d", i)).toDF("doc_id", "v"), "doc_id", 2, in)
    val flaky = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = TableIO.runBucketed(spark, "s", in, stage, 2, 1,
      maxRetries = 2, backoffMs = 10L) { df =>
      if (flaky.incrementAndGet() <= 2) throw new java.io.IOException("transient")
      df.withColumn("v2", col("v") * 3)
    }
    assert(out.count() == 40)
    assert(flaky.get() >= 3) // at least two failures were retried through
  }

  test("deterministic failures rethrow immediately — no retry, no backoff delay (X5 taxonomy)") {
    val in = tmpDir("in4")
    val stage = tmpDir("stage5")
    TableIO.bucketize(
      (0 until 20).map(i => (f"doc-$i%04d", i)).toDF("doc_id", "v"), "doc_id", 1, in)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    intercept[Exception] {
      TableIO.runBucketed(spark, "s", in, stage, 1, 1,
        maxRetries = 5, backoffMs = 60000L) { _ =>
        attempts.incrementAndGet()
        // an unknown RuntimeException is a bug, not weather: the whitelist
        // taxonomy must NOT burn 5 × 60s backoffs re-running it
        throw new NumberFormatException("deterministic bug")
      }
    }
    assert(attempts.get() == 1, s"deterministic failure was retried ${attempts.get()} times")
  }

  test("isRetryable: Spark's actual cause-less failure strings classify correctly (X5 taxonomy)") {
    // ExecutorLostFailure reaches the driver as a cause-less SparkException
    // whose message embeds TaskEndReason.toErrorString — one word, no space
    assert(TableIO.isRetryable(new org.apache.spark.SparkException(
      "Job aborted due to stage failure: ExecutorLostFailure (executor 1 exited caused by one of the running tasks)")))
    assert(TableIO.isRetryable(new org.apache.spark.SparkException(
      "Task failed: FetchFailed(BlockManagerId(1, host, 7337, None))")))
    // cause-less deterministic shapes stay non-retryable
    assert(!TableIO.isRetryable(new org.apache.spark.SparkException(
      "Job aborted due to stage failure: assertion failed: bad plan")))
    assert(!TableIO.isRetryable(new RuntimeException("ExecutorLostFailure")))
  }

  test("delta commits: tick write volume is O(batch); readers union the chain; compaction bounds it") {
    val dir = tmpDir("delta")
    TableIO.commitSnapshot((1 to 100).map(i => (i.toLong, "base")).toDF("id", "src"), dir, "t")
    TableIO.commitDelta(Seq((101L, "d1")).toDF("id", "src"), dir, "t")
    TableIO.commitDelta(Seq((102L, "d2"), (103L, "d2")).toDF("id", "src"), dir, "t")
    assert(TableIO.readCurrent(spark, dir).count() == 103)
    // each delta snapshot dir holds ONLY its tick's rows
    assert(TableIO.parquetRowCount(s"$dir/snap-00001") == 1)
    assert(TableIO.parquetRowCount(s"$dir/snap-00002") == 2)
    // time travel resolves the chain at each snapshot
    assert(TableIO.readSnapshot(spark, dir, 0).count() == 100)
    assert(TableIO.readSnapshot(spark, dir, 1).count() == 101)
    assert(TableIO.snapshotChain(dir, 2) == Seq(2, 1, 0))
    // a chain at maxChain compacts: the next commit is a full rewrite
    TableIO.commitDelta(Seq((104L, "d3")).toDF("id", "src"), dir, "t", maxChain = 3)
    assert(TableIO.readCurrent(spark, dir).count() == 104)
    assert(TableIO.parquetRowCount(s"$dir/snap-00003") == 104)
    assert(TableIO.snapshotChain(dir, 3) == Seq(3))
  }

  test("delta commit validates schema against the current snapshot (fail fast, not silent nulls)") {
    val dir = tmpDir("deltaSchema")
    TableIO.commitSnapshot(Seq((1L, "a")).toDF("id", "src"), dir, "t")
    // column-set drift rejected
    val e = intercept[IllegalArgumentException] {
      TableIO.commitDelta(Seq((2L, 5)).toDF("id", "other"), dir, "t")
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    // type drift on a shared name rejected (id INT vs BIGINT)
    intercept[IllegalArgumentException] {
      TableIO.commitDelta(Seq((2, "b")).toDF("id", "src"), dir, "t")
    }
    // a reordered but name↔type-identical frame commits, and the chain read
    // resolves its values into the right columns (files stay column-aligned)
    TableIO.commitDelta(Seq(("b", 2L)).toDF("src", "id"), dir, "t")
    val cur = TableIO.readCurrent(spark, dir)
    assert(cur.count() == 2)
    assert(cur.filter(col("src") === "b").select("id").as[Long].head() == 2L)
  }

  test("concurrent in-JVM delta appenders serialize — every appended row survives the chain") {
    val dir = tmpDir("deltaRace")
    TableIO.commitSnapshot((1 to 10).map(i => (i.toLong, "base")).toDF("id", "src"), dir, "t")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 8).map { i =>
        Future(TableIO.commitDelta(Seq((100L + i, s"d$i")).toDF("id", "src"), dir, "t"))
      }
      Await.result(Future.sequence(fs), 120.seconds)
    } finally pool.shutdown()
    // no silent row loss: the chain holds base + all 8 single-row deltas,
    // each delta snapshot containing exactly its own row
    assert(TableIO.readCurrent(spark, dir).count() == 18)
    TableIO.listSnapshots(dir).drop(1).foreach(s =>
      assert(TableIO.parquetRowCount(f"$dir/snap-$s%05d") == 1))
  }

  test("a cross-process appender moving CURRENT mid-commit fails the delta loudly") {
    val dir = tmpDir("deltaCas")
    TableIO.commitSnapshot(Seq((1L, "a")).toDF("id", "src"), dir, "t")
    // a frame whose evaluation (during the delta's parquet write, i.e.
    // between reading the chain head and repointing) moves CURRENT —
    // simulating another PROCESS's commit landing mid-flight
    val sneakyDir = dir
    val sneaky = Seq((2L, "b")).toDF("id", "src").as[(Long, String)]
      .map { r =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(sneakyDir, "CURRENT"), "snap-00042")
        r
      }.toDF("id", "src")
    intercept[java.util.ConcurrentModificationException] {
      TableIO.commitDelta(sneaky, dir, "t")
    }
  }

  test("CURRENT only advances: a commit cannot repoint it backwards") {
    val dir = tmpDir("mono")
    TableIO.commitSnapshot(Seq(1).toDF("x"), dir, "t")
    // simulate a faster writer having already pointed CURRENT ahead
    Files.writeString(Paths.get(dir, "CURRENT"), "snap-00099")
    TableIO.commitSnapshot(Seq(1, 2).toDF("x"), dir, "t") // claims snap-00001
    assert(TableIO.currentSnapshot(dir).contains("snap-00099"),
      "slow writer must not repoint CURRENT backwards")
  }

  test("vacuum: deletes only snapshots unreachable from the retained roots; retained time travel intact") {
    val dir = tmpDir("vac")
    TableIO.commitSnapshot(Seq((1L, "a")).toDF("id", "src"), dir, "t") // 0 full
    TableIO.commitDelta(Seq((2L, "b")).toDF("id", "src"), dir, "t")    // 1 Δ0
    TableIO.commitDelta(Seq((3L, "c")).toDF("id", "src"), dir, "t")    // 2 Δ1
    TableIO.commitSnapshot((1L to 4L).map((_, "r")).toDF("id", "src"), dir, "t") // 3 full
    TableIO.commitDelta(Seq((5L, "d")).toDF("id", "src"), dir, "t")    // 4 Δ3
    // an id BEYOND CURRENT = a concurrent committer mid-write: untouchable
    Files.createDirectory(Paths.get(dir, "snap-00007"))

    // retainLast=2 roots are {4, 3}; both chains bottom out at full snap 3,
    // so the old chain 0←1←2 is garbage
    assert(TableIO.vacuum(dir, retainLast = 2).toSet == Set(0, 1, 2))
    assert(TableIO.listSnapshots(dir) == Seq(3, 4, 7))
    assert(!Files.exists(Paths.get(dir, "_manifest", "snap-00000.json")))
    assert(Files.exists(Paths.get(dir, "_manifest", "snap-00003.json")))
    // current read and time travel WITHIN the retention window still work
    assert(TableIO.readCurrent(spark, dir).count() == 5)
    assert(TableIO.readSnapshot(spark, dir, 3).count() == 4)
    // idempotent; and a vacuum on a table with no CURRENT is a no-op
    assert(TableIO.vacuum(dir, retainLast = 2).isEmpty)
    assert(TableIO.vacuum(tmpDir("vacEmpty")).isEmpty)
  }

  test("vacuum retains a root's WHOLE delta chain, including a base older than the window") {
    val dir = tmpDir("vacChain")
    TableIO.commitSnapshot(Seq((1L, "a")).toDF("id", "src"), dir, "t") // 0 full
    (2L to 5L).foreach(i =>
      TableIO.commitDelta(Seq((i, s"d$i")).toDF("id", "src"), dir, "t")) // 1-4 Δ
    // retainLast=2 roots {4, 3}: chains 4←3←2←1←0 — EVERYTHING is reachable
    assert(TableIO.vacuum(dir, retainLast = 2).isEmpty)
    assert(TableIO.readCurrent(spark, dir).count() == 5)
  }

  test("vacuum: unreferenced snapshots (failed-CAS leftovers) never occupy retention slots") {
    val dir = tmpDir("vacUnref")
    TableIO.commitSnapshot(Seq((1L, "a")).toDF("id", "src"), dir, "t") // 0 full
    TableIO.commitDelta(Seq((2L, "b")).toDF("id", "src"), dir, "t")    // 1 Δ0
    // a snapshot that was claimed+written but whose repoint CAS failed:
    // on disk, never CURRENT, absent from the _roots log
    Files.createDirectory(Paths.get(dir, "snap-00002"))
    TableIO.commitDelta(Seq((3L, "c")).toDF("id", "src"), dir, "t")    // 3 Δ1
    // retention slots must be COMMITTED roots {1, 3} (chains cover 0 too),
    // not the newest ids {2, 3} — under newest-ids retention the garbage
    // snap 2 would eat root 1's slot AND survive the vacuum itself
    assert(TableIO.vacuum(dir, retainLast = 2) == Seq(2))
    assert(TableIO.listSnapshots(dir) == Seq(0, 1, 3))
    assert(TableIO.readCurrent(spark, dir).count() == 3)
    assert(TableIO.readSnapshot(spark, dir, 1).count() == 2) // window intact
  }

  test("vacuum minAgeMs grace: fresh victims are skipped, backdated ones collected") {
    val dir = tmpDir("vacGrace")
    TableIO.commitSnapshot(Seq((1L, "a")).toDF("id", "src"), dir, "t") // 0 full
    TableIO.commitSnapshot(Seq((1L, "a"), (2L, "b")).toDF("id", "src"), dir, "t") // 1
    TableIO.commitSnapshot((1L to 3L).map((_, "c")).toDF("id", "src"), dir, "t") // 2
    // victim snap 0 was written seconds ago: inside a 1h grace window a
    // (possibly cross-process) reader could still be mid-scan — skip it
    assert(TableIO.vacuum(dir, retainLast = 2, minAgeMs = 3600000L).isEmpty)
    assert(TableIO.listSnapshots(dir) == Seq(0, 1, 2))
    // backdate the victim's manifest AND dir two hours: now collectable
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 7200000L)
    Files.setLastModifiedTime(Paths.get(dir, "_manifest", "snap-00000.json"), old)
    Files.setLastModifiedTime(Paths.get(dir, "snap-00000"), old)
    assert(TableIO.vacuum(dir, retainLast = 2, minAgeMs = 3600000L) == Seq(0))
    assert(TableIO.readCurrent(spark, dir).count() == 3)
  }

  test("vacuum under a ticking enricher: 100 delta ticks, bounded snap dirs, reads stay exact") {
    val dir = tmpDir("vacSoak")
    TableIO.commitSnapshot(Seq((0L, "base")).toDF("id", "src"), dir, "t")
    var maxDirs = 0
    (1 to 100).foreach { i =>
      TableIO.commitDelta(Seq((i.toLong, s"t$i")).toDF("id", "src"), dir, "t",
        maxChain = 8)
      TableIO.vacuum(dir, retainLast = 4)
      maxDirs = math.max(maxDirs, TableIO.listSnapshots(dir).size)
      if (i % 25 == 0) assert(TableIO.readCurrent(spark, dir).count() == i + 1L)
    }
    // retained: ≤4 roots + the ≤8-long chain(s) they share (two chains at a
    // compaction boundary) — far below the 101 dirs an unvacuumed run keeps
    assert(maxDirs <= 16, s"snap dirs not bounded: $maxDirs")
    // exact content, not just counts
    assert(TableIO.readCurrent(spark, dir).select("id").as[Long]
      .collect().sorted.toSeq == (0L to 100L))
    // time travel to every retained root resolves
    TableIO.listSnapshots(dir).foreach(s =>
      TableIO.readSnapshot(spark, dir, s).count())
  }

  test("soak: 200 delta ticks across compaction boundaries — merged view equals a from-scratch fold") {
    // the real edge schema driven through the real tick path
    // (KgQueries.addEdgeDelta), several compactions at the production
    // maxChain=64; after EVERY tick the merged read must equal an
    // in-memory reference fold and chain fan-in must stay ≤ maxChain
    val dir = tmpDir("deltaSoak")
    import org.apache.spark.sql.types._
    val provType = ArrayType(StructType(Seq(
      StructField("doc_id", StringType), StructField("span_idx", IntegerType),
      StructField("media_ref", StringType))))
    val base = Seq((1L, 2L, "Relates To"), (2L, 3L, "Part Of"))
      .toDF("src_id", "dst_id", "pred")
      .withColumn("pred_norm", graft.graph.Materialize.normPred(col("pred")))
      .withColumn("strength", lit(1.0)).withColumn("n_obs", lit(1L))
      .withColumn("description", lit("extracted sentence"))
      .withColumn("provenance", array().cast(provType))
      .withColumn("created_at", graft.graph.Materialize.CreatedAt)
    TableIO.commitSnapshot(base, dir, "edges")

    // reference fold: (src,dst,pred) -> n_obs (strength/desc constant here)
    val ref = scala.collection.mutable.Map(
      (1L, 2L, "Relates To") -> 1L, (2L, 3L, "Part Of") -> 1L)
    var checks = 0
    (1 to 200).foreach { i =>
      val (src, dst, pred) = ((i % 7).toLong, (i % 5 + 10).toLong,
        if (i % 3 == 0) "Relates To" else "Links")
      graft.graph.KgQueries.addEdgeDelta(spark, dir, src, dst, pred)
      val key = (src, dst, pred)
      ref(key) = ref.getOrElse(key, 0L) + 1L
      val chainLen =
        TableIO.snapshotChain(dir, TableIO.currentSnapshotId(dir).get).length
      assert(chainLen <= 64, s"tick $i: chain fan-in $chainLen > maxChain")
      // full equality every 10 ticks AND around each compaction boundary
      // (ticks 63-66, 127-130, 191-194); count-only otherwise keeps the
      // soak under a minute
      if (i % 10 == 0 || (i + 2) % 64 <= 3) {
        val got = graft.graph.KgQueries.mergedEdges(
          TableIO.readCurrent(spark, dir))
          .select("src_id", "dst_id", "pred", "n_obs")
          .as[(Long, Long, String, Long)].collect()
          .map(t => (t._1, t._2, t._3) -> t._4).toMap
        assert(got == ref.toMap, s"tick $i: merged view diverged from fold")
        checks += 1
      }
    }
    assert(checks >= 25)
    // exactly one snapshot per tick, and the three expected compactions
    // (ticks 64/128/192 rewrote full — their chains are length 1)
    assert(TableIO.currentSnapshotId(dir).contains(200))
    Seq(64, 128, 192).foreach(s =>
      assert(TableIO.snapshotChain(dir, s) == Seq(s), s"snap $s not a full rewrite"))
    assert(TableIO.snapshotChain(dir, 200) == (192 to 200).reverse)
  }
}
