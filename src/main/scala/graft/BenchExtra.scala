package graft

import graft.corpus.Golden
import graft.extract.{ByteAhoCorasick, Extract}
import graft.run.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round measurement harness (guide §1.4): isolates each stage
  * of the corpus-scale pipeline job with the noop sink, so the timing covers
  * the computation (every column of every row materialized), not the output
  * write, and column pruning cannot silently skip the work the real pipeline
  * does (a `.count()` lets the optimizer prune the extracted strings).
  *
  * NOT part of the frozen driver contract — `graft.Bench` remains the only
  * contract bench. This main exists so before/after numbers for individual
  * stages can be cited in OPTIMIZATION_r07.md.
  *
  * Usage: sbt "runMain graft.BenchExtra [nDocs] [cores] [reps]"
  * (defaults 1000000, 8, 3). Prints per-stage wall seconds, min over reps.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 1000000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val root = "/root/repo/target/bench"
    val spark = session(cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val conf = Pipeline.Conf(workDir = s"$root/corpus-$nDocs", nDocs = nDocs,
      nBuckets = 128)
    Pipeline.ensureCorpus(spark, conf)
    val docsDir = Pipeline.docsDir(conf)
    val aliases = spark.read.parquet(Pipeline.aliasesPath(conf))
    val aliasList = aliases.select("alias").as[String].collect()
    val dict = spark.sparkContext.broadcast(ByteAhoCorasick(aliasList))
    val preds = spark.sparkContext.broadcast(
      ByteAhoCorasick(Golden.triples(Golden.defaultDir).map(_.pred).distinct))
    val docs = spark.read.parquet(docsDir).drop("bucket")
    val docsText = spark.read.parquet(docsDir)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "text")
      .select(col("doc_id"), col("s.text").as("text"))

    def raw = Extract.rawTriplesCols(docs, dict, preds)
    def rawValid = raw.filter(graft.extract.Validity.validPred(col("pred")))
    def linked = graft.link.EntityLink.link(spark, raw, aliases, docsText)
    def preaggRows = graft.graph.Materialize.preAggregate(linked)
    def preaggSurface = graft.graph.Materialize.preAggregateBySurface(rawValid, aliases)
    // diagnostics: corpus aggregate without/with the bounded provenance
    // collect, isolating BoundedCollectList's share of the aggregate cost
    def surfAggNoProv = rawValid.groupBy(col("subj"), col("pred"), col("obj"))
      .agg(count(lit(1)).as("n0"))
    def surfAggCorpus = rawValid.groupBy(col("subj"), col("pred"), col("obj"))
      .agg(count(lit(1)).as("n0"),
        graft.functions.BoundedCollectList.bounded_collect_list(
          struct(col("doc_id"), col("span_idx"), col("media_ref")),
          graft.graph.Materialize.ProvenanceCap).as("prov0"))

    val stages: Seq[(String, () => Unit)] = Seq(
      "scan_only" -> (() => noop(docs)),
      "extract" -> (() => noop(raw)),
      "surfagg_noprov" -> (() => noop(surfAggNoProv)),
      "surfagg_corpus" -> (() => noop(surfAggCorpus)),
      // production shape (unambiguous dictionary): surface-aggregate first
      "preagg_surface" -> (() => noop(preaggSurface)),
      // pre-r07 shape kept for A/B evidence: per-row link then aggregate
      "rowlink_preagg" -> (() => noop(preaggRows)))

    // one untimed warmup of the full chain (JIT + page cache)
    spark.sparkContext.setJobDescription("benchextra: warmup")
    noop(preaggSurface)

    val results = stages.map { case (name, f) =>
      val walls = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"benchextra: $name rep$r")
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name min=${walls.min}%.2f all=" +
        walls.map(w => f"$w%.2f").mkString(","))
      name -> walls.min
    }
    println("SUMMARY " + results.map { case (n, w) => f"$n=$w%.2f" }.mkString(" "))
    spark.stop()
  }
}
