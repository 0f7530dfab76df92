package graft.run

import graft.{Fixtures, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Round-7 plan evidence dumper: writes `explain("formatted")` of EVERY
  * declared driver query to plans/r07/<query>_<tag>.txt, plus the fused
  * corpus-scale pipeline job ("pipeline_fused"). Run with tag "before" at
  * round start and "after" once a query's path changed; the judge checks
  * plan claims in OPTIMIZATION_r07.md against these files.
  *
  * Usage: sbt "runMain graft.run.PlansR07 <tag> [queryName...]"
  */
object PlansR07 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val only = args.drop(1).toSet
    val spark = Smoke.session(8)
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    Fixtures.ensure(spark, sf)
    val outDir = java.nio.file.Paths.get("/root/repo/plans/r07")
    java.nio.file.Files.createDirectories(outDir)

    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    val fused = {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val conf = Pipeline.Conf(workDir = "/tmp/plans-kg-r07", nDocs = 220, nBuckets = 4)
      Pipeline.ensureCorpus(spark, conf)
      val aliases = spark.read.parquet(Pipeline.aliasesPath(conf))
      val dict = spark.sparkContext.broadcast(graft.extract.ByteAhoCorasick(
        aliases.select("alias").as[String].collect()))
      val pg = spark.sparkContext.broadcast(graft.extract.ByteAhoCorasick(
        graft.corpus.Golden.triples(graft.corpus.Golden.defaultDir).map(_.pred).distinct))
      val docs = spark.read.parquet(Pipeline.docsDir(conf)).drop("bucket")
      val raw = graft.extract.Extract.rawTriplesCols(docs, dict, pg)
      // mirror Pipeline.run's production branch (unambiguous dictionary →
      // surface-aggregated link)
      graft.graph.Materialize.preAggregateBySurface(
        raw.filter(graft.extract.Validity.validPred(col("pred"))), aliases)
    }

    val all: Seq[(String, () => DataFrame)] =
      ("pipeline_fused" -> (() => fused)) +:
        SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, f) =>
          n -> (() => f(spark, sf))
        }
    all.foreach { case (name, mk) =>
      if (only.isEmpty || only.contains(name)) {
        try {
          val txt = fmt(mk())
          java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
          println(s"wrote $name ($tag)")
        } catch {
          case e: Throwable => println(s"FAILED $name: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
