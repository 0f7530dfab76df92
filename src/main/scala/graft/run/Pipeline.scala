package graft.run

import graft.corpus.{DeterministicCorpus, Golden}
import graft.extract.{AhoCorasick, Extract}
import graft.graph.Materialize
import graft.link.EntityLink
import graft.model.Doc
import graft.tables.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage orchestration — the Spark-native equivalent of the reference's
  * builder main loop (/root/reference/cmd/kg-builder/main.go:21 →
  * BuildGraph → MineRandomRelationships → statistics), reshaped from a
  * seed-BFS with driver-side state into a corpus-driven staged Catalyst
  * pipeline (SURVEY.md §3.1):
  *
  *   docs (bucketized ingest, repartitionByRange)
  *     → extract   (bucket-granular resume; mention detect + OpenIE kernels)
  *     → link      (broadcast alias join + candidate gate + disambiguation)
  *     → graph     (CC canonicalization, salted edge MERGE, cleanup)
  *     → snapshots (nodes / edges / triples_view Iceberg-style tables)
  *
  * Every stage leaves per-partition lineage + counters in checkpoint
  * manifests; a killed run resumes: the extraction stage at bucket
  * granularity, downstream snapshot stages at stage granularity.
  */
object Pipeline {

  final case class Conf(
      workDir: String,
      nDocs: Long = 400,
      seed: Long = 42L,
      nBuckets: Int = 8,
      concurrency: Int = 4,
      goldenDir: String = Golden.defaultDir)

  final case class Out(docs: DataFrame, nodes: DataFrame, edges: DataFrame,
      triplesView: DataFrame)

  def docsDir(c: Conf) = s"${c.workDir}/docs"
  def aliasesPath(c: Conf) = s"${c.workDir}/aliases"
  def extractDir(c: Conf) = s"${c.workDir}/stage_extract"
  def nodesDir(c: Conf) = s"${c.workDir}/nodes"
  def edgesDir(c: Conf) = s"${c.workDir}/edges"
  def triplesDir(c: Conf) = s"${c.workDir}/triples_view"

  /** Synthesize + bucketize the corpus and alias table if not present. */
  def ensureCorpus(spark: SparkSession, c: Conf): Unit = {
    val marker = java.nio.file.Paths.get(docsDir(c), "_DONE")
    if (!java.nio.file.Files.exists(marker)) {
      val docs = DeterministicCorpus.docs(spark, c.nDocs, c.seed, c.goldenDir)
      TableIO.bucketize(docs.toDF(), "doc_id", c.nBuckets, docsDir(c))
      DeterministicCorpus.aliases(spark, c.goldenDir).toDF()
        .coalesce(1).write.mode("overwrite").parquet(aliasesPath(c))
      java.nio.file.Files.writeString(marker, "ok")
    }
  }

  def run(spark: SparkSession, c: Conf): Out = {
    import spark.implicits._
    ensureCorpus(spark, c)

    val aliases = spark.read.parquet(aliasesPath(c))
    val aliasList = aliases.select("alias").as[String].collect()
    val dict = Extract.broadcastDict(spark, aliasList)
    val predGrammar = Extract.broadcastDict(spark,
      Golden.triples(c.goldenDir).map(_.pred).distinct)

    // stage 1: extraction (the compute kernel; bucket-granular resume)
    val raw = TableIO.runBucketed(spark, "extract", docsDir(c), extractDir(c),
      c.nBuckets, c.concurrency) { in =>
      Extract.rawTriples(in.drop("bucket").as[Doc], dict, predGrammar).toDF()
    }

    // stage 2: linking (broadcast joins; needs the corpus text for the
    // ambiguous-alias context scorer)
    val docsText = spark.read.parquet(docsDir(c))
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "text")
      .select(col("doc_id"), col("s.text").as("text"))
    val linked = EntityLink.link(spark, raw, aliases, docsText)

    // stage 3: canonicalize + materialize
    val g = Materialize.build(spark, linked, aliases)
    TableIO.commitSnapshot(g.nodes, nodesDir(c), "nodes")
    TableIO.commitSnapshot(g.edges, edgesDir(c), "edges")
    val nodesT = TableIO.readCurrent(spark, nodesDir(c))
    val edgesT = TableIO.readCurrent(spark, edgesDir(c))
    val tv = Materialize.triplesView(Materialize.Graph(nodesT, edgesT))
    TableIO.commitSnapshot(tv, triplesDir(c), "triples_view")

    Out(spark.read.parquet(docsDir(c)),
      nodesT, edgesT, TableIO.readCurrent(spark, triplesDir(c)))
  }
}
