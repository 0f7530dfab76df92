package graft.run

import graft.corpus.Golden
import graft.extract.Extract
import graft.model.Doc
import org.apache.spark.sql.functions._

/** Microbench: where does extraction CPU go? (decode vs kernel) */
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = Smoke.session(8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docsDir = sys.env.getOrElse("GRAFT_MICRO_DOCS",
      "/root/repo/target/bench/corpus-1000000/docs")
    val docs = spark.read.parquet(docsDir).drop("bucket")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }
    // warm page cache + JIT
    time("warm scan")(docs.count())
    time("columnar explode count")(
      docs.select(explode(col("spans")).as("s")).filter(col("s.kind") === "text").count())
    time("Doc decode only")(
      docs.as[Doc].mapPartitions(it => Iterator.single(it.map(_.spans.length).sum.toLong)).reduce(_ + _))
    val aliases = spark.read.parquet(s"$docsDir/../aliases")
    val dict = Extract.broadcastDict(spark, aliases.select("alias").as[String].collect())
    val preds = Extract.broadcastDict(spark, Golden.triples().map(_.pred).distinct)
    time("full rawTriples")(Extract.rawTriples(docs.as[Doc], dict, preds).count())
    val bDictAc = graft.extract.ByteAhoCorasick(
      aliases.select("alias").as[String].collect())
    val bDict = spark.sparkContext.broadcast(bDictAc)
    val bPreds = spark.sparkContext.broadcast(
      graft.extract.ByteAhoCorasick(Golden.triples().map(_.pred).distinct))
    time("columnar rawTriplesCols")(Extract.rawTriplesCols(docs, bDict, bPreds).count())
    // byte kernel via mapPartitions over decoded Docs — isolates the byte
    // automaton cost from the expression/Generate plumbing
    time("byte AC scan over decoded Docs")(
      docs.as[Doc].mapPartitions { it =>
        Iterator.single(it.map(d =>
          d.spans.iterator.filter(_.kind == "text")
            .map { s =>
              val b = s.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              bDictAc.leftmostLongest(b, b.length).length
            }.sum.toLong).sum)
      }.reduce(_ + _))
    // staged: where does the full extractLinkAgg phase spend CPU?
    if (sys.env.contains("GRAFT_MICRO_STAGED")) {
      val docsText = docs
        .select(col("doc_id"), explode(col("spans")).as("s"))
        .filter(col("s.kind") === "text")
        .select(col("doc_id"), col("s.text").as("text"))
      def staged(tag: String, raw: org.apache.spark.sql.DataFrame): Unit = {
        time(s"$tag extract+count")(raw.count())
        val linked = graft.link.EntityLink.link(spark, raw, aliases, docsText)
        time(s"$tag extract+link")(linked.count())
        time(s"$tag extract+link+preagg")(
          graft.graph.Materialize.preAggregate(linked).count())
      }
      staged("typed", Extract.rawTriples(docs.as[Doc], dict, preds).toDF())
      staged("columnar", Extract.rawTriplesCols(docs, bDict, bPreds))
    }
    // kernel-only: decode + AC scan, no output encode
    time("decode + AC scan, no encode")(
      docs.as[Doc].mapPartitions { it =>
        val ac = dict.value
        Iterator.single(it.map(d =>
          d.spans.iterator.filter(_.kind == "text")
            .map(s => ac.leftmostLongest(s.text).length).sum.toLong).sum)
      }.reduce(_ + _))
    spark.stop()
  }
}
