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
    val docsDir = "/root/repo/target/bench/corpus-1000000/docs"
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
