package graft.run

import graft.corpus.Golden
import org.apache.spark.sql.SparkSession

/** Dev smoke: full pipeline on a small corpus, print P/R vs golden. */
object Smoke {
  def session(cores: Int = 8): SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .appName("graft-smoke")
    .config("spark.sql.shuffle.partitions", cores.toString)
    .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val spark = session()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val work = "/root/repo/target/smoke"
    if (!args.contains("keep"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    val t0 = System.nanoTime()
    val out = Pipeline.run(spark, Pipeline.Conf(workDir = work, nDocs = 400))
    val emitted = out.triplesView.as[(String, String, String)].collect().toSet
    val golden = Golden.normalizedTriples()
    val tp = (emitted & golden).size
    val p = tp.toDouble / math.max(1, emitted.size)
    val r = tp.toDouble / golden.size
    println(f"emitted=${emitted.size} golden=${golden.size} tp=$tp P=$p%.4f R=$r%.4f wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    println("false positives (up to 10):")
    (emitted -- golden).take(10).foreach(println)
    println("misses (up to 10):")
    (golden -- emitted).take(10).foreach(println)
    println(s"nodes=${out.nodes.count()} edges=${out.edges.count()}")
    spark.stop()
  }
}
