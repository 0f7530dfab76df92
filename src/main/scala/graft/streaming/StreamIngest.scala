package graft.streaming

import graft.extract.{AhoCorasick, Extract}
import graft.model.{Doc, Schemas}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingest — the incremental-build counterpart of the
  * batch pipeline. The reference's "continuous" mode is a wall-clock ticker
  * with no event time (kg-enricher/internal/enricher/enricher.go:116-130),
  * so parity needs only batch semantics; this module is the Spark-native
  * upgrade: new document files land in a directory, `Trigger.AvailableNow`
  * drains them through the SAME extraction kernel, and the checkpoint makes
  * increments exactly-once — re-running processes only unseen files.
  *
  * Event time for the windowed-aggregation path is a deterministic function
  * of doc_id (docs carry no timestamp — determinism requirement), which
  * exercises real watermark mechanics without wall-clock nondeterminism.
  */
object StreamIngest {

  def readDocsStream(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.readStream
      .schema(Schemas.doc)
      .option("maxFilesPerTrigger", 64)
      .parquet(dir)
      .as[Doc]
  }

  /** Stateless streaming extraction — the batch kernel applied per
    * micro-batch. */
  def extractStream(docs: Dataset[Doc], dict: Broadcast[AhoCorasick],
      preds: Broadcast[AhoCorasick]): DataFrame =
    Extract.rawTriples(docs, dict, preds).toDF()

  /** Append extracted raw triples to a parquet sink, exactly-once via the
    * streaming checkpoint; drains available input and stops. */
  def runAvailableNow(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, dict: Broadcast[AhoCorasick],
      preds: Broadcast[AhoCorasick]): StreamingQuery = {
    val q = extractStream(readDocsStream(spark, inDir), dict, preds)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Deterministic event time: epoch + (doc index mod 1h) seconds. */
  def eventTime(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_timestamp(lit("2026-01-01 00:00:00")) +
      make_dt_interval(lit(0), lit(0), lit(0),
        pmod(xxhash64(docId), lit(3600)).cast("double"))

  /** Watermarked tumbling-window predicate counts over the triple stream —
    * the streaming-aggregation shape (windowed counts + late-data bound). */
  def windowedPredCounts(spark: SparkSession, inDir: String, outTable: String,
      dict: Broadcast[AhoCorasick], preds: Broadcast[AhoCorasick]): StreamingQuery = {
    val triples = extractStream(readDocsStream(spark, inDir), dict, preds)
      .withColumn("event_time", eventTime(col("doc_id")))
      .withWatermark("event_time", "10 minutes")
    val counts = triples
      .groupBy(window(col("event_time"), "15 minutes"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("pred"), col("n"))
    val q = counts.writeStream
      .format("memory")
      .queryName(outTable)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
