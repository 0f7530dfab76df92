package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - Brute-force cosine top-k: the correctness baseline. The dot product is
  *   `aggregate(zip_with(...))` — Catalyst higher-order functions, fully
  *   codegen'd, no UDF. Queries are a broadcast side.
  * - LSH-bucketed (random hyperplane signs) variant: the scale path — only
  *   same-bucket (± Hamming-1 probes) candidates get exact scoring, so the
  *   full N×Q cross product never materializes.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k neighbors for the given query ids.
    * Output: (query_id, rank, vec_id, cos5) with cosine rounded to 5 dp and
    * id tie-breaks — deterministic and engine-reproducible. */
  def bruteTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos5", round(
        dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))), 5))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos5").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos5")
  }

  /** Deterministic random hyperplanes (seeded), as a literal array column. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id for an embedding column. */
  def bucketOf(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val lit_p = array(p.map(x => lit(x)): _*)
      when(dot(v, lit_p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k via MULTI-TABLE sign-LSH (the standard construction:
    * L independent tables of `bitsPerTable` hyperplane bits; a vector is a
    * candidate if it collides with the query in ANY table). Exact cosine
    * runs on candidates only — the N×Q cross product never materializes.
    * Recall ≈ 1-(1-p^bits)^L with p = 1-θ/π. Output shape matches
    * [[bruteTopK]].
    *
    * Scale guards: `bitsPerTable` defaults to 16 (65536 buckets/table —
    * expected occupancy N/2^16, so candidates stay a vanishing fraction of
    * N; size bits to ~log2(N) - log2(wanted bucket size) for other corpora)
    * and each (table, bucket) contributes at most `maxBucket` corpus vectors
    * (deterministic keep-lowest-vec_id rank), so a hot bucket — a dense
    * region of embedding space — cannot re-grow the cross product. Queries
    * look up their own bucket UNCAPPED, so a query inside a hot bucket still
    * probes it. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, dim: Int,
      nTables: Int = 8, bitsPerTable: Int = 16, maxBucket: Int = 256): DataFrame = {
    val planes = hyperplanes(dim, nTables * bitsPerTable)
    val e0 = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // (vec_id, v, table, bucket) — one row per table
    val tabBuckets = (0 until nTables).map { t =>
      val tp = planes.slice(t * bitsPerTable, (t + 1) * bitsPerTable)
      struct(lit(t).as("table"), bucketOf(col("v"), tp).as("bucket"))
    }
    val e = e0.withColumn("tb", explode(array(tabBuckets: _*)))
      .select(col("vec_id"), col("v"), col("tb.table").as("table"),
        col("tb.bucket").as("bucket"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("table"), col("bucket"))
    val eCapped = e.withColumn("bucket_rank", row_number().over(
        Window.partitionBy(col("table"), col("bucket")).orderBy(col("vec_id").asc)))
      .filter(col("bucket_rank") <= maxBucket).drop("bucket_rank")
    eCapped.join(q, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qv", "vec_id", "v").distinct() // union over tables
      .withColumn("cos5", round(
        dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))), 5))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos5").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos5")
  }
}
