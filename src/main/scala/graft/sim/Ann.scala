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

  /** Embedding-cosine near-duplicate pairs — the embedding counterpart of
    * `NearDup.minhashDupPairs`: multi-table sign-LSH candidate generation
    * over the WHOLE corpus (same-bucket self-join, hot buckets dropped at
    * `maxBucket` exactly like the text band joins), exact cosine verify on
    * candidates only. The all-pairs N² product never materializes; the
    * shuffle moves (vec_id, bucket) rows plus the candidate slice. */
  def cosineDupPairs(emb: DataFrame, dim: Int, threshold: Double,
      nTables: Int = 16, bitsPerTable: Int = 8, maxBucket: Int = 64): DataFrame = {
    val planes = hyperplanes(dim, nTables * bitsPerTable)
    val e0 = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val tabBuckets = (0 until nTables).map { t =>
      val tp = planes.slice(t * bitsPerTable, (t + 1) * bitsPerTable)
      struct(lit(t).as("table"), bucketOf(col("v"), tp).as("bucket"))
    }
    val banded = e0.select(col("vec_id"),
        explode(array(tabBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val sizes = banded.groupBy("table", "bucket").agg(count(lit(1)).as("bn"))
    val capped = banded.join(sizes, Seq("table", "bucket"))
      .filter(col("bn") <= maxBucket).drop("bn")
    val l = capped.select(col("vec_id").as("a"), col("table"), col("bucket"))
    val r = capped.select(col("vec_id").as("b"), col("table"), col("bucket"))
    val pairs = l.join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val va = e0.select(col("vec_id").as("a"), col("v").as("va"))
    val vb = e0.select(col("vec_id").as("b"), col("v").as("vb"))
    pairs.join(va, Seq("a")).join(vb, Seq("b"))
      .withColumn("cos5", round(
        dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))), 5))
      .filter(col("cos5") >= threshold)
      .select("a", "b", "cos5")
  }

  /** IVF coarse quantizer training: deterministic Lloyd k-means.
    * Init = farthest-first traversal (Gonzalez 1985): c₁ is the lowest
    * vec_id, each next seed maximizes distance to its nearest chosen seed
    * (id tie-break) — deterministic AND spread across the data, where a
    * naive first-k init can drop all seeds into one cluster. Then `iters`
    * Lloyd rounds of assign (argmin L2, id tie-break) + per-cell
    * elementwise mean. The assign step is a broadcast of k×dim doubles
    * against the corpus (no shuffle on the big side); the mean is a
    * (cid, dim-position) aggregate. Returns (cid INT, c ARRAY<DOUBLE>) —
    * persist it once and reuse (centroids are a model, not a per-query
    * computation). */
  def ivfTrain(emb: DataFrame, k: Int, iters: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .localCheckpoint()
    var seeds = e.orderBy(col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("v")).localCheckpoint()
    for (_ <- 2 to k) {
      val next = e.crossJoin(broadcast(seeds.select(col("v").as("c"))))
        .withColumn("d2",
          dot(col("v"), col("v")) + dot(col("c"), col("c"))
            - lit(2.0) * dot(col("v"), col("c")))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("dmin"), first(col("v")).as("v"))
        .orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("v"))
      seeds = seeds.unionByName(next).localCheckpoint()
    }
    var cents = seeds
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("cid"), col("v").as("c"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assignCells(e, cents)
      cents = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), expr("transform(pm, p -> p.m)").as("c"))
        .localCheckpoint()
    }
    cents
  }

  /** Nearest-centroid assignment: (vec_id, v, cid). L2² via the identity
    * |x|²+|c|²−2x·c (three dot products in a fixed order — the same
    * arithmetic an external engine reproduces exactly). */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2",
        dot(col("v"), col("v")) + dot(col("c"), col("c"))
          - lit(2.0) * dot(col("v"), col("c")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cid"))

  /** IVF search: probe the `nprobe` cells nearest each query, exact-score
    * only vectors in probed cells. Output shape matches [[bruteTopK]].
    * At scale the corpus assignment is computed once (with the centroids)
    * and the per-query work is nprobe/k of a full scan. */
  def ivfTopK(emb: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
      k: Int, nprobe: Int): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cents = centroids.select(col("cid"), col("c").cast("array<double>").as("c"))
    val assigned = assignCells(e, cents).drop("v")
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("d2",
        dot(col("qv"), col("qv")) + dot(col("c"), col("c"))
          - lit(2.0) * dot(col("qv"), col("c")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    probed.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(e, Seq("vec_id"))
      .withColumn("cos5", round(
        dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv"))), 5))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos5").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos5")
  }
}
