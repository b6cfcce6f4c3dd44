package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`, 64-dim in the testdata).
  *
  * All vector math is Catalyst expressions (`transform`/`zip_with`/
  * `aggregate`) — codegen-friendly, no UDF, no driver collect. Floats are
  * widened to double BEFORE any arithmetic and `aggregate` folds strictly
  * left-to-right, so the result is bit-identical to the same sequential
  * fold in the oracle engine.
  *
  * Scale path: brute force is O(Q·N) — fine for a bounded query set;
  * the LSH variant buckets by deterministic random-hyperplane signs so
  * each query only scans its bucket (expected N/2^planes candidates),
  * trading recall for a 2^planes fan-in reduction. At 100 TB the bucket
  * join is a shuffle on `bucket`, uniformly distributed by construction.
  */
object Similarity {

  /** Array[Float] → Array[Double], element-wise, before any arithmetic. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-to-right dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sequential L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query vector (vec_id < nQueries —
    * a deterministic stand-in for a user-provided query set) against the
    * whole corpus. The query side is tiny → broadcast; the corpus streams
    * through map-side with no shuffle until the final per-query top-k
    * (rank + filter, one shuffle on query_id). */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q"))
    val corpus = embeddings
      .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("v"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q"), col("v")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Deterministic ±1 "random" hyperplane component for (plane i, dim j):
    * an LCG over the flattened index — reproducible in ANSI SQL, no RNG
    * state, no broadcast of plane matrices. */
  private def planeSign(i: Int, j: Column): Column = {
    val x = lit(i.toLong * 64L) + j
    when(pmod(lit(1103515245L) * x + lit(12345L), lit(2147483648L)) % 2 === 0, 1.0)
      .otherwise(-1.0)
  }

  /** Random-hyperplane LSH bucket id (`planes` bits) of an embedding. */
  def lshBucket(v: Column, planes: Int): Column =
    (0 until planes).map { i =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(63)), (x, j) => x * planeSign(i, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce[Column](_ + _)

  /** LSH-bucketed ANN: queries only compare against corpus vectors in the
    * same hyperplane-sign bucket. Same output shape as brute force; lower
    * recall, 2^planes less work per query. */
  def lshTopK(embeddings: DataFrame, nQueries: Int, k: Int, planes: Int): DataFrame = {
    val withBucket = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val queries = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("q"), col("bucket"))
    val corpus = withBucket
      .select(col("vec_id").as("neighbor_id"), col("v"), col("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q"), col("v")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }
}
