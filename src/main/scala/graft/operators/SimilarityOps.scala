package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star extension —
  * ANN over an `Array[Float]` column).
  *
  * Two paths with one contract (query_id, neighbor, cosine, rnk):
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    every vector. The scan side stays partition-parallel; no shuffle at
  *    all until the final per-query top-k, which moves only k·|queries|
  *    rows. This is the correct plan at 100 TB when |queries| is small.
  *  - [[lshTopK]]: approximate — deterministic random-hyperplane LSH
  *    bucketing; only same-bucket candidates are scored. The bucket id is
  *    computed per-row (no shuffle), candidates co-shuffle on bucket.
  *
  * All arithmetic is integer-quantized and runs over dimension-flattened
  * columns (DedupOps.flattened) so the 64-term dot products stay inside
  * whole-stage codegen, and results are bit-deterministic and
  * oracle-comparable.
  */
object SimilarityOps {

  private val K = 5
  private val NQueries = 10
  private val NPlanes = 8

  /** Exact top-k cosine neighbors for each query vector (vec_id < 10). */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = DedupOps.flattened(spark, dir)
    val queries = q.filter(col("vec_id") < NQueries)
    val pairs = broadcast(queries).as("a").join(q.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor"),
        DedupOps.flatCosine("a", "b").as("cosine"))
    rank(pairs)
  }

  /** Deterministic hyperplane weight for (plane h, 1-based dim d): a fixed
    * integer pattern in [-3, 3] — pseudo-random enough to split buckets,
    * and expressible identically in any SQL engine (no RNG seed to agree
    * on). */
  private def planeWeight(h: Int, d: Int): Int = ((d * 131 + h * 37) % 7) - 3

  /** vec_id, label, nrm, q0..q63, bucket — sign pattern of NPlanes
    * hyperplane dot products, all in codegen. */
  private[operators] def bucketed(spark: SparkSession, dir: String): DataFrame = {
    val q = DedupOps.flattened(spark, dir)
    val bucketCol = (0 until NPlanes).map { h =>
      val dot = (0 until DedupOps.Dim)
        .map(d => col(s"q$d") * lit(planeWeight(h, d + 1))).reduce(_ + _)
      when(dot >= 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
    q.withColumn("bucket", bucketCol)
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Same output schema as brute force; recall depends on bucket
    * granularity (8 planes → 256 buckets). */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    // cache: the bucketed projection (512-term hyperplane sums) feeds
    // both sides of the candidate join
    val b = bucketed(spark, dir).cache()
    val queries = b.filter(col("vec_id") < NQueries)
    val pairs = broadcast(queries).as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor"),
        DedupOps.flatCosine("a", "b").as("cosine"))
    rank(pairs)
  }

  private def rank(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor").asc)
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .orderBy("query_id", "rnk")
  }
}
