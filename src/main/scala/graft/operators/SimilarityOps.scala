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
  private val NPlanes = 4
  private val NTables = 4

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

  /** Deterministic hyperplane weight for (table t, plane h, 1-based dim
    * d): a fixed integer pattern in [-3, 3] — pseudo-random enough to
    * split buckets, and expressible identically in any SQL engine (no
    * RNG seed to agree on). */
  private def planeWeight(t: Int, h: Int, d: Int): Int =
    ((d * 131 + h * 37 + t * 59) % 7) - 3

  /** One (vec, table) row per hash table: vec_id, label, nrm, q0..q63,
    * t, bucket — multi-table random-hyperplane LSH (single-table recall
    * was measured at ~8% on this corpus by [[lshRecall]]; independent
    * tables union their candidates, the standard recall lever). All
    * hyperplane sums stay in codegen. */
  private[operators] def bucketed(spark: SparkSession, dir: String): DataFrame = {
    val q = DedupOps.flattened(spark, dir)
    val tables = (0 until NTables).map { t =>
      val bucketCol = (0 until NPlanes).map { h =>
        val dot = (0 until DedupOps.Dim)
          .map(d => col(s"q$d") * lit(planeWeight(t, h, d + 1))).reduce(_ + _)
        when(dot >= 0, lit(1L << h)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("t"), bucketCol.as("bucket"))
    }
    q.withColumn("tb", explode(array(tables: _*)))
      .select(q.columns.map(col) :+ col("tb.t").as("t") :+ col("tb.bucket").as("bucket"): _*)
  }

  /** Approximate top-k: candidates = vectors sharing the query's bucket
    * in ANY hash table (distinct across tables), then exact cosine +
    * rank. Same output schema as brute force. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    // cache: the bucketed projection (4×256-term hyperplane sums) feeds
    // both sides of the candidate join
    val b = bucketed(spark, dir).cache()
    val queries = b.filter(col("vec_id") < NQueries)
    // both join sides carry the flattened vectors, so candidates are
    // scored inline — no re-join against the base table; the groupBy
    // both dedups pairs colliding in several tables (cosine is identical
    // across tables, so max is a no-op pick) and is the only shuffle
    val pairs = broadcast(queries).as("a").join(b.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor"),
        DedupOps.flatCosine("a", "b").as("cosine"))
      .groupBy("query_id", "neighbor").agg(max(col("cosine")).as("cosine"))
    rank(pairs)
  }

  /** ANN quality evaluation: per-query recall of the LSH path against
    * the exact brute-force top-k — the metric that tunes plane count /
    * bucket granularity before a production rollout. */
  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    val brute = bruteForceTopK(spark, dir).select(col("query_id"), col("neighbor"))
    val lsh = lshTopK(spark, dir)
      .select(col("query_id").as("q2"), col("neighbor").as("n2"))
    brute.join(lsh,
        col("query_id") === col("q2") && col("neighbor") === col("n2"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(when(col("n2").isNotNull, 1L).otherwise(0L)).as("hits"))
      .select(col("query_id"), col("k"), col("hits"),
        (col("hits").cast("double") / col("k")).as("recall"))
      .orderBy("query_id")
  }

  private def rank(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor").asc)
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .orderBy("query_id", "rnk")
  }
}
