package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the embedding-moments family: the covariance /
  * top-component front-end ([[graft.functions.VectorMomentsAgg]]) run as
  * BOUNDED-STATE streaming aggregation — the twelfth streaming twin
  * pair, and the one that exercises the native aggregate's
  * serialize/merge path through the state store rather than through a
  * batch exchange.
  *
  * Shape: incoming vectors quantize exactly as the batch path, shard on
  * `vec_id mod 64`, and each shard runs the SAME TypedImperativeAggregate
  * the batch covariance uses. State is 64 rows × one O(dim²) moment
  * buffer — a few MB, independent of how many vectors ever stream in.
  * Moments are PURE ADDITION (count, Σqᵢ, Σqᵢqⱼ), so any admissible
  * arrival order converges to the batch totals, and the Complete-mode
  * snapshot after the last micro-batch IS the batch aggregate sharded
  * 64 ways; [[momentsRollup]] re-combines the shards position-wise into
  * the exact one-row totals the batch operators consume. */
object EmbeddingStream {

  private val Dim = graft.operators.DedupOps.Dim

  /** Sharded moments over a (possibly streaming) frame of
    * (vec_id, embedding) rows. Exact same quantization expression as
    * the batch `quantized` projection. */
  def momentsState(vectors: DataFrame): DataFrame = {
    val q = vectors.select(col("vec_id"),
      graft.operators.DedupOps.quantizeExpr.as("qv"))
    q.groupBy(pmod(col("vec_id"), lit(64L)).as("shard"))
      .agg(graft.functions.VectorFunctions.vectorMoments(col("qv"), Dim).as("m"))
      .select(col("shard"), col("m.n").as("n"),
        col("m.s1").as("s1"), col("m.s2").as("s2"))
  }

  /** Combine the 64 shard snapshots into the batch one-pass totals:
    * position-wise exact decimal sums, re-assembled in position order.
    * dim²-sized frames only — the corpus never reappears. */
  def momentsRollup(shards: DataFrame): DataFrame = {
    def sumArray(c: String): DataFrame = shards
      .select(posexplode(col(c)).as(Seq("p", "v")))
      .groupBy("p").agg(sum(col("v")).as("v"))
      .agg(expr("transform(sort_array(collect_list(struct(p, v))), x -> x.v)").as(c))
    shards.agg(sum(col("n")).as("n"))
      .crossJoin(sumArray("s1"))
      .crossJoin(sumArray("s2"))
  }
}
