package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deterministic fixed-iteration Lloyd's k-means over integer-quantized
  * embedding vectors (`qv: Array[Long]`) — the production coarse
  * quantizer feeding the IVF family ([[SimilarityOps.ivfTopK]],
  * [[DedupOps.embeddingNearDupAuto]]), replacing raw seed-vector
  * blocking with learned centroids.
  *
  * Everything is exact integer math until the final cosine, so training
  * is bit-deterministic across engines and partition orders, and the
  * DuckDB oracle replays it as unrolled CTEs:
  *  - init: the vectors with vec_id `firstSeed until firstSeed+nlist`
  *    (content-addressed, no RNG seed to agree on);
  *  - assign: max-cosine centroid, ties to the smaller centroid id;
  *  - update: component-wise truncated integer MEAN (`sum div count` —
  *    Spark `div` and DuckDB `//` both truncate toward zero). Means stay
  *    bounded by the quantization scale, so centroid norms can never
  *    overflow 64-bit — raw integer SUMS would blow past Long at
  *    |list| ≈ 1e5 on real data;
  *  - a list that empties, or whose mean truncates to the zero vector,
  *    drops out of the centroid table (deterministic on both sides).
  *
  * Fixed iteration count, no convergence test — the oracle can only
  * replay a known number of rounds. Per round the corpus is scanned
  * twice (one broadcast-assign pass, one co-shuffled update aggregate);
  * centroids are nlist rows and always broadcast. Dot products run in
  * the native codegen'd [[graft.functions.LongArrayDot]] loop; only the
  * update's per-dimension sums project scalar components (a hash
  * aggregate needs scalar aggregation buffers), and they re-assemble
  * into the centroid's `cv` array immediately after the aggregate.
  */
object KMeans {

  /** Lloyd's for `iters` rounds; returns (assignment, centroids) =
    * ((vec_id, cl), (cl, cv, cnrm)) with the centroids being the integer
    * means OF that final assignment. The assignment frame is eagerly
    * `localCheckpoint()`ed — a lineage cut, which consumers (who all use
    * it at least twice) also get to reuse as materialized blocks; see
    * the in-loop comment for why a cache alone is not enough.
    *
    * The `nlist` default (10) exists for unit specs; production callers
    * pass [[autoNlist]] so list count — and with it per-list size and the
    * block-local pair space of every consumer — scales as √n. */
  def fit(q: DataFrame, iters: Int = 2, nlist: Int = 10,
          firstSeed: Int = 10): (DataFrame, DataFrame) = {
    var cents = q
      .filter(col("vec_id") >= firstSeed && col("vec_id") < firstSeed + nlist)
      .select(col("vec_id").as("cl"), col("qv").as("cv"), col("nrm").as("cnrm"))
    var asg: DataFrame = q.select(col("vec_id"), col("vec_id").as("cl"))
    for (_ <- 1 to iters) {
      // cut lineage at every half-round: a round's plan otherwise embeds
      // several copies of `q` through the previous round's centroids
      // and assignment, and the analyzer's self-join deduplication blows
      // up on the nested tree (measured: an un-checkpointed round 2
      // OOMs the driver before executing anything). Cost: centroids are
      // nlist rows; the assignment is 2 narrow columns per vector —
      // the same storage class as caching it, which consumers need
      // anyway. Blocks are context-cleaned when the frames are GC'd.
      asg = assign(q, cents).localCheckpoint()
      // the zero-centroid filter must sit ABOVE the checkpoint: below it,
      // the predicate inlines into the aggregate's aliased arithmetic and
      // Catalyst's constraint propagation explodes the driver heap; on
      // the leaf, cnrm is a plain attribute and the constraint is tiny
      cents = update(q, asg).localCheckpoint().filter(col("cnrm") > 0)
    }
    (asg, cents)
  }

  /** The scale rule for the list count: nlist = ⌊√n⌋ (min 1). With ~√n
    * lists of ~√n vectors, a consumer's block-local pair space is
    * nlist·(n/nlist)² = n^1.5 instead of the n²/nlist of a FIXED list
    * count, and the per-round assign cost n·nlist stays n^1.5 too — the
    * standard IVF sizing. Mirrors the oracle's
    * `CAST(floor(sqrt(count(*))) AS BIGINT)` exactly: both compute
    * IEEE-double sqrt of an exact integer, then truncate. */
  def autoNlist(n: Long): Int =
    math.max(1, math.floor(math.sqrt(n.toDouble)).toInt)

  /** Vector-vs-centroid cosine over the joined (qv, nrm, cv, cnrm) row. */
  private def centCos =
    VectorFunctions.dotLong(col("qv"), col("cv"))
      .cast("double") / sqrt(col("nrm").cast("double")) / sqrt(col("cnrm").cast("double"))

  /** (vec_id, cl): each vector's max-cosine centroid (ties: smaller cl).
    * Argmax as `max(struct(scos, -cl))` — a hash aggregate with map-side
    * partial combine (each task reduces its n·nlist candidate rows to one
    * per local vector before the exchange), where the equivalent
    * row_number window would sort-shuffle ALL n·nlist rows. Struct
    * ordering is lexicographic, so max scos wins and ties go to the
    * smaller cl via the negated id — identical semantics to the oracle's
    * `ORDER BY scos DESC, cl ASC ... rn = 1`. */
  private def assign(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cl"), centCos.as("scos"))
      .groupBy("vec_id")
      .agg(max(struct(col("scos"), (-col("cl")).as("ncl"))).as("m"))
      .select(col("vec_id"), (-col("m.ncl")).as("cl"))

  /** Top-2 probe assignment against a centroid table, in ONE
    * map-side-combining pass (r21): the bounded
    * [[graft.functions.TopKEdgesAgg]] keeps each vector's two best
    * centroids under (scos DESC, cl ASC) — the same ordering as
    * [[assign]]'s argmax and the oracle's `rn <= 2` window — so the
    * corpus is scored against the broadcast centroids ONCE where the
    * previous two-pass form (argmax, then argmax-over-remaining with
    * probe 1 re-attached) paid n·nlist dot products twice plus an n-row
    * co-shuffled join. Output rows identical: {argmax, argmax of the
    * rest}, and a vector emits a second probe only when ≥ 2 centroids
    * survive training (the buffer simply holds one entry otherwise).
    * The buffer's duplicate collapse is a no-op (cl values are distinct
    * per vector), and an all-NaN cosine vector degrades to the same
    * smallest-two-cl pick as the struct-max form (both orderings treat
    * NaN as greatest and tie to the smaller cl). */
  def assignTop2(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cl"), centCos.as("scos"))
      .groupBy("vec_id")
      .agg(VectorFunctions.topEdges(col("cl"), col("scos"), 2).as("tk"))
      .select(col("vec_id"), explode(col("tk")).as("e"))
      .select(col("vec_id"), col("e.dst").as("cl"))

  /** (cl, cv, cnrm): truncated integer means per list. The assignment
    * attach is an explicit co-shuffle — it is corpus-length, so letting
    * Catalyst broadcast it would OOM at real scale. */
  private def update(q: DataFrame, asg: DataFrame): DataFrame = {
    val dim = DedupOps.Dim
    val aggs = count(lit(1)).as("cnt") +:
      (0 until dim).map(i => sum(element_at(col("qv"), i + 1)).as(s"s$i"))
    q.join(asg.hint("shuffle_hash"), "vec_id")
      .groupBy("cl").agg(aggs.head, aggs.tail: _*)
      .select(col("cl"), array((0 until dim).map(i => expr(s"s$i div cnt")): _*).as("cv"))
      .withColumn("cnrm", VectorFunctions.dotLong(col("cv"), col("cv")))
  }
}
