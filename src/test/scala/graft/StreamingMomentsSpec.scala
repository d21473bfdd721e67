package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{EmbeddingStream, EventStream}

/** The twelfth streaming twin pair: the embedding moments (covariance /
  * top-component front-end) as sharded bounded-state streaming
  * aggregation. Unlike the event twins this one drives the NATIVE
  * TypedImperativeAggregate through the streaming state store's
  * serialize/merge cycle across micro-batches — the path a long-running
  * ingestion pipeline exercises. */
class StreamingMomentsSpec extends SparkTestBase {

  test("sharded streaming moments snapshot equals the batch one-pass aggregate") {
    val src = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    // split the fixture into several files so AvailableNow +
    // maxFilesPerTrigger=1 runs a genuinely multi-batch stream (state
    // must serialize between batches, late shards must merge)
    val dir = java.nio.file.Files.createTempDirectory("emb-stream").toString
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val snap = EventStream.runToMemory(
      EmbeddingStream.momentsState(stream), "moments_state",
      OutputMode.Complete())
    // bounded state: at most 64 shard rows no matter the corpus
    assert(snap.count() <= 64)
    val streamed = EmbeddingStream.momentsRollup(snap).head()
    val batch = graft.operators.DedupOps.quantized(spark, sf)
      .agg(graft.functions.VectorFunctions.vectorMoments(col("qv"),
        graft.operators.DedupOps.Dim).as("m"))
      .select(col("m.n").as("n"), col("m.s1").as("s1"), col("m.s2").as("s2"))
      .head()
    assert(streamed.getLong(0) === batch.getLong(0))
    assert(streamed.getSeq[Any](1) === batch.getSeq[Any](1))
    assert(streamed.getSeq[Any](2) === batch.getSeq[Any](2))
    // and the composed read-side agrees end-to-end: the streamed totals
    // carry the exact integers the covariance consumes, so n·s_ij −
    // s_i·s_j is bit-identical — spot-check the (0,0) diagonal entry
    val n = streamed.getLong(0)
    val s1 = streamed.getSeq[java.math.BigDecimal](1)
    val s2 = streamed.getSeq[java.math.BigDecimal](2)
    val c00 = BigDecimal(s2.head) * n - BigDecimal(s1.head) * BigDecimal(s1.head)
    val cov = graft.operators.SimilarityOps.embeddingCovariance(spark, sf)
      .filter(col("i") === 0 && col("j") === 0).head()
    // the covariance contract ships the exact moments as digit strings
    val c00Batch = BigDecimal(cov.getString(5)) * cov.getLong(2) -
      BigDecimal(cov.getString(3)) * BigDecimal(cov.getString(4))
    assert(c00 === c00Batch)
  }
}
