package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.streaming.DedupStream

/** The fourteenth streaming twin pair: MinHash-LSH near-dup candidates
  * as a monotone changelog. Candidate generation streams (stateless
  * per-row banding + bucket-keyed state); exact-Jaccard verification is
  * the batch operator's own code path over the corpus shingle store. */
class StreamingLshSpec extends SparkTestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("the stateless band expression equals the batch signature banding on the fixture") {
    // batch band table, rebuilt the way minhashLsh builds it
    val sh = DedupOps.shingleTable(spark, sf)
    val hashed = sh.withColumn("h0", pmod(col("h"), lit(2147483647L)))
    val sigCols = (0 until 16).map { i =>
      min(pmod(col("h0") * lit(31L * i + 7L) + lit(17L * i + 3L), lit(2147483647L))).as(s"s$i")
    }
    val sigs = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val batch = sigs.select(col("doc_id"),
        explode(array((0 until 8).map(b =>
          concat_ws("_", lit(b), col(s"s${2 * b}"), col(s"s${2 * b + 1}"))): _*)).as("band"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val stateless = DedupStream.bandedDocs(Tables.load(spark, sf, "documents"))
      .collect().map(b => (b.doc_id, b.band)).toSet
    assert(stateless === batch)
    assert(stateless.nonEmpty)
  }

  test("streaming LSH changelog, verified, equals the batch minhashLsh on the bounded fixture") {
    val deltas = graft.streaming.EventStream.runToMemory(
      DedupStream.lshCandidateDeltas(DedupStream.readBandedDocuments(spark, sf)).toDF(),
      "lsh_deltas_bounded")
    val streamed = pairs(DedupStream.lshRollup(spark, sf, deltas))
    val batch = pairs(DedupOps.minhashLsh(spark, sf))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("documents too short to shingle produce no bands (no degenerate-bucket collisions)") {
    import spark.implicits._
    // shingles() yields an EMPTY array below 3 tokens — the band guard
    // must be on size, not nullity, or every short doc collides in the
    // same 8 buckets the batch operator never creates
    val short = Seq((1L, "one two"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    assert(DedupStream.bandedDocs(short).count() === 0)
    val ok = Seq((4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(DedupStream.bandedDocs(ok).count() === 8)
  }

  test("a late near-duplicate emits only its new pairs; redelivery emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three docs long enough to shingle; a and b are identical (same
    // signature, collide in all 8 bands), c is unrelated
    val textA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val textC = (1 to 20).map(i => s"gamma$i").mkString(" ")
    val input = MemoryStream[(Long, String)]
    val banded = DedupStream.bandedDocs(input.toDF().toDF("doc_id", "text"))
    val q = DedupStream.lshCandidateDeltas(banded).toDF()
      .writeStream.format("memory").queryName("lsh_deltas_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-lsh-late").toString)
      .start()
    input.addData((5L, textA), (9L, textC))
    q.processAllAvailable()
    assert(spark.table("lsh_deltas_late").count() === 0) // no collision yet
    // doc 7 arrives late, identical to doc 5 → pair (5,7) once per band
    input.addData((7L, textA))
    q.processAllAvailable()
    val afterLate = spark.table("lsh_deltas_late")
    assert(afterLate.select("doc_a", "doc_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((5L, 7L)))
    assert(afterLate.count() === 8) // all 8 bands collide for identical docs
    // redelivery of the same doc emits nothing new
    input.addData((7L, textA))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("lsh_deltas_late").count() === 8)
  }
}
