package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.streaming.DedupStream
import graft.streaming.DedupStream.FpDoc

/** The thirteenth streaming twin pair: exact content-hash dedup as a
  * canonical-assignment changelog. The out-of-order hazard is a LATE
  * SMALLER ID — it takes over canonicality of its fingerprint group, so
  * the operator must retract every member's assignment and re-emit it
  * under the new canonical. */
class StreamingDedupSpec extends SparkTestBase {

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("streaming dedup changelog equals the batch exact dedup on the bounded fixture") {
    val deltas = graft.streaming.EventStream.runToMemory(
      DedupStream.exactDeltas(DedupStream.readDocuments(spark, sf)).toDF(),
      "dedup_deltas_bounded")
    val streamed = collectAssign(DedupStream.exactRollup(deltas))
    val batch = collectAssign(DedupOps.exact(spark, sf)
      .select("doc_id", "fp_md5", "canonical_id", "is_canonical"))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("a late smaller id takes over the group: retract all, re-emit under the new canonical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = DedupStream.withFingerprint(input.toDF().toDF("doc_id", "text"))
    val q = DedupStream.exactDeltas(docs).toDF()
      .writeStream.format("memory").queryName("dedup_deltas_late")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-dedup-late").toString)
      .start()
    // batch 1: docs 5 and 7 share a fingerprint (whitespace-insensitive),
    // doc 6 is unique → canonical 5 covers {5, 7}
    input.addData((5L, "hello world"), (7L, "hello  world"), (6L, "something else"))
    q.processAllAvailable()
    // batch 2: doc 2 arrives late with the same fingerprint → retract the
    // two existing assignments, re-emit {2, 5, 7} under canonical 2
    input.addData((2L, " hello world "))
    q.processAllAvailable()
    q.stop()
    val deltas = spark.table("dedup_deltas_late")
    assert(deltas.filter(col("delta") < 0).count() === 2)
    val net = DedupStream.exactRollup(deltas)
      .select("doc_id", "canonical_id", "is_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(net === Set((2L, 2L, 1L), (5L, 2L, 0L), (7L, 2L, 0L), (6L, 6L, 1L)))
  }

  test("at-least-once redelivery emits nothing new") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = DedupStream.withFingerprint(input.toDF().toDF("doc_id", "text"))
    val q = DedupStream.exactDeltas(docs).toDF()
      .writeStream.format("memory").queryName("dedup_deltas_redeliver")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-dedup-redeliver").toString)
      .start()
    input.addData((5L, "hello world"), (7L, "hello world"))
    q.processAllAvailable()
    val before = spark.table("dedup_deltas_redeliver").count()
    // the same rows again, plus a same-fingerprint duplicate in-batch
    input.addData((5L, "hello world"), (7L, "hello  world"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_deltas_redeliver").count() === before)
  }
}
