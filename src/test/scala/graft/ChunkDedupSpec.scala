package graft

import graft.operators.TextOps

/** Edge semantics of chunk-level exact dedup, pinned at unit scale (the
  * corpus-level relation is oracle-checked as text_chunk_dedup). */
class ChunkDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], chunkTokens: Int = 4) =
    TextOps.chunkDedupFrom(docs.toDF("doc_id", "text"), chunkTokens)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("an exact duplicate doc loses every chunk to the earlier doc") {
    val out = run(Seq(1L -> "a b c d e f g h", 2L -> "a b c d e f g h"))
    assert(out(1L) === ((2L, 2L, "a b c d e f g h")))
    assert(out(2L) === ((2L, 0L, "")))
  }

  test("a repeated chunk WITHIN a doc keeps only its first occurrence") {
    val out = run(Seq(1L -> "a b c d a b c d x y"))
    // chunks: [a b c d] [a b c d] [x y] — the middle one is a later copy
    assert(out(1L) === ((3L, 2L, "a b c d x y")))
  }

  test("first-wins is (doc_id, chunk_idx)-lexicographic, and the partial " +
    "tail chunk is its own unit") {
    val out = run(Seq(
      3L -> "p q r s a b c d",   // [p q r s] [a b c d]
      1L -> "x y z w a b c d"))  // [x y z w] [a b c d] <- wins (doc 1 < 3)
    assert(out(1L) === ((2L, 2L, "x y z w a b c d")))
    assert(out(3L) === ((2L, 1L, "p q r s")))
    val tail = run(Seq(1L -> "a b c d e f"))
    // [a b c d] [e f] — the 2-token tail is a distinct chunk
    assert(tail(1L) === ((2L, 2L, "a b c d e f")))
  }
}
