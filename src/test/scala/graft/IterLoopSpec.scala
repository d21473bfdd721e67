package graft

import graft.operators.IterLoop

/** Behavioral pins for the session-global shuffle-partition scope used
  * by iterative tails on node-sized frames, plus the single-scope
  * guard's reset-on-failure semantics — a latched guard would fail every
  * later loop in the session with a misleading concurrency error. */
class IterLoopSpec extends SparkTestBase {

  private def parts: Int = spark.conf.get("spark.sql.shuffle.partitions").toInt

  test("withLoopPartitions lowers to the row-derived count and restores") {
    val default = parts
    assert(default > 1, "suite session must start above 1 shuffle partition")
    val seen = IterLoop.withLoopPartitions(spark, Some(100L))(parts)
    assert(seen === 1) // 100 rows → 1 partition
    assert(parts === default)
  }

  test("the scope never raises above the session default") {
    val default = parts
    val seen = IterLoop.withLoopPartitions(spark, Some(Long.MaxValue / 2))(parts)
    assert(seen === default)
    assert(parts === default)
  }

  test("nested scopes fail loudly and the failure does not latch the guard") {
    val default = parts
    val ex = intercept[IllegalArgumentException] {
      IterLoop.withLoopPartitions(spark, None) {
        IterLoop.withLoopPartitions(spark, Some(1L))(())
      }
    }
    assert(ex.getMessage.contains("withLoopPartitions"))
    assert(parts === default)
    // the outer scope exited through the inner throw — a later scope
    // must still be admitted (the r12-advice latch regression)
    assert(IterLoop.withLoopPartitions(spark, Some(1L))(42) === 42)
    assert(parts === default)
  }

  test("a throw from the body restores the default and releases the guard") {
    val default = parts
    intercept[RuntimeException] {
      IterLoop.withLoopPartitions(spark, Some(1L))(throw new RuntimeException("boom"))
    }
    assert(parts === default)
    assert(IterLoop.withLoopPartitions(spark, None)(7) === 7)
  }
}
