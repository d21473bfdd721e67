package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared shuffle-partition scope for iterative tails (PageRank rounds,
  * cluster fixpoints, the power iteration): the loop frames are node- or
  * dimension-sized, so they plan under a DATA-derived partition count
  * (~100k rows per partition, capped at the session default so a real
  * cluster keeps its configured parallelism) and the default is restored
  * on every exit path. One definition instead of four hand-rolled
  * try/finally blocks, each mutating session-global state.
  *
  * Callers must materialize anything corpus-scale BEFORE entering the
  * scope (an eager checkpoint or count) — a lazy corpus lineage first
  * evaluated inside would run under the reduced parallelism. */
private[graft] object IterLoop {

  /** Guards the session-global conf mutation below: the override is
    * only sound while exactly one loop scope is active (a concurrent
    * query would plan under the reduced count; a nested scope would
    * "restore" the outer scope's reduced value as the default). Fail
    * loudly instead of silently mis-planning. */
  private val active = new java.util.concurrent.atomic.AtomicBoolean(false)

  def withLoopPartitions[T](spark: SparkSession, rows: Option[Long])(body: => T): T =
    scoped(spark, "withLoopPartitions") { defaultParts =>
      rows
        .map(n => math.max(1L, math.min(defaultParts.toLong, n / 100000L + 1)).toInt)
        .getOrElse(defaultParts)
    }(body)

  /** The RAISING twin of [[withLoopPartitions]], for iterative builds
    * whose per-round relations EXCEED memory at the session default
    * (the descent's k'²·n candidate space): scope a row-volume-derived
    * HIGHER partition count so each shuffle task's sort/aggregate fits
    * in memory instead of cascading through the external sorter's
    * multi-pass spill. Never goes below the session default (small
    * volumes are a no-op) and caps at 1024; AQE re-coalesces the
    * loop's small exchanges, so only the giant stages keep the width.
    * Same single-scope guard — the two scope kinds share it, which is
    * correct because neither may run inside the other. */
  def withWideShuffle[T](spark: SparkSession, rows: Long,
      rowsPerPartition: Long = 8000000L)(body: => T): T =
    scoped(spark, "withWideShuffle") { defaultParts =>
      math.min(1024L, math.max(defaultParts.toLong, rows / rowsPerPartition)).toInt
    }(body)

  private def scoped[T](spark: SparkSession, label: String)
      (pick: Int => Int)(body: => T): T = {
    require(active.compareAndSet(false, true),
      s"IterLoop.$label: concurrent or nested loop scopes — " +
        "the session-global shuffle-partition override would leak between them")
    // EVERYTHING after the successful CAS sits inside the try: a throw
    // from the conf reads below would otherwise latch active=true for
    // the rest of the session and fail every later loop with a
    // misleading concurrency error (r12 advice)
    try {
      val conf = spark.conf
      val defaultParts = conf.get("spark.sql.shuffle.partitions").toInt
      val loopParts = pick(defaultParts)
      try {
        conf.set("spark.sql.shuffle.partitions", loopParts)
        body
      } finally conf.set("spark.sql.shuffle.partitions", defaultParts)
    } finally active.set(false)
  }
}
