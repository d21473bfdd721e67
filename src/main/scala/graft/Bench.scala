package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM / codegen / parquet footer caches so the first
    // timed query isn't charged for session initialization
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.names.foreach(n =>
      try graft.Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () })
    // optional comma-separated name filter for local iteration; the
    // driver never sets it, so the per-round bench is always the full
    // suite. Blank names are dropped so SPARK_GRAFT_ONLY="" means
    // no-filter rather than silently selecting zero queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    only.foreach { names =>
      val missing = names -- selected.keySet
      require(missing.isEmpty, s"SPARK_GRAFT_ONLY names not found: $missing")
    }
    // min of REPS runs per query: single-rep timings on a shared machine
    // proved too noisy to attribute regressions (see ARCHITECTURE.md);
    // the min is the least-interference estimate of the plan's cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        // clear caches so each query is timed standalone (operators that
        // cache internally would otherwise borrow earlier queries' work);
        // release() additionally drains the registry so unpersist isn't
        // deferred to catalog-wide eviction
        Caches.release()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also persist the result line: the stdout route is lossy (log
    // interleaving has left round artifacts with parsed=null), and a
    // file keeps the per-query numbers machine-readable regardless
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line + "\n")
    spark.stop()
  }
}
