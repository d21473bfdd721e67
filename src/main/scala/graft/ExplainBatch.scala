package graft

/** Batch formatted-plan dump — writes `<name>_<suffix>.txt` per query into
  * an output directory, all from ONE session (the per-JVM cost of
  * [[ExplainQuery]] made the r21 plan-artifact sweep impractical at ~45
  * queries × 2 trees).
  *
  * Usage: runMain graft.ExplainBatch <outDir> <suffix> [name ...]
  * (no names = every suite query). SPARK_GRAFT_SF_DIR picks the data dir
  * (default sf0.1 — the bench's scale, so the plans match the claims);
  * the dir must exist — the tool fails fast otherwise (r21 advice).
  * CAVEAT: "only dumping plans" still EXECUTES the eager-checkpoint
  * stages of the descent family (multi-second jobs) — the written plan
  * is the composed tail over checkpoint leaves, which is exactly what
  * executes at query time.
  *
  * Note: queries that build eager checkpoints while CONSTRUCTING their
  * DataFrame (the descent family) execute those stages during the dump —
  * the written plan is the final composed tail over checkpoint leaves,
  * which is exactly what executes at query time.
  */
object ExplainBatch {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ExplainBatch <outDir> <suffix> [name ...] — NOTE: dumping a " +
        "descent-family plan executes its eager checkpoint stages")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)),
      s"data dir '$dir' does not exist — set SPARK_GRAFT_SF_DIR")
    java.nio.file.Files.createDirectories(outDir)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val spark = Tables.session("explain-batch")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), s)
      println(s"[explain-batch] wrote $n")
      Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
