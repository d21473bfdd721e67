package graft

import graft.query.DatsGen

/** Two-mode bench for the seven canonical DATS queries: DIRECT (view
  * composition over the base parquet, re-deriving the entity graph per
  * query) vs MATERIALIZED (entity-table parquet written once by
  * [[DatsGen.materialize]], every query a plain scan). The reference's
  * own pipeline is the second shape — the ETL writes its instance once
  * and the query scripts re-read it — so this main converts the repo's
  * "at cluster scale the ETL materializes entity tables" claim into
  * measured rows (r15 verdict #1).
  *
  * Protocol matches the decade benches: untimed warm-up rep, then
  * `reps` timed reps per query, min reported; the materialize write is
  * timed once, separately — it is the deployment's one-off cost, not a
  * per-query cost.
  *
  * Usage: runMain graft.DatsModeBench [sfDir] [outJsonl] [reps]
  */
object DatsModeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get(args.lift(1).getOrElse("dats_mode_bench.jsonl"))
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = Tables.session("dats-mode-bench",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    // escape interpolated strings so a quote/backslash in a path can't
    // produce a malformed JSONL line
    def jstr(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def record(name: String, secs: Double): Unit = {
      val line = s"""{"name":"${jstr(name)}","secs":$secs,"sf":"${jstr(dir)}"}"""
      println(line)
      java.nio.file.Files.writeString(out, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    def timed(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // load sentinel (r16 verdict #2): same protocol as Bench — loadavg +
    // a fixed single-task calibration kernel, recorded as JSONL rows at
    // start and end so mode numbers are comparable across machine states
    def sentinel(tag: String): Unit = {
      val load = try java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+").take(3).mkString(",") catch { case _: Throwable => "" }
      System.gc()
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 1).selectExpr("sum(id)").collect()
      val calib = (System.nanoTime() - t0) / 1e9
      val line = s"""{"name":"sentinel_$tag","loadavg":[$load],"calib_sec":$calib,"sf":"${jstr(dir)}"}"""
      println(line)
      java.nio.file.Files.writeString(out, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }

    // same warm-up discipline as Bench: JVM/codegen + parquet footers
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "orders", "lineitem")
      .foreach(n => Tables.load(spark, dir, n).count())

    sentinel("start")
    val matDir = java.nio.file.Files.createTempDirectory("graft_dats_mode_").toString
    record("materialize", timed(DatsGen.materialize(spark, dir, matDir)))

    def bench(name: String, df: () => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = timed(df().count())
      once() // untimed warm-up
      record(name, (1 to reps).map(_ => once()).min)
    }
    (1 to 7).foreach { n =>
      bench(s"q${n}_direct", () => DatsGen.queryOver(n, DatsGen.graph(spark, dir)))
      bench(s"q${n}_mat",
        () => DatsGen.queryOver(n, graft.io.EntityStore.loadBucketed(spark, matDir)))
    }
    sentinel("end")
    spark.stop()
  }
}
