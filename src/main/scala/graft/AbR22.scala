package graft

import org.apache.spark.sql.functions._

/** Same-JVM adjacent A/B for the r22 loop-tail work (the AbBench
  * discipline: the shared machine drifts ±2× across processes, so every
  * variant pair runs inside ONE JVM, adjacently, in BOTH orders, and the
  * analysis quotes the order-cancelled geomean).
  *
  * This revision carries the BALANCED AQE pairs: the identical shipped
  * code path runs twice with only [[graft.operators.IterLoop.aqeOverride]]
  * flipped, so the measured delta is attributable to AQE's per-exchange
  * stage-jobs versus its runtime join re-planning and nothing else.
  *
  *  1. `pr_aqe_off` / `pr_aqe_on` — [[graft.operators.SimilarityOps.pageRankOverGraph]]
  *     over a shared pre-checkpointed refined-graph edge relation
  *     (build cost excluded); every loop join is shuffle_hash-hinted,
  *     so the hypothesis is that AQE has nothing to improve here.
  *  2. `cl_aqe_off` / `cl_aqe_on` — the full
  *     [[graft.operators.DedupOps.nearDupClusters]] query (the label-
  *     propagation loop is ~1/3 of it; the shingle pipeline ahead of it
  *     is identical in both variants and order-cancels).
  *
  * (The first revision of this tool carried the r22 star-contraction
  * restructure pairs; their measurements live in tools/ab_r22_star.jsonl
  * and the restructure was reverted on that evidence — see the negative-
  * result note in DedupOps.starComponentsCore.)
  *
  * Usage: runMain graft.AbR22 [sfDir] [outJsonl] [reps]
  */
object AbR22 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get(args.lift(1).getOrElse("ab_r22.jsonl"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Tables.session("ab-r22",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def record(name: String, secs: Double): Unit = BenchKit.record(out, name, secs, dir)
    BenchKit.sentinel(spark, out, "start", dir)

    // one shared edge checkpoint — the exact relation Bench's derived
    // consumers score (graph build cost excluded from every variant)
    val g = graft.operators.SimilarityOps.knnGraphRefinedEdges(spark, dir)
      .select(col("ida"), col("idb")).localCheckpoint()
    g.count()
    Caches.release(); spark.catalog.clearCache()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def prRun(): Unit =
      noop(graft.operators.SimilarityOps.pageRankOverGraph(spark, dir, g, 10))
    def clRun(): Unit =
      noop(graft.operators.DedupOps.nearDupClusters(spark, dir))

    def cycle(tag: String, aqeOff: Boolean, run: () => Unit): Unit = {
      Caches.release(); spark.catalog.clearCache(); System.gc()
      graft.operators.IterLoop.aqeOverride = Some(aqeOff)
      try record(tag, BenchKit.timed(run()))
      finally graft.operators.IterLoop.aqeOverride = None
    }
    // warm-ups, then reps in both orders, adjacently
    prRun(); clRun()
    (1 to reps).foreach { _ =>
      cycle("pr_aqe_off", aqeOff = true, () => prRun())
      cycle("pr_aqe_on", aqeOff = false, () => prRun())
      cycle("pr_aqe_on", aqeOff = false, () => prRun())
      cycle("pr_aqe_off", aqeOff = true, () => prRun())
    }
    (1 to reps).foreach { _ =>
      cycle("cl_aqe_off", aqeOff = true, () => clRun())
      cycle("cl_aqe_on", aqeOff = false, () => clRun())
      cycle("cl_aqe_on", aqeOff = false, () => clRun())
      cycle("cl_aqe_off", aqeOff = true, () => clRun())
    }
    BenchKit.sentinel(spark, out, "end", dir)
    spark.stop()
  }
}
