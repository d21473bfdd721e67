package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM adjacent A/B (AbBench discipline) for the r22 star-seed
  * question: `star_noseed` — starComponentsCore without the seed
  * `.distinct()` (SHIPPED: every production caller feeds unique
  * canonical pairs, so the distinct was a full no-op exchange +
  * hash-dedup of the edge relation; measured 1.11×) — vs
  * `star_shipped` (pre-r22: seed distinct included, re-enabled via
  * DedupOps.starSeedDistinctOverride), both over the same
  * pre-checkpointed refined-graph edge relation, outputs asserted
  * identical before timing.
  *
  * (An earlier AbR22c revision priced the descent FoF combination
  * explode — rejected 1.32× slower, tools/ab_r22c.jsonl; the
  * rejection note lives at the twoHop join in SimilarityOps.)
  *
  * Usage: runMain graft.AbR22c [sfDir] [outJsonl] [reps]
  */
object AbR22c {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get(args.lift(1).getOrElse("ab_r22c2.jsonl"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Tables.session("ab-r22c",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def record(name: String, secs: Double): Unit = BenchKit.record(out, name, secs, dir)
    BenchKit.sentinel(spark, out, "start", dir)

    val g = graft.operators.SimilarityOps.knnGraphRefinedEdges(spark, dir)
      .select(col("ida").as("doc_a"), col("idb").as("doc_b")).localCheckpoint()
    g.count()
    Caches.release(); spark.catalog.clearCache()

    def noseed(): Unit = { graft.operators.DedupOps.starComponentsCore(g).count(); () }
    def shipped(): Unit = {
      graft.operators.DedupOps.starSeedDistinctOverride = Some(true)
      try { graft.operators.DedupOps.starComponentsCore(g).count(); () }
      finally graft.operators.DedupOps.starSeedDistinctOverride = None
    }

    val a = graft.operators.DedupOps.starComponentsCore(g)
      .orderBy("doc_id", "cluster_id").collect().toSeq
    graft.operators.DedupOps.starSeedDistinctOverride = Some(true)
    val b = try graft.operators.DedupOps.starComponentsCore(g)
        .orderBy("doc_id", "cluster_id").collect().toSeq
      finally { graft.operators.DedupOps.starSeedDistinctOverride = None }
    require(a == b, s"star variants diverge: shipped=${a.size} noseed=${b.size}")
    println(s"[ab-r22c] star variants identical (${a.size} rows)")

    def cycle(tag: String, run: () => Unit): Unit = {
      Caches.release(); spark.catalog.clearCache(); System.gc()
      record(tag, BenchKit.timed(run()))
    }
    shipped(); noseed()
    (1 to reps).foreach { _ =>
      cycle("star_noseed", () => noseed()); cycle("star_shipped", () => shipped())
      cycle("star_shipped", () => shipped()); cycle("star_noseed", () => noseed())
    }
    BenchKit.sentinel(spark, out, "end", dir)
    spark.stop()
  }
}
