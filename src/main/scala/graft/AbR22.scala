package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM adjacent A/B for the r22 loop-tail work (the AbBench
  * discipline: the shared machine drifts ±2× across processes, so every
  * variant pair runs inside ONE JVM, adjacently, in BOTH orders, and the
  * analysis quotes the order-cancelled geomean).
  *
  * This revision carries the FIXPOINT-TAIL pairs — the shipped star
  * loop (lazy per-round checkpoint materialized by its count, plus the
  * star-forest structural convergence probe that stops one identity
  * round early) against the r21 form (eager checkpoint + count,
  * comparison-only convergence), both over the same pre-checkpointed
  * edge relation with outputs asserted identical before timing:
  *
  *  1. `star_probe_new` / `star_probe_old` — DedupOps.starComponentsCore
  *     as shipped vs the r21 loop inlined verbatim.
  *  2. `labels_new` / `labels_old` — the nearDupClusters label-
  *     propagation loop's lazy-vs-eager checkpoint question, both
  *     inlined over the same pair checkpoint (the shipped query buries
  *     the loop under the shingle pipeline, which would dilute the A/B).
  *
  * Prior revisions of this tool (measurements kept, code superseded):
  * rev1 star restructure pairs → tools/ab_r22_star.jsonl (rejected,
  * 1.10–1.16× slower); rev2 balanced AQE pairs via IterLoop.aqeOverride
  * → tools/ab_r22_aqe.jsonl (AQE-off rejected: 1.16× slower on pagerank,
  * flat on label propagation).
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
    // consumers label (graph build cost excluded from every variant)
    val g = graft.operators.SimilarityOps.knnGraphRefinedEdges(spark, dir)
      .select(col("ida").as("doc_a"), col("idb").as("doc_b")).localCheckpoint()
    g.count()
    Caches.release(); spark.catalog.clearCache()

    // ---- r21 starComponentsCore, inlined verbatim (eager checkpoints,
    // comparison-only convergence)
    def starOld(pairs: DataFrame): DataFrame = {
      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
          .toDF("n", "nbr")
        val mins = sym.groupBy("n").agg(min("nbr").as("mn"))
        sym.join(mins, "n")
          .filter(col("nbr") > col("n"))
          .select(col("nbr").as("u"), least(col("n"), col("mn")).as("v"))
          .distinct()
      }
      def smallStar(e: DataFrame): DataFrame = {
        val mins = e.groupBy("u").agg(min("v").as("m"))
        val j = e.join(mins, "u")
        j.select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
          .unionByName(j.select(col("u"), col("m").as("v")))
          .distinct()
      }
      var cur = pairs.select(col("doc_b").as("u"), col("doc_a").as("v"))
        .distinct().localCheckpoint()
      var curCount = cur.count()
      var rounds = 0
      var converged = false
      graft.operators.IterLoop.withLoopPartitions(spark, Some(curCount)) {
        while (!converged && rounds < 50) {
          val next = smallStar(largeStar(cur)).localCheckpoint()
          val nextCount = next.count()
          converged = nextCount == curCount && next.except(cur).isEmpty
          graft.operators.DedupOps.unpersistCheckpoint(cur)
          cur = next
          curCount = nextCount
          rounds += 1
        }
      }
      require(converged, s"old star contraction did not converge in $rounds rounds")
      val members = cur.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      val roots = cur.select(col("v")).distinct()
        .select(col("v").as("doc_id"), col("v").as("cluster_id"))
      members.unionByName(roots)
    }

    def starNewRun(): Unit = { graft.operators.DedupOps.starComponentsCore(g).count(); () }
    def starOldRun(): Unit = { starOld(g).count(); () }

    // equivalence gate before timing: identical labelings or abort
    val newRows = graft.operators.DedupOps.starComponentsCore(g)
      .orderBy("doc_id", "cluster_id").collect().toSeq
    val oldRows = starOld(g).orderBy("doc_id", "cluster_id").collect().toSeq
    require(newRows == oldRows,
      s"star variants diverge: new=${newRows.size} rows old=${oldRows.size} rows")
    println(s"[ab-r22] star variants identical (${newRows.size} rows)")

    // ---- label propagation over the near-dup pair graph, lazy vs eager
    // round checkpoints (loop only; same seed, same convergence rule)
    val jp = graft.operators.DedupOps.ngramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    jp.count()
    def labelLoop(lazyCkpt: Boolean): DataFrame = {
      val edges = jp.unionByName(jp.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst").cache()
      var labels = edges.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("mn"))
        .select(col("node"), least(col("node"), col("mn")).as("label"))
        .localCheckpoint(eager = !lazyCkpt)
      def labelSum(df: DataFrame): Long =
        Option(df.agg(sum(col("label"))).head.get(0)).fold(0L)(_.asInstanceOf[Long])
      var prevSum = Long.MaxValue
      var curSum = labelSum(labels)
      var rounds = 0
      graft.operators.IterLoop.withLoopPartitions(spark, Some(labels.count())) {
        while (curSum != prevSum && rounds < 50) {
          val nbrMin = edges.join(labels, col("src") === col("node"))
            .groupBy(col("dst")).agg(min(col("label")).as("nbr_label"))
          val next = labels.join(nbrMin, col("node") === col("dst"), "left")
            .select(col("node"),
              least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
            .localCheckpoint(eager = !lazyCkpt)
          prevSum = curSum
          curSum = labelSum(next)
          graft.operators.DedupOps.unpersistCheckpoint(labels)
          labels = next
          rounds += 1
        }
      }
      require(curSum == prevSum, s"label propagation did not converge in $rounds rounds")
      edges.unpersist()
      labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
    }
    def labelsNewRun(): Unit = { labelLoop(lazyCkpt = true).count(); () }
    def labelsOldRun(): Unit = { labelLoop(lazyCkpt = false).count(); () }

    def cycle(tag: String, run: () => Unit): Unit = {
      Caches.release(); spark.catalog.clearCache(); System.gc()
      record(tag, BenchKit.timed(run()))
    }
    // warm-ups, then reps in both orders, adjacently
    starNewRun(); starOldRun()
    (1 to reps).foreach { _ =>
      cycle("star_probe_new", () => starNewRun()); cycle("star_probe_old", () => starOldRun())
      cycle("star_probe_old", () => starOldRun()); cycle("star_probe_new", () => starNewRun())
    }
    labelsNewRun(); labelsOldRun()
    (1 to reps).foreach { _ =>
      cycle("labels_new", () => labelsNewRun()); cycle("labels_old", () => labelsOldRun())
      cycle("labels_old", () => labelsOldRun()); cycle("labels_new", () => labelsNewRun())
    }
    BenchKit.sentinel(spark, out, "end", dir)
    spark.stop()
  }
}
