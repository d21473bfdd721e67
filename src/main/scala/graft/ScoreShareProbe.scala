package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pricing probe for the r16 verdict's candidate (b) — int8/int16-
  * quantized round-1 scoring with exact re-score of survivors. Any
  * quantized-scoring scheme can only cheapen the ARITHMETIC of the
  * descent's scoring stage (the 64-MAC dot product + two sqrts); the
  * pair GENERATION, the two vector-attach hash probes, and the top-k
  * contraction are untouched by it. So its best case is bounded by the
  * arithmetic share of the round cost — which this probe measures on a
  * round-1-shaped workload built from the real pieces (the quantized
  * frame, the broadcast vector attach, [[graft.functions
  * .VectorFunctions.topEdges]] as the contraction):
  *
  *  - `full`   — the production score: [[graft.functions
  *               .VectorFunctions.dotLong]] + the two norm sqrts;
  *  - `touch`  — arrays still attached and read, but the arithmetic
  *               collapsed to ONE element read + one multiply. This
  *               LOWER-bounds the per-row cost of ANY quantized scheme
  *               (int8 still reads both vectors and runs a MAC loop;
  *               `touch` reads one element of each), so
  *               (full − touch)/full UPPER-bounds candidate (b)'s
  *               possible saving on the scoring stage;
  *  - `idonly` — a literal score, letting Catalyst prune the vector
  *               columns from the attach joins entirely: the floor of
  *               the pair-stream + probe + contraction plumbing.
  *
  * The pair stream is synthetic ((rank, rank+i mod n) for i ≤ P) so the
  * probe isolates the scoring stage from seed construction; volume per
  * vector defaults to 8192 ≈ the measured round-1 FoF fan-out (≈1.6e9
  * pairs / 200k vectors at sf10 — see the descent's cost anatomy in
  * ARCHITECTURE.md). The arithmetic share is a per-row property, so a
  * smaller corpus at the same per-vector fan-out prices it; run at sf1.
  *
  * Usage: runMain graft.ScoreShareProbe [sfDir] [outJsonl] [pairsPerVec] [reps]
  */
object ScoreShareProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/sf1")
    val out = java.nio.file.Paths.get(args.lift(1).getOrElse("score_share.jsonl"))
    val perVec = args.lift(2).map(_.toInt).getOrElse(8192)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = Tables.session("score-share-probe",
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    val q = graft.operators.DedupOps.quantized(spark, dir)
    // rank-space ids: scale-point vec_ids are stride-remapped (sparse),
    // so neighbors are generated over a dense 0..n-1 rank
    val qr = q.withColumn("r",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("vec_id"))
          .cast("long") - 1)
      .select(col("r"), col("qv"), col("nrm")).localCheckpoint()
    val n = qr.count()
    val pairs = qr.select(col("r").as("ida"))
      .withColumn("i", explode(sequence(lit(1L), lit(perVec.toLong))))
      .select(col("ida"), pmod(col("ida") + col("i"), lit(n)).as("idb"))

    def scored(score: DataFrame => org.apache.spark.sql.Column): DataFrame = {
      val attached = pairs
        .join(broadcast(qr).as("a"), col("ida") === col("a.r"))
        .join(broadcast(qr).as("b"), col("idb") === col("b.r"))
      attached.select(col("ida"), col("idb"), score(attached).as("cosine"))
    }
    // the faithful consumer: the descent's bounded top-k contraction
    def contract(s: DataFrame): Long = s
      .groupBy("ida")
      .agg(graft.functions.VectorFunctions.topEdges(col("idb"), col("cosine"),
        graft.operators.SimilarityOps.DescentK).as("tk"))
      .select(explode(col("tk"))).count()

    val variants: Seq[(String, DataFrame)] = Seq(
      "full" -> scored { _ =>
        graft.functions.VectorFunctions.dotLong(col("a.qv"), col("b.qv"))
          .cast("double") / sqrt(col("a.nrm").cast("double")) /
          sqrt(col("b.nrm").cast("double"))
      },
      "touch" -> scored { _ =>
        (element_at(col("a.qv"), 1) * element_at(col("b.qv"), 1)).cast("double")
      },
      "idonly" -> scored(_ => lit(1.0)))

    variants.foreach { case (name, df) => contract(df) } // untimed warm-up pass
    variants.foreach { case (name, df) =>
      // [[BenchKit]] scaffolding: same escape table and GC-bracketed
      // timing as every other JSONL instrument. PROTOCOL CHANGE at v2
      // (r18): BenchKit.timed precedes each rep with System.gc(), which
      // the pre-r18 inline timing did not — rows without a `protocol`
      // field (tools/score_share_sf1.jsonl) are v1 and NOT like-for-like
      // comparable with these.
      val secs = (1 to reps).map(_ => BenchKit.timed(contract(df))).min
      BenchKit.writeLine(out,
        s"""{"variant":"${BenchKit.jstr(name)}","secs":$secs,"protocol":2,""" +
          s""""pairs":${n * perVec},"per_vec":$perVec,"sf":"${BenchKit.jstr(dir)}"}""")
    }
    spark.stop()
  }
}
