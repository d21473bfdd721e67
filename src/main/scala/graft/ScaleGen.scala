package graft

import org.apache.spark.sql.functions._

/** Scale-point generator: synthesizes an N× copy of an existing testdata
  * directory so the bench suite can measure each operator's COST CURVE
  * (sf0.1 → sf1) before a real cluster does. Usage:
  *
  *   runMain graft.ScaleGen [srcDir] [outDir] [copies]
  *
  * Replication preserves the statistical shape rather than just
  * concatenating rows:
  *  - fact/dimension keys are remapped per copy (stride 10M, far above
  *    every source key), so foreign-key fan-outs, group sizes, and join
  *    selectivities stay EXACTLY those of the source scale;
  *  - `events` copies get fresh user_ids — scaling adds users, it does
  *    not deepen per-user histories (which would distort window costs);
  *  - `documents` copies suffix EVERY word with a copy-specific marker,
  *    so copies are NOT near-duplicates of each other and the corpus
  *    duplicate DENSITY stays realistic (verbatim copies would multiply
  *    every near-dup cluster by copies²), while two docs in a copy share
  *    a word-k-shingle exactly when their sources do — per-shingle
  *    document frequencies, the quantity that drives inverted-index join
  *    fan-out, keep the source distribution. (An earlier interleaving
  *    scheme collided copy shingles on source BIGRAMS and inflated
  *    dedup_ngram_jaccard's scaling to ×104; suffixing measures ×13.)
  *    Copy 0 is the source corpus verbatim, so planted near-dup pairs
  *    survive;
  *  - `embeddings` copies keep their vectors (blocking structure and
  *    per-list sizes scale uniformly); ANN queries (vec_id < 10) and
  *    k-means init seeds (10..19) stay the original vectors;
  *  - `region`/`nation` are genuine dimensions and stay fixed, as in
  *    TPC-H itself.
  *
  * Everything is deterministic — no RNG — so a scale point is
  * reproducible bit-for-bit.
  */
object ScaleGen {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Tables.session("scale-gen")

    def replicated(name: String, keys: String*) = {
      val df = Tables.load(spark, src, name)
        .withColumn("_k", explode(sequence(lit(0L), lit(copies - 1L))))
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + col("_k") * Stride))
    }

    Seq("region", "nation").foreach { n =>
      Tables.load(spark, src, n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    Seq(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "embeddings" -> Seq("vec_id")
    ).foreach { case (n, ks) =>
      replicated(n, ks: _*).drop("_k").write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    replicated("documents", "doc_id")
      .withColumn("text",
        when(col("_k") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            w => concat(w, lit("zq"), col("_k"))))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_k")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[scale-gen] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
