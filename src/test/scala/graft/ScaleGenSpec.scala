package graft

import org.apache.spark.sql.functions._

/** ScaleGen's per-copy embedding transform: the scale-point generator must
  * not manufacture N² same-block exact duplicates (the round-6 flaw), and
  * must not distort within-copy geometry — the quantity every embedding
  * bench number is measured on.
  */
class ScaleGenSpec extends SparkTestBase {

  private val dim = 64
  private val nVec = 24

  /** Deterministic pseudo-random floats in [-1, 1], no RNG. */
  private def vec(id: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      val h = (id * 1315423911 + i * 2654435761L.toInt) & 0x7fffffff
      (h % 2001 - 1000) / 1000.0f
    }

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.BigDecimal(x.toDouble * 1000000)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)

  private def dot(a: Array[Long], b: Array[Long]): Long =
    (0 until dim).map(i => a(i) * b(i)).sum

  private lazy val copies: Map[Int, Map[Int, Array[Float]]] = {
    import spark.implicits._
    val base = (0 until nVec).map(id => (id.toLong, vec(id)))
      .toDF("vec_id", "embedding")
    (0 to 3).map { k =>
      k -> base
        .withColumn("embedding", ScaleGen.perturbEmbedding(col("embedding"), lit(k.toLong)))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).toArray)
        .toMap
    }.toMap
  }

  test("copy 0 is verbatim") {
    (0 until nVec).foreach(id => assert(copies(0)(id).toSeq === vec(id).toSeq))
  }

  test("within-copy quantized dot products and norms are exactly the source's") {
    val q0 = (0 until nVec).map(id => id -> quant(copies(0)(id))).toMap
    (1 to 3).foreach { k =>
      val qk = (0 until nVec).map(id => id -> quant(copies(k)(id))).toMap
      (0 until nVec).foreach { a =>
        assert(dot(qk(a), qk(a)) === dot(q0(a), q0(a)), s"norm k=$k id=$a")
        ((a + 1) until nVec).foreach { b =>
          assert(dot(qk(a), qk(b)) === dot(q0(a), q0(b)), s"dot k=$k ($a,$b)")
        }
      }
    }
  }

  test("a vector and its copies are decorrelated, not near-duplicates") {
    val all = (0 to 3).map(k => k -> copies(k).map { case (id, v) => id -> quant(v) })
    val cosines = for {
      (ka, qa) <- all; (kb, qb) <- all if ka < kb
      id <- 0 until nVec
    } yield dot(qa(id), qb(id)).toDouble /
      math.sqrt(dot(qa(id), qa(id)).toDouble) / math.sqrt(dot(qb(id), qb(id)).toDouble)
    // verbatim copies would sit at exactly 1.0; a signed permutation of a
    // random-ish vector lands at random-level cosine (|E| ~ 1/√64)
    assert(cosines.map(math.abs).max < 0.6,
      s"max cross-copy |cosine| ${cosines.map(math.abs).max}")
    assert(cosines.map(math.abs).sum / cosines.size < 0.2)
  }

  test("re-application to its own output keeps every key collision-free") {
    // the sf10 lesson: a FIXED stride collides one decade later (sf1 ids
    // reach 9·10⁷, so sf1→sf10 under stride 10⁷ merged two documents
    // into one doc_id). The stride must be derived from the data.
    val out1 = java.nio.file.Files.createTempDirectory("sfgen1").toString
    val out2 = java.nio.file.Files.createTempDirectory("sfgen2").toString
    ScaleGen.run(spark, sf, out1, 2)
    ScaleGen.run(spark, out1, out2, 2)
    Seq("documents" -> "doc_id", "events" -> "event_id",
        "embeddings" -> "vec_id", "orders" -> "o_orderkey").foreach { case (t, k) =>
      val df = spark.read.parquet(s"$out2/$t.parquet")
      assert(df.count() === df.select(k).distinct().count(), s"$t.$k collided")
    }
  }

  test("a 2x scale point multiplies dedup output rows by exactly 2") {
    // the end-to-end form of the decorrelation property: near-dup DENSITY
    // is preserved, so the measured relation grows linearly in the copy
    // count — verbatim replication would grow the embedding pairs ~4x
    val out = java.nio.file.Files.createTempDirectory("sf2x").toString
    ScaleGen.run(spark, sf, out, 2)
    Seq("dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "dedup_minhash_lsh").foreach { q =>
      val src = SparkEntry.queries(q)(spark, sf).count()
      Caches.release(); spark.catalog.clearCache()
      val scaled = SparkEntry.queries(q)(spark, out).count()
      Caches.release(); spark.catalog.clearCache()
      assert(scaled === 2 * src, s"$q: $src rows at 1x, $scaled at 2x")
    }
  }
}
