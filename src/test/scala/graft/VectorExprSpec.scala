package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class VectorExprSpec extends SparkTestBase {

  import spark.implicits._

  test("graft_dot: native expression matches the interpreted higher-order form") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (2L, Seq(-7L, 0L, 1000000L), Seq(3L, 9L, 2L)),
      (3L, Seq.empty[Long], Seq.empty[Long])
    ).toDF("id", "a", "b")
    val native = df.select($"id", VectorFunctions.dotLong($"a", $"b").as("d"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val interpreted = df.select($"id",
      aggregate(zip_with($"a", $"b", _ * _), lit(0L), _ + _).as("d"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(native === interpreted)
    assert(native.toMap.apply(1L) === 32L)
  }

  test("graft_dot: null input array yields null") {
    val df = Seq((1L, Option(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("id", "a", "b")
    val r = df.select(VectorFunctions.dotLong($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("graft_dot: generated code compiles and runs (no interpreted fallback)") {
    // CODEGEN_ONLY turns silent fallback-to-eval into a hard failure, so
    // this test proves doGenCode's emitted Java actually compiles.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val emb = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1000000).cast("long")).as("qv"))
      val total = emb.as("a").join(emb.as("b"), col("a.vec_id") === col("b.vec_id"))
        .select(VectorFunctions.dotLong(col("a.qv"), col("b.qv")).as("d"))
        .agg(sum("d")).collect().head.getLong(0)
      assert(total > 0L) // Σ ||v||² over the corpus
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("graft_dot: SQL-registered via GraftExtensions (Tables.session route)") {
    val d = spark.sql(
        "SELECT graft_dot(array(2L, 3L), array(4L, 5L)) AS d")
      .collect().head.getLong(0)
    assert(d === 23L)
  }

  test("graft_dot: agrees with the interpreted cosine on real embedding pairs") {
    val q = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000).cast("long")).as("qv"))
      .localCheckpoint() // barrier: keep the transform from re-inlining per consumer
    val pairs = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
    val native = pairs.select(col("a.vec_id"), col("b.vec_id"),
        VectorFunctions.dotLong(col("a.qv"), col("b.qv")).as("d"))
      .orderBy("a.vec_id", "b.vec_id").collect().map(_.getLong(2))
    val interpreted = pairs.select(col("a.vec_id"), col("b.vec_id"),
        aggregate(zip_with(col("a.qv"), col("b.qv"), _ * _), lit(0L), _ + _).as("d"))
      .orderBy("a.vec_id", "b.vec_id").collect().map(_.getLong(2))
    assert(native.length === 190)
    assert(native === interpreted)
  }

  test("graft_vector_moments: multi-partition aggregate equals the naive sums " +
    "through the flush, merge and serialize paths") {
    // dim 4 keeps the naive side cheap; > FlushRows rows force the
    // Long-hot → BigInteger-cold flush; 7 partitions force merges of
    // serialized partials
    val dim = 4
    val n = graft.functions.VectorMomentsAgg.FlushRows + 1234
    def vec(id: Int): Array[Long] =
      Array.tabulate(dim)(i => ((id * 31 + i * 17) % 2001 - 1000).toLong)
    val df = (0 until n).map(id => Tuple1(vec(id).toSeq)).toDF("qv")
      .repartition(7)
    val row = df.agg(VectorFunctions.vectorMoments($"qv", dim).as("m"))
      .select("m.n", "m.s1", "m.s2").head()
    assert(row.getLong(0) === n.toLong)
    val s1 = row.getSeq[java.math.BigDecimal](1).map(_.longValueExact())
    val s2 = row.getSeq[java.math.BigDecimal](2).map(_.longValueExact())
    val vs = (0 until n).map(vec)
    (0 until dim).foreach { i =>
      assert(s1(i) === vs.map(_(i)).sum, s"s1($i)")
    }
    var p = 0
    (0 until dim).foreach { i =>
      (i until dim).foreach { j =>
        assert(s2(p) === vs.map(v => v(i) * v(j)).sum, s"s2($i,$j)")
        p += 1
      }
    }
  }
}
