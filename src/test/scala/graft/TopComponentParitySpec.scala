package graft

import graft.operators.SimilarityOps

/** Parity witness for the r21 driver-side power iteration: the
  * dimension-sized matvec/rescale rounds moved from 10 chained Spark jobs
  * to BigInt arithmetic on the driver, and this spec pins that the move
  * is byte-identical — same component_ppm longs, bit-equal eigenvalue
  * double, same schema — against the kept DataFrame-iterated form. */
class TopComponentParitySpec extends SparkTestBase {

  test("driver-side power iteration is byte-identical to the DataFrame form") {
    Caches.withScope {
      val m = SimilarityOps.momentsOf(spark, sf)
      val fast = SimilarityOps.topComponent(spark, sf).collect()
      val slow = SimilarityOps.topComponentFromDistributed(m).orderBy("i").collect()
      assert(fast.length == slow.length)
      fast.zip(slow).foreach { case (f, s) =>
        assert(f.getLong(0) == s.getLong(0), "i")
        assert(f.getLong(1) == s.getLong(1), s"component_ppm at i=${f.getLong(0)}")
        assert(java.lang.Double.doubleToRawLongBits(f.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(s.getDouble(2)),
          s"eigenvalue bits at i=${f.getLong(0)}")
      }
      val fastTypes = SimilarityOps.topComponent(spark, sf).schema
        .fields.map(f => (f.name, f.dataType)).toSeq
      val slowTypes = SimilarityOps.topComponentFromDistributed(m).schema
        .fields.map(f => (f.name, f.dataType)).toSeq
      assert(fastTypes == slowTypes)
    }
  }
}
