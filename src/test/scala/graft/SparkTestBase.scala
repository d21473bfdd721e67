package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the whole suite (session startup dominates
  * test wall-clock otherwise). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.shared
  val sf: String = "/root/testdata/sf0.001"
  private val suiteT0 = System.nanoTime()
  override def afterAll(): Unit = {
    // wall-time attribution for the parallel forked groups (the sbt
    // summary aggregates; this is the per-suite number)
    println(f"[suite-time] ${getClass.getSimpleName} ${(System.nanoTime() - suiteT0) / 1e9}%.1f s")
    super.afterAll()
  }
}

object SparkTestBase {
  lazy val shared: SparkSession = Tables.session("graft-test")
}
