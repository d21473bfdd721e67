package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the whole suite (session startup dominates
  * test wall-clock otherwise). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.shared
  val sf: String = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val shared: SparkSession = Tables.session("graft-test")
}
