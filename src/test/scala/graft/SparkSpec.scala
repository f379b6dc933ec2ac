package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for every suite (Spark re-init per suite
  * would dominate test wall-clock). Built through [[Sessions.builder]] so
  * tests run the exact session config Verify/Bench use.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.get("graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  def sfDir: String = SparkTestSession.sf0001
}
