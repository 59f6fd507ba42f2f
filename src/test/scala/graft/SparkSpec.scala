package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM per `sbt test` fork; building
  * a session per suite would dominate the wall time). local[4] with 4
  * shuffle partitions — small enough to keep streaming tests fast,
  * parallel enough to catch partition-dependent bugs.
  */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = GraftSession.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
}
