package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared single local session for all suites. taskMaxFailures = 3 gives
  * local mode the cluster's task-retry behavior (local[4] alone never
  * retries), which FaultToleranceSpec exercises and no healthy suite
  * ever triggers. */
object SparkSpec {
  lazy val spark: SparkSession =
    GraftSession.local(cores = 4, shufflePartitions = 4, appName = "graft-test", taskMaxFailures = 3)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf = "/root/testdata/sf0.001"
}
