package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (getOrCreate is idempotent,
  * so every suite sees the same configured session). */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local("graft-test")
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  /** Smallest test SF — specs that read driver testdata use this. */
  val sfDir = "/root/testdata/sf0.001"
}
