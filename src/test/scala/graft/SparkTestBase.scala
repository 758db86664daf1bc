package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one JVM-wide session; ScalaTest
  * suites run sequentially under sbt's forked test JVM). Releases
  * operator caches after each suite so repeated minhash/LSH/cosine
  * pipelines don't accumulate MEMORY_AND_DISK frames across the run
  * (suites that override `afterAll` for their own teardown should call
  * `super.afterAll()`). */
trait SparkTestBase extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf0001 = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    CacheRegistry.releaseAll()
    super.afterAll()
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
