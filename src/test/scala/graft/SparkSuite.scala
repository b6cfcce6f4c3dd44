package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** One SparkSession for the whole forked test JVM (suites run
  * sequentially under `Test / fork := true`); never stopped so later
  * suites can't hit a dead context. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
