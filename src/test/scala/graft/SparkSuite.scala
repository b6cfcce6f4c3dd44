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

  /** Run `body` with the given SQL confs set, restoring prior values
    * after (the session is shared across suites — leaked conf would
    * bleed into later tests). */
  def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
