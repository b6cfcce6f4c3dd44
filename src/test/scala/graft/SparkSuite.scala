package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** One SparkSession for the whole forked test JVM (suites run
  * sequentially under `Test / fork := true`); never stopped so later
  * suites can't hit a dead context. */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[n,2]: permit ONE task retry, matching a real cluster's
    // spark.task.maxFailures > 1 — RetryDeterminismSpec injects a
    // transient first-attempt failure and asserts operator output is
    // unchanged, which local[n]'s maxFailures=1 cannot express. Every
    // other suite is unaffected: a deterministic test failure fails its
    // second attempt identically.
    val s = GraftSession.builder("graft-test")
      .master(s"local[${GraftSession.cpus},2]")
      .getOrCreate()
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
