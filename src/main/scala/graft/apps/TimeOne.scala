package graft.apps

import graft.SparkEntry
import graft.core.GraftSession

/** Dev micro-timer: run ONE named query N times on a dir, print seconds
  * (min-of-N, full materialization like Bench). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.build("graft-timeone")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count() // warm
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
