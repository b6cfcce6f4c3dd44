package graft.apps

import graft.SparkEntry
import graft.core.GraftSession

/** Dev micro-timer: run ONE named query N times on a dir, print seconds
  * (min-of-N, full materialization like Bench). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.apps.TimeOne <queryName> [sfDir] [n]")
      sys.exit(2)
    }
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.build("graft-timeone")
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
      throw new IllegalStateException("unreachable")
    })
    fn(spark, dir).queryExecution.toRdd.count() // warm on the target dir
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeone] $name min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
