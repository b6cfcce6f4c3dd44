package graft.apps

import org.apache.spark.sql.SparkSession

/** Smoke entry point mirroring the driver's t1 check: runs
  * `SparkEntry.entry` (flagship word count, SURVEY.md §7.2 M0) on
  * sf0.001 and prints the row count + a sample. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.build("graft-smoke")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    spark.stop()
  }
}
