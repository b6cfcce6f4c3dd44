package graft.apps

import org.apache.spark.sql.SparkSession

/** Smoke entry point mirroring the driver's t1 check: runs
  * `SparkEntry.entry` (flagship word count, SURVEY.md §7.2 M0) on
  * sf0.001 and prints the row count + a sample. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    spark.stop()
  }
}
