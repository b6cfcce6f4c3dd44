package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Args, GraftSession}
import graft.gen.SampleData
import graft.sinks.Sinks
import graft.sources.Sources
import graft.streaming.StreamingTwins

/** Runnable mirror of `WindowJoin.scala:50-81`: two rate-throttled
  * generated streams (grades, salaries) joined per name within a
  * tumbling window. The rate source is both the throttle (S8) and the
  * ingestion-time stamper; the LCG generator mapping is the S9 twin.
  *
  * Usage: --rate 3 --windowSize 2000 (ms) — the reference's defaults.
  */
object WindowJoinMain {
  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("window-join")
    val rate = a.getOrElse("rate", "3").toLong
    val winMs = a.getOrElse("windowSize", "2000").toLong

    def gen(idCol: String): DataFrame =
      SampleData.withGradeSalary(
        Sources.rateStream(spark, rate).withColumnRenamed("timestamp", "ts"),
        "value").withColumnRenamed("value", idCol)

    val grades = gen("g_id").select(col("ts"), col("name"), col("grade"), col("g_id"))
    val salaries = gen("s_id").select(col("ts"), col("name"), col("salary"), col("s_id"))
    val joined = StreamingTwins.windowedJoin(grades, salaries,
      "ts", "name", s"$winMs milliseconds")
      // Person(name, grade, salary) projection (`WindowJoin.scala:94`)
      .select(col("name"), col("grade"), col("salary"))
    val q = Sinks.consoleStream(joined, "append").start()
    a.get("runSeconds") match {
      case Some(s) => q.awaitTermination(s.toLong * 1000); q.stop(); spark.stop()
      case None => q.awaitTermination()
    }
  }
}
