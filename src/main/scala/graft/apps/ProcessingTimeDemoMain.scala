package graft.apps

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{Args, GraftSession}
import graft.sources.Sources

/** W7's third time characteristic as a runnable artifact: the reference's
  * `SocketWindowWordCount.scala:65` windows on PROCESSING time. Structured
  * Streaming's analogue is a wall-clock `Trigger.ProcessingTime` cadence
  * driving micro-batches, windowing on the rate source's arrival
  * `timestamp` (wall time at ingestion — the processing-time reformulation
  * documented in SURVEY §1.4; inherently nondeterministic, hence a demo
  * main rather than an oracle-checked query).
  *
  * Usage: --rate 20 --runSeconds 6
  */
object ProcessingTimeDemoMain {
  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("processing-time-demo")
    val counts = Sources.rateStream(spark, a.getOrElse("rate", "20").toLong)
      .groupBy(window(col("timestamp"), "2 seconds").as("w"),
        (col("value") % 5).as("k"))
      .count()
    val q = counts.writeStream.format("console")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.awaitTermination(a.getOrElse("runSeconds", "6").toLong * 1000)
    q.stop()
    spark.stop()
  }
}
