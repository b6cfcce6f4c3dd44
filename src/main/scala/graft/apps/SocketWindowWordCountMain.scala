package graft.apps

import org.apache.spark.sql.functions._

import graft.core.{Args, GraftSession}
import graft.sinks.Sinks
import graft.sources.Sources

/** Runnable mirror of `SocketWindowWordCount.scala:39-72`: unbounded
  * socket lines → `\s` split → 5 s tumbling window count → console,
  * update mode. The reference windows on processing time; the twin
  * stamps ingestion time (`current_timestamp()`) and windows on it —
  * the §1.4 ingestion-time mapping (wall-clock modes live only in demo
  * mains; checked queries use event time from data columns).
  *
  * Usage: --host localhost --port 9999 --windowSec 5
  * Feed it with: nc -lk 9999
  */
object SocketWindowWordCountMain {
  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("socket-window-wordcount")
    val port = a.getOrElse("port", "9999").toInt
    val win = a.getOrElse("windowSec", "5").toInt
    val lines = Sources.socketLines(spark, a.getOrElse("host", "localhost"), port)
    val counts = lines
      .select(explode(split(col("value"), "\\s")).as("word"))
      .withColumn("ts", current_timestamp())
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), s"$win seconds"), col("word"))
      .count()
    val q = Sinks.consoleStream(counts, "update").start()
    q.awaitTermination()
  }
}
