package graft.apps

import graft.core.{Args, GraftSession}
import graft.ops.AsyncMap
import graft.sinks.Sinks

/** Runnable mirror of `AsyncIOExample.scala:31-50`: a monotone counter
  * source through the ordered async map (R9: capacity 10, 10 s timeout,
  * output order == input order) to stdout. The rate-source `value`
  * column is the S6 parallel counter; bounded `spark.range` stands in
  * by default so the demo terminates. */
object AsyncIOExampleMain {
  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("async-io")
    import spark.implicits._
    val n = a.getOrElse("count", "1000").toLong
    val in = spark.range(n).as[Long]
    val out = AsyncMap.orderedWait(in)(AsyncMap.identityAsync[Long]).toDF("value")
    println(s"[async-io] ${out.count()} records, first 10 in order:")
    Sinks.print(out, 10)
    spark.stop()
  }
}
