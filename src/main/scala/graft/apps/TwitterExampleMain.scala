package graft.apps

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.core.{Args, GraftSession}
import graft.ops.TweetJson
import graft.sinks.Sinks

/** Runnable mirror of `TwitterExample.java:52-116`: tweet-JSON stream →
  * nested parse → English filter → tokenize → running keyed count.
  * The live TwitterSource is out of scope (external OAuth connector);
  * the golden fixture docs are replayed instead — exactly what the
  * reference's own test harness does (`TwitterExampleData.java`).
  *
  * Default: batch fixture run printed to stdout (plus the tweet texts to
  * stderr, mirroring the reference's `printToErr`). `--stream` replays
  * one tweet per micro-batch with update-mode running counts on console.
  */
object TwitterExampleMain {
  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark = GraftSession.build("twitter-example")
    val fixture = TweetJson.fixtureDf(spark)
    if (a.has("stream")) {
      import spark.implicits._
      val ms = MemoryStream[String](spark)
      // same transformation as the batch path (englishWordCount) — the
      // \s+ tokenizer, NOT re-tokenized through \W+
      val counts = TweetJson.englishWordCount(ms.toDF(), "value")
      val q = Sinks.consoleStream(counts, "update").start()
      TweetJson.FixtureTexts.foreach { t => ms.addData(t); q.processAllAvailable() }
      q.stop()
    } else {
      Sinks.printToErr(TweetJson.parse(fixture, "json").select("t.text"))
      Sinks.print(TweetJson.englishWordCount(fixture, "json"))
    }
    spark.stop()
  }
}
