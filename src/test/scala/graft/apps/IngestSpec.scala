package graft.apps

import graft.SparkSuite
import graft.sources.Sources
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming ingest: backlog files → quality gate → PII
  * redaction → bounded-state dedup → checkpointed parquet, drained with
  * Trigger.AvailableNow; a second run from the same checkpoint processes
  * ONLY new files (exactly-once across restarts). */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  private def goodText(i: Long) =
    (1 to 12).map(j => s"w$i$j").mkString(" ") + s" mail user$i@ex.example.com"

  test("AvailableNow ingest: gates, redacts, dedups; restart resumes from checkpoint") {
    val in = java.nio.file.Files.createTempDirectory("graft-ingest-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-out").toString

    def writeFile(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(in, name), rows.mkString("", "\n", "\n"))

    def drain(): Unit = {
      val q = IngestMain.transform(
          Sources.readTextStreamThrottled(spark, in, maxFilesPerTrigger = 1))
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/checkpoint")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(180000)) finally q.stop()
    }

    writeFile("a.txt", Seq(
      s"1\t${goodText(1)}",
      s"2\tshort junk",          // < 10 tokens -> gated out
      s"1\t${goodText(1)}"))     // duplicate id within the batch -> deduped
    writeFile("b.txt", Seq(s"3\t${goodText(3)}"))
    drain()

    val first = spark.read.parquet(s"$out/data")
      .select("doc_id", "text_redacted", "n_emails")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(first.map(_._1).toSeq === Seq(1L, 3L))
    assert(first.forall(r => r._2.endsWith("mail <EMAIL>") && r._3 === 1))

    // restart: only the NEW file is processed (checkpointed offsets)
    writeFile("c.txt", Seq(s"4\t${goodText(4)}"))
    drain()
    val second = spark.read.parquet(s"$out/data")
      .select("doc_id").as[Long].collect().sorted
    assert(second.toSeq === Seq(1L, 3L, 4L))
  }
}
