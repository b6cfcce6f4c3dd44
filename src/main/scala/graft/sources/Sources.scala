package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source parity (SURVEY.md §2.1):
  *  - S3 `readTextFile` → `spark.read.text` / `readStream.text`
  *  - S4 `socketTextStream` → socket source
  *  - S6/S8 counter + `ThrottledIterator` → rate source (`rowsPerSecond`
  *    IS the throttle; `value` IS the monotone counter, already
  *    partition-parallel like `ParallelSourceFunction`)
  *  - S9 seeded generators → the same LCG mapping as the batch
  *    `SampleData`, applied to the rate source's `value`
  *
  * Bounded inputs are batch reads; unbounded are Structured Streaming
  * sources — same downstream transformations either way (§1.1).
  */
object Sources {

  /** S3 batch: one `value: STRING` row per line. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** S3 streaming: line-oriented tail of a directory. */
  def readTextStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** S3/S8 combined: file tail with a per-micro-batch file cap — the
    * bounded-ingest knob for a 100 TB backfill (without it the first
    * trigger plans EVERY backlog file into one giant batch; with it the
    * stream drains the directory at a steady, checkpointable cadence —
    * the ThrottledIterator idea applied to file ingest). */
  def readTextStreamThrottled(spark: SparkSession, dir: String,
                              maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** S4: unbounded socket line source (`SocketWindowWordCount.scala:58`). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** S6/S8: rate-limited monotone counter — columns (timestamp, value). */
  def rateStream(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** Deterministic rate variant: exactly `rowsPerBatch` rows per
    * micro-batch with consecutive `value`s — the testable throttle. */
  def rateMicroBatch(spark: SparkSession, rowsPerBatch: Long): DataFrame =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch).load()
}
