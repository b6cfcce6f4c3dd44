package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Sink parity (SURVEY.md §2.2):
  *  - K1 `print()` → batch `show` / streaming console sink
  *  - K2 `printToErr()` → stderr writer
  *  - K3 `writeAsText(path, OVERWRITE)` → `write.mode("overwrite").text`
  *  - K4 sink parallelism 1 → `coalesce(1)` (one output file, like the
  *    reference's single sink task)
  */
object Sinks {

  /** Render any row shape to one `value: STRING` column — the reference's
    * `Tuple2(a,b).toString`-style text lines: `(a,b,...)`. NULL fields
    * print as "null" like Java toString — concat_ws alone would silently
    * DROP them and vary the field count per row. */
  def toLines(df: DataFrame): DataFrame =
    df.select(concat(lit("("),
      concat_ws(",", df.columns.map(c =>
        coalesce(col(c).cast("string"), lit("null"))): _*), lit(")")).as("value"))

  /** K3+K4: single text file, overwrite semantics. */
  def writeText(df: DataFrame, path: String): Unit =
    toLines(df).coalesce(1).write.mode("overwrite").text(path)

  /** K1 batch print. */
  def print(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** K2 `printToErr` (`TwitterExample.java:107`). */
  def printToErr(df: DataFrame, n: Int = 20): Unit =
    toLines(df).take(n).foreach(r => System.err.println(r.getString(0)))

  /** K1 streaming: console sink in the given output mode. */
  def consoleStream(df: DataFrame, mode: String): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(mode)

  /** K2 streaming: per-batch stderr writer via foreachBatch. `maxRows`
    * caps what each batch collects to the driver (mirroring printToErr's
    * take(n)) — without it one fat micro-batch could OOM the driver of a
    * long-running demo. */
  def stderrStream(df: DataFrame, mode: String,
                   maxRows: Int = 1000): DataStreamWriter[Row] =
    df.writeStream.outputMode(mode).foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        toLines(batch.toDF()).take(maxRows)
          .foreach(r => System.err.println(s"[batch $id] ${r.getString(0)}"))
    }
}
