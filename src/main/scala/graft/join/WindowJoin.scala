package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.agg.Aggregations.windowBucket

/** J1: windowed stream-stream inner equi-join (SURVEY.md §2.6;
  * `WindowJoin.scala:85-95`).
  *
  * Flink buffers both sides per tumbling window and emits the cross
  * product of key matches when the window fires (m×n multiplicity on
  * duplicate keys). Batch-equivalently: inner join on
  * `key AND window_bucket`, which Spark plans as a single hash-partition
  * shuffle on (key is enough — bucket rides along) with AQE free to pick
  * broadcast if one side is small. At 100 TB both sides shuffle on the
  * join key; adding the bucket to the join key would NOT reduce the
  * shuffle (same partitioning), so we shuffle on the key alone and let
  * the bucket equality be evaluated in the join condition.
  */
object WindowJoin {

  /** Grade⋈Salary analogue over the events table: two event_type slices
    * joined per user within the same tumbling window. Both slice filters
    * are pushed down to the parquet scan. */
  def eventSliceJoin(events: DataFrame, typeA: String, typeB: String,
                     windowSec: Long): DataFrame = {
    val a = events.filter(col("event_type") === typeA)
      .select(col("user_id"),
        windowBucket(col("ts_sec"), windowSec).as("wb"),
        col("value").as("grade"),
        col("event_id").as("a_id"))
    val b = events.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user_id"),
        windowBucket(col("ts_sec"), windowSec).as("b_wb"),
        col("value").as("salary"),
        col("event_id").as("b_id"))
    a.join(b, a("user_id") === b("b_user_id") && a("wb") === b("b_wb"), "inner")
      // Person(name, grade, salary) projection (`WindowJoin.scala:94`)
      .select(col("user_id"), col("wb").as("wstart_sec"),
        col("a_id"), col("b_id"), col("grade"), col("salary"))
  }
}
